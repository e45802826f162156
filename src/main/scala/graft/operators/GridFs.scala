package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A9/A10: GridFS file + chunk production (reference README §GridFS:
  * one `fs.files` metadata doc and N `fs.chunks` docs per file).
  *
  * Chunking is a narrow transform: sequence+explode inside one task,
  * no shuffle — each 100 MB input split fans out to its own chunk rows
  * where they already live.
  */
object GridFs {

  /** fs.files metadata: length, md5, chunkSize, filename. */
  def files(docs: DataFrame, idCol: String, contentCol: String,
            chunkSize: Int = 256): DataFrame =
    docs.select(
      col(idCol).as("files_id"),
      length(col(contentCol)).as("length"),
      lit(chunkSize).as("chunkSize"),
      md5(to_binary(col(contentCol), lit("utf-8"))).as("md5"),
      concat(lit("doc_"), col(idCol).cast("string"), lit(".txt")).as("filename")
    )

  /** fs.chunks: (files_id, n, data) with data = the n-th fixed-size
    * slice of the content.
    */
  def chunks(docs: DataFrame, idCol: String, contentCol: String,
             chunkSize: Int = 256): DataFrame =
    docs
      .select(col(idCol).as("files_id"), col(contentCol).as("content"))
      // empty content ⇒ zero chunks; without this guard
      // sequence(0, -1) would count DOWN and emit phantom chunks
      .filter(length(col("content")) > 0)
      .withColumn("n",
        explode(sequence(lit(0),
          floor((length(col("content")) - 1) / chunkSize).cast("int"))))
      .select(
        col("files_id"), col("n"),
        col("content").substr(col("n") * chunkSize + 1, lit(chunkSize)).as("data")
      )

  /** Consumer direction (reference README §GridFS: the consumer
    * re-materializes what the producer chunked): reassemble each
    * file's content from its `fs.chunks` rows in `n` order and verify
    * the md5 against the `fs.files` metadata. One shuffle keyed by
    * files_id (per-file regroup), then a narrow md5 check — files with
    * zero chunks reassemble to the empty string, like a zero-length
    * GridFS file.
    */
  def reassemble(files: DataFrame, chunks: DataFrame): DataFrame = {
    val content = chunks
      .groupBy(col("files_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("n"), col("data")))),
          x => x.getField("data")), "").as("content"))
    val md5r = md5(to_binary(col("content"), lit("utf-8")))
    files.join(content, Seq("files_id"), "left")
      .withColumn("content", coalesce(col("content"), lit("")))
      .select(col("files_id"),
        length(col("content")).as("length_r"),
        md5r.as("md5_r"),
        (md5r === col("md5")).as("md5_ok"))
  }
}
