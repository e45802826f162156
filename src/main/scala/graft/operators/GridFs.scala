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
}
