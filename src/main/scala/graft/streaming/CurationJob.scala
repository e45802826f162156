package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.{Dedup, TextAnalysis}

/** The LLM-curation daemon loop — the training-data twin of the CDC
  * capstone (KafkaLogSpec E9): a stream of incoming documents is
  * quality-gated (Gopher structural rules, H16), deduped
  * INCREMENTALLY against the standing corpus fingerprint index
  * (F12), and appended to a live corpus, with the index advanced in
  * the same micro-batch — so later batches (and later duplicates
  * inside the stream) dedupe against everything already accepted.
  *
  * Semantics: first-arrival-wins across micro-batches, min-id within
  * one — exactly the fold a daemon applying batches in order
  * produces. When ids arrive in increasing order this equals the
  * batch-mode curation of the whole input (spec-checked).
  *
  * Scale: per micro-batch the work is batch-sized hashing + one anti
  * join against the index (persist it bucketed on `fp` —
  * [[graft.operators.Dedup.persistIndexBucketed]] — and the index
  * side never re-shuffles).
  *
  * Exactly-once: each batch OVERWRITES its own `b<batchId>`
  * subdirectory of both the corpus and the index (the E9 capstone's
  * generation-swap move, sharded by batch), and the index read
  * EXCLUDES the current batch's own shard — otherwise a retry after
  * a half-committed attempt would see its own fps in the index and
  * silently drop the whole batch. Re-delivery of a batchId is
  * therefore a no-op rewrite of identical content (spec-checked).
  */
object CurationJob {

  /** Start the loop over a streaming `incoming` frame. The corpus
    * lives under `corpusDir/data/b*`, the standing index under
    * `corpusDir/index/b*` (read both with `recursiveFileLookup`).
    */
  def run(incoming: DataFrame, corpusDir: String, checkpoint: String,
          idCol: String = "doc_id", textCol: String = "text"): StreamingQuery =
    incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, corpusDir, idCol, textCol, batchId)
      }
      .start()

  /** One micro-batch of the loop — pure batch logic, testable alone:
    * gate → dedupe vs the index-so-far → overwrite this batch's
    * corpus + index shards.
    */
  def applyBatch(batch: DataFrame, corpusDir: String,
                 idCol: String, textCol: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val gated = batch.join(
      TextAnalysis.gopherRules(batch, idCol, textCol)
        .filter(col("pass")).select(col(idCol)),
      Seq(idCol))
    val index = readIndexExcept(spark, s"$corpusDir/index", s"b$batchId")
    val novel = Dedup.incrementalFingerprint(gated, index, idCol, textCol)
    // survivors carry their batch rows into the corpus; the emitted
    // fps advance the index so the NEXT batch sees them
    gated.join(novel.select(col("survivor").as(idCol)), Seq(idCol))
      .write.mode("overwrite").parquet(s"$corpusDir/data/b$batchId")
    novel.select("fp")
      .write.mode("overwrite").parquet(s"$corpusDir/index/b$batchId")
  }

  /** The standing index minus the named batch shard (empty before
    * the first batch). Listing is one metadata call over per-batch
    * subdirectories.
    */
  private def readIndexExcept(spark: SparkSession, path: String,
                              ownShard: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("fp", StringType))))
    if (!fs.exists(p)) empty
    else {
      val shards = fs.listStatus(p).map(_.getPath)
        .filter(_.getName != ownShard).map(_.toString)
      if (shards.isEmpty) empty else spark.read.parquet(shards.toIndexedSeq: _*)
    }
  }
}
