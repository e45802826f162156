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
  * side never re-shuffles). Appends here are plain parquet appends;
  * a production loop would name files by batchId for exactly-once
  * re-delivery, the same move the E9 capstone makes with its
  * generation swap.
  */
object CurationJob {

  /** Start the loop over a streaming `incoming` frame. The corpus
    * lives at `corpusDir/data`, the standing index at
    * `corpusDir/index`.
    */
  def run(incoming: DataFrame, corpusDir: String, checkpoint: String,
          idCol: String = "doc_id", textCol: String = "text"): StreamingQuery =
    incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, corpusDir, idCol, textCol)
      }
      .start()

  /** One micro-batch of the loop — pure batch logic, testable alone:
    * gate → dedupe vs index → append survivors → advance index.
    */
  def applyBatch(batch: DataFrame, corpusDir: String,
                 idCol: String, textCol: String): Unit = {
    val spark = batch.sparkSession
    val gated = batch.join(
      TextAnalysis.gopherRules(batch, idCol, textCol)
        .filter(col("pass")).select(col(idCol)),
      Seq(idCol))
    val index = readIndex(spark, s"$corpusDir/index")
    val novel = Dedup.incrementalFingerprint(gated, index, idCol, textCol)
    // survivors carry their batch rows into the corpus; the emitted
    // fps advance the index so the NEXT batch sees them
    gated.join(novel.select(col("survivor").as(idCol)), Seq(idCol))
      .write.mode("append").parquet(s"$corpusDir/data")
    novel.select("fp").write.mode("append").parquet(s"$corpusDir/index")
  }

  /** The standing index, or the empty one before the first batch. */
  private def readIndex(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("fp", StringType))))
  }
}
