package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** route81's bulk writer flushes pending ops on EITHER of two
  * triggers: the buffer reaching `bulk-size`, or `bulk-flush-duration`
  * elapsing with a partial buffer (route81.go:1141-1197 — the select
  * over the ops channel and the ticker). On Spark's execution model
  * those two axes map to different layers:
  *
  *   - TIME: the micro-batch trigger. `Trigger.ProcessingTime(d)` is
  *     the ticker — whatever arrived when the tick fires is flushed,
  *     full or not, so a lone message never waits for the buffer to
  *     fill.
  *   - SIZE: per-worker chunking inside the batch. Each executor slot
  *     walks its partition and writes groups of ≤ bulk-size rows — the
  *     reference's per-connection buffer, one per worker, no global
  *     coordination. (A global "exactly every N rows across the
  *     cluster" would need a single-partition sort; the reference
  *     semantics are per-worker, which shards freely.)
  */
object BulkWriter {

  /** The duration axis: a writer whose ticks are the flush clock. */
  def timed(messages: DataFrame, flushDuration: String,
            checkpoint: String): DataStreamWriter[Row] =
    messages.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(flushDuration))

  /** The size axis: a foreachBatch body that flushes each worker's
    * rows in ≤ bulkSize groups. `flush` runs ON THE EXECUTOR with one
    * bulk's rows — the reference's single BulkWrite call.
    */
  def chunked(bulkSize: Int)(flush: Seq[Row] => Unit): (DataFrame, Long) => Unit = {
    require(bulkSize > 0, "bulk-size must be positive")
    (batch, _) =>
      batch.foreachPartition { it: Iterator[Row] =>
        it.grouped(bulkSize).foreach(g => flush(g))
      }
  }
}
