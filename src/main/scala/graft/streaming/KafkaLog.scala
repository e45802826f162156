package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A file-backed topic log with Kafka's delivery semantics — the
  * closest end-to-end analogue of the reference's produce/consume loop
  * (route81.go:1400-1441 producer, :982-1205 consumer) that runs in an
  * offline sandbox (no broker, no kafka artifacts on the classpath).
  *
  * What the reference's consumer actually RELIES on from Kafka is
  * narrow and fully reproducible:
  *   1. keyed messages land on partition `murmur(key) % n` — so every
  *      message for one document id lives in ONE partition;
  *   2. offsets are strictly ordered within a partition — so per-key
  *      arrival order is total and equals producer send order;
  *   3. consumers resume from committed offsets.
  * This object models (1) with `pmod(hash(key), n)` (Spark's Murmur3 —
  * same invariant, different constant), (2) with a per-(topic,
  * partition) `row_number` over the producer's send sequence — exactly
  * a broker's sequential append — and (3) with the file-stream source's
  * checkpointed file tracking. Everything is deterministic column
  * algebra, so the whole loop is oracle-testable.
  *
  * Scale note: the offset window sorts per (topic, partition) — the
  * same per-partition sequencing work a real broker does at append
  * time, sharded across the cluster by the shuffle. Nothing is global.
  */
object KafkaLog {

  /** Data columns of a log record (topic/partition become directory
    * levels, mirroring a broker's on-disk layout).
    */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("offset", LongType),
    StructField("topic", StringType),
    StructField("partition", IntegerType)))

  /** Broker append: assign each (topic, key, value) message a
    * partition by key hash and a dense per-partition offset ordered by
    * the producer's send sequence `seqCol`.
    */
  def append(messages: DataFrame, numPartitions: Int, seqCol: String): DataFrame = {
    val w = Window.partitionBy(col("topic"), col("partition"))
      .orderBy(col(seqCol))
    messages
      .withColumn("partition", pmod(hash(col("key")), lit(numPartitions)).cast("int"))
      .withColumn("offset", row_number().over(w).cast("long") - 1)
      .select("key", "value", "offset", "topic", "partition")
  }

  /** Persist appended records under `dir/topic=<t>/partition=<p>/`. */
  def write(records: DataFrame, dir: String): Unit =
    records.write.mode("append").partitionBy("topic", "partition").parquet(dir)

  /** Consumer subscription: a streaming scan of the log directory.
    * The checkpoint dir given to the query is the committed-offset
    * store (route81.go:199-224's resume names, file-source flavored).
    */
  def subscribe(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(recordSchema).parquet(dir)
}
