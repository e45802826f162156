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
    * the producer's send sequence `seqCol`. `base` (from
    * [[highWater]]) continues each partition's offsets from the
    * existing log's high-water mark — without it a second append would
    * restart at 0 and collide with already-delivered offsets.
    */
  def append(messages: DataFrame, numPartitions: Int, seqCol: String,
             base: Option[DataFrame] = None): DataFrame = {
    val w = Window.partitionBy(col("topic"), col("partition"))
      .orderBy(col(seqCol))
    val rel = messages
      .withColumn("partition", pmod(hash(col("key")), lit(numPartitions)).cast("int"))
      .withColumn("__rel", row_number().over(w).cast("long") - 1)
    val offs = base match {
      case Some(hw) => rel
        .join(broadcast(hw), Seq("topic", "partition"), "left")
        .withColumn("offset", col("__rel") + coalesce(col("__next"), lit(0L)))
      case None => rel.withColumn("offset", col("__rel"))
    }
    offs.select("key", "value", "offset", "topic", "partition")
  }

  /** Next offset per (topic, partition) of an existing log — the
    * high-water marks a broker keeps per partition. A few rows per
    * topic: always broadcastable.
    */
  def highWater(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(recordSchema).parquet(dir)
      .groupBy("topic", "partition")
      .agg((max(col("offset")) + 1).as("__next"))

  /** Persist appended records under `dir/topic=<t>/partition=<p>/`. */
  def write(records: DataFrame, dir: String): Unit =
    records.write.mode("append").partitionBy("topic", "partition").parquet(dir)

  /** Produce-to-log: continue offsets from the live log (if any) and
    * append — the full broker-side send path.
    */
  def appendTo(spark: SparkSession, dir: String, messages: DataFrame,
               numPartitions: Int, seqCol: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val base =
      if (fs.exists(path)) Some(highWater(spark, dir)) else None
    write(append(messages, numPartitions, seqCol, base), dir)
  }

  /** Consumer subscription: a streaming scan of the log directory.
    * The checkpoint dir given to the query is the committed-offset
    * store (route81.go:199-224's resume names, file-source flavored).
    */
  def subscribe(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(recordSchema).parquet(dir)

  /** The exact DataFrame schema the `spark-sql-kafka-0-10` connector
    * presents for a real broker subscription (public connector
    * contract; `headers` appears only under `includeHeaders=true` and
    * is omitted here like the connector's default). Field names,
    * types, and order all match, so swapping this modeled log for
    * `spark.readStream.format("kafka")` is a source-config change,
    * not a refactor — KafkaLogSpec asserts the parity.
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Adapt log records (batch or streaming) to [[wireSchema]]:
    * key/value as the UTF-8 bytes a broker would return (consumers
    * downstream `CAST(value AS STRING)` exactly as they would against
    * the real connector). `timestamp` is a MODELED CreateTime —
    * deterministic `timestamp_micros(offset)`, monotone per partition
    * like a broker's append clock; a real broker supplies wall-clock
    * time here, which no offline model can reproduce. timestampType 0
    * = CreateTime.
    */
  def toWire(records: DataFrame): DataFrame =
    records.select(
      col("key").cast("binary").as("key"),
      col("value").cast("binary").as("value"),
      col("topic"),
      col("partition"),
      col("offset"),
      timestamp_micros(col("offset")).as("timestamp"),
      lit(0).as("timestampType"))

  /** [[subscribe]] presented through the real connector's schema. */
  def subscribeWire(spark: SparkSession, dir: String): DataFrame =
    toWire(subscribe(spark, dir))

  /** Log compaction (Kafka `cleanup.policy=compact`, the topic mode a
    * CDC sync like the reference targets): retain only the LATEST
    * record per key within each (topic, partition) — sound because the
    * consumer folds to last-write-wins anyway — and drop keys whose
    * latest record is a tombstone (null value), Kafka's delete marker.
    * Offsets of survivors are preserved (compaction never renumbers).
    * One keyed aggregation; since a key lives in exactly one partition
    * (broker invariant 1), compaction shards perfectly at any scale.
    */
  def compact(records: DataFrame): DataFrame =
    records
      .groupBy(col("topic"), col("partition"), col("key"))
      .agg(max_by(struct(col("value"), col("offset")), col("offset"))
        .as("__last"))
      .filter(col("__last.value").isNotNull)
      .select(col("key"), col("__last.value").as("value"),
        col("__last.offset").as("offset"), col("topic"), col("partition"))
}
