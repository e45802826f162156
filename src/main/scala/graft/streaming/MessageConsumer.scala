package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The consumer direction on real encoded messages (SURVEY.md §2 D1):
  * decode ext-JSON values, pull the upsert document from
  * `document-root-path`, decide upsert-vs-delete (missing root or
  * `{_id}`-only ⇒ delete, route81.go:1019-1069), the delete id from
  * `delete-id-path`, and fold to final state in arrival order.
  * The whole chain is from_json + struct paths — codegen'd, and the
  * fold is the same single max_by shuffle as [[graft.operators.Cdc]].
  */
object MessageConsumer {

  /** Envelope schema for the events-domain messages this engine
    * produces (ext-JSON type tags as nested structs).
    */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("meta", StructType(Seq(
      StructField("_id", StructType(Seq(StructField("$numberLong", StringType)))),
      StructField("ts", StructType(Seq(
        StructField("$date", StructType(Seq(StructField("$numberLong", StringType))))))),
      StructField("ns", StringType),
      StructField("op", StringType)))),
    StructField("data", StructType(Seq(
      StructField("user_id", StructType(Seq(StructField("$numberLong", StringType)))),
      StructField("value", StructType(Seq(StructField("$numberDouble", StringType)))),
      StructField("props", StringType))))))

  /** Resolve a gval-style dotted path against a struct column. */
  def path(root: Column, dotted: String): Column =
    dotted.split('.').foldLeft(root)(_ getField _)

  /** Decode messages and classify each as upsert/delete with the
    * configured paths — the reference's per-message decision,
    * columnar.
    */
  def classify(messages: DataFrame, valueCol: String = "value",
               documentRootPath: String = "data",
               deleteIdPath: String = "meta._id.$numberLong"): DataFrame = {
    val j = from_json(col(valueCol), envelopeSchema)
    messages
      .withColumn("__j", j)
      .withColumn("__root", path(col("__j"), documentRootPath))
      .withColumn("action",
        when(col("__root").isNull, "delete").otherwise("upsert"))
      .withColumn("target_id", path(col("__j"), deleteIdPath))
  }

  /** Fold a batch of messages (with an arrival-order column, the
    * Kafka-offset analog) into final upsert state: last writer per id
    * wins, trailing deletes drop the key.
    */
  def fold(messages: DataFrame, offsetCol: String): DataFrame = {
    val classified = classify(messages)
    classified
      .groupBy(col("target_id"))
      .agg(max_by(struct(col("action"), col("__root").as("root")),
        col(offsetCol)).as("last"))
      .filter(col("last.action") === "upsert")
      .select(
        col("last.root.user_id.$numberLong").cast("long").as("user_id"),
        col("last.root.value.$numberDouble").cast("double").as("value"),
        col("last.root.props").as("props"))
  }
}
