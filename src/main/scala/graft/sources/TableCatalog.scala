package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_micros}

/** Named access to the engine's input tables (one parquet file per
  * table under a scale-factor directory).
  *
  * Mirrors the reference's notion of a MongoDB namespace
  * (`db.collection`) as the unit a direct read targets
  * (/root/reference/route81.go:446 `direct-read-namespace`): here a
  * namespace is `<dir>/<name>.parquet` and scans stay lazy so
  * Catalyst can push filters/projections into the parquet reader.
  */
final class TableCatalog(spark: SparkSession, dir: String) {

  /** Lazy scan of one table; no action is triggered. */
  def table(name: String): DataFrame =
    if (name == "events") events else raw(name)

  private def raw(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects; read nanos as long and convert to a micros
    * timestamp (DuckDB truncates ns→µs the same way on fetch).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer `div`, not `/`: nanosecond epochs exceed double's 2^53
    // mantissa, so float division corrupts the low microseconds
    raw("events")
      .withColumn("ts", timestamp_micros(org.apache.spark.sql.functions
        .expr("ts div 1000")))
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object TableCatalog {
  def apply(spark: SparkSession, dir: String): TableCatalog =
    new TableCatalog(spark, dir)
}
