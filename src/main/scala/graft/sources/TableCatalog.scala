package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** `events.ts` has shipped in two physical shapes across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as long, then truncate ns→µs exactly like
    * DuckDB does on fetch) and plain `timestamp[us]` (read as
    * TIMESTAMP_NTZ when the file's isAdjustedToUTC is false). Branch
    * on the scanned dtype so either generation yields the same
    * session-TZ TimestampType column the oracles compare against.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = raw("events")
    df.schema("ts").dataType match {
      case LongType =>
        // integer `div`, not `/`: nanosecond epochs exceed double's 2^53
        // mantissa, so float division corrupts the low microseconds
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // naive µs wall-clock; session TZ is UTC everywhere in this
        // engine, so the cast reinterprets without shifting the instant
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df // already a session-TZ timestamp
    }
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object TableCatalog {
  def apply(spark: SparkSession, dir: String): TableCatalog =
    new TableCatalog(spark, dir)
}
