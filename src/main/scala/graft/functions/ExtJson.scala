package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MongoDB Extended-JSON (canonical) encoding as Column expressions
  * (SURVEY.md §2 group B).
  *
  * The reference encodes every outgoing Kafka message with
  * `bson.MarshalExtJSON(val, canonical=true, ...)`
  * (/root/reference/encoding/encoding.go:30-38), tagging each value
  * with its BSON type (`$numberLong`, `$numberDouble`, `$date`, ...).
  * Here the encoder is built from codegen'd string functions — no UDF,
  * no per-row interpreter — so encoding lives inside the same
  * whole-stage-codegen span as the rest of the plan. Field order is
  * explicit at the call site, making the output byte-deterministic.
  */
object ExtJson {

  /** JSON string escaping: backslash first, then quote and the
    * whitespace control characters — without these a newline in a
    * field emits invalid JSON that a consumer's from_json turns into
    * a null root (and so silently into a delete).
    */
  def escape(c: Column): Column = {
    val esc = Seq("\\" -> "\\\\", "\"" -> "\\\"",
      "\n" -> "\\n", "\r" -> "\\r", "\t" -> "\\t")
    esc.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
  }

  def str(c: Column): Column = concat(lit("\""), escape(c), lit("\""))

  def numberLong(c: Column): Column =
    concat(lit("{\"$numberLong\":\""), c.cast("long").cast("string"), lit("\"}"))

  def numberInt(c: Column): Column =
    concat(lit("{\"$numberInt\":\""), c.cast("int").cast("string"), lit("\"}"))

  def numberDouble(c: Column): Column =
    concat(lit("{\"$numberDouble\":\""), c.cast("double").cast("string"), lit("\"}"))

  /** Canonical `$date`: epoch millis as a $numberLong. */
  def date(ts: Column): Column =
    concat(lit("{\"$date\":{\"$numberLong\":\""),
      (unix_micros(ts) / 1000).cast("long").cast("string"), lit("\"}}"))

  /** `$oid` form (reference README §example-producer-messages):
    * callers supply the 24-hex ObjectId rendering.
    */
  def oid(hex24: Column): Column =
    concat(lit("{\"$oid\":\""), hex24, lit("\"}"))

  /** BSON `$timestamp {t, i}` — oplog position as (seconds, ordinal
    * within the second), the reference's `meta.ts` shape.
    */
  def timestampBson(tSeconds: Column, inc: Column): Column =
    concat(lit("{\"$timestamp\":{\"t\":"), tSeconds.cast("long").cast("string"),
      lit(",\"i\":"), inc.cast("int").cast("string"), lit("}}"))

  /** `"name": <valueJson>` — valueJson must already be encoded. */
  def field(name: String, valueJson: Column): Column =
    concat(lit("\"" + name + "\":"), valueJson)

  def obj(fields: Column*): Column =
    concat(lit("{") +: fields.zipWithIndex.flatMap { case (f, i) =>
      if (i == 0) Seq(f) else Seq(lit(","), f)
    } :+ lit("}"): _*)

  /** Plain-JSON float with the reference's special cases
    * (encoding/encoding.go:83-94): NaN → "nan", ±Inf → "±inf".
    */
  def jsonFloat(c: Column): Column =
    when(isnan(c), "\"nan\"")
      .when(c === lit(Double.PositiveInfinity), "\"+inf\"")
      .when(c === lit(Double.NegativeInfinity), "\"-inf\"")
      .otherwise(c.cast("string"))

  /** Plain-JSON time in the reference's layout
    * `2006-01-02T15:04:05.000Z07:00` (encoding/encoding.go:65-81),
    * null outside year range [0, 10000).
    */
  def jsonTime(ts: Column): Column =
    when(year(ts) < 0 || year(ts) >= 10000, "null")
      .otherwise(concat(lit("\""),
        date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"), lit("\"")))
}
