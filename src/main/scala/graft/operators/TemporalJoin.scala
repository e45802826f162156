package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins (SURVEY.md §2 group I) — the two join shapes Spark
  * has no native operator for, each built so the cost stays one
  * keyed shuffle instead of the quadratic inequality theta-join the
  * naive `ON l.key = r.key AND r.t <= l.t` formulation plans
  * (BroadcastNestedLoopJoin — a scale-killer at any real size).
  */
object TemporalJoin {

  /** Both joins stage working columns under the `__` prefix
    * (`__t`/`__side`/`__seq`/`__l`/`__r`/`__m`/`__b`…). A user column
    * with that prefix would be silently shadowed — reject it loudly,
    * like the payload-overlap require.
    */
  private def requireNoReserved(left: DataFrame, right: DataFrame): Unit = {
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"temporal joins reserve the __ column-name prefix for internal " +
        s"columns; rename: ${reserved.mkString(", ")}")
  }

  /** As-of join: for every left row, the single right row whose
    * timestamp is the latest at-or-before the left timestamp
    * (`direction = "backward"`), or earliest at-or-after
    * (`"forward"`). Left rows with no qualifying right row survive
    * with null payload (left-outer semantics).
    *
    * Implementation is the union-and-window shape: tag both sides,
    * union, sort each key partition by (time, side, seq), and carry
    * the most recent right payload across with a running
    * `last(ignoreNulls)` window — ONE shuffle on the key plus one
    * partition-local sort, the same cost as a `groupBy(key)`. No
    * join node appears in the plan at all.
    *
    * Tie rules (deterministic): an equal-time right row IS visible
    * to the left row (>= / <= semantics); among right rows tied on
    * (key, time), the highest `rightSeq` wins for backward and the
    * lowest for forward.
    *
    * `tolerance`: optional max time distance. A match farther than
    * `tolerance` from the left timestamp is nulled out; the left row
    * is kept.
    *
    * `right` must already be projected to `keys ++ rightTime ++
    * rightSeq ++ payload`, with payload column names disjoint from
    * `left`'s (rename upstream — this operator doesn't prefix).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, rightSeq: String,
               payload: Seq[String], direction: String = "backward",
               tolerance: Option[Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asOfJoin direction must be backward|forward, got $direction")
    requireNoReserved(left, right)
    val backward = direction == "backward"
    val overlap = left.columns.toSet
      .intersect((rightTime +: payload).toSet)
    require(overlap.isEmpty,
      s"asOfJoin right payload collides with left columns: $overlap")
    // a non-numeric seq would cast to all-NULL and silently turn the
    // documented deterministic tie-break into shuffle-order luck
    val seqType = right.schema(rightSeq).dataType
    require(seqType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"asOfJoin rightSeq must be numeric for the tie-break, " +
        s"got $rightSeq: $seqType")

    val rightCarried = rightTime +: payload
    val rPay = struct(rightCarried.map(col): _*)
    val rPayType = right.select(rPay.as("__r")).schema("__r").dataType
    val lRow = struct(left.columns.map(col).toIndexedSeq: _*)
    val lRowType = left.select(lRow.as("__l")).schema("__l").dataType

    // a null right timestamp would sort before every row (nulls
    // first) and become "visible" to all left rows — drop them, as
    // every as-of implementation does. Null JOIN KEYS also go: the
    // window partition would group null with null, but this operator
    // replaces an equi-join, where NULL never matches anything.
    val rightKeysNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val rSide = right
      .filter(col(rightTime).isNotNull && rightKeysNotNull)
      .select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        col(rightSeq).cast("long").as("__seq"),
        lit(null).cast(lRowType).as("__l"), rPay.as("__r")): _*)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        lit(0L).as("__seq"),
        lRow.as("__l"), lit(null).cast(rPayType).as("__r")): _*)

    // Sort so every right row visible to a left row precedes it and
    // the tie-winning right row is scanned last: backward = time asc
    // (ties: seq asc, highest wins), forward = time desc (ties: seq
    // desc, lowest wins). Side 0 < 1 keeps equal-time right rows
    // visible in both directions.
    val ord =
      if (backward) Seq(col("__t").asc, col("__side").asc, col("__seq").asc)
      else Seq(col("__t").desc, col("__side").asc, col("__seq").desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = rSide.unionByName(lSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val mt = col("__m").getField(rightTime)
    val inRange = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        if (backward) mt >= col("__t") - tol else mt <= col("__t") + tol
    }
    // null left timestamps match nothing (in forward order they sort
    // last and would otherwise see every right row)
    val m = when(col("__t").isNotNull && col("__m").isNotNull && inRange,
      col("__m"))
    matched.select(
      left.columns.toIndexedSeq.map(c => col("__l").getField(c).as(c)) ++
        rightCarried.map(c => m.getField(c).as(c)): _*)
  }

  /** Interval (range) join: every (left, right) pair with equal keys
    * and right time in `(l.t, l.t + widthSec]` — strictly after, at
    * most `widthSec` seconds later. Emits one row per pair: all left
    * columns plus `rightTime` and `payload`.
    *
    * Bucketed equi-join, not a theta-join: both sides bucket time by
    * `widthSec`; a qualifying right row can only sit in the left
    * row's own bucket or the next one, so the left side fans out to
    * exactly those two candidate buckets and the join runs on
    * `(keys, bucket)` — a plain hash-partitioned equi-join whose
    * candidate set is bounded by per-bucket co-occupancy, never
    * |left|×|right|. The exact interval predicate then filters
    * candidates. Right rows match at most once per left row (each
    * right row owns exactly one bucket).
    *
    * Skew: the shuffle key is `(keys, bucket)`, so a hot key in a
    * hot time window co-locates all its candidates in ONE task. Two
    * levers: AQE's skew-join split applies as-is (this is a plain
    * shuffle join), and `salt > 1` spreads a (key, bucket) cell
    * across `salt` reducers deterministically — the left side picks
    * one content-hashed salt (over the key, the timestamp, and every
    * other atomic-typed left column, so rows identical only in key
    * and time still spread), the right side replicates across all
    * `salt` values, so each qualifying pair still meets exactly
    * once and results are IDENTICAL for any salt (spec-checked).
    * The salt must be DETERMINISTIC (a random salt is a
    * nondeterministic shuffle key — a partial stage retry after a
    * fetch failure could then double-count or lose rows), so left
    * rows identical in EVERY atomic column do share a salt; a hot
    * cell made purely of full-row duplicates is the collapse
    * guards' job (F10), not the salt's. Cost: `salt`× right-side
    * shuffle fan-out — pay it when a hot cell is known, not by
    * default.
    */
  def rangeJoinPairs(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTime: String, rightTime: String,
                     payload: Seq[String], widthSec: Long,
                     salt: Int = 1): DataFrame = {
    require(widthSec > 0, s"rangeJoinPairs width must be positive: $widthSec")
    require(salt >= 1, s"rangeJoinPairs salt must be >= 1: $salt")
    val overlap = left.columns.toSet.intersect((rightTime +: payload).toSet)
    require(overlap.isEmpty,
      s"rangeJoinPairs right payload collides with left columns: $overlap")
    requireNoReserved(left, right)
    val wUs = widthSec * 1000000L
    // integer `div`, not float floor: bucket ids must be exact for
    // the two-candidate-bucket argument to hold at every boundary.
    // The user column reaches SQL only through col() (never string-
    // interpolated into expr), so names needing backticks survive;
    // div itself runs on the internal __tus column.
    val lb0 = left
      .withColumn("__tus", unix_micros(col(leftTime)))
      .withColumn("__lb", expr(s"__tus div ${wUs}L"))
      .withColumn("__b", explode(array(col("__lb"), col("__lb") + 1)))
      .drop("__lb", "__tus")
    val rb0 = right
      .select((keys ++ (rightTime +: payload)).map(col): _*)
      .withColumn("__tus", unix_micros(col(rightTime)))
      .withColumn("__b", expr(s"__tus div ${wUs}L"))
      .drop("__tus")
    val (lb, rb, joinCols) =
      if (salt == 1) (lb0, rb0, keys :+ "__b")
      else {
        // salt hash: (keys, leftTime) plus every other atomic left
        // column — maps/arrays/structs excluded (xxhash64 rejects or
        // mis-hashes them), which keeps the operator total while
        // spreading any rows that differ in some scalar
        import org.apache.spark.sql.types._
        val atomic = left.schema.fields.collect {
          case f if f.dataType.isInstanceOf[NumericType] ||
            (f.dataType match {
              case StringType | BooleanType | DateType | TimestampType |
                   TimestampNTZType | BinaryType => true
              case _ => false
            }) => f.name
        }.toSeq
        val saltCols = (keys :+ leftTime) ++
          atomic.filterNot((keys :+ leftTime).contains)
        val ls = lb0.withColumn("__s",
          pmod(xxhash64(saltCols.map(col): _*), lit(salt.toLong)))
        val rs = rb0.withColumn("__s",
          explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
        (ls, rs, keys :+ "__b" :+ "__s")
      }
    lb.join(rb, joinCols)
      .filter(col(rightTime) > col(leftTime) &&
        unix_micros(col(rightTime)) <= unix_micros(col(leftTime)) + wUs)
      .drop("__b", "__s")
  }
}
