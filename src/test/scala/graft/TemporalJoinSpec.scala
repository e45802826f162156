package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoin
import graft.sources.TableCatalog

/** As-of and interval joins: result equality against the naive
  * inequality theta-join they replace, deterministic tie handling,
  * tolerance/direction variants, and the plan shapes that make them
  * scale (no nested-loop join anywhere; as-of is join-free).
  */
class TemporalJoinSpec extends SparkTestBase {

  private lazy val ev = TableCatalog(spark, sfDir).events

  private lazy val purchases = ev.filter(col("event_type") === "purchase")
    .select(col("event_id"), col("user_id"), col("ts"), col("value"))
  private lazy val views = ev.filter(col("event_type") === "view")
    .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("v_id"))

  private def asofResult(direction: String): DataFrame =
    TemporalJoin.asOfJoin(purchases, views, Seq("user_id"),
      "ts", "v_ts", "v_id", Seq("v_id"), direction = direction)
      .select(col("event_id"), col("v_ts"), col("v_id"))

  /** Quadratic reference: inequality join + row_number, the formulation
    * the operator exists to avoid.
    */
  private def asofNaive(direction: String): DataFrame = {
    val cond = col("v.user_id") === col("p.user_id") &&
      (if (direction == "backward") col("v.v_ts") <= col("p.ts")
       else col("v.v_ts") >= col("p.ts"))
    val ord =
      if (direction == "backward") Seq(col("v_ts").desc, col("v_id").desc)
      else Seq(col("v_ts").asc, col("v_id").asc)
    purchases.as("p").join(views.as("v"), cond, "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p.event_id")).orderBy(ord: _*)))
      .filter(col("rn") === 1)
      .select(col("p.event_id"), col("v_ts"), col("v_id"))
  }

  test("as-of backward matches the naive inequality join") {
    val got = asofResult("backward").collect().toSet
    val want = asofNaive("backward").collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("as-of forward matches the naive inequality join") {
    val got = asofResult("forward").collect().toSet
    val want = asofNaive("forward").collect().toSet
    assert(got == want)
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val tieLeft = {
    import spark.implicits._
    Seq((1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")))
      .toDF("id", "k", "t")
  }
  private lazy val tieRight = {
    import spark.implicits._
    Seq((10L, ts("2024-01-01 10:00:00"), 100L, "a"),
      (10L, ts("2024-01-01 10:00:00"), 101L, "b"), // same instant, higher seq
      (10L, ts("2024-01-01 11:00:00"), 102L, "c"),
      (20L, ts("2024-01-01 09:30:00"), 103L, "d")) // after the only left row
      .toDF("k", "rt", "seq", "tag")
  }

  test("as-of ties: equal-time rows are visible; highest seq wins backward") {
    val out = TemporalJoin.asOfJoin(tieLeft, tieRight, Seq("k"),
      "t", "rt", "seq", Seq("tag"))
      .select(col("id"), col("tag")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // id 1: two right rows at exactly t — seq 101 ("b") wins
    assert(out(1L) == Some("b"))
    // id 2: latest at-or-before is 11:00 ("c")
    assert(out(2L) == Some("c"))
    // id 3: nothing at-or-before 09:00 — left row kept, null payload
    assert(out(3L) == None)
  }

  test("as-of forward ties: lowest seq wins; unmatched side flips") {
    val out = TemporalJoin.asOfJoin(tieLeft, tieRight, Seq("k"),
      "t", "rt", "seq", Seq("tag"), direction = "forward")
      .select(col("id"), col("tag")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == Some("a")) // equal instant, lowest seq
    assert(out(2L) == None)      // nothing at-or-after 12:00
    assert(out(3L) == Some("d")) // 09:30 is ahead of 09:00
  }

  test("as-of tolerance nulls far matches but keeps the left row") {
    val out = TemporalJoin.asOfJoin(tieLeft, tieRight, Seq("k"),
      "t", "rt", "seq", Seq("tag"),
      tolerance = Some(expr("INTERVAL 30 MINUTES")))
      .select(col("id"), col("tag")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == Some("b")) // distance 0 — inside tolerance
    assert(out(2L) == None)      // 11:00 is 60 min back — nulled
    assert(out.size == 3)        // every left row survives
  }

  test("as-of null timestamps: null right rows are dropped, null left rows match nothing") {
    import spark.implicits._
    val l = Seq((1L, 10L, Some(ts("2024-01-01 10:00:00"))),
      (2L, 10L, None: Option[Timestamp]))
      .toDF("id", "k", "t")
    val r = Seq((10L, Some(ts("2024-01-01 09:00:00")), 1L, "ok"),
      (10L, None: Option[Timestamp], 2L, "poison"))
      .toDF("k", "rt", "seq", "tag")
    for (dir <- Seq("backward", "forward")) {
      val out = TemporalJoin.asOfJoin(l, r, Seq("k"), "t", "rt", "seq",
        Seq("tag"), direction = dir)
        .select(col("id"), col("tag")).collect()
        .map(x => x.getLong(0) -> Option(x.getString(1))).toMap
      assert(out(2L) == None, s"dir=$dir")            // null left time
      assert(out(1L) != Some("poison"), s"dir=$dir")  // null right time
    }
  }

  test("as-of null keys never match — equi-join semantics, not null-groups-with-null") {
    import spark.implicits._
    val l = Seq((1L, Some(10L), ts("2024-01-01 10:00:00")),
      (2L, None: Option[Long], ts("2024-01-01 10:00:00")))
      .toDF("id", "k", "t")
    val r = Seq((Some(10L), ts("2024-01-01 09:00:00"), 1L, "ok"),
      (None: Option[Long], ts("2024-01-01 09:00:00"), 2L, "phantom"))
      .toDF("k", "rt", "seq", "tag")
    val out = TemporalJoin.asOfJoin(l, r, Seq("k"), "t", "rt", "seq", Seq("tag"))
      .select(col("id"), col("tag")).collect()
      .map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(out == Map(1L -> Some("ok"), 2L -> None))
  }

  test("as-of rejects a non-numeric seq column instead of a silent null tie-break") {
    intercept[IllegalArgumentException] {
      TemporalJoin.asOfJoin(tieLeft,
        tieRight.withColumn("seq", col("seq").cast("string")),
        Seq("k"), "t", "rt", "seq", Seq("tag"))
    }
  }

  test("as-of payload collision with a left column is rejected") {
    intercept[IllegalArgumentException] {
      TemporalJoin.asOfJoin(tieLeft, tieRight.withColumnRenamed("tag", "t"),
        Seq("k"), "t", "rt", "seq", Seq("t"))
    }
  }

  test("as-of plans one shuffle and zero join nodes") {
    val plan = asofResult("backward").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly 1 shuffle:\n$plan")
  }

  private lazy val clicks = ev.filter(col("event_type") === "click")
    .select(col("event_id"), col("user_id"), col("ts"))
  private lazy val purch2 = ev.filter(col("event_type") === "purchase")
    .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))

  test("range join matches the naive theta-join, including bucket boundaries") {
    val got = TemporalJoin.rangeJoinPairs(clicks, purch2, Seq("user_id"),
        "ts", "p_ts", Seq("p_value"), widthSec = 21600L)
      .select(col("event_id"), col("p_ts"), col("p_value"))
      .collect().toSet
    val want = clicks.as("c").join(purch2.as("p"),
        col("p.user_id") === col("c.user_id") &&
          col("p_ts") > col("ts") &&
          col("p_ts") <= col("ts") + expr("INTERVAL 6 HOURS"))
      .select(col("event_id"), col("p_ts"), col("p_value"))
      .collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("range join pairs are unique per (left, right) row") {
    val out = TemporalJoin.rangeJoinPairs(clicks, purch2, Seq("user_id"),
      "ts", "p_ts", Seq("p_value"), widthSec = 21600L)
    assert(out.count() ==
      out.select(col("event_id"), col("p_ts"), col("p_value")).distinct().count())
  }

  test("randomized: as-of and range joins match the naive joins on adversarial data") {
    import spark.implicits._
    // seeded generator: tight key domain + second-granularity times
    // force heavy (key, time) collisions — the tie/boundary cases
    val rnd = new scala.util.Random(42)
    val lRows = (1L to 300L).map(i =>
      (i, rnd.nextInt(5).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(600) * 1000L)))
    val rRows = (1L to 300L).map(i =>
      (rnd.nextInt(5).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(600) * 1000L), i,
        s"p$i"))
    val l = lRows.toDF("id", "k", "t")
    val r = rRows.toDF("k", "rt", "seq", "tag")
    for (dir <- Seq("backward", "forward")) {
      val got = TemporalJoin.asOfJoin(l, r, Seq("k"), "t", "rt", "seq",
          Seq("tag"), direction = dir)
        .select(col("id"), col("rt"), col("tag")).collect()
        .map(x => (x.getLong(0), x.get(1), x.get(2))).toSet
      val cond = col("r.k") === col("l.k") &&
        (if (dir == "backward") col("rt") <= col("t") else col("rt") >= col("t"))
      val ord =
        if (dir == "backward") Seq(col("rt").desc, col("seq").desc)
        else Seq(col("rt").asc, col("seq").asc)
      val want = l.as("l").join(r.as("r"), cond, "left")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("l.id")).orderBy(ord: _*)))
        .filter(col("rn") === 1)
        .select(col("id"), col("rt"), col("tag")).collect()
        .map(x => (x.getLong(0), x.get(1), x.get(2))).toSet
      assert(got == want, s"direction=$dir")
    }
    for (w <- Seq(1L, 59L, 60L, 3600L)) {
      val got = TemporalJoin.rangeJoinPairs(l, r, Seq("k"), "t", "rt",
          Seq("seq", "tag"), widthSec = w)
        .select(col("id"), col("seq")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = l.as("l").join(r.as("r"),
          col("r.k") === col("l.k") && col("rt") > col("t") &&
            col("rt") <= col("t") + expr(s"INTERVAL $w SECONDS"))
        .select(col("id"), col("seq")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == want, s"width=$w")
    }
  }

  test("range join plans an equi-join — no nested loop, no cartesian") {
    val plan = TemporalJoin.rangeJoinPairs(clicks, purch2, Seq("user_id"),
        "ts", "p_ts", Seq("p_value"), widthSec = 21600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("salted range join emits identical pairs for any salt, still as an equi-join") {
    val unsalted = TemporalJoin.rangeJoinPairs(clicks, purch2, Seq("user_id"),
        "ts", "p_ts", Seq("p_value"), widthSec = 21600L)
      .select(col("event_id"), col("p_ts"), col("p_value")).collect().toSet
    for (s <- Seq(2, 4, 7)) {
      val salted = TemporalJoin.rangeJoinPairs(clicks, purch2, Seq("user_id"),
          "ts", "p_ts", Seq("p_value"), widthSec = 21600L, salt = s)
      assert(salted.select(col("event_id"), col("p_ts"), col("p_value"))
        .collect().toSet == unsalted, s"salt=$s")
      val plan = salted.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      // the salt is part of the shuffle key: a hot (key, bucket) cell
      // now spreads across `s` reducers
      assert(plan.contains("__s"), plan)
    }
    intercept[IllegalArgumentException] {
      TemporalJoin.rangeJoinPairs(clicks, purch2, Seq("user_id"),
        "ts", "p_ts", Seq("p_value"), widthSec = 21600L, salt = 0)
    }
  }

  test("temporal joins reject user columns under the reserved __ prefix") {
    val badLeft = clicks.withColumnRenamed("event_id", "__id")
    intercept[IllegalArgumentException] {
      TemporalJoin.rangeJoinPairs(badLeft, purch2, Seq("user_id"),
        "ts", "p_ts", Seq("p_value"), widthSec = 60L)
    }
    intercept[IllegalArgumentException] {
      TemporalJoin.asOfJoin(badLeft, purch2, Seq("user_id"),
        "ts", "p_ts", "p_value", Seq("p_value"))
    }
  }
}
