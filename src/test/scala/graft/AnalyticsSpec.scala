package graft

import graft.operators.Analytics
import graft.sources.TableCatalog

class AnalyticsSpec extends SparkTestBase {

  private lazy val t = TableCatalog(spark, sfDir)

  test("driver contract: SparkEntry.entry returns rows (the smoke check the driver runs)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 pricing summary has the 2x2 flag/status groups with positive sums") {
    val rows = Analytics.pricingSummary(t.lineitem).collect()
    assert(rows.length >= 4)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q6 revenue is a single positive scalar") {
    val rows = Analytics.revenueForecast(t.lineitem).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Double]("revenue") > 0)
  }

  test("q3 returns at most 10 rows ordered by revenue desc") {
    val rows = Analytics.shippingPriority(t.customer, t.orders, t.lineitem).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val rev = rows.map(_.getAs[Double]("revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("q5 covers every nation with customers+suppliers co-located") {
    val rows = Analytics.localVolume(t.region, t.nation, t.customer,
      t.supplier, t.orders, t.lineitem).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("n_name")).distinct.length == rows.length)
  }

  test("events funnel: converted iff purchases>0, only signed-up users") {
    val rows = Analytics.eventsFunnel(t.events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("converted") == (r.getAs[Long]("purchases") > 0))
    }
  }

  test("ordered funnel: steps only count at-or-after the previous step") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(h: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      // user 1: signup → view → purchase, in order: steps = 3
      (1L, "signup", ts(1)), (1L, "view", ts(2)), (1L, "purchase", ts(3)),
      // user 2: purchase BEFORE the qualifying view: steps = 2
      (2L, "signup", ts(1)), (2L, "purchase", ts(2)), (2L, "view", ts(3)),
      // user 3: view BEFORE signup, nothing after: steps = 1
      (3L, "view", ts(1)), (3L, "signup", ts(2)),
      // user 4: never signs up — excluded (no anchor step)
      (4L, "view", ts(1)), (4L, "purchase", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val got = Analytics.orderedFunnel(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("steps")).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1), s"got $got")
  }

  test("ordered funnel: the events table crosses the wire once") {
    val plan = Analytics.orderedFunnel(
        graft.sources.TableCatalog(spark, sfDir).events)
      .queryExecution.executedPlan.toString
    // chained windows + the per-user collapse all reuse one user_id
    // hash exchange
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
  }

  test("trending types: top-3 per day by count, alphabetical ties, losers cut") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int, h: Int): Timestamp =
      Timestamp.valueOf(f"2024-03-0$day $h%02d:00:00")
    val ev = (
      Seq.fill(3)(("view", 1)) ++ Seq.fill(2)(("click", 1)) ++
        Seq.fill(2)(("signup", 1)) ++ Seq.fill(1)(("purchase", 1)) ++
        Seq.fill(2)(("view", 2))
      ).zipWithIndex.map { case ((t, d), i) => (i.toLong, t, ts(d, i % 24)) }
      .toDF("user_id", "event_type", "ts")
    val got = Analytics.trendingTypes(ev).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getString(1), r.getLong(2), r.getInt(3)))
    val d1 = got.filter(_._1 == "2024-03-01").sortBy(_._4)
    // click=2 vs signup=2 tie → click first alphabetically; purchase cut
    assert(d1.map(t => (t._2, t._3, t._4)).toSeq ==
      Seq(("view", 3L, 1), ("click", 2L, 2), ("signup", 2L, 3)), d1.toSeq)
    assert(got.filter(_._1 == "2024-03-02").map(_._2).toSeq == Seq("view"))
  }

  test("retention cohorts: hand-built events — never-signed-up and pre-signup activity excluded") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int): Timestamp = // Mon 2024-01-01 + day
      Timestamp.valueOf(f"2024-01-${1 + day}%02d 12:00:00")
    val ev = Seq(
      // user 1: signs up week 0, active weeks 0 and 2
      (1L, "signup", ts(0)), (1L, "view", ts(15)),
      // user 2: signs up week 0, active week 0 only
      (2L, "signup", ts(2)),
      // user 3: never signs up — excluded entirely
      (3L, "view", ts(0)), (3L, "purchase", ts(8)),
      // user 4: active week 0 BEFORE signing up in week 1 — the
      // pre-signup week must not count (offset would be negative)
      (4L, "view", ts(1)), (4L, "signup", ts(9))
    ).toDF("user_id", "event_type", "ts")
    val got = Analytics.retentionCohorts(ev).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
        r.getAs[Int]("week_offset"), r.getAs[Long]("n_active"))).toSet
    assert(got == Set(
      ("2024-01-01", 0, 2L), // users 1 and 2 active in their cohort week
      ("2024-01-01", 2, 1L), // user 1 returns in week 2
      ("2024-01-08", 0, 1L)  // user 4's cohort starts at the signup week
    ), s"got $got")
  }

  test("retention cohorts on testdata: one shuffle of event rows, offsets non-negative") {
    val df = Analytics.retentionCohorts(t.events)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("week_offset") >= 0))
    // cohort_week 0-offset row exists for every cohort (signup week
    // itself always has the signup event)
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_week"))
    byCohort.foreach { case (_, rs) =>
      assert(rs.exists(_.getAs[Int]("week_offset") == 0))
    }
    // plan: no self-join of events — the events relation is scanned
    // once (count only the AQE final plan, not the echoed initial one)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 1, s"events scanned $scans times:\n$plan")
  }
}
