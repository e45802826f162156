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
}
