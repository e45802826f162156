package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Headline analytics (SURVEY.md §2 group I): TPC-H-style anchors used
  * to benchmark the engine's scan/agg/join paths.
  *
  * Numeric convention (SURVEY.md §6): money math is done in exact
  * DECIMAL and cast to DOUBLE only at the output boundary, so results
  * are bit-identical to the DuckDB oracle regardless of aggregation
  * order — which also means the plan is free to use partial (map-side)
  * aggregation at any parallelism.
  */
object Analytics {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** I1: pricing summary — wide aggregate over lineitem.
    * One shuffle on the (tiny-cardinality) grouping key; partial
    * aggregation makes the shuffle O(groups × partitions).
    */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        // scale-4/6 sums are rounded to CENTS before the double cast:
        // at sf1+ a 17-significant-digit decimal exceeds double's
        // mantissa, and DuckDB's decimal->double cast is off by 1 ulp
        // there (int128/10^scale through float), while a cents-rounded
        // sum stays exactly representable on both engines at any SF
        round(sum(dec("l_extendedprice") * (one - dec("l_discount"))), 2)
          .cast("double").as("sum_disc_price"),
        round(sum(dec("l_extendedprice") * (one - dec("l_discount")) *
            (one + dec("l_tax"))), 2).cast("double").as("sum_charge"),
        (sum(dec("l_quantity")).cast("double") / count(lit(1)))
          .as("avg_qty"),
        (sum(dec("l_extendedprice")).cast("double") / count(lit(1)))
          .as("avg_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** I4: revenue forecast — selective filter + single scalar agg.
    * Filter and 3-column projection push into the parquet scan.
    */
  def revenueForecast(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.09) &&
        col("l_quantity") < lit(25)
      )
      .agg(sum(dec("l_extendedprice") * dec("l_discount"))
        .cast("double").as("revenue"))

  /** I2: shipping priority — orders⋈customer⋈lineitem, top-10 revenue.
    * customer scales with the data (not broadcastable at 100 TB): the
    * filtered projection shuffles on custkey, then orders⋈lineitem
    * shuffles on orderkey (the key both sides would be bucketed by at
    * scale). AQE may still downgrade either join to broadcast when the
    * filtered side is small at runtime.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    customer.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec("l_extendedprice") * (one - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** I3: volume by nation — 6-way join. region/nation have fixed tiny
    * cardinality → hard broadcast; customer/supplier scale with the
    * data → shuffle joins on their keys (AQE downgrades to broadcast
    * when a runtime side is actually small). Shuffles: lineitem⋈orders
    * (orderkey), ⋈customer (custkey), ⋈supplier (suppkey), final tiny
    * groupBy.
    */
  def localVolume(region: DataFrame, nation: DataFrame,
                  customer: DataFrame, supplier: DataFrame,
                  orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    val custDim = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "c_nationkey", "n_name")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(custDim, col("o_custkey") === col("c_custkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec("l_extendedprice") * (one - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** I6: EXACT per-group quantiles by global rank within the group —
    * no sketch, no approx_percentile nondeterminism. One window
    * shuffle partitioned by the group key (parallel across groups at
    * any scale); the quantile is the element at rank ⌈p·n⌉ under a
    * total (value, tiebreak) order, so every engine computes the
    * same answer. For a single giant group, swap the window for the
    * bucketAuto-style range-partitioned zipWithIndex ranking.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     tieCol: String, ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val aggs = ps.map { p =>
      val name = s"p${(p * 100).round}"
      max(when(col("__rn") === ceil(lit(p) * col("__n")), col(valueCol)))
        .as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** I5: signup→purchase funnel per user, no self-join: one pass with
    * conditional aggregation keyed by user_id.
    */
  def eventsFunnel(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        count(when(col("event_type") === "purchase", lit(1))).as("purchases"),
        sum(when(col("event_type") === "purchase", dec("value")))
          .cast("double").as("purchase_value")
      )
      .filter(col("first_signup").isNotNull)
      .select(
        col("user_id"), col("purchases"),
        coalesce(col("purchase_value"), lit(0.0)).as("purchase_value"),
        (col("purchases") > 0).as("converted")
      )
      .orderBy(col("user_id"))

  /** I5b: ORDERED multi-step funnel — signup → first view at-or-after
    * the signup → first purchase at-or-after that view, the classic
    * product-analytics funnel where step k only counts if it happens
    * after step k−1 (unlike [[eventsFunnel]]'s order-blind counts).
    *
    * No events self-join: each step's timestamp is a conditional
    * window-min over the user partition, and because every window and
    * the final per-user collapse share the `user_id` key, the events
    * table crosses the wire ONCE — the three chained Window operators
    * and the groupBy all reuse the single hash exchange (the plan
    * shows one Exchange; at 100 TB this is the same one-shuffle
    * contract as I5/I9). Step-3's condition reads step-2's column, so
    * a purchase before the qualifying view can never count.
    */
  def orderedFunnel(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    val staged = events
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "view" && col("ts") >= col("t1"),
          col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") >= col("t2"),
          col("ts"))).over(w))
    staged.filter(col("t1").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1m"), min(col("t2")).as("t2m"),
        min(col("t3")).as("t3m"))
      .select(col("user_id"),
        unix_micros(col("t1m")).as("t1_us"),
        unix_micros(col("t2m")).as("t2_us"),
        unix_micros(col("t3m")).as("t3_us"),
        (lit(1) + when(col("t2m").isNotNull, 1).otherwise(0) +
          when(col("t3m").isNotNull, 1).otherwise(0)).cast("int").as("steps"))
  }

  /** I10: daily trending event types — top-3 per day by count with
    * deterministic ties. The rank window runs over the AGGREGATED
    * (day, type) frame — rows = days × event types, so partitions are
    * calendar-bounded at any corpus scale; the only corpus-sized work
    * is the map-side-combined groupBy.
    */
  def trendingTypes(events: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("day"))
          .orderBy(col("n").desc, col("event_type").asc_nulls_last)))
      .filter(col("rnk") <= k)
      .withColumn("rnk", col("rnk").cast("int"))
  }

  /** I9: weekly retention cohorts — the classic activation read-out
    * (cohort = the ISO week of a user's first signup; a cohort
    * member is ACTIVE in week-offset k if they produced any event
    * that week): one row per (cohort_week, week_offset) with the
    * distinct active-user count.
    *
    * Shape: ONE shuffle on user_id — first-signup and the user's
    * distinct active weeks come out of the same conditional
    * aggregate (`collect_set` of week starts, map-side combined and
    * bounded by the calendar, ~52 entries/user/year — never raw
    * events), the per-user week set explodes AFTER the aggregate,
    * and the final (cohort, offset) rollup is a tiny second shuffle
    * over |cohorts|·|offsets| combined rows. No self-join of the
    * events table, no window. Pre-signup activity is excluded
    * (offset ≥ 0 only). Weeks truncate to Monday (`date_trunc
    * 'week'`) identically in Spark and the oracle, so offsets are
    * exact multiples of 7 days.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val perUser = events
      .select(col("user_id"),
        when(col("event_type") === "signup", col("ts")).as("__s"),
        date_trunc("week", col("ts")).as("__w"))
      .groupBy(col("user_id"))
      .agg(min(col("__s")).as("__first"),
        collect_set(col("__w")).as("__ws"))
      .filter(col("__first").isNotNull)
    perUser
      .select(col("user_id"),
        date_trunc("week", col("__first")).cast("date").as("cohort_week"),
        explode(col("__ws")).as("__aw0"))
      .select(col("cohort_week"), col("__aw0").cast("date").as("__aw"))
      .filter(col("__aw") >= col("cohort_week"))
      .groupBy(col("cohort_week"),
        (datediff(col("__aw"), col("cohort_week")).cast("long")
          .divide(lit(7)).cast("int")).as("week_offset"))
      // one row per (user, active week) reaches this aggregate, so
      // plain count() IS the distinct active-user count
      .agg(count(lit(1)).as("n_active"))
  }
}
