package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hash60.hash60

/** Sketch operators with ENGINE-EXACT results — the 100 TB cardinality
  * path, built so a re-run on any engine/partitioning reproduces the
  * estimate bit-for-bit (unlike Spark's approx_count_distinct or
  * DuckDB's, whose HLL internals differ):
  *
  *  - the item hash is the shared md5-60bit scheme;
  *  - HLL registers are a plain groupBy-max (one partial-agg shuffle
  *    of at most `m` rows per group);
  *  - the register sum Σ 2^(-rho) is kept as the EXACT INTEGER
  *    Σ 2^(53-rho) (≤ m·2^53, fits int64), so no floating-point
  *    reassociation can change it — the only FP op is one final
  *    division, which IEEE defines exactly.
  */
object Sketches {

  /** Per-group HLL distinct estimate with 2^p registers.
    *
    * Output: `groupCols` + `registers_used`, `reg_sum` (the exact
    * integer register sum), and `hll_est` — the standard estimator
    * with the linear-counting small-range correction (E ≤ 2.5m with
    * empty registers → m·ln(m/V)); the branch condition is computed
    * from exact integers so both engines take the same branch, and
    * the single ln() rounds at 4 decimals (a 1-ulp libm difference
    * cannot cross a 1e-4 boundary in practice). No large-range
    * correction: a 60-bit hash space never saturates it.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], itemCol: Column,
                  p: Int = 8): DataFrame =
    hllFinish(hllRegisters(df, groupCols, itemCol, p), groupCols, p)

  /** The MERGEABLE half of [[hllDistinct]]: per (group, bucket) max-ρ
    * registers — the sketch STATE. One groupBy-max, so it runs
    * unchanged on a STREAMING frame (a single aggregation — the
    * estimator half is stateless and applies to the sink), and two
    * register tables merge by plain max per (group, bucket): the
    * persist-today-merge-tomorrow property a 100 TB cardinality
    * ledger needs (store m rows per group per day; union+max gives
    * any date range's registers without re-scanning a byte of
    * corpus). E20's streamed ≡ batch spec rides exactly this.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], itemCol: Column,
                   p: Int = 8): DataFrame = {
    // p >= 8 keeps rho <= 53 so the exact-integer register term
    // 2^(53-rho) never needs a negative shift (Java shifts mod 64
    // would silently corrupt reg_sum for p < 8).
    require(p >= 8 && p <= 16, "p in [8,16]")
    val m = 1 << p
    val h = hash60(itemCol.cast("string"))
    val bucket = pmod(h, lit(m.toLong))
    // w = the hash bits above the bucket index (60-p of them);
    // rho = 1 + leading zeros of w within that width
    //     = (61 - p) - bit_length(w), with bit_length(0) = 0 covering
    // the w = 0 case. bit_length via the native codegen'd
    // [[graft.functions.LongBitLen]] (64 - numberOfLeadingZeros) —
    // integer-exact like length(bin(w)) but with no per-row string
    // allocation.
    val w = shiftright(h, p) // h is 60-bit positive: logical shift
    val width = 60 - p
    val rho = lit(width + 1) - org.apache.spark.sql.GraftBridge.column(
      graft.functions.LongBitLen(org.apache.spark.sql.GraftBridge.expression(w)))
    df.groupBy((groupCols.map(col) :+ bucket.as("__bucket")): _*)
      .agg(max(rho).as("__rho"))
  }

  /** The stateless estimator half of [[hllDistinct]], applied to a
    * register table (fresh, merged, or read back from a sink).
    */
  def hllFinish(regs: DataFrame, groupCols: Seq[String],
                p: Int = 8): DataFrame = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("registers_used"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - __rho)")).as("__obs_sum"))
      .withColumn("reg_sum",
        col("__obs_sum") +
          (lit(m.toLong) - col("registers_used")) * lit(1L << 53))
      .withColumn("__raw",
        lit(alpha * m.toDouble * m.toDouble * (1L << 53).toDouble) /
          col("reg_sum"))
      .withColumn("hll_est",
        round(
          when(col("registers_used") < m && col("__raw") <= 2.5 * m,
            lit(m.toDouble) *
              log(lit(m.toDouble) / (lit(m.toLong) - col("registers_used"))))
            .otherwise(col("__raw")), 4))
      .drop("__obs_sum", "__raw")
  }
}
