package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

import graft.functions.VecSumAgg
import graft.sources.TableCatalog

/** [[graft.functions.VecSumAgg]] — the vector-summing aggregate that
  * replaced the posexplode-then-combine shape in G17/G19/G20/H20b.
  * The contract is BIT-IDENTITY with the exploded plan, which rests
  * on roundHalfUp exactly reproducing Spark `round` (decimal HALF_UP
  * via BigDecimal shortest-repr) — both are asserted here.
  */
class VecSumSpec extends SparkTestBase {

  private lazy val emb = TableCatalog(spark, sfDir).embeddings

  test("roundHalfUp matches Spark round (BigDecimal HALF_UP) on adversarial doubles") {
    def sparkRound(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble.toLong
    // exact half-integers, both signs, both parities (HALF_UP vs
    // round-to-even would diverge here)
    for (k <- -5L to 5L) {
      val x = k + 0.5
      assert(VecSumAgg.roundHalfUp(x) == sparkRound(x), s"x=$x")
      assert(VecSumAgg.roundHalfUp(-x) == sparkRound(-x), s"x=${-x}")
    }
    // floats scaled by 2^20 — the exact shape every call site feeds in
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < 200000) {
      val f = (rnd.nextFloat() * 2 - 1) * (if (i % 3 == 0) 1e-4f else 1f)
      val x = f.toDouble * 1048576.0
      assert(VecSumAgg.roundHalfUp(x) == sparkRound(x), s"f=$f x=$x")
      i += 1
    }
    // values straddling half-integer boundaries by one ulp
    for (base <- Seq(2.5, -2.5, 1048576.5, -1048576.5, 0.5, -0.5);
         x <- Seq(Math.nextDown(base), base, Math.nextUp(base))) {
      assert(VecSumAgg.roundHalfUp(x) == sparkRound(x), s"x=$x")
    }
  }

  test("vec_sum over float arrays is bit-identical to the posexplode-sum plan") {
    val Scale = 1048576.0
    val viaAgg = emb.groupBy(col("label"))
      .agg(GraftBridge.column(VecSumAgg(
        GraftBridge.expression(col("embedding")), Scale)
        .toAggregateExpression()).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val viaExplode = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy(col("label"), col("d"))
      .agg(sum(round(col("v").cast("double") * Scale).cast("long")).as("s"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("d"), col("s")))).as("a"))
      .select(col("label"), transform(col("a"), _.getField("s")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(viaAgg.keySet == viaExplode.keySet)
    viaAgg.foreach { case (k, v) => assert(v == viaExplode(k), s"label $k") }
  }

  test("vec_sum over long arrays adds element-wise; nulls skip; layout-invariant") {
    import spark.implicits._
    val df = Seq(
      (1, Seq[java.lang.Long](1L, 2L, 3L)),
      (1, Seq[java.lang.Long](10L, null, 30L)),
      (2, Seq[java.lang.Long](5L, 5L, 5L))).toDF("g", "v")
    def run(parts: Int) = df.repartition(parts).groupBy(col("g"))
      .agg(GraftBridge.column(VecSumAgg(
        GraftBridge.expression(col("v")), 1.0).toAggregateExpression()).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    for (p <- Seq(1, 3, 7)) {
      val out = run(p)
      assert(out(1) == Seq(11L, 2L, 33L), s"parts=$p: ${out(1)}")
      assert(out(2) == Seq(5L, 5L, 5L))
    }
  }

  test("vec_sum rejects mismatched vector lengths loudly") {
    import spark.implicits._
    val df = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("v").coalesce(1)
    val ex = intercept[Exception] {
      df.groupBy().agg(GraftBridge.column(VecSumAgg(
        GraftBridge.expression(col("v")), 1.0).toAggregateExpression()).as("s"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("dimension mismatch")), ex.toString)
  }
}
