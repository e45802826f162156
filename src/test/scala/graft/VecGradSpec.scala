package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

import graft.functions.{GradMicroVec, VecDotLong}

/** [[graft.functions.VecDotLong]] / [[graft.functions.GradMicroVec]] —
  * the codegen'd kernels that replaced the interpreted HOF chains on
  * the classifier-training hot path (H20b). The contract is
  * BIT-IDENTITY with the HOF plans they replaced, including null and
  * length-mismatch behavior, asserted by evaluating both expression
  * forms over the same frame.
  */
class VecGradSpec extends SparkTestBase {

  import spark.implicits._

  private def hofDot = aggregate(
    zip_with(col("c"), col("w"), (ci, wi) => ci * wi),
    lit(0L), (acc, x) => acc + x)

  private def nativeDot = GraftBridge.column(VecDotLong(
    GraftBridge.expression(col("c")), GraftBridge.expression(col("w"))))

  test("vec_dot_long is bit-identical to aggregate(zip_with(...)) incl. nulls") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      val d = 1 + rnd.nextInt(70)
      val c = Array.fill(d)(rnd.nextLong() % 1000000L)
      val w = Array.fill(d)(rnd.nextLong() % 1000000L)
      (i, c, w)
    }
    val df = rows.toDF("id", "c", "w")
    val both = df.select(col("id"), hofDot.as("hof"), nativeDot.as("nat"))
      .collect()
    both.foreach(r => assert(r.get(1) == r.get(2), s"id=${r.get(0)}"))

    // null element → null (null product nulls the HOF running sum)
    val withNull = Seq((1, Seq(Some(1L), None, Some(3L)),
        Seq(Some(4L), Some(5L), Some(6L))))
      .toDF("id", "c", "w")
    val rn = withNull.select(hofDot.as("hof"), nativeDot.as("nat")).head()
    assert(rn.isNullAt(0) && rn.isNullAt(1))

    // length mismatch → null (zip_with pads the shorter side)
    val mismatch = Seq((1, Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("id", "c", "w")
    val rm = mismatch.select(hofDot.as("hof"), nativeDot.as("nat")).head()
    assert(rm.isNullAt(0) && rm.isNullAt(1))

    // overflow fails loudly on both paths (ANSI session default: the
    // HOF multiply throws; the native uses Math.multiplyExact)
    val ovf = Seq((1, Seq(Long.MaxValue, 7L), Seq(3L, 11L))).toDF("id", "c", "w")
    intercept[Exception](ovf.select(hofDot.as("x")).collect())
    intercept[Exception](ovf.select(nativeDot.as("x")).collect())
  }

  test("grad_micro_vec is bit-identical to the concat/transform chain") {
    def hofGrad = concat(
      array(round(col("err") * lit(1000000.0)).cast("long")),
      transform(col("c"), ci =>
        round(col("err") * ci.cast("double") * lit(1000000.0) / col("n"))
          .cast("long")))
    def nativeGrad = GraftBridge.column(GradMicroVec(
      GraftBridge.expression(col("c")), GraftBridge.expression(col("err")),
      GraftBridge.expression(col("n"))))
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { i =>
      val d = 1 + rnd.nextInt(70)
      val c = Array.fill(d)(rnd.nextLong() % 400L)
      // err in [-1, 1] like a sigmoid residual; adversarial halves too
      val err = if (i % 7 == 0) 0.5 else rnd.nextDouble() * 2 - 1
      val n = 1.0 + rnd.nextInt(200)
      (i, c, err, n)
    }
    val df = rows.toDF("id", "c", "err", "n")
    val both = df.select(col("id"), hofGrad.as("hof"), nativeGrad.as("nat"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"id=${r.get(0)}")
    }

    // null element of c maps to null element, like transform
    val withNull = Seq((1, Seq(Some(10L), None, Some(30L)), 0.25, 5.0))
      .toDF("id", "c", "err", "n")
    val rn = withNull.select(hofGrad.as("hof"), nativeGrad.as("nat")).head()
    assert(rn.getSeq[Any](0) == rn.getSeq[Any](1))
  }
}
