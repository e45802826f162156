package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact int64 dot product of two long arrays — the codegen'd
  * replacement for the interpreted HOF chain
  * `aggregate(zip_with(c, w, (ci, wi) => ci * wi), 0L, (acc, x) => acc + x)`
  * on the classifier-training hot path (SURVEY.md §2 H20b). Catalyst
  * higher-order functions are CodegenFallback: every document paid
  * ~3·dims interpreted lambda invocations per GD step. Semantics
  * mirror the replaced chain bit-for-bit: exact int64 multiply/add
  * that THROWS on overflow (Math.multiplyExact/addExact — the ANSI
  * behavior of the replaced chain under the session default, and
  * unreachable in the classifier domain where counts × micro-weights
  * ≪ 2^63), and NULL exactly when the HOF chain yields NULL — any
  * null element (null product nulls the running sum) or a length
  * mismatch (zip_with pads the shorter side with nulls).
  */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot_long requires two array<bigint>, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = LongType

  // null when either input is null OR the element-wise chain nulls out
  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDotLong.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
         |java.lang.Long $boxed = graft.functions.VecDotLong.compute($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDotLong {
  /** Boxed so codegen/eval can express the HOF chain's null result. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null // zip_with pads with nulls
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      // exact ops: overflow throws, like the replaced HOF chain under
      // ANSI mode (the session default); never reached in the
      // classifier domain (counts × micro-weights ≪ 2^63)
      s = Math.addExact(s, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

/** The (dims+1)-long int64 micro-unit gradient vector of one logistic
  * GD example — the codegen'd replacement for the interpreted
  * `concat(array(round(err·10⁶)), transform(c, ci => round(err·ci·10⁶/n)))`
  * on the classifier-training hot path. Element arithmetic mirrors the
  * replaced Column chain operation for operation:
  * g[0]   = cast(round(err * 1e6) as long)
  * g[i+1] = cast(round(((err * c[i]) * 1e6) / n) as long)
  * with Spark `round` HALF_UP semantics via [[VecSumAgg.roundHalfUp]]
  * (proven bit-identical to round(double).cast(long) — same helper the
  * vector-sum aggregate uses). A null element of c yields a null
  * gradient element, exactly as `transform` maps null to null.
  *
  * ONE documented divergence from the replaced chain (ADVICE r16):
  * this expression extends TernaryExpression with default null
  * handling, so a NULL `err` or `n` yields a NULL ARRAY, whereas the
  * replaced `concat(array(round(err·1e6)), transform(...))` would
  * yield a non-null array whose ELEMENTS are null. Unreachable in the
  * training pipeline — err and n derive from non-null columns
  * (spec-pinned bit-identity covers the live domain) — but callers
  * reusing this kernel elsewhere must not feed nullable err/n.
  */
case class GradMicroVec(first: Expression, second: Expression,
                        third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (c, e, n) => TypeCheckResult.TypeCheckFailure(
        s"grad_micro_vec requires (array<bigint>, double, double), got " +
          s"${c.simpleString}, ${e.simpleString}, ${n.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "grad_micro_vec"

  override protected def nullSafeEval(c: Any, err: Any, n: Any): Any =
    GradMicroVec.compute(c.asInstanceOf[ArrayData],
      err.asInstanceOf[Double], n.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, e, n) =>
      s"${ev.value} = graft.functions.GradMicroVec.compute($c, $e, $n);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GradMicroVec {
  def compute(c: ArrayData, err: Double, n: Double): ArrayData = {
    val dims = c.numElements()
    val out = new Array[Any](dims + 1)
    out(0) = VecSumAgg.roundHalfUp(err * 1000000.0)
    var i = 0
    while (i < dims) {
      if (!c.isNullAt(i))
        out(i + 1) = VecSumAgg.roundHalfUp(((err * c.getLong(i)) * 1000000.0) / n)
      i += 1
    }
    new GenericArrayData(out)
  }
}
