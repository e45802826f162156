package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit Morton (Z-order) code of two 16-bit coordinates: bit i of
  * `x` lands at z-bit 2i, bit i of `y` at 2i+1. The data-layout
  * primitive for multi-dimensional clustering: sorting/bucketing by
  * the interleaved code keeps BOTH dimensions locally dense in every
  * z-range, so per-file min/max stats prune scans on either predicate
  * (the trick behind Delta/Iceberg Z-ORDER table layouts, here as a
  * first-class codegen'd expression). Inputs are masked to 16 bits;
  * all-integer, so any engine reproduces it bit-for-bit.
  */
case class BitInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint arguments")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "bit_interleave"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitInterleave.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitInterleave.morton($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitInterleave {
  /** Spread the low 16 bits of v to even bit positions (0,2,…,30). */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  def morton(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}
