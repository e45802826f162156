package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise exact int64 vector sum — the aggregate that replaces
  * the posexplode-then-combine shape in the exact centroid/gradient
  * family (SURVEY.md §2 G17/G19/G20/H20b): instead of exploding each
  * d-dim vector into d narrow (dim, long) rows and re-assembling with
  * `collect_list → array_sort → transform`, the whole per-group state
  * is ONE Array[Long] buffer updated in place. Map-side partials ship
  * one d·8-byte buffer per group per partition — no transient d× row
  * inflation at any corpus size.
  *
  * Input element handling mirrors the plan it replaces exactly:
  *   - float/double elements quantize as `round(v · scale)` with
  *     Spark `round` semantics (decimal HALF_UP — see
  *     [[VecSumAgg.roundHalfUp]]) before the integer sum, so results
  *     are bit-identical to `sum(round(v * scale).cast("long"))`
  *     per exploded dimension;
  *   - long elements (pre-rounded micro-unit gradients) add as-is
  *     (`scale` is ignored);
  *   - null elements skip (SQL `sum` null-skip per dimension), null
  *     arrays contribute nothing (posexplode drops them).
  *
  * All input vectors of a group must share one length (the dense
  * fixed-dim contract every call site already holds); a mismatch
  * fails loudly rather than mis-aligning dimensions.
  */
case class VecSumAgg(
    child: Expression,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumAgg.Buffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_sum"

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum requires array<float|double|long>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): VecSumAgg.Buffer =
    new VecSumAgg.Buffer

  override def update(buf: VecSumAgg.Buffer, input: InternalRow): VecSumAgg.Buffer = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val sums = buf.ensure(n)
      var i = 0
      elemType match {
        case FloatType =>
          while (i < n) {
            if (!arr.isNullAt(i))
              sums(i) += VecSumAgg.roundHalfUp(arr.getFloat(i).toDouble * scale)
            i += 1
          }
        case DoubleType =>
          while (i < n) {
            if (!arr.isNullAt(i))
              sums(i) += VecSumAgg.roundHalfUp(arr.getDouble(i) * scale)
            i += 1
          }
        case LongType =>
          while (i < n) {
            if (!arr.isNullAt(i)) sums(i) += arr.getLong(i)
            i += 1
          }
        case other => throw new IllegalStateException(s"vec_sum over $other")
      }
    }
    buf
  }

  override def merge(buf: VecSumAgg.Buffer, other: VecSumAgg.Buffer): VecSumAgg.Buffer = {
    if (other.sums != null) {
      val sums = buf.ensure(other.sums.length)
      var i = 0
      while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
    }
    buf
  }

  override def eval(buf: VecSumAgg.Buffer): Any =
    if (buf.sums == null) null else new GenericArrayData(buf.sums)

  override def serialize(buf: VecSumAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buf.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buf.sums.length)
      var i = 0
      while (i < buf.sums.length) { out.writeLong(buf.sums(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumAgg.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new VecSumAgg.Buffer
    val n = in.readInt()
    if (n >= 0) {
      val sums = buf.ensure(n)
      var i = 0
      while (i < n) { sums(i) = in.readLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object VecSumAgg {

  final class Buffer {
    var sums: Array[Long] = null
    def ensure(n: Int): Array[Long] = {
      if (sums == null) sums = new Array[Long](n)
      else require(sums.length == n,
        s"vec_sum dimension mismatch: ${sums.length} vs $n")
      sums
    }
  }

  /** Spark `round(x)` for doubles, as a long. Spark rounds through
    * `BigDecimal.valueOf(x).setScale(0, HALF_UP)` — i.e. HALF_UP on
    * the SHORTEST DECIMAL representation. For |x| < 2^52 that equals
    * away-from-zero rounding on the exact binary value: every
    * half-integer k+0.5 in range is exactly representable, and a
    * shortest repr round-trips, so x and its repr always sit on the
    * same side of (or exactly on) any half-integer boundary. The
    * floor subtraction below is exact (Sterbenz), so the >= 0.5
    * comparison is exact — no BigDecimal/toString allocation in the
    * per-element hot path. NaN maps to 0, matching non-ANSI
    * `cast(double as long)`.
    */
  def roundHalfUp(x: Double): Long = {
    val a = math.abs(x)
    val f = math.floor(a)
    var n = f.toLong
    if (a - f >= 0.5) n += 1
    if (x < 0) -n else n
  }
}
