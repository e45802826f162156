package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StructField, StructType}

/** Shared exact quantization for the PQ family (SURVEY.md §2 G19):
  * `round(x · 2²⁰)` with HALF_UP ties, as int64.
  *
  * EXACTNESS ARGUMENT (why a `Math.floor` beats `BigDecimal` here
  * without changing one bit): every input is a float widened to
  * double (≤ 24 significant bits) and the scale is a power of two,
  * so `x · 2²⁰` is computed EXACTLY; adding ±0.5 spans ≤ 25
  * significant bits — still exact — so floor/ceil give the true
  * HALF_UP result, identical to Spark's `Round` (BigDecimal HALF_UP
  * of the same exact value) and to the DuckDB oracle's `round()`.
  * No decimal stringification, no allocation, JIT-friendly.
  */
object PqQuant {
  val Scale = 1048576.0 // 2^20
  def quantize(x: Double): Long = {
    val s = x * Scale
    if (s >= 0) math.floor(s + 0.5).toLong else math.ceil(s - 0.5).toLong
  }
}

/** Native PQ encoder against a LITERAL codebook (SURVEY.md §2 G19) —
  * the per-vector nearest-codeword assignment as ONE tight primitive
  * loop instead of a broadcast join + keyed argmin exchange (the
  * pre-round-13 shape) or an unrolled expression forest (whose
  * per-element `Round` costs a BigDecimal each): at 100 TB the
  * encode pass is a full-corpus scan, so it must run at memory
  * bandwidth, map-side, with zero shuffles.
  *
  * Codebook layout (driver-precomputed, bit-exact int64):
  *  - `subOff`: size m+1, candidate range [subOff(i), subOff(i+1))
  *    of subspace i in flat (sub ASC, cid ASC) position order;
  *  - `codeIds`: flat candidate → cid;
  *  - `qcw`: flat candidate-major quantized codewords
  *    (qcw(c·dsub + j) = round(cvec_j · 2²⁰)).
  *
  * Per subspace the argmin iterates candidates in cid ASC order with
  * a strict `<`, which IS the (dist ASC, cid ASC) tie rule of the
  * join-shaped plan (`min_by(cid, struct(dist, cid))`). Returns a
  * struct (cids array<int>, pos array<int>, dsum bigint): cids feed
  * the code string, pos the ADC scan's LUT indices, dsum the
  * quantization error — all three readouts from one evaluation.
  */
case class PqEncode(child: Expression, m: Int, dsub: Int,
                    subOff: Seq[Int], codeIds: Seq[Int], qcw: Seq[Long])
    extends UnaryExpression {

  @transient private lazy val subOffA = subOff.toArray
  @transient private lazy val cidA = codeIds.toArray
  @transient private lazy val qcwA = qcw.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cids", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("pos", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("dsum", LongType, nullable = false)))

  override def prettyName: String = "pq_encode"

  def encode(a: ArrayData): InternalRow = {
    val codes = new Array[Int](m)
    val poss = new Array[Int](m)
    var dsum = 0L
    val qx = new Array[Long](dsub)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < dsub) {
        qx(j) = PqQuant.quantize(a.getFloat(i * dsub + j).toDouble)
        j += 1
      }
      var best = Long.MaxValue
      var bestCid = -1
      var bestPos = -1
      var c = subOffA(i)
      while (c < subOffA(i + 1)) {
        var d = 0L
        var k = 0
        val base = c * dsub
        while (k < dsub) {
          val diff = qx(k) - qcwA(base + k)
          d += diff * diff
          k += 1
        }
        // strict < — candidates iterate in cid ASC order, so the
        // first minimal distance carries the smallest cid: the
        // (dist ASC, cid ASC) rule
        if (d < best) { best = d; bestCid = cidA(c); bestPos = c }
        c += 1
      }
      codes(i) = bestCid; poss(i) = bestPos; dsum += best
      i += 1
    }
    InternalRow(new GenericArrayData(codes), new GenericArrayData(poss), dsum)
  }

  override protected def nullSafeEval(a: Any): Any =
    encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
      s"${ev.value} = $ref.encode($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native ADC lookup-table builder (SURVEY.md §2 G19b), evaluated on
  * the (tiny) QUERY frame: one flat int64 array in the same position
  * order as [[PqEncode]]'s `pos` output — entry c = exact quantized
  * squared-L2 from the query's subOfCand(c)-th subvector to codeword
  * c. A corpus vector then ADC-scores as m array lookups.
  */
case class PqAdcLut(child: Expression, dsub: Int,
                    subOfCand: Seq[Int], qcw: Seq[Long])
    extends UnaryExpression {

  @transient private lazy val subA = subOfCand.toArray
  @transient private lazy val qcwA = qcw.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "pq_adc_lut"

  def lut(a: ArrayData): GenericArrayData = {
    val n = subA.length
    val out = new Array[Long](n)
    var c = 0
    while (c < n) {
      val off = subA(c) * dsub
      val base = c * dsub
      var d = 0L
      var j = 0
      while (j < dsub) {
        val diff = PqQuant.quantize(a.getFloat(off + j).toDouble) - qcwA(base + j)
        d += diff * diff
        j += 1
      }
      out(c) = d
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    lut(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("pqAdcLut", this, classOf[PqAdcLut].getName)
      s"${ev.value} = $ref.lut($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
