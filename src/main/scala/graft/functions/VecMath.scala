package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector math for the embedding family (SURVEY.md §2
  * groups F/G). These replace the interpreted `aggregate(transform(...))`
  * higher-order-function lambdas that dominated the round-2 bench
  * (~25 µs/element interpreted vs ~1 ns/element in a codegen loop) —
  * at 100 TB an embedding scan must run at memory bandwidth, and an
  * interpreted per-element lambda is ~4 orders of magnitude off that.
  *
  * Every kernel accumulates doubles in array-index order, exactly like
  * the SQL fold it replaces, so results stay bit-identical to the
  * DuckDB oracle. Null ELEMENTS propagate to a null result (the SQL
  * folds' `acc + null = null`); the guard is only generated when the
  * array type is declared `containsNull`, so the common dense-embedding
  * path stays branch-free.
  */
object VecMath {

  /** True iff any element slot is null — preserves the SQL folds' null
    * propagation for `containsNull` arrays.
    */
  def hasNull(v: ArrayData): Boolean = {
    val n = v.numElements()
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Σ x² over a float array, double accumulation in index order. */
  def sqNorm(v: ArrayData): Double = {
    val n = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    acc
  }

  /** max |x| over a float array (0.0 for an empty array — the same
    * fold-from-zero the SQL `aggregate(..., greatest)` computed).
    */
  def maxAbs(v: ArrayData): Double = {
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (a > m) m = a
      i += 1
    }
    m
  }

  /** Symmetric int8 quantization: round(x·127/maxAbs) per element.
    * Rounding matches Spark's `round(double, 0)` exactly (HALF_UP on
    * the decimal string form via BigDecimal.valueOf) so the rewrite
    * from the SQL `transform(...)` cannot change a single code.
    */
  def quantize(v: ArrayData, maxAbs: Double): ArrayData = {
    val n = v.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val d = v.getFloat(i).toDouble * 127.0 / maxAbs
      val r =
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
        else java.math.BigDecimal.valueOf(d)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      out(i) = r.toInt
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Random-hyperplane LSH bucket: plane p's coefficient for dimension
    * d is ((1+p·64+d)·2654435761 mod 1000003)/1000003 − 0.5 — integer
    * arithmetic both engines reproduce exactly (same formula the
    * DuckDB oracle evaluates in SQL). Bit p of the result is set iff
    * the plane-p dot product is > 0; per-plane accumulation is in
    * index order, matching the SQL fold.
    *
    * Vectors shorter than 64 dims hash over their available dims. (The
    * SQL fold this replaced collapsed every short vector into bucket 0
    * via null propagation — a degenerate bucketing; partial-dot
    * hashing is deterministic and actually distributes them. The
    * oracle corpus is uniformly 64-dim, so both agree on tested data.)
    */
  def planeSig(v: ArrayData, planes: Int): Long = {
    val n = math.min(64, v.numElements())
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        val coeff =
          (((1L + p * 64L + d) * 2654435761L) % 1000003L).toDouble /
            1000003.0 - 0.5
        acc += v.getFloat(d).toDouble * coeff
        d += 1
      }
      if (acc > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  /** Sign-bit pack: bit (i−lo) of the word is set iff v[lo+i] > 0,
    * for i in [0, bits). With bits ≤ 32 the word stays in [0, 2³²) —
    * always non-negative, so cross-engine two's-complement edge cases
    * never arise. Strict `> 0` on the stored float is exact under any
    * widening (the DuckDB side compares the same parquet float to 0).
    */
  def signBits(v: ArrayData, lo: Int, bits: Int): Long = {
    val n = v.numElements()
    var w = 0L
    var i = 0
    while (i < bits && lo + i < n) {
      if (v.getFloat(lo + i) > 0f) w |= 1L << i
      i += 1
    }
    w
  }

  /** Sparse signed random projection (Achlioptas' database-friendly
    * JL transform, density 1/3): output dim j accumulates
    * Σ_d c(j,d) · round(v_d·2²⁰) with c(j,d) ∈ {−1, 0, +1} chosen by
    * (((1 + j·64 + d)·2654435761) mod 1000003) mod 6 →
    * {0: −1, 5: +1, else 0}. The prime modulus does the mixing (the
    * [[planeSig]] scheme) — a direct mod 6 would degenerate, since
    * 2654435761 ≡ 1 (mod 6) makes the product's residue a period-6
    * comb in d. Same round(v·2²⁰) int64 quantization as the
    * round(v·2²⁰) int64 quantization as the PQ/centroid kernels
    * (BigDecimal HALF_UP, the proven-portable `round(double)`), so
    * every output is an exact int64 the oracle replays term for term.
    */
  def rpInt(v: ArrayData, outDims: Int): ArrayData = {
    val n = math.min(64, v.numElements())
    val out = new Array[Long](outDims)
    var j = 0
    while (j < outDims) {
      var acc = 0L
      var d = 0
      while (d < n) {
        val m = ((1L + j * 64L + d) * 2654435761L) % 1000003L % 6L
        if (m == 0L || m == 5L) {
          val x = v.getFloat(d).toDouble * 1048576.0
          val q =
            if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) 0L
            else java.math.BigDecimal.valueOf(x)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
          acc += (if (m == 5L) q else -q)
        }
        d += 1
      }
      out(j) = acc
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Σ|x| over an int array, long accumulation in index order. */
  def l1Int(v: ArrayData): Long = {
    val n = v.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.abs(v.getInt(i).toLong)
      i += 1
    }
    acc
  }
}

private[graft] trait FloatArrayUnary extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  protected def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _                => false
  }
  override def nullable: Boolean = child.nullable || elementsNullable
  /** Wrap a kernel call with the null-element guard only when the
    * array type can actually hold nulls.
    */
  protected def guarded(a: String, ev: ExprCode, call: String): String =
    if (elementsNullable)
      s"""if (graft.functions.VecMath.hasNull($a)) { ${ev.isNull} = true; }
         |else { ${ev.value} = $call; }""".stripMargin
    else s"${ev.value} = $call;"
}

/** Squared L2 norm of a float-array column (see [[VecMath.sqNorm]]). */
case class VecSqNorm(child: Expression) extends FloatArrayUnary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sq_norm"
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (elementsNullable && VecMath.hasNull(v)) null else VecMath.sqNorm(v)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      guarded(a, ev, s"graft.functions.VecMath.sqNorm($a)"))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** max |x| of a float-array column (see [[VecMath.maxAbs]]). */
case class VecMaxAbs(child: Expression) extends FloatArrayUnary {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_max_abs"
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (elementsNullable && VecMath.hasNull(v)) null else VecMath.maxAbs(v)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      guarded(a, ev, s"graft.functions.VecMath.maxAbs($a)"))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** int8 quantization of a float array given its max-abs scale
  * (see [[VecMath.quantize]]). Left = array<float>, right = double.
  */
case class Int8Quantize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, double), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "int8_quantize"
  private def elementsNullable: Boolean = left.dataType match {
    case ArrayType(_, cn) => cn
    case _                => false
  }
  override def nullable: Boolean = super.nullable || elementsNullable
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (elementsNullable && VecMath.hasNull(v)) null
    else VecMath.quantize(v, b.asInstanceOf[Double])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      if (elementsNullable)
        s"""if (graft.functions.VecMath.hasNull($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VecMath.quantize($a, $b); }""".stripMargin
      else s"${ev.value} = graft.functions.VecMath.quantize($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `planes`-bit random-hyperplane LSH bucket of a float-array column
  * (see [[VecMath.planeSig]]).
  */
case class PlaneSignature(child: Expression, planes: Int)
    extends FloatArrayUnary {
  override def dataType: DataType = LongType
  override def prettyName: String = "plane_signature"
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (elementsNullable && VecMath.hasNull(v)) null
    else VecMath.planeSig(v, planes)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      guarded(a, ev, s"graft.functions.VecMath.planeSig($a, $planes)"))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-bit pack of a float-array column slice into a non-negative
  * long word (see [[VecMath.signBits]]) — the 1-bit quantizer of the
  * G28 Hamming search leg.
  */
case class SignBits(child: Expression, lo: Int, bits: Int)
    extends FloatArrayUnary {
  require(bits > 0 && bits <= 32, s"sign_bits needs 1..32 bits, got $bits")
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bits"
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (elementsNullable && VecMath.hasNull(v)) null
    else VecMath.signBits(v, lo, bits)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      guarded(a, ev, s"graft.functions.VecMath.signBits($a, $lo, $bits)"))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sparse signed random projection of a float-array column to
  * `outDims` exact int64 micro-unit sums (see [[VecMath.rpInt]]) —
  * the G29 Johnson–Lindenstrauss reduction.
  */
case class RandomProjection(child: Expression, outDims: Int)
    extends FloatArrayUnary {
  require(outDims > 0, s"random_projection needs outDims > 0: $outDims")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "random_projection"
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (elementsNullable && VecMath.hasNull(v)) null
    else VecMath.rpInt(v, outDims)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      guarded(a, ev, s"graft.functions.VecMath.rpInt($a, $outDims)"))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ|x| over an int-array column — the L1 norm of an int8 code
  * vector, the integer ingredient of the quantization error bound in
  * [[graft.operators.Similarity.exactPrunedTopK]]. All-integer
  * accumulation: bit-identical on any engine, any partitioning.
  */
case class IntArrayL1(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${other.simpleString}")
  }
  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _                => false
  }
  override def nullable: Boolean = child.nullable || elementsNullable
  override def dataType: DataType = LongType
  override def prettyName: String = "int_array_l1"
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (elementsNullable && VecMath.hasNull(v)) null else VecMath.l1Int(v)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      if (elementsNullable)
        s"""if (graft.functions.VecMath.hasNull($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VecMath.l1Int($a); }""".stripMargin
      else s"${ev.value} = graft.functions.VecMath.l1Int($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bit length of a non-negative long: 64 − numberOfLeadingZeros, and 0
  * for 0 — the allocation-free replacement for `length(bin(w))` in the
  * HLL ρ computation (integer-exact, no per-row string).
  */
case class LongBitLen(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "long_bit_len"
  override protected def nullSafeEval(a: Any): Any =
    64 - java.lang.Long.numberOfLeadingZeros(a.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = 64 - java.lang.Long.numberOfLeadingZeros($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
