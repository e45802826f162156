package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Hashed-feature dot product for fasttext/CCNet-style linear text
  * classifiers (SURVEY.md §2 H20): Σ over tokens of
  * `microWeights[hash60(token) mod dims]`, computed as one codegen'd
  * pass over the token array — the inference kernel of a model-based
  * quality filter, shipped to executors as a compile-time weight
  * vector (the [[InSetCount]] idiom: reference object in generated
  * code, zero shuffle, zero allocation).
  *
  * Weights are int64 MICRO-units (w·10⁶): the fold is exact integer
  * arithmetic, so the result is independent of token order and of
  * either engine's float-summation strategy — the same order-free
  * fixed-point trick the unigram-LM and KL queries use. The single
  * float step (÷n, sigmoid) happens once per document downstream.
  * `hash60` is the oracle-shared md5-top-60-bits scheme
  * ([[ShingleHashes.hash60]]), so DuckDB mirrors the bucket choice
  * exactly.
  */
case class HashedFeatureDot(child: Expression, microWeights: Seq[Long])
    extends UnaryExpression {

  require(microWeights.nonEmpty, "hashed_feature_dot needs a weight vector")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_feature_dot requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "hashed_feature_dot"

  @transient private lazy val w: Array[Long] = microWeights.toArray

  override protected def nullSafeEval(input: Any): Any =
    HashedFeatureDot.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("clfMicroWeights", w, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashedFeatureDot.compute($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval/codegen kernel (codegen calls it as a static). */
object HashedFeatureDot {
  def compute(arr: ArrayData, w: Array[Long]): Long = {
    val dims = w.length
    var s = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // hash60 < 2^60 is non-negative, so % == pmod == DuckDB's %
        val h = ShingleHashes.hash60(arr.getUTF8String(i).getBytes)
        s += w((h % dims).toInt)
      }
      i += 1
    }
    s
  }
}
