package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Dense hashed-feature COUNT vector for linear-model training
  * (SURVEY.md §2 H20b): one codegen'd pass over the token array
  * buckets each token by the oracle-shared md5-top-60-bits scheme
  * ([[ShingleHashes.hash60]], the same bucket choice
  * [[HashedFeatureDot]] folds at inference time) and returns the
  * per-bucket counts as `array<long>` of length `dims`.
  *
  * This is the training-side complement of [[HashedFeatureDot]]: the
  * apply path folds weights over tokens without materializing
  * features; the learn path needs the feature vector itself (the
  * gradient of a linear model is err · x), so it materializes exactly
  * one dense `dims`-long count vector per document — zero shuffles,
  * zero per-token allocation, and the counts are exact integers so
  * every downstream gradient sum can run in order-free fixed-point.
  */
case class HashedFeatureCounts(child: Expression, dims: Int,
                               bigrams: Boolean = false)
    extends UnaryExpression {

  require(dims >= 1, "hashed_feature_counts needs dims >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_feature_counts requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hashed_feature_counts"

  override protected def nullSafeEval(input: Any): Any =
    HashedFeatureCounts.compute(input.asInstanceOf[ArrayData], dims, bigrams)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashedFeatureCounts.compute($a, $dims, $bigrams);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval/codegen kernel (codegen calls it as a static). */
object HashedFeatureCounts {
  /** With `bigrams`, each adjacent token pair "a b" ALSO buckets (the
    * DSIR hashed unigram+bigram feature space, Xie et al. 2023) —
    * non-distinct, unlike [[Any2Shingles]]'s minhash-oriented dedup.
    */
  def compute(arr: ArrayData, dims: Int, bigrams: Boolean): ArrayData = {
    val c = new Array[Long](dims)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // hash60 < 2^60 is non-negative, so % == pmod == DuckDB's %
        val h = ShingleHashes.hash60(arr.getUTF8String(i).getBytes)
        c((h % dims).toInt) += 1L
        if (bigrams && i + 1 < n && !arr.isNullAt(i + 1)) {
          val pair = org.apache.spark.unsafe.types.UTF8String.concatWs(
            org.apache.spark.unsafe.types.UTF8String.fromString(" "),
            arr.getUTF8String(i), arr.getUTF8String(i + 1))
          val hb = ShingleHashes.hash60(pair.getBytes)
          c((hb % dims).toInt) += 1L
        }
      }
      i += 1
    }
    new GenericArrayData(c)
  }
}
