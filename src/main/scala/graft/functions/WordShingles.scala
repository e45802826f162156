package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, as a native
  * Catalyst expression with codegen (SURVEY.md §2 F3/F4 hot path).
  *
  * The higher-order-function formulation
  * (`transform(sequence(...), i -> array_join(slice(...)))`) is
  * interpreted per element — measured ~25µs/doc·shingle at sf0.1,
  * dominating the dedup pipelines. This expression does one pass over
  * the token array with `UTF8String.concatWs` into a LinkedHashSet
  * (array_distinct semantics: first occurrence wins), inside
  * whole-stage codegen.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    Any2Shingles.compute(arr, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Any2Shingles.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval/codegen kernel (codegen calls it as a static). */
object Any2Shingles {
  private val Sep = UTF8String.fromString(" ")

  /** Compact non-null elements (checkInputDataTypes accepts
    * containsNull=true arrays, but the output schema promises
    * null-free elements — skip nulls like HashedFeatureCounts does).
    */
  private def nonNullTokens(arr: ArrayData): Array[UTF8String] = {
    val len = arr.numElements()
    var nulls = 0
    var i = 0
    while (i < len) { if (arr.isNullAt(i)) nulls += 1; i += 1 }
    val out = new Array[UTF8String](len - nulls)
    var k = 0
    i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) { out(k) = arr.getUTF8String(i); k += 1 }
      i += 1
    }
    out
  }

  def compute(arr: ArrayData, n: Int): GenericArrayData = {
    val toks = nonNullTokens(arr)
    val len = toks.length
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= len) {
      if (n == 1) {
        out.add(toks(i))
      } else {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks(i + j); j += 1 }
        out.add(UTF8String.concatWs(Sep, parts: _*))
      }
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Non-distinct variant: every n-gram OCCURRENCE, in order — the
    * multiset language-model counting needs (H18b), vs the distinct
    * set dedup/minhash needs. Same concatWs construction so the two
    * can never disagree on shingle text.
    */
  def computeAll(arr: ArrayData, n: Int): GenericArrayData = {
    val toks = nonNullTokens(arr)
    val len = toks.length
    val m = math.max(len - n + 1, 0)
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      if (n == 1) out(i) = toks(i)
      else {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Sep, parts: _*)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** [[WordShingles]] without the distinct: every occurrence, in
  * order — the multiset counting shape (SURVEY.md §2 H18b).
  */
case class WordShinglesAll(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles_all requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles_all"

  override protected def nullSafeEval(input: Any): Any =
    Any2Shingles.computeAll(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Any2Shingles.computeAll($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
