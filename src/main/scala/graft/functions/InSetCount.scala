package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrences of any of a small COMPILE-TIME word set in a string
  * array — the stopword-counting kernel of the langid/quality text
  * scans (SURVEY.md §2 H1/H2).
  *
  * The higher-order-function formulation
  * (`size(filter(toks, t -> t IN (...)))`) runs the lambda
  * interpreted per token (~25µs/element, the same pathology the
  * shingle path had) AND allocates the filtered array only to take
  * its size. This is one codegen'd pass, zero allocation: a linear
  * probe of the word list per token (the profiles are 4 words — far
  * below hash-set break-even). Duplicates count, matching the filter
  * semantics (`array_intersect` would dedupe).
  */
case class InSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  require(words.nonEmpty, "in_set_count needs a non-empty word set")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"in_set_count requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "in_set_count"

  @transient private lazy val set: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any =
    InSetCount.compute(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("inSetWords", set,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.InSetCount.compute($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval/codegen kernel (codegen calls it as a static). */
object InSetCount {
  def compute(arr: ArrayData, words: Array[UTF8String]): Int = {
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        var found = false
        while (!found && j < words.length) {
          found = words(j).equals(s)
          j += 1
        }
        if (found) c += 1
      }
      i += 1
    }
    c
  }
}
