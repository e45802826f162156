package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC / NFD / NFKC / NFKD) as a native
  * codegen'd expression — the opt-in production-corpus tokenizer
  * pass (SURVEY.md §2 H3 note). Spark ships no normalization
  * function, and a Scala UDF would serialize every string through
  * the interpreted boundary; this is one static call inside
  * whole-stage codegen with a no-change fast path (already-NFC
  * ASCII — the common case — allocates nothing).
  *
  * Oracle parity: DuckDB exposes `nfc_normalize` only, so the NFC
  * mode is oracle-checked end-to-end (`text_tokens_nfc`) and the
  * NFKC/NFKD modes are spec-verified against `java.text.Normalizer`
  * (the JDK's ICU-derived implementation) — documented in SURVEY §6.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unicode_normalize form must be NFC|NFD|NFKC|NFKD: $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.UnicodeNormalize.compute($s, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared eval/codegen kernel (codegen calls it as a static). */
object UnicodeNormalize {
  def compute(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
