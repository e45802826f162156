package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that reports `deterministic = false` — an
  * optimizer barrier for EXPENSIVE derived columns (the guide's §4.4
  * move, applied to built-in expression chains instead of UDFs).
  *
  * Why it exists: `PushDownPredicates` inlines a projected alias into
  * every filter conjunct that references it, and `FilterExec` performs
  * no subexpression elimination across conjuncts — so a filter over a
  * computed column like "the 14-regex markup extraction, tokenized"
  * re-evaluates the whole chain once PER PREDICATE per row (measured:
  * 12 copies of the chain in corpus_curate_full's physical plan, the
  * query's entire 3.5 s bench cost). Wrapping the projected expression
  * in Opaque forbids the optimizer from duplicating or reordering it,
  * so the chain is computed exactly once per row and every consumer
  * reads the materialized column — identical values, one evaluation.
  *
  * The wrapped expression MUST itself be pure (Opaque evaluates it
  * verbatim; the flag only talks to the optimizer). Do not wrap truly
  * cheap columns: the same flag also blocks pushing OTHER predicates
  * below the projection, which can cost more than the duplication it
  * prevents (it pins filter order around the barrier).
  */
case class Opaque(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "opaque"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Opaque {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** Column-API entry: `opaque(expensiveCol)`. */
  def apply(c: Column): Column =
    GraftBridge.column(Opaque(GraftBridge.expression(c)))
}
