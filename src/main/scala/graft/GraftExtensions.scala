package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Size}
import org.apache.spark.sql.catalyst.expressions.ArrayIntersect
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSimilarity, Int8Dot, ShingleHashes, SortedIntersectCount, WordShingles}

/** Session-extension installer: `--conf spark.sql.extensions=
  * graft.GraftExtensions` (or `.withExtensions(new GraftExtensions)`)
  * makes the engine's native expressions first-class SQL functions
  * and injects the optimizer rewrites — the (c)-tier integration the
  * build guide prescribes for whole-operator semantics Spark lacks.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // —— SQL function surface ——
    register(ext, "cosine_sim", 2,
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    register(ext, "int8_dot", 2, exprs => Int8Dot(exprs(0), exprs(1)))
    register(ext, "sorted_intersect_count", 2,
      exprs => SortedIntersectCount(exprs(0), exprs(1)))
    register(ext, "word_shingles", 2, exprs =>
      WordShingles(exprs(0), exprs(1).eval().asInstanceOf[Int]))
    register(ext, "shingle_hashes", 2, exprs =>
      ShingleHashes(exprs(0), exprs(1).eval().asInstanceOf[Int]))
    // —— optimizer rewrites ——
    ext.injectOptimizerRule(_ => IntersectCountRewrite)
  }

  private def register(ext: SparkSessionExtensions, name: String, arity: Int,
                       builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity, s"$name takes $arity arguments")
        builder(exprs)
      }))
}

/** `size(array_intersect(a, b))` counts the overlap by building a
  * per-row hash set; when both inputs are [[ShingleHashes]] outputs —
  * sorted distinct by construction — the sorted-merge
  * [[SortedIntersectCount]] computes the same count allocation-free.
  * Exactness holds because the rewrite only fires when sortedness is
  * guaranteed by the producing expression, not assumed of user data.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a: ShingleHashes, b: ShingleHashes), legacy @ _) =>
        SortedIntersectCount(a, b)
    }
}
