package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §5): two-phase salted aggregation.
  *
  * A hot grouping key funnels its whole partition through one task;
  * salting fans each key across `salt` sub-keys for the partial
  * phase, then merges the partials — identical results, hot-key work
  * spread over `salt` tasks. (Spark's partial aggregation already
  * does map-side combining; explicit salting matters when a single
  * reduce key still exceeds one task, e.g. heavy agg state or
  * collect-style accumulators at 100 TB.)
  */
object Skew {

  /** Salted sum/count aggregate over `keyCol`: results equal a plain
    * groupBy — the salt never leaks into the output.
    */
  def saltedAgg(df: DataFrame, keyCol: String, saltSource: Column,
                sums: Seq[(String, Column)], salt: Int = 16): DataFrame = {
    val partial = df
      .groupBy(col(keyCol), pmod(saltSource, lit(salt)).as("__salt"))
      .agg(sums.head._2.as(s"p_${sums.head._1}"),
        sums.tail.map { case (n, c) => c.as(s"p_$n") }: _*)
    partial
      .groupBy(col(keyCol))
      .agg(sum(col(s"p_${sums.head._1}")).as(sums.head._1),
        sums.tail.map { case (n, _) => sum(col(s"p_$n")).as(n) }: _*)
  }
}
