package graft.plans

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `$out` / `$merge` — the pipeline sink stages. route81's consumer
  * applies the same two shapes to its MongoDB target: wholesale
  * replace (ReplaceOne-upsert of everything, cf.
  * /root/reference/route81.go:1088-1117) and keyed merge. Here they
  * are pure batch operators: given the pipeline result and the
  * current target table, produce the post-write target — which a
  * caller then persists (parquet write, foreachBatch upsert, …).
  * Keeping them pure keeps the merge plan testable and lets the same
  * logic back both the batch path and the streaming micro-batch sink.
  *
  * Scale shape: one shuffle on the merge key (sort-merge full-outer);
  * when the incoming batch is small relative to the target — the CDC
  * steady state — AQE broadcasts the source side, so the target is
  * never re-shuffled.
  */
object PipelineSinks {

  private val mapper = new ObjectMapper()

  /** `$out`: the result replaces the target wholesale. */
  def out(result: DataFrame): DataFrame = result

  /** `$merge`-style keyed merge of `source` into `target`.
    *
    * @param on            join key column (Mongo default `_id`)
    * @param whenMatched    "replace" | "keepExisting" | "merge" | "fail"
    * @param whenNotMatched "insert" | "discard" | "fail"
    */
  def merge(target: DataFrame, source: DataFrame, on: String,
            whenMatched: String = "replace",
            whenNotMatched: String = "insert"): DataFrame = {
    require(target.columns.sameElements(source.columns) ||
      target.columns.toSet == source.columns.toSet,
      "merge requires same-schema source and target")
    val cols = target.columns.toSeq
    val t = target.select(cols.map(c => col(c).as(s"t_$c")): _*)
    val s = source.select(cols.map(c => col(c).as(s"s_$c")): _*)
    val joined = t.join(s, col(s"t_$on") <=> col(s"s_$on"), "full_outer")
    val matched = col(s"t_$on").isNotNull && col(s"s_$on").isNotNull
    val onlyTarget = col(s"s_$on").isNull
    val onlySource = col(s"t_$on").isNull

    def matchedVal(c: String) = whenMatched match {
      case "replace"      => col(s"s_$c")
      case "keepExisting" => col(s"t_$c")
      case "merge"        => coalesce(col(s"s_$c"), col(s"t_$c"))
      case "fail" => raise_error(concat(
        lit(s"$$merge whenMatched: fail — key exists: "), col(s"t_$on").cast("string")))
      case other =>
        throw new IllegalArgumentException(s"unsupported whenMatched: $other")
    }
    def unmatchedKeep = whenNotMatched match {
      case "insert"  => true
      case "discard" => false
      case "fail"    => true // filter below raises instead of keeping
      case other =>
        throw new IllegalArgumentException(s"unsupported whenNotMatched: $other")
    }
    val picked = cols.map { c =>
      when(matched, matchedVal(c))
        .when(onlyTarget, col(s"t_$c"))
        .otherwise(if (whenNotMatched == "fail")
          raise_error(concat(lit(s"$$merge whenNotMatched: fail — new key: "),
            col(s"s_$on").cast("string")))
        else col(s"s_$c")).as(c)
    }
    val kept =
      if (unmatchedKeep) joined
      else joined.filter(!onlySource)
    kept.select(picked: _*)
  }

  /** Parse a `$merge` stage spec and run it against `tables`. The
    * final pipeline stage in Mongo; modeled as result-producing here.
    */
  def applyMergeStage(result: DataFrame, specJson: String,
                      tables: String => DataFrame): DataFrame = {
    val spec = mapper.readTree(specJson)
    val into =
      if (spec.isTextual) spec.asText() else spec.get("into").asText()
    val on = Option(spec.get("on")).map(_.asText()).getOrElse("_id")
    val wm = Option(spec.get("whenMatched")).map(_.asText()).getOrElse("replace")
    val wnm = Option(spec.get("whenNotMatched")).map(_.asText()).getOrElse("insert")
    merge(tables(into), result, on, wm, wnm)
  }
}
