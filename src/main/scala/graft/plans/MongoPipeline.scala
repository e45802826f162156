package graft.plans

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MongoDB aggregation-pipeline → DataFrame translator.
  *
  * This is the reference's query language: route81 applies
  * user-configured JSON pipeline stages to change streams and direct
  * reads (/root/reference/route81.go:92-97,268-282; README
  * §pipelines). Here each stage compiles to declarative
  * Column/Dataset operations, so the whole pipeline is one Catalyst
  * plan: filters/projections push into the scan, groups get partial
  * aggregation, and whole-stage codegen spans the stage chain —
  * nothing is interpreted per-row.
  *
  * Distributed-determinism deviations from MongoDB (documented):
  *  - `$push`/`$addToSet` return value-sorted arrays (input order is
  *    not defined after a shuffle);
  *  - `$first`/`$last` require a preceding `$sort` and compile to
  *    min_by/max_by over the sort key (order-insensitive, one pass);
  *  - `$sortByCount` breaks count ties by ascending key.
  *
  * Supported stages: $match, $project, $addFields/$set, $unset,
  * $group, $sort, $skip, $limit, $count, $unwind, $lookup, $bucket,
  * $sortByCount, $replaceRoot.
  */
object MongoPipeline {

  private val mapper = new ObjectMapper()

  /** Compile and apply a JSON pipeline. `tables` resolves `$lookup.from`. */
  def apply(df: DataFrame, pipelineJson: String,
            tables: String => DataFrame = name =>
              throw new IllegalArgumentException(s"no table resolver for $$lookup: $name"))
      : DataFrame = {
    val root = mapper.readTree(pipelineJson)
    require(root.isArray, "pipeline must be a JSON array of stages")
    var cur = df
    var lastSort: Seq[(String, Boolean)] = Nil // (field, ascending)
    root.elements().asScala.foreach { stage =>
      val fields = stage.properties().asScala.toSeq
      require(fields.size == 1, s"stage must have exactly one operator: $stage")
      val (op, spec) = (fields.head.getKey, fields.head.getValue)
      op match {
        case "$match"   => cur = cur.filter(matchPredicate(spec))
        case "$project" => cur = project(cur, spec)
        case "$addFields" | "$set" =>
          spec.properties().asScala.toSeq.foreach { e =>
            cur = cur.withColumn(e.getKey, expression(e.getValue))
          }
        case "$unset" =>
          val names =
            if (spec.isArray) spec.elements().asScala.map(_.asText()).toSeq
            else Seq(spec.asText())
          cur = cur.drop(names: _*)
        case "$group"   => cur = group(cur, spec, lastSort)
        case "$sort" =>
          // .toSeq BEFORE .map: properties() is a Set and mapping it
          // would lose the JSON key order that $sort semantics need.
          lastSort = spec.properties().asScala.toSeq
            .map(e => (e.getKey, e.getValue.asInt() >= 0))
          cur = cur.orderBy(lastSort.map { case (f, asc) =>
            if (asc) col(f).asc else col(f).desc
          }: _*)
        case "$skip"    => cur = cur.offset(spec.asInt())
        case "$limit"   => cur = cur.limit(spec.asInt())
        case "$count"   => cur = cur.agg(count(lit(1)).as(spec.asText()))
        case "$unwind"  => cur = unwind(cur, spec)
        case "$lookup"  => cur = lookup(cur, spec, tables)
        case "$bucket"  => cur = bucket(cur, spec, lastSort)
        case "$sortByCount" =>
          cur = cur.groupBy(expression(spec).as("_id"))
            .agg(count(lit(1)).as("count"))
            .orderBy(col("count").desc, col("_id").asc)
        case "$replaceRoot" =>
          val newRoot = expression(spec.get("newRoot"))
          cur = cur.select(newRoot.as("__root")).select(col("__root.*"))
        case "$facet" =>
          // each facet = a sub-pipeline over the same input; output is
          // one row with an array-of-struct column per facet
          // (value-sorted for distributed determinism).
          require(spec.properties().asScala.nonEmpty, "$facet needs at least one facet")
          val facets = spec.properties().asScala.toSeq.map { e =>
            val sub = apply(cur, e.getValue.toString, tables)
            sub.agg(array_sort(collect_list(struct(sub.columns.map(col): _*))))
              .toDF(e.getKey)
          }
          cur = facets.reduce(_ crossJoin _)
        case other =>
          throw new IllegalArgumentException(s"unsupported stage: $other")
      }
    }
    cur
  }

  // ——— $match query language ———

  /** Compile a MongoDB query document to one boolean Column. */
  def matchPredicate(spec: JsonNode): Column = {
    val parts = spec.properties().asScala.toSeq.map { e =>
      e.getKey match {
        case "$and" => e.getValue.elements().asScala
          .map(matchPredicate).reduce(_ && _)
        case "$or" => e.getValue.elements().asScala
          .map(matchPredicate).reduce(_ || _)
        case "$nor" => !e.getValue.elements().asScala
          .map(matchPredicate).reduce(_ || _)
        case "$expr" => expression(e.getValue)
        case field => fieldPredicate(col(field), e.getValue)
      }
    }
    if (parts.isEmpty) lit(true) else parts.reduce(_ && _)
  }

  /** `field: value` or `field: {$op: v, ...}`. */
  private def fieldPredicate(c: Column, spec: JsonNode): Column =
    if (spec.isObject && spec.properties().asScala.exists(_.getKey.startsWith("$"))) {
      spec.properties().asScala.toSeq.map { e =>
        val v = e.getValue
        e.getKey match {
          case "$eq"  => c === literal(v)
          case "$ne"  => !(c <=> literal(v))
          case "$gt"  => c > literal(v)
          case "$gte" => c >= literal(v)
          case "$lt"  => c < literal(v)
          case "$lte" => c <= literal(v)
          case "$in"  => c.isInCollection(v.elements().asScala.map(literalValue).toSeq)
          case "$nin" => !c.isInCollection(v.elements().asScala.map(literalValue).toSeq)
          case "$exists" => if (v.asBoolean()) c.isNotNull else c.isNull
          case "$regex"  => c.rlike(v.asText())
          case "$not"    => !fieldPredicate(c, v)
          case "$mod" =>
            val it = v.elements().asScala.toSeq
            c % literal(it.head) === literal(it(1))
          case other =>
            throw new IllegalArgumentException(s"unsupported $$match op: $other")
        }
      }.reduce(_ && _)
    } else if (spec.isNull) c.isNull // Mongo {f: null} matches null/missing
    else if (spec.isObject || spec.isArray)
      // refuse rather than silently comparing against asText() == ""
      throw new IllegalArgumentException(
        s"unsupported $$match literal (object/array equality): $spec")
    else c === literal(spec)

  // ——— expression language ———

  /** Compile an aggregation expression: "$field", literal, or {$op: args}. */
  def expression(n: JsonNode): Column = {
    if (n.isTextual && n.asText().startsWith("$"))
      return col(n.asText().drop(1))
    if (!n.isObject) return literal(n)
    val fields = n.properties().asScala.toSeq
    // An object whose (single) key is not a $-operator is a computed
    // sub-document → struct column.
    if (fields.isEmpty || !fields.head.getKey.startsWith("$"))
      return struct(fields.map(e => expression(e.getValue).as(e.getKey)): _*)
    require(fields.size == 1, s"expression must have one operator: $n")
    val (op, a) = (fields.head.getKey, fields.head.getValue)
    def args: Seq[Column] = a.elements().asScala.map(expression).toSeq
    op match {
      case "$add"      => args.reduce(_ + _)
      case "$subtract" => args.reduce(_ - _)
      case "$multiply" => args.reduce(_ * _)
      case "$divide"   => args.reduce(_ / _)
      case "$mod"      => args.reduce(_ % _)
      case "$abs"      => abs(expression(a))
      case "$ceil"     => ceil(expression(a))
      case "$floor"    => floor(expression(a))
      case "$round" =>
        val it = a.elements().asScala.toSeq
        round(expression(it.head), if (it.size > 1) it(1).asInt() else 0)
      case "$concat"   => concat(args: _*)
      case "$toUpper"  => upper(expression(a))
      case "$toLower"  => lower(expression(a))
      case "$strLenCP" => length(expression(a))
      case "$substrCP" =>
        val it = a.elements().asScala.toSeq
        // Mongo is 0-based, Spark substring 1-based
        expression(it.head).substr(expression(it(1)) + lit(1), expression(it(2)))
      case "$split" =>
        val it = a.elements().asScala.toSeq
        split(expression(it.head), java.util.regex.Pattern.quote(it(1).asText()))
      case "$trim"     => trim(expression(a.get("input")))
      case "$switch" =>
        val branches = a.get("branches").elements().asScala.toSeq
        val chain = branches.foldLeft[Option[Column]](None) { (acc, b) =>
          val cond = expression(b.get("case"))
          val thenV = expression(b.get("then"))
          Some(acc match {
            case None => when(cond, thenV)
            case Some(c) => c.when(cond, thenV)
          })
        }.getOrElse(throw new IllegalArgumentException("$switch needs branches"))
        Option(a.get("default")).filterNot(_.isNull)
          .map(d => chain.otherwise(expression(d))).getOrElse(chain)
      case "$dateToString" =>
        // Mongo strftime-ish specifiers → java DateTimeFormatter
        // pattern; literal letters (like the T and Z in the default
        // ISO layout) must be single-quoted or they'd be interpreted
        // as pattern letters / zone offsets.
        val fmt = Option(a.get("format")).map(_.asText())
          .getOrElse("%Y-%m-%dT%H:%M:%S.%LZ")
        val spec2java = Map('Y' -> "yyyy", 'm' -> "MM", 'd' -> "dd",
          'H' -> "HH", 'M' -> "mm", 'S' -> "ss", 'L' -> "SSS", 'j' -> "DDD")
        val sb = new StringBuilder
        var i = 0
        while (i < fmt.length) {
          val ch = fmt.charAt(i)
          if (ch == '%' && i + 1 < fmt.length) {
            sb.append(spec2java.getOrElse(fmt.charAt(i + 1),
              throw new IllegalArgumentException(
                s"unsupported $$dateToString specifier: %${fmt.charAt(i + 1)}")))
            i += 2
          } else {
            if (ch.isLetter) sb.append('\'').append(ch).append('\'')
            else sb.append(ch)
            i += 1
          }
        }
        date_format(expression(a.get("date")), sb.toString)
      case "$cond" =>
        val (i, t, e) =
          if (a.isArray) {
            val it = a.elements().asScala.toSeq
            (it(0), it(1), it(2))
          } else (a.get("if"), a.get("then"), a.get("else"))
        when(expression(i), expression(t)).otherwise(expression(e))
      case "$ifNull"   => coalesce(args: _*)
      case "$eq"  => args.head === args(1)
      case "$ne"  => !(args.head <=> args(1))
      case "$gt"  => args.head > args(1)
      case "$gte" => args.head >= args(1)
      case "$lt"  => args.head < args(1)
      case "$lte" => args.head <= args(1)
      case "$cmp" => when(args.head > args(1), 1)
        .when(args.head < args(1), -1).otherwise(0)
      case "$and" => args.reduce(_ && _)
      case "$or"  => args.reduce(_ || _)
      case "$not" => !expression(if (a.isArray) a.get(0) else a)
      case "$year"       => year(expression(a))
      case "$month"      => month(expression(a))
      case "$dayOfMonth" => dayofmonth(expression(a))
      case "$hour"       => hour(expression(a))
      case "$toString"   => expression(a).cast("string")
      case "$toInt"      => expression(a).cast("int")
      case "$toLong"     => expression(a).cast("long")
      case "$toDouble"   => expression(a).cast("double")
      case "$toDecimal"  => expression(a).cast("decimal(18,2)")
      case "$literal"    => literal(a)
      case "$size"       => size(expression(a))
      case "$arrayElemAt" =>
        val it = a.elements().asScala.toSeq
        element_at(expression(it.head), it(1).asInt() + 1) // Mongo 0-based
      case other =>
        throw new IllegalArgumentException(s"unsupported expression op: $other")
    }
  }

  private def literal(n: JsonNode): Column = lit(literalValue(n))

  private def literalValue(n: JsonNode): Any =
    if (n.isNull) null
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else n.asText()

  // ——— stages ———

  private def project(df: DataFrame, spec: JsonNode): DataFrame = {
    val entries = spec.properties().asScala.toSeq
    val excludes = entries.filter(e =>
      (e.getValue.isIntegralNumber && e.getValue.asInt() == 0) ||
      (e.getValue.isBoolean && !e.getValue.asBoolean()))
    if (excludes.size == entries.size) df.drop(excludes.map(_.getKey): _*)
    else {
      val cols = entries.collect {
        case e if (e.getValue.isIntegralNumber && e.getValue.asInt() == 1) ||
                  (e.getValue.isBoolean && e.getValue.asBoolean()) =>
          col(e.getKey)
        case e if !e.getValue.isIntegralNumber && !e.getValue.isBoolean =>
          expression(e.getValue).as(e.getKey)
      }
      df.select(cols: _*)
    }
  }

  private def group(df: DataFrame, spec: JsonNode,
                    lastSort: Seq[(String, Boolean)]): DataFrame = {
    val idNode = spec.get("_id")
    val accums = spec.properties().asScala.toSeq.filter(_.getKey != "_id").map { e =>
      accumulator(e.getValue, lastSort).as(e.getKey)
    }
    val keys: Seq[org.apache.spark.sql.Column] =
      if (idNode == null || idNode.isNull)
        Seq(lit(null).cast("string").as("_id"))
      else if (idNode.isObject && !idNode.properties().asScala.exists(_.getKey.startsWith("$")))
        // composite key: one output column per sub-key, named _id_<k>
        idNode.properties().asScala.toSeq.map(e =>
          expression(e.getValue).as(s"_id_${e.getKey}"))
      else Seq(expression(idNode).as("_id"))
    if (accums.isEmpty) df.select(keys: _*).distinct() // {$group: {_id: ...}}
    else df.groupBy(keys: _*).agg(accums.head, accums.tail: _*)
  }

  private def accumulator(n: JsonNode, lastSort: Seq[(String, Boolean)]): Column = {
    val fields = n.properties().asScala.toSeq
    require(fields.size == 1, s"accumulator must have one operator: $n")
    val (op, a) = (fields.head.getKey, fields.head.getValue)
    // $first/$last compile to one-pass min_by/max_by over the last $sort
    // key (struct ordering = lexicographic over the sort columns); mixed
    // asc/desc sorts are not supported for these accumulators.
    def sortKey: Column = {
      require(lastSort.nonEmpty, s"$op requires a preceding $$sort stage")
      require(lastSort.map(_._2).distinct.size == 1,
        s"$op requires a uniform-direction $$sort")
      struct(lastSort.map { case (f, _) => col(f) }: _*)
    }
    op match {
      case "$sum" =>
        if (a.isNumber && a.asDouble() == 1.0) count(lit(1))
        else sum(expression(a))
      case "$avg"   => avg(expression(a))
      case "$min"   => min(expression(a))
      case "$max"   => max(expression(a))
      case "$count" => count(lit(1))
      case "$push"     => array_sort(collect_list(expression(a)))
      case "$addToSet" => array_sort(collect_set(expression(a)))
      case "$first" =>
        if (lastSort.forall(_._2)) min_by(expression(a), sortKey)
        else max_by(expression(a), sortKey)
      case "$last" =>
        if (lastSort.forall(_._2)) max_by(expression(a), sortKey)
        else min_by(expression(a), sortKey)
      case other =>
        throw new IllegalArgumentException(s"unsupported accumulator: $other")
    }
  }

  private def unwind(df: DataFrame, spec: JsonNode): DataFrame = {
    val (path, preserve, idxCol) =
      if (spec.isTextual) (spec.asText(), false, None)
      else (spec.get("path").asText(),
            Option(spec.get("preserveNullAndEmptyArrays")).exists(_.asBoolean()),
            Option(spec.get("includeArrayIndex")).map(_.asText()))
    val field = path.drop(1)
    val others = df.columns.filterNot(_ == field).map(col).toSeq
    idxCol match {
      case Some(idx) =>
        val ex = if (preserve) posexplode_outer(col(field)) else posexplode(col(field))
        df.select(others :+ ex.as(Seq(idx, field)): _*)
      case None =>
        val ex = if (preserve) explode_outer(col(field)) else explode(col(field))
        df.select(others :+ ex.as(field): _*)
    }
  }

  /** $lookup: left outer equi-join; the joined rows arrive as an array
    * of structs in field `as` (value-sorted for determinism). The
    * foreign side is pre-aggregated per key so the join is 1:1 — at
    * scale this is one shuffle on the foreign key, never a row
    * explosion, and AQE broadcast-downgrades a small foreign side.
    */
  private def lookup(df: DataFrame, spec: JsonNode,
                     tables: String => DataFrame): DataFrame = {
    val from = spec.get("from").asText()
    val localField = spec.get("localField").asText()
    val foreignField = spec.get("foreignField").asText()
    val as = spec.get("as").asText()
    val foreign = tables(from)
    val packed = foreign
      .groupBy(col(foreignField).as("__graft_key"))
      .agg(array_sort(collect_list(struct(foreign.columns.map(col): _*))).as(as))
    // Deviation from Mongo: an unmatched local row gets NULL in `as`
    // (not []) — a typed empty-array literal would need internal APIs;
    // a following `$unwind` treats both the same.
    df.join(packed, col(localField) === col("__graft_key"), "left")
      .drop("__graft_key")
  }

  private def bucket(df: DataFrame, spec: JsonNode,
                     lastSort: Seq[(String, Boolean)]): DataFrame = {
    val groupExpr = expression(spec.get("groupBy"))
    val bounds = spec.get("boundaries").elements().asScala.map(literalValue).toSeq
    val defaultNode = Option(spec.get("default")).filterNot(_.isNull)
    // A textual default (Mongo allows heterogeneous bucket ids) forces
    // the id column to string so all CASE branches share one type.
    val asText = defaultNode.exists(_.isTextual)
    def idLit(v: Any): Column = if (asText) lit(v).cast("string") else lit(v)
    val bucketed = bounds.sliding(2).toSeq.foldLeft(
      when(lit(false), idLit(bounds.head))) { case (acc, lohi) =>
      val (lo, hi) = (lohi.head, lohi(1))
      acc.when(groupExpr >= lit(lo) && groupExpr < lit(hi), idLit(lo))
    }
    // Mongo aborts when a value falls outside the boundaries and no
    // default exists — mirror that instead of a silent null bucket.
    val withDefault = defaultNode.map(d => bucketed.otherwise(literal(d)))
      .getOrElse(bucketed.otherwise(raise_error(concat(
        lit("$bucket value out of range and no default: "),
        groupExpr.cast("string")))))
    val outSpec = Option(spec.get("output"))
    val accums = outSpec match {
      case Some(o) => o.properties().asScala.toSeq.map(e =>
        accumulator(e.getValue, lastSort).as(e.getKey))
      case None => Seq(count(lit(1)).as("count"))
    }
    df.groupBy(withDefault.as("_id")).agg(accums.head, accums.tail: _*)
      .orderBy(col("_id"))
  }
}
