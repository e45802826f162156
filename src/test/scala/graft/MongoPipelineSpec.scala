package graft

import graft.plans.MongoPipeline
import graft.sources.TableCatalog

class MongoPipelineSpec extends SparkTestBase {

  private lazy val t = TableCatalog(spark, sfDir)

  test("$match filters push down into the parquet scan") {
    val df = MongoPipeline(t.table("lineitem"),
      """[{"$match": {"l_quantity": {"$lt": 5}}},
         {"$project": {"l_orderkey": 1, "l_quantity": 1}}]""")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5"),
      s"expected pushed filter in:\n$plan")
    // column pruning: scan must not read all 16 lineitem columns
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"expected pruned read schema in:\n$plan")
  }

  test("$sort key order follows JSON order, not alphabetical") {
    val rows = MongoPipeline(t.table("orders"),
      """[{"$sort": {"o_totalprice": -1, "o_orderkey": 1}}, {"$limit": 3},
         {"$project": {"o_totalprice": 1}}]""").collect()
    val prices = rows.map(_.getDouble(0))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("$lookup packs foreign rows as an array; unmatched keys get null") {
    val df = MongoPipeline(t.table("nation"),
      """[{"$match": {"n_nationkey": {"$lt": 3}}},
         {"$lookup": {"from": "supplier", "localField": "n_nationkey",
                      "foreignField": "s_nationkey", "as": "sups"}}]""",
      t.table)
    val rows = df.collect()
    assert(rows.length == 3)
    // suppliers exist only for some nations at sf0.001
    assert(rows.forall(r => r.schema.fieldNames.contains("sups")))
  }

  test("$lookup array localField: any element matches, each foreign doc once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, size => asize}
    val local = Seq(
      (1L, Seq(10L, 20L)),        // matches two foreign keys
      (2L, Seq(10L, 10L, 10L)),   // duplicate elements: docs appear ONCE
      (3L, Seq(99L)),             // no match
      (4L, Seq.empty[Long])       // empty array
    ).toDF("id", "keys")
    val foreign = Seq((10L, "x"), (10L, "x2"), (20L, "y"), (30L, "z"))
      .toDF("fk", "tag")
    val out = MongoPipeline(local,
      """[{"$lookup": {"from": "f", "localField": "keys",
                       "foreignField": "fk", "as": "m"}}]""",
      Map("f" -> foreign).apply)
    val got = out.select(col("id"),
        org.apache.spark.sql.functions.coalesce(asize(col("m")), lit(-1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // id 1: fk 10 packs 2 docs + fk 20 packs 1 = 3; id 2: 2 (once,
    // despite three copies of the element); unmatched/empty → null
    // (size coalesced to -1), the documented NULL-not-[] deviation
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> -1, 4L -> -1), got.toString)
    // scale shape: the match runs as an equi-join, never a nested loop
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("$lookup overwrites an existing `as` field — even when `as` IS the localField") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val foreign = Seq((10L, "x"), (20L, "y")).toDF("fk", "tag")
    // `as` collides with an unrelated existing column
    val l1 = Seq((1L, 10L, "old")).toDF("id", "k", "m")
    val o1 = MongoPipeline(l1,
      """[{"$lookup": {"from": "f", "localField": "k",
                       "foreignField": "fk", "as": "m"}}]""",
      Map("f" -> foreign).apply)
    assert(o1.columns.count(_ == "m") == 1)
    assert(o1.select(col("m").getItem(0).getField("tag")).head().getString(0) == "x")
    // `as` IS the localField: key must still drive the match
    val l2 = Seq((2L, 20L)).toDF("id", "k")
    val o2 = MongoPipeline(l2,
      """[{"$lookup": {"from": "f", "localField": "k",
                       "foreignField": "fk", "as": "k"}}]""",
      Map("f" -> foreign).apply)
    assert(o2.columns.sorted.toSeq == Seq("id", "k"))
    assert(o2.select(col("k").getItem(0).getField("tag")).head().getString(0) == "y")
  }

  test("$lookup array foreignField: a doc matching via several elements appears once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, size => asize}
    val local = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("id", "k")
    val foreign = Seq(
      ("fa", Seq(10L, 20L)),   // owns two keys
      ("fb", Seq(10L)),
      ("fc", Seq.empty[Long])  // matches nothing
    ).toDF("tag", "fks")
    val out = MongoPipeline(local,
      """[{"$lookup": {"from": "f", "localField": "k",
                       "foreignField": "fks", "as": "m"}}]""",
      Map("f" -> foreign).apply)
    val got = out.select(col("id"),
        org.apache.spark.sql.functions.coalesce(asize(col("m")), lit(-1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 2, 2L -> 1, 3L -> -1), got.toString)

    // BOTH sides array: local [10, 20] reaches doc fa through two
    // different keys — still exactly one copy of fa in the result
    val local2 = Seq((1L, Seq(10L, 20L))).toDF("id", "ks")
    val out2 = MongoPipeline(local2,
      """[{"$lookup": {"from": "f", "localField": "ks",
                       "foreignField": "fks", "as": "m"}}]""",
      Map("f" -> foreign).apply)
    assert(out2.select(asize(col("m"))).head().getInt(0) == 2) // fa once + fb once
  }

  test("$first/$last require a preceding $sort") {
    val ex = intercept[IllegalArgumentException] {
      MongoPipeline(t.table("events"),
        """[{"$group": {"_id": "$user_id", "f": {"$first": "$value"}}}]""")
        .collect()
    }
    assert(ex.getMessage.contains("$sort"))
  }

  test("unsupported stage raises a clear error") {
    val ex = intercept[IllegalArgumentException] {
      MongoPipeline(t.table("events"), """[{"$merge": {"into": "x"}}]""")
    }
    assert(ex.getMessage.contains("unsupported stage"))
  }

  test("$unwind with includeArrayIndex matches split length") {
    val rows = MongoPipeline(t.table("documents"),
      """[{"$match": {"doc_id": 0}},
         {"$set": {"words": {"$split": ["$text", " "]}}},
         {"$unwind": {"path": "$words", "includeArrayIndex": "i"}}]""").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("i")).toSeq == (0 until rows.length).toSeq)
  }

  test("$match on null matches null fields; object/array equality refuses") {
    val withNull = t.table("events")
      .withColumn("maybe", org.apache.spark.sql.functions.expr(
        "CASE WHEN event_type = 'error' THEN NULL ELSE props END"))
    val nulls = MongoPipeline(withNull, """[{"$match": {"maybe": null}}]""").count()
    val errors = t.table("events").filter("event_type = 'error'").count()
    assert(nulls == errors)
    intercept[IllegalArgumentException] {
      MongoPipeline(t.table("events"), """[{"$match": {"props": {"k": 1}}}]""")
    }
  }

  test("$group with only _id acts as distinct") {
    val got = MongoPipeline(t.table("customer"),
      """[{"$group": {"_id": "$c_mktsegment"}}]""").collect()
    assert(got.map(_.getString(0)).sorted.toSeq ==
      t.table("customer").select("c_mktsegment").distinct()
        .collect().map(_.getString(0)).sorted.toSeq)
  }

  test("$dateToString default format emits ISO with literal T and Z") {
    val s = MongoPipeline(t.table("lineitem"),
      """[{"$limit": 1}, {"$project": {"d": {"$dateToString": {"date": "$l_shipdate"}}}}]""")
      .head.getString(0)
    assert(s.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z"""), s)
  }

  test("$bucket without default errors on out-of-range values") {
    val ex = intercept[Exception] {
      MongoPipeline(t.table("customer"),
        """[{"$bucket": {"groupBy": "$c_acctbal", "boundaries": [0, 100]}}]""")
        .collect()
    }
    assert(ex.getMessage.contains("out of range"), ex.getMessage)
  }

  test("$bucket with textual default yields string ids covering all rows") {
    val rows = MongoPipeline(t.table("orders"),
      """[{"$bucket": {"groupBy": "$o_totalprice",
           "boundaries": [0, 100000], "default": "other"}}]""").collect()
    val total = rows.map(_.getAs[Long]("count")).sum
    assert(total == t.table("orders").count())
  }
}
