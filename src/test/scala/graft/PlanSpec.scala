package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Multimodal, TextAnalysis}
import graft.sources.TableCatalog

/** Plan-shape audit (SURVEY.md §5/§8): the properties that make these
  * operators survive a 100 TB cluster, asserted on the optimized
  * plans so regressions fail loudly.
  */
class PlanSpec extends SparkTestBase {

  private lazy val t = TableCatalog(spark, sfDir)

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6: filter and projection reach the parquet scan") {
    val plan = executed(Analytics.revenueForecast(t.lineitem))
    // (plan metadata strings truncate at ~100 chars — match prefixes)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
    // only the 4 needed columns are read
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp"),
      plan)
  }

  test("q5: fixed-cardinality dims broadcast; fact side never broadcasts") {
    val plan = executed(Analytics.localVolume(t.region, t.nation, t.customer,
      t.supplier, t.orders, t.lineitem))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // lineitem (the fact) must not appear under a BroadcastExchange
    val broadcastIdx = plan.indexOf("BroadcastExchange")
    assert(broadcastIdx > 0)
  }

  test("narrow operators plan zero shuffles") {
    for (df <- Seq(
      Multimodal.binaryMeta(t.documents, "doc_id", "text"),
      TextAnalysis.tokenCounts(t.documents, "doc_id", "text"),
      TextAnalysis.fingerprints(t.documents, "doc_id", "text"))) {
      val plan = executed(df)
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    }
  }

  test("bucketed tables co-locate the orderkey join: no exchange at all") {
    // the in-memory catalog forgets tables across sessions but the
    // warehouse files persist — clear both
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    for (d <- Seq("li_b", "ord_b")) {
      val p = java.nio.file.Paths.get("/tmp/graft-test-warehouse", d)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    t.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    t.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      val plan = executed(joined)
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("latest-state fold is a single shuffle (partial agg, no sort)") {
    val plan = executed(graft.operators.Cdc.latestState(
      graft.operators.Cdc.eventsAsOpLog(t.events)))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one shuffle:\n$plan")
    assert(!plan.contains("Window"), "must not use row_number/sort")
  }

  test("correlated $lookup extracts the equi-key: hash join, never nested-loop") {
    val plan = executed(
      graft.plans.ExtendedQueries.queries("pipe_lookup_let")(spark, sfDir))
      .replaceAll("#\\d+L?", "")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"correlated lookup degenerated to a product join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    // the non-equi correlated predicate rides the join as a residual
    assert(plan.contains("l_shipdate > o_orderdate") ||
      plan.contains("o_orderdate < l_shipdate"), plan)
  }

  test("$merge plans one keyed full-outer join, filters pushed to the source scan") {
    val plan = executed(
      graft.plans.ExtendedQueries.queries("pipe_merge")(spark, sfDir))
    assert(plan.contains("FullOuter"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), LessThanOrEqual(c_custkey,50)"),
      plan)
  }

  test("$setWindowFields compiles to window passes partitioned by the key (no global sort)") {
    val plan = executed(
      graft.plans.ExtendedQueries.queries("pipe_window_fields")(spark, sfDir))
    assert(plan.contains("Window"), plan)
    assert(plan.contains("hashpartitioning(o_custkey"), plan)
  }

  test("$sample is a top-n (TakeOrdered), never a full sort") {
    val plan = executed(
      graft.plans.ExtendedQueries.queries("pipe_sample")(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort crept into \\$$sample:\n$plan")
  }

  test("top-k window shapes get WindowGroupLimit: partial per-partition pruning before the shuffle") {
    import graft.operators.Similarity
    val e = t.embeddings
    // Spark's InferWindowGroupLimit must fire on every rank<=k filter
    // shape so only ~k rows per map partition reach the exchange —
    // the built-in partial top-k we deliberately do NOT hand-roll.
    for (df <- Seq(
      Similarity.bruteForceTopK(spark, e, e.filter(col("vec_id") < 3), k = 5),
      Similarity.int8TopK(spark, e, e.filter(col("vec_id") < 3), k = 5),
      Similarity.prunedSurvivors(spark, e, e.filter(col("vec_id") < 3), k = 5))) {
      val plan = executed(df)
      assert(plan.contains("WindowGroupLimit"),
        s"no WindowGroupLimit (partial top-k) in:\n$plan")
    }
  }

  test("hash sampling is a pure map-side filter: zero shuffles") {
    val plan = executed(
      graft.plans.ExtendedQueries.queries("sample_hash")(spark, sfDir))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("chunking and scrubbing plan zero shuffles") {
    for (name <- Seq("doc_chunks", "text_scrub")) {
      val plan = executed(
        graft.plans.ExtendedQueries.queries(name)(spark, sfDir))
      assert(!plan.contains("Exchange"), s"$name shuffled:\n$plan")
    }
  }

  test("$densify grid generation aggregates before exploding (no driver loop)") {
    val plan = executed(
      graft.plans.ExtendedQueries.queries("pipe_densify_fill")(spark, sfDir))
    assert(plan.contains("Generate explode"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("embedding norms/quantize: single codegen projection — no join, no shuffle, no HOF") {
    import graft.operators.Similarity
    for (df <- Seq(Similarity.norms(t.embeddings),
      Similarity.quantizeInt8(t.embeddings))) {
      val plan = executed(df)
      assert(!plan.contains("Join"), s"self-join crept back:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      // interpreted HOF lambdas print as "lambdafunction" in the plan
      assert(!plan.contains("lambdafunction"), s"interpreted HOF:\n$plan")
      assert(plan.startsWith("*(1)"), s"not one codegen span:\n$plan")
    }
  }

  test("langid/quality: native stopword counting — no interpreted lambda, one codegen span") {
    for (df <- Seq(
      TextAnalysis.langId(t.documents, "doc_id", "text"),
      TextAnalysis.quality(t.documents, "doc_id", "text"))) {
      val plan = executed(df)
      assert(plan.contains("in_set_count"), s"native counter missing:\n$plan")
      assert(!plan.contains("lambdafunction"), s"interpreted HOF:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      // the whole text scan rides one whole-stage-codegen span
      assert(plan.startsWith("*(1)"), s"not one codegen span:\n$plan")
    }
  }

  test("fingerprint collapse: both windows share ONE fingerprint exchange") {
    val plan = executed(graft.operators.Dedup.collapseFingerprints(
      t.documents, "doc_id", "text"))
    // row_number and the group-size count partition identically, so
    // the planner must reuse a single hashpartitioning exchange on the
    // fingerprint — a second full-corpus shuffle here would double the
    // collapse cost at 100 TB
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 shuffle:\n$plan")
  }

  test("tokenBalancedShards: one data shuffle; the global window holds bucket SUMS, never rows") {
    import graft.functions.Hash60.tokens
    val plan = executed(graft.operators.Pipeline100TB.tokenBalancedShards(
      t.documents.select(col("doc_id"), col("text")), col("doc_id"),
      size(tokens(col("text"))).cast("long"), nShards = 8))
    // data shuffles: the bucket-partitioned window (1) and the bucket
    // aggregation feeding the offsets (1); offsets come back by
    // broadcast, never by joining a shuffled corpus
    assert(plan.contains("BroadcastExchange"), plan)
    // the only single-partition window is over the ≤2^bucketBits
    // bucket sums (partitioned windows show `windowspecdefinition(__b`)
    assert(plan.contains("windowspecdefinition(__b"), plan)
  }

  test("cross-corpus band join: an equi-join on (band, key) — no nested loop, no cartesian") {
    val d = t.documents
    val plan = executed(graft.operators.Dedup.crossCorpusCandidates(
      d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
      "doc_id", "text"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("tf-idf corpus count is folded in (broadcast), not a separate driver action") {
    val df = graft.operators.TextAnalysis.topTerms(t.documents, "doc_id", "text", 5)
    val plan = executed(df)
    // the 1-row corpus-count side arrives via a broadcast join, and
    // building the DataFrame runs no job at all (count() would have)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    // doc-frequency is a window over the per-doc aggregate: the
    // exploded token stream is built and shuffled exactly once
    assert("Generate explode".r.findAllIn(plan).size == 1,
      s"token stream must explode exactly once:\n$plan")
  }

  test("broker log append: offsets sequence per (topic, partition) — no global sort") {
    import graft.streaming.KafkaLog
    val msgs = t.events.selectExpr("'t' as topic",
      "cast(user_id as string) as key", "props as value", "event_id as seq")
    val plan = executed(KafkaLog.append(msgs, 4, "seq"))
    assert(plan.contains("Window"), plan)
    // partitioned window: hashpartitioning on (topic, partition), not a
    // single global range sort
    assert(plan.contains("hashpartitioning"), plan)
    assert(!plan.contains("rangepartitioning"), s"global sort:\n$plan")
  }
}
