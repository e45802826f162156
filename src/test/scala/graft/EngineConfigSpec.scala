package graft

import graft.config.EngineConfig
import graft.functions.AvroCodec
import graft.sources.TableCatalog

class EngineConfigSpec extends SparkTestBase {

  private val configJson =
    """{
      |  "change-stream-namespaces": ["test.events"],
      |  "direct-read-namespaces": ["test.customer", "test.nation"],
      |  "topic-name-prefix": "r81",
      |  "producer-map": [
      |    {"mongo-namespace": "test.customer", "kafka-topic": "customers"}
      |  ],
      |  "pipeline": [
      |    {"namespace": "test.customer", "direct": true,
      |     "stages": "[{\"$match\": {\"c_acctbal\": {\"$gt\": 0}}}]"},
      |    {"namespace": "test.events", "direct": false,
      |     "stages": "[{\"$match\": {\"op\": \"i\"}}]"}
      |  ],
      |  "consumer": [
      |    {"namespace": "test.sink", "topics": ["test.events"],
      |     "message-format": "json-ext", "document-root-path": "data"}
      |  ]
      |}""".stripMargin

  test("config parses all reference sections with defaults") {
    val cfg = EngineConfig.fromJson(configJson)
    assert(cfg.directReadNamespaces == Seq("test.customer", "test.nation"))
    assert(cfg.topicPrefix == "r81")
    assert(cfg.pipelineFor("test.customer", stream = false).isDefined)
    assert(cfg.pipelineFor("test.customer", stream = true).isEmpty)
    assert(cfg.pipelineFor("test.events", stream = true).isDefined)
    assert(cfg.consumers.head.bulkSize == 100) // default
    assert(cfg.consumers.head.bulkFlushDuration == "5 seconds") // default
    val explicit = EngineConfig.fromJson(
      """{"consumer": [{"namespace": "a.b", "topics": ["t"],
        |  "bulk-flush-duration": "250 milliseconds"}]}""".stripMargin)
    assert(explicit.consumers.head.bulkFlushDuration == "250 milliseconds")
  }

  test("invalid consumer namespace fails validation like the reference") {
    val bad = """{"consumer": [{"namespace": "nodot", "topics": ["t"]}]}"""
    intercept[IllegalArgumentException](EngineConfig.fromJson(bad))
  }

  test("direct reads honor pipeline, producer map, and prefix") {
    val cfg = EngineConfig.fromJson(configJson)
    val msgs = GraftEngine.directReadMessages(spark, cfg, sfDir, "test.customer")
    val rows = msgs.collect()
    val customers = TableCatalog(spark, sfDir).customer
    val expected = customers.filter("c_acctbal > 0").count()
    assert(rows.length == expected) // pipeline filter applied
    assert(rows.forall(_.getAs[String]("topic") == "r81.customers"))
    assert(rows.head.getAs[String]("value").contains("\"op\":\"\""))
    assert(rows.head.getAs[String]("value").contains("\"$numberLong\""))
  }

  test("allDirectReads unions every configured namespace") {
    val cfg = EngineConfig.fromJson(configJson)
    val n = GraftEngine.allDirectReads(spark, cfg, sfDir).count()
    val t = TableCatalog(spark, sfDir)
    assert(n == t.customer.filter("c_acctbal > 0").count() + t.nation.count())
  }

  test("avro round-trips binary and textual (reference consumer formats)") {
    val schema =
      """{"type": "record", "name": "Ev", "fields": [
        |  {"name": "user_id", "type": "long"},
        |  {"name": "value", "type": "double"},
        |  {"name": "props", "type": "string"}]}""".stripMargin
    val src = TableCatalog(spark, sfDir).events
      .selectExpr("user_id", "value", "props").limit(50)
    for (binary <- Seq(true, false)) {
      val decoded = AvroCodec.decode(AvroCodec.encode(src, schema, binary),
        schema, binary)
      assert(decoded.exceptAll(src).isEmpty && src.exceptAll(decoded).isEmpty,
        s"binary=$binary round trip mismatch")
    }
  }
}
