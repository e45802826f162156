package graft

import graft.sources.TableCatalog

/** Pin the engine-visible schema of every driver-generated testdata
  * table, as seen THROUGH TableCatalog (i.e. after any adaptive
  * normalization such as the events.ts nanos-vs-micros branch).
  *
  * Purpose: the round-9 testdata regeneration silently flipped
  * `events.ts` from TIMESTAMP(NANOS) to timestamp[us] and 38 oracle
  * queries vanished from the correctness artifact with no red signal
  * anywhere. This spec converts the next such drift into a failing
  * test with a readable expected-vs-actual DDL diff.
  */
class TestdataContractSpec extends SparkTestBase {

  // Contract is asserted at sf0.01 (the driver's verify scale); the
  // same generator writes every sf, so one scale pins them all.
  private val dir = "/root/testdata/sf0.01"

  private def ddl(table: String): String =
    TableCatalog(spark, dir).table(table).schema.fields
      .map(f => s"${f.name}:${f.dataType.sql.toLowerCase}")
      .mkString(", ")

  private val expected = Map(
    "region" -> "r_regionkey:int, r_name:string",
    "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
      "c_acctbal:double, c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, p_type:string, " +
      "p_size:int, p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
      "o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
      "l_linenumber:int, l_quantity:double, l_extendedprice:double, " +
      "l_discount:double, l_tax:double, l_returnflag:string, " +
      "l_linestatus:string, l_shipdate:timestamp_ntz"),
    // events.ts MUST surface as session-TZ TIMESTAMP regardless of the
    // file's physical encoding — that is TableCatalog's normalization
    // contract, and every events-based oracle depends on it.
    "events" -> ("event_id:bigint, ts:timestamp, user_id:bigint, " +
      "event_type:string, value:double, props:string"),
    "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
    "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int"
  )

  for ((table, want) <- expected.toSeq.sortBy(_._1)) {
    test(s"testdata contract: $table schema is stable") {
      assert(ddl(table) === want)
    }
  }

  test("testdata contract: events.ts values survive normalization") {
    // Spot-check the normalization is value-preserving, not just
    // type-correct: min/max must land in the generator's date range
    // and be non-null for every row.
    import org.apache.spark.sql.functions._
    val ev = TableCatalog(spark, dir).events
    val row = ev.agg(
      count(when(col("ts").isNull, 1)).as("nulls"),
      min("ts").cast("string").as("lo"),
      max("ts").cast("string").as("hi")).head()
    assert(row.getLong(0) === 0L)
    assert(row.getString(1) >= "1990-01-01")
    assert(row.getString(2) <= "2100-01-01")
  }
}
