package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not part of the driver contract): build a larger
  * scale factor by key-offset replication of an existing one, for
  * local scaling sweeps — e.g. sf0.1 × 10 ≈ sf1.
  *
  * Each scalable table is unioned `copies` times with every key
  * column shifted by `i * (max(key over its domain) + 1)`, using ONE
  * offset base per key DOMAIN so foreign keys stay consistent across
  * tables (copy i of lineitem joins copy i of orders/part/supplier).
  * The fixed-cardinality dims (region, nation) are copied verbatim,
  * exactly as TPC-H holds them constant across scale factors.
  *
  * Semantics note for derived sweeps: text/embedding payloads are NOT
  * perturbed, so replicated documents are TRUE duplicates — the
  * dedup/similarity families see a 10×-denser duplicate graph (more
  * output pairs per doc), which is the honest hard case, not a bug.
  *
  * Usage: runMain graft.tools.MakeScale <srcDir> <dstDir> <copies>
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, copiesStr) = args
    val copies = copiesStr.toInt
    require(copies >= 1, "copies must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.ts is TIMESTAMP(NANOS): read it as a plain long and write
    // it back as int64 — TableCatalog.events handles both encodings
    // (`ts div 1000` is typed the same over long and nanos-as-long)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def read(name: String) = spark.read.parquet(s"$srcDir/$name.parquet")

    // key domain → (table, column) that defines the offset base
    val domains = Map(
      "custkey" -> ("customer", "c_custkey"),
      "orderkey" -> ("orders", "o_orderkey"),
      "partkey" -> ("part", "p_partkey"),
      "suppkey" -> ("supplier", "s_suppkey"),
      "event" -> ("events", "event_id"),
      "user" -> ("events", "user_id"),
      "doc" -> ("documents", "doc_id"),
      "vec" -> ("embeddings", "vec_id"))
    val bases: Map[String, Long] = domains.map { case (d, (t, c)) =>
      d -> (read(t).agg(max(col(c))).head.getLong(0) + 1L)
    }
    // table → its key columns and their domains
    val tableKeys: Seq[(String, Seq[(String, String)])] = Seq(
      "customer" -> Seq("c_custkey" -> "custkey"),
      "supplier" -> Seq("s_suppkey" -> "suppkey"),
      "part" -> Seq("p_partkey" -> "partkey"),
      "orders" -> Seq("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"),
      "lineitem" -> Seq("l_orderkey" -> "orderkey", "l_partkey" -> "partkey",
        "l_suppkey" -> "suppkey"),
      "events" -> Seq("event_id" -> "event", "user_id" -> "user"),
      "documents" -> Seq("doc_id" -> "doc"),
      "embeddings" -> Seq("vec_id" -> "vec"))

    for (name <- Seq("region", "nation"))
      read(name).write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
    for ((name, keys) <- tableKeys) {
      val src = read(name)
      val scaled = (0 until copies).map { i =>
        keys.foldLeft(src) { case (df, (c, d)) =>
          df.withColumn(c, col(c) + lit(i * bases(d)))
        }
      }.reduce(_ union _)
      scaled.write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
      println(s"[scale] $name: ${src.count()} x $copies rows")
    }
    spark.stop()
  }
}
