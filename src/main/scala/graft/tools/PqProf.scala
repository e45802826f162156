package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev profiler for the PQ chain pieces. Not driver contract. */
object PqProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.TableCatalog(spark, sfDir).embeddings
    emb.count()
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs += 1; stages += j.stageInfos.size
        }
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          tasks += 1
      })
    def resetCounts(): Unit = { jobs = 0; stages = 0; tasks = 0 }
    def printCounts(name: String): Unit =
      println(s"PQPROF $name counts: jobs=$jobs stages=$stages tasks=$tasks")
    def t(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        if (i == 3) { Thread.sleep(200); resetCounts() }
        val t0 = System.nanoTime()
        val n = f
        println(f"PQPROF $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
        if (i == 3) { Thread.sleep(200); printCounts(name) }
      }
    }
    t("codebook") { graft.operators.Similarity.pqCodebookSeq(emb, 4, 16, 4, 2,
      emb.filter(col("vec_id") < 4).orderBy("vec_id")
        .select(col("vec_id").cast("int"), col("embedding"))
        .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq).size.toLong }
    t("codes")    { graft.operators.Similarity.pqCodes(spark, emb).count() }
    t("topk_pq")  { graft.operators.Similarity.pqTopK(spark, emb, emb.filter(col("vec_id") < 10), 5).count() }
    t("topk_ivfpq") { graft.operators.Similarity.ivfPqTopK(spark, emb, emb.filter(col("vec_id") < 10), 5).count() }
    spark.stop()
  }
}
