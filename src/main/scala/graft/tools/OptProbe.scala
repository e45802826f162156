package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch harness for decomposing a query's cost into stages.
  * Not part of the driver contract; edit freely per investigation.
  * Usage: runMain graft.tools.OptProbe <sfDir> <probe> [reps]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probe = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"OPT $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        graft.Seams.release() // per-rep seam storage, like Bench
      }
    val docs = graft.sources.TableCatalog(spark, sfDir).documents
    probe match {
      case "clf" =>
        for (it <- 0 to 2)
          time(s"clf_iters$it")(graft.operators.TextAnalysis.classifierTrain(
            docs, "doc_id", "text", positive = col("lang") === "en",
            dims = 64, iters = it, lr = 5.0))
        time("clf_nopersist")(graft.operators.TextAnalysis.classifierTrain(
          docs, "doc_id", "text", positive = col("lang") === "en",
          dims = 64, iters = 2, lr = 5.0, persist = false))
      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
