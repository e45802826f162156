package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev harness: time selected queries repeatedly to separate fixed
  * (codegen/JIT) cost from marginal cost. Not part of the driver
  * contract. Usage: runMain graft.tools.Profile <sfDir> <reps> <name...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    var builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // dev-only experiment knob: "k=v;k=v" extra sql confs
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder = builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JIT/codegen warmup on the smallest SF (Bench.scala's move) so
    // rep timings compare steady states, not compilation.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (warmDir != "none")
      for (_ <- 1 to 2; name <- names) {
        try SparkEntry.queries(name)(spark, warmDir).count()
        catch { case scala.util.control.NonFatal(_) => () }
        graft.Seams.release()
      }
    for (name <- names; rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN") && rep == 1)
        df.explain("formatted")
      val n = df.count()
      println(f"PROF $name rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      graft.Seams.release() // per-rep seam storage, like Bench
    }
    spark.stop()
  }
}
