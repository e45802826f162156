package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.TableCatalog

/** Dev-only: decompose dedup_ngram_jaccard cost by materializing each
  * intermediate. Usage: runMain graft.tools.NgramProbe <sfDir>
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = TableCatalog(spark, sfDir).documents
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SEG $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // replicate internals
    import graft.functions.{WordShingles, ShingleHashes}
    import org.apache.spark.sql.GraftBridge
    def tokens(c: org.apache.spark.sql.Column) =
      split(trim(lower(c)), " +")
    def shingles(c: String, n: Int) =
      GraftBridge.column(WordShingles(GraftBridge.expression(col(c)), n))
    val base = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("sh", shingles("toks", 2))
      .select(col("doc_id").as("id"), col("sh"), size(col("sh")).as("sz"))
      .filter(col("sz") > 0)
    val post = base.select(col("id"), col("sz"), explode(col("sh")).as("shingle"))
    for (_ <- 1 to 2) {
      t("post.count")(println(post.count()))
      val df = post.groupBy("shingle").agg(count(lit(1)).as("df"))
      t("df.count")(println(df.count()))
      val ranked = post.join(df, "shingle")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("df"), col("shingle"))))
      val tau = 0.8
      val prefix = ranked.filter(col("rk") <= floor(col("sz") - lit(tau) * col("sz")) + 1)
        .select(col("id"), col("sz"), col("rk"), col("shingle"))
      t("prefix.count")(println(prefix.count()))
      val alpha = ceil(lit(tau / (1 + tau)) * (col("a.sz") + col("b.sz")))
      val candRaw = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")) >=
            lit(tau) * greatest(col("a.sz"), col("b.sz")) &&
          (least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk")) + 1) >= alpha)
        .select(col("a.id").as("a"), col("a.sz").as("sza"),
          col("b.id").as("b"), col("b.sz").as("szb"))
      t("candRaw.count")(println(candRaw.count()))
      val cand = candRaw.distinct()
      t("cand.distinct.count")(println(cand.count()))
      t("full")(println(Dedup.ngramJaccard(docs, "doc_id", "text").count()))
    }
    spark.stop()
  }
}
