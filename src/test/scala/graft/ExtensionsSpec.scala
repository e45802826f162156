package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** GraftExtensions: SQL function surface + the sorted-intersect
  * optimizer rewrite, installed through SparkSessionExtensions the
  * way a cluster would (`spark.sql.extensions=graft.GraftExtensions`).
  */
class ExtensionsSpec extends SparkTestBase {

  private def withExtSession[A](f: SparkSession => A): A = {
    val base = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(ext)
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("extension-registered SQL functions resolve and compute") {
    withExtSession { s =>
      val r = s.sql(
        """SELECT sorted_intersect_count(array(1L,2L,3L), array(2L,3L,9L)) AS i,
          |       int8_dot(array(1,2,3), array(4,5,6)) AS d,
          |       round(cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)), 4) AS c,
          |       word_shingles(array('a','b','c'), 2) AS sh
          |""".stripMargin).collect()(0)
      assert(r.getAs[Int]("i") == 2)
      assert(r.getAs[Long]("d") == 4 + 10 + 18)
      assert(r.getAs[Double]("c") == 1.0)
      assert(r.getSeq[String](r.fieldIndex("sh")).toSeq == Seq("a b", "b c"))
    }
  }

  test("size(array_intersect(shingle_hashes, shingle_hashes)) rewrites to the sorted merge") {
    withExtSession { s =>
      // parquet-backed input so constant folding can't erase the shape
      val df = s.read.parquet(s"$sfDir/documents.parquet").limit(5)
        .selectExpr(
          """size(array_intersect(shingle_hashes(split(text, ' '), 2),
            |shingle_hashes(split(lower(text), ' '), 2))) AS n""".stripMargin)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("sorted_intersect_count"),
        s"rewrite did not fire:\n$optimized")
      // text vs lower(text): identical shingle sets → full overlap
      df.collect().foreach(r => assert(r.getInt(0) > 0))
    }
  }
}
