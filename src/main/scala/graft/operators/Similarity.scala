package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity

/** Similarity search over embedding columns (SURVEY.md §2 group G). */
object Similarity {

  private def withCosine(s: SparkSession): Unit = CosineSimilarity.register(s)

  /** G1: brute-force cosine top-k — the exact baseline. The query set
    * is explicitly broadcast, so the big side streams once through a
    * codegen'd loop with no shuffle of the embedding table; ranking is
    * a window over (query, rounded-cos desc, id) partitions.
    */
  def bruteForceTopK(s: SparkSession, emb: DataFrame, queries: DataFrame,
                     k: Int): DataFrame = {
    withCosine(s)
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    val scored = emb.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("cos_r", expr("round(cosine_sim(q_emb, embedding), 4)"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_r").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos_r"), col("rank"))
  }

  /** Deterministic random-hyperplane signature: plane p's coefficient
    * for dimension d is `((1+p*64+d)*2654435761 mod 1000003)/1000003
    * - 0.5` — integer arithmetic both engines reproduce exactly.
    * Computed per-row with higher-order functions: narrow, no shuffle,
    * no explode.
    */
  def planeSignature(embCol: String, planes: Int): org.apache.spark.sql.Column =
    (0 until planes).map { p =>
      val dot = expr(
        s"""aggregate(transform(sequence(0, 63), d ->
           |  CAST(element_at($embCol, d + 1) AS DOUBLE) *
           |  (CAST(((1 + $p * 64 + d) * 2654435761) % 1000003 AS DOUBLE)
           |     / 1000003.0 - 0.5)),
           |CAST(0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
      when(dot > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** G2: LSH-bucketed ANN: vectors hash to a `planes`-bit bucket; a
    * query only scores candidates in its own bucket, then reranks with
    * exact cosine. At scale the bucket id is the shuffle key (uniform
    * by construction) and each bucket is a tiny local top-k.
    */
  def lshTopK(s: SparkSession, emb: DataFrame, queries: DataFrame,
              k: Int, planes: Int = 8): DataFrame = {
    withCosine(s)
    val bucketed = emb.withColumn("bucket", planeSignature("embedding", planes))
    val q = broadcast(queries
      .withColumn("bucket", planeSignature("embedding", planes))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("bucket")))
    bucketed.join(q, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_r", expr("round(cosine_sim(q_emb, embedding), 4)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_r").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos_r"), col("rank"))
  }

  /** G3: norms/normalization plumbing — exact double accumulation in
    * index order via fold, no shuffle.
    */
  def norms(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      size(col("embedding")).as("dim"),
      round(sqrt(expr(
        """aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
          |CAST(0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)), 4).as("norm"))

  /** F6: embedding near-dup pairs, blocked by label (the coarse
    * quantizer an IVF index would give): pairs only form inside a
    * label partition — one shuffle on label, never all-pairs.
    */
  def nearDupPairs(s: SparkSession, emb: DataFrame, tau: Double): DataFrame = {
    withCosine(s)
    val a = emb.select(col("label"), col("vec_id").as("a"), col("embedding").as("ea"))
    val b = emb.select(col("label"), col("vec_id").as("b"), col("embedding").as("eb"))
    a.join(b, Seq("label"))
      .filter(col("a") < col("b"))
      .withColumn("cos_r", expr("round(cosine_sim(ea, eb), 4)"))
      .filter(col("cos_r") >= tau)
      .select(col("label"), col("a"), col("b"), col("cos_r"))
  }
}
