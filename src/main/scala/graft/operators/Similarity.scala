package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CosineSimilarity, Int8Quantize, PlaneSignature, VecMaxAbs, VecSqNorm}

/** Similarity search over embedding columns (SURVEY.md §2 group G). */
object Similarity {

  private def withCosine(s: SparkSession): Unit = CosineSimilarity.register(s)

  private def expr1(f: org.apache.spark.sql.catalyst.expressions.Expression => org.apache.spark.sql.catalyst.expressions.Expression)(c: Column): Column =
    GraftBridge.column(f(GraftBridge.expression(c)))

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
    * One native codegen'd loop per row ([[graft.functions.PlaneSignature]]):
    * narrow, no shuffle, no explode, no interpreted lambdas.
    */
  def planeSignature(embCol: String, planes: Int): Column =
    expr1(PlaneSignature(_, planes))(col(embCol))

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

  /** G5: symmetric int8 quantization of an embedding column — the
    * memory-bandwidth lever for 100 TB ANN (4× smaller scans, SIMD
    * int dot products). Per-vector scale = max|x|/127; emits the
    * quantized array + scale + max reconstruction error. Narrow, no
    * shuffle; formulas are exact-rational over the float inputs so
    * the DuckDB oracle reproduces them bit-for-bit.
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val maxAbs = expr1(VecMaxAbs(_))(col("embedding"))
    emb.select(
      col("vec_id"),
      round(maxAbs, 6).as("scale_r"),
      GraftBridge.column(Int8Quantize(
        GraftBridge.expression(col("embedding")),
        GraftBridge.expression(maxAbs))).as("q"))
  }

  /** G7: quantized top-k — the production ANN scan shape at 100 TB.
    * Both sides quantize to int8 (4× less memory traffic), the query
    * side broadcasts, and ranking happens on the EXACT integer dot
    * product via the native codegen'd [[graft.functions.Int8Dot]]
    * (no FP reassociation → identical result on any engine, any
    * partitioning). One pass over the corpus, no shuffle of it; the
    * per-query top-k window shuffles only (queries × corpus-rows
    * surviving nothing — it ranks all pairs, bounded by the tiny
    * broadcast query set).
    */
  def int8TopK(s: SparkSession, emb: DataFrame, queries: DataFrame,
               k: Int): DataFrame = {
    val corpus = quantizeInt8(emb)
      .select(col("vec_id"), col("scale_r").as("scale_c"), col("q"))
    val q = broadcast(quantizeInt8(queries)
      .select(col("vec_id").as("query_id"), col("scale_r").as("scale_q"),
        col("q").as("qq")))
    def dot = GraftBridge.column(graft.functions.Int8Dot(
      GraftBridge.expression(col("qq")), GraftBridge.expression(col("q"))))
    // Rank on the DESCALED score dot_i·scale_q·scale_c: per-vector
    // scales make the raw integer dot incomparable across corpus
    // vectors (q_a·q_b ∝ (a·b)/(maxA·maxB)); the exact integer dot
    // stays the kernel, two FP multiplies descale it (fixed order —
    // bit-identical on any engine).
    corpus.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("dot_i", dot)
      .withColumn("score",
        col("dot_i").cast("double") * col("scale_q") * col("scale_c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("dot_i"), round(col("score"), 4).as("score_r"), col("rank"))
  }

  /** G3: norms/normalization plumbing — exact double accumulation in
    * index order via fold, no shuffle.
    */
  def norms(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      size(col("embedding")).as("dim"),
      round(sqrt(expr1(VecSqNorm(_))(col("embedding"))), 4).as("norm"))

  /** G2b: IVF-style ANN with a trained coarse quantizer. k-means with
    * deterministic seeding (centroids start at the first `nlist`
    * vectors); per iteration, vectors assign to their max-cosine
    * centroid and centroids re-center (posexplode + per-dim mean —
    * one shuffle of n·dim rows). Model (nlist·dim floats) lives on
    * the driver and broadcasts — the data never collects. Search
    * probes the query's `nprobe` closest cells and reranks exactly,
    * so cost is (n/nlist)·nprobe per query instead of n.
    */
  def ivfTopK(s: SparkSession, emb: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 8, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    withCosine(s)
    import s.implicits._

    def centDf(cents: Seq[(Int, Seq[Float])]): DataFrame =
      broadcast(cents.toDF("cid", "cvec"))

    var cents: Seq[(Int, Seq[Float])] = emb.filter(col("vec_id") < nlist)
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getAs[Long]("vec_id").toInt,
        r.getSeq[Float](r.fieldIndex("embedding"))))
      .toSeq

    def assign(c: DataFrame): DataFrame =
      emb.join(c, expr("true"))
        .withColumn("cs", expr("cosine_sim(embedding, cvec)"))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("cs"), -col("cid"))).as("cid"),
          first(col("embedding")).as("embedding"))

    for (_ <- 1 to iters) {
      val assigned = assign(centDf(cents))
      cents = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("d", "v")))
        .groupBy(col("cid"), col("d"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("d"), col("m")))).as("dm"))
        .select(col("cid"), expr("transform(dm, x -> CAST(x.m AS FLOAT))").as("cvec"))
        .collect()
        .map(r => (r.getAs[Int]("cid"), r.getSeq[Float](1)))
        .toSeq
    }

    val cells = assign(centDf(cents)).select(col("vec_id"), col("cid"),
      col("embedding"))
    val probes = queries
      .join(centDf(cents), expr("true"))
      .withColumn("cs", expr("cosine_sim(embedding, cvec)"))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cid"))))
      .filter(col("pr") <= nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("cid"))
    cells.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_r", expr("round(cosine_sim(q_emb, embedding), 4)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_r").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos_r"), col("rank"))
  }

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
