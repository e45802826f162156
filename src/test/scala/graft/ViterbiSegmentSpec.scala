package graft

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.functions.ViterbiSegment
import graft.sources.TableCatalog

/** [[graft.functions.ViterbiSegment]] — the native DP kernel that
  * replaced unigramSegment's two interpreted `aggregate` folds. The
  * contract is BIT-IDENTITY with the replaced folds (same INF guard,
  * same min-cost DP, same minimal-start tie break, same substring
  * semantics), asserted by running BOTH forms over the real corpus
  * lattice and over an adversarial tie-heavy vocabulary.
  */
class ViterbiSegmentSpec extends SparkTestBase {

  /** The replaced SQL folds, verbatim. */
  private def foldSegment(latticed: DataFrame): DataFrame =
    latticed
      .withColumn("best", expr(
        """aggregate(sequence(1, n), array(CAST(0 AS BIGINT)),
             (acc, i) -> concat(acc, array(coalesce(
               array_min(transform(filter(ps, p -> p.en = i),
                 p -> element_at(acc, p.st) + p.cost)),
               CAST(1000000000000000 AS BIGINT)))))"""))
      .withColumn("__paths", expr(
        """aggregate(sequence(1, n), array(''),
             (acc, i) -> concat(acc, array(
               element_at(transform(
                 array(array_min(transform(filter(ps,
                   p -> p.en = i AND
                        element_at(best, p.st) + p.cost =
                        element_at(best, i + 1)),
                   p -> p.st))),
                 s -> concat(element_at(acc, s), ' ',
                   substring(w, s, i - s + 1))), 1))))"""))
      .select(col("w"),
        element_at(col("best"), col("n") + 1).as("wcost"),
        expr("filter(split(element_at(__paths, n + 1), ' '), x -> x <> '')")
          .as("segs"))

  private def nativeSegment(latticed: DataFrame): DataFrame =
    latticed
      .withColumn("__v", GraftBridge.column(ViterbiSegment(
        GraftBridge.expression(col("w")), GraftBridge.expression(col("ps")))))
      .select(col("w"), col("__v.wcost").as("wcost"), col("__v.segs").as("segs"))

  /** Build the (w, n, ps) lattice frame the segmenter consumes, from
    * a word list and a (piece, cost) table — the unigramSegment shape
    * with an explicit cost map.
    */
  private def lattice(words: Seq[String], costs: Map[String, Long],
                      maxPieceLen: Int): DataFrame = {
    import spark.implicits._
    val wdf = words.toDF("w")
    val cdf = costs.toSeq.toDF("piece", "cost")
    wdf.select(col("w"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(w)), st ->
                transform(sequence(1, least($maxPieceLen, length(w) - st + 1)),
                  ln -> named_struct('st', st, 'ln', ln))))""")).as("sl"))
      .select(col("w"), col("sl.st").as("st"),
        (col("sl.st") + col("sl.ln") - 1).as("en"),
        expr("substring(w, sl.st, sl.ln)").as("piece"))
      .join(broadcast(cdf), "piece")
      .groupBy(col("w"))
      .agg(collect_list(struct(col("en"), col("st"), col("cost"))).as("ps"))
      .withColumn("n", length(col("w")))
  }

  private def assertIdentical(latticed: DataFrame): Unit = {
    val want = foldSegment(latticed).collect()
      .map(r => r.getString(0) -> ((r.get(1), r.getSeq[String](2)))).toMap
    val got = nativeSegment(latticed).collect()
      .map(r => r.getString(0) -> ((r.get(1), r.getSeq[String](2)))).toMap
    assert(want.keySet == got.keySet)
    want.foreach { case (w, v) => assert(got(w) == v, s"w=$w") }
  }

  test("native Viterbi ≡ SQL folds on the real corpus vocabulary") {
    val docs = TableCatalog(spark, sfDir).documents
    val words = docs
      .select(explode(split(trim(lower(col("text"))), " +")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().limit(400)
      .collect().map(_.getString(0)).toSeq
    // add-0.5-style costs over all substrings up to length 4, plus
    // every single char (full coverage, the unigramModel guarantee)
    val pieces = words.flatMap(w =>
      (1 to w.length).flatMap(st =>
        (1 to math.min(4, w.length - st + 1)).map(l =>
          w.substring(st - 1, st - 1 + l))))
      .distinct
    val costs = pieces.map(p =>
      p -> (100000L + 37L * (p.hashCode.abs % 1000) + 500000L * p.length))
      .toMap
    assertIdentical(lattice(words, costs, maxPieceLen = 4))
  }

  test("native Viterbi ≡ SQL folds under heavy cost ties (canonical path)") {
    // uniform costs force equal-cost segmentations everywhere — the
    // minimal-start (longest-piece-first) tie break must match
    val words = Seq("aaaa", "aaaaaaa", "abababab", "aabbaabb", "a")
    val pieces = words.flatMap(w =>
      (1 to w.length).flatMap(st =>
        (1 to math.min(3, w.length - st + 1)).map(l =>
          w.substring(st - 1, st - 1 + l)))).distinct
    val costs = pieces.map(_ -> 1000000L).toMap
    assertIdentical(lattice(words, costs, maxPieceLen = 3))
  }

  test("native Viterbi ≡ SQL folds when vocab coverage has holes") {
    // 'q' deliberately absent from the cost table: positions become
    // unreachable, the fold nulls the path — the kernel must too
    val words = Seq("aq", "qa", "aqa", "aa")
    val costs = Map("a" -> 1000000L, "aa" -> 1500000L)
    assertIdentical(lattice(words, costs, maxPieceLen = 2))
  }

  test("malformed lattice entries fail loudly instead of silently") {
    // st > en (and st < 1) violate the lattice invariant every real
    // caller upholds; the replaced fold raised an ANSI element_at
    // out-of-range error there, and the kernel must not instead read
    // an uncomputed best() slot as cost 0 (ADVICE r16). Entries whose
    // en falls outside [1, n] are skipped like the fold's filter.
    import spark.implicits._
    def run(st: Int, en: Int) =
      Seq(("ab", 2)).toDF("w", "n")
        .withColumn("ps", expr(
          s"array(named_struct('en', 1, 'st', 1, 'cost', CAST(1000000 AS BIGINT)), " +
          s"named_struct('en', 2, 'st', 2, 'cost', CAST(1000000 AS BIGINT)), " +
          s"named_struct('en', $en, 'st', $st, 'cost', CAST(1 AS BIGINT)))"))
        .transform(nativeSegment)
        .select(col("wcost"), concat_ws(" ", col("segs")).as("p")).collect()
    def deep(e: Throwable): String =
      Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(deep).getOrElse("")
    assert(deep(intercept[Exception](run(st = 2, en = 1)))
      .contains("violates 1 <= st <= en"))
    assert(deep(intercept[Exception](run(st = 0, en = 2)))
      .contains("violates 1 <= st <= en"))
    // an entry whose en falls outside [1, n] is skipped, not fatal —
    // the result equals the clean two-piece lattice's
    val withStray = run(st = 1, en = 99)
    assert(withStray.head.getLong(0) == 2000000L &&
      withStray.head.getString(1) == "a b")
  }
}
