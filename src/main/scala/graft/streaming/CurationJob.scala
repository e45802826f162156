package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.{Dedup, Pipeline100TB, TextAnalysis}

/** The LLM-curation daemon loop — the training-data twin of the CDC
  * capstone (KafkaLogSpec E9): a stream of incoming documents is
  * optionally markup-extracted (H21), quality-gated (Gopher
  * structural rules, H16, plus an optional model-based classifier
  * gate, H20), deduped INCREMENTALLY against the standing corpus
  * fingerprint index (F12), and appended to a live corpus, with the
  * index advanced in the same micro-batch — so later batches (and
  * later duplicates inside the stream) dedupe against everything
  * already accepted.
  *
  * Gate order is the production web-curation order: extraction
  * rewrites `textCol` FIRST (the corpus stores extracted prose, and
  * both gates and the fingerprints see post-extraction text — two
  * pages differing only in markup are duplicates), then the opt-in
  * F16b span trim (corpus-seen boilerplate blocks vanish against
  * the standing block index before any gate or fingerprint sees
  * them — a doc that is nothing but known boilerplate trims to
  * empty and fails the structural gate), then the structural gate,
  * then the classifier, then novelty.
  *
  * Semantics: first-arrival-wins across micro-batches, min-id within
  * one — exactly the fold a daemon applying batches in order
  * produces. When ids arrive in increasing order this equals the
  * batch-mode curation of the whole input (spec-checked).
  *
  * Scale: per micro-batch the work is batch-sized hashing + one anti
  * join against the index (persist it bucketed on `fp` —
  * [[graft.operators.Dedup.persistIndexBucketed]] — and the index
  * side never re-shuffles).
  *
  * Exactly-once: each batch OVERWRITES its own `b<batchId>`
  * subdirectory of both the corpus and the index (the E9 capstone's
  * generation-swap move, sharded by batch), and the index read
  * EXCLUDES the current batch's own shard — otherwise a retry after
  * a half-committed attempt would see its own fps in the index and
  * silently drop the whole batch. Re-delivery of a batchId is
  * therefore a no-op rewrite of identical content (spec-checked).
  *
  * Index compaction: without it every micro-batch lists and reads
  * ALL prior `b*` shards — O(N) small files per batch, O(N²)
  * cumulative, the classic small-files death of a long-running
  * daemon. Once the shard count reaches `compactEvery`, the batch
  * folds every shard EXCEPT its own into one generation dir
  * `g<batchId>` (write `.tmp` → atomic rename → delete sources, the
  * E9 swap), so the index directory never holds more than
  * compactEvery+1 entries. Exactly-once survives compaction because
  * (a) the current batch's own shard is never folded while its
  * batchId can still be re-delivered, (b) sources are deleted only
  * after the generation is live, and a retry that finds the
  * generation already present just finishes the deletes (the
  * sources' fps are a subset of the generation by construction),
  * and (c) duplicate fps transiently visible during a half-finished
  * swap are harmless to the anti-join.
  */
object CurationJob {

  /** Optional H20 gate: the hashed-feature logistic quality model of
    * [[graft.operators.TextAnalysis.classifierScore]]; docs scoring
    * below `threshold` are rejected before novelty is consulted.
    */
  final case class ClassifierGate(microWeights: Seq[Long], biasMicro: Long,
                                  threshold: Double)

  /** Optional F17 gate: incremental SEMANTIC dedup — batch rows whose
    * embedding is near-duplicate (cosine ≥ tau) of an accepted row's
    * embedding in the same centroid cell are rejected, and
    * batch-internal semantic dups collapse to their CC
    * representative; the standing (id, cell, embedding) index under
    * `corpusDir/semidx` advances by accepted rows. `centroids` is
    * the fixed coarse-quantizer model (trained offline — assignment
    * must not depend on the batch); rows with a NULL embedding are
    * invisible to this gate and flow through on the text gates
    * alone (the F14 no-band rule).
    */
  final case class SemanticGate(embCol: String, tau: Double,
                                centroids: Seq[(Int, Seq[Float])])

  /** Optional H22 accounting: a fixed BPE merge table + vocabulary.
    * When set, every accepted corpus row carries an `n_tok` column
    * with its EXACT subword count (the H15/H22 composition), so
    * downstream shard/packing bookkeeping over the live corpus uses
    * tokenizer-true counts instead of whitespace or chars/4
    * estimates — and a batch re-curation packs identically.
    */
  final case class BpeAccounting(merges: Seq[(String, String)],
                                 vocab: Seq[String])

  /** Start the loop over a streaming `incoming` frame. The corpus
    * lives under `corpusDir/data/b*`, the standing index under
    * `corpusDir/index/{b*,g*}` (read both with
    * `recursiveFileLookup`).
    */
  def run(incoming: DataFrame, corpusDir: String, checkpoint: String,
          idCol: String = "doc_id", textCol: String = "text",
          compactEvery: Int = 8, fuzzy: Boolean = false,
          markup: Boolean = false,
          classifier: Option[ClassifierGate] = None,
          bpe: Option[BpeAccounting] = None,
          spanTrim: Boolean = false,
          semantic: Option[SemanticGate] = None,
          bloom: Boolean = false,
          knnK: Int = 0,
          searchStats: Boolean = false): StreamingQuery =
    incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, corpusDir, idCol, textCol, batchId, compactEvery,
          fuzzy, markup, classifier, bpe, spanTrim, semantic, bloom, knnK,
          searchStats)
      }
      .start()

  /** One micro-batch of the loop — pure batch logic, testable alone:
    * gate → dedupe vs the index-so-far → overwrite this batch's
    * corpus + index shards → maybe compact the index. `gated` and
    * `novel` are persisted for the duration of the two shard writes
    * (both actions consume them) and unpersisted after — without
    * this every micro-batch runs the Gopher gate and the anti-join
    * twice.
    */
  def applyBatch(batch: DataFrame, corpusDir: String,
                 idCol: String, textCol: String, batchId: Long,
                 compactEvery: Int = 8, fuzzy: Boolean = false,
                 markup: Boolean = false,
                 classifier: Option[ClassifierGate] = None,
                 bpe: Option[BpeAccounting] = None,
                 spanTrim: Boolean = false,
                 semantic: Option[SemanticGate] = None,
                 bloom: Boolean = false,
                 knnK: Int = 0,
                 searchStats: Boolean = false): Unit = {
    require(knnK == 0 || semantic.isDefined,
      "knnK needs the semantic gate: the kNN graph blocks on its cells")
    val spark = batch.sparkSession
    // H21 first: everything downstream — gates, fingerprints, the
    // stored corpus — sees extracted prose, never raw markup
    val extracted =
      if (markup) batch.withColumn(textCol,
        Pipeline100TB.extractMarkup(col(textCol)))
      else batch
    // F16b second (opt-in): trim blocks the accepted corpus already
    // contains, against the standing block index — corpus-seen
    // boilerplate vanishes BEFORE any gate or fingerprint sees it,
    // so gates judge the novel remainder and two docs differing
    // only in known boilerplate dedupe. Same own-shard-excluding
    // read as the other two indexes (retry-safe).
    val prepared =
      if (!spanTrim) extracted
      else {
        val blkIdx = readIndexExcept(spark, s"$corpusDir/blocks",
          s"b$batchId", blockSchema)
        extracted.drop(textCol).join(
          Dedup.substrTrimIncremental(extracted, blkIdx, idCol, textCol)
            .select(col("doc_id").as(idCol), col("clean_text").as(textCol)),
          Seq(idCol))
      }
    val structPass = TextAnalysis.gopherRules(prepared, idCol, textCol)
      .filter(col("pass")).select(col(idCol))
    // H20 second: both gates are map-side projections over the batch,
    // so the composed filter is still one scan + two semi-joins
    val qualityPass = classifier match {
      case None => structPass
      case Some(c) => structPass.join(
        TextAnalysis.classifierScore(prepared, idCol, textCol,
          c.microWeights, c.biasMicro, c.threshold)
          .filter(col("keep")).select(col(idCol)),
        Seq(idCol))
    }
    val gated = prepared.join(qualityPass, Seq(idCol)).persist()
    // the try opens IMMEDIATELY after the first persist: an exception
    // anywhere in the fuzzy-gate plan construction or the shard
    // writes must still unpersist, or a long-running daemon leaks
    // cache across streaming retries.
    var novel: DataFrame = null
    var accepted: DataFrame = null
    var probed: DataFrame = null
    try {
      novel = (if (!bloom)
        Dedup.incrementalFingerprint(gated,
          readIndexExcept(spark, s"$corpusDir/index", s"b$batchId", fpSchema),
          idCol, textCol)
      else {
        // E22 (opt-in): the F20 Bloom filter as the FIFTH standing
        // state — a KB-scale OR-merged word table read in front of
        // the exact-fp anti join. A batch row whose probes are not
        // all set is novel WITHOUT consulting the index (the filter's
        // no-false-negative guarantee; the bloom shards advance from
        // the SAME novel.fp rows as the index shards, in the same
        // retried foreachBatch transaction, so the filter can never
        // miss an indexed fp); only the maybe-fraction pays the anti
        // join, and an all-novel batch skips the index read entirely.
        // Toggle guard: enabling bloom on a corpus whose standing fp
        // index PREDATES the bloom shards would otherwise read an
        // empty word table, mark every batch fp definitely-new, skip
        // the anti join, and silently admit duplicates of indexed
        // content. Backfill the filter from the standing index once
        // (crash-safe tmp+rename, like compactIndex) so the
        // no-false-negative invariant holds regardless of when the
        // flag was turned on.
        val bloomDir = s"$corpusDir/bloom"
        val standingWords = readIndexExcept(spark, bloomDir,
          s"b$batchId", bloomSchema)
        val standingFps = readIndexExcept(spark, s"$corpusDir/index",
          s"b$batchId", fpSchema)
        val wordShards =
          if (standingWords.isEmpty && !standingFps.isEmpty) {
            val p = new org.apache.hadoop.fs.Path(bloomDir)
            val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
            val tmp = new org.apache.hadoop.fs.Path(p, "_backfill.tmp")
            val dst = new org.apache.hadoop.fs.Path(p, "backfill")
            if (fs.exists(tmp)) fs.delete(tmp, true)
            Dedup.bloomWords(standingFps.select(col("fp")))
              .write.mode("overwrite").parquet(tmp.toString)
            if (!fs.rename(tmp, dst))
              sys.error(s"bloom backfill rename failed: $tmp -> $dst")
            readIndexExcept(spark, bloomDir, s"b$batchId", bloomSchema)
          } else standingWords
        val words = wordShards
          .groupBy(col("word")).agg(expr("bit_or(bits)").as("bits"))
        probed = Dedup.bloomMaybe(
          gated.select(col(idCol),
            Dedup.fingerprintOf(col(textCol)).as("fp")),
          words, idCol).persist()
        val maybes = probed.filter(col("bloom_maybe"))
          .select(col(idCol), col("fp"))
        val definite = probed.filter(!col("bloom_maybe"))
          .select(col(idCol), col("fp"))
        val survivors =
          if (maybes.isEmpty) definite
          else definite.unionByName(
            maybes.join(readIndexExcept(spark, s"$corpusDir/index",
              s"b$batchId", fpSchema), Seq("fp"), "left_anti"))
        survivors.groupBy(col("fp"))
          .agg(min(col(idCol)).as("survivor"), count(lit(1)).as("n_copies"))
      }).persist()
      val novelRows = gated
        .join(novel.select(col("survivor").as(idCol)), Seq(idCol))
      // the OPTIONAL second gate (F14): exact-fp novelty alone admits
      // paraphrases/light edits of accepted content — veto batch docs
      // whose LSH bands hit the standing band index and collapse
      // batch-internal near-dups to their band-CC representative.
      // Docs with no bands at all (blank/short) are invisible to the
      // fuzzy gate and flow through on exact-fp novelty alone.
      val admitted = (if (!fuzzy) novelRows
      else {
        val bandIdx = readIndexExcept(spark, s"$corpusDir/bands",
          s"b$batchId", bandSchema)
        val fuzzSurvivors = Dedup
          .incrementalBands(novelRows, bandIdx, idCol, textCol)
          .select(col("survivor").as(idCol))
        val noBand = novelRows.select(col(idCol)).join(
          Dedup.bandKeys(novelRows, idCol, textCol)
            .select(col("id").as(idCol)).distinct(),
          Seq(idCol), "left_anti")
        novelRows.join(fuzzSurvivors.unionByName(noBand).distinct(),
          Seq(idCol))
      })
      // F17 (opt-in): incremental SEMANTIC gate, after text novelty —
      // batch rows embedding-near-dup of accepted content (same
      // centroid cell, cosine ≥ tau) are vetoed; batch-internal
      // semantic dups collapse to their CC representative. NULL
      // embeddings flow through (the no-band rule).
      val semAdmitted = semantic match {
        case None => admitted
        case Some(g) =>
          import spark.implicits._
          val semIdx = readIndexExcept(spark, s"$corpusDir/semidx",
            s"b$batchId", semSchema(idCol, g.embCol))
          val cents = g.centroids.toDF("c_label", "c_emb")
          val keepIds = graft.operators.Similarity
            .incrementalSemantic(spark,
              admitted.filter(col(g.embCol).isNotNull), semIdx, cents,
              g.tau, idCol, g.embCol)
            .filter(col("status") === "keep").select(col(idCol))
          val noEmb = admitted.filter(col(g.embCol).isNull)
            .select(col(idCol))
          admitted.join(keepIds.unionByName(noEmb).distinct(), Seq(idCol))
      }
      // H22 accounting: stamp each accepted row with its exact BPE
      // token count — one more codegen'd projection on the way to the
      // corpus shard, no extra action or shuffle
      accepted = (bpe match {
        case None => semAdmitted
        case Some(m) =>
          import org.apache.spark.sql.GraftBridge
          val ids = GraftBridge.column(graft.functions.BpeEncode(
            GraftBridge.expression(
              graft.functions.Hash60.tokens(
                regexp_replace(col(textCol), "\\|", " "))),
            m.merges, m.vocab))
          semAdmitted.withColumn("n_tok", size(ids).cast("long"))
      }).persist()
      // accepted rows enter the corpus; the emitted fps advance the
      // exact index so the NEXT batch sees them — INCLUDING the fps
      // of fuzzy-vetoed docs (exact copies of a rejected near-dup
      // must stay rejected); the band index advances by ACCEPTED
      // docs' bands only (it indexes corpus content)
      accepted.write.mode("overwrite").parquet(s"$corpusDir/data/b$batchId")
      novel.select("fp")
        .write.mode("overwrite").parquet(s"$corpusDir/index/b$batchId")
      // the bloom words advance from the SAME rows as the fp index —
      // the only consistency the definite-new fast path rests on
      if (bloom)
        Dedup.bloomWords(novel.select(col("fp")))
          .write.mode("overwrite").parquet(s"$corpusDir/bloom/b$batchId")
      if (fuzzy)
        Dedup.bandIndex(accepted, idCol, textCol)
          .write.mode("overwrite").parquet(s"$corpusDir/bands/b$batchId")
      // the block index advances by ACCEPTED (stored) content only —
      // it indexes what the corpus holds, like the band index
      if (spanTrim)
        Dedup.blockIndex(accepted, textCol)
          .write.mode("overwrite").parquet(s"$corpusDir/blocks/b$batchId")
      // E24: the search-stats ledger advances by ACCEPTED (stored)
      // content — per distinct term its batch df, plus one sentinel
      // row carrying the batch's (docs, Σdl). Rows are SUM-semantic,
      // so each carries its source batch id: that makes every row a
      // unique key, which is what lets the SET-semantic compactIndex
      // fold (full-row distinct) and the reader's window-dedup
      // distinct() both preserve the sums exactly.
      if (searchStats) {
        val toks = graft.functions.Hash60.tokens(col(textCol))
        val termRows = accepted
          .select(explode(array_distinct(toks)).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("df"))
          .select(col("term"), col("df"), lit(0L).as("docs"),
            lit(0L).as("sumdl"), lit(batchId).as("src"))
        val totals = accepted
          .agg(count(lit(1)).as("docs"),
            sum(size(toks).cast("long")).as("sumdl"))
          .select(lit("").as("term"), lit(0L).as("df"), col("docs"),
            coalesce(col("sumdl"), lit(0L)).as("sumdl"),
            lit(batchId).as("src"))
        termRows.unionByName(totals)
          .write.mode("overwrite").parquet(s"$corpusDir/sstats/b$batchId")
      }
      // the semantic index advances by accepted rows' (id, cell,
      // embedding) under the SAME fixed centroids
      semantic.foreach { g =>
        import spark.implicits._
        import graft.operators.Similarity
        val cents = g.centroids.toDF("c_label", "c_emb")
        val newCells = Similarity.assignCells(spark,
          accepted.filter(col(g.embCol).isNotNull), cents, idCol, g.embCol)
        if (knnK > 0) {
          // E23: the standing kNN graph advances by this batch's
          // candidate edges — new → (standing ∪ new) plus the reverse
          // standing → new (an old vertex's top-k can only change by
          // gaining a NEW neighbor), each pruned to the source's
          // per-shard top-k (an edge outranked at write time is
          // outranked forever — scores never change). The union of
          // shards therefore reproduces the batch graph exactly; the
          // reader ranks it per vertex (knnGraph below).
          newCells.persist()
          val standing = readIndexExcept(spark, s"$corpusDir/semidx",
            s"b$batchId", semSchema(idCol, g.embCol))
          Similarity.cellKnnEdges(spark, newCells,
              standing.unionByName(newCells), idCol, g.embCol, knnK)
            .unionByName(Similarity.cellKnnEdges(spark, standing, newCells,
              idCol, g.embCol, knnK))
            .write.mode("overwrite").parquet(s"$corpusDir/knn/b$batchId")
        }
        newCells.write.mode("overwrite")
          .parquet(s"$corpusDir/semidx/b$batchId")
        if (knnK > 0) newCells.unpersist()
      }
    } finally {
      if (accepted != null) accepted.unpersist()
      if (novel != null) novel.unpersist()
      if (probed != null) probed.unpersist()
      gated.unpersist()
      // Free the reuse seams the gates created inside this batch
      // (incrementalBands/incrementalSemantic register theirs in
      // graft.Seams): without this a long-running daemon's seam
      // storage grows between ContextCleaner GC cycles (ADVICE r16).
      graft.Seams.release()
    }
    if (compactEvery > 0) {
      compactIndex(spark, s"$corpusDir/index", s"b$batchId", batchId,
        compactEvery)
      // bloom shards fold through the generic set-semantic path: a
      // compacted generation may hold several (word, bits) rows per
      // word — the reader's bit_or merge makes that equivalent
      if (bloom)
        compactIndex(spark, s"$corpusDir/bloom", s"b$batchId", batchId,
          compactEvery)
      if (fuzzy)
        compactIndex(spark, s"$corpusDir/bands", s"b$batchId", batchId,
          compactEvery)
      if (spanTrim)
        compactIndex(spark, s"$corpusDir/blocks", s"b$batchId", batchId,
          compactEvery)
      if (semantic.isDefined)
        compactIndex(spark, s"$corpusDir/semidx", s"b$batchId", batchId,
          compactEvery)
      if (knnK > 0)
        compactIndex(spark, s"$corpusDir/knn", s"b$batchId", batchId,
          compactEvery)
      // sstats rows are unique keys (src column), so the set-semantic
      // fold preserves the ledger's sums exactly
      if (searchStats)
        compactIndex(spark, s"$corpusDir/sstats", s"b$batchId", batchId,
          compactEvery)
      compactData(spark, s"$corpusDir/data", s"b$batchId", batchId,
        compactEvery)
    }
  }

  /** E23 reader: the LIVE kNN graph — rank the standing candidate-edge
    * shards per vertex. By the shard-writing discipline (every pair
    * written exactly once by its younger endpoint's batch, each side
    * pruned only below its source's per-shard top-k) this equals the
    * batch-mode [[graft.operators.Similarity.cellKnnGraph]] over the
    * standing semidx — spec-asserted across batches, compaction and
    * re-delivery.
    *
    * Edge shards are deduplicated before ranking: during [[compactIndex]]'s
    * documented visible window (generation rename done, source shards not
    * yet deleted — or after a crash until the next batch retries the
    * deletes) every folded edge row appears TWICE. The fp/band/bloom
    * readers are set-semantic so that window is harmless there, but
    * BoundedTopK would count a duplicate edge toward top-k and displace a
    * genuine neighbor. Duplicates are exact row copies, so `distinct()`
    * restores the appears-once contract at negligible cost.
    */
  def knnGraph(spark: SparkSession, corpusDir: String, k: Int): DataFrame =
    graft.operators.Similarity.knnFromEdges(
      readIndexExcept(spark, s"$corpusDir/knn", "", knnSchema).distinct(), k)

  /** E24: index-backed `$search` over the STANDING curated corpus —
    * BM25 top-k where the corpus stats (N, Σdl, per-term df) come
    * from the incrementally-maintained `sstats` ledger instead of a
    * second corpus scan. At 100 TB this is the difference between 2
    * corpus passes and 1: the tf pass still reads the documents (it
    * must — scores need per-doc tf), but the stats fold into one
    * vocab-sized aggregate over the ledger (the ledger is term-keyed,
    * ~|vocab| rows, not corpus-sized) broadcast as the usual 1-row
    * stats frame. Scores are BIT-IDENTICAL to the batch
    * [[graft.operators.TextAnalysis.bm25]] over the same corpus: the
    * ledger sums state exactly the values the in-frame aggregate
    * would compute (exact integer arithmetic end to end), and the
    * scoring tail is the SHARED searchScoresFused expression tree.
    * The reader `distinct()`s the ledger first — rows are unique keys
    * by construction (src batch column), so the only duplicates are
    * compactIndex's visible-window full-row copies, and dropping them
    * restores the appears-once contract the sums rest on (the kNN
    * reader's discipline).
    */
  def searchCorpus(spark: SparkSession, corpusDir: String,
                   idCol: String, textCol: String,
                   terms: Seq[String], k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "searchCorpus needs at least one term")
    // PLAIN-TERM contract (round 16, pinned): the sstats ledger is
    // keyed by exact whitespace tokens, so only the text operator's
    // per-term df can be served from it. Virtual-term clause kinds —
    // phrase ("a b"), prefix/wildcard/regex/fuzzy metacharacters —
    // have per-QUERY dfs the ledger does not carry; serving them here
    // would silently score with the wrong df. They stay on the batch
    // $search scan path (its stats pass computes any virtual term),
    // refused loudly rather than approximated.
    terms.foreach { t =>
      require(t.nonEmpty && !t.exists(c => c.isWhitespace ||
        "*?[](){}|\\^$.+".contains(c)) && t == t.toLowerCase,
        s"searchCorpus serves PLAIN lowercase text terms only (got '$t') " +
          "— phrase/prefix/wildcard/regex/fuzzy virtual terms need the " +
          "batch $search scan, whose stats pass computes per-query dfs " +
          "the sstats ledger does not carry")
    }
    val led = readIndexExcept(spark, s"$corpusDir/sstats", "", sstatsSchema)
      .distinct()
    require(!led.isEmpty,
      s"no search-stats ledger under $corpusDir/sstats — run the daemon " +
        "with searchStats = true")
    val aggs = sum(col("docs")).as("n") +: sum(col("sumdl")).as("sumdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("df")).otherwise(0L)).as(s"df$i")
      }
    val stats = led.agg(aggs.head, aggs.tail: _*)
    val corpus = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$corpusDir/data")
    graft.operators.TextAnalysis
      .bm25WithProvidedStats(corpus, textCol, terms, stats, "score")
      .select(col(idCol).as("id"), col("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  private val sstatsSchema = StructType(Seq(
    StructField("term", StringType),
    StructField("df", org.apache.spark.sql.types.LongType),
    StructField("docs", org.apache.spark.sql.types.LongType),
    StructField("sumdl", org.apache.spark.sql.types.LongType),
    StructField("src", org.apache.spark.sql.types.LongType)))

  private val knnSchema = StructType(Seq(
    StructField("id", org.apache.spark.sql.types.LongType),
    StructField("nbr", org.apache.spark.sql.types.LongType),
    StructField("cos_r", org.apache.spark.sql.types.DoubleType)))

  private val fpSchema = StructType(Seq(StructField("fp", StringType)))
  private val bloomSchema = StructType(Seq(
    StructField("word", org.apache.spark.sql.types.IntegerType),
    StructField("bits", org.apache.spark.sql.types.LongType)))
  private def semSchema(idCol: String, embCol: String) = StructType(Seq(
    StructField(idCol, org.apache.spark.sql.types.LongType),
    StructField("cell", org.apache.spark.sql.types.IntegerType),
    StructField(embCol, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType))))
  private val blockSchema = StructType(Seq(
    StructField("h", org.apache.spark.sql.types.LongType)))
  private val bandSchema = StructType(Seq(
    StructField("band", org.apache.spark.sql.types.IntegerType),
    StructField("key", StringType)))

  /** The standing index minus the named batch shard (empty before
    * the first batch). Listing is one metadata call over per-batch
    * shards and compacted generations; in-flight `.tmp` fold
    * targets are invisible until their atomic rename.
    */
  private def readIndexExcept(spark: SparkSession, path: String,
                              ownShard: String,
                              schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    if (!fs.exists(p)) empty
    else {
      val shards = fs.listStatus(p).map(_.getPath)
        .filter(s => s.getName != ownShard && !s.getName.endsWith(".tmp"))
        .map(_.toString)
      if (shards.isEmpty) empty else spark.read.parquet(shards.toIndexedSeq: _*)
    }
  }

  /** Fold all index shards except the current batch's own into one
    * generation `g<batchId>` once `compactEvery` sources have
    * accumulated. Crash-safe at every boundary: a stale `.tmp` is
    * overwritten on retry; sources are deleted only AFTER the
    * atomic rename makes the generation live; a retry that finds
    * the generation already present only finishes the deletes
    * (every remaining source was an input to that generation, so
    * its fps are already covered).
    */
  /** DATA-side small-file compaction — TIERED, not chained like the
    * index: every `compactEvery` per-batch data shards fold ONCE
    * into a write-once generation `h<batchId>` and prior `h*`
    * generations are never rewritten, so total write amplification
    * is a flat 2× (each corpus byte: its b-shard, then one fold).
    * The index refolds its generations instead (bounded K+1-entry
    * directory) because fingerprints are tiny next to corpus bytes;
    * refolding the DATA that way would rewrite the whole corpus
    * every K batches — O(N²/K) bytes over the daemon's life. Data
    * directory entries grow O(N/K), but each is a well-sized
    * parquet dir instead of N tiny per-batch shards.
    *
    * Exactly-once: only shards of COMMITTED batches fold (every
    * b<id> with id < the current batch — streaming applies batches
    * in order, so only the current one can be re-delivered, and its
    * own shard is excluded); sources are deleted only after the
    * atomic rename, and a retry that finds `h<batchId>` live just
    * finishes the deletes (batch shards are disjoint novel-row
    * sets, so the fold is an exact union — no dedupe on read).
    */
  private def compactData(spark: SparkSession, path: String,
                          ownShard: String, batchId: Long,
                          compactEvery: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return
    val gen = new org.apache.hadoop.fs.Path(p, s"h$batchId")
    val sources = fs.listStatus(p).map(_.getPath)
      .filter(s => s.getName != ownShard && s.getName.startsWith("b"))
    if (fs.exists(gen)) { // finish a half-committed fold from a retry
      sources.foreach(fs.delete(_, true))
      return
    }
    if (sources.length < compactEvery) return
    val nonEmpty = sources.filter(s =>
      fs.listStatus(s).exists(_.getPath.getName.endsWith(".parquet")))
    // leading '_' so parquet/Hadoop readers (which auto-hide '_'/'.'
    // paths) never see the half-written fold — corpus consumers read
    // data/ with recursiveFileLookup and have no reader-side filter.
    // Remaining visible window: between the rename and the source
    // deletes (or after a crash, until the batch retry) readers see
    // each folded row twice — consumers needing exact-once reads
    // must exclude b* shards whose ids are covered by a live h* gen.
    val tmp = new org.apache.hadoop.fs.Path(p, s"_h$batchId.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (nonEmpty.nonEmpty) {
      spark.read.parquet(nonEmpty.map(_.toString).toIndexedSeq: _*)
        .write.mode("overwrite").parquet(tmp.toString)
      if (!fs.rename(tmp, gen))
        sys.error(s"data compaction rename failed: $tmp -> $gen")
    } else fs.mkdirs(gen) // all-empty tier: a marker dir keeps retries idempotent
    sources.foreach(fs.delete(_, true))
  }

  private def compactIndex(spark: SparkSession, path: String,
                           ownShard: String, batchId: Long,
                           compactEvery: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return
    val gen = new org.apache.hadoop.fs.Path(p, s"g$batchId")
    val sources = fs.listStatus(p).map(_.getPath)
      .filter(s => s.getName != ownShard && s.getName != gen.getName &&
        !s.getName.endsWith(".tmp"))
    if (fs.exists(gen)) { // finish a half-committed fold from a retry
      sources.foreach(fs.delete(_, true))
      return
    }
    if (sources.length < compactEvery) return
    // '_' prefix as in compactData: belt (reader-side .tmp filter in
    // readIndexExcept) and suspenders (Hadoop hidden-path convention)
    val tmp = new org.apache.hadoop.fs.Path(p, s"_g$batchId.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // schema-agnostic fold (exact-fp shards AND band shards): distinct
    // full rows — index entries are set-semantic either way
    spark.read.parquet(sources.map(_.toString).toIndexedSeq: _*)
      .distinct()
      .write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(tmp, gen))
      sys.error(s"index compaction rename failed: $tmp -> $gen")
    sources.foreach(fs.delete(_, true))
  }
}
