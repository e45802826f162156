package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hash60.{hash60, rowKey, tokens}
import graft.Seams.SeamOps

/** Training-data pipeline operators beyond the dedup/similarity
  * families: near-dup cluster assignment, reproducible sampling,
  * PII scrubbing, and sliding-window chunking. Each is shaped for
  * the 100 TB case: per-row codegen'd transforms, shuffles keyed on
  * near-uniform ids, and no driver-side data paths except the
  * bounded-iteration CC loop (which moves labels, never documents).
  */
object Pipeline100TB {

  /** F7: connected components over near-dup pairs → cluster id per
    * member (min reachable id). Iterative min-label propagation:
    * each round is one shuffle join keyed by node id; rounds needed =
    * cluster diameter, and near-dup clusters are shallow (most are
    * 2-3 docs). For deep graphs use [[connectedComponentsStar]] —
    * same signature and output, O(log²) rounds instead of diameter.
    * `localCheckpoint` cuts the per-iteration lineage so the plan
    * doesn't grow quadratically; checkpoints are LAZY and materialize
    * inside the round's single changed-count job, so a d-round
    * convergence costs d actions, not 2d+2 (the graphLookup fusion).
    */
  /** F22: SOFT dedup — down-weight duplicates instead of dropping
    * them: every document's training weight is 1 / |its near-dup
    * cluster| (singletons keep 1.0), so each content cluster
    * contributes exactly one document's worth of mass to the corpus
    * while keeping every surface form visible to the model. Clusters
    * are [[connectedComponents]] over the candidate pairs; weight is
    * ONE correctly-rounded IEEE division both engines replay.
    *
    * Scale: CC's bounded label rounds + one cluster-size partial-agg
    * groupBy + one left join of the corpus against the CLUSTERED
    * subset (duplicate-dense corpora keep that side small; it is
    * never the full corpus unless everything is a duplicate).
    */
  def softDedupWeights(docs: DataFrame, pairs: DataFrame,
                       idCol: String = "doc_id"): DataFrame = {
    val clusters = connectedComponents(pairs)
    val sz = clusters.groupBy(col("cluster")).agg(count(lit(1)).as("__sz"))
    val weighted = clusters.join(sz, "cluster")
      .select(col("doc_id"),
        (lit(1.0) / col("__sz").cast("double")).as("__w"))
    docs.select(col(idCol).as("doc_id"))
      .join(weighted, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("__w"), lit(1.0)).as("weight"))
  }

  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .cutLineage(eager = false)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .cutLineage(eager = false)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val prop = edges.join(labels, col("dst") === col("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
      // carry the previous label through so convergence is a count on
      // the checkpointed result, not another join; the count job also
      // materializes the round's (and, in round 1, the input's)
      // lazy checkpoints — one action per round total
      val next = labels.join(prop, col("node") === col("src"), "left")
        .select(col("node"), col("label").as("__old"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .cutLineage(eager = false)
      converged = next.filter(col("label") =!= col("__old")).count() == 0
      labels = next.select(col("node"), col("label"))
      i += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "labels are still moving; raise maxIter (graph diameter exceeds it) " +
        "or use connectedComponentsStar for deep graphs")
    labels.select(col("node").as("doc_id"), col("label").as("cluster"))
  }

  /** G22b: PageRank centrality over a directed edge set — fixed
    * iteration count, damping 85/100, ALL arithmetic int64 floor
    * division (total mass 10¹² "parts-per-trillion" units), so the
    * result is bit-exact on any engine/partitioning and the DuckDB
    * oracle replays the unrolled iterations literally. Applied to the
    * G22 kNN graph it is the graph-centrality curation signal (the
    * web-graph quality-propagation move of production crawl pipelines
    * — highly-connected representatives score high; isolates read the
    * floor): rank'(v) = ⌊15·S/(100·N)⌋ + Σ_{u→v} ⌊85·r(u)/(100·deg⁺u)⌋.
    *
    * Dangling nodes (deg⁺ = 0) leak their damped mass each round —
    * the "remove dangling" simplification; with a fixed iteration
    * count the readout stays a total order, which is what a curation
    * SIGNAL needs (re-normalizing would rescale, not re-rank).
    *
    * Scale shape: per iteration exactly TWO keyed shuffles — ranks to
    * the edges' `src` partitioning (the edge frame is checkpointed
    * once with its out-degrees and reused every round; persist it
    * bucketed on `src` at 100 TB and only ranks move), then the
    * map-side-combined Σ to `dst`. The base term is a broadcast 1-row
    * N; no window, no driver-sized state, lineage truncated per round
    * like the CC loops.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 4): DataFrame = {
    val Scale = 1000000000000L
    val n = broadcast(nodes.agg(count(lit(1)).as("__n")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val e = edges.join(deg, "src").cutLineage(eager = false)
    var ranks = nodes.crossJoin(n)
      .select(col("id"), expr(s"${Scale}L div __n").as("rank"))
    for (_ <- 1 to iters) {
      val inflow = e.join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          expr("(85L * rank) div (100L * outdeg)").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      ranks = nodes.crossJoin(n)
        .join(inflow, Seq("id"), "left")
        .select(col("id"),
          (expr(s"(15L * ${Scale}L) div (100L * __n)") +
            coalesce(col("inflow"), lit(0L))).as("rank"))
        .cutLineage(eager = false)
    }
    ranks.select(col("id"), col("rank").as("rank_ppt"))
  }

  /** G22c: per-node triangle count + local clustering coefficient
    * over a directed edge set (canonicalized undirected) — the graph
    * DIAGNOSTIC next to G22b's centrality: on a kNN graph, high
    * clustering = redundant near-duplicate neighborhoods (SemDeDup
    * territory), low clustering = genuinely diverse regions; the
    * standard readout for tuning k and τ before graph-based curation.
    *
    * Counting is the wedge-close form: a triangle {x,y,z} is counted
    * at EACH apex as a closed wedge (nbr₁ < nbr₂ kills double
    * counting per apex), so per-node counts come out directly and the
    * global count is Σ/3. Coefficient in integer micro-units:
    * ⌊2·tri·10⁶ / (deg·(deg−1))⌋ (0 when deg < 2) — bit-exact on any
    * engine. Shape: one distinct-canonicalize shuffle, one
    * wedge-build join keyed on the apex (volume Σ deg² — bounded on a
    * kNN graph by k²·n), one LEFT SEMI close against the canonical
    * edge set, one count — every stage a keyed join/agg, no windows,
    * no driver state.
    */
  def triangleStats(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct().cutLineage(eager = false)
    val deg = und.select(col("u").as("n"))
      .union(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val sym = und.select(col("u").as("c"), col("v").as("n"))
      .union(und.select(col("v").as("c"), col("u").as("n")))
    val wedge = sym.as("a").join(sym.as("b"),
        col("a.c") === col("b.c") && col("a.n") < col("b.n"))
      .select(col("a.c").as("c"), col("a.n").as("p"), col("b.n").as("q"))
    val tri = wedge.join(und,
        col("p") === col("u") && col("q") === col("v"), "left_semi")
      .groupBy(col("c")).agg(count(lit(1)).as("n_tri"))
    nodes
      .join(deg, nodes("id") === deg("n"), "left")
      .join(tri, nodes("id") === tri("c"), "left")
      .select(col("id").as("vec_id"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(coalesce(col("deg"), lit(0L)) >= 2,
          expr("(2L * coalesce(n_tri, 0L) * 1000000L) div (deg * (deg - 1L))"))
          .otherwise(lit(0L)).as("coeff_micro"))
  }

  /** F7b: connected components via alternating large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    * the drop-in for [[connectedComponents]] when cluster DIAMETER is
    * large — propagation needs diameter rounds, star contraction
    * needs O(log²) total because every round rewires whole neighbor
    * sets toward the local minimum, not one hop.
    *
    *  - large-star (per node u over symmetric neighbors): connect every
    *    neighbor v > u to m = min(Γ(u) ∪ {u});
    *  - small-star (per node u over its smaller neighbors): connect
    *    them all, and u, to their minimum.
    *
    * Both are one groupBy + one join keyed on node ids — the same
    * shuffle shape as propagation, so skew/scale behavior is
    * identical per round; there are just far fewer rounds on deep
    * graphs. Convergence = the (count, label-sum) pair stops moving:
    * the edge multiset only shrinks toward stars and label sums
    * decrease monotonically, so the pair is a sound fixpoint check
    * that costs one action per round (lazy checkpoints materialize
    * inside it, like the propagation loop).
    */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val nodes = pairs.select(col("a").as("n"))
      .union(pairs.select(col("b").as("n"))).distinct()
      .cutLineage(eager = false)
    // canonical (u > v) edges; self-loops drop out of the iteration
    // and are restored as singleton stars at the end
    var edges = pairs.filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct().cutLineage(eager = false)
    var signature = (-1L, -1L)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // large-star over the symmetric neighbor view
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val minsL = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = sym.join(minsL, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
      // small-star over the (u > v) edges large-star just produced
      val minsS = large.groupBy(col("u"))
        .agg(min(col("v")).as("m"))
      val joined = large.join(minsS, "u")
      val small = joined.filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(minsS.select(col("u"), col("m").as("v")))
        .distinct().cutLineage(eager = false)
      // fixpoint check = one action over two aggregates of the edge
      // set: count + an order-free content hash (bit_xor of xxhash64;
      // the set is distinct so XOR is a sound set fingerprint, and
      // unlike an integer sum it can't overflow under ANSI mode)
      val sig = small.agg(count(lit(1)),
          bit_xor(xxhash64(col("u"), col("v"))))
        .collect().head
      val next = (sig.getLong(0), if (sig.isNullAt(1)) 0L else sig.getLong(1))
      converged = next == signature
      signature = next
      edges = small
      i += 1
    }
    // A non-converged edge set is PARTIALLY contracted: the final join
    // below would emit multiple (conflicting) labels per node, which
    // downstream dedup consumers cannot detect — so refuse instead.
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds — " +
        "the star fixpoint was not reached; raise maxIter")
    // at the fixpoint every component is a star rooted at its min id:
    // non-root nodes appear as u pointing at the root; roots (and
    // singletons from self-loop-only inputs) label themselves
    nodes.join(edges, nodes("n") === edges("u"), "left")
      .select(col("n").as("doc_id"),
        coalesce(col("v"), col("n")).as("cluster"))
  }

  /** G6: reproducible stratified sampling — no RNG, no seed plumbing:
    * keep a row iff hash60(key) mod 100 < rate(stratum). The same
    * rows survive on any cluster, any partitioning, any retry — the
    * property CDC replay and train/eval splits actually need
    * (`rand(seed)` is partition-order-dependent in a distributed
    * run). Pure map-side filter: zero shuffle at any scale.
    */
  def hashSample(df: DataFrame, keyCol: Column, ratePct: Column): DataFrame =
    df.filter(pmod(hash60(rowKey(keyCol)), lit(100)) < ratePct)

  /** G6b: deterministic WEIGHTED Bernoulli sampling: keep a row iff
    * hash60(key)/2^60 < weight(row) — per-row inclusion probability
    * equals the weight (importance sampling for training-data mixes),
    * reproducible on any cluster/retry. Pure map-side filter.
    * The comparison runs in exact integer space: the weight is scaled
    * to a 60-bit integer threshold ONCE (round(w·2^60) as long — the
    * only FP step, identical in any IEEE engine) and compared against
    * the integer hash, so no boundary row can flip on double
    * precision (h itself spans 60 bits; a double compare is exact
    * only to 2^53).
    */
  def weightedHashSample(df: DataFrame, keyCol: Column, weight: Column): DataFrame =
    df.filter(hash60(rowKey(keyCol)) <
      round(weight * lit(1152921504606846976.0 /* 2^60 */)).cast("long"))

  /** G6d: deterministic train/val/test split assignment — the
    * hash-range rule every training pipeline needs: split by
    * hash60(key) mod 1000 against cumulative per-mille cutoffs, so a
    * row's split never changes across runs, clusters, or data
    * additions (new rows land in splits without moving old ones).
    * Pure map-side projection, zero shuffle. Null keys hash as the
    * empty string — they all land together in one deterministic
    * split rather than silently pooling in `test` (which would
    * contaminate the smallest split with exactly the malformed rows).
    */
  def splitAssign(df: DataFrame, keyCol: Column,
                  trainPermille: Int = 980, valPermille: Int = 10): DataFrame = {
    require(trainPermille > 0 && valPermille >= 0 &&
      trainPermille + valPermille < 1000,
      s"splitAssign cutoffs invalid: train=$trainPermille val=$valPermille")
    val h = pmod(hash60(rowKey(keyCol)), lit(1000))
    df.withColumn("split",
      when(h < trainPermille, "train")
        .when(h < trainPermille + valPermille, "val")
        .otherwise("test"))
  }

  /** G6c: deterministic k-per-stratum sample: the k smallest row
    * hashes within each stratum — a uniform-without-replacement draw
    * that never changes across runs. One shuffle on the stratum key.
    */
  def stratifiedK(df: DataFrame, stratumCol: Column, keyCol: Column,
                  k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = hash60(rowKey(keyCol))
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(stratumCol).orderBy(h)))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** G6d: approximate per-group quantiles over a DETERMINISTIC hash
    * sample — the scale-out answer when exact per-group ranking
    * (quantiles_exact) costs a full sort of 100 TB and a sketch with
    * nondeterministic merge order (t-digest) can't be oracle-checked.
    * The sample is a pure map-side filter on the shared 60-bit hash
    * (same rows on any cluster/retry/partitioning), so the exact
    * interpolated percentile OF THE SAMPLE is itself deterministic and
    * cross-engine reproducible; error ~ 1/√(rate·group size). The
    * per-group state is the sample only — pick `ratePct` so
    * rate·maxgroup fits an executor; below that, fall back to the
    * distributed-rank exact path.
    */
  /** G21: Count-Min sketch — the streaming-scale heavy-hitter counter
    * (Cormode & Muthukrishnan): d=4 hash rows × w=64 buckets of exact
    * integer counts; an item's estimate is the MIN over its d row
    * cells, always ≥ the true count (one-sided error ≤ εN w.h.p.).
    * Emits, for a fixed probe-term set, the estimate, the true count
    * and the overestimate — the readout that sizes a CMS deployment
    * (pick w from the observed ε at your N).
    *
    * The sketch build is the whole at-scale story: the corpus
    * explodes to 4 narrow (row, bucket) cells per token and
    * map-side-combines to the 256-cell grid before its single
    * shuffle — sketch size is INDEPENDENT of corpus size, which is
    * the point of a sketch. Hashing is the engine-wide md5-60-bit
    * scheme through the [[graft.functions.Hash60.perm]] affine
    * family, so the oracle replays cell placement exactly; every
    * count is an exact int64 — the whole query is hash-exact with
    * zero float anywhere.
    */
  /** The CMS grid alone — shared by [[cmsProbe]] and the E17
    * STREAMING sketch (a streaming groupBy over the same cells keeps
    * the grid incrementally maintained with bounded state: d·w rows,
    * corpus-size-independent — StreamingSinkSpec proves streamed ≡
    * batch). Works unchanged on a streaming DataFrame.
    */
  def cmsGrid(docs: DataFrame, textCol: String,
              d: Int = 4, w: Int = 64): DataFrame = {
    import graft.functions.Hash60
    def cell(h: Column, i: Int): Column = Hash60.perm(h, i) % w
    docs.select(explode(Hash60.tokens(col(textCol))).as("tok"))
      .withColumn("__h", Hash60.hash60(col("tok")))
      .select(posexplode(array((0 until d).map(i =>
        cell(col("__h"), i)): _*)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cell_n"))
  }

  def cmsProbe(docs: DataFrame, textCol: String, probes: Seq[String],
               d: Int = 4, w: Int = 64): DataFrame = {
    require(probes.nonEmpty, "cmsProbe needs probe terms")
    import graft.functions.Hash60
    def cell(h: Column, i: Int): Column = Hash60.perm(h, i) % w
    val toks = docs.select(explode(Hash60.tokens(col(textCol))).as("tok"))
      .withColumn("__h", Hash60.hash60(col("tok")))
    val sketch = cmsGrid(docs, textCol, d, w)
    val truth = toks.filter(col("tok").isin(probes: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("true_n"))
    val probeCells = probes.toDF_(docs).select(col("probe"),
      posexplode(array((0 until d).map(i =>
        cell(Hash60.hash60(col("probe")), i)): _*)).as(Seq("row", "bucket")))
    probeCells
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col("probe"))
      .agg(min(coalesce(col("cell_n"), lit(0L))).as("est_n"))
      .join(truth, col("probe") === col("tok"), "left")
      .select(col("probe"),
        col("est_n"),
        coalesce(col("true_n"), lit(0L)).as("true_n"),
        (col("est_n") - coalesce(col("true_n"), lit(0L))).as("over_n"))
  }

  /** Literal probe frame helper for [[cmsProbe]] (a Seq → one-column
    * DataFrame without an implicits import at the call site).
    */
  private implicit class SeqToDf(private val xs: Seq[String]) {
    def toDF_(ref: DataFrame): DataFrame = {
      val s = ref.sparkSession
      import s.implicits._
      xs.toDF("probe")
    }
  }

  def quantileSketch(df: DataFrame, sampleKey: Column, ratePct: Int,
                     groupCols: Seq[Column], valCol: Column,
                     ps: Seq[(String, Double)]): DataFrame = {
    val sampled =
      df.filter(pmod(hash60(rowKey(sampleKey)), lit(100)) < ratePct)
    val aggs = count(lit(1)).as("sample_n") +:
      ps.map { case (nm, p) => round(percentile(valCol, lit(p)), 4).as(nm) }
    sampled.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Layout: Z-order (Morton) clustering stats — the data-layout step
    * a 100 TB table needs so BOTH join/filter dimensions prune at scan
    * time. Coordinates normalize to 16-bit space by their max (one
    * 1-row aggregate, broadcast back — no driver action), interleave
    * via the codegen'd [[graft.functions.BitInterleave]], and the top
    * `fileBits` bits of the code become the target file id. The
    * emitted per-file min/max of each dimension IS the proof of
    * layout quality: narrow ranges on both axes ⇒ a predicate on
    * either dimension skips most files. Plan: two narrow scans (data +
    * max), one broadcast join, one hash aggregation — no global sort
    * even at 100 TB (files claim z-RANGES, not z-ranks).
    */
  def zorderStats(df: DataFrame, xCol: String, yCol: String,
                  fileBits: Int = 8): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val maxes = df.agg(max(col(xCol)).as("__xmax"), max(col(yCol)).as("__ymax"))
    val scaled = df.select(col(xCol), col(yCol))
      .join(broadcast(maxes))
      .withColumn("__x16", expr(s"($xCol * 65536) div (__xmax + 1)"))
      .withColumn("__y16", expr(s"($yCol * 65536) div (__ymax + 1)"))
    val z = GraftBridge.column(graft.functions.BitInterleave(
      GraftBridge.expression(col("__x16")),
      GraftBridge.expression(col("__y16"))))
    scaled.withColumn("file_id", shiftright(z, 32 - fileBits))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
  }

  /** H9: PII / noise scrubbing — email, URL, IPv6, IPv4, phone, then
    * digit-run, applied in that order so an address is one `<EMAIL>`
    * (not fragments with `<NUM>` inside), an IPv4 is one `<IP>` (not
    * a phone prefix), and a phone is one `<PHONE>`. Codegen'd regexp
    * chain, no UDF — only syntax shared verbatim by `java.util.regex`
    * and DuckDB's RE2 (explicit char classes, `{m,n}` bounds, no `\b`
    * / `\d` whose Unicode breadth differs between engines).
    *
    * Pattern scope (the standard scrubber trade — over-match beats
    * leak): IPv6 is the uncompressed-or-trailing-compressed colon-hex
    * form (4+ colon groups, so `HH:MM:SS` timestamps and `a:b` pairs
    * don't trip it; fully-compressed short forms like `fe80::1` fall
    * through); phone needs 3 separator-delimited digit groups with an
    * optional +CC / parenthesized area code, so bare years and ids
    * fall through to `<NUM>`.
    */
  def scrub(textCol: Column): Column = {
    val email = regexp_replace(textCol,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^ \\t\\n]+", "<URL>")
    val ip6 = regexp_replace(url,
      "([0-9A-Fa-f]{1,4}:){4,7}[0-9A-Fa-f]{0,4}", "<IP>")
    val ip4 = regexp_replace(ip6,
      "[0-9]{1,3}(\\.[0-9]{1,3}){3}", "<IP>")
    val phone = regexp_replace(ip4,
      "\\+?[0-9]{1,3}[-. ]\\(?[0-9]{2,4}\\)?[-. ][0-9]{2,4}[-. ][0-9]{2,4}",
      "<PHONE>")
    regexp_replace(phone, "[0-9]+", "<NUM>")
  }

  /** H21: markup → text extraction — the HTML-to-prose stage of a web
    * curation pipeline (trafilatura/jusText's job, reduced to the
    * deterministic core): drop script/style blocks and comments WITH
    * their content, strip remaining tags, decode the common entities
    * (`&amp;` last, so `&amp;lt;` yields a literal `&lt;`), collapse
    * whitespace. An ordered codegen'd regexp chain in one projection —
    * H9's no-UDF pattern — so it fuses into the scan stage with zero
    * shuffles at any corpus size.
    *
    * Regex parity notes (JVM `java.util.regex` here, RE2 in the
    * DuckDB oracle): only shared syntax — inline `(?is)` flags, lazy
    * `.*?`, explicit `[ \t\n\r]` classes (never `\s`, whose char set
    * differs between the engines).
    */
  def extractMarkup(textCol: Column): Column = {
    val noScript = regexp_replace(textCol,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // block-level closers become line breaks so downstream per-line
    // passes (the C4 filter, H14) see the document's structure
    val blocks = regexp_replace(noComment,
      "(?i)</(p|h[1-6]|li|div|tr)>|<br[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]+>", " ")
    val nbsp = regexp_replace(noTags, "&nbsp;", " ")
    val lt = regexp_replace(nbsp, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val quot = regexp_replace(gt, "&quot;", "\"")
    val apos = regexp_replace(quot, "&#39;|&apos;", "'")
    val amp = regexp_replace(apos, "&amp;", "&")
    val hspace = regexp_replace(amp, "[ \\t\\r]+", " ")
    val vspace = regexp_replace(hspace, "( ?\\n ?)+", "\n")
    regexp_replace(vspace, "^[\\n ]+|[\\n ]+$", "")
  }

  /** H10: sliding-window chunking for training sequences: windows of
    * `size` tokens every `stride` tokens (the tail windows run
    * shorter). One explode per document — output volume is
    * rows × (n_tokens/stride), linear in corpus size.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int = 16, stride: Int = 8): DataFrame = {
    val toks = split(trim(lower(col(textCol))), " +")
    docs
      .select(col(idCol).as("doc_id"), toks.as("toks"), size_(toks).as("nw"))
      .filter(col("nw") > 0)
      .select(col("doc_id"), col("toks"), col("nw"),
        explode(sequence(lit(0), col("nw") - 1, lit(stride))).as("start"))
      .select(
        col("doc_id"), col("start"),
        (least(col("start") + size, col("nw")) - col("start")).as("n_tok"),
        array_join(slice(col("toks"), col("start") + 1, lit(size)), " ")
          .as("chunk_text"))
  }

  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** G12: deterministic source-mixture balancing — down-sample every
    * stratum (source/domain/language) toward a shared token budget:
    * rate(s) = min(1, target / tokens(s)), applied with the exact
    * integer-space hash60 comparator [[weightedHashSample]] uses, so
    * the surviving mixture is reproducible on any cluster, any
    * partitioning, any retry. Over-represented sources shrink to the
    * budget, under-represented ones pass through whole — the
    * standard mixture-flattening step before training-data blending.
    *
    * Cost: one partial-aggregated groupBy over the stratum key for
    * the totals (a handful of rows), broadcast back; the filter
    * itself is map-side. No corpus-sized shuffle.
    *
    * NULL strata form their own stratum (groupBy already buckets
    * them together; the rate re-attach is a null-safe `<=>` join),
    * so malformed rows are sampled at their own rate instead of
    * silently vanishing through an equi-join — the same fail-closed
    * treatment the samplers give null keys.
    */
  def mixBalance(df: DataFrame, stratumCol: String, keyCol: Column,
                 tokCol: Column, targetToks: Long): DataFrame = {
    require(targetToks > 0, s"mixBalance target must be positive: $targetToks")
    val base = df.withColumn("__tok", tokCol)
    val rates = base.groupBy(col(stratumCol))
      .agg(sum(col("__tok")).cast("long").as("__tot"))
      .select(col(stratumCol).as("__stratum"),
        least(lit(1.0), lit(targetToks.toDouble) / col("__tot")).as("__rate"))
    weightedHashSample(
        base.join(broadcast(rates), col(stratumCol) <=> col("__stratum")),
        keyCol, col("__rate"))
      .drop("__rate", "__stratum")
  }

  /** G12b: temperature + UniMax mixture allocation — the OTHER two
    * standard multi-domain blending knobs next to [[mixBalance]]'s
    * budget-flattening:
    *
    *   - temperature sampling (mT5/XLM-R): p_i ∝ n_i^α with α < 1
    *     upweights small domains. Each n_i^α is fixed-pointed to
    *     int64 micro-units BEFORE the normalizer sum, so the
    *     probabilities are partition- and order-free exact; `pow` is
    *     the one libm step (the bm25/H20 mitigated-parity class).
    *   - UniMax (Chung et al. 2023): distribute a total token budget
    *     T so no domain repeats more than `capEpochs` epochs — the
    *     water-filling allocation a_i = min(cap_i, λ), Σ a_i = T,
    *     cap_i = capEpochs·n_i. The fill level λ has a closed form
    *     over the cap-sorted domain frame: row i is capped iff
    *     cap_i·(L−i) + prefix_i ≤ T (EXACT int64 arithmetic — the
    *     capped set is bit-deterministic), then
    *     λ = (T − Σ_capped cap_i)/(L − m).
    *
    * See also [[doremiMix]] for the excess-loss-driven alternative.
    *
    * Shape: ONE partial-aggregated corpus shuffle to the per-domain
    * totals; everything after (window rank, prefix sums, the λ
    * aggregate) runs on the DOMAIN frame — rows = #domains, so the
    * unpartitioned `Window.orderBy` is over a handful of aggregated
    * rows, never the corpus. The λ scalar folds back as a broadcast
    * 1-row aggregate. At 100 TB the only thing that grows is the
    * first groupBy, which combines map-side.
    */
  def mixTemperature(df: DataFrame, stratumCol: String, tokCol: Column,
                     alpha: Double = 0.3, budget: Long = 100000L,
                     capEpochs: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0 && capEpochs > 0, "budget and capEpochs must be > 0")
    val n = df.filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"))
      .agg(sum(tokCol).cast("long").as("n_tok"))
    val t = n.select(col("stratum"), col("n_tok"),
      round(pow(col("n_tok").cast("double"), lit(alpha)) * lit(1000000.0))
        .cast("long").as("t_micro"),
      (col("n_tok") * lit(capEpochs)).as("cap_tok"))
    val z = t.groupBy().agg(sum("t_micro").as("z_micro"),
      count(lit(1)).as("l"))
    val win = Window.orderBy(col("cap_tok").asc, col("stratum").asc)
    val ranked = t.crossJoin(broadcast(z))
      .withColumn("rn", row_number().over(win))
      .withColumn("pre", sum(col("cap_tok")).over(
        win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("capped",
        col("cap_tok") * (col("l") - col("rn")) + col("pre") <= lit(budget))
    val sel = ranked.groupBy().agg(
      coalesce(sum(when(col("capped"), 1L)), lit(0L)).as("m"),
      coalesce(sum(when(col("capped"), col("cap_tok"))), lit(0L)).as("pre_m"))
    val lam = when(col("m") < col("l"),
      (lit(budget.toDouble) - col("pre_m").cast("double")) /
        (col("l") - col("m")).cast("double"))
    val alloc = when(lam.isNull, col("cap_tok").cast("double"))
      .otherwise(least(col("cap_tok").cast("double"), lam))
    ranked.crossJoin(broadcast(sel))
      .select(col("stratum"), col("n_tok"),
        round(col("t_micro").cast("double") / col("z_micro").cast("double"), 6)
          .as("p_temp"),
        round(alloc, 4).as("alloc_tok"),
        round(alloc / col("n_tok").cast("double"), 6).as("epochs"))
  }

  /** G26: bucketed corpus layout — the DISK lever the standing-index
    * joins pull at 100 TB. `writeBucketed` persists a frame BUCKETED
    * and sorted on `key` through the session catalog (Spark's
    * bucketed parquet layout: each task routes rows to
    * hash(key) mod buckets files, the bucket spec recorded in the
    * catalog); [[bucketedJoin]] then equi-joins two co-bucketed
    * tables with ZERO exchange on either side — the scan itself IS
    * the partitioning, so the join that every incremental-dedup
    * batch (F12/F14/F16b) pays a shuffle for against an unbucketed
    * index becomes a per-bucket local merge. At 100 TB this is the
    * difference between re-shuffling a standing multi-TB index per
    * batch and streaming each bucket file pair once; bucket count is
    * chosen at write time (buckets ≈ index size / healthy partition
    * size, stable across batches so layouts stay aligned).
    * PlanSpec-asserted: the joined plan contains a SortMergeJoin and
    * NO Exchange node; the same join over unbucketed parquet shows
    * the shuffle.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit = {
    val s = df.sparkSession
    // idempotence against ORPHANED managed locations: a fresh
    // in-memory catalog (every Verify run) has no entry for the
    // table, but the previous run's warehouse directory survives and
    // saveAsTable refuses it (LOCATION_ALREADY_EXISTS) — drop the
    // stale entry AND clear the managed path before writing. A real
    // metastore deployment never orphans; this is local-catalog
    // hygiene.
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** Exchange-free equi-join of two co-bucketed catalog tables (see
    * [[writeBucketed]]). The merge hint pins the co-located
    * sort-merge plan — broadcasting the small side would ALSO avoid
    * the shuffle but stops scaling the moment the "small" side is a
    * standing index.
    */
  def bucketedJoin(s: org.apache.spark.sql.SparkSession, left: String,
                   right: String, key: String): DataFrame =
    s.table(left).hint("merge").join(s.table(right), key)

  /** H25: DoReMi-style excess-loss domain reweighting — the
    * mixture-weight signal of Xie et al.'s DoReMi, re-expressed on
    * models this engine already trains from the corpus itself: the
    * REFERENCE model is the weak unigram LM
    * ([[TextAnalysis.unigramLogProb]]) and the PROXY the strong
    * Kneser-Ney trigram ([[TextAnalysis.knTrigramLogProb]]); a
    * domain's excess = mean per-doc (lp_proxy − lp_reference) — how
    * much a higher-capacity sequence model GAINS on that domain, the
    * "learnable headroom" DoReMi's group-DRO loop chases with trained
    * proxies. One exponentiated-gradient step then tilts the baseline
    * token shares: w_d ∝ share_d · exp(η · excess_d), normalized.
    *
    * Determinism end to end: both scores arrive 4-decimal-rounded, so
    * `round(·10⁴)` lifts them to EXACT int64 deci-millinats; domain
    * sums are int64; the mean re-enters doubles only through the
    * established scale-0-round trick; exp is the deterministic
    * [[TextAnalysis.withExpDet]] (range-reduce + Taylor + exact 2^k
    * fold — zero libm); normalization integerizes to ppm BEFORE
    * dividing, with int64 window totals (order-free). Docs with < 3
    * tokens have no trigram position and drop from BOTH legs (inner
    * joins — the same exclusion the proxy score itself makes).
    *
    * Shape: the two score pipelines are vocab/doc-sized plans (each
    * one corpus explode+shuffle); everything after the per-domain
    * groupBy runs on #domains rows, where the unpartitioned windows
    * are a handful of aggregated rows, never the corpus (the
    * [[mixTemperature]] precedent).
    */
  def doremiMix(docs: DataFrame, idCol: String, textCol: String,
                srcCol: String, eta: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uni = TextAnalysis.unigramLogProb(docs, idCol, textCol)
    val kn = TextAnalysis.knTrigramLogProb(docs, idCol, textCol)
    val perDoc = docs
      .select(col(idCol).as("doc_id"), col(srcCol).as("source"))
      .join(uni, "doc_id")
      .join(kn.select(col("doc_id"), col("avg_logp_kn")), "doc_id")
      .withColumn("__ex",
        round(col("avg_logp_kn") * lit(10000.0)).cast("long") -
          round(col("avg_logp") * lit(10000.0)).cast("long"))
    val dom = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("toks"),
        sum(col("__ex")).as("__sx"))
      .withColumn("excess_micro",
        round(col("__sx").cast("double") * lit(100.0) /
          col("n_docs").cast("double")).cast("long"))
    val w = Window.partitionBy() // #domains rows, post-aggregation
    TextAnalysis.withExpDet(
        dom.withColumn("__x",
          col("excess_micro").cast("double") / lit(1000000.0) * lit(eta)),
        col("__x"), "__exp")
      .withColumn("__tot", sum(col("toks")).over(w)) // int64: order-free
      .withColumn("__wm",
        round(col("toks").cast("double") / col("__tot").cast("double") *
          col("__exp") * lit(1000000000.0)).cast("long"))
      .withColumn("__sw", sum(col("__wm")).over(w))
      .select(col("source"), col("n_docs"), col("toks"), col("excess_micro"),
        round(col("__wm").cast("double") * lit(1000000.0) /
          col("__sw").cast("double")).cast("long").as("weight_ppm"))
  }

  /** G16: mixture diagnostics — per-source KL divergence of the
    * source's unigram token distribution from the corpus-wide one:
    * KL(source ‖ corpus) = Σ_t (tf/ns)·ln((tf·nc)/(ns·cf)). High-KL
    * sources are the ones skewing a training blend; the standard
    * companion readout to [[mixBalance]].
    *
    * Shape: ONE explode+shuffle to (source, term) counts; corpus
    * term frequency is a partial-aggregated groupBy over those
    * aggregated rows joined back on the token (a token-partitioned
    * window would pin Zipf-hot tokens to one unsplittable task at
    * web scale; the groupBy combines map-side and the join is
    * AQE-skew-splittable), per-source totals are a tiny groupBy
    * joined back by broadcast (sources are few); the (source, term)
    * exchange is shared by all branches, so the corpus still
    * shuffles once. The grand total folds in as a broadcast 1-row
    * aggregate. Per-term
    * contributions are fixed-pointed to int64 micronats scaled by
    * tf before the per-source sum, so aggregation is an exact
    * integer sum (order-independent); the ln itself carries the
    * same JVM-vs-libm parity assumption bm25 documents.
    */
  def sourceDivergence(docs: DataFrame, sourceCol: String,
                       textCol: String): DataFrame = {
    // the explicit non-null source filter (null sources carry no KL
    // meaning) sits at the BASE so every derived branch (tf/cf/ns/nc)
    // canonicalizes identically — otherwise join-inferred IsNotNull
    // filters land on some branches only and the shared (source, tok)
    // exchange stops being reusable, forking extra corpus passes
    val tf = docs
      .filter(col(sourceCol).isNotNull)
      .select(col(sourceCol).as("source"), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("tf"))
    val nc = broadcast(tf.agg(sum(col("tf")).cast("double").as("__nc")))
    val cfT = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cf"))
    val nsT = tf.groupBy(col("source")).agg(sum(col("tf")).as("ns"))
    tf
      .join(cfT, "tok")
      .join(broadcast(nsT), "source")
      .crossJoin(nc)
      .withColumn("__mn",
        round(log((col("tf").cast("double") * col("__nc")) /
          (col("ns").cast("double") * col("cf"))) * lit(1e6)).cast("long") *
          col("tf"))
      .groupBy(col("source"))
      .agg(sum(col("tf")).as("n_tok"), sum(col("__mn")).as("__kl"))
      .select(col("source"), col("n_tok"),
        round(col("__kl") / lit(1e6) / col("n_tok"), 6).as("kl"))
  }

  /** G14: deterministic global shuffle order for training export —
    * every row gets a stable position in a pseudo-random permutation
    * (rank under (hash60(key), key)), reproducible on any cluster/
    * retry, with NO global sort and NO single-partition window:
    * range buckets on the hash's top bits make bucket order equal
    * hash order, so global rank = broadcast running bucket offsets +
    * a within-bucket rank (each bucket ~uniform by construction).
    * One shuffle on the bucket key; the offsets table is `buckets`
    * rows. This is the "shuffle the corpus once, stream it in order
    * forever" step before sequence packing.
    *
    * Contract: positions are fully reproducible iff `keyCol` values
    * are UNIQUE (the usual doc-id case) — ties between equal keys
    * fall back to row arrival order, which no engine can pin down.
    * Null keys hash as the empty string so the row is kept (a null
    * hash would silently drop the row at the bucket join and shift
    * every later position); multiple null keys tie like equal keys.
    */
  def shuffleOrder(df: DataFrame, keyCol: Column,
                   bucketBits: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketBits > 0 && bucketBits < 60,
      s"shuffleOrder bucketBits must be in (0, 60): $bucketBits")
    val base = df
      .withColumn("__h", hash60(rowKey(keyCol)))
      .withColumn("__b", shiftright(col("__h"), 60 - bucketBits))
    val offs = base.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      // running offsets over ≤2^bucketBits tiny rows — the single
      // partition here holds bucket COUNTS, never data
      .withColumn("__off", coalesce(
        sum(col("__c")).over(Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    base.join(broadcast(offs), Seq("__b"))
      .withColumn("pos",
        col("__off") + row_number().over(
          Window.partitionBy(col("__b")).orderBy(col("__h"), keyCol)) - 1)
      .drop("__h", "__b", "__off")
  }

  /** G15: deterministic TOKEN-BALANCED shard assignment for training
    * export — every row gets a shard in [0, nShards) such that shards
    * carry near-equal token MASS (not row counts), rows land in the
    * same pseudo-random hash order [[shuffleOrder]] defines, and the
    * whole assignment reproduces on any cluster/partitioning/retry.
    * shard = ⌊cumTokensBefore · nShards / totalTokens⌋ over the hash
    * order, so shard boundaries deviate from perfect balance by at
    * most one document.
    *
    * Same no-global-sort machinery as [[shuffleOrder]]: range buckets
    * on the hash's top bits make bucket order = hash order; per-bucket
    * token SUMS (≤2^bucketBits tiny rows, never data) produce running
    * offsets + the grand total, broadcast back; the within-bucket
    * cumulative sum is a bucket-partitioned window. One data shuffle.
    * Zero-token tails clamp to the last shard; an all-empty corpus
    * lands in shard 0.
    *
    * Contract (same as [[shuffleOrder]]): assignments reproduce
    * fully iff `keyCol` values are unique — rows tied on (hash, key)
    * fall back to arrival order, and a shard boundary can land
    * between them differently across runs.
    */
  def tokenBalancedShards(df: DataFrame, keyCol: Column, tokCol: Column,
                          nShards: Int, bucketBits: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, s"tokenBalancedShards nShards must be positive: $nShards")
    require(bucketBits > 0 && bucketBits < 60,
      s"tokenBalancedShards bucketBits must be in (0, 60): $bucketBits")
    val base = df
      .withColumn("__tok", tokCol.cast("long"))
      .withColumn("__h", hash60(rowKey(keyCol)))
      .withColumn("__b", shiftright(col("__h"), 60 - bucketBits))
    val offs = base.groupBy(col("__b")).agg(sum(col("__tok")).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot", sum(col("__c")).over())
      .select(col("__b"), col("__off"), col("__tot"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col("__h"), keyCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offs), Seq("__b"))
      .withColumn("__cb", col("__off") + coalesce(sum(col("__tok")).over(wIn), lit(0L)))
      .withColumn("shard",
        when(col("__tot") <= 0, lit(0L)).otherwise(
          least(expr(s"(__cb * ${nShards}L) div __tot"), lit(nShards - 1L))))
      .drop("__h", "__b", "__off", "__tot", "__cb", "__tok")
  }

  /** H15: greedy sequence packing for training batches: documents are
    * concatenated per shard in id order and cut every `cap` tokens —
    * each doc gets the bin where its first token lands, plus its
    * offset inside that bin (the writer's cursor). This is the
    * streaming concat-and-split packer (pack then split at the token
    * budget), not bin-packing search: assignment is a pure running
    * sum, so it's ONE shuffle on the shard key plus a partition-local
    * sort — no iteration, no driver loop, and shards pack
    * independently so the operator parallelizes across any number of
    * executors. Shard by a bounded-cardinality key (source, or
    * hash(id) % nShards) so each shard's sort fits an executor.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, cap: Int): DataFrame =
    packSequencesBy(docs, idCol,
      size_(split(trim(lower(col(textCol))), " +")).cast("long"),
      shardCol, cap)

  /** H15, exact-token-count mode: same packer, but the per-document
    * token count is a caller-supplied column — e.g. the size of
    * [[graft.functions.BpeEncode]]'s id array for EXACT tokenizer
    * counts instead of the whitespace/`chars/4` estimate. The packing
    * math is unchanged: one shuffle on the shard key, partition-local
    * window, no iteration.
    */
  def packSequencesBy(docs: DataFrame, idCol: String, tokCol: Column,
                      shardCol: String, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cap > 0, s"packSequences cap must be positive: $cap")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), col(shardCol).as("shard"),
        tokCol.cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $cap"))
      .withColumn("off_tok", col("cum_before") % cap)
  }
}
