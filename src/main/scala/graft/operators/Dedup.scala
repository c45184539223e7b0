package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, smallest-to-
  * largest hammer: exact (hash group), MinHash+LSH banding, SimHash with
  * chunk-bucketed Hamming candidates, exact n-gram Jaccard.
  *
  * Scale design: every stage is a narrow map or a key-partitioned
  * shuffle (doc_id, (band, key), token hash). Nothing ever materializes
  * the O(n²) pair space — candidate pairs only surface through bucket
  * collisions, which is the entire point of LSH at 100 TB. Signatures
  * hash each token exactly once (columnar explode + min-aggregate; the
  * per-seed transforms are cheap quadratic column math, no cross-join
  * against a seed table), and every hash is fully-specified portable
  * arithmetic so the DuckDB oracles replay them exactly.
  */
object Dedup {

  /** Test/demo corpus augmentation: re-appends near-duplicate copies
    * (` dup` suffix, offset ids) of the first `nDups` docs. The synthetic
    * corpus has no natural near-dups, so dedup demos plant their own
    * ground truth: pair (i, i+idOffset) must be found. */
  def augmentWithNearDups(docs: DataFrame, nDups: Int = 50,
                          idOffset: Long = 1000000L): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base.union(
      docs.filter(col("doc_id") < nDups)
        .select((col("doc_id") + idOffset).as("doc_id"),
          concat(col("text"), lit(" dup")).as("text")))
  }

  /** Test/demo corpus augmentation for CONTAINMENT dedup: re-appends an
    * 18-token excerpt (tokens 3..20, offset ids) of the first `nDocs`
    * sufficiently long docs — planted ground truth for "document A is a
    * verbatim span of document B" detection, which resemblance dedup
    * (Jaccard on full shingle sets) structurally misses: an excerpt's
    * Jaccard against its source is |A|/|B|, arbitrarily low for short
    * spans. */
  def augmentWithExcerpts(docs: DataFrame, nDocs: Int = 50,
                          idOffset: Long = 2000000L): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base.union(
      docs.filter(col("doc_id") < nDocs &&
          size(TextFunctions.tokens(col("text"))) >= 25)
        .select((col("doc_id") + idOffset).as("doc_id"),
          array_join(slice(TextFunctions.tokens(col("text")), 3, 18), " ")
            .as("text")))
  }

  /** Exact substring-containment dedup (the Lee et al. 2022
    * exact-substring family, pairwise form): every (contained_id,
    * container_id) pair where one document's text occurs VERBATIM and
    * token-aligned inside another's. Catches quotes, excerpts, and
    * wrapper pages that near-dup resemblance scoring misses.
    *
    * Scale shape — candidates never approach |D|²: a token-aligned
    * contained doc's FIRST `width`-token gram must appear among the
    * container's grams, so candidates are an equi-join of one probe
    * gram per doc against the container gram table (corpus-linear),
    * verified with one exact substring test per candidate. Both sides
    * pad with spaces so the containment check is token-aligned — which
    * is also what makes the first-gram blocking provably complete for
    * docs of ≥ `width` tokens (dd16's oracle is the exact all-pairs
    * check, so the completeness claim is hash-verified, not asserted).
    * Candidate pairs travel as narrow (id, id) rows; texts re-join by
    * id only for the verify (the dd06 narrow-pairs discipline). */
  def containmentDups(docs: DataFrame, width: Int = 8): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val elig = docs.filter(size(toks) >= width)
    // Gram hashing here is xxhash64, NOT TextFunctions.stringHash: the
    // hash is blocking-internal (dd16's oracle is the exact all-pairs
    // containment check, it never replays signatures), so the portable
    // per-character HOF hash buys nothing — and costs plenty. Its
    // aggregate/transform lambdas are interpreted per character, and
    // worse, hashing an INLINE expression (the original
    // `stringHash(element_at(shingles(text, w), 1))` probe) puts the
    // whole shingle build inside the lambda body, re-evaluated once
    // per character and again in the join's null filter — measured
    // 91 s at sf0.1. xxhash64 is a codegen'd native function over the
    // materialized gram string: same blocking power, none of that.
    // The probe gram is just the first `width` tokens joined.
    val probes = elig.select(col("doc_id").as("contained_id"),
      xxhash64(concat_ws(" ",
        slice(TextFunctions.tokens(col("text")), 1, width))).as("g"))
    // no distinct on the gram stream: the candidate pairs dedup below,
    // and skipping it halves the shuffles over the corpus-sized gram
    // explode. The join strategy is left to the planner: probes is one
    // narrow row per doc, so AQE broadcasts it at bench scale, and at
    // corpus scales past broadcast range the equi key makes it a plain
    // keyed shuffle join — no hint to outgrow.
    val grams = docs.select(col("doc_id").as("container_id"),
        explode(TextFunctions.shingles(col("text"), width)).as("gr"))
      .select(col("container_id"), xxhash64(col("gr")).as("g"))
    val cand = probes.join(grams, "g")
      .filter(col("contained_id") =!= col("container_id"))
      .select(col("contained_id"), col("container_id")).distinct()
    cand
      .join(docs.select(col("doc_id").as("contained_id"),
        col("text").as("a_text")), "contained_id")
      .join(docs.select(col("doc_id").as("container_id"),
        col("text").as("b_text")), "container_id")
      .filter(contains(concat(lit(" "), col("b_text"), lit(" ")),
        concat(lit(" "), col("a_text"), lit(" "))))
      .select(col("contained_id"), col("container_id"))
      .orderBy(col("contained_id"), col("container_id"))
  }

  /** Portable MinHash family: per-seed QUADRATIC transforms
    * `(A_s·H² + B_s·H + C_s) mod P` of the base-31 polynomial hash `H`
    * (P = 1e9+7), with A/B/C drawn per seed from splitmix64 — fully
    * specified constants, so a DuckDB oracle reproduces the exact
    * signatures (dd02; the reason xxhash64 was dropped). The quadratic
    * term matters: an AFFINE family with structured multipliers let one
    * small-hash element win the min under EVERY seed (measured: est 0.875
    * on pairs with true Jaccard 0.006); independent constants + degree-2
    * mixing decorrelate the per-seed argmins. Every product keeps both
    * factors < 2^30, so intermediates stay < 2^62 — no ANSI overflow in
    * either engine. */
  private val HashP = 1000000007L

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** (A, B, C) for seed s — A nonzero mod P. Exposed to the dd02 oracle
    * builder so the SQL embeds the identical literals. */
  private[graft] def seedConsts(s: Int): (Long, Long, Long) = (
    java.lang.Long.remainderUnsigned(splitmix64(3L * s + 1), HashP - 1) + 1,
    java.lang.Long.remainderUnsigned(splitmix64(3L * s + 2), HashP),
    java.lang.Long.remainderUnsigned(splitmix64(3L * s + 3), HashP))

  /** Per-seed hash of a pre-hashed shingle (h = stringHash(shingle)). */
  private def seedHash(h: Column, seed: Int): Column = {
    val (a, b, c) = seedConsts(seed)
    pmod(lit(a) * pmod(h * h, lit(HashP)) + lit(b) * h + lit(c), lit(HashP))
  }

  /** MinHash signature as an `array<bigint>` column — computed entirely
    * row-local with higher-order functions (numHashes × shingles hash
    * evaluations per doc, zero shuffle, zero explosion). At 100 TB this
    * is a narrow map stage; the old explode-to-(doc,seed,h) formulation
    * shuffled numHashes×shingles rows per document. */
  /** Row-local minhash signature (API form). NOTE: inside one projection
    * Catalyst may inline the shingle expression into the per-seed lambda
    * (CollapseProject can't see lambda evaluation counts), recomputing
    * shingling numHashes×. For corpus-scale signing use [[signatures]],
    * which explodes shingles once and min-aggregates columnar. */
  def minhashSignature(text: Column, numHashes: Int, shingleWidth: Int): Column = {
    val hs = shingleHashes(TextFunctions.tokenHashes(text), shingleWidth)
    array((0 until numHashes).map(s =>
      array_min(transform(hs, h => seedHash(h, s)))): _*)
  }

  /** Shingle hashes from an array of TOKEN hashes: rolling base-131
    * combine `((th_i·131 + th_{i+1})·131 + …) mod P` per window — the
    * char loop runs once per token, not once per shingle (3× less hash
    * work at width 3, and the exact arithmetic the dd02 oracle mirrors).
    * Duplicate shingles are kept: the per-seed min is
    * duplicate-invariant, so dedup would only add work. */
  private def shingleHashes(ths: Column, width: Int): Column =
    org.apache.spark.sql.graft.CatalystBridge.column(
      graft.functions.ShingleHashCombine(
        org.apache.spark.sql.graft.CatalystBridge.expression(ths), width))

  /** Test-only windows into [[shingleHashes]] and its HOF reference. */
  private[graft] def shingleHashesProbe(ths: Column, width: Int): Column =
    shingleHashes(ths, width)
  private[graft] def shingleHashesHofProbe(ths: Column, width: Int): Column =
    shingleHashesHof(ths, width)

  /** Reference HOF form of [[shingleHashes]] — differential oracle for
    * the fused [[graft.functions.ShingleHashCombine]]. */
  private[graft] def shingleHashesHof(ths: Column, width: Int): Column =
    when(size(ths) >= width,
      transform(sequence(lit(0), size(ths) - width),
        i => aggregate(slice(ths, i + 1, lit(width)), lit(0L),
          (a, x) => pmod(a * lit(131L) + x, lit(HashP)))))
      .otherwise(array().cast("array<bigint>"))

  /** Corpus minhash signatures: (doc_id, sig array<bigint>). Two narrow
    * keyed shuffles (token-hash collect, per-doc min agg); the per-seed
    * transforms are cheap quadratic column math over one 30-bit hash per
    * shingle — the shape that survives 100 TB (char-loop work is one
    * pass per token, per-doc state is numHashes longs). */
  def signatures(docs: DataFrame, numHashes: Int, shingleWidth: Int): DataFrame = {
    // token hashes come from ONE fused codegen pass over the text
    // ([[TextFunctions.tokenHashes]]): the hash array is a bound column
    // by construction, so the shingle-combine lambda can't re-evaluate
    // the char loop (the CollapseProject trap this pipeline used to
    // dodge with an explode + ordered re-collect — a whole corpus-
    // token-scale shuffle, now gone)
    val arrays = docs.select(col("doc_id"),
      TextFunctions.tokenHashes(col("text")).as("ths"))
    val exploded = arrays.select(col("doc_id"),
      explode(shingleHashes(col("ths"), shingleWidth)).as("h"))
    val mins = (0 until numHashes).map(s => min(seedHash(col("h"), s)).as(s"m$s"))
    exploded.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(s => col(s"m$s")): _*).as("sig"))
  }

  /** LSH band keys for an array signature: one xxhash64 per
    * `seedsPerBand`-wide slice. */
  def bandKeys(sig: Column, numHashes: Int, seedsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numHashes / seedsPerBand - 1)),
      b => xxhash64(concat_ws(":",
        transform(slice(sig, b * lit(seedsPerBand) + lit(1), lit(seedsPerBand)),
          h => h.cast("string")))))

  /** Candidate pairs = docs sharing any LSH band bucket; estimated
    * Jaccard = fraction of matching signature components (computed by a
    * row-local zip_with on the two arrays — no signature re-shuffle).
    * Returns (doc_a, doc_b, est_jaccard), doc_a < doc_b, est >= threshold. */
  def minhashNearDups(docs: DataFrame, numHashes: Int = 8, shingleWidth: Int = 3,
                      seedsPerBand: Int = 2, threshold: Double = 0.5): DataFrame = {
    val sigs = signatures(docs, numHashes, shingleWidth)
    val bands = sigs.select(col("doc_id"), col("sig"),
      posexplode(bandKeys(col("sig"), numHashes, seedsPerBand)).as(Seq("band", "band_key")))
    val pairs = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    pairs
      .select(col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _).cast("double") /
          lit(numHashes.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** SimHash bit functions: bit k of a token's vote pattern is the
    * PARITY of an independent portable quadratic hash of the token's
    * base-31 polynomial hash (seeds offset by 1000 so they share nothing
    * with the minhash component seeds). Packing two polynomial hashes
    * into one 60-bit word was tried first and measured badly — short
    * words over a small vocabulary leave so much structure in raw
    * polynomial bits that the Hamming-8 ball caught ~3% of all unrelated
    * pairs; independent per-bit hashes restore textbook behavior, and
    * stay exactly reproducible in the DuckDB oracle (dd03). */
  private val SimhashBits = 60
  private[graft] def bitConsts(k: Int): (Long, Long, Long) = seedConsts(1000 + k)

  /** ±1 vote of pre-hashed token `h` (with `h2 = h² mod P`) on bit k. */
  private def bitVote(h: Column, h2: Column, k: Int): Column = {
    val (a, b, c) = bitConsts(k)
    when(pmod(lit(a) * h2 + lit(b) * h + lit(c), lit(HashP))
      .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)
  }

  /** SimHash of the token stream, one HOF pass: per-token hash votes ±1
    * on each bit, sign of the tally sets the bit. Tokens are pre-hashed
    * ONCE so the per-bit lambda sees a bound variable — inlining the
    * char-loop hash into it would recompute the hash once per bit per
    * token. (API form; [[simhashAll]] is the columnar corpus-scale
    * shape.) */
  def simhash(text: Column): Column = {
    val as = typedLit((0 until SimhashBits).map(k => bitConsts(k)._1))
    val bs = typedLit((0 until SimhashBits).map(k => bitConsts(k)._2))
    val cs = typedLit((0 until SimhashBits).map(k => bitConsts(k)._3))
    val bitsOf: Column => Column = h =>
      transform(sequence(lit(0), lit(SimhashBits - 1)),
        k => when(pmod(element_at(as, k + 1) * pmod(h * h, lit(HashP))
            + element_at(bs, k + 1) * h + element_at(cs, k + 1), lit(HashP))
          .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
    val counters = aggregate(
      transform(TextFunctions.tokens(text), t => TextFunctions.stringHash(t)),
      transform(sequence(lit(0), lit(SimhashBits - 1)), _ => lit(0)),
      (acc, h) => zip_with(acc, bitsOf(h), _ + _))
    aggregate(
      zip_with(counters, sequence(lit(0), lit(SimhashBits - 1)),
        (c, k) => when(c > 0, call_function("shiftleft", lit(1L), k)).otherwise(lit(0L))),
      lit(0L), _ + _)
  }

  /** SimHash of a whole corpus via explode + columnar aggregation: 64
    * conditional-sum columns instead of per-token 64-element array
    * allocations (the HOF form allocates ~2 arrays per token; this form
    * is pure codegen'd column math over (doc, tokenhash) rows). Same
    * result as [[simhash]]; preferred at scale. */
  def simhashAll(docs: DataFrame): DataFrame = {
    val hashed = docs
      .select(col("doc_id"),
        explode(TextFunctions.tokenHashes(col("text"))).as("h"))
      .select(col("doc_id"), col("h"), pmod(col("h") * col("h"), lit(HashP)).as("h2"))
    val votes = (0 until SimhashBits).map(k =>
      sum(bitVote(col("h"), col("h2"), k)).as(s"c$k"))
    val counters = hashed.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    counters.select(col("doc_id"),
      (0 until SimhashBits).map(k => when(col(s"c$k") > 0, lit(1L << k)).otherwise(lit(0L)))
        .reduce(_ + _).as("sig"))
  }

  /** SimHash near-dup pairs: candidates must share at least one of four
    * 16-bit signature chunks (Hamming-LSH), then exact Hamming distance
    * <= maxDistance confirms. */
  def simhashNearDups(docs: DataFrame, maxDistance: Int = 8): DataFrame = {
    val sigs = simhashAll(docs)
    // pin the chunked signatures: the self-join below would otherwise
    // run the WHOLE simhash pipeline (token explode + 60 vote sums)
    // once per branch — AQE broadcasts one side, so no exchange reuse
    // saves it (measured 4 scans / 0 reuse at sf0.1). The cache is
    // narrow (4 columns, 4 rows per doc) and evicted by the caller's
    // post-query clearCache; the eager pin prevents the two branches
    // racing to materialize it.
    val chunks = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("sig"), c * lit(16)).bitwiseAND(lit(0xFFFFL))))
        .as(Seq("chunk", "chunk_val")))
      .cache()
    chunks.count()
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
    * algorithm): hash every k-gram shingle, slide a window of `w`
    * consecutive hashes, keep each window's minimum. Guarantees every
    * shared substring of length ≥ w+k-1 tokens contributes at least one
    * SHARED fingerprint, while storing only ~2/(w+1) of the hashes —
    * the document-fingerprinting primitive for plagiarism/near-dup
    * detection over code and text.
    *
    * Hashes are fully-specified portable arithmetic — the base-31
    * polynomial per token ([[TextFunctions.stringHash]]) combined per
    * shingle with the base-131 roll — so the result is
    * engine-reproducible (DuckDB oracle on dd08). Output is (doc_id, fp)
    * ready for an inverted-index join, where bucket sizes stay small
    * because fingerprints are uniform hashes. */
  def winnowedFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Row-stream formulation: one portable char loop per TOKEN, shingle
    // hashes as lead()-combines, window mins over rows — no per-shingle
    // string building, no collect_list round trip, and no HOF sliding
    // lambda (whose inlined-array re-evaluation cost 322 s on 5k docs in
    // an earlier form). Both window passes share one doc_id-partitioned
    // sort, so the whole pipeline is two keyed shuffles (windows +
    // distinct).
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val whole = Window.partitionBy(col("doc_id"))
    val tokHashed = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokenHashes(col("text"))).as(Seq("pos", "th")))
    // shingle hash at pos = rolling base-131 combine of th .. th+k-1
    val combined = (1 until k).foldLeft(col("th")) { (acc, j) =>
      pmod(acc * lit(131L) + lead(col("th"), j).over(byDoc), lit(HashP))
    }
    val sh = tokHashed
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("h", combined)
      .filter(col("pos") <= col("n") - k) // only full k-token windows
    // winnow: min of each w-wide run of shingle hashes (shingle index ==
    // pos — positions are 0-based contiguous after the filter); shorter
    // trailing runs contribute only via the run starting at their head,
    // matching the slice semantics of the array formulation
    val minW = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    sh.withColumn("nsh", count(lit(1)).over(whole))
      .withColumn("fp", min(col("h")).over(minW))
      .filter(col("pos") <= greatest(col("nsh") - w, lit(0)))
      .select(col("doc_id"), col("fp")).distinct()
  }

  /** Near-dup pairs by shared winnowed fingerprints: inverted-index
    * equi-join on the fingerprint value, pairs kept at ≥ `minShared`
    * common fingerprints.
    *
    * Fingerprints appearing in more than `maxDocFreq` documents are
    * dropped BEFORE the join — MOSS's own rule ("too common to be
    * evidence of copying"): boilerplate n-grams carry no near-dup
    * signal, and skipping them is also what keeps the inverted index
    * scale-safe — without the cutoff a template n-gram shared by
    * thousands of documents creates a quadratic bucket (measured: 322 s
    * vs 3 s on the 5050-doc corpus). A true near-dup pair keeps its
    * distinctive fingerprints (df ≈ the duplicate-group size), so recall
    * on actual copies is unaffected. */
  def winnowingDups(docs: DataFrame, k: Int = 3, w: Int = 4,
                    minShared: Int = 5, maxDocFreq: Int = 10): DataFrame = {
    val fps = winnowedFingerprints(docs, k, w)
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select(col("fp"))
    val filtered = fps.join(rare, "fp")
    filtered.as("x").join(filtered.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Connected components over near-dup pairs via min-label propagation:
    * every document ends up labeled with the smallest doc_id reachable
    * through the pair graph. Returns (doc_id, cluster_id). Docs not in
    * any pair are their own cluster.
    *
    * Measured round structure (sf0.1, 311 verified pairs): propagation
    * reaches the fixed point after ONE effective round (294 label
    * changes, then 0) — near-dup graphs are stars/pairs, so per-round
    * DRIVER SYNCHRONIZATION, not graph diameter, is the dominant cost
    * (each convergence check is a full Spark job; a cached-read job
    * floor is ~0.2 s but a propagation round bills ~1.2 s in broadcast
    * builds, shuffle stages and cache writes). Rounds therefore run in
    * BATCHES of two composed lazily and executed by a single action.
    * Only the batch's FINAL round carries the old-label column:
    * propagation is monotone (labels only decrease), so "last round
    * changed nothing" alone proves the fixed point.
    *
    * CONVERGENCE GUARANTEE: this never returns half-propagated labels.
    * Either the fixed point lands inside the batch budget, or the
    * computation escalates to large-star/small-star contraction
    * ([[starRounds]], O(log diameter) rounds) over the same edges —
    * and the star loop itself fails loudly rather than truncate. */
  def clusters(docs: DataFrame, pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    // cache the edge list AND pin it with an eager count: every round
    // joins against it, and the lazily-batched rounds below would
    // otherwise race to materialize it — concurrent stages (broadcast
    // builds especially) each re-running the whole upstream pair
    // pipeline (LSH banding + verify) from scratch (measured 2.6×
    // slower than the per-round form when left lazy).
    // Both edge orientations come from ONE explode over each pair row,
    // not union(pairs, pairs.swapped): Spark does not share common
    // subplans across union branches, so the union form would run the
    // whole upstream pair pipeline TWICE while filling this cache
    // (measured: dd07 median 16.0 s → 10.4 s at sf0.1 from this change)
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .cache()
    // propagate ONLY over vertices that appear in some pair: unpaired
    // documents never change label, so dragging the whole corpus through
    // every round would shuffle |corpus| rows per iteration for nothing —
    // at scale the near-dup subgraph is a tiny fraction of the corpus
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .cache()
    // one eager action pins BOTH caches (labels' lineage runs through
    // the edge cache, so edges materializes exactly once on the way)
    labels.count()
    // the frame actually pinned in the cache manager: labels becomes a
    // PROJECTION of each batch's final result, and unpersist() only
    // evicts a plan that matches the cached one
    var pinned = labels
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val batch = math.min(2, maxIters - iter)
      var toRelease = List.empty[DataFrame]
      var cur = labels
      for (b <- 1 to batch) {
        // carry each vertex's OLD label through the same aggregation
        // that computes the new one (own-label rows have old set,
        // neighbor rows NULL; min() ignores the NULLs) — convergence
        // then falls out of a filter over the batch result instead of
        // costing a second join+shuffle per round
        val viaNeighbors = edges
          .join(cur.withColumnRenamed("doc_id", "src"), "src")
          .select(col("dst").as("doc_id"), col("cluster_id"),
            lit(null).cast("long").as("old"))
        val own = cur.select(col("doc_id"), col("cluster_id"),
          col("cluster_id").cast("long").as("old"))
        val next = own.union(viaNeighbors)
          .groupBy(col("doc_id"))
          .agg(min(col("cluster_id")).as("cluster_id"), min(col("old")).as("old"))
          .cache()
        if (b < batch) toRelease ::= next
        cur = next
      }
      // ONE action per batch: materializes both pipelined rounds and
      // reads the convergence bit off the final one
      val changed = cur.filter(col("cluster_id") =!= col("old")).count()
      toRelease.foreach(_.unpersist())
      pinned.unpersist()
      pinned = cur
      labels = cur.select(col("doc_id"), col("cluster_id"))
      converged = changed == 0
      iter += batch
    }
    // batch budget exhausted without a fixed point: the pair graph has a
    // longer diameter than round-by-round propagation should chase
    // (driver sync per batch × O(diameter) rounds). Switch to large-star/
    // small-star contraction — O(log diameter) rounds on the SAME edge
    // set — and take its labels instead of the half-propagated ones.
    if (!converged) {
      val canon = edges.filter(col("src") > col("dst"))
        .select(col("src").as("u"), col("dst").as("v")).distinct()
      pinned.unpersist()
      labels = starRounds(canon, 32)._1
    }
    edges.unpersist()
    // unpaired documents are their own cluster
    docs.select(col("doc_id"))
      .join(labels.withColumnRenamed("cluster_id", "__cl"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("__cl"), col("doc_id")).as("cluster_id"))
  }

  /** Connected components by LARGE-STAR / SMALL-STAR contraction
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond", SOCC — public research). Same contract as [[clusters]]
    * (doc_id -> min-id cluster label, unpaired docs self-labeled), but
    * the round count is O(log diameter) instead of O(diameter): each
    * round rewrites the EDGE SET toward disjoint stars centered at
    * component minima rather than propagating labels one hop.
    *
    * This is the scale path [[clusters]] falls back to when its batch
    * budget runs out: at 100 TB a long-diameter pair graph (chained
    * near-dups) makes per-round driver synchronization the bottleneck,
    * and log-rounds is the published fix. Every step is a keyed
    * shuffle on vertex id over the (small) pair subgraph — no
    * adjacency materialization, no driver-side graph. */
  def clustersStar(docs: DataFrame, pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    val canon = pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val labels = starRounds(canon, maxRounds)._1
    docs.select(col("doc_id"))
      .join(labels.withColumnRenamed("cluster_id", "__cl"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("__cl"), col("doc_id")).as("cluster_id"))
  }

  /** Core star-contraction loop over canonical (u > v, distinct)
    * undirected edges. Returns (labels for every vertex appearing in an
    * edge, rounds executed) — the round count is exposed so specs can
    * pin the O(log diameter) convergence guarantee. */
  private[graft] def starRounds(canonEdges: DataFrame, maxRounds: Int): (DataFrame, Int) = {
    // LINEAGE TRUNCATION, not just caching: in a fixed-point loop each
    // round's logical plan nests the last round's, and Catalyst
    // re-analyzes the whole nested tree per action even when the parent
    // is cached — plan size (and analysis time) grows exponentially with
    // rounds. localCheckpoint materializes the round AND cuts the plan
    // back to a leaf, the standard treatment for iterative DataFrame
    // algorithms; on a real cluster with executor loss to worry about,
    // swap for reliable `checkpoint()` on the configured checkpoint dir.
    // LAZY checkpoints (eager = false): the materialization rides the
    // round's one count() action instead of costing a standalone job —
    // at small edge counts the loop is pure job-overhead, so jobs per
    // round is the figure of merit (measured 6 s for a 120-node chain
    // graph with eager checkpoints, ~half that lazy).
    var edges = canonEdges.localCheckpoint(false)
    var cnt = edges.count()
    var rounds = 0
    var fixed = false
    // Each half-round is ONE window over the neighbor list (min of the
    // neighborhood, partitioned by node) instead of a groupBy + re-join
    // pair: two shuffles per round total, which matters because under
    // AQE every shuffle stage schedules as its own job — the original
    // join/distinct form cost 139 jobs (≈10 s of pure scheduling at
    // local[32]) for a 120-node graph vs ~40 in this form. Skew note
    // for real scale: a hub's whole neighborhood lands in one window
    // task, but that is the published algorithm's reduce step verbatim
    // (and the join form shuffled the same rows to the same reducer),
    // so the window loses nothing the MR formulation had.
    val wu = org.apache.spark.sql.expressions.Window.partitionBy("u")
    // one-scan orientation doubling: a self-UNION would execute the
    // (expensive, windowed) upstream once per branch; explode emits
    // both directions from a single pass
    def both(df: DataFrame, a: String, b: String): DataFrame =
      df.select(explode(array(
        struct(col(a).as("u"), col(b).as("v")),
        struct(col(b).as("u"), col(a).as("v")))).as("__e"))
        .select(col("__e.u").as("u"), col("__e.v").as("v"))
    while (rounds < maxRounds && !fixed) {
      // both orientations of the materialized edge set = full
      // neighborhoods (one scan of the checkpoint leaf)
      val nbrs = both(edges, "u", "v")
      // LARGE-STAR: every node points its LARGER neighbors at the min of
      // its closed neighborhood — long chains halve in one pass.
      // Duplicate edges out of this step are harmless (they feed mins
      // and a final distinct), so no intermediate dedup shuffle.
      val lw = nbrs.withColumn("mn", least(min(col("v")).over(wu), col("u")))
      val large = lw.filter(col("v") > col("u"))
        .select(col("v").as("u"), col("mn").as("v"))
        .filter(col("u") =!= col("v"))
      // SMALL-STAR: every node with smaller neighbors points them (and
      // itself) at the smallest of them
      val snbrs = both(large, "u", "v").filter(col("v") < col("u"))
      val sw = snbrs.withColumn("m", min(col("v")).over(wu))
      // emit (smaller-neighbor -> m) and (center -> m) in one pass; the
      // duplicate center rows die in the final distinct
      val next = sw.select(explode(array(
          struct(col("v").as("u"), col("m").as("v")),
          struct(col("u").as("u"), col("m").as("v")))).as("__e"))
        .select(col("__e.u").as("u"), col("__e.v").as("v"))
        .filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct().localCheckpoint(false)
      // one action per round: materializes the lazy checkpoint AND
      // reads off the new edge count
      val nextCnt = next.count()
      // fixed point = identical edge set: both sides are DISTINCT
      // canonical sets, so equal counts + one empty EXCEPT prove it
      // (the EXCEPT only ever runs on count-equal rounds, near the end)
      fixed = nextCnt == cnt && next.except(edges).isEmpty
      edges = next
      cnt = nextCnt
      rounds += 1
    }
    // NEVER silently truncate: labels read off a non-star edge set are
    // wrong (a vertex could still point at a non-minimum), and this is
    // the terminal fallback — there is no further escalation. With
    // log-diameter contraction the default budgets cover diameters past
    // 2^25, so reaching this is a graph-shape bug worth failing on.
    if (!fixed) throw new IllegalStateException(
      s"star contraction did not reach a fixed point in $maxRounds rounds — " +
        "component labels would be unreliable; raise maxRounds")
    // at the fixed point the graph is disjoint stars centered at each
    // component's minimum id: labels read straight off the edge set
    val labels = edges.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("doc_id"), col("v").as("cluster_id")))
      .groupBy(col("doc_id")).agg(min(col("cluster_id")).as("cluster_id"))
    (labels, rounds)
  }

  /** C4/RefinedWeb-style cross-document SEGMENT dedup: split every
    * document into fixed-width token windows, keep only the FIRST
    * occurrence (smallest (doc_id, position)) of each distinct segment
    * corpus-wide, and report per-document survival counts — the
    * training-data op that strips boilerplate/copied spans WITHIN
    * otherwise-distinct documents, which document-level dedup cannot
    * see. One explode + one hash-agg + one equi-join on the segment
    * value — no pairwise comparison anywhere, so cost is linear in
    * corpus size and the heavy agg/join shuffles partition on uniform
    * segment hashes (no hot keys beyond genuinely-common segments).
    *
    * First-wins is decided by the scalar key `doc_id * 1e6 + seg_idx`
    * (== lexicographic (doc_id, seg_idx) while documents stay under
    * 1e6 segments — `width` tokens × 1e6 ≫ any real document).
    * Returns (doc_id, n_segments, n_kept, n_dropped). */
  def segmentDedupStats(docs: DataFrame, width: Int = 10): DataFrame = {
    // assemble segments columnar — explode tokens once, group by
    // (doc, pos div width), join in position order. A per-window
    // `slice(tokens(text), …)` lambda would re-run the tokenizer once
    // per segment (the documented HOF re-evaluation trap): harmless on
    // 300-char fixtures, quadratic on real web documents
    val segs = docs.select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "t")))
      .groupBy(col("doc_id"), floor(col("pos") / width).cast("long").as("seg_idx"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("t")))),
        s => s.getField("t")), " ").as("seg"))
    val keyed = segs.select(col("doc_id"), col("seg"),
      (col("doc_id") * 1000000L + col("seg_idx")).as("k"))
    val firsts = keyed.groupBy(col("seg")).agg(min(col("k")).as("fk"))
    keyed.join(firsts, "seg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("k") === col("fk"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("n_dropped", col("n_segments") - col("n_kept"))
  }

  /** The end-user dedup operation: drop every document that is a
    * non-representative member of a near-dup cluster (representative =
    * smallest doc_id), keeping unpaired documents untouched. */
  def dedupCorpus(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.join(clusters(docs, pairs).filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id")), "doc_id")

  /** Seed base for the Bloom-filter probe family (minhash uses 0..,
    * simhash 1000.., the sampling mix 2000, count-min 4000). */
  val BloomSeedBase = 3000

  /** k portable probe positions in [0, bits) for a pre-hashed key — the
    * shared primitive behind the Bloom filter (k positions per key) and
    * the count-min sketch (one column per row seed). Same quadratic
    * family as the minhash transforms, so the DuckDB oracles replay the
    * positions from interpolated [[seedConsts]] literals. */
  def probePositions(h: Column, bits: Int, k: Int,
                     seedBase: Int = BloomSeedBase): Column =
    array((0 until k).map(s =>
      pmod(seedHash(h, seedBase + s), lit(bits.toLong))): _*)

  /** Bloom-filter corpus membership: build the filter from the corpus
    * key column, probe each (doc_id, fp) row, return
    * (doc_id, fp, bloom_pass). False negatives are impossible by
    * construction (BloomSpec pins it); false positives are the
    * deterministic price of `bits`.
    *
    * Scale shape: the filter is represented as a TABLE of set bit
    * positions — at most `bits` rows after distinct, so membership is
    * one explode + one equi-join against a tiny (broadcastable) side;
    * nothing ever compares probe keys against corpus keys pairwise. On
    * a cluster the positions table would collapse into a bitmask
    * broadcast (bits/64 longs); the relational form keeps every step
    * replayable by the DuckDB oracle (dd10). */
  def bloomMembership(corpusFps: DataFrame, probes: DataFrame,
                      bits: Int = 4096, k: Int = 3): DataFrame = {
    val filterPos = corpusFps
      .select(explode(probePositions(col("fp"), bits, k)).as("pos"))
      .distinct()
    // verdicts are computed per DISTINCT (doc_id, fp) key and joined
    // back: a doc_id probed with two fps (or the same row twice) must
    // not pool its 2k probe positions into one sum-vs-k comparison —
    // that silently broke both verdicts (ADVICE r8)
    val keys = probes.select(col("doc_id"), col("fp")).distinct()
    val probePos = keys.select(col("doc_id"), col("fp"),
      explode(probePositions(col("fp"), bits, k)).as("pos"))
    val hits = probePos
      .join(filterPos.withColumn("__hit", lit(1L)), Seq("pos"), "left")
      .groupBy(col("doc_id"), col("fp"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("__nhit"))
    probes.join(hits, Seq("doc_id", "fp"))
      .select(col("doc_id"), col("fp"), (col("__nhit") === k).as("bloom_pass"))
  }

  /** Content-defined chunking (Rabin-style CDC, the storage-dedup
    * technique behind rsync/LBFS/backup dedupe): a chunk boundary falls
    * wherever the rolling hash of the last `window` tokens is divisible
    * by `boundaryMask` — boundaries are a function of CONTENT, not
    * position, so inserting one token early in a document only re-cuts
    * the chunks that actually changed (fixed-size blocks would shift
    * every subsequent block). Returns (doc_id, chunk_id, chunk_fp);
    * duplicate chunk_fps across documents are shareable storage.
    *
    * Scale shape: one explode + two keyed shuffles (per-doc token
    * re-collect, per-chunk fold); the rolling hash is a row-local slice
    * fold over the doc's token-hash array; expected chunk length =
    * `boundaryMask` tokens bounds per-group fold state. Portable
    * base-131 arithmetic throughout, replayed exactly by dd12's oracle. */
  def contentChunks(docs: DataFrame, window: Int = 4,
                    boundaryMask: Long = 16L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // token hashes in one fused codegen pass; the bound `ths` array is
    // then sliced row-locally for the rolling window
    val arrays = docs.select(col("doc_id"),
      TextFunctions.tokenHashes(col("text")).as("ths"))
    val rolled = arrays
      .select(col("doc_id"), col("ths"),
        explode(sequence(lit(1), size(col("ths")))).as("pos"))
      .select(col("doc_id"), col("pos"),
        element_at(col("ths"), col("pos")).as("th"),
        aggregate(
          slice(col("ths"), greatest(lit(1), col("pos") - (window - 1)),
            least(col("pos"), lit(window))),
          lit(0L), (a, x) => pmod(a * lit(131L) + x, lit(HashP))).as("roll"))
    val flagged = rolled.select(col("doc_id"), col("pos"), col("th"),
      (pmod(col("roll"), lit(boundaryMask)) === 0).cast("int").as("b"))
    val prior = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    flagged
      .withColumn("chunk_id",
        coalesce(sum(col("b")).over(prior), lit(0)).cast("long"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("th")))).as("pt"))
      .select(col("doc_id"), col("chunk_id"),
        aggregate(transform(col("pt"), s => s.getField("th")), lit(0L),
          (a, x) => pmod(a * lit(131L) + x, lit(HashP))).as("chunk_fp"))
  }

  /** EXACT duplicated-substring spans (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" exact-
    * substring family, token-granular): every `width`-token gram that
    * occurs >= 2 times ANYWHERE in the corpus (same doc or cross-doc)
    * marks its positions, and per document the marked positions merge
    * into maximal duplicated spans (gaps-and-islands: grams at distance
    * <= width overlap or touch, so they fuse). Complements the
    * approximate fingerprint families — winnowing (dd08) samples grams,
    * this finds EVERY duplicated span exactly; the suffix-array the
    * paper uses is replaced by the gram-hash group-by, which is the
    * shuffle-native equivalent at fixed minimum match length.
    *
    * Returns (doc_id, span_start, span_end, n_grams) in token indices
    * (inclusive). Scale shape: one explode to gram hashes (n_tokens
    * rows/doc), one map-side-combinable count shuffle to find
    * duplicated grams, a semi-join back, and a per-doc window — never
    * any pairwise doc comparison; the dominant term is the gram count
    * shuffle, linear in corpus tokens. */
  def duplicatedSpans(docs: DataFrame, width: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // token hashes in one fused codegen pass (no explode + re-collect)
    val arrays = docs.select(col("doc_id"),
      TextFunctions.tokenHashes(col("text")).as("ths"))
    val grams = arrays.select(col("doc_id"),
      posexplode(shingleHashes(col("ths"), width)).as(Seq("gpos", "h")))
    val dupGrams = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") >= 2)
      .select(col("h"))
    val dupPos = grams.join(dupGrams, Seq("h"), "left_semi")
      .select(col("doc_id"), col("gpos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("gpos"))
    dupPos
      .withColumn("__prev", lag(col("gpos"), 1).over(w))
      .withColumn("__ns",
        when(col("__prev").isNull || col("gpos") - col("__prev") > width, 1)
          .otherwise(0))
      .withColumn("__span",
        sum(col("__ns")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__span"))
      .agg(min(col("gpos")).as("span_start"),
        (max(col("gpos")) + (width - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_grams"))
  }

  /** Exact n-gram Jaccard as a two-phase block-then-verify pipeline:
    * MinHash-LSH banding generates candidate pairs (16 hashes, 8 bands →
    * P[candidate | J=0.6] ≈ 0.97, ≈1.0 for true near-dups), then the
    * exact |A∩B| / |A∪B| on the full distinct-shingle sets confirms —
    * computed row-locally with array_intersect once the pair row holds
    * both shingle arrays.
    *
    * The naive alternative (inverted-index self-join on every shingle)
    * is exact-complete but materializes O(docs-per-shingle²) pair rows
    * per shingle — ~64M rows on this corpus at sf0.1 and unboundedly
    * skewed at 100 TB. Block-then-verify is the scalable shape; the
    * probabilistic blocking miss-rate at exactly-threshold pairs is the
    * documented trade. */
  def ngramJaccardDups(docs: DataFrame, shingleWidth: Int = 3,
                       threshold: Double = 0.6, numHashes: Int = 16,
                       seedsPerBand: Int = 2): DataFrame = {
    val base = docs.select(col("doc_id"),
      array_distinct(TextFunctions.shingles(col("text"), shingleWidth)).as("sh"))
    val sigs = signatures(docs, numHashes, shingleWidth)
    val bands = sigs.select(col("doc_id"),
      posexplode(bandKeys(col("sig"), numHashes, seedsPerBand)).as(Seq("band", "band_key")))
    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val withSets = candidates
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    withSets
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
