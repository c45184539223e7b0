package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Approximate-nearest-neighbor search over `array<float>` embedding
  * columns.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine against every row — the baseline,
  *    and the correct choice when the query side is tiny (broadcast) and
  *    the corpus scan is already required.
  *  - [[lshTopK]]: random-hyperplane LSH — deterministic seeded planes,
  *    n-bit signatures, banded buckets; only bucket-colliding rows get a
  *    cosine. This is the 100 TB path: the signature is one narrow map,
  *    candidates come from an equi-join on (band, band-bits), and the
  *    expensive exact scoring touches a tiny candidate set.
  *
  * Near-duplicate detection over embeddings ([[cosineNearDups]]) reuses
  * the same bucketing: near-identical vectors collide on every band.
  */
object Similarity {

  /** Deterministic Gaussian hyperplanes (seeded), as literal columns —
    * broadcast by constant-folding, no side table needed. */
  def planes(nBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** n-bit signature of a vector: bit p = sign(v · plane_p).
    *
    * Planes may be LONGER than the vector: each element indexes its plane
    * component via `get` (O(1) on the folded literal, null when out of
    * bounds) and `coalesce` zeroes the excess, so one over-provisioned
    * plane literal serves any embedding width without probing the data
    * (no plan-build-time job) and per-row cost stays ∝ actual width. */
  def signature(vec: Column, ps: Seq[Seq[Double]]): Column =
    VectorFunctions.hyperplaneSignature(vec, ps)

  /** Reference HOF formulation of [[signature]] — one transform +
    * aggregate per bit. Kept as the differential oracle for the fused
    * codegen expression ([[graft.functions.HyperplaneSignature]]), which
    * must match it bit-for-bit (`HyperplaneSignatureSpec`); the fused
    * form replaces 16 traversals + 16 array allocations per row with
    * one pass. */
  private[graft] def signatureHof(vec: Column, ps: Seq[Seq[Double]]): Column = {
    val v = vec.cast("array<double>")
    val bits = ps.zipWithIndex.map { case (p, i) =>
      val pl = typedLit(p)
      val dotP = aggregate(
        transform(v, (x, idx) => coalesce(x * get(pl, idx), lit(0.0))),
        lit(0.0), _ + _)
      when(dotP >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Exact cosine top-k of `corpus` rows against one query vector
    * (selected by `queryId`). Output: (vec_id, cos) sorted desc.
    *
    * CONTRACT: deliberately brute-force — ONE broadcast query row
    * against the corpus, a single linear scan, no index. That is the
    * right exact baseline for a bounded probe set (ss01 runs 1 query;
    * ss04 uses it as the recall oracle) and the wrong op for
    * corpus×corpus work: an all-pairs need goes through [[lshKnnJoin]]
    * (LSH-blocked) or [[ivfTopK]], never a lifted loop over this. */
  def bruteForceTopK(corpus: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = corpus.filter(col("vec_id") === queryId)
      .select(col("embedding").as("query_embedding"))
    corpus.join(broadcast(q))
      .select(col("vec_id"),
        round(VectorFunctions.cosineFast(col("embedding"), col("query_embedding")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Hyperplane width: planes are generated at this fixed width and
    * truncated per-row by the null-padding `coalesce` in [[signature]],
    * so no data is probed at plan-build time. Embeddings wider than this
    * are REJECTED (per-row `raise_error` guard in `bandedSignatures`) —
    * silently signing only the first `MaxPlaneDim` components would
    * degrade LSH recall with no signal. Callers with wider vectors
    * should truncate/project explicitly before hashing. */
  val MaxPlaneDim = 1024

  /** (vec_id, embedding, band, band_bits): per-vector hyperplane
    * signature exploded into `bands` bucket keys — the shared candidate-
    * generation layout for [[lshTopK]] and [[cosineNearDups]].
    * Banded LSH: `nBits` must be a multiple of `bands`; rows sharing any
    * band with the query are candidates. Recall grows with bands; cost
    * grows with bucket size. */
  /** Test-only window into [[bandedSignatures]] (candidate census). */
  private[graft] def debugBandedSignatures(corpus: DataFrame, nBits: Int,
                                           bands: Int, seed: Long): DataFrame =
    bandedSignatures(corpus, nBits, bands, seed)

  private def bandedSignatures(corpus: DataFrame, nBits: Int, bands: Int,
                               seed: Long): DataFrame = {
    require(nBits % bands == 0, "nBits must divide into bands")
    val ps = planes(nBits, MaxPlaneDim, seed)
    val bitsPerBand = nBits / bands
    val mask = (1L << bitsPerBand) - 1
    // dimension guard: the plane width is fixed, so an over-wide vector
    // would be hashed on a truncated projection — fail loudly per row
    // instead (the size() compare is noise next to the dot products)
    val guarded = corpus.filter(
      when(size(col("embedding")) <= MaxPlaneDim, lit(true))
        .otherwise(raise_error(concat(
          lit(s"embedding dim "), size(col("embedding")),
          lit(s" exceeds MaxPlaneDim=$MaxPlaneDim — truncate or project before LSH")))))
    // the FULL signature rides along: a popcount over sig xor sig is
    // the cheap angle proxy the hard-negative candidate cap ranks by
    guarded.select(col("vec_id"), col("embedding"),
        signature(col("embedding"), ps).as("sig"))
      .select(col("vec_id"), col("embedding"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => call_function("shiftright", col("sig"), b * lit(bitsPerBand))
            .bitwiseAND(lit(mask)))).as(Seq("band", "band_bits")))
  }

  def lshTopK(corpus: DataFrame, queryId: Long, k: Int,
              nBits: Int = 16, bands: Int = 4, seed: Long = 42L): DataFrame = {
    val banded = bandedSignatures(corpus, nBits, bands, seed)

    val qBanded = banded.filter(col("vec_id") === queryId)
      .select(col("band").as("q_band"), col("band_bits").as("q_bits"),
        col("embedding").as("query_embedding"))

    banded.join(broadcast(qBanded),
        col("band") === col("q_band") && col("band_bits") === col("q_bits"))
      .select(col("vec_id"), col("embedding"), col("query_embedding"))
      .distinct()
      .select(col("vec_id"),
        round(VectorFunctions.cosineFast(col("embedding"), col("query_embedding")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Batch kNN JOIN: top-k LSH neighbors for EVERY vector at once — the
    * form a corpus-wide similarity pass actually needs (per-query probes
    * like [[lshTopK]] don't amortize over 100 TB). Candidates come only
    * from shared band buckets (never all-pairs), the candidate id-pairs
    * are deduplicated NARROW — before embeddings re-join (the dd06
    * lesson: shuffle 16-byte pairs, not vectors), and the per-vector
    * top-k window hash-partitions by vec_id, so no stage concentrates
    * on one task. Vectors whose buckets yield fewer than k candidates
    * return fewer rows — the documented LSH recall trade ([[lshTopK]]),
    * pinned against brute force in ss04. */
  def lshKnnJoin(corpus: DataFrame, k: Int, nBits: Int = 16, bands: Int = 4,
                 seed: Long = 42L): DataFrame = {
    // NOTE on geometry: candidates per band grow ~ n² / 2^bitsPerBand,
    // so a FIXED nBits is only right when the caller (or an oracle
    // replaying the exact banding) needs pinned bucket geometry. A
    // corpus-sized pass should use [[lshKnnJoinAuto]], which scales
    // the per-band bucket count with n to keep candidate growth linear.
    val pairs = candidatePairs(corpus, nBits, bands, seed)
    val emb = corpus.select(col("vec_id"), col("embedding"))
    val scored = pairs
      .join(emb.select(col("vec_id").as("vec_id"), col("embedding").as("ea")), "vec_id")
      .join(emb.select(col("vec_id").as("nbr_id"), col("embedding").as("eb")), "nbr_id")
      .select(col("vec_id"), col("nbr_id"),
        round(VectorFunctions.cosineFast(col("ea"), col("eb")), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank"), col("nbr_id"), col("cos"))
  }

  /** [[lshKnnJoin]] with AUTO-SIZED bucket geometry — the 100 TB form.
    * With B = 2^bitsPerBand buckets per band, expected candidate pairs
    * are ~ bands·n²/B: any FIXED B turns quadratic once n outgrows it
    * (the default 16-bit/4-band geometry is right for oracle-replayed
    * probe sets, wrong for a corpus-sized pass). This variant sizes
    * bitsPerBand = ceil(log2(n / targetBucket)) — clamped to [4,
    * 63/bands] (the signature is one 64-bit word) — so expected bucket
    * occupancy stays ~targetBucket and candidate growth stays LINEAR
    * in n. Costs one count() pass over ids; recall at equal occupancy
    * is preserved because collision probability per band depends on
    * per-band bit count only through the occupancy being compared.
    * Pinned in `AutoLshSpec`: a 4× corpus costs ~4× candidates here
    * vs ~16× under fixed geometry. */
  def lshKnnJoinAuto(corpus: DataFrame, k: Int, bands: Int = 4,
                     targetBucket: Int = 32, seed: Long = 42L): DataFrame = {
    require(bands >= 1 && targetBucket >= 1, "bands and targetBucket must be positive")
    // the signature is ONE 64-bit word: past 15 bands the 4-bit floor
    // no longer fits and 63/bands would silently shrink buckets toward
    // 2^0 = 1 — every vector in one bucket, the exact quadratic
    // blowup this variant exists to prevent. Fail loudly instead.
    require(bands <= 15,
      s"bands=$bands cannot give every band the >=4 bits a 64-bit signature allows")
    val n = corpus.select(col("vec_id")).count()
    lshKnnJoin(corpus, k, nBits = autoBitsPerBand(n, targetBucket, bands) * bands,
      bands = bands, seed = seed)
  }

  private[operators] def autoBitsPerBand(n: Long, targetBucket: Int,
                                         bands: Int): Int = {
    // smallest b with 2^b · targetBucket >= n — the integer-exact form
    // of ceil(log2(n / targetBucket)). Integer comparison, not floating
    // log: the DuckDB oracles re-derive the SAME geometry from count(*)
    // (`(1::BIGINT << b) * targetBucket >= n` over b in [4, 63/bands]),
    // and ln/ln2 rounding could flip a power-of-two edge between
    // engines where the integer predicate cannot.
    val need = (n + targetBucket - 1) / targetBucket // = ceil(n/target)
    var b = 0
    while (b < 62 && (1L << b) < need) b += 1
    math.min(63 / bands, math.max(4, b))
  }

  /** The LSH candidate stage shared by [[lshKnnJoin]] /
    * [[lshKnnJoinAuto]]: distinct (vec_id, nbr_id) pairs colliding in
    * some band bucket — NARROW ids only, vectors re-join later.
    * Package-visible so AutoLshSpec can pin the candidate-growth
    * contract directly. */
  private[operators] def candidatePairs(corpus: DataFrame, nBits: Int,
                                        bands: Int, seed: Long): DataFrame = {
    val banded = bandedSignatures(corpus, nBits, bands, seed)
      .select(col("vec_id"), col("band"), col("band_bits"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_bits") === col("y.band_bits") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nbr_id"))
      .distinct()
  }

  /** Order-deterministic per-dimension mean of a fixed-width vector
    * column, as a broadcastable 1-row frame holding `mean_vec:
    * array<double>`. Each element is first snapped to 2^-20 fixed point
    * (`floor(x·2^20 + 0.5)` — identical in any IEEE engine), summed as
    * BIGINT (associative, so partition order cannot perturb low bits —
    * the ss03 codebook discipline), then floor-divided back. The DuckDB
    * oracles replay the exact same integer chain. */
  private[graft] def fixedPointMeanVec(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(sum(floor(col("x") * lit(1048576.0) + lit(0.5)).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .select(col("pos"),
        (floor(col("s").cast("double") / col("n")) / lit(1048576.0)).as("m"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("mean_vec"))

  /** CROSS-TABLE (cross-modal) batch kNN join: top-k `corpus` neighbors
    * for every `queries` row — the retrieval shape that aligns one
    * modality's feature vectors (e.g. decoded media) with another's
    * embeddings. Both sides are bucketed by the SAME hyperplane
    * signature, so a candidate is a (band, bits) collision ACROSS
    * tables. Queries carry (qid, qvec); corpus (vec_id, embedding).
    * Scale shape is [[lshKnnJoin]]'s: signatures are narrow per-row
    * maps, candidates come only from bucket equality (never |Q|×|C|),
    * exact rescoring joins vectors back by id, and the top-k window
    * hash-partitions by qid. Queries whose buckets yield fewer than k
    * candidates return fewer rows — the same documented LSH recall
    * trade.
    *
    * `center = true` subtracts each side's OWN per-dimension mean
    * before hashing (exact rescoring still uses raw vectors). Sign
    * random projections assume data spread around the origin; a
    * modality living in the positive orthant (e.g. byte-mean features)
    * otherwise collapses into a handful of buckets and the candidate
    * set degenerates toward |Q|×|C| — measured 2.4 M of 10 M possible
    * pairs on the mm06 corpus, vs ~2 k centered. Means are computed in
    * order-independent fixed point ([[fixedPointMeanVec]]) so oracles
    * replay the hash bit-for-bit; with per-side means, a query equal to
    * a corpus row is no longer GUARANTEED its bucket (centering shifts
    * the sides differently) — callers needing that property keep
    * `center = false`. */
  def lshKnnAcross(queries: DataFrame, corpus: DataFrame, k: Int,
                   nBits: Int = 16, bands: Int = 4, seed: Long = 42L,
                   center: Boolean = false): DataFrame = {
    def centered(df: DataFrame, idCol: String, vecCol: String): DataFrame =
      df.crossJoin(broadcast(fixedPointMeanVec(df, vecCol)))
        .select(col(idCol).as("vec_id"),
          zip_with(col(vecCol).cast("array<double>"), col("mean_vec"),
            (x, m) => x - m).as("embedding"))
    val qHash =
      if (center) centered(queries, "qid", "qvec")
      else queries.select(col("qid").as("vec_id"), col("qvec").as("embedding"))
    val cHash =
      if (center) centered(corpus, "vec_id", "embedding")
      else corpus.select(col("vec_id"), col("embedding"))
    val qb = bandedSignatures(qHash, nBits, bands, seed)
      .select(col("vec_id").as("qid"), col("band"), col("band_bits"))
    val cb = bandedSignatures(cHash, nBits, bands, seed)
      .select(col("vec_id"), col("band"), col("band_bits"))
    val pairs = qb.join(cb, Seq("band", "band_bits"))
      .select(col("qid"), col("vec_id")).distinct()
    val scored = pairs
      .join(queries.select(col("qid"), col("qvec")), "qid")
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("qid"), col("vec_id"),
        round(VectorFunctions.cosineFast(col("qvec"), col("embedding")), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
  }

  /** [[lshKnnAcross]] with AUTO-SIZED bucket geometry — the corpus-scale
    * form of cross-modal retrieval. Expected candidate pairs are
    * ~ bands·|Q|·|C|/B, so any FIXED per-band bucket count B turns
    * quadratic once the tables outgrow it (mm06's old fixed 8-bit bands
    * measured 7.7× wall on 10× data for exactly this reason). Geometry
    * is sized by the LARGER side's count — B must track whichever table
    * grows, and per-band collision probability depends on the bit count
    * only through occupancy, so recall at equal occupancy is preserved
    * ([[lshKnnJoinAuto]]'s argument, pinned in `AutoLshSpec`). Costs
    * one count() per side (id-column only). The derived bit width is
    * [[autoBitsPerBand]] — integer-exact, so oracles re-derive it from
    * the two counts. */
  def lshKnnAcrossAuto(queries: DataFrame, corpus: DataFrame, k: Int,
                       bands: Int = 4, targetBucket: Int = 32,
                       seed: Long = 42L, center: Boolean = false): DataFrame = {
    require(bands >= 1 && targetBucket >= 1, "bands and targetBucket must be positive")
    require(bands <= 15,
      s"bands=$bands cannot give every band the >=4 bits a 64-bit signature allows")
    val n = math.max(queries.select(col("qid")).count(),
      corpus.select(col("vec_id")).count())
    lshKnnAcross(queries, corpus, k,
      nBits = autoBitsPerBand(n, targetBucket, bands) * bands,
      bands = bands, seed = seed, center = center)
  }

  /** RADIUS (ε-)join: every `corpus` row within cosine ≥ `threshold`
    * of each `queries` row — the all-matches dual of [[lshKnnAcross]]'s
    * top-k, the shape retrieval uses when the caller wants "everything
    * this similar" (duplicate sweep of a probe set, contamination
    * lookup) rather than a fixed neighbor count. Queries carry
    * (qid, qvec); corpus (vec_id, embedding).
    *
    * Scale shape: candidates only from shared (band, bits) buckets —
    * never |Q|×|C| — deduped as NARROW id pairs before either side's
    * vectors re-join ([[cosineNearDups]]'s lesson); the confirm filters
    * the RAW cosine so boundary pairs match an exact oracle. Recall is
    * [[cosineNearDups]]'s banding bound (miss ≈ 0.03 at θ=8°, tighter
    * at 0.99+) — the threshold regime radius sweeps run at. */
  def cosineRadiusJoin(queries: DataFrame, corpus: DataFrame,
                       threshold: Double = 0.99, nBits: Int = 16,
                       bands: Int = 4, seed: Long = 42L): DataFrame = {
    val qb = bandedSignatures(
        queries.select(col("qid").as("vec_id"), col("qvec").as("embedding")),
        nBits, bands, seed)
      .select(col("vec_id").as("qid"), col("band"), col("band_bits"))
    val cb = bandedSignatures(corpus, nBits, bands, seed)
      .select(col("vec_id"), col("band"), col("band_bits"))
    val pairs = qb.join(cb, Seq("band", "band_bits"))
      .select(col("qid"), col("vec_id")).distinct()
    pairs
      .join(queries.select(col("qid"), col("qvec")), "qid")
      .join(corpus.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("qid"), col("vec_id"),
        VectorFunctions.cosineFast(col("qvec"), col("embedding")).as("__raw"))
      .filter(col("__raw") >= threshold)
      .select(col("qid"), col("vec_id"), round(col("__raw"), 6).as("cos"))
  }

  /** HARD-NEGATIVE MINING: for every vector, the top-k most similar
    * vectors carrying a DIFFERENT label — the contrastive-training
    * primitive (negatives that are hard precisely because they are
    * near the anchor). This is filtered ANN with the predicate pushed
    * INTO candidate generation: the label-inequality filter runs on
    * the NARROW (band, bits) collision pairs, before either side's
    * embedding re-joins — post-filtering a plain kNN would instead
    * waste the whole candidate budget on same-label neighbors and
    * return fewer than k negatives. Same banded-hyperplane recall
    * trade as [[lshKnnJoin]], pinned by the exact-replay oracle
    * (ss14). Corpus carries (vec_id, embedding, label).
    *
    * The per-anchor top-k stays a WINDOW deliberately: an r15 A/B
    * replaced it with the bounded-heap `top_k_by` aggregate plus
    * survivor re-joins (to recover nbr_label/cos) and measured SLOWER
    * at sf1 (6.2 s vs 4.9 s, same window) — at ~bands×targetBucket
    * candidates per anchor the window's group sort is cheap, and two
    * extra corpus-wide joins cost more than it saves. Revisit only if
    * candidate occupancy per anchor grows past ~10³.
    *
    * PER-(anchor, band) CANDIDATE CAP (r16, VERDICT r15 #5): before
    * the exact rescore, each anchor keeps only its `capPerBand`
    * hamming-closest collisions PER BAND — popcount(sig xor sig) is
    * the cheap SimHash angle proxy, already codegen'd integers, vs a
    * dim-wide cosine after two embedding joins per surviving pair.
    * Auto geometry keeps EXPECTED occupancy flat, but real corpora
    * cluster: a dense bucket (near-duplicate families — exactly what
    * sf1's synthesized copies produce) goes quadratic inside the
    * bucket, which is why ss14's verify-rescore dominated at 10×
    * data. The cap bounds every anchor's rescore bill at
    * bands × capPerBand whatever the bucket density, per-bucket (not
    * global), so sparse anchors keep their full pool. Default
    * 4·k per band (≤ 4·bands·k pool for a top-k answer); ties and
    * order are deterministic ((hamming, nbr_id)), so the ss14 oracle
    * replays the capped pool exactly. */
  def hardNegatives(corpus: DataFrame, k: Int, nBits: Int = 16,
                    bands: Int = 4, seed: Long = 42L,
                    capPerBand: Int = -1,
                    selfJoinHint: Option[String] = None): DataFrame = {
    val cap = if (capPerBand < 0) 4 * k else capPerBand
    // (band, band_bits) packed into ONE long join key: a single-column
    // long equi-join hashes and probes cheaper than the two-column key
    // in the hot self-join below — band < 16 rides the low bits, the
    // ≤60-bit band value the high ones (r19; the ss14 sf1 spot's
    // dominant job is exactly this join's probe side)
    val banded = bandedSignatures(corpus, nBits, bands, seed)
      .join(corpus.select(col("vec_id"), col("label")), "vec_id")
      .select(col("vec_id"), col("label"), col("sig"),
        col("band"), (col("band_bits") * 16 + col("band")).as("__bk"))
    // labels ride only the JOIN CONDITION: the candidate stream carries
    // just (vec_id, nbr_id, ham) — anchor/neighbor labels are recovered
    // on the CAPPED set by the same joins that fetch embeddings
    // Join strategy, decided from the TRUE banded size rather than the
    // planner's estimate (which inflates through the posexplode + label
    // join and flipped this self-join to sort-merge at 10× while the
    // actual build side was 4.5 MB): under the session's broadcast
    // threshold the build side is broadcast outright; past it,
    // shuffled-hash — nothing downstream needs sort order (the
    // per-(anchor,band) heap aggregation is order-free), so the hash
    // join drops SMJ's two full sorts (ss14 10× spot: 6.5 s SMJ vs
    // 4.8 s SHUFFLE_HASH). [[hardNegativesAuto]] derives the choice
    // from the corpus count it already paid for; the bare entry point
    // keeps the planner's default.
    val y0 = banded.as("y")
    val met = banded.as("x").join(
        selfJoinHint.fold(y0)(y0.hint(_)),
        col("x.__bk") === col("y.__bk") &&
          col("x.label") =!= col("y.label"))
      .select(col("x.vec_id").as("vec_id"),
        col("y.vec_id").as("nbr_id"), col("x.band").as("band"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("__ham"))
    val idIntegral = corpus.schema("vec_id").dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val kept =
      if (cap <= 0) met.select(col("vec_id"), col("nbr_id"))
      else if (!idIntegral) {
        // non-integral ids can't ride the long-payload heap: keep the
        // window cap (any orderable type), same (ham, nbr_id) order
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy(col("vec_id"), col("band"))
          .orderBy(col("__ham"), col("nbr_id"))
        met.withColumn("__hr", row_number().over(wb))
          .filter(col("__hr") <= cap).select(col("vec_id"), col("nbr_id"))
      } else {
        // bounded-heap per (anchor, band) instead of a window (r17
        // VERDICT #6): collisions of a dense bucket are all produced
        // inside ONE join task, so the PARTIAL hash aggregate caps them
        // to `cap` rows before they ever shuffle — the window idiom
        // shuffled and SORTED the full quadratic candidate stream. Heap
        // order = (ham asc, nbr_id asc) via (-ham desc, payload asc),
        // identical to the window's ORDER BY, so the oracle replays it.
        val heap = org.apache.spark.sql.graft.CatalystBridge.column(
          graft.functions.TopKOrderedAgg(
            org.apache.spark.sql.graft.CatalystBridge.expression(
              -col("__ham").cast("double")),
            org.apache.spark.sql.graft.CatalystBridge.expression(
              col("nbr_id").cast("long")),
            cap).toAggregateExpression())
        met.groupBy(col("vec_id"), col("band"))
          .agg(heap.as("__nbrs"))
          .select(col("vec_id"), explode(col("__nbrs")).as("__nbr_long"))
          .select(col("vec_id"), col("__nbr_long")
            .cast(corpus.schema("vec_id").dataType).as("nbr_id"))
      }
    // band-level dedup BEFORE the exact rescore: a pair colliding in
    // several bands is rescored once
    val pairs = kept.dropDuplicates("vec_id", "nbr_id")
    val embLab = corpus.select(col("vec_id"), col("embedding"), col("label"))
    val scored = pairs
      .join(embLab.select(col("vec_id"), col("embedding").as("ea"),
        col("label")), "vec_id")
      .join(embLab.select(col("vec_id").as("nbr_id"), col("embedding").as("eb"),
        col("label").as("nbr_label")), "nbr_id")
      .select(col("vec_id"), col("label"), col("nbr_id"), col("nbr_label"),
        round(VectorFunctions.cosineFast(col("ea"), col("eb")), 6).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("label"), col("rank"), col("nbr_id"),
        col("nbr_label"), col("cos"))
  }

  /** [[hardNegatives]] with AUTO-SIZED bucket geometry — the
    * corpus-scale form. A fixed per-band bucket count B keeps expected
    * candidate pairs ~ bands·n²/B: hand-tuned nBits was right at one SF
    * and measured 16.4× wall at 10× data. Bits-per-band derive from
    * count(*) via [[autoBitsPerBand]] (integer-exact, so the ss14
    * oracle re-derives the SAME geometry from its own count), keeping
    * expected bucket occupancy ~targetBucket and candidate growth
    * LINEAR in n — [[lshKnnJoinAuto]]'s argument, pinned in
    * AutoLshSpec. Costs one count() over ids. */
  def hardNegativesAuto(corpus: DataFrame, k: Int, bands: Int = 4,
                        targetBucket: Int = 32, seed: Long = 42L,
                        capPerBand: Int = -1): DataFrame = {
    require(bands >= 1 && targetBucket >= 1, "bands and targetBucket must be positive")
    require(bands <= 15,
      s"bands=$bands cannot give every band the >=4 bits a 64-bit signature allows")
    val n = corpus.select(col("vec_id")).count()
    // join-strategy choice for the banded self-join, decided from the
    // count this auto-sizing already paid for: under the session's
    // broadcast threshold the planner's broadcast pick wins; above it,
    // force shuffled-hash over sort-merge (~56 B per banded row:
    // UnsafeRow header + vec_id/sig/__bk/band + a short label)
    val bcThreshold = corpus.sparkSession.sessionState.conf
      .autoBroadcastJoinThreshold
    val hint =
      if (bcThreshold >= 0 && n * bands * 56L <= bcThreshold) Some("BROADCAST")
      else Some("SHUFFLE_HASH")
    hardNegatives(corpus, k, nBits = autoBitsPerBand(n, targetBucket, bands) * bands,
      bands = bands, seed = seed, capPerBand = capPerBand,
      selfJoinHint = hint)
  }

  /** INT8 scalar quantization of an embedding column: per-vector
    * symmetric scale (max|x|/127), q_i = floor(x_i/scale + 0.5) ∈
    * [-127, 127] — the standard 4× memory cut that lets a 100 TB
    * embedding corpus keep its working set in RAM. Rounding is spelled
    * `floor(x + 0.5)` so both engines (and any future reader) agree on
    * ties, and the quantized norm is precomputed so scoring is pure
    * integer arithmetic per pair. Zero vectors quantize to all-zero at
    * scale 1 instead of dividing by zero. */
  def quantizeInt8(corpus: DataFrame): DataFrame = {
    val vd = col("embedding").cast("array<double>")
    corpus
      .select(col("vec_id"), col("embedding"),
        aggregate(vd, lit(0.0), (a, x) => greatest(a, abs(x))).as("__q_maxabs"))
      .select(col("vec_id"), col("embedding"),
        when(col("__q_maxabs") === 0.0, lit(1.0))
          .otherwise(col("__q_maxabs") / 127.0).as("qscale"))
      .select(col("vec_id"), col("qscale"),
        transform(vd, x => floor(x / col("qscale") + 0.5)).as("qvec"))
      .withColumn("qnorm",
        aggregate(col("qvec"), lit(0L), (a, x) => a + x * x))
  }

  /** Top-k by quantized cosine against one query vector: the per-vector
    * scales cancel out of the cosine, so the score is
    * intdot / (√qnorm_a · √qnorm_b) — one integer dot product per pair
    * (SIMD-friendly, no float loads) with a single float divide at the
    * end. Quality is pinned against exact brute force in
    * SimilaritySpec; ss08 replays quantization AND scoring exactly in
    * the oracle. */
  def int8TopK(corpus: DataFrame, queryId: Long, k: Int): DataFrame = {
    val qz = quantizeInt8(corpus)
    val q = qz.filter(col("vec_id") === queryId)
      .select(col("qvec").as("q_qvec"), col("qnorm").as("q_qnorm"))
    qz.join(broadcast(q))
      .select(col("vec_id"),
        round(
          when(col("qnorm") === 0L || col("q_qnorm") === 0L, lit(0.0))
            .otherwise(
              aggregate(zip_with(col("qvec"), col("q_qvec"), _ * _),
                lit(0L), (a, x) => a + x).cast("double") /
              (sqrt(col("qnorm").cast("double")) *
               sqrt(col("q_qnorm").cast("double")))), 6).as("qcos"))
      .orderBy(col("qcos").desc, col("vec_id"))
      .limit(k)
  }

  /** Seed-selection hash constants — the same splitmix-derived portable
    * quadratic family as [[Dedup.seedConsts]] (seed 2000, disjoint from
    * the minhash and simhash seed ranges), exposed so the ss03 oracle
    * SQL embeds the identical literals. */
  private[graft] val SeedP = 1000000007L
  private[graft] val SeedSelConsts: (Long, Long, Long) = Dedup.seedConsts(2000)

  /** Fixed-point scale (2^24) for the deterministic k-means cell mean:
    * one float mantissa's worth of fractional precision. Exposed so the
    * ss03 oracle SQL embeds the identical literal. */
  private[graft] val MeanScale = 16777216.0

  /** Portable order hash of a numeric id: `(A·(x² mod P) + B·x + C) mod P`
    * with x = id mod P — pure 62-bit-safe integer arithmetic a DuckDB
    * oracle replays exactly (xxhash64 was dropped for the same reason as
    * in dd02: not reproducible outside the JVM).
    *
    * Sign caveat: Spark's `pmod` is always non-negative while a plain
    * SQL `%` is sign-preserving, so for ids < 0 the two diverge unless
    * the oracle doubles the modulo (`((x % P) + P) % P`) — the ss03
    * oracle SQL does exactly that (see the "doubled modulo" note in
    * [[graft.analytics.ExtensionQueries]]). The shipped `embeddings`
    * table only has vec_id >= 0, where `pmod` == `%` and the caveat is
    * moot; any new fixture with negative ids must keep the doubled-mod
    * form on the oracle side. */
  private def seedOrderHash(id: Column): Column = {
    val (a, b, c) = SeedSelConsts
    val x = pmod(id, lit(SeedP))
    pmod(lit(a) * pmod(x * x, lit(SeedP)) + lit(b) * x + lit(c), lit(SeedP))
  }

  /** Deterministic hash-ordered sample of the corpus — the k-means seed
    * (and the whole codebook when `kmeansIters` = 0). */
  private def seedCentroids(corpus: DataFrame, nCells: Int): DataFrame =
    corpus
      .orderBy(seedOrderHash(col("vec_id")), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))

  /** Nearest `n` centroids per row of `df` under the given codebook.
    * The `n == 1` form — the FULL-CORPUS assignment pass every IVF
    * build/update/dedup runs — is an argmax by (cos desc, centroid_id
    * asc), computed as one `max_by` aggregation: partial (map-side)
    * aggregation caps the shuffle at one row per id, where the window
    * form shuffled AND sorted all |df|×|centroids| candidate rows
    * (measured: st20's buildIvfIndex 1.75 s → 1.1 s warm from this).
    * Tie-break identical to the window's ORDER BY: max of the ordering
    * struct (cos, -centroid_id) is the highest cosine, then the
    * smallest centroid id — so ss03's exact-replay oracle still
    * re-derives the same assignment. */
  private def nearestCells(df: DataFrame, centroids: DataFrame, n: Int,
                           idCol: String): DataFrame = {
    val joined = df.join(broadcast(centroids))
      .withColumn("__ccos", VectorFunctions.cosineFast(col("embedding"), col("centroid")))
    if (n == 1) {
      val outCols = df.columns :+ "centroid_id"
      joined.groupBy(col(idCol).as("__nc_id"))
        .agg(max_by(struct(outCols.map(col).toIndexedSeq: _*),
          struct(col("__ccos"), (-col("centroid_id")).as("__nc_ord"))).as("__nc"))
        .select(outCols.map(c => col(s"__nc.$c")).toIndexedSeq: _*)
    } else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("__ccos").desc, col("centroid_id"))
      joined
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= n)
        .drop("__ccos", "__rk", "centroid")
    }
  }

  /** Spherical k-means codebook: start from the hash sample, then
    * `iters` Lloyd rounds of assign-to-nearest-by-cosine + per-cell mean.
    * Cosine is scale-invariant, so the plain (unnormalized) mean IS the
    * spherical-k-means update — the average assigned cosine is
    * non-decreasing per round (pinned in SimilaritySpec). Each round is
    * one broadcast-join assignment pass plus two keyed aggregations over
    * (cell, position) — no driver-side vectors, codebook stays
    * `nCells` rows. Cells that end a round empty drop out (standard
    * k-means dropout; the probe logic is count-agnostic).
    *
    * The per-cell mean is ORDER-DETERMINISTIC without buffering the
    * cell: each float value (exact in double) is scaled by 2^24 and
    * rounded to an integer, the integers are summed as decimal(38,0) —
    * integer addition is exactly associative, so ANY shuffle/partition
    * order yields the same sum — and the mean is the sum divided back
    * down. This is a fixed-point QUANTIZED mean (error ≤ 2^-25 per
    * value, invisible after the float narrowing and irrelevant to cell
    * quality) but a bit-stable one, which is what lets the ss03 DuckDB
    * oracle replay the whole Lloyd round exactly. Unlike the earlier
    * collect_list+sorted-fold form, aggregation state is ONE decimal per
    * (cell, position) — per-group memory is O(1), so the 100 TB design
    * point (partial aggregation, no buffered cells) actually holds. The
    * decimal sum is exact up to 38 digits; the final decimal→double
    * narrowing is correctly rounded in both engines, and below ~2^29
    * members per cell the sum stays under 2^53 where that narrowing is
    * lossless. */
  /** IVF cell-count auto-sizing, the [[autoBitsPerBand]] sibling: the
    * standard sqrt(n) rule (probe cost ~ nCells + nProbe·n/nCells is
    * minimized near sqrt), clamped to [16, 65536]. Fixed nCells
    * defaults exist for oracle-replayed probe sets; a corpus-sized
    * index build should derive cells from n. */
  private[operators] def autoCells(n: Long): Int =
    math.min(65536, math.max(16, math.round(math.sqrt(n.toDouble)).toInt))

  def kmeansCentroids(corpus: DataFrame, nCells: Int = 16, iters: Int = 0): DataFrame = {
    var cent = seedCentroids(corpus, nCells)
    for (_ <- 1 to iters) {
      val assigned = nearestCells(corpus, cent, 1, "vec_id")
        .select(col("centroid_id"), col("embedding"))
      cent = assigned
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg((sum(round(col("v").cast("double") * lit(MeanScale)).cast("decimal(38,0)"))
          .cast("double") / count(lit(1)).cast("double") / lit(MeanScale)).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"),
          transform(col("pm"), s => s.getField("m").cast("float")).as("centroid"))
    }
    cent
  }

  /** MMR rerank (Maximal Marginal Relevance, Carbonell & Goldstein
    * 1998): two-stage retrieval — take the exact top-`poolK` for the
    * query, then greedily select `k` results maximizing
    * `λ·cos(q,d) − (1−λ)·max_{s∈selected} cos(d,s)` — relevance traded
    * against redundancy, the reranker RAG pipelines bolt onto ANN.
    * The greedy loop is k lazy DataFrame rounds over the ≤poolK-row
    * pool (anti-join the selected set, penalize by max pairwise
    * similarity, argmax) — no driver-side collect; at scale the pool
    * is the output of the distributed retrieval stage and is small by
    * construction. All cosines are rounded to 1e-6 BEFORE scoring and
    * ties break on vec_id, so selection is bit-reproducible and the
    * ss06 oracle unrolls the same rounds. */
  def mmrRerank(corpus: DataFrame, queryId: Long, poolK: Int, k: Int,
                lambda: Double): DataFrame = {
    require(k >= 1 && poolK >= k, s"need poolK >= k >= 1: poolK=$poolK k=$k")
    val pool = bruteForceTopK(corpus, queryId, poolK)
    val emb = corpus.select(col("vec_id"), col("embedding"))
    val poolEmb = pool.join(emb, "vec_id")
    // the pool side is <= poolK rows BY CONSTRUCTION — broadcast it
    // explicitly: size ESTIMATES on a join output can exceed the
    // auto-broadcast threshold and flip this bounded pairwise stage to
    // a partition-pair CartesianProduct (caught by ScaleBench's
    // full-suite lint; the hint makes the always-right choice static)
    val pw = poolEmb.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(broadcast(poolEmb.select(col("vec_id").as("b"), col("embedding").as("eb"))))
      .select(col("a"), col("b"),
        round(VectorFunctions.cosineFast(col("ea"), col("eb")), 6).as("sim"))
    var selected = pool.orderBy(col("cos").desc, col("vec_id")).limit(1)
      .select(lit(1).as("rank"), col("vec_id"), col("cos"),
        round(col("cos") * lambda, 6).as("mmr"))
    for (r <- 2 to k) {
      val cand = pool.join(selected.select(col("vec_id")), Seq("vec_id"), "left_anti")
      val penalty = pw
        .join(selected.select(col("vec_id").as("b")), "b")
        .groupBy(col("a").as("vec_id")).agg(max(col("sim")).as("max_sim"))
      val scored = cand.join(penalty, "vec_id")
        .select(col("vec_id"), col("cos"),
          round(col("cos") * lambda - col("max_sim") * (1.0 - lambda), 6).as("mmr"))
      selected = selected.unionByName(
        scored.orderBy(col("mmr").desc, col("vec_id")).limit(1)
          .select(lit(r).as("rank"), col("vec_id"), col("cos"), col("mmr")))
    }
    selected
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup —
    * cluster the embedding space, then WITHIN each cluster drop every
    * vector that has a >= `threshold` cosine neighbor with a smaller id
    * (greedy keep-lowest-id per ε-ball). The clusters bound the
    * quadratic: pairs are only formed within a cell, so the cost is
    * Σ cell² — at 100 TB you grow `nCells` with the corpus (the paper
    * uses ~100k clusters for web scale) and the per-cell work stays
    * constant; nothing here is ever all-pairs. Cosines are rounded to
    * 1e-6 BEFORE the threshold compare so the drop set is reproducible
    * cross-engine (the dd06 convention). Returns the KEPT vectors with
    * their cell assignment — (vec_id, centroid_id). */
  def semanticDedup(corpus: DataFrame, threshold: Double, nCells: Int = 16,
                    kmeansIters: Int = 1): DataFrame = {
    val cent = kmeansCentroids(corpus, nCells, kmeansIters)
    val assigned = nearestCells(corpus, cent, 1, "vec_id")
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    val dropped = assigned.as("x").join(assigned.as("y"),
        col("x.centroid_id") === col("y.centroid_id") &&
          col("x.vec_id") < col("y.vec_id"))
      .filter(round(VectorFunctions.cosineFast(
        col("x.embedding"), col("y.embedding")), 6) >= threshold)
      .select(col("y.vec_id").as("vec_id")).distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("centroid_id"))
  }

  /** [[semanticDedup]] with the cell count GROWN with the corpus — the
    * form its docstring prescribes for 100 TB (the paper uses ~100k
    * clusters at web scale). Per-cell pair cost is Σ cell²; a fixed
    * nCells turns that quadratic once n outgrows it (fixed 16 cells
    * measured 6.3× wall at 10× data). [[autoCells]]' sqrt(n) rule
    * keeps expected cell size ~sqrt(n), so total pair work stays
    * linear in n; the dd11 oracle re-derives the SAME count from
    * count(*) (round/sqrt agree across engines for integer n: sqrt is
    * correctly rounded IEEE and sqrt(n) is never exactly a .5 for an
    * integer n). Costs one count() over ids. */
  def semanticDedupAuto(corpus: DataFrame, threshold: Double,
                        kmeansIters: Int = 1): DataFrame = {
    val n = corpus.select(col("vec_id")).count()
    semanticDedup(corpus, threshold, nCells = autoCells(n), kmeansIters = kmeansIters)
  }

  /** IVF ANN: partition the corpus into `nCells` inverted lists by
    * nearest centroid, probe only the `nProbe` cells nearest the query,
    * exact-score within them. The part that matters at 100 TB — each
    * query touches nProbe/nCells of the data, cell assignment is a
    * narrow broadcast-join stage — is independent of codebook quality;
    * `kmeansIters` > 0 buys tighter cells via [[kmeansCentroids]]. */
  def ivfTopK(corpus: DataFrame, queryId: Long, k: Int,
              nCells: Int = 16, nProbe: Int = 4, kmeansIters: Int = 0): DataFrame = {
    val centroids = kmeansCentroids(corpus, nCells, kmeansIters)
    val assigned = nearestCells(corpus, centroids, 1, "vec_id") // each vector in 1 cell
    val qCells = nearestCells(corpus.filter(col("vec_id") === queryId), centroids, nProbe, "vec_id")
      .select(col("centroid_id"), col("embedding").as("query_embedding"))

    assigned.join(broadcast(qCells), Seq("centroid_id"))
      .select(col("vec_id"),
        round(VectorFunctions.cosineFast(col("embedding"), col("query_embedding")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Persist an IVF index as two lake tables under `indexDir` — the
    * build-once half of the 100 TB ANN story ([[ivfTopK]] rebuilds its
    * codebook inside every query; a real corpus builds the index once
    * and serves probes against it):
    *  - `codebook/`: the `nCells`-row centroid table,
    *  - `postings/`: the corpus partitioned BY CELL
    *    (`centroid_id=<id>/` parquet dirs), so a probe's nProbe cells
    *    prune to nProbe directories at planning time.
    *
    * Determinism: the codebook is written first and read BACK for the
    * posting assignment, so postings are consistent with the persisted
    * bytes by construction (parquet round-trips floats exactly, which
    * also keeps [[probeIvfIndex]] bit-equal to the in-query [[ivfTopK]]
    * — ss07 shares ss03's exact-replay oracle). */
  /** [[buildIvfIndex]] with the sqrt(n) cell count ([[autoCells]]) —
    * the corpus-sized build path; returns the derived cell count so
    * probes can size nProbe against it. */
  def buildIvfIndexAuto(corpus: DataFrame, indexDir: String,
                        kmeansIters: Int = 1): Int = {
    val cells = autoCells(corpus.select(col("vec_id")).count())
    buildIvfIndex(corpus, indexDir, cells, kmeansIters)
    cells
  }

  def buildIvfIndex(corpus: DataFrame, indexDir: String, nCells: Int = 16,
                    kmeansIters: Int = 1): Unit = {
    val spark = corpus.sparkSession
    kmeansCentroids(corpus, nCells, kmeansIters)
      .write.mode("overwrite").parquet(s"$indexDir/codebook")
    val codebook = spark.read.parquet(s"$indexDir/codebook")
    val posts = nearestCells(corpus, codebook, 1, "vec_id")
    posts
      .repartition(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$indexDir/postings")
    // persist the postings schema: inference fails on an index whose
    // EVERY cell was later emptied (a TRUNCATE flowing through CDC
    // maintenance deletes all posting files), and probing an empty
    // index must return zero rows, not crash on schema inference
    val sp = new org.apache.hadoop.fs.Path(s"$indexDir/postings_schema.ddl")
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    writeSidecarAtomic(fs, indexDir, sp, posts.schema.toDDL, overwrite = true)
  }

  /** Stage-and-rename sidecar publish (the commit log's discipline):
    * a crash mid-write leaves no partial DDL, only an invisible tmp.
    * `overwrite` deletes an existing destination first — on filesystems
    * whose rename refuses an existing target (HDFS), a rebuild into an
    * existing index dir would otherwise silently keep the STALE schema
    * (rename fails, tmp deleted, reads bind to the old DDL). The
    * backfill/repair path passes false: create-if-absent is the point
    * there, and a racer's just-published sidecar must survive. */
  private def writeSidecarAtomic(fs: org.apache.hadoop.fs.FileSystem,
                                 indexDir: String,
                                 dst: org.apache.hadoop.fs.Path,
                                 ddl: String,
                                 overwrite: Boolean): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(
      s"$indexDir/.postings_schema.ddl.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(ddl.getBytes("UTF-8")) finally out.close()
    if (overwrite && fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) fs.delete(tmp, false)
  }

  /** Postings read bound to the schema persisted at build time —
    * schema-stable even when zero posting files remain. Legacy indexes
    * without the sidecar fall back to inference. */
  private def readPostings(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String): DataFrame = {
    val sp = new org.apache.hadoop.fs.Path(s"$indexDir/postings_schema.ddl")
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(sp)) {
      val in = fs.open(sp)
      val ddl = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
        .parquet(s"$indexDir/postings")
    } else spark.read.parquet(s"$indexDir/postings")
  }

  /** INCREMENTAL index maintenance: fold adds/removes into a persisted
    * [[buildIvfIndex]] index WITHOUT rebuilding — the codebook is
    * immutable (rebuild-free serving is the point; re-clustering is a
    * separate, rarer event), new vectors assign to their nearest
    * existing cell, and ONLY the touched cells' posting directories are
    * rewritten (dynamic partition overwrite — the same touched-partition
    * discipline as [[graft.lake.TxnLake.upsert]]). At 100 TB this is
    * how an embedding index tracks a mutating corpus: work scales with
    * the delta ([[graft.lake.TxnLake.changes]] feeds it directly),
    * never the index. */
  def updateIvfIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                     adds: DataFrame, removeIds: DataFrame): Unit = {
    val codebook = spark.read.parquet(s"$indexDir/codebook")
    val postings = readPostings(spark, indexDir)
    // opportunistic sidecar backfill for a pre-sidecar index: this is
    // the last moment the schema is still inferable (this very update
    // may empty the final cell, after which a sidecar-less index can
    // never be read again)
    val sidecarP = new org.apache.hadoop.fs.Path(s"$indexDir/postings_schema.ddl")
    val sidecarFs = sidecarP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sidecarFs.exists(sidecarP))
      writeSidecarAtomic(sidecarFs, indexDir, sidecarP, postings.schema.toDDL,
        overwrite = false)
    val newPost = nearestCells(adds, codebook, 1, "vec_id")
    val rm = removeIds.select(col("vec_id").as("__rm_id"))
    val touchedCells = newPost.select(col("centroid_id"))
      .union(postings.join(rm, col("vec_id") === col("__rm_id"), "left_semi")
        .select(col("centroid_id")))
      .distinct().collect().map(_.getLong(0))
    if (touchedCells.isEmpty) return
    // align on the postings schema: the corpus may carry payload columns
    // beyond (vec_id, embedding) and they persist in the postings
    val rewritten = postings.filter(col("centroid_id").isin(touchedCells.toIndexedSeq: _*))
      .join(rm, col("vec_id") === col("__rm_id"), "left_anti")
      .unionByName(newPost.select(postings.columns.map(col).toIndexedSeq: _*))
    // dynamic overwrite only replaces partitions PRESENT in the write,
    // so a touched cell emptied by removes needs its stale directory
    // dropped explicitly — and `live` must be computed BEFORE the
    // overwrite invalidates the lazy plan's input files
    val live = rewritten.select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try rewritten.repartition(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$indexDir/postings")
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (touchedCells.toSet -- live).foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/postings/centroid_id=$c"), true)
    }
    // drop the cached file listing: later reads of the same path must
    // see the rewritten files, not the pre-update listing
    spark.catalog.refreshByPath(s"$indexDir/postings")
  }

  /** Serve ANN probes against a persisted [[buildIvfIndex]] index — no
    * k-means, no corpus scan. `queries` is a `(qid, embedding)` frame
    * (any number of query vectors). The probed cell ids are collected
    * (metadata-scale: queries × nProbe longs) and pushed as a static
    * `isin` partition filter, so the scan touches only the probed
    * cells' directories; the query embeddings themselves stay
    * distributed and broadcast-join against the pruned postings.
    * Output: (qid, vec_id, cos), top-k per query.
    *
    * `where` is an optional PRE-FILTER over the postings' payload
    * columns (FILTERED ANN — "nearest neighbors among rows satisfying a
    * metadata predicate", the retrieval shape RAG stacks need). It
    * composes with the cell pruning: the predicate applies INSIDE the
    * probed cells, pushed down to their parquet scan, so candidate
    * generation never materializes non-matching rows — unlike
    * post-filtering a plain top-k, which starves below k whenever the
    * unfiltered neighborhood is dominated by non-matching rows.
    * Pre-filtering preserves the IVF contract exactly: the result is
    * the TRUE filtered top-k of the probed cells; recall against the
    * whole corpus is governed by nProbe, same as the unfiltered probe
    * (widen it when the predicate is very selective). */
  def probeIvfIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                    queries: DataFrame, k: Int = 10, nProbe: Int = 4,
                    where: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codebook = spark.read.parquet(s"$indexDir/codebook")
    val postings = readPostings(spark, indexDir)
    val qCells = nearestCells(queries, codebook, nProbe, "qid")
      .select(col("qid"), col("centroid_id"), col("embedding").as("query_embedding"))
    val cellIds = qCells.select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val pruned = postings.filter(col("centroid_id").isin(cellIds.toIndexedSeq: _*))
    where.fold(pruned)(pruned.filter)
      .join(broadcast(qCells), Seq("centroid_id"))
      .select(col("qid"), col("vec_id"),
        round(VectorFunctions.cosineFast(col("embedding"), col("query_embedding")), 6).as("cos"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Explode a corpus into its `m` PQ subspace slices:
    * (idCol, sub ∈ [0,m), v = the sub'th dim/m-wide slice, as doubles).
    * Vectors whose width `m` does not divide fail loudly per row —
    * silently ragged slices would corrupt every downstream code. */
  private def pqSubspaces(df: DataFrame, m: Int, idCol: String): DataFrame = {
    val guarded = df.filter(
      when(pmod(size(col("embedding")), lit(m)) === 0, lit(true))
        .otherwise(raise_error(concat(
          lit("embedding dim "), size(col("embedding")),
          lit(s" not divisible into $m PQ subspaces")))))
    // Column `/` on ints is a DOUBLE divide; the guard above makes it
    // exact, but slice() needs int operands — cast back down
    val sd = (size(col("embedding")) / lit(m)).cast("int")
    guarded.select(col(idCol),
        explode(transform(sequence(lit(0), lit(m - 1)),
          s => struct(s.as("sub"),
            slice(col("embedding"), s * sd + 1, sd).cast("array<double>").as("v"))))
          .as("__pq"))
      .select(col(idCol), col("__pq.sub").as("sub"), col("__pq.v").as("v"))
  }

  /** PRODUCT-QUANTIZATION codebook (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): the vector space splits
    * into `m` orthogonal subspaces and each gets its own `ksub`-entry
    * codebook, so a D-dim float vector compresses to `m` small codes —
    * (ksub)^m virtual centroids from m·ksub stored ones, the memory
    * layout billion-vector ANN serving actually uses (16-32 bytes per
    * vector instead of 4·D).
    *
    * Codewords are the subspace slices of a deterministic hash-ordered
    * corpus sample (the [[seedCentroids]] discipline; `code` = rank in
    * hash order so both engines number identically). Output:
    * (sub, code, centroid) — m·ksub narrow rows, broadcast-sized by
    * construction. */
  def pqCodebook(corpus: DataFrame, m: Int = 4, ksub: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ordered = Window.orderBy(seedOrderHash(col("vec_id")), col("vec_id"))
    // the window runs AFTER the limit — ksub rows, single tiny partition
    val seeds = corpus
      .orderBy(seedOrderHash(col("vec_id")), col("vec_id")).limit(ksub)
      .withColumn("code", row_number().over(ordered) - 1)
    pqSubspaces(seeds, m, "code")
      .select(col("sub"), col("code"), col("v").as("centroid"))
  }

  /** Encode every vector as `m` codes: per subspace, the codeword with
    * the smallest L2² distance (ties break on code — both engines agree).
    * One broadcast join against the m·ksub codebook, narrow per-row math,
    * then a (vec_id, sub)-partitioned rank — nothing here is ever
    * all-pairs, and the output is the 100 TB-resident form: m small ints
    * per vector. */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, m: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("__l2"), col("code"))
    pqSubspaces(corpus, m, "vec_id")
      .join(broadcast(codebook), "sub")
      .withColumn("__l2",
        aggregate(zip_with(col("v"), col("centroid"), (x, y) => (x - y) * (x - y)),
          lit(0.0), _ + _))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("vec_id"), col("sub"), col("code"))
  }

  /** Asymmetric-distance (ADC) top-k by inner product: the query stays
    * EXACT while the corpus is its PQ codes — score(v) = Σ_s
    * LUT[s, code_s(v)] where LUT is the m·ksub table of query-slice ·
    * codeword dots, computed once per query. Per corpus vector the scan
    * does m table lookups and an m-term sum: no float vector is ever
    * read, which is the entire point at 100 TB (codes live in RAM,
    * embeddings stay on disk for optional rescoring). The m partial
    * scores fold in fixed subspace order (sorted struct array), so the
    * sum is bit-reproducible and ss09's oracle replays it exactly. */
  def pqTopK(corpus: DataFrame, queryId: Long, k: Int,
             m: Int = 4, ksub: Int = 8): DataFrame = {
    val cb = pqCodebook(corpus, m, ksub)
    val codes = pqEncode(corpus, cb, m)
    val lut = pqSubspaces(corpus.filter(col("vec_id") === queryId), m, "vec_id")
      .join(broadcast(cb), "sub")
      .select(col("sub"), col("code"),
        aggregate(zip_with(col("v"), col("centroid"), _ * _), lit(0.0), _ + _).as("d"))
    codes.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("d")))).as("__ds"))
      .select(col("vec_id"),
        round(aggregate(transform(col("__ds"), s => s.getField("d")),
          lit(0.0), _ + _), 6).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-PQ (Jégou et al. 2011, the FAISS `IVFx,PQy` layout): the coarse
    * quantizer ([[kmeansCentroids]]) routes vectors to cells, the
    * RESIDUAL v − centroid is PQ-encoded, and probes score only the
    * nProbe nearest cells with a PER-CELL ADC table built from the
    * query's own residual against that cell. Residual encoding is what
    * makes the composition worth having: residuals are centered near
    * zero, so the shared m·ksub codebook spends its codes on the
    * deviation that distinguishes neighbors, not on cell-level offsets
    * the coarse index already captured.
    *
    * Scale shape: everything rides the existing pieces — broadcast
    * codebooks, narrow code rows (m small ints per vector in RAM),
    * candidate set = probed cells only, LUT join keyed on
    * (cell, sub, code). The scan never touches a float vector. */
  def ivfPqTopK(corpus: DataFrame, queryId: Long, k: Int,
                nCells: Int = 16, kmeansIters: Int = 1, nProbe: Int = 4,
                m: Int = 4, ksub: Int = 8): DataFrame = {
    val cents = kmeansCentroids(corpus, nCells, kmeansIters)
    val assigned = nearestCells(corpus, cents, 1, "vec_id")
    val residuals = assigned.join(broadcast(cents), "centroid_id")
      .select(col("vec_id"), col("centroid_id"),
        zip_with(col("embedding").cast("array<double>"),
          col("centroid").cast("array<double>"), _ - _).as("embedding"))
    val cb = pqCodebook(residuals.select(col("vec_id"), col("embedding")), m, ksub)
    val codes = pqEncode(residuals.select(col("vec_id"), col("embedding")), cb, m)
      .join(residuals.select(col("vec_id"), col("centroid_id")), "vec_id")
    val qRes = nearestCells(corpus.filter(col("vec_id") === queryId), cents, nProbe, "vec_id")
      .join(broadcast(cents), "centroid_id")
      .select(col("centroid_id"),
        zip_with(col("embedding").cast("array<double>"),
          col("centroid").cast("array<double>"), _ - _).as("embedding"))
    val lut = pqSubspaces(qRes, m, "centroid_id")
      .join(broadcast(cb), "sub")
      .select(col("centroid_id"), col("sub"), col("code"),
        aggregate(zip_with(col("v"), col("centroid"), _ * _), lit(0.0), _ + _).as("d"))
    codes.join(broadcast(lut), Seq("centroid_id", "sub", "code"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("d")))).as("__ds"))
      .select(col("vec_id"),
        round(aggregate(transform(col("__ds"), s => s.getField("d")),
          lit(0.0), _ + _), 6).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(k)
  }

  /** Embedding near-duplicate pairs: banded hyperplane-LSH candidates +
    * exact cosine confirm.
    *
    * Exact-signature bucketing would miss true near-dups: a pair at
    * cosine 0.99 (~8°) flips at least one of 16 hyperplanes with
    * probability ≈ 1-(1-8/180)^16 ≈ 0.52. Banding into 4-bit bands needs
    * agreement on only one band: miss probability ≈ (1-(1-θ/π)^4)^4 ≈
    * 0.03 at θ=8° — candidates stay cheap (bands are selective for
    * unrelated vectors) while near-dups almost always collide somewhere. */
  def cosineNearDups(corpus: DataFrame, threshold: Double = 0.99,
                     nBits: Int = 16, bands: Int = 4, seed: Long = 42L): DataFrame = {
    // candidate generation over NARROW rows: a pair colliding in several
    // bands would otherwise drag its two embedding arrays through the
    // dedup shuffle once per collision — dedup 16-byte id pairs instead,
    // then join the embeddings back for the exact confirm (candidate
    // volume × vector width is the term that explodes at 100 TB)
    val banded = bandedSignatures(corpus, nBits, bands, seed)
      .select(col("vec_id"), col("band"), col("band_bits"))
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_bits") === col("y.band_bits") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    val emb = corpus.select(col("vec_id"), col("embedding"))
    pairs
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
      // filter on the RAW cosine, round only for display — the DuckDB
      // differential oracle (dd06) filters raw too; filtering the rounded
      // value would keep boundary pairs (cos in [threshold-5e-7,
      // threshold)) that the oracle rejects
      .select(col("vec_a"), col("vec_b"),
        VectorFunctions.cosineFast(col("ea"), col("eb")).as("__raw"))
      .filter(col("__raw") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("__raw"), 6).as("cos"))
  }

  /** [[cosineNearDups]] with AUTO-SIZED bucket geometry — the 100 TB
    * form. Fixed 4-bit bands keep expected candidate pairs ~ bands·n²/B
    * (measured 11.8× wall at 10× data); deriving bits-per-band from
    * count(*) ([[autoBitsPerBand]]) holds candidate growth LINEAR in n.
    * Recall: a TRUE near-dup at the 0.99 threshold regime still
    * collides in some band with probability ≥ 1-(1-(1-θ/π)^15)^bands
    * even at the 15-bit/band cap (≈ 0.93 at θ=8°, and exact copies —
    * the dedup target class — collide with probability 1 under ANY
    * geometry: identical vectors hash identically). The dd06 oracle is
    * DIFFERENTIAL (exact all-pairs cosine), so geometry never enters
    * the oracle SQL. Costs one count() over ids. */
  def cosineNearDupsAuto(corpus: DataFrame, threshold: Double = 0.99,
                         bands: Int = 4, targetBucket: Int = 32,
                         seed: Long = 42L): DataFrame = {
    require(bands >= 1 && targetBucket >= 1, "bands and targetBucket must be positive")
    require(bands <= 15,
      s"bands=$bands cannot give every band the >=4 bits a 64-bit signature allows")
    val n = corpus.select(col("vec_id")).count()
    cosineNearDups(corpus, threshold,
      nBits = autoBitsPerBand(n, targetBucket, bands) * bands,
      bands = bands, seed = seed)
  }
}
