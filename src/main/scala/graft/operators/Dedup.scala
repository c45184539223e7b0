package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, smallest-to-
  * largest hammer: exact (hash group), MinHash+LSH banding, SimHash with
  * chunk-bucketed Hamming candidates, exact n-gram Jaccard.
  *
  * Scale design: every stage is a narrow map or a key-partitioned
  * shuffle (doc_id, (band, key), shingle). Nothing ever materializes the
  * O(n²) pair space — candidate pairs only surface through bucket
  * collisions, which is the entire point of LSH at 100 TB. Signatures are
  * built with higher-order functions (one pass per document, no
  * cross-join against a seed table).
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

  /** Per-seed shingle hash, non-negative. */
  private def shingleHash(shingle: Column, seed: Column): Column =
    pmod(xxhash64(concat(seed.cast("string"), lit(":"), shingle)), lit(Long.MaxValue))

  /** MinHash signatures: one row per (doc_id, seed) with the min hash
    * over the doc's distinct shingles. Layout is tall (not an array
    * column) so banding and estimation are plain aggregations. */
  def minhashSignatures(docs: DataFrame, numHashes: Int, shingleWidth: Int): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(TextFunctions.shingles(col("text"), shingleWidth))).as("shingle"))
    // per shingle: array of numHashes hashes, exploded to (doc, seed, h)
    val seeded = sh.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(numHashes - 1)),
        s => shingleHash(col("shingle"), s))).as(Seq("seed", "h")))
    seeded.groupBy(col("doc_id"), col("seed")).agg(min(col("h")).as("minhash"))
  }

  /** LSH banding: (doc_id, band, band_key) where band_key fingerprints
    * the band's minhashes in seed order. */
  def lshBands(signatures: DataFrame, seedsPerBand: Int): DataFrame =
    signatures
      .groupBy(col("doc_id"), (col("seed") / lit(seedsPerBand)).cast("int").as("band"))
      .agg(xxhash64(concat_ws(":",
        transform(array_sort(collect_list(struct(col("seed"), col("minhash")))),
          s => s.getField("minhash").cast("string")))).as("band_key"))

  /** Candidate pairs = docs sharing any LSH band bucket; estimated
    * Jaccard = fraction of matching minhash components. Returns
    * (doc_a, doc_b, est_jaccard) with doc_a < doc_b, filtered to
    * `threshold`. */
  def minhashNearDups(docs: DataFrame, numHashes: Int = 8, shingleWidth: Int = 3,
                      seedsPerBand: Int = 2, threshold: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(docs, numHashes, shingleWidth)
    val bands = lshBands(sigs, seedsPerBand)
    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val est = candidates
      .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sigs.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.seed") === col("sb.seed"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg((sum(when(col("sa.minhash") === col("sb.minhash"), 1).otherwise(0)).cast("double") /
        count(lit(1)).cast("double")).as("est_jaccard"))
    est.filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** 64-bit SimHash of the token stream, one HOF pass: per-token hash
    * votes ±1 on each bit, sign of the tally sets the bit. */
  def simhash(text: Column): Column = {
    val bitsOf: Column => Column = t =>
      transform(sequence(lit(0), lit(63)),
        k => when(call_function("shiftright", xxhash64(t), k).bitwiseAND(lit(1L)) === 1L, 1)
          .otherwise(-1))
    val counters = aggregate(
      TextFunctions.tokens(text),
      transform(sequence(lit(0), lit(63)), _ => lit(0)),
      (acc, t) => zip_with(acc, bitsOf(t), _ + _))
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)),
        (c, k) => when(c > 0, call_function("shiftleft", lit(1L), k)).otherwise(lit(0L))),
      lit(0L), _ + _)
  }

  /** SimHash near-dup pairs: candidates must share at least one of four
    * 16-bit signature chunks (Hamming-LSH), then exact Hamming distance
    * <= maxDistance confirms. */
  def simhashNearDups(docs: DataFrame, maxDistance: Int = 8): DataFrame = {
    val sigs = docs.select(col("doc_id"), simhash(col("text")).as("sig"))
    val chunks = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("sig"), c * lit(16)).bitwiseAND(lit(0xFFFFL))))
        .as(Seq("chunk", "chunk_val")))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** Exact n-gram Jaccard on LSH-free candidates: pairs sharing at least
    * one shingle (inverted-index join on the shingle key), exact
    * |A∩B| / |A∪B| >= threshold. The shingle join IS the blocking — at
    * scale you'd MinHash first and use this as the confirm stage. */
  def ngramJaccardDups(docs: DataFrame, shingleWidth: Int = 3,
                       threshold: Double = 0.6): DataFrame = {
    val sh = docs.select(col("doc_id"),
        explode(array_distinct(TextFunctions.shingles(col("text"), shingleWidth))).as("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val common = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_common").cast("double") /
          (col("za.n_shingles") + col("zb.n_shingles") - col("n_common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
