package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AUTO-SIZED LSH geometry ([[Similarity.lshKnnJoinAuto]]): with B
  * buckets per band, candidate pairs grow ~ n²/B — a fixed B is
  * quadratic in corpus size; sizing B with n keeps growth linear.
  * These tests pin the contract the docstring sells: the derived bit
  * widths, the near-linear candidate growth on a 4× corpus (vs ~16×
  * under fixed geometry), and output-shape sanity of the auto variant. */
class AutoLshSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  /** Deterministic spread-out vectors: 16 dims of mixed-frequency
    * sines — sign patterns vary per id, so buckets fill ~uniformly. */
  private def synth(n: Int): DataFrame =
    spark.range(n.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        d => sin(col("id").cast("double") * (d.cast("double") * 0.37 + 1.1) +
          d.cast("double") * 2.3).cast("float")).as("embedding"))

  test("derived bits: bucket count tracks n/targetBucket, clamped to one long") {
    assert(Similarity.autoBitsPerBand(1000L, 32, 4) === 5)   // ceil(log2(31.25))
    assert(Similarity.autoBitsPerBand(4000L, 32, 4) === 7)   // ceil(log2(125))
    assert(Similarity.autoBitsPerBand(10L, 32, 4) === 4)     // floor clamp
    assert(Similarity.autoBitsPerBand(1L << 40, 32, 4) === 15) // 63/bands cap
  }

  test("4x the corpus costs ~4x candidates auto-sized, ~16x under fixed geometry") {
    val small = synth(1000).cache(); small.count()
    val big = synth(4000).cache(); big.count()
    try {
      val fixedRatio =
        Similarity.candidatePairs(big, 16, 4, 42L).count().toDouble /
          Similarity.candidatePairs(small, 16, 4, 42L).count()
      val autoRatio =
        Similarity.candidatePairs(big, Similarity.autoBitsPerBand(4000L, 32, 4) * 4, 4, 42L).count().toDouble /
          Similarity.candidatePairs(small, Similarity.autoBitsPerBand(1000L, 32, 4) * 4, 4, 42L).count()
      assert(fixedRatio > 8.0,
        f"fixed 16-bucket-per-band geometry should go ~quadratic (got $fixedRatio%.1fx)")
      assert(autoRatio < fixedRatio / 2.0 && autoRatio < 8.0,
        f"auto geometry must hold candidate growth near-linear (got $autoRatio%.1fx vs fixed $fixedRatio%.1fx)")
    } finally { small.unpersist(); big.unpersist(); () }
  }

  test("band counts that cannot fit 4 bits per band in one long are rejected") {
    // 63/64 = 0 bits per band would put EVERY vector in bucket 0 —
    // the quadratic blowup the auto variant exists to prevent
    val e = intercept[IllegalArgumentException](
      Similarity.lshKnnJoinAuto(synth(100), k = 3, bands = 64))
    assert(e.getMessage.contains("64-bit signature"))
    intercept[IllegalArgumentException](
      Similarity.lshKnnJoinAuto(synth(100), k = 3, bands = 16))
  }

  test("IVF auto cells follow the sqrt(n) rule with clamps") {
    assert(Similarity.autoCells(100L) === 16)        // floor clamp
    assert(Similarity.autoCells(10000L) === 100)     // sqrt
    assert(Similarity.autoCells(1000000L) === 1000)
    assert(Similarity.autoCells(1L << 40) === 65536) // ceiling clamp
  }

  test("buildIvfIndexAuto builds a servable index with derived cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_autoivf").toString
    val corpus = synth(400)
    val cells = Similarity.buildIvfIndexAuto(corpus, dir)
    assert(cells === 20) // sqrt(400)
    val q = corpus.filter(col("vec_id") === 7L)
      .select(col("vec_id").as("qid"), col("embedding"))
    val got = Similarity.probeIvfIndex(spark, dir, q, k = 3, nProbe = 4)
    assert(got.count() === 3)
  }

  test("lshKnnAcrossAuto sizes by the larger side and returns at most k per query") {
    val corpus = synth(1000).cache(); corpus.count()
    val q = synth(80).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    try {
      // geometry must follow max(|Q|, |C|) = 1000 → 5-bit bands, the
      // same derivation lshKnnJoinAuto pins above
      assert(Similarity.autoBitsPerBand(1000L, 32, 4) === 5)
      val out = Similarity.lshKnnAcrossAuto(q, corpus, k = 3).cache()
      try {
        val perQ = out.groupBy(col("qid")).agg(count(lit(1)).as("m"),
          max(col("rank")).as("mr"))
        assert(perQ.filter(col("m") > 3 || col("mr") > 3).isEmpty)
        assert(out.count() > 0)
        // exact-replay parity with the explicit-geometry form
        val fixed = Similarity.lshKnnAcross(q, corpus, k = 3, nBits = 20)
        assert(out.except(fixed).isEmpty && fixed.except(out).isEmpty)
      } finally { out.unpersist(); () }
    } finally { corpus.unpersist(); () }
  }

  test("hardNegativesAuto / cosineNearDupsAuto / semanticDedupAuto equal their explicit forms") {
    // the auto variants must be pure geometry derivations — bit-equal
    // to the explicit form at the derived constants (the property that
    // lets the oracles re-derive the same geometry from count(*))
    val corpus = synth(1000).cache(); corpus.count()
    val labeled = corpus.withColumn("label",
      pmod(col("vec_id"), lit(4)).cast("string")).cache(); labeled.count()
    try {
      val bits = Similarity.autoBitsPerBand(1000L, 32, 4) * 4 // = 20
      val hnAuto = Similarity.hardNegativesAuto(labeled, k = 3)
      val hnFixed = Similarity.hardNegatives(labeled, k = 3, nBits = bits)
      assert(hnAuto.except(hnFixed).isEmpty && hnFixed.except(hnAuto).isEmpty)
      assert(hnAuto.filter(col("label") === col("nbr_label")).isEmpty,
        "a hard negative must always carry a different label")
      val ndAuto = Similarity.cosineNearDupsAuto(corpus, threshold = 0.9)
      val ndFixed = Similarity.cosineNearDups(corpus, threshold = 0.9, nBits = bits)
      assert(ndAuto.except(ndFixed).isEmpty && ndFixed.except(ndAuto).isEmpty)
      val sdAuto = Similarity.semanticDedupAuto(corpus, threshold = 0.999)
      val sdFixed = Similarity.semanticDedup(corpus, threshold = 0.999,
        nCells = Similarity.autoCells(1000L))
      assert(sdAuto.except(sdFixed).isEmpty && sdFixed.except(sdAuto).isEmpty)
    } finally { corpus.unpersist(); labeled.unpersist(); () }
  }

  test("hardNegatives: int ids ride the heap via cast, string ids take the window fallback") {
    // the bounded-heap cap carries Long payloads: integral ids cast
    // through it (and back), non-integral ids route through the window
    // cap — both with results identical to the long-id path
    val corpus = synth(600)
    val labeled = corpus.withColumn("label",
      pmod(col("vec_id"), lit(3)).cast("string"))
    val asLong = Similarity.hardNegatives(labeled, k = 2, nBits = 12)
    val asInt = Similarity.hardNegatives(
      labeled.withColumn("vec_id", col("vec_id").cast("int")), k = 2, nBits = 12)
      .withColumn("vec_id", col("vec_id").cast("long"))
      .withColumn("nbr_id", col("nbr_id").cast("long"))
    assert(asLong.except(asInt).isEmpty && asInt.except(asLong).isEmpty,
      "int-typed ids must produce the same negatives through the heap cast")
    val asStr = Similarity.hardNegatives(
      labeled.withColumn("vec_id", col("vec_id").cast("string")), k = 2, nBits = 12)
    assert(asStr.count() > 0, "string ids must not crash (window fallback)")
  }

  test("lshKnnJoinAuto returns at most k ranked neighbors per vector") {
    val out = Similarity.lshKnnJoinAuto(synth(500), k = 3).cache()
    try {
      val perVec = out.groupBy(col("vec_id")).agg(count(lit(1)).as("m"),
        max(col("rank")).as("mr"))
      assert(perVec.filter(col("m") > 3 || col("mr") > 3).isEmpty)
      assert(out.count() > 0)
    } finally { out.unpersist(); () }
  }
}
