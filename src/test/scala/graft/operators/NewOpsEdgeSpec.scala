package graft.operators

import graft.SparkTestSession
import graft.lake.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior of the round-8 operators: empty frames,
  * out-of-range coordinates, self-loops, unreachable thresholds. These
  * pin the CONTRACT at the edges a 100 TB pipeline will eventually hit
  * (empty partitions after a filter, ids past the encoding width), so a
  * refactor can't silently turn them into crashes or wrong answers. */
class NewOpsEdgeSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("PageRank: empty edge set yields an empty result, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(PageRank.ranks(empty, 3).count() === 0)
  }

  test("PageRank: self-loops feed rank back without breaking the fixed point") {
    // node 1 keeps its whole outflow; node 2 only jumps after round 1
    val r = PageRank.ranks(Seq((1L, 1L), (2L, 1L)).toDF("src", "dst"), 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2) === 150000L, "no inflow after round 1 => exactly the jump")
    assert(r(1) > 1000000L, "self-loop + external inflow accumulates above start")
  }

  test("ZOrder: coordinates past 16 bits are masked, as documented") {
    val m = spark.range(1).select(
      ZOrder.mortonCode(lit(65536L + 123L), lit(77L)).as("a"),
      ZOrder.mortonCode(lit(123L), lit(77L)).as("b")).head()
    assert(m.getLong(0) === m.getLong(1),
      "high bits beyond the 16-bit payload must not leak into the curve key")
  }

  test("bloomMembership: empty corpus rejects every probe; empty probes yield nothing") {
    val corpus = Seq.empty[Long].toDF("fp")
    val probes = Seq((1L, 42L), (2L, 99L)).toDF("doc_id", "fp")
    val got = Dedup.bloomMembership(corpus, probes).collect()
    assert(got.length === 2 && got.forall(!_.getBoolean(2)),
      "an empty filter has no set bits, so nothing can pass")
    assert(Dedup.bloomMembership(probes.select(col("fp")),
      Seq.empty[(Long, Long)].toDF("doc_id", "fp")).count() === 0)
  }

  test("semanticDedup: unreachable threshold drops nothing, keeps every cell assignment") {
    val e = graft.Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val kept = Similarity.semanticDedup(e, threshold = 1.000001)
    assert(kept.count() === e.count(), "cosine can never exceed 1")
  }

  test("lshKnnJoin: a single-vector corpus has no neighbors") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).limit(1)
    assert(Similarity.lshKnnJoin(e, k = 3).count() === 0)
  }
}
