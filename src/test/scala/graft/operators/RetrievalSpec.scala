package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite with SparkTestSession {

  test("bm25: term-bearing docs only; higher tf wins at equal length; shorter doc wins at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark pad1 pad2 pad3"), // tf=3, dl=6
      (2L, "spark pad1 pad2 pad3 pad4 pad5"),   // tf=1, dl=6
      (3L, "spark pad1"),                        // tf=1, dl=2 (shorter)
      (4L, "pad1 pad2 pad3 pad4 pad5 pad6"))     // no term: absent
      .toDF("doc_id", "text")
    val got = Retrieval.bm25Scores(docs, Seq("spark")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!got.contains(4L))
    assert(got(1L) > got(2L), "tf=3 must beat tf=1 at equal length")
    assert(got(3L) > got(2L), "shorter doc must beat longer at equal tf (length norm)")
    assert(got.values.forall(_ > 0.0), "Lucene-style idf never goes negative")
  }

  test("bm25: multi-term scores are the sum of per-term scores (ordered fold)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta pad pad"),
      (2L, "alpha pad pad pad"),
      (3L, "beta pad pad pad")).toDF("doc_id", "text")
    def scores(ts: Seq[String]) = Retrieval.bm25Scores(docs, ts).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val both = scores(Seq("alpha", "beta"))
    val a = scores(Seq("alpha"))
    val b = scores(Seq("beta"))
    assert(math.abs(both(1L) - (a(1L) + b(1L))) < 2e-6)
    assert(both(2L) === a(2L) && both(3L) === b(3L))
  }

  test("rrf: agreement across rankings dominates a single high rank") {
    import spark.implicits._
    // doc 10 is rank 2 in BOTH lists; doc 20 is rank 1 in one only
    val r1 = Seq((20L, 1), (10L, 2), (30L, 3)).toDF("doc_id", "rank")
    val r2 = Seq((40L, 1), (10L, 2), (50L, 3)).toDF("doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq("a" -> r1, "b" -> r2), k = 5).collect()
    assert(fused.head.getLong(0) === 10L,
      "1/62 + 1/62 > 1/61: the doc both rankings agree on must win")
    val scores = fused.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("rrf is deterministic and tie-breaks on doc_id") {
    import spark.implicits._
    val r1 = Seq((5L, 1), (6L, 2)).toDF("doc_id", "rank")
    val r2 = Seq((6L, 1), (5L, 2)).toDF("doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq("a" -> r1, "b" -> r2), k = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // symmetric ranks -> equal scores -> doc_id ascending
    assert(fused.map(_._1) === Seq(5L, 6L))
    assert(fused(0)._2 === fused(1)._2)
  }
}
