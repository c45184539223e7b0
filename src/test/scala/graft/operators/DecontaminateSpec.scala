package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different words here nothing shared at all"),
    (3L, "the quick brown fox sat still all day long"),
    (4L, "short doc")).toDF("doc_id", "text")

  private lazy val evalSet = Seq(
    (100L, "the quick brown fox jumps far away")).toDF("doc_id", "text")

  test("overlaps counts distinct shared shingles per document") {
    val hits = Decontaminate.overlaps(corpus, evalSet, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // eval 3-grams: {the quick brown, quick brown fox, brown fox jumps, fox jumps far, jumps far away}
    assert(hits(1L) === 3L, "doc 1 shares the first three shingles")
    assert(hits(3L) === 2L, "doc 3 shares only 'the quick brown'/'quick brown fox'")
    assert(!hits.contains(2L), "no shared shingles -> no row")
    assert(!hits.contains(4L), "docs shorter than n shingle to nothing")
  }

  test("minShared filters low-overlap documents") {
    val hits = Decontaminate.overlaps(corpus, evalSet, "doc_id", "text", n = 3,
      minShared = 3L).collect().map(_.getLong(0)).toSet
    assert(hits === Set(1L))
  }

  test("repeated shingles count once (set semantics on both sides)") {
    val loopCorpus = Seq((7L, "a b c a b c a b c")).toDF("doc_id", "text")
    val loopEval = Seq((8L, "a b c a b c")).toDF("doc_id", "text")
    val hits = Decontaminate.overlaps(loopCorpus, loopEval, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // distinct 3-grams of both: {a b c, b c a, c a b} -> 3 shared, not 7x4
    assert(hits(7L) === 3L)
  }

  test("clean removes exactly the contaminated documents") {
    val kept = Decontaminate.clean(corpus, evalSet, "doc_id", "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 4L))
  }

  test("eval side is planned as a broadcast join") {
    val plan = Decontaminate.overlaps(corpus, evalSet, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
