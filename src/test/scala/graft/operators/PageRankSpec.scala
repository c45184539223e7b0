package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  /** Independent reference model: same fixed-point semantics, computed
    * with plain Scala Maps (no Spark) — the differential the DataFrame
    * pipeline must match exactly. */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int,
                       scale: Long = 1000000L): Map[Long, Long] = {
    val w = edges.groupBy(identity).map { case ((s1, d1), es) =>
      (s1, d1, es.size.toLong) }.toSeq
    val outdeg = w.groupBy(_._1).map { case (s1, es) => s1 -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var rank = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val inflow = w.groupBy(_._2).map { case (d1, es) =>
        d1 -> es.map { case (s1, _, cnt) => rank(s1) * cnt / outdeg(s1) }.sum }
      rank = nodes.map(n => n ->
        (scale * 15 / 100 + 85 * inflow.getOrElse(n, 0L) / 100)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the reference model bit-for-bit on a small graph") {
    // 1→2, 1→3, 2→3, 3→1 plus a sink-feeding 4→1: varied in/out degrees
    val edges = Seq[(Long, Long)]((1, 2), (1, 3), (2, 3), (3, 1), (4, 1))
    for (iters <- Seq(1, 3, 5))
      assert(run(edges, iters) === refRanks(edges, iters),
        s"fixed-point ranks must be exact at $iters iterations")
  }

  test("a node with no in-edges sits at exactly the jump constant") {
    val r = run(Seq[(Long, Long)]((1, 2), (2, 1), (3, 1)), 4)
    assert(r(3) === 150000L, "no inflow => rank = 0.15 * scale, exactly")
  }

  test("duplicate edges act as weights") {
    // 1 splits 2:1 between 2 and 3 (vs 1:1 without multiplicity)
    val once = run(Seq[(Long, Long)]((1, 2), (1, 3)), 1)
    val weighted = run(Seq[(Long, Long)]((1, 2), (1, 2), (1, 3)), 1)
    assert(once(2) === once(3))
    assert(weighted(2) === 150000L + 85L * (2 * 1000000L / 3) / 100)
    assert(weighted(3) === 150000L + 85L * (1000000L / 3) / 100)
  }

  test("rank mass concentrates on high-indegree nodes") {
    val r = run(Seq[(Long, Long)]((1, 4), (2, 4), (3, 4), (4, 1)), 5)
    assert(r(4) > r(1) && r(1) > r(2), "hub > its sole target > leaves")
    assert(r(2) === r(3), "symmetric nodes tie exactly")
  }
}
