package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CommunitiesSpec extends AnyFunSuite with SparkTestSession {

  private def lpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    Communities.labelPropagation(edges.toDF("u", "v"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("barbell graph: LPA separates thinly-bridged communities that connectivity merges") {
    import spark.implicits._
    // two triangles with doubled edges (weight 2), one single bridge
    val tri1 = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val tri2 = Seq((3L, 4L), (4L, 5L), (3L, 5L))
    val edges = tri1 ++ tri1 ++ tri2 ++ tri2 :+ (2L, 3L)
    assert(lpa(edges, 3) ===
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 3L),
      "each triangle must keep its own label despite the bridge")
    // connected components on the same graph: ONE cluster — the
    // semantic gap that justifies a separate operator
    val nodes = (0L to 5L).toDF("doc_id")
    val pairs = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("doc_a", "doc_b")
    val nClusters = Dedup.clusters(nodes, pairs)
      .select(col("cluster_id")).distinct().count()
    assert(nClusters === 1L)
  }

  test("LPA ignores self-loops and breaks vote ties toward the smaller label") {
    import spark.implicits._
    // path 0-1-2 plus a heavy self-loop on 1: the loop must not vote.
    // node 1 sees labels {0, 2} at weight 1 each -> tie -> 0
    val edges = Seq((0L, 1L), (1L, 2L), (1L, 1L), (1L, 1L), (1L, 1L))
    val r1 = lpa(edges, 1)
    assert(r1(1L) === 0L, s"tie must break to the smaller label, got $r1")
  }

  test("LPA is invariant to edge orientation (undirected semantics)") {
    val e1 = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L))
    val e2 = e1.map { case (a, b) => (b, a) }
    assert(lpa(e1, 3) === lpa(e2, 3))
  }

  private def kcore(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    Communities.kCore(edges.toDF("u", "v"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // K4 on nodes 0-3 with a pendant path 3-10-11-12 hanging off it
  private val k4WithTail = Seq(
    (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
    (3L, 10L), (10L, 11L), (11L, 12L))

  test("kCore peels a pendant path via cascade and keeps the clique") {
    // k=2: path end 12 (deg 1) drops round 1, exposing 11, then 10 —
    // three cascading rounds; K4 (all deg 3) must survive untouched,
    // with node 3's degree reduced by its lost pendant neighbor
    val r = kcore(k4WithTail, k = 2, rounds = 3)
    assert(r === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      s"2-core must be exactly the K4, got $r")
    // convergence self-check: one extra round changes nothing
    assert(kcore(k4WithTail, k = 2, rounds = 4) === r)
  }

  test("kCore at k above the max core degree empties the graph") {
    assert(kcore(k4WithTail, k = 4, rounds = 3) === Map.empty)
  }

  test("kCore degree counts DISTINCT neighbors: parallel edges and self-loops don't inflate") {
    // triangle with every edge tripled plus self-loops: degrees are
    // still 2 per node, so k=3 empties it and k=2 keeps it
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val noisy = tri ++ tri ++ tri ++ Seq((0L, 0L), (1L, 1L))
    assert(kcore(noisy, k = 3, rounds = 2) === Map.empty)
    assert(kcore(noisy, k = 2, rounds = 2) ===
      Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("kCore honest under-iteration: unfinished cascade keeps current survivors") {
    // with only 1 round the pendant path loses just its endpoint; 11
    // still had deg 2 when the round started, and after the prune it
    // retains deg >= ... final filter drops nodes now under k
    val r = kcore(k4WithTail, k = 2, rounds = 1)
    // after round 1: edge (11,12) gone; 10-11 remain with deg 2,1.
    // Final deg >= k filter hides 11 (deg 1) but 10 keeps 2 neighbors
    assert(r.keySet === Set(0L, 1L, 2L, 3L, 10L),
      s"one-round peel should retain the un-cascaded interior, got $r")
  }
}
