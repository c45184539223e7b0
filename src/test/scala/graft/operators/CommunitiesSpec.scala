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
}
