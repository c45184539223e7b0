package graft.analytics

import graft.Tables._
import graft.operators.{Dedup, PageRank}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relational data ([[graft.operators.PageRank]]).
  *
  * pr01's graph is a closed-form modular construction (the gq04/gq05
  * oracle pattern): customer c contributes edge
  * `(c mod 53) -> ((7c + 3) mod 50)`. Source residues cover 0..52, so
  * every node has out-edges; destinations live in 0..9 (7 is invertible
  * mod 50, custkeys cover all residues), so nodes 10..52 have NO
  * in-edges and must decay to exactly the jump constant after round 1 —
  * a self-checking fixed point inside the output. The coarse dst space
  * makes edge multiplicities > 1 at every SF, exercising the weighted
  * split. The oracle unrolls the same five integer fixed-point rounds
  * in SQL; because all arithmetic is BIGINT, both engines must agree
  * bit-for-bit — no float-summation-order caveat anywhere.
  */
object GraphQueries {

  private val Iterations = 5

  /** pr01 — 5-round fixed-point PageRank over the modular customer
    * graph; (node, rank) with rank scaled by 1e6. */
  private def pr01(s: SparkSession, d: String): DataFrame = {
    val edges = customer(s, d).select(
      (col("c_custkey") % 53).as("src"),
      ((col("c_custkey") * 7 + 3) % 50).as("dst"))
    PageRank.ranks(edges, Iterations).orderBy(col("node"))
  }

  private val pr01Sql: String = {
    val rounds = (1 to Iterations).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (SELECT n.node, CAST(150000 +
         |    (85 * coalesce(sum((r.rank * wd.cnt) // wd.outdeg), 0)) // 100
         |    AS BIGINT) AS rank
         |  FROM n LEFT JOIN wd ON wd.dst = n.node
         |         LEFT JOIN $prev r ON r.node = wd.src
         |  GROUP BY n.node)"""
    }.mkString(",\n")
    s"""WITH e AS (SELECT c_custkey % 53 AS src, (c_custkey*7 + 3) % 50 AS dst
       |  FROM customer),
       |w AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1, 2),
       |od AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS outdeg FROM w GROUP BY 1),
       |wd AS (SELECT w.src, w.dst, w.cnt, od.outdeg FROM w JOIN od ON w.src = od.src),
       |n AS (SELECT DISTINCT src AS node FROM e
       |      UNION SELECT DISTINCT dst AS node FROM e),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM n),
       |$rounds
       |SELECT node, rank FROM r$Iterations ORDER BY node""".stripMargin
  }

  /** pr02 — triangle enumeration: each triangle u < v < w emitted once
    * via the compact forward direction (edges stored canonically
    * ordered, wedges closed by a second equi-join). Two keyed shuffles
    * on vertex ids, no all-pairs anything — the join-based
    * node-iterator that scales to large edge sets; at real scale the
    * canonical order would be by DEGREE (low-degree vertex first),
    * which bounds per-vertex wedge fan-out under power-law skew — on
    * this dense modular graph id order is equivalent. Graph:
    * `{c mod 31, (11c + 5) mod 29}` per customer — coprime moduli so
    * src and dst vary independently (the gq04 closed-form trick),
    * self-loops dropped, undirected edges deduplicated. */
  private def pr02(s: SparkSession, d: String): DataFrame = {
    val raw = customer(s, d).select((col("c_custkey") % 31).as("a"),
      ((col("c_custkey") * 11 + 5) % 29).as("b"))
    val e = raw.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
    e.as("e1").join(e.as("e2"), col("e2.u") === col("e1.v"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("u"), col("e1.v").as("v"), col("e2.v").as("w"))
      .orderBy(col("u"), col("v"), col("w"))
  }

  private val pr02Sql =
    """WITH r AS (SELECT c_custkey % 31 AS a, (c_custkey*11 + 5) % 29 AS b
      |  FROM customer),
      |e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
      |  FROM r WHERE a <> b)
      |SELECT e1.u AS u, e1.v AS v, e2.v AS w
      |FROM e e1 JOIN e e2 ON e2.u = e1.v
      |JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
      |ORDER BY u, v, w""".stripMargin

  /** pr03 — personalized PageRank ([[PageRank.personalizedRanks]]):
    * random-walk-with-restart from node 3 over the pr01 graph — ranks
    * become proximity-to-source scores (the recommendation/relatedness
    * primitive). Nodes unreachable from the source must sit at exactly
    * 0, an in-output self-check; the oracle unrolls the same rounds
    * with the source-conditional jump and seed. */
  private def pr03(s: SparkSession, d: String): DataFrame = {
    val edges = customer(s, d).select(
      (col("c_custkey") % 53).as("src"),
      ((col("c_custkey") * 7 + 3) % 50).as("dst"))
    PageRank.personalizedRanks(edges, source = 3L, iterations = Iterations)
      .orderBy(col("node"))
  }

  private val pr03Sql: String = {
    val rounds = (1 to Iterations).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (SELECT n.node, CAST(
         |    (CASE WHEN n.node = 3 THEN 150000 ELSE 0 END) +
         |    (85 * coalesce(sum((r.rank * wd.cnt) // wd.outdeg), 0)) // 100
         |    AS BIGINT) AS rank
         |  FROM n LEFT JOIN wd ON wd.dst = n.node
         |         LEFT JOIN $prev r ON r.node = wd.src
         |  GROUP BY n.node)"""
    }.mkString(",\n")
    s"""WITH e AS (SELECT c_custkey % 53 AS src, (c_custkey*7 + 3) % 50 AS dst
       |  FROM customer),
       |w AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1, 2),
       |od AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS outdeg FROM w GROUP BY 1),
       |wd AS (SELECT w.src, w.dst, w.cnt, od.outdeg FROM w JOIN od ON w.src = od.src),
       |n AS (SELECT DISTINCT src AS node FROM e
       |      UNION SELECT DISTINCT dst AS node FROM e),
       |r0 AS (SELECT node, CAST(CASE WHEN node = 3 THEN 1000000 ELSE 0 END
       |    AS BIGINT) AS rank FROM n),
       |$rounds
       |SELECT node, rank FROM r$Iterations ORDER BY node""".stripMargin
  }

  /** pr04 — connected components on a LONG-DIAMETER graph
    * ([[Dedup.clustersStar]], large-star/small-star contraction —
    * Kiveris et al. 2014): nodes are customer-key residues mod 120,
    * chained k → k+1 inside three 40-node paths (k ≡ 39 mod 40 breaks
    * the chain). Diameter 39 is the regime the operator exists for —
    * star contraction converges in ~log₂(40) rounds where one-hop label
    * propagation (dd07's default path) would need 39 driver-paced
    * rounds. The oracle is CLOSED-FORM — cluster = 40·⌊k/40⌋ — and
    * contains no graph traversal at all, so an algorithmic bug cannot
    * cancel itself (the gq04 discipline). */
  private def pr04(s: SparkSession, d: String): DataFrame = {
    val nodes = customer(s, d)
      .select((col("c_custkey") % 120).as("doc_id")).distinct()
    val pairs = nodes.filter(col("doc_id") % 40 =!= 39)
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"))
    Dedup.clustersStar(nodes, pairs)
      .select(col("doc_id").as("node"), col("cluster_id"))
      .orderBy(col("node"))
  }

  private val pr04Sql =
    """SELECT node, (node // 40) * 40 AS cluster_id
      |FROM (SELECT DISTINCT c_custkey % 120 AS node FROM customer)
      |ORDER BY node""".stripMargin

  private val LpaRounds = 3

  /** pr05 — label-propagation communities
    * ([[graft.operators.Communities.labelPropagation]], synchronous
    * weighted LPA): 3 votes over the modular customer graph
    * `{c mod 41, (13c+7) mod 37}` (parallel rows = weights, coprime
    * moduli so both endpoints vary independently). The vote is an
    * all-integer argmax (heaviest neighbor label, ties → smaller id),
    * so the oracle unrolls the SAME three rounds — window-max +
    * min-label filter replaying the struct-argmax — and must match
    * bit-for-bit. Semantically distinct from pr04's components: LPA
    * keeps thinly-bridged dense regions apart (CommunitiesSpec pins
    * the barbell case). */
  private def pr05(s: SparkSession, d: String): DataFrame = {
    val edges = customer(s, d).select(
      (col("c_custkey") % 41).as("u"),
      ((col("c_custkey") * 13 + 7) % 37).as("v"))
    graft.operators.Communities.labelPropagation(edges, LpaRounds)
      .orderBy(col("node"))
  }

  private val pr05Sql: String = {
    val rounds = (1 to LpaRounds).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""v$i AS (SELECT a.node, lb.label, CAST(sum(a.cnt) AS BIGINT) AS wt
         |  FROM adj a JOIN $prev lb ON lb.node = a.nbr
         |  GROUP BY a.node, lb.label),
         |l$i AS (SELECT node, min(label) AS label FROM (
         |    SELECT node, label, wt, max(wt) OVER (PARTITION BY node) AS mx
         |    FROM v$i) WHERE wt = mx GROUP BY node)"""
    }.mkString(",\n")
    s"""WITH e AS (SELECT c_custkey % 41 AS u, (c_custkey*13 + 7) % 37 AS v
       |  FROM customer),
       |ef AS (SELECT u, v FROM e WHERE u <> v),
       |bi AS (SELECT u AS node, v AS nbr FROM ef
       |       UNION ALL SELECT v, u FROM ef),
       |adj AS (SELECT node, nbr, CAST(count(*) AS BIGINT) AS cnt
       |  FROM bi GROUP BY 1, 2),
       |l0 AS (SELECT DISTINCT node, node AS label FROM adj),
       |$rounds
       |SELECT node, label FROM l$LpaRounds ORDER BY node""".stripMargin
  }

  /** pr06 — link prediction by common-neighbor / Jaccard scores: for
    * every NON-adjacent node pair of the pr02 graph sharing at least
    * one neighbor, the common-neighbor count and the neighborhood
    * Jaccard `cn / (deg(u) + deg(v) − cn)` — the classic
    * recommendation/missing-edge primitive (Liben-Nowell & Kleinberg
    * 2003). Scale shape: candidate pairs come ONLY from wedge closure
    * (two equi-joins on the shared-neighbor key — the pr02 discipline,
    * no all-pairs), adjacency is excluded with an anti-join, and
    * degrees join in from a per-node aggregate. At power-law scale the
    * wedge fan-out is bounded the same way pr02's is (degree-ordered
    * canonical edges); every count is BIGINT so only the final ratio is
    * a double, rounded before ranking for a cross-engine-stable order. */
  private def pr06(s: SparkSession, d: String): DataFrame = {
    val raw = customer(s, d).select((col("c_custkey") % 97).as("a"),
      ((col("c_custkey") * 11 + 5) % 89).as("b"))
    val e = raw.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
    val adj = e.select(col("u").as("src"), col("v").as("dst"))
      .union(e.select(col("v").as("src"), col("u").as("dst")))
    val deg = adj.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val wedges = adj.as("x").join(adj.as("y"),
        col("x.dst") === col("y.dst") && col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("u"), col("y.src").as("v"))
      .agg(count(lit(1)).as("cn"))
    wedges.join(e, Seq("u", "v"), "left_anti")
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"),
        graft.analytics.stableRound6(col("cn").cast("double") /
          (col("du") + col("dv") - col("cn"))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("u"), col("v"))
      .limit(20)
  }

  private val pr06Sql =
    """WITH r AS (SELECT c_custkey % 97 AS a, (c_custkey*11 + 5) % 89 AS b
      |  FROM customer),
      |e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
      |  FROM r WHERE a <> b),
      |adj AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
      |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
      |  FROM adj GROUP BY src),
      |wedges AS (SELECT x.src AS u, y.src AS v, CAST(count(*) AS BIGINT) AS cn
      |  FROM adj x JOIN adj y ON x.dst = y.dst AND x.src < y.src
      |  GROUP BY 1, 2),
      |cand AS (SELECT w.u, w.v, w.cn FROM wedges w
      |  ANTI JOIN e ON e.u = w.u AND e.v = w.v)
      |SELECT c.u, c.v, c.cn,
      |  floor(CAST(c.cn AS DOUBLE) / (du.deg + dv.deg - c.cn)
      |    * 1000000.0 + 0.5)/1000000.0 AS jaccard
      |FROM cand c
      |JOIN deg du ON du.node = c.u
      |JOIN deg dv ON dv.node = c.v
      |ORDER BY jaccard DESC, c.u, c.v
      |LIMIT 20""".stripMargin

  private val KCoreRounds = 4

  /** pr07 — k-core decomposition ([[graft.operators.Communities.kCore]],
    * k = 2): a dense modular core `{c mod 23, (5c+1) mod 19}` that the
    * peel must NOT touch, plus 25 disjoint 8-node chains
    * (`1000+(c mod 200)` → successor, broken at every 8th residue)
    * that must peel COMPLETELY — one endpoint pair per round, so the
    * 4-round cascade is exercised end-to-end and the fixed `rounds`
    * equals the longest pendant path exactly. The oracle unrolls the
    * same four degree-filter/edge-prune rounds; all arithmetic is
    * BIGINT, so the engines must agree bit-for-bit. The final
    * `deg >= k` filter doubles as an in-output convergence self-check
    * (a non-settled cascade would leave sub-k survivors). */
  private def pr07(s: SparkSession, d: String): DataFrame = {
    val core = customer(s, d).select((col("c_custkey") % 23).as("u"),
      ((col("c_custkey") * 5 + 1) % 19).as("v"))
    val chains = customer(s, d)
      .select((col("c_custkey") % 200).as("m"))
      .filter(col("m") % 8 =!= 7)
      .select((col("m") + 1000).as("u"), (col("m") + 1001).as("v"))
    graft.operators.Communities.kCore(core.unionByName(chains), k = 2,
        rounds = KCoreRounds)
      .orderBy(col("node"))
  }

  private val pr07Sql: String = {
    val rounds = (1 to KCoreRounds).map { i =>
      val prev = s"a${i - 1}"
      s"""k$i AS (SELECT node FROM $prev GROUP BY node
         |  HAVING count(*) >= 2),
         |a$i AS (SELECT a.node, a.nbr FROM $prev a
         |  JOIN k$i x ON x.node = a.node
         |  JOIN k$i y ON y.node = a.nbr)"""
    }.mkString(",\n")
    s"""WITH ce AS (SELECT c_custkey % 23 AS a, (c_custkey*5 + 1) % 19 AS b
       |  FROM customer),
       |ch AS (SELECT 1000 + (c_custkey % 200) AS a, 1001 + (c_custkey % 200) AS b
       |  FROM customer WHERE (c_custkey % 200) % 8 <> 7),
       |e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
       |  FROM (SELECT * FROM ce UNION ALL SELECT * FROM ch) WHERE a <> b),
       |a0 AS (SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
       |$rounds
       |SELECT node, CAST(count(*) AS BIGINT) AS deg FROM a$KCoreRounds
       |GROUP BY node HAVING count(*) >= 2
       |ORDER BY node""".stripMargin
  }

  private val BfsMaxHops = 6

  /** pr08 — single-source SHORTEST HOP DISTANCES (bounded BFS) over the
    * directed modular customer graph (pr01's edge set), from node 0.
    * Distributed frontier expansion: round i joins only the nodes first
    * reached at hop i-1 against the edge list and anti-joins the
    * settled set, so each round is two keyed shuffles over a frontier
    * that never exceeds |V| — the textbook BFS shape that scales to
    * billion-edge graphs, vs. the oracle's DuckDB `WITH RECURSIVE ...
    * UNION` walk (its per-level dedup is what keeps the path count from
    * exploding combinatorially). BFS reaches every node first at its
    * minimum hop count by construction, so `min(hops)` needs no second
    * aggregation on the Spark side — a differential pair, not a port. */
  private def pr08(s: SparkSession, d: String): DataFrame = {
    val edges = customer(s, d).select(
        (col("c_custkey") % 53).as("src"),
        ((col("c_custkey") * 7 + 3) % 50).as("dst"))
      .distinct().cache()
    // seed from the vertex set, not a literal row: a folded-constant
    // seed degenerates every frontier join into a nested-loop build —
    // deriving it keeps all rounds equi-hash-joins (PlanLintSpec)
    var settled = edges.select(col("src").as("node")).filter(col("node") === 0)
      .distinct().withColumn("hops", lit(0L)).localCheckpoint()
    var frontier = settled
    for (i <- 1 to BfsMaxHops) {
      val reached = frontier.join(edges, col("node") === col("src"))
        .select(col("dst").as("node"), lit(i.toLong).as("hops")).distinct()
      // checkpoint per round (the dd13 star-contraction discipline):
      // round i's plan references round i-1 TWICE (the union and the
      // anti-join), so an untruncated loop doubles the LINEAGE every
      // hop — 2^rounds copies for the analyzer even when caches stop
      // the recomputation (measured 36 s uncached and still ~100 s
      // cache-only, pure plan-tree explosion on a 53-node graph).
      // localCheckpoint resets the analysis tree to an RDD scan; the
      // driver sync per hop is the Pregel/BFS contract at any scale.
      val fresh = reached.join(settled.select(col("node").as("__seen")),
        col("node") === col("__seen"), "left_anti").localCheckpoint()
      settled = settled.unionByName(fresh).localCheckpoint()
      frontier = fresh
    }
    settled.orderBy(col("node"))
  }

  private val pr08Sql =
    s"""WITH RECURSIVE e AS (
       |  SELECT DISTINCT c_custkey % 53 AS src, (c_custkey*7 + 3) % 50 AS dst
       |  FROM customer),
       |walk(node, hops) AS (
       |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  UNION
       |  SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
       |  WHERE w.hops < $BfsMaxHops)
       |SELECT node, CAST(min(hops) AS BIGINT) AS hops
       |FROM walk GROUP BY node
       |ORDER BY node""".stripMargin

  val defs: Map[String, Q] = Map(
    "pr08_bfs_hops" -> (pr08 _),
    "pr01_pagerank" -> (pr01 _),
    "pr02_triangles" -> (pr02 _),
    "pr03_personalized_pagerank" -> (pr03 _),
    "pr04_connected_components" -> (pr04 _),
    "pr05_label_propagation" -> (pr05 _),
    "pr06_link_prediction" -> (pr06 _),
    "pr07_kcore" -> (pr07 _))

  val oracle: Map[String, String] = Map(
    "pr08_bfs_hops" -> pr08Sql,
    "pr01_pagerank" -> pr01Sql,
    "pr02_triangles" -> pr02Sql,
    "pr03_personalized_pagerank" -> pr03Sql,
    "pr04_connected_components" -> pr04Sql,
    "pr05_label_propagation" -> pr05Sql,
    "pr06_link_prediction" -> pr06Sql,
    "pr07_kcore" -> pr07Sql)
}
