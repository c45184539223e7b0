package graft.analytics

import graft.Tables._
import graft.operators.PageRank
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

  val defs: Map[String, Q] = Map(
    "pr01_pagerank" -> (pr01 _))

  val oracle: Map[String, String] = Map(
    "pr01_pagerank" -> pr01Sql)
}
