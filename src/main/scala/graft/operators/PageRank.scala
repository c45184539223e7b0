package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-point PageRank over an edge list — graph
  * analytics as iterated join + aggregate, the shape that scales to
  * 100 TB edge sets (each round is one keyed shuffle on `dst`; nothing
  * ever materializes an adjacency matrix or collects to the driver).
  *
  * All arithmetic is BIGINT fixed point (ranks scaled by `scale`,
  * damping 0.85 applied as `(85 * x) div 100`): integer sums are
  * associative-commutative regardless of shuffle order, so the result
  * is bit-identical run-to-run AND engine-to-engine — a DuckDB oracle
  * replays the same iterations with `//` and matches exactly, which a
  * floating-point PageRank cannot promise (float sum order differs per
  * plan). Precision loss vs float is < 1/scale per node per round —
  * noise for ranking purposes, and a price worth paying for a
  * cross-engine-verifiable result.
  *
  * Semantics: the standard damped random surfer WITHOUT dangling-mass
  * redistribution — nodes with no out-edges absorb rank (their mass is
  * dropped, not re-spread). Multi-edges act as weights: u's rank splits
  * across out-edges proportionally to edge multiplicity.
  *
  * Lineage: `iterations` is expected to be small (3-10 — PageRank's
  * useful range); each round adds two joins to one lazy plan, so a
  * single action runs the whole pipeline with full AQE visibility. For
  * larger iteration counts, re-anchor the rank frame every few rounds
  * (persist + truncate), the [[Dedup.clusters]] batching pattern.
  */
object PageRank {

  /** Ranks after `iterations` rounds. `edges` needs BIGINT-castable
    * columns `src` and `dst`; duplicate (src, dst) rows are edge
    * weights. Returns (node, rank) with rank scaled by `scale`. */
  def ranks(edges: DataFrame, iterations: Int,
            scale: Long = 1000000L): DataFrame =
    run(edges, iterations, scale, jump = lit(scale * 15L / 100L),
      init = lit(scale))

  /** Personalized PageRank: the random surfer restarts AT `source`
    * instead of uniformly — only the source carries initial mass and
    * the per-round jump, so ranks measure proximity to the source
    * (random-walk-with-restart relevance). Same fixed-point integer
    * arithmetic and the same per-round shape as [[ranks]]. */
  def personalizedRanks(edges: DataFrame, source: Long, iterations: Int,
                        scale: Long = 1000000L): DataFrame = {
    val atSource = col("node") === source
    run(edges, iterations, scale,
      jump = when(atSource, lit(scale * 15L / 100L)).otherwise(lit(0L)),
      init = when(atSource, lit(scale)).otherwise(lit(0L)))
  }

  /** Shared fixed-point loop; `jump`/`init` are expressions over the
    * `node` column so uniform and personalized variants differ only in
    * where mass enters. */
  private def run(edges: DataFrame, iterations: Int, scale: Long,
                  jump: org.apache.spark.sql.Column,
                  init: org.apache.spark.sql.Column): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val e = edges.select(col("src").cast("bigint").as("src"),
      col("dst").cast("bigint").as("dst"))
    // weighted adjacency + out-degree, built once and reused each round
    // (one aggregation; outdeg rides a broadcast-or-shuffle join keyed
    // the same way the per-round contribution join is)
    val w = e.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("cnt"))
    val outdeg = w.groupBy(col("src")).agg(sum(col("cnt")).as("outdeg"))
    val adj = w.join(outdeg, "src")
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()

    var rank = nodes.select(col("node"), init.as("rank"))
    for (_ <- 1 to iterations) {
      // u's rank splits over out-edges by weight; integer div is exact
      // in both engines for the non-negative values that live here
      val contrib = adj.join(rank, adj("src") === rank("node"))
        .select(col("dst"), expr("(rank * cnt) div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      rank = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (jump + expr("(85 * coalesce(inflow, 0L)) div 100")).as("rank"))
    }
    rank
  }
}
