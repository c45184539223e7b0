package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan,
  * Albert & Kumara 2007, "Near linear time algorithm to detect
  * community structures in large-scale networks"): every node starts
  * in its own community (label = node id); each round a node adopts
  * the label carrying the LARGEST total edge weight among its
  * neighbors (ties → smallest label). Distinct from
  * [[Dedup.clusters]]' min-label connected components: the frequency
  * vote keeps dense regions joined by thin bridges in SEPARATE
  * communities, where reachability would merge them.
  *
  * Determinism: the paper's asynchronous update is visit-order
  * dependent by construction; the synchronous variant with an integer
  * argmax (BIGINT weights, tie broken toward the smaller label) is a
  * pure function of the graph, so a DuckDB oracle unrolls the same
  * rounds and must match bit-for-bit (pr05).
  *
  * Scale shape: the weighted adjacency builds once (one hash-agg);
  * each round is one join keyed on the neighbor id + a (node, label)
  * partial-agg vote + a per-node argmax — two keyed shuffles per
  * round, no adjacency matrix, no driver-side state. Rounds compose
  * into one lazy plan ([[PageRank]]'s discipline); for iteration
  * counts beyond its useful 3-10, re-anchor the label frame every few
  * rounds (persist + truncate — the [[Dedup.clusters]] batching
  * pattern).
  */
object Communities {

  /** Community labels after `rounds` synchronous votes. `edges` needs
    * BIGINT-castable columns `u` and `v`, read as UNDIRECTED; parallel
    * rows are edge weights. Self-loops are ignored (a node's own label
    * never votes). Returns (node, label). */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = edges.select(col("u").cast("bigint").as("u"),
        col("v").cast("bigint").as("v"))
      .filter(col("u") =!= col("v"))
    val both = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val adj = both.groupBy(col("u").as("node"), col("v").as("nbr"))
      .agg(count(lit(1)).as("cnt"))
    var labels = adj.select(col("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val votes = adj
        .join(labels.select(col("node").as("nbr"), col("label")), "nbr")
        .groupBy(col("node"), col("label"))
        .agg(sum(col("cnt")).as("wt"))
      // integer argmax: max over (weight, -label) picks the heaviest
      // label, ties toward the smaller id — associative, order-free
      labels = votes.groupBy(col("node"))
        .agg(max(struct(col("wt"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
    }
    labels
  }

  /** k-core decomposition by synchronous peeling (Seidman 1983,
    * "Network structure and minimum degree"; the MapReduce formulation
    * follows Montresor et al. 2013): each round drops every node whose
    * CURRENT degree is below k, together with its edges, and the drops
    * cascade — removing a chain's endpoint exposes its neighbor next
    * round. The k-core is the fixed point: the maximal subgraph where
    * every node keeps ≥ k distinct neighbors. The graph-pruning
    * primitive for spam/bot subgraph removal and dense-community
    * seeding over interaction graphs.
    *
    * Rounds are FIXED (not loop-until-converged) so a DuckDB oracle can
    * unroll the identical peels and match bit-for-bit (pr01's
    * discipline); the final `deg >= k` filter makes a non-converged
    * call honest (it returns current-round survivors, which equals the
    * k-core exactly when the cascade has settled — pick `rounds` ≥ the
    * longest pendant path, and a spec pins convergence by checking one
    * extra round changes nothing). At 100 TB each round is one
    * degree hash-agg + two keyed semi-join prunes on the shrinking edge
    * set — no adjacency matrix, no driver state; a production
    * loop-until-fixed-point would re-anchor lineage every few rounds
    * ([[Dedup.clusters]]' batching pattern).
    *
    * `edges` needs BIGINT-castable `u`, `v`; read undirected, parallel
    * edges and self-loops dropped (degree = DISTINCT neighbors).
    * Returns (node, deg) of k-core members with their in-core degree.
    *
    * Plan shape: the adjacency is SYMMETRIC (both orientations
    * present), so each peel is two window counts over the one edge
    * frame — `count() over (partition by node)` is the node's current
    * degree, the mirror partition is the neighbor's — and a row-local
    * filter. The frame is referenced ONCE per round, keeping the
    * composed lazy plan linear in `rounds`; the semi-join formulation
    * (prune edges against a filtered degree table) re-derives the
    * shrinking adjacency three times per round and compounds to 3^r
    * copies of the upstream plan — measured minutes of planning at
    * toy scale, unusable at any real one. */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = edges.select(col("u").cast("bigint").as("u"),
        col("v").cast("bigint").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
    var adj = e.select(col("u").as("node"), col("v").as("nbr"))
      .unionByName(e.select(col("v").as("node"), col("u").as("nbr")))
    for (_ <- 1 to rounds) {
      adj = adj
        .withColumn("__kc_dn", count(lit(1)).over(Window.partitionBy(col("node"))))
        .withColumn("__kc_dm", count(lit(1)).over(Window.partitionBy(col("nbr"))))
        .filter(col("__kc_dn") >= k && col("__kc_dm") >= k)
        .select(col("node"), col("nbr"))
    }
    adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
  }
}
