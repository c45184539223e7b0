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
}
