package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard: headline queries must keep their
  * pushed filters, pruned scans, and broadcast choices — the properties
  * that make them survive a 100× scale-up. Complements the value-level
  * oracle checks (which can't see a plan regress from broadcast to
  * cartesian). */
class PlanLintSpec extends AnyFunSuite with SparkTestSession {

  // FormattedMode: executedPlan.toString truncates long attribute lists,
  // which silently breaks substring assertions on PushedFilters.
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q01: shipdate filter reaches the parquet scan; schema pruned to 7 columns") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double," +
      "l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate:timestamp"), p)
  }

  test("q02: both predicates pushed, projection pruned") {
    val p = plan("q02_scan_filter_project")
    assert(p.contains("GreaterThan(l_quantity,45.0)"), p)
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"), p)
    assert(!p.contains("l_returnflag"), s"pruning lost: scan reads unused columns\n$p")
  }

  test("q05: region/nation dims broadcast, no cartesian products") {
    val p = plan("q05_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q06: fully-pushed filter-only aggregate stays a two-phase agg") {
    val p = plan("q06_forecast_revenue")
    assert(p.contains("partial_sum"), p)
    // formatted mode lists each node twice (tree + detail) — count node headers
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges === 1, s"scalar aggregate needs exactly one exchange\n$p")
  }

  test("q30: range join runs on the (user, bin) equi key, not a cartesian") {
    val p = plan("q30_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q47: distributed rank reads the pinned range shuffle; offsets joined by broadcast") {
    val p = plan("q47_distributed_rank")
    // the range exchange is materialized once behind an RDD scan so both
    // consuming branches see identical partitioning
    assert(p.contains("ExistingRDD"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q48: grouped-HAVING aggregation is partial+final before the joins") {
    val p = plan("q48_large_orders")
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q51: salted join still plans on equi keys, no cartesian") {
    val p = plan("q51_salted_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q52: both Q21 quantifiers fold into two-level hash aggregates — no expand, no nested loops") {
    val p = plan("q52_sole_late_supplier")
    // the EXISTS/NOT EXISTS pair is answered by per-(order,supplier)
    // then per-order exact aggregation with map-side partials…
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), p)
    // …NOT by countDistinct's EXPAND (triples fact rows pre-shuffle)
    // and NOT by fact-scale semi/anti joins or nested loops
    assert(!p.contains("Expand"), p)
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tx09: repetition signals are two-phase hash aggs over a pruned scan") {
    val p = plan("tx09_repetition")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"expected map-side partial aggregation\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan should read only doc_id+text\n$p")
  }

  test("dd09: segment dedup joins on the segment equi key, no cartesian") {
    val p = plan("dd09_segment_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan should read only doc_id+text\n$p")
  }

  test("dd06: near-dup confirm dedups narrow pairs before re-joining embeddings") {
    val p = plan("dd06_embedding_cosine_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the candidate dedup must run on (vec_a, vec_b) alone — an
    // embedding column inside the dedup keys means the wide rows are
    // being shuffled per band collision again
    val dedupLine = p.linesIterator.find(l => l.contains("Keys") && l.contains("vec_a")).getOrElse("")
    assert(!dedupLine.contains("embedding"), s"dedup keys carry embeddings\n$dedupLine")
  }

  test("gq02: geometry math stays a single codegen'd projection — no UDFs, no extra exchanges") {
    val p = plan("gq02_polygon_area")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p)
    // parse + area + centroid are row-local: the only exchange is the
    // final ORDER BY's range partitioning
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"row-local geometry introduced a shuffle\n$p")
  }

  test("gq04: spatial join plans on the grid-cell equi key, not a cartesian") {
    val p = plan("gq04_spatial_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("__cell"), s"expected the grid-cell join key in\n$p")
  }

  test("gq05: polygon-polygon join is cell-keyed and UDF-free, not a cartesian") {
    val p = plan("gq05_polygon_overlap_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("__cell"), s"expected the grid-cell join key in\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p)
  }

  test("gq06: kNN probes join on cells and rank per point — no cartesian, no global sort before the window") {
    val p = plan("gq06_spatial_knn")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("__cell"), s"expected the grid-cell join key in\n$p")
    // the top-k window must hash-partition by point id (parallel), never
    // collapse into an empty-partition-spec single-task window
    assert(!p.contains("Window [") || !p.contains("windowspecdefinition()"),
      s"single-partition window detected\n$p")
  }

  test("pr01: five PageRank rounds stay keyed joins — no cartesian, no UDFs") {
    val p = plan("pr01_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("pr02: triangle closure joins on vertex equi keys, not a cartesian") {
    val p = plan("pr02_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("zq01: Morton bit math is one codegen'd projection feeding a two-phase agg") {
    val p = plan("zq01_zorder_layout")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p)
    assert(p.contains("partial_count") || p.contains("partial_min"),
      s"expected map-side partial aggregation in\n$p")
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"bit interleave must not add exchanges\n$p")
  }

  test("ss05: kNN join dedups narrow id-pairs before embeddings re-join; per-vector window") {
    val p = plan("ss05_knn_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the distinct must run over (vec_id, nbr_id) only — never with
    // embedding payloads attached (the dd06 narrow-pair lesson)
    assert(!p.contains("HashAggregate(keys=[vec_id") ||
      !"HashAggregate\\(keys=\\[vec_id[^\\]]*embedding".r.findFirstIn(p).isDefined,
      s"pair dedup carries embedding payloads\n$p")
    assert(!p.contains("windowspecdefinition()"),
      s"single-partition window detected\n$p")
  }

  test("mm06: cross-modal candidates come from a band equi-join, never |Q|x|C|") {
    val p = plan("mm06_crossmodal_knn")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p)
    // the ONLY nested-loop joins allowed are the two broadcast-scalar
    // mean-vector attachments (1-row sides); candidate generation and
    // rescoring must stay keyed
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 4, s"unexpected nested-loop joins beyond the 1-row mean frames\n$p")
  }

  test("dd10: bloom probe joins positions, never probe-keys-vs-corpus-keys") {
    val p = plan("dd10_bloom_membership")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("tx13: CMS cells and probes stay partial-aggregated equi-joins") {
    val p = plan("tx13_cms_heavy_hitters")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count") || p.contains("partial_min"), p)
  }

  test("q54: IGNORE NULLS windows hash-partition by customer, no single task") {
    val p = plan("q54_ignore_nulls")
    assert(!p.contains("windowspecdefinition()"),
      s"single-partition window detected\n$p")
  }

  test("q57: profit joins broadcast the dims and keep partial aggregation") {
    val p = plan("q57_profit_by_nation_year")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("dd12: CDC chunking is explode + keyed shuffles, no cartesian, no UDFs") {
    val p = plan("dd12_content_chunks")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("windowspecdefinition()"),
      s"chunk-id cumsum must partition by doc\n$p")
  }

  test("sp05: temperature thresholds broadcast back; rows never shuffle") {
    val p = plan("sp05_temperature_mix")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"per-stratum cutoffs must ride a broadcast\n$p")
    assert(!p.contains("ScalaUDF"), p)
  }

  test("ss06: MMR rounds stay joins over the small pool — no UDFs, no single-task windows") {
    val p = plan("ss06_mmr_rerank")
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("BatchEvalPython"), p)
  }

  test("pr03: personalized rounds keep the keyed-join shape") {
    val p = plan("pr03_personalized_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("ss09: PQ codebook and LUT broadcast; encode ranks per (vector, subspace)") {
    val p = plan("ss09_pq_adc")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"the m*ksub codebook/LUT must ride broadcasts\n$p")
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("windowspecdefinition()"),
      s"encode argmin must partition by (vec_id, sub), not one task\n$p")
  }

  test("tx14: BM25 stats are partial aggs; df and corpus stats broadcast") {
    val p = plan("tx14_bm25")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"df/corpus stats must broadcast\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"term counts need map-side combine\n$p")
    assert(!p.contains("ScalaUDF"), p)
  }

  test("dd14: span mining is keyed shuffles + per-doc windows, no cartesian, no UDFs") {
    val p = plan("dd14_duplicated_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("windowspecdefinition()"),
      s"island merge must partition by doc\n$p")
    assert(p.contains("partial_count"),
      s"gram occurrence counting needs map-side combine\n$p")
  }

  test("q60: KMV sketch participates in partial aggregation (bounded merge)") {
    val p = plan("q60_kmv_distinct")
    assert(p.contains("partial_kmv_distinct") || p.contains("kmv_distinct"),
      s"expected the custom aggregate in the plan\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"typed aggregate should plan as object-hash/sort agg\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ss11: IVF-PQ scan scores codes via broadcast LUTs — no cartesian, no UDFs") {
    val p = plan("ss11_ivfpq")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"codebook/LUT joins must broadcast\n$p")
    assert(!p.contains("ScalaUDF"), p)
  }

  test("ss12: probe after incremental update prunes postings partitions") {
    val p = plan("ss12_incremental_index")
    assert(p.contains("PartitionFilters") && p.contains("centroid_id"),
      s"probed cells must prune postings partitions at planning time\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("zq02: zone-map range read scans an explicit pruned file list with the predicate pushed") {
    val p = plan("zq02_zone_map_skip")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"range aggregate needs map-side combine\n$p")
    // DSv2 path: the BETWEEN must ALSO reach the parquet reader as
    // pushed row-group filters — manifest skipping and footer skipping
    // compose, they don't replace each other
    assert(p.contains("GreaterThanOrEqual(o_orderkey,1000)") &&
      p.contains("LessThanOrEqual(o_orderkey,3000)"),
      s"stats predicate must push into the parquet scan\n$p")
  }

  test("zq02: the graft-txn scan opens strictly fewer files than the snapshot holds") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = SparkEntry.queries("zq02_zone_map_skip")(spark, sf)
    df.collect()
    // AQE hides materialized stages behind QueryStageExec leaves —
    // plain collect() never reaches the scans inside them
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case s: QueryStageExec => scansOf(s.plan)
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
    }.flatten
    val scans = scansOf(df.queryExecution.executedPlan)
      .filter(_.relation.location.isInstanceOf[graft.lake.TxnFileIndex])
    assert(scans.nonEmpty, "zq02 must read through a graft-txn file index")
    val opened = scans.map(_.metrics("numFiles").value).sum
    val total = scans.map(_.relation.location.inputFiles.length).sum
    assert(opened < total,
      s"zone maps pruned nothing: opened $opened of $total files")
  }

  test("q61: interval RANGE frames hash-partition by user, never one task") {
    val p = plan("q61_interval_range_frame")
    assert(!p.contains("windowspecdefinition()"),
      s"single-partition window detected\n$p")
  }

  test("lk04: the CDC delta aggregates before joining the view") {
    val p = plan("lk04_incremental_mv")
    assert(!p.contains("CartesianProduct"), p)
    // the signed delta must reach the view join as an aggregate, not raw
    // change rows — partial aggregation proves the map-side combine
    assert(p.contains("partial_sum"), s"delta must pre-aggregate\n$p")
  }

  test("dd15: representative selection is a per-cluster window, no cartesian, no UDFs") {
    val p = plan("dd15_quality_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("windowspecdefinition()"),
      s"argmax must partition by cluster, never one task\n$p")
  }

  test("ss13: radius join candidates come from band-bucket equality, never |Q|*|C|") {
    val p = plan("ss13_radius_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("lk05: post-optimize summary aggregates with map-side combine, no cartesian") {
    val p = plan("lk05_append_optimize")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"snapshot summary needs map-side combine\n$p")
  }

  test("sp07: PPS cumsum windows are keyed (histogram + local), never one global task") {
    val p = plan("sp07_pps_sample")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("windowspecdefinition()"),
      s"unpartitioned window detected — stratum stream through one task\n$p")
    assert(p.contains("partial_sum"),
      s"bucket histogram needs map-side combine\n$p")
  }

  test("pr05: LPA rounds are keyed joins + partial-agg votes, no cartesian") {
    val p = plan("pr05_label_propagation")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"vote aggregation needs map-side combine\n$p")
  }

  test("ss14: label filter runs on narrow candidate pairs before embeddings re-join") {
    val p = plan("ss14_hard_negatives")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("q62: stats aggregates are ONE hash agg with map-side partials, no window") {
    val p = plan("q62_stats_agg")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"co-moment sums need map-side combine\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tx16: PMI joins run on the token key; the 1-row total broadcasts") {
    val p = plan("tx16_pmi_collocations")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"1-row corpus total must broadcast, not shuffle\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"n-gram counting needs map-side combine\n$p")
  }

  test("pr06: link-prediction candidates come from wedge joins, never all-pairs") {
    val p = plan("pr06_link_prediction")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftAnti"), s"adjacency exclusion must be an anti join\n$p")
  }

  test("sp08: per-epoch order collapses to TakeOrdered — no full global sort lands") {
    val p = plan("sp08_epoch_shuffle")
    assert(p.contains("TakeOrderedAndProject"),
      s"limit-after-sort must plan as distributed top-k\n$p")
  }

  test("dd16: containment candidates are narrow id pairs; texts re-join by id") {
    val p = plan("dd16_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"gram table dedup needs hash aggregation\n$p")
  }

  test("st13: windowed top-k ranks inside per-window partitions, never one task") {
    val p = plan("st13_stream_topk")
    assert(!p.contains("windowspecdefinition()"),
      s"rank must partition by window start\n$p")
    assert(p.contains("partial_count"),
      s"windowed counts need map-side combine\n$p")
  }

  test("tx17: per-lang LM tables broadcast; bucket cuts never globally sort the corpus") {
    val p = plan("tx17_perplexity_buckets")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"vocab-sized model tables and tercile cuts must broadcast\n$p")
    assert(!p.contains("windowspecdefinition()"),
      s"unpartitioned window detected — the cut must come from the lang histogram\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"LM counting needs map-side combine\n$p")
  }

  test("pr07: k-core peels are keyed windows over the edge frame, no cartesian, linear plan") {
    val p = plan("pr07_kcore")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("windowspecdefinition()"),
      s"degree windows must partition by vertex\n$p")
    // the linear window formulation scans the customer table ONCE per
    // edge-construction branch (core + chains = 2 scans, doubled by
    // formatted-mode's tree+detail listing); the semi-join form
    // re-derived it 3^rounds times
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 8, s"edge re-derivation detected: $scans scans\n$p")
  }

  test("q63: windowed distinct decomposition stays in per-user partitions") {
    val p = plan("q63_window_distinct")
    assert(!p.contains("windowspecdefinition()"),
      s"unpartitioned window — global sequential scan\n$p")
    assert(!p.contains("collect_set"),
      s"distinct-over-window must use the first-occurrence trick, not a value set buffer\n$p")
  }

  test("st14: anomaly windows partition by event type; moments aggregate in one window pass") {
    val p = plan("st14_stream_anomaly")
    assert(!p.contains("windowspecdefinition()"),
      s"unpartitioned window — whole event stream through one task\n$p")
    assert(!p.contains("CartesianProduct"), p)
    val windows = "(?m)^\\(\\d+\\) Window".r.findAllIn(p).size
    assert(windows <= 1, s"the three moment columns must share one Window node\n$p")
  }

  test("pl01: cleaning pipeline filters before the fingerprint-dedup shuffle") {
    val p = plan("pl01_clean_pipeline")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
    // the quality/langid gates are row-local predicates BELOW the dedup
    // join: the Filter must appear under a scan-side subtree, so at
    // 100 TB the shuffle only carries surviving documents
    assert(p.contains("Filter"), p)
  }

  test("sp09: weighted sample is a TakeOrdered, never a full global sort") {
    val p = plan("sp09_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("pr08: BFS rounds are keyed joins — no cartesian, no nested loop") {
    val p = plan("pr08_bfs_hops")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("tx19: the max-doc-id scalar broadcasts; bucketing is a narrow map") {
    val p = plan("tx19_vocab_growth")
    // the 1-row max joins by broadcast nested loop (scalar cross) or
    // broadcast hash — never a shuffled cartesian over the corpus
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("dd17: URL canonicalization is row-local — one hash agg, no joins at all") {
    val p = plan("dd17_url_dedup")
    assert(!p.contains("Join"), s"canonicalization must not join\n$p")
    assert(!p.contains("ScalaUDF"), p)
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size
    // one shuffle for the canonical-key agg, one for the output sort
    assert(exchanges <= 2, s"dd17 grew extra shuffles\n$p")
  }

  test("q65: inverse-distribution aggregates stay a two-phase-free sorted agg, no window") {
    val p = plan("q65_inverse_distribution")
    assert(p.contains("percentile_disc") || p.contains("percentile_cont"), p)
    assert(!p.contains("Window"), s"inverse distribution must not become a global window\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p)
  }

  test("tx20: readability scoring is a narrow map + one hash agg, all-integer bucket math") {
    val p = plan("tx20_readability")
    assert(!p.contains("Join"), s"per-doc scoring must not join\n$p")
    assert(!p.contains("ScalaUDF"), p)
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"tx20 grew extra shuffles\n$p")
  }

  test("zq05: the lake fact scan carries a runtime partition-pruning subquery") {
    val p = plan("zq05_dynamic_pruning")
    assert(p.contains("dynamicpruning"),
      s"the dim filter must prune fact partitions at runtime\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ss15: the filtered probe pushes the label predicate into the postings scan") {
    val p = plan("ss15_filtered_ann")
    assert(p.contains("EqualTo(label,2)"),
      s"metadata pre-filter must reach the parquet reader\n$p")
    assert(!p.contains("ScalaUDF"), p)
  }

  test("sp10: quota capping is two bounded windows — no global sort, no join") {
    val p = plan("sp10_quota_cap")
    assert(!p.contains("Join"), s"quota capping must not join\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p)
    // phase-1 window partitions by (stratum, bucket) — the skew shield
    assert(p.contains("__q_p"), s"bucket-pruned phase-1 window missing\n$p")
  }

  test("q66: FILTER-clause aggregates stay one grouping pass (plus the distinct expand)") {
    val p = plan("q66_filtered_agg")
    assert(!p.contains("Join"), s"filtered aggregates must not become self-joins\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p)
  }

  test("dd02/signature path: fused codegen expressions, no interpreted HOF hashes") {
    val p = plan("dd02_minhash_lsh")
    assert(p.contains("token_hashes"), s"fused token hashing missing\n$p")
    assert(p.contains("shingle_hash_combine"), s"fused shingle combine missing\n$p")
    // banding/zip_with lambdas are fine (bounded per-row arrays); the
    // per-CHARACTER loops must stay fused
    assert(!p.contains("ascii(substr"),
      s"interpreted per-character hashing crept back\n$p")
    assert(!p.contains("ScalaUDF"), p)
  }

  test("ss02: the LSH probe signs vectors with the fused hyperplane expression") {
    val p = plan("ss02_lsh_ann")
    assert(p.contains("hyperplane_signature"), s"fused signature missing\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("CartesianProduct"), p)
  }

  test("q67: SQL-registered functions plan as the fused codegen expressions") {
    val p = plan("q67_sql_expression_surface")
    assert(p.contains("string_poly_hash") && p.contains("token_hashes") &&
      p.contains("shingle_hash_combine"),
      s"SQL registration must resolve to the fused expressions\n$p")
    assert(!p.contains("ScalaUDF"), p)
  }

  test("q64: listagg buffers are bounded by the per-nation window pre-cut") {
    val p = plan("q64_listagg")
    assert(p.contains("listagg"), p)
    // the rank filter must sit BELOW the aggregate: the plan carries a
    // Filter on the row_number output before any listagg node
    assert("(?s)Filter.*listagg".r.findFirstIn(p).isDefined ||
      "(?s)listagg.*Filter".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
