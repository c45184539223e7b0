package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType, StructField, StructType}

/** PLAN-TIME ROW-COUNT AND COLUMN STATISTICS for lake relations — the
  * missing half of the cost picture (VERDICT r15 #1).
  *
  * A V1 `BaseRelation` can only report `sizeInBytes`, so until now a
  * graft-txn scan entered Catalyst with bytes alone: join-side choice
  * compared PHYSICAL file sizes, which parquet encoding makes a poor
  * proxy for in-memory width — a dictionary-compressed 600k-row fact
  * looks "smaller" than a 4k-row dimension of random strings, and the
  * initial plan broadcasts the fact. The manifest has carried exact
  * per-file ROW COUNTS (`FileEntry.rows`, footer-derived at commit
  * time) and per-column (min,max) zone maps all along; this rule is
  * the bridge that hands them to the planner.
  *
  * Mechanism: `LogicalRelation.computeStats` consults
  * `catalogTable.stats` before falling back to `relation.sizeInBytes`,
  * and `CatalogStatistics.toPlanStats` — under
  * `spark.sql.cbo.planStats.enabled` (or full CBO) — re-derives the
  * estimate as rowCount × schema row width and attaches per-column
  * min/max. So the rule simply attaches a `CatalogTable` carrying
  * `CatalogStatistics(sizeInBytes, rowCount, colStats)` to every lake
  * `LogicalRelation` that lacks stats, exactly how Delta surfaces its
  * log-derived rowCount. Both read paths are covered: the
  * fast-path `HadoopFsRelation` over [[TxnFileIndex]] and the
  * merge-on-read [[TxnDvRelation]] fallback.
  *
  * All inputs are MANIFEST-SCALE, resolved on the driver with zero
  * data-file reads — the manifest was already resolved to build the
  * relation; this reuses that snapshot:
  *  - rowCount = Σ per-file rows − Σ per-entry DOOMED counts: each DV
  *    commit records its entry's cumulative deleted-row count in the
  *    manifest, so the subtraction is log-only and the count is EXACT
  *    under deletion vectors. Entries whose DVs predate the field
  *    contribute no subtraction — the old safe over-approximation.
  *    Legacy manifests with any row-less entry attach nothing — never
  *    guess.
  *  - column min/max = the fold of every live file's zone map, emitted
  *    only when EVERY live file carries bounds for the column (a
  *    partial fold could under-state the range and make CBO prune a
  *    live value). Bounds are stored as cast-to-double, so only
  *    columns whose external-string form round-trips exactly are
  *    emitted: integral types (whole-number check) and float/double.
  *  - column (distinctCount, nullCount) = the table's ANALYZE artifact
  *    ([[TxnLake.analyzeTable]], `ANALYZE TABLE ... COMPUTE STATISTICS
  *    FOR ALL COLUMNS`) — the inputs join-cardinality estimation and
  *    CBO join REORDER key on, maintained the way Spark/Delta maintain
  *    them: an explicit metadata-scale statement, consumed from the
  *    log at plan time with zero data I/O, capped at current rowCount
  *    so staleness can never yield an impossible stat.
  *
  * Registration: [[graft.GraftExtensions]] injects it as a pre-CBO
  * rule (the deployment path, the same hook Delta's stats preparation
  * uses); sessions built without extensions call [[install]], which
  * appends it to `experimental.extraOptimizations`. Idempotent by
  * construction — a relation whose catalogTable already has stats is
  * left untouched, so fixed-point batches stabilize after one pass.
  *
  * At 100 TB the payoff is the INITIAL plan: broadcast-vs-shuffle and
  * build-side choice are decided before any stage runs, where AQE's
  * runtime rescue only arrives after the first (possibly
  * catastrophically mis-sided) shuffle has been scheduled.
  */
object TxnCboStats extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case lr: LogicalRelation if lr.catalogTable.forall(_.stats.isEmpty) =>
      statsFor(lr).fold(lr: LogicalPlan) { stats =>
        val ct = lr.catalogTable.getOrElse(syntheticTable(lr))
        lr.copy(catalogTable = Some(ct.copy(stats = Some(stats))))
      }
  }

  /** Append to the session's user-provided optimizer rules (runs for
    * every query, before physical planning) — for sessions built
    * without `spark.sql.extensions=graft.GraftExtensions`. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  private def statsFor(lr: LogicalRelation): Option[CatalogStatistics] = {
    val src: Option[(String, TxnLake.Manifest, Long)] = lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case idx: TxnFileIndex => Some((idx.dir, idx.manifest, idx.sizeInBytes))
        case _ => None
      }
      case dv: TxnDvRelation => Some((dv.dir, dv.manifest, dv.sizeInBytes))
      case _ => None
    }
    src.flatMap { case (dir, m, size) =>
      // no guessing: a legacy manifest with any row-less entry gets no
      // rowCount, and without rowCount toPlanStats is size-only — skip
      // the attach entirely so the plan is byte-identical to before.
      // Same discipline for a DV'd entry WITHOUT a doomed count (legacy
      // or sidecar-fallback commits): its deleted rows are knowable
      // only by opening the sidecar — a Spark job, too heavy inside an
      // optimizer rule — and attaching the undiminished sum would feed
      // CBO an over-stated row count on mixed tables, so abstain and
      // let size-based estimation stand.
      if (m.files.exists(_.rows.isEmpty) ||
          m.files.exists(f => f.dv.nonEmpty && f.doomed.isEmpty)) None
      else {
        // rowCount is EXACT under deletion vectors: each DV commit
        // writes the entry's cumulative doomed-row count into the
        // manifest, so the subtraction is a pure log read.
        val doomed = m.files.filter(_.dv.nonEmpty).flatMap(_.doomed).sum
        val rows = m.files.flatMap(_.rows).sum - doomed
        Some(CatalogStatistics(
          sizeInBytes = BigInt(size),
          rowCount = Some(BigInt(rows)),
          colStats = colStatsOf(dir, m, rows)))
      }
    }
  }

  /** Table-level column statistics per LOGICAL column name:
    *  - (min,max) folded from the manifest zone maps — emitted only
    *    when every live file has bounds for the column and the
    *    double-stored bound renders back into the column type's
    *    external-string form exactly;
    *  - (distinctCount, nullCount) from the table's ANALYZE artifact
    *    ([[TxnLake.analyzeTable]]) when one exists — the join-
    *    cardinality inputs CBO's reorder actually keys on, refreshed
    *    explicitly like Spark/Delta's own ANALYZE TABLE. Both are
    *    capped at the CURRENT rowCount, so a stale artifact can shrink
    *    estimate quality but never produce an impossible stat. */
  private def colStatsOf(dir: String, m: TxnLake.Manifest,
                         rows: Long): Map[String, CatalogColumnStat] = {
    if (m.files.isEmpty) return Map.empty
    val artifact = TxnLake.tableStatsOf(dir)
    val analyzed: Map[String, (Long, Long)] =
      artifact.map(_.cols).getOrElse(Map.empty)
    val hists: Map[String, (Double, Seq[(Double, Double, Long)])] =
      artifact.map(_.hist).getOrElse(Map.empty)
    val schema = StructType.fromDDL(m.schemaDdl)
    schema.fields.iterator.flatMap { f =>
      val logical = m.renames.getOrElse(f.name, f.name)
      val perFile = m.files.map(e => e.stats.get(f.name).orElse(
        if (m.statsCol.contains(f.name)) e.zmin.zip(e.zmax) else None))
      val bounds0 =
        if (perFile.exists(_.isEmpty)) None
        else {
          val bounds = perFile.flatten
          render(f, bounds.map(_._1).min, bounds.map(_._2).max)
        }
      val nd = analyzed.get(logical)
      // equi-height histogram from the ANALYZE artifact — the range-
      // selectivity input FilterEstimation uses directly, where skewed
      // data makes min/max interpolation arbitrarily wrong
      val hist = hists.get(logical).map { case (height, bins) =>
        org.apache.spark.sql.catalyst.plans.logical.Histogram(height,
          bins.map { case (lo, hi, binNdv) =>
            org.apache.spark.sql.catalyst.plans.logical.HistogramBin(lo, hi, binNdv)
          }.toArray)
      }
      if (bounds0.isEmpty && nd.isEmpty && hist.isEmpty) Iterator.empty
      else Iterator.single(logical -> CatalogColumnStat(
        min = bounds0.map(_._1), max = bounds0.map(_._2),
        distinctCount = nd.map(v => BigInt(math.min(v._1, math.max(rows, 1L)))),
        nullCount = nd.map(v => BigInt(math.min(v._2, rows))),
        histogram = hist))
    }.toMap
  }

  /** External-string rendering of double-stored bounds, when exact:
    * integral columns demand whole values (they always are — bounds
    * were cast FROM the column — but a corrupt manifest must not turn
    * into a parse error at plan time), float/double render verbatim.
    * Decimal, date, timestamp and string columns abstain: their
    * external forms don't share the stored double's unit. */
  private def render(f: StructField, lo: Double, hi: Double): Option[(String, String)] =
    f.dataType match {
      case ByteType | ShortType | IntegerType | LongType
        if lo.isWhole && hi.isWhole &&
          lo >= Long.MinValue.toDouble && hi <= Long.MaxValue.toDouble =>
        Some((lo.toLong.toString, hi.toLong.toString))
      case FloatType | DoubleType
        if !lo.isNaN && !hi.isNaN && !lo.isInfinite && !hi.isInfinite =>
        Some((lo.toString, hi.toString))
      case _ => None
    }

  /** Minimal read-only CatalogTable to carry the stats when the
    * relation is path-addressed (no real catalog entry): identifier in
    * the `graft_txn` namespace, external type, location = the table
    * dir. Nothing downstream writes through it — it exists so
    * `computeStats` finds `stats`. */
  private def syntheticTable(lr: LogicalRelation): CatalogTable = {
    val dir = lr.relation match {
      case h: HadoopFsRelation => h.location.asInstanceOf[TxnFileIndex].dir
      case dv: TxnDvRelation => dv.dir
    }
    CatalogTable(
      identifier = TableIdentifier(
        new org.apache.hadoop.fs.Path(dir).getName, Some("graft_txn")),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new org.apache.hadoop.fs.Path(dir).toUri)),
      schema = StructType(lr.output.map(a =>
        StructField(a.name, a.dataType, a.nullable))),
      provider = Some("graft-txn"))
  }
}
