package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[TxnLake.analyzeTable]] + `ANALYZE TABLE ... COMPUTE STATISTICS` —
  * the explicit NDV/null-count refresh [[TxnCboStats]] serves to the
  * planner: artifact round-trip, exactness of null counts, SQL
  * statement surface, SHOW TBLPROPERTIES rows, follow-the-column
  * bookkeeping on rename/drop, clone carry-over. */
class AnalyzeStatsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def fresh(): String = {
    val dir = Files.createTempDirectory("graft_analyze").resolve("t").toString
    TxnLake.create(spark, dir,
      (1L to 1000L).map(i =>
        (i, if (i % 4 == 0) None else Some(i % 10), s"p${i % 2}"))
        .toDF("id", "bucket", "part"), "part")
    dir
  }

  test("one pass captures NDV (approx) and null counts (exact) per column") {
    val dir = fresh()
    val ts = TxnLake.analyzeTable(spark, dir)
    assert(ts.rows === 1000L && ts.version === 0L)
    val (idNdv, idNulls) = ts.cols("id")
    assert(idNulls === 0L)
    assert(math.abs(idNdv - 1000L) <= 100L, s"id ndv ~1000, got $idNdv")
    val (bNdv, bNulls) = ts.cols("bucket")
    assert(bNulls === 250L) // every 4th row NULL — exact
    assert(bNdv >= 8L && bNdv <= 12L, s"bucket ndv ~10, got $bNdv")
    // artifact round-trips through the log
    assert(TxnLake.tableStatsOf(spark, dir) === Some(ts))
    // re-analyzing after a mutation refreshes version and counts
    TxnLake.deleteWhere(spark, dir, col("id") <= 500L)
    val ts2 = TxnLake.analyzeTable(spark, dir)
    assert(ts2.version === 1L && ts2.rows === 500L)
    assert(ts2.cols("bucket")._2 === 125L)
  }

  test("SQL: ANALYZE TABLE statement + SHOW TBLPROPERTIES surface") {
    withExtendedSession { s =>
      import s.implicits._
      val dir = Files.createTempDirectory("graft_analyze_sql").resolve("t").toString
      TxnLake.create(s, dir,
        (1L to 100L).map(i => (i, s"p${i % 2}")).toDF("id", "part"), "part")
      s.sql(s"ANALYZE TABLE graft_txn.`$dir` COMPUTE STATISTICS FOR ALL COLUMNS")
      val ts = TxnLake.tableStatsOf(s, dir).get
      assert(ts.rows === 100L && ts.cols.contains("id"))
      val props = s.sql(s"SHOW TBLPROPERTIES graft_txn.`$dir`").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.stats.analyzedVersion") === Some("0"))
      assert(props.get("graft.stats.analyzedRows") === Some("100"))
      // NOSCAN computes nothing here — refused with guidance
      val e = intercept[Exception] {
        s.sql(s"ANALYZE TABLE graft_txn.`$dir` COMPUTE STATISTICS NOSCAN")
      }
      assert(e.getMessage.contains("NOSCAN"))
      // the column-list form works (computes all — one pass either way)
      s.sql(s"ANALYZE TABLE graft_txn.`$dir` COMPUTE STATISTICS FOR COLUMNS id")
      assert(TxnLake.tableStatsOf(s, dir).isDefined)
    }
  }

  test("stats follow the column: rename re-keys, drop removes") {
    val dir = fresh()
    TxnLake.analyzeTable(spark, dir)
    TxnLake.renameColumn(spark, dir, "bucket", "bkt")
    val ts = TxnLake.tableStatsOf(spark, dir).get
    assert(ts.cols.contains("bkt") && !ts.cols.contains("bucket"))
    assert(ts.cols("bkt")._2 === 250L)
    // the equi-height histogram follows too (numeric column)
    assert(ts.hist.contains("bkt") && !ts.hist.contains("bucket"))
    TxnLake.dropColumn(spark, dir, "bkt")
    val after = TxnLake.tableStatsOf(spark, dir).get
    assert(!after.cols.contains("bkt") && !after.hist.contains("bkt"))
  }

  test("clone carries the artifact; planner stats cap at current rowCount") {
    val src = fresh()
    val dst = Files.createTempDirectory("graft_analyze_cl").resolve("t").toString
    TxnLake.analyzeTable(spark, src)
    TxnLake.clone(spark, src, dst)
    assert(TxnLake.tableStatsOf(spark, dst).map(_.rows) === Some(1000L))
    // shrink the clone far below the analyzed counts: the surfaced
    // distinctCount/nullCount must cap at the CURRENT rowCount
    TxnLake.deleteWhere(spark, dst, col("id") > 5L)
    val df = spark.read.format("graft-txn").load(dst)
    val lr = df.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }.get
    assert(lr.stats.rowCount === Some(BigInt(5)))
    val byName = lr.stats.attributeStats.map { case (a, cs) => a.name -> cs }
    assert(byName("id").distinctCount.exists(_ <= BigInt(5)))
    assert(byName("bucket").nullCount.exists(_ <= BigInt(5)))
  }
}
