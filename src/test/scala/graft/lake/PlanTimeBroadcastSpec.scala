package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Plan-time join sizing for graft-txn tables (VERDICT r14 #5): a small
  * lake dimension must be chosen for BROADCAST in the INITIAL physical
  * plan — before AQE sees any runtime shuffle stats — on BOTH read
  * paths:
  *
  *   - the HadoopFsRelation fast path (sizes via `TxnFileIndex`'s
  *     FileStatus map), and
  *   - the `TxnDvRelation` fallback (outstanding deletion vectors or
  *     column renames), which previously inherited `BaseRelation`'s
  *     default `spark.sql.defaultSizeInBytes` (≈ +inf) so it could
  *     never broadcast until AQE flipped the join at runtime.
  *
  * Delta surfaces the same estimate for DV tables: file bytes, an
  * over-approximation (a DV only removes rows), so broadcast decisions
  * stay conservative — a table can only look bigger than it is.
  */
class PlanTimeBroadcastSpec extends AnyFunSuite with SparkTestSession {

  private def freshDir(): String =
    Files.createTempDirectory("graft_bcast").resolve("t").toString

  private def lake(dir: String): DataFrame =
    spark.read.format("graft-txn").load(dir)

  /** The INITIAL (pre-AQE) physical plan: `queryExecution.sparkPlan`
    * precedes adaptive wrapping, so a broadcast hash join here is a
    * plan-time decision, not a runtime flip. */
  private def initialPlanHasBhj(df: DataFrame): Boolean =
    df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty

  /** Star join: a fact frame large enough that Catalyst won't broadcast
    * it, joined to a 30-row lake dim. */
  private def starJoin(dim: DataFrame): DataFrame = {
    import spark.implicits._
    val fact = spark.range(0, 200000)
      .select((col("id") % 30).as("k"), (col("id") * 2).as("v"))
    fact.join(dim, fact("k") === dim("dim_k"))
      .groupBy(col("dim_name")).agg(sum(col("v")).as("total"))
  }

  private def dimRows(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"name-$i")).toDF("dim_k", "dim_name")
  }

  test("fast path: small lake dim broadcasts in the initial plan") {
    val dir = freshDir()
    TxnLake.create(spark, dir, dimRows(30), "dim_name")
    val joined = starJoin(lake(dir))
    assert(initialPlanHasBhj(joined),
      s"expected plan-time BroadcastHashJoin, got:\n${joined.queryExecution.sparkPlan}")
    assert(joined.count() === 30)
  }

  test("DV fallback path: small lake dim with deletion vectors broadcasts in the initial plan") {
    val dir = freshDir()
    TxnLake.create(spark, dir, dimRows(31), "dim_name")
    // a DV-bearing snapshot forces the TxnDvRelation fallback
    TxnLake.deleteWhere(spark, dir, col("dim_k") === 30L)
    val dim = lake(dir)
    // sanity: this really is the fallback relation (not HadoopFsRelation)
    val isFallback = dim.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[TxnDvRelation] => l
    }.nonEmpty
    assert(isFallback, "expected the DV fallback relation under a live deletion vector")
    // the estimate itself: physical bytes, finite and small
    val est = dim.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }.head.relation.sizeInBytes
    assert(est > 0L && est < 10L * 1024 * 1024,
      s"DV relation sizeInBytes should be the snapshot's physical bytes, got $est")
    val joined = starJoin(dim)
    assert(initialPlanHasBhj(joined),
      s"expected plan-time BroadcastHashJoin on the DV path, got:\n${joined.queryExecution.sparkPlan}")
    assert(joined.count() === 30)
  }

  test("renamed-column fallback path also sizes from the manifest") {
    val dir = freshDir()
    TxnLake.create(spark, dir, dimRows(30), "dim_name")
    TxnLake.renameColumn(spark, dir, "dim_k", "dim_key")
    val dim = lake(dir)
    val est = dim.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }.head.relation.sizeInBytes
    assert(est > 0L && est < 10L * 1024 * 1024,
      s"renamed-table relation sizeInBytes should be finite, got $est")
    import spark.implicits._
    val fact = spark.range(0, 200000)
      .select((col("id") % 30).as("k"), (col("id") * 2).as("v"))
    val joined = fact.join(dim, fact("k") === dim("dim_key"))
      .groupBy(col("dim_name")).agg(sum(col("v")).as("total"))
    assert(initialPlanHasBhj(joined),
      s"expected plan-time BroadcastHashJoin after rename, got:\n${joined.queryExecution.sparkPlan}")
    assert(joined.count() === 30)
  }
}
