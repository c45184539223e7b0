package graft.plans

import graft.{GraftExtensions, SparkTestSession}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Differential test for the global-row_number rewrite: the SAME SQL in
  * an extension-built session must return exactly what the stock plan
  * returns, while the optimized plan swaps the single-task window for
  * the sorted distributed-sequence shape. */
class GlobalRankRewriteRuleSpec extends AnyFunSuite with SparkTestSession {


  private val sql =
    s"""SELECT c_custkey, row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn
       |FROM parquet.`$sf/customer.parquet`
       |ORDER BY c_custkey""".stripMargin

  test("rewritten plan returns exactly the stock result") {
    val expected = spark.sql(sql).collect().map(r => (r.getLong(0), r.getInt(1)))
    val (got, optimized) = withExtendedSession { s =>
      val df = s.sql(sql)
      (df.collect().map(r => (r.getLong(0), r.getInt(1))),
        df.queryExecution.optimizedPlan.toString())
    }
    assert(got.length === expected.length)
    assert(got.sameElements(expected))
    assert(optimized.contains("AttachDistributedSequence"),
      s"expected the distributed-sequence rank in:\n$optimized")
    assert(!optimized.contains("window"),
      s"expected the single-task window to be gone from:\n$optimized")
  }

  test("partitioned and non-row_number windows are left untouched") {
    withExtendedSession { s =>
      val partitioned = s.sql(
        s"""SELECT c_custkey,
           |  row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS rn
           |FROM parquet.`$sf/customer.parquet`""".stripMargin)
      assert(!partitioned.queryExecution.optimizedPlan.toString()
        .contains("AttachDistributedSequence"))

      val ntile = s.sql(
        s"""SELECT c_custkey, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS q
           |FROM parquet.`$sf/customer.parquet`""".stripMargin)
      assert(!ntile.queryExecution.optimizedPlan.toString()
        .contains("AttachDistributedSequence"))
      // and they still execute correctly
      assert(partitioned.count() > 0 && ntile.count() > 0)
    }
  }

  test("rewrite composes under further operators (filter + join downstream)") {
    withExtendedSession { s =>
      val df = s.sql(
        s"""WITH ranked AS (
           |  SELECT c_custkey, c_nationkey,
           |    row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn
           |  FROM parquet.`$sf/customer.parquet`)
           |SELECT n.n_name, count(*) AS n_top
           |FROM ranked r JOIN parquet.`$sf/nation.parquet` n
           |  ON r.c_nationkey = n.n_nationkey
           |WHERE r.rn <= 50
           |GROUP BY n.n_name
           |ORDER BY n.n_name""".stripMargin)
      val got = df.collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.map(_._2).sum === 50L)
      assert(df.queryExecution.optimizedPlan.toString()
        .contains("AttachDistributedSequence"))
    }
  }

  test("ranks stay sound with ties, pruned non-sort columns, and AQE coalescing") {
    // The round-3 two-branch rewrite silently corrupted ranks exactly
    // here: selecting a non-sort column let column pruning diverge the
    // two range exchanges, AQE coalesced them differently, and offsets
    // no longer described the partitions the ranks were computed in.
    // The single-lineage rewrite must survive this shape: a heavily
    // tied sort key, extra projected columns, multi-partition input.
    withExtendedSession { s =>
      s.read.parquet(s"$sf/customer.parquet").repartition(7)
        .createOrReplaceTempView("cust7")
      val df = s.sql(
        """SELECT c_name, c_mktsegment,
          |  row_number() OVER (ORDER BY c_mktsegment) AS rn
          |FROM cust7""".stripMargin)
      assert(df.queryExecution.optimizedPlan.toString()
        .contains("AttachDistributedSequence"))
      val rows = df.collect().map(r => (r.getString(1), r.getInt(2))).sortBy(_._2)
      // rn is a gapless permutation of 1..N…
      assert(rows.map(_._2).toSeq === (1 to rows.length))
      // …and never contradicts the sort key (segments non-decreasing)
      assert(rows.map(_._1).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        "a row with a smaller rank carried a larger sort key")
    }
  }
}
