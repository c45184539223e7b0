package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q62's exact-decimal co-moment statistics must agree with Spark's
  * built-in streaming implementations (corr / covar_samp / stddev_samp /
  * regr_slope / regr_intercept) to float tolerance — the decimal path
  * exists for cross-engine bit-stability, not different semantics. */
class StatsAggSpec extends AnyFunSuite with SparkTestSession {

  test("q62 decimal-path statistics match Spark's built-in aggregates") {
    val got = SparkEntry.queries("q62_stats_agg")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        stddev_samp(col("l_quantity")).as("sd"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("sl"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("ic"))
      .collect()
    assert(builtin.nonEmpty)
    builtin.foreach { r =>
      val g = got(r.getString(0))
      def close(a: Double, b: Double, what: String): Unit =
        assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(b)),
          s"${r.getString(0)} $what: decimal path $a vs builtin $b")
      close(g.getDouble(2), r.getDouble(1), "corr")
      close(g.getDouble(3), r.getDouble(2), "covar_samp")
      close(g.getDouble(4), r.getDouble(3), "stddev_samp")
      close(g.getDouble(5), r.getDouble(4), "regr_slope")
      close(g.getDouble(6), r.getDouble(5), "regr_intercept")
    }
  }

  test("statistics stay in their mathematical ranges") {
    // the synthetic generator draws price and quantity independently,
    // so corr sits near 0 — assert the hard invariants instead:
    // |corr| <= 1, stddev > 0, and slope/covar share a sign (they
    // differ by the positive factor var(x))
    val rows = SparkEntry.queries("q62_stats_agg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0, s"corr out of [-1,1]: $r")
      assert(r.getDouble(4) > 0.0, s"degenerate stddev: $r")
      assert(r.getDouble(3).sign === r.getDouble(5).sign,
        s"covar and slope must share a sign: $r")
    }
  }
}
