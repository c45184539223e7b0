package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run at sf0.001 and produce rows, and every
  * oracle key must reference a registered query. Value-level correctness
  * is checked by the DuckDB oracle (driver + scripts/check_parity.py);
  * this spec guards the registry itself. */
class QueriesSmokeSpec extends AnyFunSuite with SparkTestSession {

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q35: HLL approx distinct stays within 10% of exact") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q35_approx_distinct")(spark, sf)
      .select(col("exact_orders"), col("approx_orders")).collect()
    rows.foreach { r =>
      val exact = r.getLong(0).toDouble
      val err = math.abs(r.getLong(1) - exact) / exact
      assert(err <= 0.10, s"HLL error $err for exact=$exact")
    }
  }

  test("q46: approx quantile within 5% of exact") {
    import org.apache.spark.sql.functions.col
    SparkEntry.queries("q46_approx_quantile")(spark, sf)
      .select(col("exact_median"), col("approx_median")).collect().foreach { r =>
        val err = math.abs(r.getDouble(1) - r.getDouble(0)) / r.getDouble(0)
        assert(err <= 0.05, s"approx median error $err")
      }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows — vacuous oracle check")
    }
  }
}
