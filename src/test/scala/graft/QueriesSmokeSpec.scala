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

  test("q35: HLL approx distinct within tolerance of exact") {
    import org.apache.spark.sql.functions.col
    SparkEntry.queries("q35_approx_distinct")(spark, sf)
      .select(col("within_tol")).collect()
      .foreach(r => assert(r.getBoolean(0), "HLL estimate outside 5% tolerance"))
  }

  test("q46: approx quantile within tolerance of exact") {
    import org.apache.spark.sql.functions.col
    SparkEntry.queries("q46_approx_quantile")(spark, sf)
      .select(col("within_tol")).collect()
      .foreach(r => assert(r.getBoolean(0), "approx median outside 2% tolerance"))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val viewsBefore = spark.catalog.listTables().collect().map(_.name).toSet
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows — vacuous oracle check")
      // pure-builder contract: building a query must not mutate session
      // temp-view state (SqlEntry drops its uniquely-suffixed views)
      val viewsAfter = spark.catalog.listTables().collect().map(_.name).toSet
      assert(viewsAfter === viewsBefore,
        s"$name leaked temp views: ${(viewsAfter -- viewsBefore).mkString(",")}")
    }
  }
}
