package graft.functions

import graft.{SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite with SparkTestSession {

  test("custom expressions are callable from plain SQL after registration") {
    GraftFunctions.register(spark)
    val wkt = spark.sql(
      "SELECT wkt_normalize('1,MULTIPOLYGON (((-73.1 40.1, -73.2 40.2))),x') AS v")
      .collect()(0).getString(0)
    assert(wkt === "1,-73.1:40.1::-73.2:40.2,x")

    val cos = spark.sql(
      "SELECT cosine_similarity(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c")
      .collect()(0).getDouble(0)
    assert(cos === 1.0)

    Tables.orders(spark, sf).createOrReplaceTempView("orders_gf")
    val topk = spark.sql(
      """SELECT o_orderpriority, top_k_by(o_totalprice, o_orderkey, 3) AS top
        |FROM orders_gf GROUP BY o_orderpriority ORDER BY o_orderpriority
        |LIMIT 1""".stripMargin).collect()(0)
    assert(topk.getSeq[Long](1).length === 3)
  }

  test("top_k_by rejects a non-literal k with a clear error") {
    GraftFunctions.register(spark)
    Tables.orders(spark, sf).createOrReplaceTempView("orders_gf2")
    val e = intercept[Exception](
      spark.sql("SELECT top_k_by(o_totalprice, o_orderkey, o_custkey) FROM orders_gf2").collect())
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getCause != null && e.getCause.getMessage.toLowerCase.contains("literal"))
  }
}
