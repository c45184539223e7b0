package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite with SparkTestSession {

  test("exact below k: small groups report their true distinct count") {
    import spark.implicits._
    val df = (1 to 30).map(i => ("g", i.toLong)).toDF("g", "v")
      .union(Seq(("h", 1L), ("h", 1L), ("h", 2L)).toDF("g", "v"))
    val got = df.groupBy("g").agg(KmvSketch.kmvDistinct(col("v"), 64).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("g") === 30.0)
    assert(got("h") === 2.0)
  }

  test("estimation path: within KMV error bounds on the orders fixture") {
    val o = Tables.orders(spark, sf)
    val rows = o.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact"),
        KmvSketch.kmvDistinct(col("o_custkey"), 64).as("est"))
      .collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(2)
      assert(exact > 64, "fixture group too small to exercise the estimation path")
      // stderr ~ 1/sqrt(k-2) ~ 12.7% at k=64; 3 sigma with margin
      val relErr = math.abs(est - exact) / exact
      assert(relErr < 0.4, s"${r.getString(0)}: est=$est exact=$exact relErr=$relErr")
    }
  }

  test("merge is order/partition-invariant: 1 vs 13 partitions, identical doubles") {
    val o = Tables.orders(spark, sf).select(col("o_orderpriority"), col("o_custkey"))
    def run(parts: Int) =
      o.repartition(parts).groupBy(col("o_orderpriority"))
        .agg(KmvSketch.kmvDistinct(col("o_custkey"), 64).as("est"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(run(1) === run(13))
  }

  test("nulls are skipped, not counted") {
    import spark.implicits._
    val df = Seq(("g", Some(1L)), ("g", None), ("g", Some(2L))).toDF("g", "v")
    val got = df.groupBy("g").agg(KmvSketch.kmvDistinct(col("v"), 8).as("est"))
      .collect().head.getDouble(1)
    assert(got === 2.0)
  }
}
