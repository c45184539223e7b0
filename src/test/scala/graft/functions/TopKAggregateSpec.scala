package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregateSpec extends AnyFunSuite with SparkTestSession {

  test("heap aggregate equals the window row_number idiom on real data") {
    val o = Tables.orders(spark, sf)
    val viaAgg = o.groupBy(col("o_orderpriority"))
      .agg(TopKAggregate.topKBy(col("o_totalprice"), col("o_orderkey"), 5).as("top"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy(col("o_orderpriority"))
      .agg(sort_array(collect_list(struct(col("rn"), col("o_orderkey")))).as("s"))
      .select(col("o_orderpriority"),
        expr("transform(s, x -> x.o_orderkey)").as("top"))
    val a = viaAgg.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val b = viaWindow.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(a === b)
  }

  test("ties at the boundary keep the smaller payload; groups smaller than k return all") {
    import spark.implicits._
    val df = Seq(
      ("g1", 5.0, 10L), ("g1", 5.0, 7L), ("g1", 9.0, 3L), ("g1", 1.0, 99L),
      ("g2", 2.0, 1L)
    ).toDF("g", "s", "p")
    val got = df.groupBy(col("g"))
      .agg(TopKAggregate.topKBy(col("s"), col("p"), 2).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("g1") === Seq(3L, 7L)) // 9.0 first, then the tie at 5.0 -> smaller payload
    assert(got("g2") === Seq(1L))
  }

  test("partial aggregation path: many partitions merge correctly") {
    import spark.implicits._
    val df = spark.range(0, 10000).repartition(16)
      .select((col("id") % 4).cast("string").as("g"),
        col("id").cast("double").as("s"), col("id").as("p"))
    val got = df.groupBy(col("g"))
      .agg(TopKAggregate.topKBy(col("s"), col("p"), 3).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("0") === Seq(9996L, 9992L, 9988L))
    assert(got("3") === Seq(9999L, 9995L, 9991L))
  }
}
