package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkTestSession {

  test("binned interval join equals the naive range join on real events") {
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))

    val naive = {
      val a = e.select(col("user_id").as("u"), col("event_id").as("id_a"), col("ts").as("tsa"))
      val b = e.select(col("user_id").as("u2"), col("event_id").as("id_b"), col("ts").as("tsb"))
      a.join(b, col("u") === col("u2") && col("id_a") < col("id_b") &&
          col("tsb") >= col("tsa") && col("tsb") <= col("tsa") + expr("INTERVAL 60 SECONDS"))
        .select(col("id_a"), col("id_b"))
    }
    val binned = RangeJoin
      .pairsWithin(e, "user_id", "event_id", "ts", 60)
      .select(col("id_a"), col("id_b"))

    assert(binned.count() === naive.count())
    assert(binned.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(binned).count() === 0)
  }

  test("inclusive boundary: a pair exactly `seconds` apart is kept") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00")), // exactly 60s
      (1L, 3L, java.sql.Timestamp.valueOf("2024-01-01 00:02:01")) // 61s after id 2
    ).toDF("user_id", "event_id", "ts")
    val pairs = RangeJoin.pairsWithin(df, "user_id", "event_id", "ts", 60)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
