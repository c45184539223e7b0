package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class IncrementalViewSpec extends AnyFunSuite with SparkTestSession {

  private def freshDir(): String =
    Files.createTempDirectory("graft_iv").resolve("t").toString

  private def mkTable(): String = {
    import spark.implicits._
    val dir = freshDir()
    TxnLake.create(spark, dir,
      Seq((1L, "p1", BigDecimal("10.00")), (2L, "p1", BigDecimal("20.00")),
        (3L, "p2", BigDecimal("30.00")), (4L, "p2", BigDecimal("40.00")),
        (5L, "p3", BigDecimal("50.00")))
        .toDF("id", "part", "amt")
        .withColumn("amt", col("amt").cast("decimal(12,2)")),
      "part")
    dir
  }

  test("preimage dialect: updated keys emit balanced pre+post rows; inserts and deletes single rows") {
    import spark.implicits._
    val dir = mkTable()
    TxnLake.upsert(spark, dir,
      Seq((2L, "p1", BigDecimal("99.00")), (6L, "p3", BigDecimal("60.00")))
        .toDF("id", "part", "amt").withColumn("amt", col("amt").cast("decimal(12,2)")),
      "id")
    TxnLake.delete(spark, dir, Seq(3L).toDF("id"), "id")
    val feed = TxnLake.changes(spark, dir, 0L, 2L, "id", preimages = true)
      .select(col("id"), col("amt").cast("string").as("amt"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(feed === Set(
      (2L, "99.00", "update_postimage"),
      (2L, "20.00", "update_preimage"),
      (6L, "60.00", "insert"),
      (3L, "30.00", "delete")))
  }

  test("incremental maintenance equals a full rebuild after upsert + delete") {
    import spark.implicits._
    val dir = mkTable()
    val mv0 = IncrementalView.build(TxnLake.readVersion(spark, dir, 0L),
      Seq("part"), Seq("amt"))
    TxnLake.upsert(spark, dir,
      Seq((1L, "p1", BigDecimal("11.00")), (6L, "p4", BigDecimal("60.00")),
        (4L, "p1", BigDecimal("44.00"))) // cross-partition move p2 -> p1
        .toDF("id", "part", "amt").withColumn("amt", col("amt").cast("decimal(12,2)")),
      "id")
    TxnLake.delete(spark, dir, Seq(5L).toDF("id"), "id")
    val feed = TxnLake.changes(spark, dir, 0L, 2L, "id", preimages = true)
    val incr = IncrementalView.applyChanges(mv0, feed, Seq("part"), Seq("amt"))
    val full = IncrementalView.build(TxnLake.read(spark, dir), Seq("part"), Seq("amt"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("part"), col("n"), col("sum_amt").cast("string").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(canon(incr) === canon(full))
    // p3 lost its only row (id 5 deleted): the group must drop out entirely
    assert(!canon(incr).exists(_._1 == "p3"))
    // p4 is a brand-new group introduced purely by the feed
    assert(canon(incr).exists(t => t._1 == "p4" && t._2 == 1L))
  }

  test("plain (non-preimage) dialect is rejected — subtraction would be impossible") {
    import spark.implicits._
    val dir = mkTable()
    TxnLake.upsert(spark, dir,
      Seq((2L, "p1", BigDecimal("99.00"))).toDF("id", "part", "amt")
        .withColumn("amt", col("amt").cast("decimal(12,2)")), "id")
    val mv0 = IncrementalView.build(TxnLake.readVersion(spark, dir, 0L),
      Seq("part"), Seq("amt"))
    val plainFeed = TxnLake.changes(spark, dir, 0L, 1L, "id") // no preimages
    val ex = intercept[Exception] {
      IncrementalView.applyChanges(mv0, plainFeed, Seq("part"), Seq("amt")).collect()
    }
    assert(ex.getMessage.contains("preimage"))
  }

  test("repeated maintenance across commit ranges composes (v0->v1 then v1->v2)") {
    import spark.implicits._
    val dir = mkTable()
    val mv0 = IncrementalView.build(TxnLake.readVersion(spark, dir, 0L),
      Seq("part"), Seq("amt"))
    TxnLake.upsert(spark, dir,
      Seq((2L, "p2", BigDecimal("25.00"))).toDF("id", "part", "amt")
        .withColumn("amt", col("amt").cast("decimal(12,2)")), "id")
    TxnLake.delete(spark, dir, Seq(1L).toDF("id"), "id")
    val mv1 = IncrementalView.applyChanges(mv0,
      TxnLake.changes(spark, dir, 0L, 1L, "id", preimages = true), Seq("part"), Seq("amt"))
    val mv2 = IncrementalView.applyChanges(mv1,
      TxnLake.changes(spark, dir, 1L, 2L, "id", preimages = true), Seq("part"), Seq("amt"))
    val full = IncrementalView.build(TxnLake.read(spark, dir), Seq("part"), Seq("amt"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("part"), col("n"), col("sum_amt").cast("string").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(canon(mv2) === canon(full))
  }
}
