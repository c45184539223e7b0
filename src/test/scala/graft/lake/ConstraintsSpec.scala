package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class ConstraintsSpec extends AnyFunSuite with SparkTestSession {

  private def freshDir(): String =
    Files.createTempDirectory("graft_ck").resolve("t").toString

  private val checks = Seq(
    "positive_amount" -> (col("amount") > 0),
    "known_part" -> col("part").isin("p1", "p2"))

  test("appendChecked splits a batch: passing rows commit, violations quarantine with first-failing reason") {
    import spark.implicits._
    val dir = freshDir()
    TxnLake.create(spark, dir,
      Seq((1L, 10.0, "p1")).toDF("id", "amount", "part"), "part")
    val batch = Seq(
      (2L, 5.0, "p1"),    // clean
      (3L, -1.0, "p1"),   // positive_amount
      (4L, 7.0, "px"),    // known_part
      (5L, -2.0, "px"))   // both fail -> FIRST declared wins
      .toDF("id", "amount", "part")
    val (nTable, nQuar) =
      Constraints.appendChecked(spark, dir, batch, checks, dir + "_q")
    assert((nTable, nQuar) === (2L, 3L))
    assert(TxnLake.read(spark, dir).orderBy("id").collect()
      .map(r => r.getAs[Long]("id")).toSeq === Seq(1L, 2L))
    val quar = spark.read.parquet(dir + "_q")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("violation")).toMap
    assert(quar === Map(3L -> "positive_amount", 4L -> "known_part",
      5L -> "positive_amount"))
  }

  test("NULL predicate result fails closed (quarantined, not committed)") {
    import spark.implicits._
    val dir = freshDir()
    TxnLake.create(spark, dir,
      Seq((1L, 10.0, "p1")).toDF("id", "amount", "part"), "part")
    val batch = Seq((2L, Option.empty[Double], Option("p1")))
      .toDF("id", "amount", "part")
    val (_, nQuar) =
      Constraints.appendChecked(spark, dir, batch, checks, dir + "_q")
    assert(nQuar === 1L)
    assert(spark.read.parquet(dir + "_q").select("violation")
      .collect().map(_.getString(0)).toSeq === Seq("positive_amount"),
      "NULL > 0 is UNKNOWN; the gate must treat it as a violation")
  }

  test("all-passing batch commits everything and writes an empty quarantine partition set") {
    import spark.implicits._
    val dir = freshDir()
    TxnLake.create(spark, dir,
      Seq((1L, 10.0, "p1")).toDF("id", "amount", "part"), "part")
    val (nTable, nQuar) = Constraints.appendChecked(spark, dir,
      Seq((2L, 1.0, "p2")).toDF("id", "amount", "part"), checks, dir + "_q")
    assert((nTable, nQuar) === (2L, 0L))
  }

  test("input already carrying the violation column is rejected") {
    import spark.implicits._
    val dir = freshDir()
    TxnLake.create(spark, dir,
      Seq((1L, 10.0, "p1")).toDF("id", "amount", "part"), "part")
    val bad = Seq((2L, 1.0, "p1", "x")).toDF("id", "amount", "part", "violation")
    intercept[IllegalArgumentException] {
      Constraints.appendChecked(spark, dir, bad, checks, dir + "_q")
    }
  }
}
