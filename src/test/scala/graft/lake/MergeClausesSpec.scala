package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[TxnLake.merge]] — full MERGE with a delete clause, one atomic
  * commit:
  *   WHEN MATCHED AND deleteWhen(target) THEN DELETE
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  */
class MergeClausesSpec extends AnyFunSuite with SparkTestSession {

  private def freshTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge").resolve("t").toString
    TxnLake.create(spark, dir,
      Seq((1L, 10L, "p1"), (2L, 200L, "p1"), (3L, 30L, "p2"), (4L, 400L, "p3"))
        .toDF("id", "v", "part"),
      "part", changeFeed = true)
    dir
  }

  private def rows(dir: String): Seq[(Long, Long, String)] =
    TxnLake.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("v"), r.getAs[String]("part"))).toSeq

  test("matched+deleteWhen deletes, matched updates, unmatched inserts — one commit") {
    import spark.implicits._
    val dir = freshTable()
    val v0 = TxnLake.history(spark, dir).count()
    // source touches 1 (matched, v=10 small -> update), 2 (matched,
    // v=200 large -> DELETE: source row withheld), 5 (unmatched -> insert)
    TxnLake.merge(spark, dir,
      Seq((1L, 11L, "p1"), (2L, 999L, "p1"), (5L, 50L, "p2")).toDF("id", "v", "part"),
      "id", deleteWhen = col("v") > 100)
    assert(rows(dir) === Seq((1L, 11L, "p1"), (3L, 30L, "p2"), (4L, 400L, "p3"),
      (5L, 50L, "p2")))
    // exactly ONE commit for all three clauses
    assert(TxnLake.history(spark, dir).count() === v0 + 1)
  }

  test("deleteWhen evaluates the TARGET pre-image, not the source row") {
    import spark.implicits._
    val dir = freshTable()
    // source v=999 for key 1 (target v=10): target row small -> UPDATE
    // applies even though the incoming value is large
    TxnLake.merge(spark, dir,
      Seq((1L, 999L, "p1")).toDF("id", "v", "part"), "id",
      deleteWhen = col("v") > 100)
    assert(rows(dir).head === ((1L, 999L, "p1")))
  }

  test("untouched partitions keep their files; CDC carries all three classes") {
    import spark.implicits._
    val dir = freshTable()
    val before = TxnLake.detail(spark, dir).select("path").collect().map(_.getString(0)).toSet
    TxnLake.merge(spark, dir,
      Seq((1L, 11L, "p1"), (2L, 999L, "p1"), (5L, 50L, "p2")).toDF("id", "v", "part"),
      "id", deleteWhen = col("v") > 100)
    val after = TxnLake.detail(spark, dir).select("path").collect().map(_.getString(0)).toSet
    // p3 (key 4) was never touched — its file survives the merge
    assert((before -- after).nonEmpty) // p1/p2 rewritten
    assert((before intersect after).nonEmpty) // p3 untouched
    val v = TxnLake.history(spark, dir).agg(max("version")).head().getLong(0)
    val cdc = graft.streaming.CdcFeed.batch(spark, dir, fromVersion = v)
      .select(col("id"), col(TxnLake.ChangeTypeCol)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cdc === Set((1L, "update_preimage"), (1L, "update_postimage"),
      (2L, "delete"), (5L, "insert")))
  }

  test("merge with lit(false) deleteWhen degenerates to upsert") {
    import spark.implicits._
    val dir = freshTable()
    TxnLake.merge(spark, dir,
      Seq((2L, 5L, "p1"), (6L, 60L, "p1")).toDF("id", "v", "part"), "id",
      deleteWhen = lit(false))
    assert(rows(dir) === Seq((1L, 10L, "p1"), (2L, 5L, "p1"), (3L, 30L, "p2"),
      (4L, 400L, "p3"), (6L, 60L, "p1")))
  }
}
