package graft.lake

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class MergeIntoSpec extends AnyFunSuite with SparkTestSession {

  private def freshTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge").resolve("t").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "amount")
      .write.parquet(dir)
    dir
  }

  test("upsert updates matched keys and inserts unmatched ones") {
    import spark.implicits._
    val dir = freshTable()
    val updates = Seq((2L, "b2", 22.0), (4L, "d", 40.0)).toDF("id", "name", "amount")
    MergeInto.upsert(spark, dir, updates, "id")
    val got = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "b2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert is idempotent for identical updates") {
    import spark.implicits._
    val dir = freshTable()
    val updates = Seq((2L, "b2", 22.0)).toDF("id", "name", "amount")
    MergeInto.upsert(spark, dir, updates, "id")
    MergeInto.upsert(spark, dir, updates, "id")
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("deleteWhere removes only matching rows") {
    val dir = freshTable()
    MergeInto.deleteWhere(spark, dir, "amount >= 20.0")
    val got = spark.read.parquet(dir).collect()
    assert(got.length === 1 && got(0).getLong(0) === 1L)
  }

  test("NULL merge keys are rejected instead of corrupting the table") {
    import spark.implicits._
    val dir = freshTable()
    val bad = Seq((Some(2L), "x", 1.0), (None, "lost", 2.0))
      .toDF("id", "name", "amount")
    assertThrows[IllegalArgumentException](MergeInto.upsert(spark, dir, bad, "id"))
    // table untouched
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("schema mismatch is rejected") {
    import spark.implicits._
    val dir = freshTable()
    val bad = Seq((1L, "x")).toDF("id", "name")
    assertThrows[IllegalArgumentException](MergeInto.upsert(spark, dir, bad, "id"))
  }
}
