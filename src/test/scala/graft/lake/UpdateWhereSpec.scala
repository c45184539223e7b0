package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Row-level `UPDATE ... SET` ([[TxnLake.updateWhere]]): merge-on-read —
  * matched rows are DV-doomed, post-images staged as new files, one
  * atomic commit publishes both. */
class UpdateWhereSpec extends AnyFunSuite with SparkTestSession {

  private def freshTable(changeFeed: Boolean = false): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_upd").resolve("t").toString
    TxnLake.create(spark, dir,
      (1L to 12L).map(i => (i, i * 10.0, s"p${i % 3}")).toDF("id", "price", "part"),
      "part", statsCol = Some("price"), changeFeed = changeFeed)
    dir
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select("id", "price").collect().map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq.sortBy(_._1)

  test("update rewrites matched rows only, without rewriting their files") {
    val dir = freshTable()
    val before = TxnLake.resolve(spark, dir).get.files
    val n = TxnLake.updateWhere(spark, dir, col("id") <= 4L,
      Map("price" -> (col("price") * 2)))
    assert(n === 4L)
    assert(rows(TxnLake.read(spark, dir)) ===
      (1L to 12L).map(i => (i, if (i <= 4) i * 20.0 else i * 10.0)))
    val after = TxnLake.resolve(spark, dir).get.files
    // every pre-existing file is still present (DV'd, not rewritten)
    assert(before.map(_.path).toSet.subsetOf(after.map(_.path).toSet))
    assert(after.exists(_.dv.nonEmpty), "matched files must carry the sidecar")
    assert(after.size > before.size, "post-images land as NEW files")
    // row count is stable: no row doubled or lost
    assert(TxnLake.read(spark, dir).count() === 12L)
  }

  test("snapshot isolation: the pre-update version reads bit-identically") {
    val dir = freshTable()
    TxnLake.updateWhere(spark, dir, col("id") === 1L, Map("price" -> lit(999.0)))
    assert(rows(TxnLake.readVersion(spark, dir, 0L)) ===
      (1L to 12L).map(i => (i, i * 10.0)))
    assert(rows(TxnLake.read(spark, dir)).head === ((1L, 999.0)))
  }

  test("no match = no commit; unknown SET column fails loudly") {
    val dir = freshTable()
    val v0 = TxnLake.resolve(spark, dir).get.version
    assert(TxnLake.updateWhere(spark, dir, col("id") > 100L,
      Map("price" -> lit(0.0))) === 0L)
    assert(TxnLake.resolve(spark, dir).get.version === v0)
    intercept[IllegalArgumentException] {
      TxnLake.updateWhere(spark, dir, col("id") === 1L, Map("nope" -> lit(1)))
    }
  }

  test("updating the partition column migrates rows between partitions") {
    val dir = freshTable()
    val n = TxnLake.updateWhere(spark, dir, col("part") === "p0",
      Map("part" -> lit("p9")))
    assert(n === 4L)
    val df = TxnLake.read(spark, dir)
    assert(df.filter(col("part") === "p0").count() === 0L)
    assert(df.filter(col("part") === "p9").count() === 4L)
    assert(df.count() === 12L)
    // the new partition value is visible to manifest pruning
    val m = TxnLake.resolve(spark, dir).get
    assert(m.files.exists(_.parts.contains(Some("p9"))))
  }

  test("change feed emits update_preimage / update_postimage pairs") {
    val dir = freshTable(changeFeed = true)
    TxnLake.updateWhere(spark, dir, col("id") === 2L,
      Map("price" -> (col("price") + 5.0)))
    val v = TxnLake.resolve(spark, dir).get.version
    val feed = graft.streaming.CdcFeed.batch(spark, dir, fromVersion = v)
      .select("id", "price", TxnLake.ChangeTypeCol).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(feed === Set((2L, 20.0, "update_preimage"), (2L, 25.0, "update_postimage")))
  }

  test("nondeterministic predicates are rejected (Delta's UPDATE/DELETE rule)") {
    val dir = freshTable()
    // rand() could doom one row set while staging post-images for
    // another — rejected before any sidecar is written
    val e = intercept[IllegalArgumentException] {
      TxnLake.updateWhere(spark, dir, rand() < 0.5, Map("price" -> lit(0.0)))
    }
    assert(e.getMessage.contains("deterministic"))
    intercept[IllegalArgumentException] {
      TxnLake.deleteWhere(spark, dir, rand() < 0.5)
    }
    assert(TxnLake.resolve(spark, dir).get.version === 0L, "no commit landed")
    assert(TxnLake.read(spark, dir).count() === 12L)
  }

  test("a type-changing SET is cast back to the table's column type") {
    val dir = freshTable()
    // an int literal into the double `price` column: without the cast,
    // staged files would carry INT price and the snapshot schema
    // (DOUBLE) could not decode them
    val n = TxnLake.updateWhere(spark, dir, col("id") === 3L,
      Map("price" -> lit(7)))
    assert(n === 1L)
    val got = TxnLake.read(spark, dir).filter(col("id") === 3L)
      .select("price").collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(7.0))
    assert(TxnLake.read(spark, dir).schema("price").dataType ===
      org.apache.spark.sql.types.DoubleType)
  }

  test("update composes with renamed columns: SET by logical name") {
    val dir = freshTable()
    TxnLake.renameColumn(spark, dir, "id", "ident")
    val n = TxnLake.updateWhere(spark, dir, col("ident") === 1L,
      Map("ident" -> lit(100L), "price" -> lit(11.0)))
    assert(n === 1L)
    val got = TxnLake.read(spark, dir).filter(col("ident") === 100L)
      .select("price").collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(11.0))
    assert(TxnLake.read(spark, dir).filter(col("ident") === 1L).count() === 0L)
  }
}
