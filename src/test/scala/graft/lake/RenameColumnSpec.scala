package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** COLUMN RENAME via NAME MAPPING ([[TxnLake.renameColumn]]): files keep
  * frozen physical names; the manifest maps them to logical names at
  * the read/write boundary. Metadata-only, no rewrite, ever. */
class RenameColumnSpec extends AnyFunSuite with SparkTestSession {

  private def fresh(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rn").resolve("t").toString
    TxnLake.create(spark, dir,
      (1L to 6L).map(i => (i, s"n$i", s"p${i % 2}", i * 1.5))
        .toDF("id", "name", "part", "price"),
      "part")
    dir
  }

  test("rename is metadata-only; readers see the new name, values intact") {
    val dir = fresh()
    val before = TxnLake.resolve(spark, dir).get.files.map(_.path).toSet
    TxnLake.renameColumn(spark, dir, "price", "price_usd")
    val m = TxnLake.resolve(spark, dir).get
    assert(m.files.map(_.path).toSet === before, "no data file may move")
    val df = TxnLake.read(spark, dir)
    assert(df.columns.toSeq === Seq("id", "name", "part", "price_usd"))
    assert(df.agg(sum(col("price_usd"))).head().getDouble(0) === (1 to 6).map(_ * 1.5).sum)
    // time travel shows each version under its own names
    assert(TxnLake.readVersion(spark, dir, 0L).columns.contains("price"))
  }

  test("writes after a rename use the logical name; new files keep the PHYSICAL name") {
    import spark.implicits._
    val dir = fresh()
    TxnLake.renameColumn(spark, dir, "price", "price_usd")
    TxnLake.upsert(spark, dir,
      Seq((2L, "n2x", "p0", 99.0), (7L, "n7", "p1", 7.5))
        .toDF("id", "name", "part", "price_usd"), "id")
    val df = TxnLake.read(spark, dir)
    assert(df.filter(col("id") === 2L).select("price_usd").head().getDouble(0) === 99.0)
    assert(df.count() === 7L)
    // the rewritten files physically carry the frozen name
    val m = TxnLake.resolve(spark, dir).get
    val raw = spark.read.parquet(m.files.map(f => s"$dir/${f.path}"): _*)
    assert(raw.columns.contains("price") && !raw.columns.contains("price_usd"),
      "physical names must never change")
    // chained rename collapses onto the same physical key
    TxnLake.renameColumn(spark, dir, "price_usd", "price_eur")
    assert(TxnLake.read(spark, dir).columns.contains("price_eur"))
    assert(TxnLake.resolve(spark, dir).get.renames === Map("price" -> "price_eur"))
  }

  test("deleteWhere, CDC and changes() speak the logical name") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rn").resolve("cdc").toString
    TxnLake.create(spark, dir,
      (1L to 6L).map(i => (i, s"p${i % 2}", i * 1.0)).toDF("id", "part", "v"),
      "part", changeFeed = true)
    TxnLake.renameColumn(spark, dir, "v", "score")
    assert(TxnLake.deleteWhere(spark, dir, col("score") > 4.0) === 2L)
    val feed = graft.streaming.CdcFeed.batch(spark, dir, fromVersion = 2L)
    assert(feed.columns.contains("score"))
    assert(feed.filter(col(TxnLake.ChangeTypeCol) === "delete")
      .select("id").collect().map(_.getLong(0)).toSet === Set(5L, 6L))
    // appends on renamed tables encode the feed explicitly (no byte copy)
    TxnLake.append(spark, dir, Seq((9L, "p1", 9.0)).toDF("id", "part", "score"))
    val ins = graft.streaming.CdcFeed.batch(spark, dir, fromVersion = 3L)
    assert(ins.filter(col("id") === 9L).select("score").head().getDouble(0) === 9.0)
    val diff = TxnLake.changes(spark, dir, 2L, 3L, "id")
    assert(diff.columns.contains("score") && diff.count() === 1L)
  }

  test("restore reinstates the names of the restored version; graft-txn serves logical names") {
    val dir = fresh()
    TxnLake.renameColumn(spark, dir, "name", "title")
    val df = spark.read.format("graft-txn").load(dir)
    assert(df.columns.toSeq === Seq("id", "title", "part", "price"))
    assert(df.filter(col("title") === "n3").count() === 1L)
    TxnLake.restore(spark, dir, 0L)
    assert(TxnLake.read(spark, dir).columns.contains("name"))
  }

  test("renames are layout changes: a staged rewrite from before one aborts") {
    import spark.implicits._
    val dir = fresh()
    val base = TxnLake.resolve(spark, dir).get
    val staged = TxnLake.stageMerge(spark, dir, base,
      Seq((1L, "nx", "p1", 1.0)).toDF("id", "name", "part", "price"), "id")
    TxnLake.renameColumn(spark, dir, "price", "cost")
    intercept[java.util.ConcurrentModificationException] {
      TxnLake.commitStaged(spark, dir, staged.get)
    }
    assert(TxnLake.read(spark, dir).columns.contains("cost"))
  }

  test("partition/stats columns refuse renames; collisions refuse") {
    import spark.implicits._
    val dir = fresh()
    intercept[IllegalArgumentException] {
      TxnLake.renameColumn(spark, dir, "part", "bucket")
    }
    intercept[IllegalArgumentException] {
      TxnLake.renameColumn(spark, dir, "price", "name") // collides
    }
    intercept[IllegalArgumentException] {
      TxnLake.renameColumn(spark, dir, "nope", "x")
    }
  }
}
