package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** COLUMN DROP with TOMBSTONES ([[TxnLake.dropColumn]]): the field
  * leaves the manifest schema without touching a file, and a later
  * re-add of the same name gets a FRESH physical identity — ghost bytes
  * in old files can never resurrect. */
class DropColumnSpec extends AnyFunSuite with SparkTestSession {

  private def fresh(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_drop").resolve("t").toString
    TxnLake.create(spark, dir,
      (1L to 6L).map(i => (i, s"n$i", s"p${i % 2}", i * 10.0))
        .toDF("id", "name", "part", "score"),
      "part")
    dir
  }

  test("drop is metadata-only; the column vanishes, files stay, time travel keeps it") {
    val dir = fresh()
    val before = TxnLake.resolve(spark, dir).get.files.map(_.path).toSet
    TxnLake.dropColumn(spark, dir, "score")
    val m = TxnLake.resolve(spark, dir).get
    assert(m.files.map(_.path).toSet === before)
    assert(m.tombstones === Set("score"))
    assert(TxnLake.read(spark, dir).columns.toSeq === Seq("id", "name", "part"))
    assert(TxnLake.readVersion(spark, dir, 0L).columns.contains("score"))
  }

  test("re-adding a dropped name mints a fresh physical column — no ghost resurrection") {
    import spark.implicits._
    val dir = fresh()
    TxnLake.dropColumn(spark, dir, "score")
    // schema evolution re-adds `score` via upsert; old rows must read
    // NULL, never the dead values still sitting in the v0 files
    TxnLake.upsert(spark, dir,
      Seq((2L, "n2", "p0", 999.0)).toDF("id", "name", "part", "score"), "id")
    val got = TxnLake.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getAs[Any]("score")))).toSeq
    assert(got.find(_._1 == 2L).get._2 === Some(999.0))
    // id=1 lives in the REWRITTEN partition p0 (null-filled there), but
    // ids 3/5 still live in untouched v0 files that physically contain
    // the old `score` bytes — the fresh physical name must shield them
    assert(got.filter(t => t._1 != 2L).forall(_._2.isEmpty),
      s"ghost values resurrected: $got")
    val m = TxnLake.resolve(spark, dir).get
    assert(m.renames.values.toSet.contains("score"),
      "the reborn column must map through a fresh physical name")
  }

  test("dropping a renamed column tombstones its physical name") {
    val dir = fresh()
    TxnLake.renameColumn(spark, dir, "score", "points")
    TxnLake.dropColumn(spark, dir, "points")
    val m = TxnLake.resolve(spark, dir).get
    assert(m.tombstones === Set("score"), "the PHYSICAL name is what dies")
    assert(m.renames.isEmpty)
    assert(TxnLake.read(spark, dir).columns.toSeq === Seq("id", "name", "part"))
  }

  test("structural columns refuse to drop; the last column refuses") {
    val dir = fresh()
    intercept[IllegalArgumentException] { TxnLake.dropColumn(spark, dir, "part") }
    intercept[IllegalArgumentException] { TxnLake.dropColumn(spark, dir, "nope") }
  }

  test("writes and reads after a drop work end to end; restore reinstates the column") {
    import spark.implicits._
    val dir = fresh()
    TxnLake.dropColumn(spark, dir, "name")
    TxnLake.append(spark, dir, Seq((7L, "p1", 70.0)).toDF("id", "part", "score"))
    assert(TxnLake.read(spark, dir).count() === 7L)
    assert(TxnLake.read(spark, dir).agg(sum(col("score"))).head().getDouble(0) ===
      (1 to 6).map(_ * 10.0).sum + 70.0)
    TxnLake.restore(spark, dir, 0L)
    val df = TxnLake.read(spark, dir)
    assert(df.columns.contains("name") && df.count() === 6L)
  }
}
