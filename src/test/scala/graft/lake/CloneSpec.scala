package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** ZERO-COPY CLONE + NAMED REFS ([[TxnLake.clone]] / [[TxnLake.tag]]):
  * a clone is a metadata-only writable fork referencing the source's
  * data files in place; refs pin versions against vacuum and name them
  * for time travel. */
class CloneSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def freshSrc(): String = {
    val dir = Files.createTempDirectory("graft_clone").resolve("src").toString
    TxnLake.create(spark, dir,
      (1L to 12L).map(i => (i, i * 10.0, s"p${i % 3}")).toDF("id", "price", "part"),
      "part", statsCol = Some("price"))
    dir
  }

  private def sibling(src: String, name: String): String =
    new java.io.File(src).getParentFile.toPath.resolve(name).toString

  test("clone is metadata-only: same rows, zero data files under the clone") {
    val src = freshSrc()
    val dst = sibling(src, "fork")
    TxnLake.clone(spark, src, dst)
    assert(TxnLake.read(spark, dst).orderBy("id").collect().toSeq ===
      TxnLake.read(spark, src).orderBy("id").collect().toSeq)
    // no byte moved: the clone's data root does not even exist yet
    assert(!new java.io.File(dst, "_graft_data").exists(),
      "clone must not copy a single data file")
    // and every manifest entry points at the source root
    val m = TxnLake.resolve(spark, dst).get
    assert(m.files.nonEmpty && m.files.forall(_.base.contains(src)))
  }

  test("writes to the clone never touch source files; source is unchanged") {
    val src = freshSrc()
    val dst = sibling(src, "fork2")
    TxnLake.clone(spark, src, dst)
    val srcFilesBefore = TxnLake.resolve(spark, src).get.files.map(_.path).toSet
    // mutate the clone three ways: append, row update, predicate delete
    TxnLake.append(spark, dst, Seq((100L, 1.0, "p9")).toDF("id", "price", "part"))
    TxnLake.updateWhere(spark, dst, col("id") === 1L, Map("price" -> lit(999.0)))
    assert(TxnLake.deleteWhere(spark, dst, col("id") === 2L) === 1L)
    // clone sees its own world
    val d = TxnLake.read(spark, dst)
    assert(d.count() === 12L) // 12 - 1 deleted + 1 appended
    assert(d.filter(col("id") === 1L).select("price").head.getDouble(0) === 999.0)
    assert(d.filter(col("id") === 2L).count() === 0L)
    // source is bit-identical: same manifest files, same rows
    assert(TxnLake.resolve(spark, src).get.files.map(_.path).toSet === srcFilesBefore)
    assert(TxnLake.read(spark, src).count() === 12L)
    assert(TxnLake.read(spark, src).filter(col("id") === 1L)
      .select("price").head.getDouble(0) === 10.0)
  }

  test("clone carries the source's outstanding deletion vectors") {
    val src = freshSrc()
    TxnLake.deleteWhere(spark, src, col("id") <= 3L)
    val dst = sibling(src, "fork3")
    TxnLake.clone(spark, src, dst)
    assert(TxnLake.read(spark, dst).count() === 9L,
      "the clone must see the source snapshot's LIVE rows only")
    assert(spark.read.format("graft-txn").load(dst)
      .filter(col("id") <= 3L).count() === 0L)
  }

  test("vacuum on the source keeps clone-pinned files; dropRef releases") {
    val src = freshSrc()
    val dst = sibling(src, "fork4")
    val pin = TxnLake.clone(spark, src, dst)
    // source moves on: overwrite drops every original file by reference
    TxnLake.overwrite(spark, src,
      Seq((500L, 5.0, "q")).toDF("id", "price", "part"))
    (1 to 3).foreach(i => TxnLake.append(spark, src,
      Seq((500L + i, 5.0, "q")).toDF("id", "price", "part")))
    TxnLake.vacuum(spark, src, keepVersions = 1, graceMs = 0L)
    // the pin held: the clone still reads all 12 original rows
    assert(TxnLake.read(spark, dst).count() === 12L)
    assert(TxnLake.refs(spark, src).contains(pin))
    // release the pin: the next vacuum may drop the old files
    TxnLake.dropRef(spark, src, pin)
    TxnLake.vacuum(spark, src, keepVersions = 1, graceMs = 0L)
    assert(TxnLake.read(spark, src).count() === 4L, "source itself intact")
  }

  test("vacuum on the clone never deletes source bytes") {
    val src = freshSrc()
    val dst = sibling(src, "fork5")
    TxnLake.clone(spark, src, dst)
    // churn the clone past its retention, then vacuum hard
    (1 to 3).foreach(i => TxnLake.append(spark, dst,
      Seq((200L + i, 2.0, "p0")).toDF("id", "price", "part")))
    TxnLake.overwrite(spark, dst, Seq((900L, 9.0, "z")).toDF("id", "price", "part"))
    TxnLake.vacuum(spark, dst, keepVersions = 1, graceMs = 0L)
    assert(TxnLake.read(spark, dst).count() === 1L)
    // the source never noticed any of it
    assert(TxnLake.read(spark, src).count() === 12L)
  }

  test("named refs: tag pins a version for time travel and against vacuum") {
    val src = freshSrc()
    TxnLake.append(spark, src, Seq((50L, 5.0, "p0")).toDF("id", "price", "part"))
    TxnLake.tag(spark, src, "after-load-1") // head = v1
    (1 to 5).foreach(i => TxnLake.append(spark, src,
      Seq((60L + i, 6.0, "p1")).toDF("id", "price", "part")))
    TxnLake.vacuum(spark, src, keepVersions = 1, graceMs = 0L)
    // v1 survives vacuum because the tag pins it
    assert(TxnLake.readRef(spark, src, "after-load-1").count() === 13L)
    assert(spark.read.format("graft-txn")
      .option("refAsOf", "after-load-1").load(src).count() === 13L)
    // unknown refs fail loudly
    intercept[IllegalArgumentException] {
      TxnLake.readRef(spark, src, "nope")
    }
  }

  test("clone of a clone points at the ORIGINAL roots (no chains)") {
    val src = freshSrc()
    val mid = sibling(src, "mid")
    val leaf = sibling(src, "leaf")
    TxnLake.clone(spark, src, mid)
    TxnLake.append(spark, mid, Seq((300L, 3.0, "p0")).toDF("id", "price", "part"))
    TxnLake.clone(spark, mid, leaf)
    val bases = TxnLake.resolve(spark, leaf).get.files.flatMap(_.base).toSet
    assert(bases === Set(src, mid),
      "original files stay rooted at src; mid's own append roots at mid")
    assert(TxnLake.read(spark, leaf).count() === 13L)
  }

  test("transitive pins: retiring the intermediate clone never dangles the leaf") {
    val src = freshSrc()
    val mid = sibling(src, "mid_t")
    val leaf = sibling(src, "leaf_t")
    val pinMid = TxnLake.clone(spark, src, mid)
    TxnLake.clone(spark, mid, leaf) // must ALSO pin src (leaf refs src files)
    // advance src past v0 so an unpinned vacuum would rewrite it away
    TxnLake.deleteWhere(spark, src, col("id") <= 6L)
    TxnLake.optimize(spark, src, minFiles = 1)
    // retire the INTERMEDIATE clone: drop its pin on src entirely
    TxnLake.dropRef(spark, src, pinMid)
    TxnLake.vacuum(spark, src, keepVersions = 1, graceMs = 0L)
    // the leaf still reads the full original snapshot through its own
    // transitive pin — before the fix this dangled (FileNotFound or
    // silently dropped rows)
    assert(TxnLake.read(spark, leaf).count() === 12L)
    assert(TxnLake.read(spark, leaf).agg(sum(col("id"))).head.getLong(0) === 78L)
  }

  test("an advertised vacuum aborts clone pinning, rolling back every pin") {
    val src = freshSrc()
    val dst = sibling(src, "fork_race")
    // a fresh vacuum lock = a vacuum mid-flight whose pin read we may
    // have missed — the clone must abort AND leave no orphan refs
    val lock = new java.io.File(src, "_graft_log/_vacuum.lock")
    assert(lock.createNewFile())
    try {
      val e = intercept[IllegalStateException](TxnLake.clone(spark, src, dst))
      assert(e.getMessage.contains("raced a vacuum"))
      assert(TxnLake.refs(spark, src).isEmpty, "aborted clone left orphan pins")
      assert(!new java.io.File(dst, "_graft_log").exists())
    } finally { lock.delete(); () }
    // lock gone → the same clone succeeds
    TxnLake.clone(spark, src, dst)
    assert(TxnLake.read(spark, dst).count() === 12L)
  }

  test("concurrent vacuums exclude each other via the advertised lock") {
    val src = freshSrc()
    TxnLake.append(spark, src, Seq((99L, 9.0, "p0")).toDF("id", "price", "part"))
    val lock = new java.io.File(src, "_graft_log/_vacuum.lock")
    assert(lock.createNewFile())
    try {
      val e = intercept[IllegalStateException](
        TxnLake.vacuum(spark, src, keepVersions = 1, graceMs = 0L))
      assert(e.getMessage.contains("already in progress"))
    } finally { lock.delete(); () }
    TxnLake.vacuum(spark, src, keepVersions = 1, graceMs = 0L) // lock released
    assert(TxnLake.read(spark, src).count() === 13L)
  }

  test("clone from an older version branches from that point") {
    val src = freshSrc() // v0: 12 rows
    TxnLake.append(spark, src, Seq((77L, 7.0, "p0")).toDF("id", "price", "part")) // v1
    val dst = sibling(src, "fork0")
    TxnLake.clone(spark, src, dst, versionAsOf = 0L)
    assert(TxnLake.read(spark, dst).count() === 12L)
    assert(TxnLake.read(spark, src).count() === 13L)
  }
}
