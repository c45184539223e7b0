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

  // ---- partition-pruned upsert ----

  private def freshPartitionedTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge_part").resolve("t").toString
    Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"), (4L, "d", "p3"))
      .toDF("id", "name", "part")
      .write.partitionBy("part").parquet(dir)
    dir
  }

  private def listFiles(dir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("upsertPartitioned merges matched and inserted rows correctly") {
    import spark.implicits._
    val dir = freshPartitionedTable()
    val updates = Seq((2L, "b2", "p1"), (5L, "e", "p2")).toDF("id", "name", "part")
    MergeInto.upsertPartitioned(spark, dir, updates, "id", "part")
    val got = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[String]("part"))).toSeq
    assert(got === Seq((1L, "a", "p1"), (2L, "b2", "p1"), (3L, "c", "p2"),
      (4L, "d", "p3"), (5L, "e", "p2")))
  }

  test("upsertPartitioned leaves untouched partitions' files physically intact") {
    import spark.implicits._
    val dir = freshPartitionedTable()
    val before = listFiles(dir).filter(_._1.startsWith("part=p3"))
    assert(before.nonEmpty)
    val updates = Seq((2L, "b2", "p1")).toDF("id", "name", "part")
    MergeInto.upsertPartitioned(spark, dir, updates, "id", "part")
    val after = listFiles(dir).filter(_._1.startsWith("part=p3"))
    assert(after === before, "p3 was rewritten despite containing no touched keys")
    // and p2 untouched as well
    assert(listFiles(dir).keySet.exists(_.startsWith("part=p2")))
  }

  test("upsertPartitioned aligns update types to the inferred partition type") {
    import spark.implicits._
    // int-valued partition dirs: a read infers part as INT, while update
    // frames often carry it as STRING — the merge must still land rows
    // in the directories the writer names (part=1, not part='1')
    val dir = Files.createTempDirectory("graft_merge_int").resolve("t").toString
    Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 2))
      .toDF("id", "name", "part").write.partitionBy("part").parquet(dir)
    val updates = Seq((2L, "b2", "1"), (4L, "d", "2")).toDF("id", "name", "part")
    MergeInto.upsertPartitioned(spark, dir, updates, "id", "part")
    val got = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[Int]("part"))).toSeq
    assert(got === Seq((1L, "a", 1), (2L, "b2", 1), (3L, "c", 2), (4L, "d", 2)))
  }

  test("upsertPartitioned cleans up its staging and backup directories") {
    import spark.implicits._
    val dir = freshPartitionedTable()
    val updates = Seq((2L, "b2", "p1")).toDF("id", "name", "part")
    MergeInto.upsertPartitioned(spark, dir, updates, "id", "part")
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".staging")))
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".backup")))
  }

  test("upsertPartitioned recovers a crash-interrupted swap before merging") {
    import spark.implicits._
    val dir = freshPartitionedTable()
    // simulate a crash between move-out and move-in: p1 lives only in
    // .backup, p3's replacement already landed (backup copy is stale)
    val root = java.nio.file.Paths.get(dir)
    val backup = java.nio.file.Paths.get(dir + ".backup")
    Files.createDirectories(backup)
    Files.move(root.resolve("part=p1"), backup.resolve("part=p1"))
    Files.createDirectories(backup.resolve("part=p3"))
    Files.write(backup.resolve("part=p3").resolve("stale.parquet"), Array[Byte]())
    val updates = Seq((3L, "c2", "p2")).toDF("id", "name", "part")
    MergeInto.upsertPartitioned(spark, dir, updates, "id", "part")
    val got = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[String]("part"))).toSeq
    // p1's rows (ids 1, 2) came back from the backup before the merge ran
    assert(got === Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c2", "p2"), (4L, "d", "p3")))
    assert(!Files.exists(backup), "recovery must clear the backup dir")
    // p3 kept its live copy, not the stale backup one
    assert(!Files.exists(root.resolve("part=p3").resolve("stale.parquet")))
  }

  test("upsertPartitioned handles a row moving between partitions") {
    import spark.implicits._
    val dir = freshPartitionedTable()
    // key 3 moves p2 -> p1; p2 becomes empty and must disappear
    val updates = Seq((3L, "c2", "p1")).toDF("id", "name", "part")
    MergeInto.upsertPartitioned(spark, dir, updates, "id", "part")
    val got = spark.read.parquet(dir).orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[String]("part"))).toSeq
    assert(got === Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c2", "p1"), (4L, "d", "p3")))
    assert(!listFiles(dir).keySet.exists(_.startsWith("part=p2")),
      "emptied partition directory should be removed")
  }
}
