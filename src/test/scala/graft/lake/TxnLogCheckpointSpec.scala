package graft.lake

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Log checkpointing: resolution cost bounded by the checkpoint
  * interval (not table age), delta records O(touched), vacuum-aware
  * checkpoint retention. */
class TxnLogCheckpointSpec extends AnyFunSuite with SparkTestSession {

  private def freshDir(): String =
    Files.createTempDirectory("graft_ckpt").resolve("t").toString

  private def logFiles(dir: String): Set[String] =
    Files.list(Paths.get(dir, "_graft_log")).iterator().asScala
      .map(_.getFileName.toString).filterNot(_.endsWith(".crc")).toSet

  test("a 100+-commit table resolves from the newest checkpoint, not the whole chain") {
    import spark.implicits._
    val dir = freshDir()
    TxnLake.create(spark, dir,
      Seq((0L, "v0", "p0")).toDF("id", "name", "part"), "part")
    (1 to 104).foreach { i =>
      TxnLake.append(spark, dir,
        Seq((i.toLong, s"v$i", s"p${i % 4}")).toDF("id", "name", "part"))
    }
    val log = logFiles(dir)
    assert(log.contains("v00000100.ckpt.json"),
      s"interval-10 checkpoints expected through v100, log: ${log.toSeq.sorted}")
    // proof resolution uses the checkpoint: delete every record and
    // checkpoint BELOW the newest checkpoint; the head must still
    // resolve (the files after v100 are untouched deltas)
    (0 to 99).foreach { v =>
      Files.deleteIfExists(Paths.get(dir, "_graft_log", f"v$v%08d.json"))
      Files.deleteIfExists(Paths.get(dir, "_graft_log", f"v$v%08d.ckpt.json"))
    }
    val head = TxnLake.read(spark, dir)
    assert(head.count() === 105)
    assert(TxnLake.resolve(spark, dir).get.version === 104L)
    // versions at/after the surviving checkpoint time-travel; earlier
    // ones fail loudly as vacuumed
    assert(TxnLake.readVersion(spark, dir, 101L).count() === 102)
    intercept[IllegalArgumentException] {
      TxnLake.readVersion(spark, dir, 50L).count()
    }
  }

  test("delta records carry only the commit's files; checkpoints carry the snapshot") {
    import spark.implicits._
    val dir = freshDir()
    spark.conf.set("spark.graft.txnlake.checkpointInterval", "5")
    try {
      TxnLake.create(spark, dir,
        (0 until 8).map(i => (i.toLong, s"n$i", s"p${i % 4}"))
          .toDF("id", "name", "part"), "part")
      (1 to 6).foreach { i =>
        TxnLake.upsert(spark, dir,
          Seq((100L + i, s"u$i", "p1")).toDF("id", "name", "part"), "id")
      }
      val log = logFiles(dir)
      assert(log.contains("v00000005.ckpt.json"), log.toSeq.sorted.mkString(","))
      // a mid-chain delta must NOT list the whole table: v3 only touched
      // partition p1, so its record adds p1 files and removes p1 files
      val rec = new String(Files.readAllBytes(
        Paths.get(dir, "_graft_log", "v00000003.json")))
      assert(rec.contains("\"add\"") && rec.contains("\"remove\""), rec)
      assert(!rec.contains("\"files\""),
        "delta records must not carry full file lists")
      // full-history invariants survive the delta encoding
      assert(TxnLake.read(spark, dir).count() === 14)
      assert(TxnLake.readVersion(spark, dir, 0L).count() === 8)
      val hist = TxnLake.history(spark, dir).orderBy("version").collect()
      assert(hist.map(_.getAs[Long]("version")).toSeq === (0L to 6L))
    } finally spark.conf.unset("spark.graft.txnlake.checkpointInterval")
  }

  test("vacuum materializes a checkpoint at the oldest retained version") {
    import spark.implicits._
    val dir = freshDir()
    TxnLake.create(spark, dir,
      Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "name", "part"), "part")
    (1 to 4).foreach { i =>
      TxnLake.upsert(spark, dir,
        Seq((1L, s"a$i", "p1")).toDF("id", "name", "part"), "id")
    }
    TxnLake.vacuum(spark, dir, keepVersions = 2, graceMs = 0L)
    val log = logFiles(dir)
    assert(log === Set("v00000003.json", "v00000003.ckpt.json", "v00000004.json"),
      s"retained chain must be checkpoint-rooted, log: ${log.toSeq.sorted}")
    // both retained versions resolve; vacuumed ones fail loudly
    assert(TxnLake.readVersion(spark, dir, 3L).count() === 2)
    assert(TxnLake.readVersion(spark, dir, 4L).count() === 2)
    intercept[IllegalArgumentException] {
      TxnLake.readVersion(spark, dir, 1L).count()
    }
    // and the table keeps committing normally afterwards
    TxnLake.append(spark, dir, Seq((9L, "z", "p2")).toDF("id", "name", "part"))
    assert(TxnLake.read(spark, dir).count() === 3)
  }
}
