package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** PARQUET MULTI-PART CHECKPOINTS — past the configured entry
  * threshold a checkpoint publishes as a header JSON (protocol +
  * horizon fields + `filesRef`/`numFiles`) plus a parquet payload dir
  * written by a Spark job. Pins: format switch at the threshold,
  * byte-identical resolution vs the JSON path, horizon survival
  * (txns/identity/copied) through a parquet checkpoint + vacuum, time
  * travel across one, payload-loss detection, lazy [[TxnLake
  * .fileEntriesDf]] parity, vacuum collection of superseded payload
  * dirs and crash-orphaned `.tmp-` stages. */
class ParquetCheckpointSpec extends AnyFunSuite with SparkTestSession {

  private val Thresh = "spark.graft.txnlake.parquetCheckpointThreshold"

  private def freshDir(): String =
    Files.createTempDirectory("graft_pckpt").resolve("t").toString

  private def logNames(dir: String): Set[String] =
    Files.list(Paths.get(dir, "_graft_log")).iterator().asScala
      .map(_.getFileName.toString).toSet

  /** A table whose every append crosses the (lowered) parquet
    * threshold: 3 files per commit, threshold 2. */
  private def withLowThreshold[A](f: => A): A = {
    spark.conf.set(Thresh, "2")
    try f finally spark.conf.unset(Thresh)
  }

  private def mkTable(dir: String, commits: Int): Unit = {
    import spark.implicits._
    TxnLake.create(spark, dir,
      (0 until 9).map(i => (i.toLong, s"n$i", s"p${i % 3}"))
        .toDF("id", "name", "part"), "part")
    (1 to commits).foreach { c =>
      TxnLake.append(spark, dir,
        (0 until 3).map(i => ((c * 100 + i).toLong, s"a$c-$i", s"p$i"))
          .toDF("id", "name", "part"))
    }
  }

  test("format switches at the threshold: header + multi-part payload dir") {
    val dir = freshDir()
    withLowThreshold {
      mkTable(dir, 10) // v10 lands on the interval grid -> checkpoint
      val names = logNames(dir)
      assert(names.contains("v00000010.ckpt.json"))
      assert(names.contains("v00000010.ckpt.files"),
        s"parquet payload dir expected, log: ${names.toSeq.sorted}")
      // the header must NOT carry a file array, and must reference the payload
      val header = new String(Files.readAllBytes(
        Paths.get(dir, "_graft_log", "v00000010.ckpt.json")), "UTF-8")
      assert(header.contains("filesRef") && header.contains("numFiles"))
      assert(!header.contains("\"files\""))
      // resolution through the parquet checkpoint equals a ground-truth
      // replay from v0 (records below the checkpoint still exist here)
      val viaCkpt = TxnLake.resolve(spark, dir).get
      assert(viaCkpt.files.size === 3 + 10 * 3) // one file per partition per commit
      assert(TxnLake.read(spark, dir).count() === 9 + 30)
    }
    // BELOW the threshold (default restored): next checkpoint is JSON again
    import spark.implicits._
    val small = freshDir()
    mkTable(small, 10)
    assert(logNames(small).contains("v00000010.ckpt.json"))
    assert(!logNames(small).contains("v00000010.ckpt.files"))
    TxnLake.append(spark, small, Seq((999L, "x", "p0")).toDF("id", "name", "part"))
    assert(TxnLake.read(spark, small).count() === 40)
  }

  test("resolution from a parquet checkpoint is exact: entries, stats, DVs, specs") {
    val dir = freshDir()
    withLowThreshold {
      import spark.implicits._
      mkTable(dir, 8)
      TxnLake.deleteWhere(spark, dir, col("id") === 2L) // DV + doomed count
      TxnLake.append(spark, dir, Seq((500L, "z", "p1")).toDF("id", "name", "part")) // v10
      assert(logNames(dir).contains("v00000010.ckpt.files"))
      val truth = TxnLake.resolveVersion(spark, dir, 10L) // via parquet ckpt
      // ground truth: replay the full record chain with no checkpoint
      Files.delete(Paths.get(dir, "_graft_log", "v00000010.ckpt.json"))
      Files.deleteIfExists(Paths.get(dir, "_graft_log", "v00000010.ckpt.json.crc"))
      Files.walk(Paths.get(dir, "_graft_log", "v00000010.ckpt.files"))
        .sorted(java.util.Comparator.reverseOrder()).forEach(p => Files.delete(p))
      val replayed = TxnLake.resolveVersion(spark, dir, 10L)
      assert(truth.files.map(f => (f.path, f.parts, f.dv, f.doomed, f.rows,
        f.bytes, f.spec, f.stats, f.zmin, f.zmax, f.base)).sortBy(_._1) ===
        replayed.files.map(f => (f.path, f.parts, f.dv, f.doomed, f.rows,
          f.bytes, f.spec, f.stats, f.zmin, f.zmax, f.base)).sortBy(_._1))
      assert(truth.version === replayed.version &&
        truth.schemaDdl === replayed.schemaDdl &&
        truth.partCol === replayed.partCol)
    }
  }

  test("horizon fields (appendOnce txn markers) survive a parquet checkpoint + vacuum") {
    val dir = freshDir()
    withLowThreshold {
      import spark.implicits._
      mkTable(dir, 7)
      TxnLake.appendOnce(spark, dir,
        Seq((900L, "once", "p0")).toDF("id", "name", "part"), "appA", 41L) // v8
      TxnLake.append(spark, dir,
        Seq((901L, "x", "p0")).toDF("id", "name", "part"))     // v9
      TxnLake.append(spark, dir,
        Seq((902L, "y", "p0")).toDF("id", "name", "part"))     // v10 -> parquet ckpt
    }
    assert(logNames(dir).contains("v00000010.ckpt.files"))
    // vacuum away the delta records that carried the marker: the
    // checkpoint is now the only carrier of the exactly-once horizon
    TxnLake.vacuum(spark, dir, keepVersions = 1, graceMs = 0L)
    val m = TxnLake.resolve(spark, dir).get
    assert(m.txns.get("appA") === Some(41L),
      "appendOnce horizon must ride the parquet checkpoint header")
    import spark.implicits._
    val before = TxnLake.read(spark, dir).count()
    TxnLake.appendOnce(spark, dir,
      Seq((903L, "dup", "p0")).toDF("id", "name", "part"), "appA", 41L) // dedupes
    assert(TxnLake.read(spark, dir).count() === before)
  }

  test("payload part loss is detected, not silently dropped") {
    val dir = freshDir()
    withLowThreshold { mkTable(dir, 10) }
    val payload = Paths.get(dir, "_graft_log", "v00000010.ckpt.files")
    val part = Files.list(payload).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.delete(part)
    // drop pre-checkpoint records so resolution MUST go through the
    // checkpoint, then expect the typed corruption error
    (0 to 9).foreach { v =>
      Files.deleteIfExists(Paths.get(dir, "_graft_log", f"v$v%08d.json"))
      Files.deleteIfExists(Paths.get(dir, "_graft_log", f"v$v%08d.json.crc"))
      Files.deleteIfExists(Paths.get(dir, "_graft_log", f"v$v%08d.ckpt.json"))
      Files.deleteIfExists(Paths.get(dir, "_graft_log", f"v$v%08d.ckpt.json.crc"))
    }
    intercept[TxnLake.TxnLogCorruptedException] {
      TxnLake.resolveVersion(spark, dir, 10L)
    }
    // the LAZY view must fail the same way, not silently truncate — a
    // maintenance consumer fed a short list would garbage-collect live files
    intercept[TxnLake.TxnLogCorruptedException] {
      TxnLake.fileEntriesDf(spark, dir, Some(10L)).count()
    }
  }

  test("time travel across a parquet checkpoint; lazy fileEntriesDf parity") {
    val dir = freshDir()
    withLowThreshold {
      import spark.implicits._
      mkTable(dir, 12) // ckpt at v10, deltas v11..v12
      assert(TxnLake.readVersion(spark, dir, 5L).count() === 9 + 5 * 3)
      assert(TxnLake.readVersion(spark, dir, 11L).count() === 9 + 11 * 3)
      // the lazy Dataset view: parquet base + delta tail, no driver list
      val viaDf = TxnLake.fileEntriesDf(spark, dir)
        .select("path").as[String].collect().toSet
      val viaManifest = TxnLake.resolve(spark, dir).get.files.map(_.path).toSet
      assert(viaDf === viaManifest)
      // at an explicit historical version too
      val dfAt = TxnLake.fileEntriesDf(spark, dir, Some(11L))
        .select("path").as[String].collect().toSet
      assert(dfAt === TxnLake.resolveVersion(spark, dir, 11L).files.map(_.path).toSet)
    }
  }

  test("vacuum collects superseded payload dirs and orphaned .tmp stages") {
    val dir = freshDir()
    withLowThreshold {
      mkTable(dir, 21) // ckpts at v10 and v20, both parquet
      assert(logNames(dir).contains("v00000010.ckpt.files"))
      assert(logNames(dir).contains("v00000020.ckpt.files"))
      // plant a crash-orphaned payload stage (writer died pre-rename)
      val orphan = Paths.get(dir, "_graft_log", ".tmp-dead-v00000030.ckpt.files")
      Files.createDirectory(orphan)
      Files.write(orphan.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
      // ...and a HEADERLESS payload (crash between rename and header
      // publish) — unreferenced forever, must be collected too
      val headerless = Paths.get(dir, "_graft_log", "v00000031.ckpt.files")
      Files.createDirectory(headerless)
      Files.write(headerless.resolve("part-0.parquet"), Array[Byte](4, 5, 6))
      Thread.sleep(5) // orphan mtime strictly before the sweep cutoff
      TxnLake.vacuum(spark, dir, keepVersions = 2, graceMs = 0L)
      val after = logNames(dir)
      assert(!after.contains("v00000010.ckpt.files"),
        "superseded parquet payload must be vacuumed with its header")
      assert(!after.contains("v00000010.ckpt.json"))
      assert(after.contains("v00000020.ckpt.files"), "live checkpoint kept")
      assert(!after.contains(".tmp-dead-v00000030.ckpt.files"),
        "crash-orphaned payload stage must be swept")
      assert(!after.contains("v00000031.ckpt.files"),
        "headerless payload dir must be swept (no reader can reference it)")
      assert(TxnLake.read(spark, dir).count() === 9 + 21 * 3)
    }
  }
}
