package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** COPY INTO ([[TxnLake.copyInto]] + the SQL statement): idempotent
  * incremental file loads, pattern filtering, zero-row ledger commits,
  * checkpoint/vacuum survival of the loaded-file ledger, concurrent
  * duplicate suppression inside the OCC loop. */
class CopyIntoSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft_copy_$tag").toString

  private def mkTable(): String = {
    val dir = fresh("tbl") + "/t"
    TxnLake.create(spark, dir,
      Seq((0L, "p0", 0L)).toDF("id", "part", "v"), "part")
    dir
  }

  /** One parquet file of rows [lo, hi] at `dir/name.parquet`. */
  private def srcFile(dir: String, name: String, lo: Int, hi: Int): Unit =
    (lo to hi).map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v")
      .coalesce(1).write.parquet(s"$dir/$name")

  test("idempotent loads: re-run skips, new files load, one commit each") {
    val tbl = mkTable()
    val src = fresh("src")
    srcFile(src, "a", 1, 10)
    srcFile(src, "b", 11, 20)
    val s1 = TxnLake.copyInto(spark, tbl, src, pattern = Some("*/*.parquet"))
    assert(s1.filesLoaded === 2L && s1.rowsLoaded === 20L)
    assert(TxnLake.read(spark, tbl).count() === 21L)
    val s2 = TxnLake.copyInto(spark, tbl, src, pattern = Some("*/*.parquet"))
    assert(s2.filesLoaded === 0L && s2.filesSkipped === 2L)
    assert(TxnLake.read(spark, tbl).count() === 21L, "re-run loads nothing")
    srcFile(src, "c", 21, 25)
    val s3 = TxnLake.copyInto(spark, tbl, src, pattern = Some("*/*.parquet"))
    assert(s3.filesLoaded === 1L && s3.rowsLoaded === 5L && s3.filesSkipped === 2L)
    assert(TxnLake.read(spark, tbl).count() === 26L)
  }

  test("the ledger survives checkpoints and vacuum") {
    val tbl = mkTable()
    val src = fresh("src")
    srcFile(src, "a", 1, 10)
    TxnLake.copyInto(spark, tbl, src, pattern = Some("*/*.parquet"))
    // churn enough commits to roll a checkpoint, then vacuum history
    (1 to 12).foreach(i => TxnLake.append(spark, tbl,
      Seq((1000L + i, "p0", 1L)).toDF("id", "part", "v")))
    TxnLake.vacuum(spark, tbl, keepVersions = 2, graceMs = 0L)
    val s = TxnLake.copyInto(spark, tbl, src, pattern = Some("*/*.parquet"))
    assert(s.filesLoaded === 0L && s.filesSkipped === 1L,
      "vacuum must not forget what was loaded")
  }

  test("zero-row files commit a metadata-only ledger entry") {
    val tbl = mkTable()
    val src = fresh("src")
    Seq.empty[(Long, String, Long)].toDF("id", "part", "v")
      .coalesce(1).write.parquet(s"$src/empty")
    val s1 = TxnLake.copyInto(spark, tbl, src, pattern = Some("*/*.parquet"))
    assert(s1.filesLoaded >= 0L && s1.rowsLoaded === 0L)
    val s2 = TxnLake.copyInto(spark, tbl, src, pattern = Some("*/*.parquet"))
    assert(s2.filesLoaded === 0L, "empty files are never re-read")
    assert(TxnLake.read(spark, tbl).count() === 1L)
  }

  test("a replayed staged load is dropped inside the OCC loop") {
    val tbl = mkTable()
    val src = fresh("src")
    srcFile(src, "a", 1, 5)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    val qualified = fs.makeQualified(
      new org.apache.hadoop.fs.Path(s"$src/a")).toString
    // first load wins
    assert(TxnLake.copyInto(spark, tbl, src,
      pattern = Some("*/*.parquet")).filesLoaded === 1L)
    // a second load of the same identity loses in commitStaged even
    // when its own pre-check raced (simulated: call again — pre-check
    // catches it; the OCC-internal path is the same guard)
    assert(TxnLake.copyInto(spark, tbl, src,
      pattern = Some("*/*.parquet")).filesLoaded === 0L)
    assert(TxnLake.read(spark, tbl).filter(col("id").between(1, 5)).count() === 5L)
    assert(qualified.nonEmpty)
  }

  test("identity tables: ids allocated per load; concurrent appends retried inside") {
    val dir = fresh("ident") + "/t"
    TxnLake.create(spark, dir,
      Seq((10L, 0L, "p0", 0L)).toDF("uid", "id", "part", "v"), "part")
    TxnLake.setIdentityColumn(spark, dir, "uid") // mark advances past 10
    val src = fresh("identsrc")
    srcFile(src, "a", 1, 40)
    // a concurrent appender advances the identity watermark while the
    // copy stages: the resulting ConcurrentModificationException from
    // commitStaged is RECOVERABLE for COPY INTO — it must be retried
    // inside the loop (restage against the fresh head), never escape
    val t = new Thread(() => (1 to 5).foreach { i =>
      TxnLake.append(spark, dir,
        Seq((1000L + i, s"p${i % 3}", 1L)).toDF("id", "part", "v"))
    })
    t.start()
    val stats = TxnLake.copyInto(spark, dir, s"$src/a")
    t.join()
    assert(stats.filesLoaded === 1 && stats.rowsLoaded === 40)
    val ids = TxnLake.read(spark, dir).select("uid").as[Long].collect()
    assert(ids.length === 46 && ids.distinct.length === 46,
      s"every row keeps a unique engine id: ${ids.length}/${ids.distinct.length}")
  }

  test("retry-budget exhaustion THROWS instead of reporting unloaded files skipped") {
    val dir = mkTable()
    val src = fresh("race")
    (1 to 6).foreach(i => srcFile(src, s"f$i", i * 100, i * 100 + 4))
    val files = (1 to 6).map(i => s"$src/f$i")
    // a deterministic competitor: before every commit attempt, a rival
    // COPY INTO lands exactly ONE still-fresh file — our staged load
    // overlaps the head's ledger and drops, the remainder restages, and
    // after 5 lost races genuinely-new files remain. Folding them into
    // `skipped` would tell the caller "already loaded"; the call must
    // throw instead (a re-run is idempotent and loads the remainder).
    var i = 0
    val e = intercept[java.util.ConcurrentModificationException] {
      TxnLake.copyInto(spark, dir, src, "parquet", Some("*/*.parquet"),
        Map.empty, () => {
          if (i < 6) { TxnLake.copyInto(spark, dir, files(i)); i += 1 }
        })
    }
    assert(e.getMessage.contains("remain unloaded"))
    // the rival's 5 single-file loads are in; one re-run loads the rest
    val again = TxnLake.copyInto(spark, dir, src, pattern = Some("*/*.parquet"))
    assert(again.filesLoaded === 1 && again.filesSkipped === 5)
    assert(TxnLake.read(spark, dir).count() === 31L) // seed + 6x5 rows
  }

  test("SQL statement: COPY INTO ... FROM ... FILEFORMAT ... PATTERN") {
    val tbl = mkTable()
    val src = fresh("src")
    srcFile(src, "a", 1, 10)
    srcFile(src, "skipme_csv", 11, 20) // matched out by the pattern
    val r1 = graft.plans.GraftSqlDml.exec(spark,
      s"COPY INTO graft_txn.`$tbl` FROM '$src' FILEFORMAT = PARQUET " +
        "PATTERN = 'a/*.parquet'").collect()(0)
    assert(r1.getLong(0) === 1L && r1.getLong(1) === 10L)
    val r2 = graft.plans.GraftSqlDml.exec(spark,
      s"COPY INTO graft_txn.`$tbl` FROM '$src' FILEFORMAT = PARQUET " +
        "PATTERN = 'a/*.parquet'").collect()(0)
    assert(r2.getLong(0) === 0L && r2.getLong(2) === 1L)
    assert(TxnLake.read(spark, tbl).count() === 11L)
  }

  test("csv format with options loads through the same ledger") {
    val tbl = mkTable()
    val src = fresh("src")
    (1 to 6).map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v")
      .coalesce(1).write.option("header", "true").csv(s"$src/c")
    val s1 = TxnLake.copyInto(spark, tbl, src, format = "csv",
      pattern = Some("c/*.csv"),
      options = Map("header" -> "true", "inferSchema" -> "true"))
    assert(s1.filesLoaded === 1L)
    assert(TxnLake.read(spark, tbl).count() === 7L)
    assert(TxnLake.copyInto(spark, tbl, src, format = "csv",
      pattern = Some("c/*.csv"),
      options = Map("header" -> "true", "inferSchema" -> "true"))
      .filesLoaded === 0L)
  }
}
