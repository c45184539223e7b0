package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[TxnTableStream]] — `spark.readStream.format("graft-txn")` straight
  * off the commit log (VERDICT r15 #2): initial snapshot + version
  * tailing, startingVersion late attach, file-granular pacing, the
  * Delta non-append option set, and restart replay with no duplicates. */
class TxnTableStreamSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private var n = 0
  private def fresh(tag: String): String = {
    n += 1
    Files.createTempDirectory(s"graft_tstream_$tag").resolve("t").toString
  }

  private def mkTable(rows: Range): String = {
    val dir = fresh("tbl")
    TxnLake.create(spark, dir,
      rows.map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v"), "part")
    dir
  }

  /** Drain to a parquet FILE sink (exactly-once, checkpoint-recoverable
    * — the memory sink refuses recovery, and several tests re-drain the
    * same checkpoint to prove replay). */
  private def drain(df: DataFrame, out: String, ckpt: String): Unit = {
    val q = df.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def readOut(out: String): DataFrame =
    spark.read.schema("id BIGINT, part STRING, v BIGINT").parquet(out)

  test("stream == batch: initial snapshot + tailed appends, optimize skipped") {
    val dir = mkTable(1 to 30)                              // v0
    TxnLake.append(spark, dir,
      (31 to 40).map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v")) // v1
    val ckpt = fresh("ck1")
    val out = fresh("out1")
    drain(spark.readStream.format("graft-txn").load(dir), out, ckpt)
    val got = readOut(out).select("id", "part", "v")
    assert(got.count() === 40L)
    assert(got.except(TxnLake.read(spark, dir)).isEmpty &&
      TxnLake.read(spark, dir).except(got).isEmpty,
      "drained stream must equal the batch snapshot")

    // tail: two more appends + a row-preserving OPTIMIZE (dataChange =
    // false — must be skipped, not fail the stream, not duplicate)
    TxnLake.append(spark, dir,
      (41 to 45).map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v")) // v2
    TxnLake.optimize(spark, dir, minFiles = 1)                                       // v3
    TxnLake.append(spark, dir,
      (46 to 50).map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v")) // v4
    drain(spark.readStream.format("graft-txn").load(dir), out, ckpt)
    val tailed = readOut(out).select("id", "part", "v")
    assert(tailed.count() === 50L, "optimize must be skipped, appends tailed")
    assert(tailed.select(sum("id")).head().getLong(0) === (1L to 50L).sum)
  }

  test("initial snapshot applies deletion vectors (live rows, not raw adds)") {
    val dir = mkTable(1 to 20)
    TxnLake.deleteWhere(spark, dir, col("id") <= 5L) // DVs on v0's files
    val out = fresh("out2")
    drain(spark.readStream.format("graft-txn").load(dir), out, fresh("ck2"))
    assert(readOut(out).count() === 15L)
    assert(readOut(out).select(min("id")).head().getLong(0) === 6L)
  }

  test("startingVersion attaches late: only adds from that version on") {
    val dir = mkTable(1 to 10)                                                  // v0
    TxnLake.append(spark, dir, Seq((11L, "p1", 22L)).toDF("id", "part", "v"))   // v1
    TxnLake.append(spark, dir, Seq((12L, "p2", 24L)).toDF("id", "part", "v"))   // v2
    val out = fresh("out3")
    drain(spark.readStream.format("graft-txn").option("startingVersion", "2")
      .load(dir), out, fresh("ck3"))
    assert(readOut(out).select("id").as[Long].collect().toSeq === Seq(12L))
  }

  test("startingTimestamp attaches late through in-commit timestamps") {
    val dir = mkTable(1 to 10)                                                  // v0
    TxnLake.append(spark, dir, Seq((11L, "p1", 22L)).toDF("id", "part", "v"))   // v1
    Thread.sleep(10) // distinct in-commit timestamps for v1 vs v2
    TxnLake.append(spark, dir, Seq((12L, "p2", 24L)).toDF("id", "part", "v"))   // v2
    val ts2 = TxnLake.history(spark, dir).filter(col("version") === 2L)
      .select(col("committed_at")).head().getTimestamp(0).getTime
    val out = fresh("out_ts")
    drain(spark.readStream.format("graft-txn")
      .option("startingTimestamp", ts2.toString).load(dir), out, fresh("ck_ts"))
    assert(readOut(out).select("id").as[Long].collect().toSeq === Seq(12L))
    // the two starting options are mutually exclusive
    val ex = intercept[Exception] {
      drain(spark.readStream.format("graft-txn").option("startingVersion", "1")
        .option("startingTimestamp", ts2.toString).load(dir),
        fresh("out_tsx"), fresh("ck_tsx"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("mutually exclusive")))
  }

  test("startingTimestamp accepts timestamp strings (Delta's option forms)") {
    val dir = mkTable(1 to 10)                                                  // v0
    TxnLake.append(spark, dir, Seq((11L, "p1", 22L)).toDF("id", "part", "v"))   // v1
    Thread.sleep(10)
    TxnLake.append(spark, dir, Seq((12L, "p2", 24L)).toDF("id", "part", "v"))   // v2
    val ts2 = TxnLake.history(spark, dir).filter(col("version") === 2L)
      .select(col("committed_at")).head().getTimestamp(0)
    val out = fresh("out_tss")
    // 'yyyy-MM-dd HH:mm:ss.f' string, not epoch millis
    drain(spark.readStream.format("graft-txn")
      .option("startingTimestamp", ts2.toString).load(dir), out, fresh("ck_tss"))
    assert(readOut(out).select("id").as[Long].collect().toSeq === Seq(12L))
    // garbage raises a DESCRIPTIVE error, not a NumberFormatException
    val ex = intercept[Exception] {
      drain(spark.readStream.format("graft-txn")
        .option("startingTimestamp", "next tuesday").load(dir),
        fresh("out_tsg"), fresh("ck_tsg"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("yyyy-MM-dd")))
  }

  test("maxFilesPerTrigger paces the backfill at file granularity") {
    val dir = mkTable(1 to 30) // 3 partitions → >= 3 files at v0
    val files = TxnLake.resolve(spark, dir).get.files.size
    assert(files >= 3)
    val q = spark.readStream.format("graft-txn")
      .option("maxFilesPerTrigger", "1").load(dir)
      .writeStream.format("memory").queryName("ts_pace")
      .option("checkpointLocation", fresh("ck4"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length === files,
      s"expected one non-empty micro-batch per file, got ${batches.length}/$files")
    assert(spark.table("ts_pace").count() === 30L)
  }

  test("a data-changing rewrite fails the tail; skipChangeCommits skips it") {
    val dir = mkTable(1 to 12)
    val ckpt = fresh("ck5")
    val out = fresh("out5")
    drain(spark.readStream.format("graft-txn").load(dir), out, ckpt)
    TxnLake.deleteWhere(spark, dir, col("id") === 1L) // v1: remove+add rewrite
    TxnLake.append(spark, dir, Seq((13L, "p1", 26L)).toDF("id", "part", "v")) // v2
    val ex = intercept[StreamingQueryException] {
      drain(spark.readStream.format("graft-txn").load(dir), out, ckpt)
    }
    assert(ex.getCause.getMessage.contains("data-changing rewrite"))
    // skipChangeCommits: the delete's rewrite is skipped, the append lands
    drain(spark.readStream.format("graft-txn")
      .option("skipChangeCommits", "true").load(dir), out, ckpt)
    val ids = readOut(out).select("id").as[Long].collect().toSet
    assert(ids.contains(13L), "the append past the skipped commit must stream")
    assert(ids.contains(1L), "the snapshot row deleted AFTER the snapshot stays streamed")
    assert(readOut(out).count() === 13L)
  }

  test("restart replays from the checkpoint with no duplicates (late-attach mirror)") {
    val dir = mkTable(1 to 10)
    val ckpt = fresh("ck6")
    val out = fresh("out6")
    drain(spark.readStream.format("graft-txn").load(dir), out, ckpt)
    assert(readOut(out).count() === 10L)
    // two more commits between runs; same checkpoint → only the delta
    TxnLake.append(spark, dir, Seq((11L, "p1", 22L)).toDF("id", "part", "v"))
    TxnLake.append(spark, dir, Seq((12L, "p2", 24L)).toDF("id", "part", "v"))
    drain(spark.readStream.format("graft-txn").load(dir), out, ckpt)
    val got = readOut(out).select("id").as[Long].collect().sorted.toSeq
    assert(got === (1L to 12L).toSeq, s"no duplicates, no gaps: $got")
    // a third run with nothing new adds nothing
    drain(spark.readStream.format("graft-txn").load(dir), out, ckpt)
    assert(readOut(out).count() === 12L)
  }

  test("empty table: the snapshot offset pins the version; later appends tail") {
    val dir = fresh("empty")
    TxnLake.create(spark, dir,
      Seq.empty[(Long, String, Long)].toDF("id", "part", "v"), "part")
    val ckpt = fresh("ck7")
    val out = fresh("out7")
    drain(spark.readStream.format("graft-txn").load(dir), out, ckpt)
    assert(readOut(out).count() === 0L)
    TxnLake.append(spark, dir, Seq((1L, "p0", 2L)).toDF("id", "part", "v"))
    drain(spark.readStream.format("graft-txn").load(dir), out, ckpt)
    assert(readOut(out).count() === 1L)
  }

  test("maxBytesPerTrigger paces the drain across micro-batches") {
    val dir = mkTable(1 to 40) // several files across 3 partitions
    val ckpt = fresh("ckb")
    val out = fresh("outb")
    drain(spark.readStream.format("graft-txn")
      .option("maxBytesPerTrigger", "1").load(dir), out, ckpt) // 1 byte: one file per batch
    assert(readOut(out).count() === 40L, "pacing never drops rows")
    val batches = new java.io.File(s"$ckpt/offsets").listFiles()
      .count(f => !f.getName.startsWith("."))
    assert(batches > 1, s"a 1-byte cap must take several micro-batches, got $batches")
  }

  test("mergeSchema append grows the table additively") {
    val dir = mkTable(1 to 5)
    TxnLake.append(spark, dir,
      (6 to 8).map(i => (i.toLong, s"p${i % 3}", i * 2L, s"x$i"))
        .toDF("id", "part", "v", "extra"), mergeSchema = true)
    val got = TxnLake.read(spark, dir)
    assert(got.columns.toSet === Set("id", "part", "v", "extra"))
    assert(got.filter(col("extra").isNull).count() === 5L)
    assert(got.filter(col("extra").isNotNull).count() === 3L)
  }
}
