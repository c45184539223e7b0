package graft.streaming

import graft.SparkTestSession
import graft.lake.TxnLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The commit-time change feed vs its two independent counterparts:
  * the snapshot-diff [[TxnLake.changes]] (post-hoc file diff — a
  * different computation of the same facts) and the streamed form of
  * the feed itself (stream == batch), plus downstream replication with
  * replay idempotence. */
class CdcFeedSpec extends AnyFunSuite with SparkTestSession {

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  /** create → append → upsert → delete: a 3-commit mutation history on
    * top of v0. */
  private def mutatedTable(): String = {
    import spark.implicits._
    val dir = freshDir("graft_cdc")
    TxnLake.create(spark, dir,
      Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2")).toDF("id", "name", "part"),
      "part", changeFeed = true)
    TxnLake.append(spark, dir, Seq((4L, "d", "p2"), (5L, "e", "p3")).toDF("id", "name", "part"))
    TxnLake.upsert(spark, dir,
      Seq((2L, "b2", "p1"), (6L, "f", "p3")).toDF("id", "name", "part"), "id")
    TxnLake.delete(spark, dir, Seq(1L, 6L).toDF("id"), "id")
    dir
  }

  private def changeSet(df: DataFrame): Set[(Long, String, String, String, Long)] =
    df.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"),
      r.getAs[String]("part"), r.getAs[String](TxnLake.ChangeTypeCol),
      r.getAs[Long](TxnLake.VersionCol))).toSet

  private def snapshotSet(df: DataFrame): Set[(Long, String, String)] =
    df.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"),
      r.getAs[String]("part"))).toSet

  test("batch feed equals the expected change history exactly") {
    val dir = mutatedTable()
    assert(changeSet(CdcFeed.batch(spark, dir)) === Set(
      (1L, "a", "p1", "insert", 0L), (2L, "b", "p1", "insert", 0L), (3L, "c", "p2", "insert", 0L),
      (4L, "d", "p2", "insert", 1L), (5L, "e", "p3", "insert", 1L),
      (2L, "b", "p1", "update_preimage", 2L),
      (2L, "b2", "p1", "update_postimage", 2L), (6L, "f", "p3", "insert", 2L),
      (1L, "a", "p1", "delete", 3L), (6L, "f", "p3", "delete", 3L)))
  }

  test("feed matches the snapshot-diff changes() version by version") {
    val dir = mutatedTable()
    // v0 has no predecessor to diff — its feed entry is the snapshot as
    // inserts, pinned against readVersion
    val v0 = TxnLake.readVersion(spark, dir, 0L)
      .withColumn(TxnLake.ChangeTypeCol, lit("insert"))
      .withColumn(TxnLake.VersionCol, lit(0L))
    val diffed = (1L to 3L).map { v =>
      TxnLake.changes(spark, dir, v - 1, v, "id", preimages = true)
        .withColumn(TxnLake.VersionCol, lit(v))
    }.foldLeft(v0)(_ unionByName _)
    assert(changeSet(CdcFeed.batch(spark, dir)) === changeSet(diffed))
  }

  test("streamed feed equals the batch feed (stream == batch)") {
    val dir = mutatedTable()
    val q = CdcFeed.stream(spark, dir, maxFilesPerTrigger = Some(2))
      .writeStream.format("memory").queryName("cdc_feed_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(changeSet(spark.table("cdc_feed_stream")) ===
      changeSet(CdcFeed.batch(spark, dir)))
  }

  test("replicate() converges the replica to the source head snapshot") {
    val dir = mutatedTable()
    val target = freshDir("graft_cdc_replica")
    val ckpt = freshDir("graft_cdc_ckpt")
    CdcFeed.replicate(spark, dir, target, "id", "part", ckpt).awaitTermination()
    assert(snapshotSet(TxnLake.read(spark, target)) ===
      snapshotSet(TxnLake.read(spark, dir)))
    assert(snapshotSet(TxnLake.read(spark, target)) ===
      Set((2L, "b2", "p1"), (3L, "c", "p2"), (4L, "d", "p2"), (5L, "e", "p3")))
  }

  test("applyCdc replay is idempotent: re-applying the full feed changes nothing") {
    val dir = mutatedTable()
    val target = freshDir("graft_cdc_replay")
    val feed = CdcFeed.batch(spark, dir)
    CdcFeed.applyCdc(feed, target, "id", "part")
    val once = snapshotSet(TxnLake.read(spark, target))
    CdcFeed.applyCdc(feed, target, "id", "part") // the foreachBatch replay
    assert(snapshotSet(TxnLake.read(spark, target)) === once)
    assert(once === snapshotSet(TxnLake.read(spark, dir)))
  }

  test("streamed incremental-view fold == batch fold == full rebuild (st15 shape)") {
    import spark.implicits._
    import graft.lake.IncrementalView
    val dir = freshDir("graft_cdc_mv")
    TxnLake.create(spark, dir,
      Seq((1L, 10L, "p1"), (2L, 20L, "p1"), (3L, 30L, "p2")).toDF("id", "v", "part"),
      "part", changeFeed = true)
    TxnLake.append(spark, dir, Seq((4L, 40L, "p2")).toDF("id", "v", "part"))
    // update 2 (subtractable only via the preimage dialect) + insert 5
    TxnLake.upsert(spark, dir, Seq((2L, 25L, "p1"), (5L, 50L, "p3")).toDF("id", "v", "part"), "id")
    TxnLake.delete(spark, dir, Seq(3L).toDF("id"), "id")
    val g = Seq("part"); val sums = Seq("v")
    def viewSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      df.collect().map(r => (r.getAs[String]("part"), r.getAs[Long]("n"),
        r.getAs[Number]("sum_v").longValue())).toSet
    val empty = IncrementalView.build(TxnLake.read(spark, dir).limit(0), g, sums)
    val batchFold = IncrementalView.applyChanges(empty, CdcFeed.batch(spark, dir), g, sums)
    val rebuild = IncrementalView.build(TxnLake.read(spark, dir), g, sums)
    assert(viewSet(batchFold) === viewSet(rebuild))
    assert(viewSet(rebuild) === Set(("p1", 2L, 35L), ("p2", 1L, 40L), ("p3", 1L, 50L)))
    // the STREAMED fold: one commit's files per micro-batch, folded in
    // foreachBatch — the continuous MV-maintenance deployment shape
    var view = empty.localCheckpoint(true)
    val q = CdcFeed.stream(spark, dir, maxFilesPerTrigger = Some(1))
      .writeStream.option("checkpointLocation", freshDir("graft_cdc_mv_ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        view = IncrementalView.applyChanges(view, b, g, sums).localCheckpoint(true)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(viewSet(view) === viewSet(rebuild))
  }

  /** mutatedTable + one more append = a 5-commit history (v0..v4). */
  private def fiveCommitTable(): String = {
    import spark.implicits._
    val dir = mutatedTable()
    TxnLake.append(spark, dir, Seq((7L, "g", "p1")).toDF("id", "name", "part"))
    dir
  }

  test("late-attach startingVersion replays exactly that suffix (stream == batch)") {
    val dir = fiveCommitTable()
    val q = CdcFeed.stream(spark, dir, startingVersion = Some(2L))
      .writeStream.format("memory").queryName("cdc_feed_sv")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(changeSet(spark.table("cdc_feed_sv")) ===
      changeSet(CdcFeed.batch(spark, dir, fromVersion = 2L)))
    // pinned: nothing from v0/v1, everything from v2 on
    assert(changeSet(spark.table("cdc_feed_sv")) === Set(
      (2L, "b", "p1", "update_preimage", 2L),
      (2L, "b2", "p1", "update_postimage", 2L), (6L, "f", "p3", "insert", 2L),
      (1L, "a", "p1", "delete", 3L), (6L, "f", "p3", "delete", 3L),
      (7L, "g", "p1", "insert", 4L)))
  }

  test("startingTimestamp resolves through in-commit timestamps to the exact commit") {
    val dir = fiveCommitTable()
    val ict = TxnLake.history(spark, dir).select("version", "committed_at").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    // ICTs are strictly monotonic, so v3's own ICT is a deterministic
    // boundary: exactly versions 3 and 4 are at-or-after it
    val q = CdcFeed.stream(spark, dir, startingTimestamp = Some(ict(3L)))
      .writeStream.format("memory").queryName("cdc_feed_st")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(changeSet(spark.table("cdc_feed_st")) ===
      changeSet(CdcFeed.batch(spark, dir, fromVersion = 3L)))
    // past the newest commit there is nothing to replay — refuse loudly
    val e = intercept[IllegalArgumentException](
      CdcFeed.stream(spark, dir, startingTimestamp = Some(ict(4L) + 1L)))
    assert(e.getMessage.contains("no commit at or after"))
    // the two attach options are mutually exclusive
    intercept[IllegalArgumentException](CdcFeed.stream(spark, dir,
      startingVersion = Some(1L), startingTimestamp = Some(ict(2L))))
  }

  test("change capture is opt-in: a default table pays nothing and has no feed") {
    import spark.implicits._
    val dir = freshDir("graft_cdc_off")
    TxnLake.create(spark, dir, Seq((1L, "a", "p1")).toDF("id", "name", "part"), "part")
    TxnLake.upsert(spark, dir, Seq((1L, "a2", "p1")).toDF("id", "name", "part"), "id")
    assert(!TxnLake.cdcEnabled(spark, dir))
    assert(!new java.io.File(dir, TxnLake.CdcDir).exists())
    val e = intercept[IllegalArgumentException](CdcFeed.batch(spark, dir))
    assert(e.getMessage.contains("no " + TxnLake.CdcDir))
    // enabling mid-history captures from the NEXT commit on
    TxnLake.enableChangeFeed(spark, dir)
    TxnLake.append(spark, dir, Seq((2L, "b", "p2")).toDF("id", "name", "part"))
    assert(changeSet(CdcFeed.batch(spark, dir)) === Set((2L, "b", "p2", "insert", 2L)))
  }

  test("pure-insert feed entries are byte copies of the data files, not rewrites") {
    import spark.implicits._
    val dir = freshDir("graft_cdc_copy")
    TxnLake.create(spark, dir,
      Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "name", "part"),
      "part", changeFeed = true)
    val dataFiles = TxnLake.detail(spark, dir).select("path").collect()
      .map(r => new java.io.File(dir, r.getString(0)))
    val feedFiles = new java.io.File(dir, TxnLake.CdcDir + "/v00000000").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(feedFiles.nonEmpty)
    // every feed file's bytes equal SOME staged data file's bytes
    def bytes(f: java.io.File) = java.nio.file.Files.readAllBytes(f.toPath).toSeq
    val dataBytes = dataFiles.map(bytes).toSet
    assert(feedFiles.forall(f => dataBytes.contains(bytes(f))))
  }

  test("row-preserving OPTIMIZE emits no feed entry") {
    import spark.implicits._
    val dir = freshDir("graft_cdc_opt")
    TxnLake.create(spark, dir, Seq((1L, "a", "p1")).toDF("id", "name", "part"), "part",
      changeFeed = true)
    TxnLake.append(spark, dir, Seq((2L, "b", "p1")).toDF("id", "name", "part"))
    TxnLake.append(spark, dir, Seq((3L, "c", "p1")).toDF("id", "name", "part"))
    val stats = TxnLake.optimize(spark, dir, minFiles = 1)
    assert(stats.version === 3L)
    val feed = CdcFeed.batch(spark, dir)
    assert(feed.agg(max(col(TxnLake.VersionCol))).head().getLong(0) === 2L)
    assert(feed.count() === 3L) // the three appended rows, nothing rewritten
  }

  test("a fresh feed (enabled, no commit yet) reads as empty — no glob error, " +
      "no FileStreamSink probe stack trace") {
    import spark.implicits._
    val dir = freshDir("graft_cdc_fresh")
    TxnLake.create(spark, dir, Seq((1L, "a", "p1")).toDF("id", "name", "part"), "part")
    TxnLake.enableChangeFeed(spark, dir)
    val df = CdcFeed.batch(spark, dir)
    assert(df.count() === 0L)
    assert(df.columns.toSeq === CdcFeed.schemaOf(spark, dir).fieldNames.toSeq)
  }

  test("startingTimestamp rejects compact dates / tiny epochs instead of " +
      "silently replaying from 1970") {
    // '20240101' parses as a bare long (~Jan 1970) — must error, not
    // start the stream from version 0
    intercept[IllegalArgumentException](
      CdcFeed.parseStartingTimestamp(spark, "20240101"))
    intercept[IllegalArgumentException](
      CdcFeed.parseStartingTimestamp(spark, "12345"))
    // real epoch millis and Delta's string forms still parse
    assert(CdcFeed.parseStartingTimestamp(spark, "1700000000000") === 1700000000000L)
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    val want = java.time.LocalDate.of(2024, 1, 1).atStartOfDay(zone)
      .toInstant.toEpochMilli
    assert(CdcFeed.parseStartingTimestamp(spark, "2024-01-01") === want)
  }

  test("vacuum drops feed entries of dropped versions; later reads survive") {
    val dir = mutatedTable()
    TxnLake.vacuum(spark, dir, keepVersions = 2, graceMs = 0L)
    // versions 0 and 1 dropped => their feed dirs go; 2..3 retained
    val vs = CdcFeed.batch(spark, dir)
      .select(TxnLake.VersionCol).distinct().collect().map(_.getLong(0)).toSet
    assert(vs === Set(2L, 3L))
  }
}
