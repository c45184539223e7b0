package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.ingest.IngestMode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** Real streaming execution: file sources + AvailableNow triggers +
  * memory/parquet sinks, asserted equal to the batch forms of the same
  * transforms (the oracle-checked StreamingQueries). */
class StreamingSpec extends AnyFunSuite with SparkTestSession {

  private def tmp(): Path = Files.createTempDirectory("graft_stream")

  /** The file stream source requires a directory; stage the single-file
    * events table into one. */
  private lazy val eventsDir: String = {
    val dir = tmp().resolve("events_src")
    Files.createDirectories(dir)
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  /** Append sentinel events to a staged events dir, writing `ts` in the
    * SAME parquet type the source file uses (ns longs under
    * `nanosAsLong`, µs TIMESTAMP_NTZ, or an instant timestamp) so the
    * directory stays schema-homogeneous whatever the generator emitted
    * this round. Rows are (event_id, user_id, event_type, tsMicros). */
  private def appendSentinels(dir: String,
                              sentinels: Seq[(Long, Long, String, Long)]): Unit = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    import spark.implicits._
    val tsType = spark.read.parquet(dir).schema("ts").dataType
    val base = sentinels.toDF("event_id", "user_id", "event_type", "us")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val withTs = tsType match {
      case LongType => base.withColumn("ts", col("us") * 1000L)
      case TimestampNTZType =>
        base.withColumn("ts", expr("timestamp_micros(us)").cast("timestamp_ntz"))
      case _ => base.withColumn("ts", expr("timestamp_micros(us)"))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  /** Largest event timestamp of the staged fixture, in µs. */
  private def maxMicros(): Long = {
    import spark.implicits._
    Tables.events(spark, sf).agg(max(unix_micros(col("ts")))).as[Long].head()
  }

  test("ingest stream: arriving raw files are massaged exactly once, with lineage") {
    val dir = tmp()
    val raw = dir.resolve("raw"); Files.createDirectories(raw)
    Files.writeString(raw.resolve("a.csv"),
      "1,\"MULTIPOLYGON (((-73.1 40.1, -73.2 40.2)))\",QN\n2,\"plain, quoted\",BK\n")
    Files.writeString(raw.resolve("b.csv"), "3,nogeom,SI\n")
    val q = IngestStream.start(spark, raw.toString, dir.resolve("out").toString,
      dir.resolve("ckpt").toString, IngestMode.Actual)
    q.awaitTermination()
    val out = spark.read.parquet(dir.resolve("out").toString)
    assert(rows(out.select("value")) ===
      Set("1,,QN", "2,plain, quoted,BK", "3,nogeom,SI"))
    assert(out.filter(col("source_file").contains("a.csv")).count() === 2)
    // restart with same checkpoint: no reprocessing (exactly-once discovery)
    val q2 = IngestStream.start(spark, raw.toString, dir.resolve("out").toString,
      dir.resolve("ckpt").toString, IngestMode.Actual)
    q2.awaitTermination()
    assert(spark.read.parquet(dir.resolve("out").toString).count() === 3)
  }

  test("streaming tumbling window == batch tumbling window") {
    val stream = EventStreams.source(spark, eventsDir)
    val got = runToMemory(EventStreams.tumblingCounts(stream), "t_tumbling", "complete")
    val want = EventStreams.tumblingCounts(Tables.events(spark, sf))
    assert(rows(got) === rows(want))
    assert(got.count() > 0)
  }

  test("streaming session windows match lag/cumsum sessionization per user") {
    val stream = EventStreams.source(spark, eventsDir)
    val got = runToMemory(EventStreams.sessionStats(stream), "t_sessions", "complete")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"))
    val want = graft.SparkEntry.queries("st02_sessionization")(spark, sf)
      .select(col("user_id"), col("n_sessions"))
    assert(rows(got) === rows(want))
  }

  test("flatMapGroupsWithState running totals: final state equals batch per-user aggregates") {
    val stream = EventStreams.source(spark, eventsDir)
    val got = runToMemory(EventStreams.runningUserTotals(stream).toDF(), "t_state", "append")
    // the LAST emitted row per user is the final running total
    val finals = got.groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"))
    val want = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    assert(rows(finals) === rows(want))
  }

  test("stream-stream join (purchases x recent clicks) equals the batch join") {
    val stream = EventStreams.source(spark, eventsDir)
    val got = runToMemory(EventStreams.purchasesWithRecentClicks(stream),
      "t_ssjoin", "append")
    val want = EventStreams.purchasesWithRecentClicks(Tables.events(spark, sf))
    assert(got.count() > 0)
    assert(rows(got) === rows(want))
  }

  test("LEFT OUTER stream-stream join equals the batch outer join, null rows included") {
    // An outer join's NULL rows emit only when the global watermark
    // passes the purchase's match window, so a finite stream holds back
    // nulls for purchases within the lookback of the stream's end
    // (observed: exactly the last 2 unattributed purchases stayed in
    // state). Sentinel click+purchase events 1 h past the corpus
    // (user -1) advance BOTH sides' watermarks so every real null row
    // flushes; the sentinels match nothing and their own rows stay held
    // in state, so the emitted set equals the batch join over the
    // ORIGINAL events exactly.
    import spark.implicits._
    val dir = tmp().resolve("events_outer_src")
    Files.createDirectories(dir)
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val farUs = maxMicros() + 3600L * 1000000L
    appendSentinels(dir.toString,
      Seq((-1L, -1L, "click", farUs), (-2L, -1L, "purchase", farUs)))
    val got = runToMemory(EventStreams.purchasesWithClicksOuter(
      EventStreams.source(spark, dir.toString)), "t_ssouter", "append")
    val want = EventStreams.purchasesWithClicksOuter(Tables.events(spark, sf))
    assert(want.filter(col("click_id").isNull).count() > 0,
      "fixture must contain unattributed purchases or the test is vacuous")
    assert(rows(got) === rows(want))
  }

  test("FULL OUTER stream-stream join equals the batch full join — both null families flush") {
    // Same sentinel discipline as the left-outer test: null rows (on
    // EITHER side) emit only once the global watermark passes their
    // match window, so far-future click+purchase sentinels advance both
    // watermarks; the sentinels match nothing and stay held in state,
    // leaving the emitted set equal to the batch join over the
    // original events.
    import spark.implicits._
    val dir = tmp().resolve("events_full_outer_src")
    Files.createDirectories(dir)
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val farUs = maxMicros() + 3600L * 1000000L
    appendSentinels(dir.toString,
      Seq((-1L, -1L, "click", farUs), (-2L, -1L, "purchase", farUs)))
    val got = runToMemory(EventStreams.purchasesWithClicksFullOuter(
      EventStreams.source(spark, dir.toString)), "t_ssfull", "append")
    val want = EventStreams.purchasesWithClicksFullOuter(Tables.events(spark, sf))
    assert(want.filter(col("click_id").isNull).count() > 0,
      "fixture must contain unattributed purchases or the test is vacuous")
    assert(want.filter(col("purchase_id").isNull).count() > 0,
      "fixture must contain orphaned clicks or full-outer adds nothing over st10")
    assert(rows(got) === rows(want))
  }

  test("LEFT SEMI stream-stream join equals the batch semi join — one row per gated purchase") {
    // Plant a SECOND lookback click for an already-attributed purchase,
    // so the inner join fans out while the semi join still emits one
    // row — the dedup this join form exists for. Semi joins emit as
    // matches arrive (no held-back null family), so no watermark
    // sentinel is needed.
    import spark.implicits._
    val dir = tmp().resolve("events_semi_src")
    Files.createDirectories(dir)
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val attributed = EventStreams.purchasesWithRecentClicks(Tables.events(spark, sf))
      .select(col("purchase_id")).limit(1).as[Long].head()
    val (pUser, pTsUs) = Tables.events(spark, sf)
      .filter(col("event_id") === attributed)
      .select(col("user_id"), unix_micros(col("ts"))).as[(Long, Long)].head()
    appendSentinels(dir.toString,
      Seq((-1L, pUser, "click", pTsUs - 60L * 1000000L)))
    val got = runToMemory(EventStreams.purchasesWithClicksSemi(
      EventStreams.source(spark, dir.toString)), "t_sssemi", "append")
    val batchAug = Tables.eventsNormalized(spark.read.parquet(dir.toString))
    val want = EventStreams.purchasesWithClicksSemi(batchAug)
    val inner = EventStreams.purchasesWithRecentClicks(batchAug)
    assert(inner.count() > want.count(),
      "fixture must fan out (a purchase with >1 lookback click) or semi == inner")
    assert(rows(got) === rows(want))
  }

  test("streaming windowed top-k users equals the batch rank per window") {
    val stream = EventStreams.source(spark, eventsDir)
    // the stream computes the watermarked windowed counts; the rank
    // applies on finalized windows (complete-mode memory table here,
    // foreachBatch in production) — the composed result must equal the
    // one-shot batch pipeline
    val counts = runToMemory(EventStreams.windowUserCounts(stream),
      "t_topk_counts", "complete")
    val got = EventStreams.topUsersPerWindow(counts, 3)
    val want = EventStreams.topUsersPerWindow(
      EventStreams.windowUserCounts(Tables.events(spark, sf)), 3)
    assert(want.count() > 0, "fixture must produce ranked windows")
    assert(rows(got) === rows(want))
  }

  test("streaming dedup keeps one row per (user_id, event_type)") {
    val stream = EventStreams.source(spark, eventsDir)
    val got = runToMemory(EventStreams.dedupFirstPerUserType(stream), "t_dedup", "append")
    val batchKeys = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct()
    assert(got.count() === batchKeys.count())
    assert(rows(got.select("user_id", "event_type")) === rows(batchKeys))
  }

  test("watermark drops late data deterministically in append mode") {
    // Watermark state persists in the CHECKPOINT across restarts, so two
    // separate AvailableNow runs give a deterministic batch boundary
    // without relying on file-listing order or per-trigger rate limits:
    //   run 1: events at 12:00, 12:04       -> checkpointed watermark 11:54
    //   run 2: a LATE row at 11:30 (< 11:54 -> MUST drop) plus on-time
    //          rows at 12:06 and 12:30; end-of-run watermark 12:20 closes
    //          the [12:00,12:05) and [12:05,12:10) windows.
    // Expected sink: exactly those two windows. A leaked late row would
    // emit [11:30,11:35) too — the drop is observed positively against a
    // NON-empty expected output, not via an empty sink.
    import org.apache.spark.sql.types._
    val dir = tmp()
    val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType)))
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, ts) =>
          org.apache.spark.sql.Row(id, java.sql.Timestamp.valueOf(ts), id, "click", 1.0, "{}")
        }), schema)
      val stage = dir.resolve(s"stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, src.resolve(s"$name.parquet"))
    }
    def run(): Unit = {
      val agg = spark.readStream.schema(schema).parquet(src.toString)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes")).agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "HH:mm").as("w"), col("n"))
      val q = agg.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    write("f1", Seq((1L, "2026-01-01 12:00:00"), (2L, "2026-01-01 12:04:00")))
    run()
    write("f2", Seq((3L, "2026-01-01 11:30:00"), (4L, "2026-01-01 12:06:00"),
      (5L, "2026-01-01 12:30:00")))
    run()
    val got = spark.read.parquet(out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("11:30"), s"late row leaked through the watermark: $got")
    assert(got === Map("12:00" -> 2L, "12:05" -> 1L),
      s"closed on-time windows must emit exactly once: $got")
  }

  test("transformWithState running totals equal flatMapGroupsWithState and batch") {
    // the Spark 4 arbitrary-state API requires the RocksDB provider
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = EventStreams.source(s2, eventsDir)
    val q = EventStreams.runningUserTotalsTws(stream).toDF()
      .writeStream.format("memory").queryName("t_tws")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val finals = s2.table("t_tws").groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"))
    val want = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    assert(rows(finals) === rows(want),
      "new-API state machine must converge to the same totals")
  }

  test("streaming anomaly gate equals the batch window form, verdict for verdict") {
    // three implementations of one integer predicate: the streaming
    // BigInt fold here, the columnar window plan in
    // StreamingQueries.st14 (the batch side of this assertion), and
    // the DuckDB HUGEINT oracle the driver compares st14 against —
    // exact arithmetic means set equality, not approximate overlap
    val stream = EventStreams.source(spark, eventsDir)
    val got = runToMemory(EventStreams.anomalyScores(stream).toDF(),
      "t_anomaly", "append")
    val want = graft.SparkEntry.queries("st14_stream_anomaly")(spark, sf)
    assert(want.count() > 0, "fixture must contain anomalies for the pin to bite")
    assert(rows(got.select(col("event_type"), col("event_id"), col("v"),
      col("n_prior"))) === rows(want))
  }

  test("anomaly state carries across micro-batches: split feed equals one-shot feed") {
    // two ts-ordered halves in separate files processed as separate
    // micro-batches must fold to the same anomaly set as one batch —
    // the state-handoff property that makes the operator a stream
    import spark.implicits._
    val ev = Tables.events(spark, sf).orderBy(col("ts"), col("event_id"))
    val cut = Tables.events(spark, sf).agg(
      expr("percentile_approx(unix_micros(ts), 0.5)")).as[Long].head()
    val dir = tmp().resolve("events_split")
    java.nio.file.Files.createDirectories(dir)
    // stage each half as a FLAT file (the file source does not recurse
    // into the directories DataFrame.write would produce)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val scratch = tmp().resolve(name)
      df.coalesce(1).write.parquet(scratch.toString)
      val part = java.nio.file.Files.list(scratch).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        dir.resolve(name))
    }
    stage(ev.filter(unix_micros(col("ts")) <= cut), "0_first.parquet")
    stage(ev.filter(unix_micros(col("ts")) > cut), "1_second.parquet")
    val src = EventStreams.source(spark, dir.toString)
    val q = EventStreams.anomalyScores(src).toDF()
      .writeStream.format("memory").queryName("t_anomaly_split")
      .outputMode("append")
      .option("maxFilesPerTrigger", "1")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val want = graft.SparkEntry.queries("st14_stream_anomaly")(spark, sf)
    assert(rows(spark.table("t_anomaly_split").select(col("event_type"),
      col("event_id"), col("v"), col("n_prior"))) === rows(want))
  }

  test("RocksDB state store: watermarked aggregation runs and matches batch") {
    // the large-state production backend (state spills to disk instead
    // of executor heap — the difference between bounded and unbounded
    // key cardinality at 100 TB). Run the same tumbling aggregation on
    // an isolated session pinned to RocksDB and require batch equality.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = EventStreams.source(s2, eventsDir)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("t_rocksdb")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = s2.table("t_rocksdb")
    val want = EventStreams.tumblingCounts(Tables.events(spark, sf))
    assert(rows(got) === rows(want),
      "RocksDB-backed state must produce the same windows as the default store")
  }

  test("stream-static enrichment equals the batch join, with no streaming state") {
    val stream = EventStreams.source(spark, eventsDir)
    val dim = Tables.customer(spark, sf)
    // stateless join => append mode with NO watermark must be accepted
    val got = runToMemory(EventStreams.enrichWithSegment(stream, dim),
      "t_enrich", "append")
    val want = EventStreams.enrichWithSegment(Tables.events(spark, sf), dim)
    assert(got.count() === Tables.events(spark, sf).count(),
      "every event must find its static dim row")
    assert(rows(got) === rows(want))
  }
}
