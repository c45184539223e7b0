package graft.streaming

import graft.lake.TxnLake
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Streaming CHANGE-DATA-CAPTURE feed over a [[TxnLake]] table — the
  * incremental feed [[graft.lake.IncrementalView]] consumes in batch,
  * delivered as a Structured Streaming source.
  *
  * Every row-changing commit materializes its change rows in the full
  * preimage dialect (insert / update_preimage / update_postimage /
  * delete pre-images — subtractable, so the feed can maintain
  * aggregates downstream) under `_graft_cdc/v<version>`
  * at commit time, O(changed rows). Tailing the table is therefore a
  * plain checkpointed parquet FILE STREAM over that directory — Spark's
  * file source discovers each commit's new files, tracks them in the
  * stream checkpoint (exactly-once within the engine), and re-globs per
  * micro-batch, so new versions flow with no custom `MicroBatchStream`:
  * the declarative source Spark already has expresses "tail the log
  * version-by-version" exactly. Row-preserving commits (OPTIMIZE,
  * Z-order) emit nothing — a CDC consumer never re-processes rewritten
  * ride-along rows, which is what makes the feed O(logical change) while
  * snapshot diffs are O(rewritten files).
  *
  * Scale shape at 100 TB: feed volume tracks the MUTATION rate, not
  * table size; the stream scans only never-seen files (no listing of
  * data dirs, no snapshot diff); and downstream apply is one
  * partition-pruned transactional upsert + delete per micro-batch via
  * [[applyCdc]] — the same idempotent discipline as
  * [[UpsertSink.applyBatchTxn]], so replayed batches cannot drift the
  * replica.
  */
object CdcFeed {

  /** The feed's schema: the table's CURRENT schema (older feed files
    * null-fill later columns, exactly like the table's own readers)
    * plus the change-type and commit-version columns. */
  def schemaOf(spark: SparkSession, dir: String): StructType =
    TxnLake.read(spark, dir).schema
      .add(TxnLake.ChangeTypeCol, StringType)
      .add(TxnLake.VersionCol, LongType)

  private def feedGlob(dir: String): String = s"$dir/${TxnLake.CdcDir}/v*"

  private def requireFeed(spark: SparkSession, dir: String): Unit = {
    val root = new Path(dir, TxnLake.CdcDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root),
      s"$dir has no ${TxnLake.CdcDir} feed — the table predates change capture; " +
        "use TxnLake.changes for a snapshot diff")
  }

  /** Pure-insert commits (and TRUNCATE's whole-file deletes) byte-copy
    * their data files into the feed (zero write amplification —
    * [[TxnLake]] `copyCdcFiles`), so those
    * files carry neither `_change_type` nor `_commit_version`; the
    * schema-by-name read null-fills them and this projection derives
    * both — the type from the controlled basename prefix (`ins_*` =
    * 'insert', `del_*` = 'delete'; anchored on the basename so a table
    * PATH containing either substring cannot flip it), the version
    * from the `v<N>` dir name. Explicitly-written change files keep
    * their stored columns (coalesce no-op). */
  private[graft] def derive(df: DataFrame): DataFrame =
    df.withColumn("__cdc_file", col("_metadata.file_path"))
      .withColumn(TxnLake.VersionCol, coalesce(col(TxnLake.VersionCol),
        regexp_extract(col("__cdc_file"),
          "/" + TxnLake.CdcDir + "/v(\\d+)/", 1).cast("long")))
      .withColumn(TxnLake.ChangeTypeCol,
        coalesce(col(TxnLake.ChangeTypeCol),
          when(regexp_extract(col("__cdc_file"),
            "/del_\\d+\\.parquet$", 0) =!= "", lit("delete"))
            .otherwise(lit("insert"))))
      .drop("__cdc_file")

  /** Batch read of the feed: every retained change at `fromVersion` or
    * later, one row per changed row per commit, tagged
    * `_change_type` in the preimage dialect and `_commit_version`. */
  def batch(spark: SparkSession, dir: String, fromVersion: Long = 0L): DataFrame = {
    requireFeed(spark, dir)
    val schema = schemaOf(spark, dir)
    // ONE driver listing resolves the v-dirs, and the read takes the
    // CONCRETE dir list instead of the glob: an empty feed early-returns
    // (the glob would throw), version pruning drops pre-cutoff dirs
    // before the scan ever lists their files, and a multi-path read
    // skips Spark's FileStreamSink metadata probe — which, fed the
    // glob, logged a FileNotFoundException stack trace per read
    val root = new Path(dir, TxnLake.CdcDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vDirs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
      .map(st => (st.getPath.getName.drop(1).toLong, st.getPath.toString))
      .filter(_._1 >= fromVersion)
      .sortBy(_._1)
    if (vDirs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    derive(spark.read.schema(schema).parquet(vDirs.map(_._2).toIndexedSeq: _*))
      .filter(col(TxnLake.VersionCol) >= fromVersion)
  }

  /** The feed as a streaming source. `maxFilesPerTrigger` caps each
    * micro-batch's file intake (backfill pacing); version ordering
    * within the stream follows file order (the v-dirs sort by version).
    * Pair with [[applyCdc]] in `foreachBatch` — or any stateful
    * pipeline — and the checkpoint makes delivery exactly-once
    * end-to-end against an idempotent sink.
    *
    * A LATE-ATTACHING consumer picks its replay point with
    * `startingVersion` (changes of that commit and later — Delta CDF's
    * option of the same name) or `startingTimestamp` (the first commit
    * whose IN-COMMIT timestamp is at or after it — resolved through
    * the ICT in each log record, so the boundary survives file-mtime
    * rewrites; epoch millis). Mutually exclusive; default replays the
    * whole retained feed. The cutoff rides the per-row
    * `_commit_version`, so the stream's first batch lists the retained
    * feed dirs once and discards pre-cutoff rows; every later batch
    * touches only never-seen files. */
  def stream(spark: SparkSession, dir: String,
             maxFilesPerTrigger: Option[Int] = None,
             startingVersion: Option[Long] = None,
             startingTimestamp: Option[Long] = None): DataFrame = {
    requireFeed(spark, dir)
    require(startingVersion.isEmpty || startingTimestamp.isEmpty,
      "startingVersion and startingTimestamp are mutually exclusive")
    val from = startingVersion.orElse(
      startingTimestamp.map(firstVersionAtOrAfter(spark, dir, _)))
    val reader = spark.readStream.schema(schemaOf(spark, dir))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val df = derive(reader.parquet(feedGlob(dir)))
    from.fold(df)(v => df.filter(col(TxnLake.VersionCol) >= v))
  }

  /** Parse a `startingTimestamp` OPTION value — Delta accepts both a
    * timestamp string (`yyyy-MM-dd HH:mm:ss[.f]`) and a date
    * (`yyyy-MM-dd`); epoch millis are kept as a convenience form.
    * Anything else raises a descriptive error naming the accepted
    * formats rather than an opaque NumberFormatException. String forms
    * bind wall time in the SPARK SESSION's timezone (Delta's
    * behavior) — java.sql.Timestamp.valueOf would silently use the JVM
    * default zone, starting the stream hours off when the two
    * differ. */
  private[graft] def parseStartingTimestamp(spark: org.apache.spark.sql.SparkSession,
                                            s: String): Long = {
    val t = s.trim
    val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    def local(ldt: java.time.LocalDateTime): Long =
      ldt.atZone(zone).toInstant.toEpochMilli
    val fmt = java.time.format.DateTimeFormatter.ofPattern(
      "yyyy-MM-dd HH:mm:ss[.SSS][.SS][.S]")
    // string forms FIRST: a compact date like '20240101' parses as a
    // bare long too (~20M ms past epoch — Jan 1 1970), and epoch-first
    // ordering would silently start the stream from version 0 instead
    // of raising the descriptive format error. The epoch convenience
    // form additionally requires a sanity floor (1e11 ms ≈ 1973) — no
    // in-commit timestamp predates the log format, so a smaller value
    // is a mistyped date, not a replay point.
    scala.util.Try(local(java.time.LocalDateTime.parse(t, fmt)))
      .orElse(scala.util.Try(local(
        java.time.LocalDate.parse(t).atStartOfDay())))
      .orElse(scala.util.Try(t.toLong).filter(_ >= 100000000000L))
      .getOrElse(throw new IllegalArgumentException(
        s"startingTimestamp '$s' is not a timestamp — expected " +
          "'yyyy-MM-dd HH:mm:ss[.f]', 'yyyy-MM-dd', or epoch millis " +
          "(>= 100000000000, i.e. after 1973)"))
  }

  /** Earliest commit whose in-commit timestamp is >= `tsMillis`
    * (Delta's `startingTimestamp` contract). Log-scale driver work —
    * one history replay, no data files touched. */
  private[graft] def firstVersionAtOrAfter(spark: SparkSession, dir: String,
                                    tsMillis: Long): Long = {
    val r = TxnLake.history(spark, dir)
      .filter(col("committed_at") >= new java.sql.Timestamp(tsMillis))
      .agg(min(col("version"))).head()
    require(!r.isNullAt(0),
      s"no commit at or after timestamp $tsMillis in $dir's retained history")
    r.getLong(0)
  }

  /** Apply one micro-batch of feed rows to a downstream [[TxnLake]]
    * replica: reduce to the LAST change per key (version order; the
    * payload struct breaks pathological same-version ties the same
    * deterministic way [[UpsertSink]] dedups), then one transactional
    * upsert for surviving post-images and one keyed delete for doomed
    * keys. Idempotent: a replayed batch upserts identical values and
    * deletes already-absent keys, so the replica converges instead of
    * drifting — foreachBatch's at-least-once becomes exactly-once. */
  def applyCdc(batch: DataFrame, targetDir: String, key: String, partCol: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // update_preimage rows exist for aggregate maintenance (they make
    // sums subtractable); for key-based replication the post-image
    // alone is the truth — drop preimages before the per-key reduction
    // so an update's OLD value can never win the last-change struct
    val latest = lastChangePerKey(
      batch.filter(col(TxnLake.ChangeTypeCol) =!= "update_preimage"), key)
    val dataCols = batch.columns
      .filterNot(c => c == TxnLake.ChangeTypeCol || c == TxnLake.VersionCol)
    val upserts = latest.filter(col(TxnLake.ChangeTypeCol) =!= "delete")
      .select(dataCols.map(col).toIndexedSeq: _*)
    val deletes = latest.filter(col(TxnLake.ChangeTypeCol) === "delete")
      .select(col(key))
    if (!TxnLake.isTxnTable(spark, targetDir)) {
      // first batch bootstraps the replica; deletes of keys it never
      // held are vacuous (the key sets are disjoint after reduction)
      if (!upserts.isEmpty) TxnLake.create(spark, targetDir, upserts, partCol)
    } else {
      TxnLake.upsert(spark, targetDir, upserts, key) // empty set commits nothing
      TxnLake.delete(spark, targetDir, deletes, key) // ditto
    }
  }

  /** One-call replication: tail `sourceDir`'s feed and maintain a
    * transactional replica at `targetDir`. AvailableNow by default so
    * backfills drain and stop; pass `oneShot = false` for a continuous
    * tail. The replica equals the source snapshot at every drained
    * point (pinned stream==batch in CdcFeedSpec). */
  def replicate(spark: SparkSession, sourceDir: String, targetDir: String,
                key: String, partCol: String, checkpointDir: String,
                oneShot: Boolean = true): StreamingQuery = {
    val writer = stream(spark, sourceDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyCdc(batch, targetDir, key, partCol)
      }
    (if (oneShot) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  private def lastChangePerKey(batch: DataFrame, key: String): DataFrame = {
    val payload = batch.columns.filterNot(_ == key)
    // the version column LEADS the struct, so lexicographic max = the
    // latest change for the key within this batch
    val ordered = TxnLake.VersionCol +: payload.filterNot(_ == TxnLake.VersionCol)
    batch.groupBy(col(key))
      .agg(max(struct(ordered.map(col).toIndexedSeq: _*)).as("__chg"))
      .select(col(key) +: payload.map(c => col(s"__chg.$c").as(c)): _*)
      .select(batch.columns.map(col).toIndexedSeq: _*)
  }
}
