package graft.streaming

import graft.lake.{MergeInto, TxnLake}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Effectively-exactly-once streaming sink: `foreachBatch` + keyed
  * upsert.
  *
  * Structured Streaming replays a batch after failure, so `foreachBatch`
  * bodies execute AT-LEAST-once; appending from one would duplicate
  * rows. Making the batch write idempotent — a keyed MERGE
  * ([[MergeInto.upsert]]) instead of an append — upgrades the
  * end-to-end contract: replaying batch N rewrites the same keys to the
  * same values, so duplicates cannot accumulate. This is the same
  * mechanism Delta's `foreachBatch` + `MERGE` recipe uses; here it runs
  * on plain parquet with a rename-commit swap.
  *
  * Scale path: swap [[MergeInto.upsert]] for
  * [[MergeInto.upsertPartitioned]] so each micro-batch rewrites only the
  * partitions its keys touch.
  */
object UpsertSink {

  /** Start an upsert sink for `stream` into the parquet dir `targetDir`,
    * merging on `key`. One-shot (AvailableNow) by default so batch-style
    * tests and backfills drain the source and stop. */
  def start(stream: DataFrame, targetDir: String, key: String,
            checkpointDir: String, oneShot: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, targetDir, key)
      }
    (if (oneShot) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Streaming-lakehouse sink: the same foreachBatch discipline landing
    * in a [[TxnLake]] table — every micro-batch becomes one atomic
    * manifest commit, so concurrent readers get snapshot isolation,
    * [[TxnLake.history]] is the batch audit trail, and
    * [[TxnLake.changes]] serves downstream incremental consumers
    * ([[graft.lake.IncrementalView]]) straight off the stream's output.
    * Pair with an UPDATE-mode stateful aggregation upstream: each batch
    * then carries full replacement values per key, which is what makes
    * the replayed-batch write CONTENT-idempotent (a replay commits one
    * more version whose snapshot is byte-equal — versions record the
    * attempt, the data cannot drift). `partCol` only applies on first
    * create; later batches read it from the manifest. */
  def startTxn(stream: DataFrame, targetDir: String, key: String, partCol: String,
               checkpointDir: String, oneShot: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatchTxn(batch, targetDir, key, partCol)
      }
    (if (oneShot) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Per-micro-batch body of [[startTxn]] (testable exactly-once unit):
    * dedup the batch deterministically, then one transactional upsert. */
  def applyBatchTxn(batch: DataFrame, targetDir: String, key: String,
                    partCol: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val deduped = dedupBatch(batch, key)
    if (TxnLake.isTxnTable(spark, targetDir)) TxnLake.upsert(spark, targetDir, deduped, key)
    else TxnLake.create(spark, targetDir, deduped, partCol)
    ()
  }

  /** The per-micro-batch body, factored out so the exactly-once claim is
    * directly testable: Structured Streaming re-invokes this with the
    * SAME batch rows after a failure, and applying it twice must leave
    * the target byte-equal to applying it once. */
  def applyBatch(batch: DataFrame, targetDir: String, key: String): Unit = {
    val spark = batch.sparkSession
    val deduped = dedupBatch(batch, key)
    val target = new Path(targetDir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(target)) MergeInto.upsert(spark, targetDir, deduped, key)
    // first batch goes through the same staging+rename commit as the
    // merge path: a direct write could die half-done, and the replay
    // would then see a partial targetDir and take the upsert branch
    // against unreadable data
    else MergeInto.swapWrite(spark, deduped, targetDir)
    ()
  }

  /** Keep ONE row per key, deterministically: max over the payload
    * struct (lexicographic by column). dropDuplicates would pick an
    * arbitrary row, so a replayed batch could commit a DIFFERENT winner
    * than the original attempt — idempotence needs the reduction itself
    * to be order-independent. Shared by both sink flavors. */
  private def dedupBatch(batch: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, max, struct}
    val cols = batch.columns
    val others = cols.filter(_ != key)
    batch.groupBy(col(key))
      .agg(max(struct(others.map(col).toIndexedSeq: _*)).as("__payload"))
      .select(col(key) +: others.map(c => col(s"__payload.$c").as(c)): _*)
      .select(cols.map(col).toIndexedSeq: _*)
  }
}
