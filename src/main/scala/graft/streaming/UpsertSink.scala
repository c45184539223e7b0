package graft.streaming

import graft.lake.MergeInto
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

  /** The per-micro-batch body, factored out so the exactly-once claim is
    * directly testable: Structured Streaming re-invokes this with the
    * SAME batch rows after a failure, and applying it twice must leave
    * the target byte-equal to applying it once. */
  def applyBatch(batch: DataFrame, targetDir: String, key: String): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.functions.{col, max, struct}
    // keep ONE row per key, deterministically: max over the payload
    // struct (lexicographic by column). dropDuplicates would pick an
    // arbitrary row, so a replayed batch could commit a DIFFERENT
    // winner than the original attempt — idempotence needs the
    // reduction itself to be order-independent.
    val cols = batch.columns
    val others = cols.filter(_ != key)
    val deduped = batch.groupBy(col(key))
      .agg(max(struct(others.map(col).toIndexedSeq: _*)).as("__payload"))
      .select(col(key) +: others.map(c => col(s"__payload.$c").as(c)): _*)
      .select(cols.map(col).toIndexedSeq: _*)
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
}
