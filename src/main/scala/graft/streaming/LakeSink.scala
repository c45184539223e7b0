package graft.streaming

import graft.lake.TxnLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** EXACTLY-ONCE append-only streaming sink into a [[TxnLake]] table —
  * the raw-events ingest shape, where rows have no key to merge on
  * ([[UpsertSink]] covers keyed state; this covers fact streams).
  *
  * Structured Streaming replays a micro-batch after a crash, so a
  * plain append sink duplicates the replayed rows. Here every batch
  * commits through [[TxnLake.appendOnce]] carrying `(appId, batchId)`
  * as an APPLICATION TRANSACTION MARKER persisted in the commit record
  * (Delta's `txnAppId`/`txnVersion` recipe): a replayed batch finds its
  * marker already committed and becomes a silent no-op, and the check
  * re-runs inside the commit's OCC retry loop so even two concurrent
  * replays cannot both land. End-to-end: source offsets in the stream
  * checkpoint + idempotent sink = exactly-once table contents.
  *
  * Scale shape: each micro-batch is one blind append — O(batch) staged
  * bytes, one manifest record, no base file read — so ingest cost is
  * independent of table size; the marker lookup reads newest-first and
  * streaming markers cluster at the log head, so steady state is O(1)
  * metadata reads per batch.
  */
object LakeSink {

  /** Start the exactly-once append sink. The table is created EMPTY on
    * first use (so creation itself is replay-safe: every data row,
    * including batch 0's, lands through a marker-checked append).
    * One-shot (AvailableNow) by default. */
  def startAppend(stream: DataFrame, targetDir: String, partCol: String,
                  appId: String, checkpointDir: String,
                  oneShot: Boolean = true): StreamingQuery = {
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, targetDir, partCol, appId, id); ()
      }
    (if (oneShot) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Per-micro-batch body (testable exactly-once unit). Returns true
    * when the batch committed, false for a replay no-op. */
  def applyBatch(batch: DataFrame, targetDir: String, partCol: String,
                 appId: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    if (!TxnLake.isTxnTable(spark, targetDir)) {
      // empty create: concurrent/replayed creates collide on v0's
      // atomic publish — losing that race just means the table exists
      try TxnLake.create(spark, targetDir, batch.limit(0), partCol)
      catch { case _: IllegalArgumentException => () }
    }
    TxnLake.appendOnce(spark, targetDir, batch, appId, batchId)
  }
}
