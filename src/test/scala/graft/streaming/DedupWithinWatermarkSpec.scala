package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `dropDuplicatesWithinWatermark` ([[EventStreams.dedupWithinWatermark]])
  * — TIME-BOUNDED streaming dedup: a key's state lives only until the
  * watermark passes the admitted event's time + delay, so duplicates
  * inside the horizon drop, the key re-admits after it, and state is
  * O(keys active within the horizon), never O(all keys ever).
  *
  * The admission sequence is pinned one micro-batch per event, in
  * order, so watermark progression is deterministic. It also documents
  * how the STREAM differs from the batch greedy thinner
  * ([[EventStreams.thinWithinGap]]): admission waits for the WATERMARK
  * (driven by earlier events, delay behind) to pass the horizon, so an
  * event `gap` after the last admitted one can still be dropped if the
  * watermark lags — the stream is strictly more conservative. */
class DedupWithinWatermarkSpec extends AnyFunSuite with SparkTestSession {

  private val Min = 60L * 1000000L // one minute in µs
  // a modern base instant: timestamps at/near the epoch collide with
  // Spark's INITIAL watermark (0 = 1970-01-01) and get dropped as late
  private val Base = 1700000000L * 1000000L

  test("duplicates drop within the horizon; the key re-admits after the watermark passes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)] // (event_id, user_id, type, µs)
    val events = mem.toDF()
      .toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = EventStreams.dedupWithinWatermark(events, delay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ddww_out")
      .outputMode("append").start()
    try {
      // minutes 0, 5, 20, 35 — one batch each
      Seq(0L, 5L, 20L, 35L).zipWithIndex.foreach { case (m, i) =>
        mem.addData((i.toLong, 7L, "click", Base + m * Min))
        q.processAllAvailable()
      }
      val kept = spark.table("ddww_out").select("event_id").collect()
        .map(_.getLong(0)).toSet
      // t0 admits. t5 is inside the horizon (state expires at t10). t20
      // is PAST the horizon but the watermark (t5 - 10m = -5m) has not
      // passed it yet — still dropped: the conservative lag. t35 admits
      // (watermark t20 - 10m = t10 >= t10 evicted the state).
      assert(kept === Set(0L, 3L))
    } finally q.stop()
  }

  test("the batch greedy thinner admits strictly more: no watermark lag") {
    import spark.implicits._
    val batch = Seq((0L, 7L, "click", Base), (1L, 7L, "click", Base + 5 * Min),
      (2L, 7L, "click", Base + 20 * Min), (3L, 7L, "click", Base + 35 * Min))
      .toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val kept = EventStreams.thinWithinGap(batch, gapUs = 10 * Min)
      .select("event_id").collect().map(_.getLong(0)).toSet
    // greedy: t0 kept, t5 dropped, t20 kept (20-0 >= 10), t35 kept
    assert(kept === Set(0L, 2L, 3L))
  }

  test("independent keys keep independent horizons") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val events = mem.toDF()
      .toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val q = EventStreams.dedupWithinWatermark(events, delay = "10 minutes")
      .writeStream.format("memory").queryName("ddww_keys")
      .outputMode("append").start()
    try {
      mem.addData((0L, 1L, "click", Base), (1L, 2L, "view", Base))
      q.processAllAvailable()
      mem.addData((2L, 1L, "click", Base + 1 * Min), (3L, 2L, "purchase", Base + 1 * Min))
      q.processAllAvailable()
      val kept = spark.table("ddww_keys").select("event_id").collect()
        .map(_.getLong(0)).toSet
      // (1,click) duplicate drops; (2,purchase) is a DIFFERENT key than
      // (2,view) — admits
      assert(kept === Set(0L, 1L, 3L))
    } finally q.stop()
  }
}
