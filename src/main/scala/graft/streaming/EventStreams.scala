package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming transforms over the `events` table shape
  * (FIXTURES.md B): watermarked tumbling/sliding windows, session
  * windows, and in-stream deduplication.
  *
  * Each transform takes a DataFrame so it runs identically on a
  * `readStream` source (streaming) and a `read` source (batch) — the
  * batch-equivalent queries in `StreamingQueries` use the exact same
  * functions, and `StreamingSpec` asserts stream-vs-batch agreement.
  *
  * Scale posture: all stateful operators key their state by (window ×
  * group) or (user), bounded by the watermark — state store size is
  * O(active keys), not O(stream length); late data past 10 minutes is
  * dropped deterministically.
  */
object EventStreams {

  /** Streaming source over an events parquet directory. `readStream`
    * needs an explicit schema; it is probed from the directory's parquet
    * footers (a driver-side metadata read), so the source tracks
    * whatever ts type the generator used that round — ns longs under
    * `nanosAsLong`, µs NTZ, or a plain timestamp — and `ts` is then
    * normalized to a µs TimestampType exactly like `Tables.events`. */
  def source(spark: SparkSession, dir: String): DataFrame = {
    val footerSchema = spark.read.parquet(dir).schema
    graft.Tables.eventsNormalized(
      spark.readStream.schema(footerSchema).parquet(dir))
  }

  /** Tumbling 5-minute counts per event type, 10-minute watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding windows: 10-minute window every 5 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"))

  /** Per-(10-minute-window, user) event counts — the windowed
    * aggregation half of the streaming top-k pattern. Ranking is NOT
    * done in-stream: append-mode streaming cannot re-rank a window as
    * rows arrive, so the standard shape is watermarked windowed counts
    * in the stream and [[topUsersPerWindow]] applied per finalized
    * window (or in foreachBatch). */
  def windowUserCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("user_id"), col("n"))

  /** Top-k users per finalized window from [[windowUserCounts]] output
    * (ties broken by user_id). A per-window partitioned window function
    * — each window's candidate set is small (active users in 10 min),
    * so the rank never sees unbounded state. */
  def topUsersPerWindow(counts: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("wstart")).orderBy(col("n").desc, col("user_id"))))
      .filter(col("rk") <= k)
      .select(col("wstart"), col("rk").cast("int").as("rk"),
        col("user_id"), col("n"))
  }

  /** Session windows per user with a 10-minute inactivity gap. */
  def sessionStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))

  /** In-stream dedup on (user_id, event_type) within the watermark —
    * the streaming analog of dropDuplicates. */
  def dedupFirstPerUserType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates(Seq("user_id", "event_type"))
      .select(col("user_id"), col("event_type"), col("event_id"))

  /** TIME-BOUNDED streaming dedup (`dropDuplicatesWithinWatermark`,
    * Spark 3.5+): per-key state lives only until the watermark passes
    * the admitted event's time + the delay — duplicates within the
    * horizon drop, the key re-admits after it, and state is O(active
    * keys within the horizon) instead of O(all keys ever) (the
    * unbounded-state problem plain `dropDuplicates` has on an
    * eternal stream). DedupWithinWatermarkSpec pins the admission
    * sequence on a crafted in-order feed. */
  def dedupWithinWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))

  /** BATCH interval thinning — the deterministic batch analog of
    * [[dedupWithinWatermark]]: per (user, type), keep an event iff it
    * is at least `gapUs` after the previously KEPT one (greedy,
    * anchored at the first event; admitted events do NOT slide the
    * horizon, unlike sessionization). The standard duplicate-ping /
    * retry-storm thinner for event pipelines. A greedy chain has no
    * window-function form — each verdict depends on the previous
    * KEPT event, not the previous row — so this is the documented
    * `flatMapGroups` case: genuinely sequential per-key logic, keyed
    * shuffle + per-group iterator, state one long per group. The
    * streaming execution's admission additionally lags on the
    * WATERMARK (an event re-admits only once the watermark — driven
    * by earlier events — passes the horizon), so stream and batch
    * agree on in-order feeds whose gaps exceed one delay, which is
    * what the spec pins. */
  def thinWithinGap(events: DataFrame, gapUs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Long, String), it: Iterator[(Long, String, Long, Long)]) =>
        val sorted = it.toSeq.sortBy(r => (r._4, r._3))
        var lastKept = Long.MinValue
        sorted.iterator.collect {
          case (_, _, id, us)
            if lastKept == Long.MinValue || us - lastKept >= gapUs =>
              lastKept = us
              (key._1, key._2, id, us)
        }
      }
      .toDF("user_id", "event_type", "event_id", "us")
  }

  /** Stream-stream inner join: purchases joined to the same user's
    * clicks within the preceding 10 minutes. Both sides watermarked so
    * the join state is bounded (clicks kept only until the purchase-side
    * watermark passes their window — the state-retention contract that
    * makes stream-stream joins feasible at scale). Works identically on
    * batch inputs (time-bound becomes a plain filter), which is what the
    * batch-equality spec asserts. */
  def purchasesWithRecentClicks(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "10 minutes")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES") &&
        col("click_ts") < col("purchase_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("value"))
  }

  /** LEFT OUTER stream-stream join: every purchase, attributed to the
    * clicks in its 10-minute lookback or emitted with NULL click when
    * none — the unattributed-conversion case the inner join
    * ([[purchasesWithRecentClicks]]) silently drops. In streaming this
    * is exactly where outer joins differ from inner: the engine must
    * hold each purchase in state until the CLICK-side watermark passes
    * its window (no further match possible) and only then emit the
    * null row, so both watermarks plus the time-range condition are
    * mandatory, not advisory. The batch form is the same transform
    * with the state machinery elided; StreamingSpec pins
    * stream == batch including the null rows. */
  def purchasesWithClicksOuter(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "10 minutes")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES") &&
        col("click_ts") < col("purchase_ts"),
      "left_outer")
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("value"))
  }

  /** FULL OUTER stream-stream join: the st10 left-outer attribution
    * plus the orphaned clicks — clicks that preceded no purchase in
    * their forward window surface with NULL purchase columns once the
    * watermark passes their window (state eviction is symmetric: both
    * sides buffer only within the 10-minute watermark bound). Completes
    * the watermarked stream-stream join matrix (inner st06, left st10,
    * full st11); runs identically on a batch frame. */
  def purchasesWithClicksFullOuter(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "10 minutes")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES") &&
        col("click_ts") < col("purchase_ts"),
      "full_outer")
      .select(coalesce(col("user_id"), col("c_user")).as("user_id"),
        col("purchase_id"), col("click_id"), col("value"))
  }

  /** LEFT SEMI stream-stream join: purchases that HAD at least one
    * click in their 10-minute lookback, emitted once each — the
    * existence-test form of [[purchasesWithRecentClicks]] (which
    * multiplies a purchase by its matching clicks). Streaming-wise the
    * state contract is the inner join's (both sides watermarked, the
    * range condition bounds buffering) but the output dedups on the
    * left row, so attribution fan-out never inflates downstream
    * volume — the gate-on-evidence shape (emit only events that were
    * preceded by X). Runs identically on a batch frame. */
  def purchasesWithClicksSemi(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "10 minutes")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES") &&
        col("click_ts") < col("purchase_ts"),
      "left_semi")
      .select(col("user_id"), col("purchase_id"), col("value"))
  }

  /** Stream-static enrichment: events joined to a STATIC dimension
    * (customer market segments) — the standard pattern for decorating a
    * stream with slowly-changing reference data. The static side is
    * explicitly broadcast, so the join is STATELESS per micro-batch
    * (no watermark, no state store — contrast stream-stream joins):
    * each batch re-reads the dim snapshot, which is also the semantics
    * users want when the dim is updated between batches. Works
    * identically on a batch `events` frame; StreamingQueries.st09
    * aggregates the same enrichment for the DuckDB oracle. */
  def enrichWithSegment(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))),
      Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("segment"),
        col("event_type"), col("value"))

  /** Custom arbitrary state (flatMapGroupsWithState): per-user running
    * totals emitted on every update — the operator family for state that
    * windowed aggregation can't express (counters, ML feature state,
    * fraud scores). State is one small case class per user; at scale the
    * state store shards by the group key like any keyed state. */
  def runningUserTotals(events: DataFrame): Dataset[UserTotal] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(col("user_id"), col("value")).as[(Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotal]) => {
          val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          rows.foreach { case (_, v) => n += 1; total += v }
          val next = UserTotal(userId, n, total)
          state.update(next)
          Iterator(next)
        })
  }

  /** Online anomaly detection (running z-score gate) as arbitrary
    * keyed state: an event is anomalous when its value deviates from
    * the mean of all STRICTLY PRECEDING same-type events by more than
    * 3 sample standard deviations — the classic online monitoring
    * primitive (fraud spikes, sensor faults, metric regressions).
    *
    * Exactness: the gate is evaluated in INTEGER arithmetic so the
    * stream, the batch window form (StreamingQueries.st14) and the
    * DuckDB oracle agree bit-for-bit — no Welford-vs-segment-tree
    * float drift can flip a marginal verdict. Values scale to cents
    * (`floor(v·100 + 0.5)` — exact on identical doubles in every
    * engine); the state is the raw moments (n, Σv, Σv²) as longs, and
    * `z² > 9` becomes the cross-multiplied comparison
    * `(n·v − S₁)²·(n−1) > 9·n·(n·S₂ − S₁²)` evaluated in BigInt.
    * Long moments hold to Σv² ≲ 9e18 (≈ 1e12 cent-squared events per
    * key); past that the state slots become BigDecimal strings.
    *
    * Order contract: each group call buffers and sorts its rows by
    * (ts, event_id) before folding, so batch mode (one call with the
    * whole group) replays the exact event-time sequence; in streaming,
    * micro-batches that respect event-time order compose to the same
    * fold because the state carries the moments across calls.
    * The first `minPrior` events per key only warm the state. */
  def anomalyScores(events: DataFrame, minPrior: Int = 30): Dataset[Anomaly] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(col("event_type"), col("event_id").cast("long"),
        unix_micros(col("ts")),
        floor(col("value") * 100 + lit(0.5)).cast("long"))
      .as[(String, Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (etype: String, rows: Iterator[(String, Long, Long, Long)],
         state: GroupState[TypeMoments]) => {
          val prev = state.getOption.getOrElse(TypeMoments(0L, 0L, 0L))
          var n = prev.n; var s1 = prev.s1; var s2 = prev.s2
          val buf = rows.toArray.sortBy(r => (r._3, r._2))
          val out = Array.newBuilder[Anomaly]
          buf.foreach { case (_, id, _, v) =>
            if (n >= minPrior) {
              val bn = BigInt(n)
              val d = bn * v - s1
              val lhs = d * d * (bn - 1)
              val rhs = BigInt(9) * bn * (bn * s2 - BigInt(s1) * BigInt(s1))
              if (lhs > rhs) out += Anomaly(etype, id, v, n)
            }
            n += 1; s1 += v; s2 += v * v
          }
          state.update(TypeMoments(n, s1, s2))
          out.result().iterator
        })
  }

  /** Per-user running totals on the Spark 4 arbitrary-state API
    * (`transformWithState` + [[RunningTotalProcessor]]) — the successor
    * to flatMapGroupsWithState: named typed state slots, optional
    * timers and TTL, and a RocksDB-backed store (the API requires it),
    * which is what unbounded-key state needs at 100 TB. Same semantics
    * as [[runningUserTotals]]; StreamingSpec pins both equal to batch. */
  def runningUserTotalsTws(events: DataFrame): Dataset[UserTotal] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}

/** Per-user running aggregate state for [[EventStreams.runningUserTotals]]. */
final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

/** Raw-moment state for [[EventStreams.anomalyScores]]: count, Σv, Σv²
  * of all events seen so far for one event type (cent-scaled longs). */
final case class TypeMoments(n: Long, s1: Long, s2: Long)

/** One anomalous event from [[EventStreams.anomalyScores]]: the
  * cent-scaled value and how many prior same-type events its z-score
  * gate was computed against. */
final case class Anomaly(event_type: String, event_id: Long, v: Long,
                         n_prior: Long)

/** [[org.apache.spark.sql.streaming.StatefulProcessor]] behind
  * [[EventStreams.runningUserTotalsTws]]: one named ValueState slot per
  * user, updated per input batch, emitted on every update. */
class RunningTotalProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Double), UserTotal] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var totals: ValueState[UserTotal] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserTotal]("totals",
      org.apache.spark.sql.Encoders.product[UserTotal], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
                               timerValues: TimerValues): Iterator[UserTotal] = {
    val prev = if (totals.exists()) totals.get() else UserTotal(key, 0L, 0.0)
    var n = prev.n_events
    var total = prev.total_value
    rows.foreach { case (_, v) => n += 1; total += v }
    val next = UserTotal(key, n, total)
    totals.update(next)
    Iterator(next)
  }
}
