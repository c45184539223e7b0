package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SLOWLY-CHANGING DIMENSION, TYPE 2 — full history with validity
  * intervals, the classic warehouse discipline (Kimball) on top of
  * [[TxnLake]]'s transactional upsert.
  *
  * Each business key holds a CHAIN of rows: `valid_from` / `valid_to`
  * version bounds (`valid_to = Long.MaxValue` sentinel = open) and an
  * `is_current` flag. [[apply]] takes a batch of dimension updates and,
  * for every key whose attributes actually CHANGED (null-safe compare;
  * unchanged rows are no-ops), closes the open row and opens a new one
  * — both through ONE transactional upsert on the surrogate id
  * `key:valid_from`, so the close+open pair is atomic: readers see the
  * old chain or the new chain, never a key with zero or two open rows.
  * Unknown keys insert as new chains.
  *
  * Scale shape: rows partition by a HASH BUCKET of the business key, so
  * a key's whole chain co-locates and an apply rewrites only the
  * buckets containing changed keys — never the full history (the reason
  * the table does NOT partition by `is_current`: closing a row would
  * migrate it into one giant history partition that every apply
  * rewrites). The changed-key detection is one broadcast-or-shuffle
  * join of the update batch against open rows; history depth costs
  * nothing (closed rows are never read by [[apply]]).
  *
  * [[asOf]] reconstructs the dimension at any version with a pure
  * interval filter — the batch-side of an as-of fact join — and
  * [[current]] is a partition-pruned-by-flag-free filter over open
  * rows. Time travel ([[TxnLake.readVersion]]) still works underneath,
  * but SCD2 answers "what did the dimension SAY as of load 7" even
  * after vacuum drops old snapshots — the history lives in the DATA.
  */
object Scd2 {

  /** Open-interval sentinel (printable, sortable, never a real load id). */
  val OpenVersion: Long = Long.MaxValue

  private val Meta = Seq("scd_id", "scd_bucket", "valid_from", "valid_to", "is_current")

  private def withMeta(rows: DataFrame, key: String, version: Long,
                       buckets: Int): DataFrame =
    rows
      .withColumn("scd_id", concat_ws(":", col(key).cast("string"), lit(version)))
      .withColumn("scd_bucket", pmod(xxhash64(col(key).cast("string")), lit(buckets)))
      .withColumn("valid_from", lit(version))
      .withColumn("valid_to", lit(OpenVersion))
      .withColumn("is_current", lit(true))

  /** Create the dimension table from its initial snapshot at `version`. */
  def init(spark: SparkSession, dir: String, dim: DataFrame, key: String,
           version: Long, buckets: Int = 16): Unit =
    TxnLake.create(spark, dir, withMeta(dim, key, version, buckets), "scd_bucket")

  /** Apply one batch of updates at `version` (monotonically increasing
    * load id). Attribute columns = every update column except the key;
    * they must all exist in the dimension. `buckets` MUST match the
    * value [[init]] created the table with (both default 16): taking it
    * as a parameter keeps apply cost O(batch + touched buckets) — a
    * max-scan probe would read a column of the whole table per load.
    *
    * Guards: the CHANGED set must be key-unique with non-null keys
    * (two differing rows for one key would mint colliding
    * `key:version` surrogates; a duplicate whose second copy is a
    * byte-identical no-op is harmless), and `version` must exceed
    * every TOUCHED chain's open `valid_from` (replayed / out-of-order
    * load ids would create overlapping validity intervals) — both
    * checked against the batch-sized changed set, never a full-table
    * scan.
    *
    * Returns the number of keys whose chain advanced (changed + new). */
  def apply(spark: SparkSession, dir: String, updates: DataFrame, key: String,
            version: Long, buckets: Int = 16): Long = {
    val tbl = TxnLake.read(spark, dir)
    val attrs = updates.columns.filterNot(_ == key).toSeq
    val bad = attrs.toSet -- tbl.columns.toSet
    require(bad.isEmpty, s"updates carry unknown columns ${bad.mkString(",")}")
    val cur = tbl.filter(col("is_current"))
    // byte-identical duplicate rows are the harmless union-assembled
    // case the guard below promises to accept — collapse them FIRST
    // (batch-sized shuffle), so only genuinely conflicting duplicates
    // (same key, different values) reach the key-uniqueness check
    val uniq = updates.distinct()
    val joined = uniq.as("u")
      .join(cur.as("c"), col(s"u.$key") === col(s"c.$key"), "left")
    val differs = attrs.map(a => !(col(s"u.$a") <=> col(s"c.$a")))
      .reduceOption(_ || _).getOrElse(lit(false))
    // pinned: the changed-key join feeds the close set, the open set
    // and the count — one materialization instead of three
    val toApply = joined.filter(col(s"c.scd_id").isNull || differs).cache()
    val n = toApply.count()
    if (n == 0) { toApply.unpersist(); return 0L }
    // the APPLIED set must be key-unique with non-null keys: two
    // differing rows for one key would open two rows sharing the
    // surrogate `key:version`, breaking one-open-row-per-key. Checked
    // on the changed set, not the raw batch — a duplicate whose second
    // copy is a byte-identical no-op is harmless and common in
    // union-assembled loads. Computed off the cached frame: no extra
    // table scan.
    val kk = toApply.agg(count(col(s"u.$key")).as("nk"),
      count_distinct(col(s"u.$key")).as("nd")).head()
    if (n != kk.getLong(0) || kk.getLong(0) != kk.getLong(1)) {
      toApply.unpersist()
      throw new IllegalArgumentException(
        s"updates batch is not key-unique on '$key' among changed rows " +
          s"($n changed, ${kk.getLong(0)} non-null keys, ${kk.getLong(1)} " +
          "distinct) — dedup the batch (e.g. keep the latest row per key) " +
          "before applying")
    }
    // `version` must ADVANCE past every touched chain's open row: a
    // replayed or out-of-order load id would seal intervals at or
    // before their own start — silent overlapping validity. Computed
    // from the already-cached changed set, so history depth costs
    // nothing and untouched keys don't gate.
    val maxOpen = toApply.agg(max(col("c.valid_from"))).head()
    if (!maxOpen.isNullAt(0) && version <= maxOpen.getLong(0)) {
      toApply.unpersist()
      throw new IllegalArgumentException(
        s"load version $version must exceed the touched chains' newest " +
          s"valid_from (${maxOpen.getLong(0)}) — out-of-order or replayed load")
    }
    // closing rows keep the OPEN row's surrogate id (same scd_id ⇒ the
    // upsert REPLACES it) with the interval sealed at this version
    val closing = toApply.filter(col(s"c.scd_id").isNotNull)
      .select(tbl.columns.map(c => col(s"c.$c")).toIndexedSeq: _*)
      .withColumn("valid_to", lit(version))
      .withColumn("is_current", lit(false))
    // opening rows are born at this version with a fresh surrogate id
    val opening = withMeta(
      toApply.select(col(s"u.$key").as(key) +:
        attrs.map(a => col(s"u.$a").as(a)): _*),
      key, version, buckets)
      .select(tbl.columns.map(col).toIndexedSeq: _*)
    try TxnLake.upsert(spark, dir, closing.unionByName(opening), "scd_id")
    finally toApply.unpersist()
    n
  }

  /** Open rows only — the dimension NOW. */
  def current(spark: SparkSession, dir: String): DataFrame =
    TxnLake.read(spark, dir).filter(col("is_current"))

  /** The dimension as of load `version`: interval containment, pure
    * filter — no log replay, works past vacuum horizons. */
  def asOf(spark: SparkSession, dir: String, version: Long): DataFrame =
    TxnLake.read(spark, dir)
      .filter(col("valid_from") <= version && col("valid_to") > version)

  /** Fact-side AS-OF join: each fact row (carrying `versionCol`, the
    * load id it was observed under) joins the dimension row whose
    * validity interval contains it. */
  def joinAsOf(facts: DataFrame, dim: DataFrame, key: String,
               versionCol: Column): DataFrame =
    facts.join(dim,
      facts(key) === dim(key) &&
        dim("valid_from") <= versionCol && dim("valid_to") > versionCol)

  /** Drop helper columns for presentation. */
  def business(df: DataFrame): DataFrame = Meta.foldLeft(df)(_ drop _)
}
