package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-time CHECK constraints with a quarantine channel for a
  * [[TxnLake]] table — the lake-native descendant of the reference's
  * per-line error channel (`CSVIngest.java:96-112`: bad rows divert,
  * good rows continue): an incoming batch is split by declared
  * predicates, passing rows commit transactionally, failing rows land
  * in a quarantine table carrying the FIRST violated constraint's name
  * (declaration order — deterministic, so an oracle can replay the
  * classification).
  *
  * NULL handling is FAIL-CLOSED: a predicate evaluating to NULL
  * (e.g. `price > 0` over a NULL price) quarantines the row. This is
  * deliberately stricter than ANSI CHECK (where UNKNOWN passes) —
  * for a data-quality gate, "can't prove it's fine" means "don't
  * train on it", the same posture as the reference's abort-on-
  * mismatch schema validation (SchemaValidator's ordered semantics).
  *
  * Delivery contract: the quarantine write lands BEFORE the table
  * commit, so the TABLE is exactly-once (a crash between the two
  * leaves only quarantine rows, never a half-commit — TxnLake's
  * manifest publish is atomic) while the quarantine channel is
  * at-least-once under retries — strictly better than the reference's
  * blind re-put on both channels.
  *
  * Scale shape: classification is one row-local CASE column; each
  * channel is a filtered pass over the batch (no shuffle beyond the
  * writes themselves). The tagged batch is persisted inside
  * [[appendChecked]] so classification is computed exactly once —
  * required for correctness (not just speed): with a
  * non-deterministic input, two independent evaluations could land a
  * row in both channels or neither, breaking the exactly-one-channel
  * contract.
  */
object Constraints {

  /** Reserved classification column on quarantine rows. */
  val ViolationCol = "violation"

  /** First-failing-constraint classifier: NULL when every predicate
    * passes, else the name of the first (declaration order) predicate
    * that is false-or-NULL. Exposed for oracle replay and specs. */
  def violationOf(constraints: Seq[(String, Column)]): Column = {
    require(constraints.nonEmpty, "at least one constraint required")
    constraints.foldRight(lit(null).cast("string")) { case ((name, pred), acc) =>
      when(not(coalesce(pred, lit(false))), lit(name)).otherwise(acc)
    }
  }

  /** Append `rows` to the txn table at `dir`, diverting constraint
    * violations (with a [[ViolationCol]] reason) to parquet at
    * `quarantineDir`. Returns (committed, quarantined) row counts —
    * committed is the table's CUMULATIVE row count after this append
    * (the lake's authoritative state), quarantined is THIS CALL's
    * diverted rows (counted from the persisted split, not by
    * re-reading the quarantine dir, which would be cumulative and
    * cost a second full scan). */
  def appendChecked(spark: SparkSession, dir: String, rows: DataFrame,
                    constraints: Seq[(String, Column)],
                    quarantineDir: String): (Long, Long) = {
    require(!rows.columns.contains(ViolationCol),
      s"input must not already carry a '$ViolationCol' column")
    val tagged = rows.withColumn(ViolationCol, violationOf(constraints)).persist()
    try {
      val bad = tagged.filter(col(ViolationCol).isNotNull)
      bad.write.mode("append").parquet(quarantineDir)
      val nBad = bad.count()
      val good = tagged.filter(col(ViolationCol).isNull).drop(ViolationCol)
      TxnLake.append(spark, dir, good)
      (TxnLake.read(spark, dir).count(), nBad)
    } finally tagged.unpersist()
  }
}
