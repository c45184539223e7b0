package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a [[TxnLake]] change
  * feed — the "don't rescan the lake" primitive: a grouped aggregate
  * (count + sums) kept current by folding in each commit range's CDC
  * rows instead of recomputing over the full table.
  *
  * Requires the PREIMAGE form of the feed
  * ([[TxnLake.changes]] with `preimages = true`): inserts and update
  * postimages enter the aggregate with weight +1, deletes and update
  * preimages leave with weight -1, which makes count/sum maintenance a
  * pure signed aggregation — no second read of the base table, ever.
  *
  * EXACTNESS CONTRACT: incremental state only equals a full recompute
  * when the summed columns use exact-additive arithmetic — integers or
  * decimals (the lk01 discipline). Double sums drift by association
  * order; cast to DECIMAL before summing (lk04's oracle hash-matches
  * precisely because of this).
  *
  * Scale shape: the delta aggregates FIRST (map-side combinable, one
  * shuffle proportional to changed groups), then joins the view on its
  * group key — work is O(changes + touched groups), never O(table).
  * Groups whose maintained count reaches zero drop out of the view, so
  * repeated maintenance never accretes dead groups.
  */
object IncrementalView {

  /** Full build of the view over a snapshot: one row per group with
    * `n` (BIGINT count) and `sum_<c>` for each requested column. */
  def build(snapshot: DataFrame, groupCols: Seq[String], sumCols: Seq[String]): DataFrame =
    snapshot.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Fold one change-feed slice into the view. `changes` must carry
    * `_change_type` in the preimage dialect (insert / delete /
    * update_preimage / update_postimage); the plain-`update` dialect is
    * rejected because without preimages subtraction is impossible. */
  def applyChanges(view: DataFrame, changes: DataFrame,
                   groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1))
      .otherwise(raise_error(concat(
        lit("IncrementalView needs the preimage CDC dialect; got _change_type="),
        col("_change_type"))))
    val delta = changes.withColumn("__iv_s", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__iv_s")).as("__iv_dn"),
        sumCols.map(c => sum(col(c) * col("__iv_s")).as(s"__iv_d_$c")): _*)
    val joined = view.join(delta, groupCols, "full_outer")
    val merged = groupCols.map(col) ++
      Seq((coalesce(col("n"), lit(0L)) + coalesce(col("__iv_dn"), lit(0L))).as("n")) ++
      sumCols.map { c =>
        val prev = col(s"sum_$c")
        val d = col(s"__iv_d_$c")
        // null + null stays null (an all-NULL group), matching what a
        // full rebuild's sum() would report
        when(prev.isNull && d.isNull, lit(null))
          .otherwise(coalesce(prev, lit(0)) + coalesce(d, lit(0)))
          .cast(view.schema(s"sum_$c").dataType).as(s"sum_$c")
      }
    joined.select(merged: _*).filter(col("n") > 0)
  }
}
