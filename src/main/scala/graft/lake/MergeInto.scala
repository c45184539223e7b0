package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-style MERGE/upsert for plain-parquet lake tables (no Delta jars
  * in this environment; same copy-on-write mechanics Delta/Iceberg use
  * under the hood).
  *
  * Semantics of [[upsert]]: rows of `updates` replace target rows with
  * the same key (matched → update), unmatched update rows are inserted.
  * Implementation is a full-outer-join copy-on-write: read target, join
  * on key, prefer the update side, write to a staging directory, then
  * atomically swap directories. The swap is rename-based — the same
  * pattern object stores implement with a manifest commit; at 100 TB
  * you'd partition the target and rewrite ONLY partitions containing
  * matched keys (partition pruning on the join keys makes the read side
  * cheap; the write side is bounded by touched partitions).
  */
object MergeInto {

  /** Copy-on-write upsert of `updates` into the parquet dir `targetDir`
    * on `key`. Schemas must match. */
  def upsert(spark: SparkSession, targetDir: String, updates: DataFrame,
             key: String): Unit = {
    val target = spark.read.parquet(targetDir)
    val cols = target.columns
    require(updates.columns.sameElements(cols),
      s"schema mismatch: target ${cols.mkString(",")} vs updates ${updates.columns.mkString(",")}")
    // a NULL merge key can neither match nor insert — the outer-join
    // selector would emit an all-NULL row and silently drop the payload
    require(updates.filter(col(key).isNull).isEmpty,
      s"updates contain NULL values in merge key '$key'")
    val u = updates.select(cols.map(c => col(c).as(s"u_$c")).toIndexedSeq: _*)
    val merged = target
      .join(u, col(key) === col(s"u_$key"), "full_outer")
      .select(cols.map(c =>
        when(col(s"u_$key").isNotNull, col(s"u_$c")).otherwise(col(c)).as(c)).toIndexedSeq: _*)
    swapWrite(spark, merged, targetDir)
  }

  /** Copy-on-write delete of rows matching `predicate`. */
  def deleteWhere(spark: SparkSession, targetDir: String, predicate: String): Unit = {
    val remaining = spark.read.parquet(targetDir).filter(s"NOT ($predicate)")
    swapWrite(spark, remaining, targetDir)
  }

  /** Materialize `df` into a staging dir, then swap it into place.
    * (Directory rename = the poor man's manifest commit.) */
  private[lake] def swapWrite(spark: SparkSession, df: DataFrame, targetDir: String): Unit = {
    val staging = targetDir + ".staging"
    val old = targetDir + ".old"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tp = new Path(targetDir); val sp = new Path(staging); val op = new Path(old)
    if (fs.exists(op)) fs.delete(op, true)
    if (fs.exists(tp)) fs.rename(tp, op)
    fs.rename(sp, tp)
    fs.delete(op, true)
  }
}
