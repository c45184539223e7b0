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
  * pattern object stores implement with a manifest commit.
  *
  * [[upsertPartitioned]] is the 100 TB path: hive-partitioned target,
  * reads and rewrites ONLY partitions containing touched keys. Targets
  * already on the [[TxnLake]] commit-manifest protocol merge through it
  * (atomic manifest publish, snapshot-isolated readers, OCC); a hive
  * target whose merge touches a NULL or Hive-escaped partition value —
  * which the directory swap cannot name safely — is migrated to
  * [[TxnLake]] once and merged there instead of being refused.
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
    val aligned = castToTarget(updates, target)
    // a NULL merge key can neither match nor insert — the outer-join
    // selector would emit an all-NULL row and silently drop the payload
    require(aligned.filter(col(key).isNull).isEmpty,
      s"updates contain NULL values in merge key '$key'")
    val u = aligned.select(cols.map(c => col(c).as(s"u_$c")).toIndexedSeq: _*)
    val merged = target
      .join(u, col(key) === col(s"u_$key"), "full_outer")
      .select(cols.map(c =>
        when(col(s"u_$key").isNotNull, col(s"u_$c")).otherwise(col(c)).as(c)).toIndexedSeq: _*)
    swapWrite(spark, merged, targetDir)
  }

  /** Partition-pruned upsert for a hive-partitioned parquet target
    * (`targetDir/<partCol>=<value>/...`): only partitions that contain an
    * updated key are read, merged, and rewritten — the scale path the
    * full-table [[upsert]] documents. Untouched partition directories are
    * not read and not written (bytes moved are bounded by touched
    * partitions, not table size).
    *
    * The distinct touched-partition list is collected to the driver —
    * metadata-scale (bounded by partition count, not rows), the same
    * commit-planning step a Delta/Iceberg writer performs. Updates must
    * carry the partition column; rows may move BETWEEN partitions (the
    * old copy is dropped via key anti-join, the new one lands in its new
    * partition's rewrite).
    */
  def upsertPartitioned(spark: SparkSession, targetDir: String, updates: DataFrame,
                        key: String, partCol: String): Unit = {
    // a table already on the commit-manifest protocol merges through it
    if (TxnLake.isTxnTable(spark, targetDir)) {
      TxnLake.upsert(spark, targetDir, updates, key)
      return
    }
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverInterruptedSwap(fs, targetDir)
    val target = spark.read.parquet(targetDir)
    val cols = target.columns
    require(updates.columns.sorted.sameElements(cols.sorted),
      s"schema mismatch: target ${cols.mkString(",")} vs updates ${updates.columns.mkString(",")}")
    // align update types to the target's (the partition column's type is
    // INFERRED from directory names on read — e.g. part=1 reads as int —
    // so updates carrying it as string would otherwise join/isin against
    // a differently-typed column and build mismatched directory names)
    val aligned = castToTarget(updates, target)
    require(aligned.filter(col(key).isNull).isEmpty,
      s"updates contain NULL values in merge key '$key'")

    // commit planning: which partitions does this merge touch? The NEW
    // partition of every update row, plus any OLD partition still holding
    // a matched key (cross-partition moves).
    val newParts = aligned.select(col(partCol)).distinct()
    val oldParts = target.join(aligned.select(col(key).as(s"u_$key")),
        col(key) === col(s"u_$key"), "left_semi")
      .select(col(partCol)).distinct()
    val touched = newParts.union(oldParts).distinct().collect().map(_.get(0))
    if (touched.isEmpty) return
    // the directory swap below rebuilds partition paths as "$partCol=$v":
    // a NULL partition (__HIVE_DEFAULT_PARTITION__) or a value that Hive
    // path-escapes ( : = % # / \ control chars) would name a DIFFERENT
    // directory than the writer produced, silently dropping the merge.
    // Those merges migrate to the commit-manifest protocol, where
    // partition values are manifest metadata and need no path encoding.
    val safe = "[A-Za-z0-9_.-]+".r
    if (touched.contains(null) || touched.exists(v => !safe.matches(v.toString))) {
      TxnLake.convert(spark, targetDir, partCol)
      TxnLake.upsert(spark, targetDir, updates, key)
      return
    }

    // partition-pruned read: the filter prunes directories at planning
    // time, so unread partitions cost nothing
    val pruned = target.filter(col(partCol).isin(touched.toIndexedSeq: _*))
    val merged = pruned
      .join(aligned.select(col(key).as(s"u_$key")), col(key) === col(s"u_$key"), "left_anti")
      .select(cols.map(col).toIndexedSeq: _*)
      .unionByName(aligned.select(cols.map(col).toIndexedSeq: _*))

    // Rewrite ONLY the touched partition directories, then swap each
    // into place with backup-then-rename so a crash can never lose
    // committed data (mirrors swapWrite's .old protection):
    //   1. write every new partition dir into .staging (target untouched)
    //   2. MOVE each live touched partition into .backup — no deletes
    //   3. move staged partitions into place
    //   4. only after ALL partitions swapped, drop .backup + .staging
    // An exception before 4 restores the moved-out partitions from
    // .backup; a hard crash leaves .backup intact for recovery. In no
    // interleaving is a row removed before its replacement is written.
    val staging = new Path(targetDir + ".staging")
    val backup = new Path(targetDir + ".backup")
    merged.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(staging.toString)
    if (fs.exists(backup)) fs.delete(backup, true)
    fs.mkdirs(backup)
    val movedOut = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      touched.foreach { v =>
        val sub = s"$partCol=$v"
        val tp = new Path(targetDir, sub)
        if (fs.exists(tp)) { mustRename(fs, tp, new Path(backup, sub)); movedOut += sub }
      }
      touched.foreach { v =>
        val sub = s"$partCol=$v"
        val sp = new Path(staging, sub)
        if (fs.exists(sp)) mustRename(fs, sp, new Path(targetDir, sub))
      }
    } catch {
      case e: Throwable =>
        // best-effort rollback; if IT fails too, keep .backup on disk —
        // the next upsertPartitioned's recovery pass restores from it
        try {
          movedOut.foreach { sub =>
            val tp = new Path(targetDir, sub)
            if (fs.exists(tp)) fs.delete(tp, true) // half-swapped staged copy
            mustRename(fs, new Path(backup, sub), tp)
          }
          fs.delete(staging, true)
          fs.delete(backup, true)
        } catch { case r: Throwable => e.addSuppressed(r) }
        throw e
    }
    fs.delete(backup, true)
    fs.delete(staging, true)
  }

  /** If a previous partitioned upsert died mid-swap, `<target>.backup`
    * still holds partitions that were moved out of the target. Before
    * reading the target, restore every backup partition whose target
    * directory is missing (its staged replacement never landed) and
    * discard the rest (their replacement DID land — the backup copy is
    * the stale one), then clear the leftover swap dirs. Without this, a
    * rerun would read an incomplete target AND delete the only copy of
    * the moved-out rows when it cleared `.backup` for its own swap. */
  private def recoverInterruptedSwap(fs: org.apache.hadoop.fs.FileSystem,
                                     targetDir: String): Unit = {
    val backup = new Path(targetDir + ".backup")
    if (fs.exists(backup)) {
      fs.listStatus(backup).foreach { st =>
        val tp = new Path(targetDir, st.getPath.getName)
        if (!fs.exists(tp)) mustRename(fs, st.getPath, tp)
      }
      fs.delete(backup, true)
    }
    fs.delete(new Path(targetDir + ".staging"), true)
  }

  /** Hadoop `FileSystem.rename` reports most failures by returning
    * false, not throwing — every swap step must check it or the
    * exception-driven rollback silently never fires. */
  private def mustRename(fs: org.apache.hadoop.fs.FileSystem,
                         src: Path, dst: Path): Unit =
    require(fs.rename(src, dst), s"filesystem rename failed: $src -> $dst")

  /** Casts every column of `updates` to the target's column type —
    * update frames routinely carry wider/narrower literals (and the
    * partition column's type is read-side inferred), so the merge joins
    * and the rewritten files must use the TARGET's types. ANSI mode (on
    * by default) turns an unconvertible value into a loud error instead
    * of a silent NULL. */
  private def castToTarget(updates: DataFrame, target: DataFrame): DataFrame =
    updates.select(target.schema.fields.filter(f => updates.columns.contains(f.name))
      .map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)

  /** Copy-on-write delete of rows matching `predicate`. */
  def deleteWhere(spark: SparkSession, targetDir: String, predicate: String): Unit = {
    val remaining = spark.read.parquet(targetDir).filter(s"NOT ($predicate)")
    swapWrite(spark, remaining, targetDir)
  }

  /** Materialize `df` into a staging dir, then swap it into place.
    * (Directory rename = the poor man's manifest commit.) */
  private[graft] def swapWrite(spark: SparkSession, df: DataFrame, targetDir: String): Unit = {
    val staging = targetDir + ".staging"
    val old = targetDir + ".old"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tp = new Path(targetDir); val sp = new Path(staging); val op = new Path(old)
    if (fs.exists(op)) fs.delete(op, true)
    if (fs.exists(tp)) mustRename(fs, tp, op)
    mustRename(fs, sp, tp)
    fs.delete(op, true)
  }
}
