package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet lake directories.
  *
  * Streaming ingest and frequent MERGEs leave directories of tiny files;
  * at scale the file count — not the byte count — dominates scan cost
  * (one task + one footer read per file, and object-store LIST calls).
  * Compaction rewrites a directory into ceil(bytes / targetFileBytes)
  * files via the same staged atomic swap MERGE uses.
  */
object Compaction {

  final case class CompactionStats(filesBefore: Int, filesAfter: Int,
                                   bytes: Long)

  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(p).filter(f => f.isFile &&
      f.getPath.getName.endsWith(".parquet"))
    val bytes = dataFiles.map(_.getLen).sum
    val targetFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(dir).repartition(targetFiles)
    MergeInto.swapWrite(spark, df, dir)
    val after = fs.listStatus(p).count(f => f.isFile &&
      f.getPath.getName.endsWith(".parquet"))
    CompactionStats(dataFiles.length, after, bytes)
  }
}
