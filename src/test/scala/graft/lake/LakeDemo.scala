package graft.lake

import graft.Tables
import graft.operators.SkewJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev driver: bucketed co-located join + salted skew join, end to end.
  * Run: sbt "Test/runMain graft.lake.LakeDemo <sfDir> <warehouseDir>" */
object LakeDemo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, wh) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    BucketedLake.writeBucketed(Tables.lineitem(spark, sfDir), "li_b", "l_orderkey", 8, Some("l_orderkey"))
    BucketedLake.writeBucketed(Tables.orders(spark, sfDir), "o_b", "o_orderkey", 8, Some("o_orderkey"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = BucketedLake.cocolocatedJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
    val plan = j.queryExecution.executedPlan.toString
    println("PLAN| exchanges=" + plan.linesIterator.count(_.contains("Exchange")) +
      " sortMerge=" + plan.contains("SortMergeJoin") +
      " bucketedScan=" + plan.contains("Bucketed: true"))
    println("JOIN| rows=" + j.count())

    val big = spark.range(0, 100000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"), col("id").as("v"))
    val small = spark.range(0, 50).select(col("id").as("k"), (col("id") * 2).as("w"))
    val plainCount = big.join(small, "k").count()
    val saltedCount = SkewJoin.saltedJoin(big, small, "k", 16).count()
    println(s"SKEW| plain=$plainCount salted=$saltedCount equal=${plainCount == saltedCount}")

    // MERGE upsert round trip on a throwaway parquet table
    import spark.implicits._
    val tdir = s"$wh/merge_t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("overwrite").parquet(tdir)
    MergeInto.upsert(spark, tdir, Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), "id")
    println("MERGE| after upsert: " + spark.read.parquet(tdir).orderBy("id")
      .collect().map(r => s"${r.getLong(0)}=${r.getString(1)}").mkString(","))
    MergeInto.deleteWhere(spark, tdir, "id = 1")
    println("MERGE| after delete: " + spark.read.parquet(tdir).orderBy("id")
      .collect().map(r => s"${r.getLong(0)}=${r.getString(1)}").mkString(","))

    // small-file compaction
    val cdir = s"$wh/compact_t"
    Tables.lineitem(spark, sfDir).repartition(48).write.mode("overwrite").parquet(cdir)
    val preCount = spark.read.parquet(cdir).count()
    val stats = Compaction.compact(spark, cdir, targetFileBytes = 8L * 1024 * 1024)
    println(s"COMPACT| files ${stats.filesBefore} -> ${stats.filesAfter} " +
      s"(${stats.bytes / 1024}KiB), rows preserved=${spark.read.parquet(cdir).count() == preCount}")

    // IVF ANN vs brute force through the public API
    val emb = Tables.embeddings(spark, sfDir)
    val brute = graft.operators.Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = graft.operators.Similarity.ivfTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    println(s"IVF| recall@10=${(brute & ivf).size / 10.0} hasSelf=${ivf.contains(0L)}")
    spark.stop()
  }
}
