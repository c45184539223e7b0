package graft.lake

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class CompactionSpec extends AnyFunSuite with SparkTestSession {

  test("compaction collapses many small files into few, preserving data") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").resolve("t").toString
    // 64 tiny files
    spark.range(0, 10000).select($"id", ($"id" * 2).as("v"))
      .repartition(64).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val checksum = before.agg(org.apache.spark.sql.functions.sum($"v")).head().getLong(0)

    val stats = Compaction.compact(spark, dir, targetFileBytes = 512L * 1024)
    assert(stats.filesBefore === 64)
    assert(stats.filesAfter < 8, s"still ${stats.filesAfter} files")

    val after = spark.read.parquet(dir)
    assert(after.count() === 10000)
    assert(after.agg(org.apache.spark.sql.functions.sum($"v")).head().getLong(0) === checksum)
  }

  test("compacting an already-compact directory is a no-op in file count") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact2").resolve("t").toString
    spark.range(0, 100).toDF("id").coalesce(1).write.parquet(dir)
    val stats = Compaction.compact(spark, dir)
    assert(stats.filesAfter === 1)
    assert(spark.read.parquet(dir).count() === 100)
  }
}
