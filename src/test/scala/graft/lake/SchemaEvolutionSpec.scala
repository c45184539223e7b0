package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lake-reader schema evolution: a long-lived table accumulates files
  * written under different schema versions; the reader contract (parquet
  * `mergeSchema`) must unify them, null-fill history, and refuse
  * incompatible type changes loudly — the behaviors a 100 TB lake that
  * cannot rewrite history depends on. */
class SchemaEvolutionSpec extends AnyFunSuite with SparkTestSession {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_evolve").toString

  test("mergeSchema unifies evolving file schemas and null-fills old rows") {
    val dir = tmp()
    spark.range(5).select(col("id"), (col("id") * 2).as("v"))
      .write.parquet(s"$dir/batch=1")
    spark.range(5, 8).select(col("id"), (col("id") * 2).as("v"),
        concat(lit("t"), col("id")).as("tag"))
      .write.parquet(s"$dir/batch=2")
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.toSet === Set("id", "v", "tag", "batch"),
      "late-added column + partition column must both surface")
    assert(df.count() === 8)
    assert(df.filter(col("tag").isNull).count() === 5,
      "pre-evolution rows read as null for the new column")
    assert(df.filter(col("tag").startsWith("t")).count() === 3)
    // predicates on the late column still prune partitions that predate it
    assert(df.filter(col("tag") === "t6").select("id").head().getLong(0) === 6L)
  }

  test("without mergeSchema one file's schema wins — the option is the contract") {
    val dir = tmp()
    spark.range(3).select(col("id")).write.parquet(s"$dir/batch=1")
    spark.range(3, 5).select(col("id"), lit(1.5).as("w"))
      .write.parquet(s"$dir/batch=2")
    val cols = spark.read.parquet(dir).columns.toSet - "batch"
    assert(cols === Set("id") || cols === Set("id", "w"),
      s"default schema comes from sampled footers, got $cols")
  }

  test("incompatible type evolution fails loudly, not silently") {
    val dir = tmp()
    spark.range(3).select(col("id"), lit(1).as("x")).write.parquet(s"$dir/batch=1")
    spark.range(3, 5).select(col("id"), lit("s").as("x")).write.parquet(s"$dir/batch=2")
    val e = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(dir).collect()
    }
    assert(e.getMessage != null, "int->string column conflict must raise")
  }
}
