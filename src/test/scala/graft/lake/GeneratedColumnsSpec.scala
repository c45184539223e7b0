package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** GENERATED COLUMNS ([[TxnLake.setGeneratedColumns]] — Delta's
  * `GENERATED ALWAYS AS`): absent columns compute from their
  * expression on every write path, supplied values are validated
  * against it, the classic derived-partition-key use prunes at
  * planning time, and the property survives clones. */
class GeneratedColumnsSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_gencol").resolve("t").toString

  /** id + a timestamp; `day` is generated from ts and partitions. */
  private def createTable(dir: String): Unit = {
    val df = Seq(
      (1L, "2024-03-01 10:00:00"), (2L, "2024-03-01 11:00:00"),
      (3L, "2024-03-02 09:00:00"))
      .toDF("id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    TxnLake.create(spark, dir, df, "day",
      generatedCols = Map("day" -> "substring(cast(ts as string), 1, 10)"))
  }

  test("the generated partition key computes at create and on later appends") {
    val dir = freshDir()
    createTable(dir) // input df has NO day column at all
    // append also omits it — the writer never has to remember
    TxnLake.append(spark, dir,
      Seq((4L, "2024-03-03 08:00:00")).toDF("id", "s")
        .withColumn("ts", to_timestamp(col("s"))).drop("s"))
    val got = TxnLake.read(spark, dir).select("id", "day").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "2024-03-01", 2L -> "2024-03-01",
      3L -> "2024-03-02", 4L -> "2024-03-03"))
    // the derived key is a REAL partition column: day predicates prune
    val q = spark.read.format("graft-txn").load(dir)
      .filter(col("day") === "2024-03-01")
    assert(q.count() === 2L)
    val total = TxnLake.resolve(spark, dir).get.files.size
    assert(scannedFiles(q) < total,
      "generated partition key must prune like a stored one")
  }

  test("supplied values are validated; violators fail loudly") {
    val dir = freshDir()
    createTable(dir)
    // a matching supplied value is fine (CDC replication replays rows)
    TxnLake.append(spark, dir,
      Seq((5L, "2024-03-04 12:00:00", "2024-03-04")).toDF("id", "s", "day")
        .withColumn("ts", to_timestamp(col("s"))).drop("s"))
    assert(TxnLake.read(spark, dir).count() === 4L)
    // the violation check rides the STAGING projection itself
    // (raise_error aborts the write job — one evaluation, never a
    // separate pre-pass that could see different rows), so the
    // surfaced error is the job failure carrying the message
    val e = intercept[Exception] {
      TxnLake.append(spark, dir,
        Seq((6L, "2024-03-05 12:00:00", "2024-01-01")).toDF("id", "s", "day")
          .withColumn("ts", to_timestamp(col("s"))).drop("s"))
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + messages(t.getCause)
    assert(messages(e).contains("violating its"))
    assert(TxnLake.read(spark, dir).count() === 4L, "nothing committed")
  }

  test("updateWhere recomputes the derived key and refuses to SET it") {
    val dir = freshDir()
    createTable(dir)
    // moving ts must move day with it — or pruning on day would lie
    TxnLake.updateWhere(spark, dir, col("id") === 1L,
      Map("ts" -> lit("2024-06-15 08:00:00").cast("timestamp")))
    val got = TxnLake.read(spark, dir).filter(col("id") === 1L)
      .select("day").head().getString(0)
    assert(got === "2024-06-15")
    val e = intercept[IllegalArgumentException] {
      TxnLake.updateWhere(spark, dir, col("id") === 2L,
        Map("day" -> lit("1999-01-01")))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
  }

  test("rename/drop of the generated column or its source is refused") {
    val dir = freshDir()
    createTable(dir)
    val e1 = intercept[IllegalArgumentException](
      TxnLake.renameColumn(spark, dir, "ts", "event_ts"))
    assert(e1.getMessage.contains("reads it"))
    val e2 = intercept[IllegalArgumentException](
      TxnLake.dropColumn(spark, dir, "ts"))
    assert(e2.getMessage.contains("reads it"))
    // the generated column itself is equally structural (here it is
    // also the partition column, which already refuses — exercise the
    // generated guard on a non-partition generated column instead)
    val dir2 = freshDir()
    TxnLake.create(spark, dir2,
      Seq((1L, 10.0, "p1")).toDF("id", "v", "part"), "part",
      generatedCols = Map("v2" -> "v * 2"))
    val e3 = intercept[IllegalArgumentException](
      TxnLake.renameColumn(spark, dir2, "v2", "dbl"))
    assert(e3.getMessage.contains("GENERATED ALWAYS"))
  }

  test("time-dependent expressions are rejected (the replay rule)") {
    val dir = freshDir()
    val e = intercept[IllegalArgumentException] {
      TxnLake.create(spark, dir, Seq((1L, "p1")).toDF("id", "part"), "ingest_day",
        generatedCols = Map("ingest_day" -> "cast(current_date() as string)"))
    }
    assert(e.getMessage.contains("evaluation time"))
  }

  test("declaring the property on a populated table validates existing rows") {
    import org.apache.spark.sql.functions.{col => c}
    val dir = freshDir()
    TxnLake.create(spark, dir,
      Seq((1L, 5.0, 10.0, "p1"), (2L, 3.0, 6.0, "p1"))
        .toDF("id", "v", "v2", "part"), "part")
    TxnLake.setGeneratedColumns(spark, dir, Map("v2" -> "v * 2")) // holds: ok
    assert(TxnLake.generatedColumnsOf(spark, dir) === Map("v2" -> "v * 2"))
    val bad = freshDir()
    TxnLake.create(spark, bad,
      Seq((1L, 5.0, 11.0, "p1")).toDF("id", "v", "v2", "part"), "part")
    val e = intercept[IllegalArgumentException](
      TxnLake.setGeneratedColumns(spark, bad, Map("v2" -> "v * 2")))
    assert(e.getMessage.contains("existing rows violate"))
    intercept[IllegalArgumentException](
      TxnLake.setGeneratedColumns(spark, bad, Map("nope" -> "v * 2")))
  }

  test("upserts fill the generated column too") {
    val dir = freshDir()
    createTable(dir)
    TxnLake.upsert(spark, dir,
      Seq((2L, "2024-03-09 10:00:00"), (9L, "2024-03-10 10:00:00"))
        .toDF("id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s"),
      "id")
    val got = TxnLake.read(spark, dir).select("id", "day").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(2L) === "2024-03-09" && got(9L) === "2024-03-10")
  }

  test("overwrite fills the generated column like every other write path") {
    val dir = freshDir()
    createTable(dir)
    TxnLake.overwrite(spark, dir,
      Seq((10L, "2024-05-01 09:00:00"), (11L, "2024-05-02 09:00:00"))
        .toDF("id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s"))
    val got = TxnLake.read(spark, dir).select("id", "day").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(10L -> "2024-05-01", 11L -> "2024-05-02"))
  }

  test("nondeterministic expressions are rejected before any write") {
    val dir = freshDir()
    val df = Seq((1L, 1.0)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      TxnLake.create(spark, dir, df, "bucket",
        generatedCols = Map("bucket" -> "cast(rand() * 4 as int)"))
    }
    assert(e.getMessage.contains("deterministic"))
  }

  test("clones inherit the generated-column property") {
    val src = freshDir(); val dst = freshDir()
    createTable(src)
    TxnLake.clone(spark, src, dst)
    assert(TxnLake.generatedColumnsOf(spark, dst) ===
      Map("day" -> "substring(cast(ts as string), 1, 10)"))
    TxnLake.append(spark, dst,
      Seq((7L, "2024-04-01 00:30:00")).toDF("id", "s")
        .withColumn("ts", to_timestamp(col("s"))).drop("s"))
    assert(TxnLake.read(spark, dst).filter(col("day") === "2024-04-01").count() === 1L)
  }
}
