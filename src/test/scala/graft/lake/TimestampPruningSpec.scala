package graft.lake

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Unit discipline for zone-map pruning on NON-numeric stats columns
  * (ADVICE r11, medium): manifest bounds are cast-to-double — epoch
  * SECONDS for timestamps — while a pushed timestamp literal carries
  * epoch MICROSECONDS. Before the fix, `ts >= TIMESTAMP'...'` compared
  * micros against seconds and pruned EVERY file (silent wrong results).
  * Now timestamp literals convert micros→seconds (bit-identical to
  * Spark's own cast), string/date columns abstain entirely, and the
  * writer records bounds only for trackable (numeric/timestamp)
  * columns. */
class TimestampPruningSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  /** Three day-banded commits: file-level ts ranges are disjoint, so a
    * day predicate can (and must) skip whole files. */
  private def freshTable(statsCols: Seq[String] = Seq("ts")): String = {
    val dir = Files.createTempDirectory("graft_tsprune").resolve("t").toString
    def batch(day: Int) =
      (0 until 20).map(i => (s"d$day-$i", "p", f"2024-01-0$day $i%02d:00:00"))
        .toDF("id", "part", "s")
        .withColumn("ts", to_timestamp(col("s"))).drop("s")
    TxnLake.create(spark, dir, batch(1), "part", statsCols = statsCols)
    TxnLake.append(spark, dir, batch(2))
    TxnLake.append(spark, dir, batch(3))
    dir
  }


  test("timestamp bounds are recorded as epoch seconds") {
    val dir = freshTable()
    val m = TxnLake.resolve(spark, dir).get
    assert(m.files.forall(_.stats.contains("ts")))
    val day1 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond.toDouble
    val lo = m.files.flatMap(_.stats.get("ts")).map(_._1).min
    assert(lo === day1, "bounds unit must be epoch seconds (cast-to-double)")
  }

  test("timestamp range filter returns the right rows AND prunes files") {
    val dir = freshTable()
    val total = TxnLake.resolve(spark, dir).get.files.size
    val q = spark.read.format("graft-txn").load(dir)
      .filter(col("ts") >= lit("2024-01-03 00:00:00").cast("timestamp"))
    // the bug: micros-vs-seconds pruned everything → 0 rows
    assert(q.count() === 20L, "timestamp filter must not lose matching rows")
    assert(scannedFiles(q) < total,
      s"day-3 filter should skip day-1/day-2 files (scanned ${scannedFiles(q)}/$total)")
    // equality/IN and the reversed comparison shapes stay correct too
    val eq = spark.read.format("graft-txn").load(dir)
      .filter(lit("2024-01-02 05:00:00").cast("timestamp") === col("ts"))
    assert(eq.count() === 1L)
  }

  test("timestamp filter stays correct through the DV fallback path") {
    val dir = freshTable()
    // an outstanding deletion vector forces the PrunedFilteredScan
    // relation (sources.Filter analysis, java.sql.Timestamp values)
    TxnLake.deleteWhere(spark, dir, col("id") === "d1-0")
    val q = spark.read.format("graft-txn").load(dir)
      .filter(col("ts") >= lit("2024-01-03 00:00:00").cast("timestamp"))
    assert(q.count() === 20L)
    val d1 = spark.read.format("graft-txn").load(dir)
      .filter(col("ts") < lit("2024-01-02 00:00:00").cast("timestamp"))
    assert(d1.count() === 19L, "doomed row subtracted, rest of day 1 intact")
  }

  test("string stats column records no bounds and never mis-prunes") {
    val dir = freshTable(statsCols = Seq("ts", "id"))
    val m = TxnLake.resolve(spark, dir).get
    assert(m.files.forall(f => !f.stats.contains("id")),
      "string columns are not bounds-trackable — recording would crash " +
        "ANSI casts or compare incompatible units")
    // a numeric-cast comparison against the string column must abstain
    // from manifest pruning (Catalyst still evaluates it per row)
    val q = spark.read.format("graft-txn").load(dir)
      .filter(col("id") === "d2-7")
    assert(q.count() === 1L)
  }

  test("legacy single statsCol of a non-trackable type commits without bounds") {
    // regression: the write-side trackability filter dropped the
    // __mn/__mx agg columns but the extraction still read them —
    // every commit on a string-statsCol table crashed
    val dir = Files.createTempDirectory("graft_strstats").resolve("t").toString
    val df = Seq(("a", "p1", 1L), ("b", "p2", 2L)).toDF("name", "part", "v")
    TxnLake.create(spark, dir, df, "part", statsCol = Some("name"))
    TxnLake.append(spark, dir, Seq(("c", "p1", 3L)).toDF("name", "part", "v"))
    val m = TxnLake.resolve(spark, dir).get
    assert(m.files.forall(f => f.zmin.isEmpty && f.zmax.isEmpty))
    assert(TxnLake.read(spark, dir).count() === 3L)
    assert(TxnLake.rowCount(spark, dir).get === 3L) // counts still ride along
  }
}
