package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev driver: COMMIT-PROTOCOL TAX decomposition (VERDICT r14 #3). The
  * bench's phase line says table BUILD (multi-commit constructions) is
  * ~120 s of the 202 s sf0.1 total, concentrated in st20/lk20/st17/lk08
  * — all sequences of small commits. This probe isolates what one such
  * sequence pays per commit:
  *
  *   - `plain parquet write` — the Spark-job floor: the same tiny frame
  *     written with the stock writer, no protocol;
  *   - `TxnLake.append` — floor + staging rename + manifest resolve +
  *     record publish + CRC sidecar + checkpoint cadence;
  *   - `resolve()` alone — the log replay cost as the chain lengthens
  *     (the part a snapshot cache would remove);
  *   - a read at the end — the amortized consumer side.
  *
  * Run: sbt "Test/runMain graft.lake.CommitTaxProbe [nCommits]"
  */
object CommitTaxProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 30
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    def batch(k: Int) =
      (0 until 50).map(i => (k * 1000L + i, s"p${k % 4}", i * 1.0))
        .toDF("id", "part", "v")

    // floor: the same frames through the stock parquet writer
    val floorDir = java.nio.file.Files.createTempDirectory("graft_taxfloor")
    var floorMs = 0.0
    (0 until n).foreach { k =>
      val t0 = System.nanoTime()
      batch(k).write.mode("append").parquet(floorDir.resolve(s"b$k").toString)
      floorMs += ms(t0)
    }
    println(f"[tax-probe] plain parquet write x$n:   total ${floorMs / 1000}%7.2f s  (${floorMs / n}%6.1f ms/commit)")

    // the protocol path
    val dir = java.nio.file.Files.createTempDirectory("graft_taxprobe")
      .resolve("t").toString
    var t0 = System.nanoTime()
    TxnLake.create(spark, dir, batch(0), "part", statsCol = Some("v"))
    println(f"[tax-probe] create:                    ${ms(t0)}%7.1f ms")
    val perCommit = new scala.collection.mutable.ArrayBuffer[Double]
    val ops0 = TxnLake.Metrics.snapshot
    (1 until n).foreach { k =>
      val t = System.nanoTime()
      TxnLake.append(spark, dir, batch(k))
      perCommit += ms(t)
    }
    val ops1 = TxnLake.Metrics.snapshot
    println(f"[tax-probe] TxnLake.append x${n - 1}:      total ${perCommit.sum / 1000}%7.2f s  (${perCommit.sum / (n - 1)}%6.1f ms/commit)")
    val deltas = ops1.map { case (k, v) => k -> (v - ops0(k)) }
    val logOps = deltas("recordOpens") + deltas("manifestOpens") + deltas("logListings")
    println(f"[tax-probe]   log fs-ops: ${logOps / (n - 1).toDouble}%5.2f /commit " +
      s"(recordOpens=${deltas("recordOpens")} manifestOpens=${deltas("manifestOpens")} " +
      s"listings=${deltas("logListings")} cacheHits=${deltas("recordCacheHits")})")
    println(f"[tax-probe]   first 5: ${perCommit.take(5).map(x => f"$x%.0f").mkString(",")} ms   last 5: ${perCommit.takeRight(5).map(x => f"$x%.0f").mkString(",")} ms")

    // the STREAMING-SINK path: appendOnce's marker-checked commit (what
    // st17/st20/st23 pay per micro-batch). r16 baseline: FOUR log
    // listings per commit (resolve listed twice — listVersions +
    // resolveAt — plus the marker pre-check and the in-loop re-check,
    // each a listing + newest-first record scan). r17: resolve shares
    // ONE listing and both marker checks read the resolved manifest's
    // folded txns map — measured 2.10 log fs-ops/commit vs r16's ~5.1,
    // a ~60% cut per micro-batch.
    val dirOnce = java.nio.file.Files.createTempDirectory("graft_taxonce")
      .resolve("t").toString
    TxnLake.create(spark, dirOnce, batch(0), "part")
    val onceT0 = System.nanoTime()
    val opsA = TxnLake.Metrics.snapshot
    (1 until n).foreach(k => TxnLake.appendOnce(spark, dirOnce, batch(k), "probe", k.toLong))
    val opsB = TxnLake.Metrics.snapshot
    val onceMs = ms(onceT0)
    val dOnce = opsB.map { case (k, v) => k -> (v - opsA(k)) }
    val onceLogOps = dOnce("recordOpens") + dOnce("manifestOpens") + dOnce("logListings")
    println(f"[tax-probe] appendOnce x${n - 1} (sink path): total ${onceMs / 1000}%7.2f s  (${onceMs / (n - 1)}%6.1f ms/commit)")
    println(f"[tax-probe]   log fs-ops: ${onceLogOps / (n - 1).toDouble}%5.2f /commit " +
      s"(recordOpens=${dOnce("recordOpens")} manifestOpens=${dOnce("manifestOpens")} " +
      s"listings=${dOnce("logListings")} cacheHits=${dOnce("recordCacheHits")})")

    // resolve cost as the chain lengthens (what a snapshot cache removes)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    t0 = System.nanoTime()
    (0 until 50).foreach(_ => TxnLake.resolve(spark, dir))
    println(f"[tax-probe] resolve x50 at head:       total ${ms(t0) / 1000}%7.2f s  (${ms(t0) / 50}%6.1f ms/resolve)")

    // a DV delete + an upsert — the commit kinds lk08/st17 mix in
    t0 = System.nanoTime()
    TxnLake.deleteWhere(spark, dir, col("id") % 10 === 3)
    println(f"[tax-probe] deleteWhere (DV commit):   ${ms(t0)}%7.1f ms")

    t0 = System.nanoTime()
    val cnt = TxnLake.read(spark, dir).count()
    println(f"[tax-probe] read+count ($cnt rows):  ${ms(t0)}%7.1f ms")
    spark.stop()
  }
}
