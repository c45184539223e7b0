package graft.ingest

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Throughput comparison for the ingest kernel: the reference's
  * single-threaded per-line replaceAll chain (re-expressed from its
  * observable semantics, `CSVIngest.java:60-86` — String.replaceAll
  * recompiles each regex on every call, which is the reference's real
  * per-line cost) vs this engine's Spark pipeline on the same file.
  * Run: sbt "Test/runMain graft.ingest.IngestThroughputProbe <nLines> <workDir>"
  */
object IngestThroughputProbe {

  /** Reference-style kernel: same observable transform, same
    * per-line replaceAll cost model (pattern recompiled per call). */
  private def referenceStyleMassage(lines: Iterator[String]): Long = {
    var n = 0L
    lines.foreach { line0 =>
      var line = line0.replaceAll("\"", "")
      line = line.replaceAll("MULTIPOLYGON ", "").trim()
      line = line.replaceAll("\\(\\(\\([0-9\\-\\.\\, \\(\\)]+\\)\\)\\)", "")
      n += line.length // consume so JIT can't drop the work
    }
    n
  }

  def main(args: Array[String]): Unit = {
    val nLines = if (args.nonEmpty) args(0).toInt else 500000
    val work = if (args.length > 1) args(1) else Files.createTempDirectory("ingest_tp").toString

    // landmark-shaped corpus: 28-ish columns with a quoted WKT block
    val raw = Paths.get(work, "big.csv")
    val w = Files.newBufferedWriter(raw)
    var i = 0
    while (i < nLines) {
      w.write(s"$i,\"MULTIPOLYGON (((-73.${i % 100} 40.${i % 100}, -73.${(i + 7) % 100} 40.${(i + 3) % 100}, -73.${i % 100} 40.${i % 100})))\"," +
        s"LP-$i,QN,,,Yes,District $i,,No,DESIGNATED,DESIGNATED,,06/29/1999 12:00:00 AM +0000,5/4/1999,,,,,,${i}.5,${i}.9,Queens,LP-$i,http://example.org/$i.pdf,http://example.org/$i.jpg,Historic District,06/30/1999 12:00:00 AM +0000\n")
      i += 1
    }
    w.close()
    val bytes = Files.size(raw)

    // single-threaded reference-style pass
    val t0 = System.nanoTime()
    val src = scala.io.Source.fromFile(raw.toFile)
    val sink = referenceStyleMassage(src.getLines())
    src.close()
    val refSec = (System.nanoTime() - t0) / 1e9
    println(f"THROUGHPUT| reference-style single-thread: ${nLines / refSec}%.0f lines/s " +
      f"(${bytes / refSec / 1e6}%.1f MB/s, sink=$sink)")

    // Spark pipeline (32 threads, codegen'd regexp, pattern compiled once)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      // one big text file would otherwise split into ~bytes/128MB tasks,
      // under-using the 32 cores — size splits to keep every core busy
      .config("spark.sql.files.maxPartitionBytes", (16L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm up
    spark.range(1000000).selectExpr("sum(id)").collect()
    import org.apache.spark.sql.functions._

    // apples-to-apples: transform only (the reference loop writes nothing);
    // first run pays codegen/JIT warmup — measure the second
    def transformOnly(): Long = spark.read.textFile(raw.toString)
      .select(LineMassager.massage(col("value")).as("v"))
      .select(sum(length(col("v")))).head().getLong(0)
    transformOnly()
    val t1 = System.nanoTime()
    val transformed = transformOnly()
    val xformSec = (System.nanoTime() - t1) / 1e9
    println(f"THROUGHPUT| graft transform-only (32 thr): ${nLines / xformSec}%.0f lines/s " +
      f"(${bytes / xformSec / 1e6}%.1f MB/s, sink=$transformed)")

    val t2 = System.nanoTime()
    val res = CsvIngestJob.massageFile(spark, raw.toString, s"$work/out")
    val sparkSec = (System.nanoTime() - t2) / 1e9
    println(f"THROUGHPUT| graft full pipeline (+write):  ${nLines / sparkSec}%.0f lines/s " +
      f"(${bytes / sparkSec / 1e6}%.1f MB/s, $res)")
    println(f"THROUGHPUT| transform speedup: ${refSec / xformSec}%.1fx, end-to-end: ${refSec / sparkSec}%.1fx")
    spark.stop()
  }
}
