package graft.streaming

import graft.ingest.IngestMode
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Dev driver: exercises IngestStream + EventStreams end-to-end.
  * Run: sbt "Test/runMain graft.streaming.StreamDemo <workDir>" */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val work = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = Paths.get(work, "raw"); Files.createDirectories(raw)
    Files.writeString(raw.resolve("batch1.csv"),
      "10,\"MULTIPOLYGON (((-73.1 40.1, -73.2 40.2)))\",QN\n11,plain,BK\n")
    val out = s"$work/processed"; val ckpt = s"$work/ckpt"

    val q1 = IngestStream.start(spark, raw.toString, out, ckpt, IngestMode.Actual)
    q1.awaitTermination()
    println("== after batch1:")
    spark.read.parquet(out).orderBy("value").collect()
      .foreach(r => println(s"ROW| ${r.getString(0)} <- ${r.getString(1).split('/').last}"))

    // incremental arrival: a second file lands, stream restarted on same checkpoint
    Files.writeString(raw.resolve("batch2.csv"),
      "12,\"MULTIPOLYGON (((-73.3 40.3, -73.4 40.4)))\",SI\n")
    val q2 = IngestStream.start(spark, raw.toString, out, ckpt, IngestMode.Actual)
    q2.awaitTermination()
    println("== after batch2 (must be 3 rows, no reprocessing):")
    spark.read.parquet(out).orderBy("value").collect()
      .foreach(r => println(s"ROW| ${r.getString(0)} <- ${r.getString(1).split('/').last}"))

    // windowed streaming over a staged events dir
    val evDir = Paths.get(work, "events_src"); Files.createDirectories(evDir)
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      evDir.resolve("events.parquet"))
    val tq = EventStreams.tumblingCounts(EventStreams.source(spark, evDir.toString))
      .writeStream.format("memory").queryName("demo_windows")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    tq.awaitTermination()
    val wins = spark.table("demo_windows")
    println(s"== windows: ${wins.count()} rows")
    wins.orderBy(col("wstart"), col("event_type")).limit(4).collect()
      .foreach(r => println(s"WIN| $r"))

    // arbitrary stateful op: per-user running totals via flatMapGroupsWithState
    val sq = EventStreams.runningUserTotals(EventStreams.source(spark, evDir.toString))
      .toDF()
      .writeStream.format("memory").queryName("demo_state").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    sq.awaitTermination()
    val st = spark.table("demo_state")
    println(s"== state rows emitted: ${st.count()}")
    st.orderBy(col("user_id")).limit(3).collect().foreach(r => println(s"STATE| $r"))
    spark.stop()
  }
}
