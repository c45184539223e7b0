package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** dev probe: observe dropDuplicatesWithinWatermark admission per batch */
object DdwwProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Min = 60L * 1000000L; val Base = 1700000000L * 1000000L
    val mem = MemoryStream[(Long, Long, String, Long)]
    val events = mem.toDF().toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
    val q = out.writeStream.format("memory").queryName("probe")
      .outputMode("append").start()
    Seq(0L, 5L, 20L, 35L).zipWithIndex.foreach { case (m, i) =>
      mem.addData((i.toLong, 7L, "click", Base + m * Min))
      q.processAllAvailable()
      val ids = spark.table("probe").select("event_id").collect().map(_.getLong(0)).toSeq.sorted
      println(s"PROBE| after t=${m}m cumulative kept=$ids")
    }
    q.stop()
    spark.stop()
  }
}
