package graft

import org.apache.spark.sql.SparkSession

/** Dev driver: time individual registered queries without a full Bench
  * sweep. Run:
  *   sbt "Test/runMain graft.QueryProbe <sfDir> <query> [query ...]"
  * Each query runs twice — cold (first-touch I/O + codegen) and warm —
  * so plan cost and constant overhead are distinguishable. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProbe <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // job counter: job COUNT is load-independent, so it separates
    // "query schedules too many tiny actions" (a code smell this probe
    // exists to catch) from ambient wall-time noise
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      (1 to 2).foreach { run =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"PROBE| $name run$run rows=$n%d wall=$w%.2fs jobs=${jobs.get() - j0}%d")
      }
    }
    spark.stop()
  }
}
