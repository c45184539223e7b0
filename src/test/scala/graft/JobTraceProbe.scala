package graft

import org.apache.spark.sql.SparkSession

/** Dev driver: decompose a registered query's wall time into its Spark
  * JOBS (id, duration, first-stage callsite) plus the driver-side gaps
  * between them. Where QueryProbe answers "how many jobs", this answers
  * "WHICH jobs are the time" — the guide-§1 empirical loop for the
  * multi-commit lake builders whose cost hides inside queries().
  *
  * Run: sbt "Test/runMain graft.JobTraceProbe <sfDir> <query> [query ...]"
  */
object JobTraceProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobTraceProbe <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.cbo.planStats.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.lake.TxnCboStats.install(spark)
    graft.lake.GeneratedPartitionPruning.install(spark)

    case class J(id: Int, t0: Long, var t1: Long = -1L, site: String = "",
                 desc: String = "", var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val j = J(js.jobId, System.nanoTime(), site = site, desc = desc)
        j.stages = js.stageInfos.size
        j.tasks = js.stageInfos.map(_.numTasks).sum
        jobs.put(js.jobId, j); order.add(js.jobId); ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.t1 = System.nanoTime()); ()
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()

    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query '$name'"))
      (1 to 2).foreach { run =>
        jobs.clear(); order.clear()
        val t0 = System.nanoTime()
        val built = fn(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        val q0 = System.nanoTime()
        val n = built.count()
        val tQuery = (System.nanoTime() - q0) / 1e9
        Thread.sleep(300) // let the listener bus drain job-end events
        import scala.jdk.CollectionConverters._
        val js = order.asScala.flatMap(id => Option(jobs.get(id))).toVector
        val jobSum = js.filter(_.t1 > 0).map(j => (j.t1 - j.t0) / 1e9).sum
        // driver gaps: time between one job's end and the next one's start
        val gaps = js.sliding(2).collect {
          case Vector(a, b) if a.t1 > 0 => (b.t0 - a.t1) / 1e9
        }.toVector
        println(f"TRACE| $name run$run rows=$n%d build=$tBuild%.2fs query=$tQuery%.2fs " +
          f"jobs=${js.size}%d jobSum=$jobSum%.2fs gapSum=${gaps.sum}%.2fs")
        if (run == 2) {
          js.sortBy(j => -(j.t1 - j.t0)).take(18).foreach { j =>
            val dt = if (j.t1 > 0) (j.t1 - j.t0) / 1e9 else -1.0
            val rel = (j.t0 - t0) / 1e9
            println(f"TRACE|   job=${j.id}%4d at=$rel%6.2fs dur=$dt%6.3fs " +
              f"stages=${j.stages}%2d tasks=${j.tasks}%4d ${j.site.take(55)}%s ${j.desc.take(40)}%s")
          }
          val bigGaps = js.sliding(2).collect {
            case Vector(a, b) if a.t1 > 0 && (b.t0 - a.t1) / 1e9 > 0.10 =>
              f"after job ${a.id} (${a.site.take(40)}): ${(b.t0 - a.t1) / 1e9}%.2fs"
          }.toVector
          if (bigGaps.nonEmpty) println("TRACE|   gaps>0.1s: " + bigGaps.mkString(" | "))
        }
        try spark.catalog.clearCache() catch { case _: Throwable => }
      }
    }
    spark.stop()
  }
}
