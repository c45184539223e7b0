package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (per-suite sessions
  * cost ~10s each). */
object SparkTestSession {
  lazy val get: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.get
  lazy val sf: String = "/root/testdata/sf0.001"
}
