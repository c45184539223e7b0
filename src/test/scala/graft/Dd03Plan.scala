package graft
import org.apache.spark.sql.SparkSession
object Dd03Plan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("dd03_simhash")(spark, "/root/testdata/sf0.1")
    df.count()
    val p = df.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE=" + "ReusedExchange".r.findAllIn(p).size)
    println("EXCHANGES=" + "Exchange ".r.findAllIn(p).size)
    println("BROADCASTS=" + "BroadcastExchange".r.findAllIn(p).size)
    println("SCANS=" + "Scan parquet".r.findAllIn(p).size)
    spark.stop()
  }
}
