package graft.operators
import org.apache.spark.sql.SparkSession
object DecideProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("/root/testdata/sf0.1", "/tmp/graft_sf1").foreach { d =>
      val n = spark.read.parquet(s"$d/embeddings.parquet").count()
      val t = spark.sessionState.conf.autoBroadcastJoinThreshold
      println(s"[decide] $d n=$n threshold=$t est=${n*4*56L} hint=${t >= 0 && n*4*56L > t}")
    }
    spark.stop()
  }
}
