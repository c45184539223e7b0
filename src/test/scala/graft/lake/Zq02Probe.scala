package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dev probe: decompose zq02's wall time (create vs DSv2 read). */
object Zq02Probe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE| $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    (1 to 2).foreach { run =>
      val dir = java.nio.file.Files.createTempDirectory("graft_zq02p")
        .resolve("orders_lake").toString
      val base = t(s"run$run slice-plan") {
        spark.read.parquet(s"$sf/orders.parquet")
          .filter(col("o_orderkey") % 4 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").cast("decimal(12,2)").as("o_price"),
            (col("o_orderkey") / lit(512)).cast("long").as("okbucket"))
      }
      t(s"run$run create") {
        TxnLake.create(spark, dir, base, "okbucket", statsCol = Some("o_orderkey"))
      }
      val m = TxnLake.resolve(spark, dir).get
      println(s"PROBE| run$run files=${m.files.size}")
      t(s"run$run dsv2-read") {
        spark.read.format("graft-txn").load(dir)
          .filter(col("o_orderkey").between(1000L, 3000L))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("o_price")).cast("double").as("sum_price"))
          .orderBy(col("o_orderstatus")).collect()
      }
    }
    spark.stop()
  }
}
