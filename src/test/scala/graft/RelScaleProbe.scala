package graft

import graft.operators.{GlobalRank, RangeJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev driver: headline RELATIONAL query shapes on a 16×-amplified
  * sf0.1 lake (~9.6M lineitem rows / ~24M event rows) — the direct
  * "does the plan survive a scale-up" probe, complementing
  * [[graft.operators.DedupScaleProbe]] for the dedup family.
  *
  * Amplification clones every fact row 16× with remapped order keys
  * (orderkey·16+v on BOTH orders and lineitem, so join fan-out stays
  * 1:1 and group counts scale linearly, not quadratically); dimension
  * tables stay as-is, exactly like a real lake growing in facts.
  * Watch for: wall time scaling ~linearly vs the 1× numbers, no
  * plan flips to nested-loop/cartesian, no OOM/spill storms.
  *
  * Run: sbt "Test/runMain graft.RelScaleProbe /root/testdata/sf0.1"
  */
object RelScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val copies = spark.range(16).select(col("id").as("v"))
    def amp(df: DataFrame, key: String): DataFrame =
      df.crossJoin(copies).withColumn(key, col(key) * 16 + col("v")).drop("v")

    val li = amp(Tables.lineitem(spark, sfDir), "l_orderkey").cache()
    val ord = amp(Tables.orders(spark, sfDir), "o_orderkey").cache()
    val ev = Tables.events(spark, sfDir).crossJoin(copies)
      .withColumn("user_id", col("user_id") * 16 + col("v")).drop("v").cache()
    println(s"PROBE| lineitem16=${li.count()} orders16=${ord.count()} events16=${ev.count()}")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE| $name rows=$n%d wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    // q01 shape: wide scan + 6-way aggregate
    timed("agg_q01_shape") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sq"), avg(col("l_extendedprice")).as("ap"),
          count(lit(1)).as("n"))
        .count()
    }
    // q03/q05 shape: fact-fact join on the amplified key + dim filter
    timed("join_fact_fact") {
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_extendedprice")).as("rev"))
        .count()
    }
    // q17 shape: running-sum window partitioned by the (now 16×) key.
    // Aggregate the window column so column pruning can't elide the
    // window under a bare count().
    timed("window_running_sum") {
      li.withColumn("rs", sum(col("l_quantity")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))))
        .agg(count(col("rs"))).collect().head.getLong(0)
    }
    // q47 shape: distributed global rank over the full fact table
    timed("global_rank") {
      GlobalRank.withGlobalRank(
        li.select(col("l_orderkey"), col("l_extendedprice")),
        Seq(col("l_extendedprice").desc, col("l_orderkey").asc)).count()
    }
    // q30 shape: binned interval self-join over amplified events
    timed("range_join") {
      RangeJoin.pairsWithin(ev, key = "user_id", idCol = "event_id",
        tsCol = "ts", seconds = 60).count()
    }
    spark.stop()
  }
}
