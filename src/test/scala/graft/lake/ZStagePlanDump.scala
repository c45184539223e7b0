package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev driver: dump the zq08 staging SORT plan in both forms (raw
  * ordering expression vs materialized sort-key column) as the plan
  * evidence for the r19 stageFiles sort-key materialization.
  * Run: sbt "Test/runMain graft.lake.ZStagePlanDump <sfDir> <outDir>"
  */
object ZStagePlanDump {
  def main(args: Array[String]): Unit = {
    val d = args(0); val out = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val live = spark.read.parquet(s"$d/lineitem.parquet")
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"), col("l_quantity"), col("l_discount"))
    val zcols = Seq("l_extendedprice", "l_quantity", "l_discount")
    def quant(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      least(lit((1L << 21) - 1), floor(coalesce(c.cast("double"), lit(0.0))
        / lit(100000.0) * ((1L << 21) - 1).toDouble).cast("bigint"))
    val morton = ZOrder.mortonCodeN(zcols.map(c => quant(col(c))))
    val keyed = live
      .withColumn("__txn_pk", hex(xxhash64(col("l_returnflag").cast("string"))))
      .repartition(3, col("l_returnflag"))
    val before = keyed.sortWithinPartitions(col("__txn_pk"), morton)
    val after = keyed.withColumn("__txn_sort0", morton)
      .sortWithinPartitions(col("__txn_pk"), col("__txn_sort0"))
      .drop("__txn_sort0")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/zq08_stage_before.txt"),
      "zq08 Z-order STAGING sort (the write job inside TxnLake.optimizeZOrder -> stageFiles),\n" +
      "BEFORE r19: Sort orders by the raw 63-term morton interleave expression —\n" +
      "SortExec's row comparator re-evaluates it per comparison (measured 2.0s vs 0.9s).\n\n" +
      before.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/zq08_stage_after.txt"),
      "zq08 Z-order STAGING sort AFTER r19: the morton key is materialized once per row\n" +
      "into __txn_sort0 by a Project below the Sort; the Sort orders by the plain\n" +
      "attribute and a Project above drops it before the write (order-preserving).\n\n" +
      after.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    println("dumped")
    spark.stop()
  }
}
