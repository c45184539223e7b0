package graft

import org.apache.spark.sql.SparkSession

/** Dev driver: dump formatted physical plans for headline queries and
  * flag missing pushdown / broadcast / codegen.
  * Run: sbt "Test/runMain graft.PlanCheck <sfDir> [query ...]" */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q02_scan_filter_project", "q03_shipping_priority",
        "q05_region_revenue", "q06_forecast_revenue", "ss01_cosine_topk")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"===== $n =====")
      println(plan)
      val pushed = plan.contains("PushedFilters: [") &&
        !plan.contains("PushedFilters: []")
      val codegen = plan.contains("WholeStageCodegen")
      println(s"SUMMARY| $n pushedFilters=$pushed wholeStageCodegen=$codegen " +
        s"broadcast=${plan.contains("BroadcastHashJoin")} " +
        s"sortMerge=${plan.contains("SortMergeJoin")}")
    }
    spark.stop()
  }
}
