package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Dev driver: A/B tx19's shapes — (a) r18 two independent aggregates,
  * (b) shared (term,bucket) first-level aggregate, (c) b + cached
  * first level (true single tokenize pass).
  * Run: sbt "Test/runMain graft.Tx19Ab <sfDir>" */
object Tx19Ab {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.count()
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    def toks = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
    import org.apache.spark.sql.DataFrame
    def finish(tb: DataFrame, vb: DataFrame): Long = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tb.join(vb, Seq("bucket"), "full_outer")
        .select(col("bucket"), coalesce(col("toks"), lit(0L)).as("toks"),
          coalesce(col("vnew"), lit(0L)).as("vnew"))
        .select(col("bucket"), sum(col("toks")).over(w).as("cum_tokens"),
          sum(col("vnew")).over(w).as("cum_vocab"))
        .orderBy(col("bucket")).collect().map(_.getLong(1)).sum
    }
    def variantA(): Long = {
      val tb = toks.crossJoin(broadcast(mx))
        .groupBy(expr("(doc_id * 20) div (mx + 1)").as("bucket"))
        .agg(count(lit(1)).as("toks"))
      val vb = toks.groupBy(col("term")).agg(min(col("doc_id")).as("first_doc"))
        .crossJoin(broadcast(mx))
        .groupBy(expr("(first_doc * 20) div (mx + 1)").as("bucket"))
        .agg(count(lit(1)).as("vnew"))
      finish(tb, vb)
    }
    def agg1() = toks.crossJoin(broadcast(mx))
      .groupBy(col("term"), expr("(doc_id * 20) div (mx + 1)").as("bucket"))
      .agg(count(lit(1)).as("c"), min(col("doc_id")).as("mdoc"))
    def fromAgg1(a1: DataFrame): Long = {
      val tb = a1.groupBy(col("bucket")).agg(sum(col("c")).as("toks"))
      val vb = a1.groupBy(col("term")).agg(min(col("mdoc")).as("first_doc"))
        .crossJoin(broadcast(mx))
        .groupBy(expr("(first_doc * 20) div (mx + 1)").as("bucket"))
        .agg(count(lit(1)).as("vnew"))
      finish(tb, vb)
    }
    (1 to 3).foreach { r =>
      var t0 = System.nanoTime(); val ra = variantA(); val ta = ms(t0)
      t0 = System.nanoTime(); val rb = fromAgg1(agg1()); val tbms = ms(t0)
      t0 = System.nanoTime()
      val c = agg1().cache()
      val rc = fromAgg1(c); val tc = ms(t0)
      c.unpersist()
      println(f"[tx19-ab] run$r A(two-pass)=$ta%7.1f ms  B(shared-agg)=$tbms%7.1f ms  C(cached)=$tc%7.1f ms  equal=${ra == rb && rb == rc}")
    }
    spark.stop()
  }
}
