package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated parquet lake
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md).
  *
  * Scale posture: every loader is a plain parquet scan so Catalyst predicate
  * pushdown / column pruning apply; at 100 TB the same call reads a
  * partitioned directory instead of a single file — no code change needed.
  */
object Tables {
  /** One query = (session, scale-factor dir) => result frame. */
  type Q = (SparkSession, String) => DataFrame

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 cannot read as a
    * timestamp; with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * Verify/Bench/test sessions) it arrives as LongType nanos and is
    * floor-truncated here to a µs TimestampType — exactly matching the
    * DuckDB oracle's `CAST(ts AS TIMESTAMP)` truncation of TIMESTAMP_NS,
    * so both engines compare identical µs instants. */
  private def eventsNormalized(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = eventsNormalized(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
