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

  /** events.ts arrives in whatever parquet type the generator used that
    * round and is normalized to a µs TimestampType here:
    *  - TIMESTAMP(NANOS): Spark 4 cannot read it as a timestamp; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/
    *    Bench/test sessions) it arrives as LongType nanos and is
    *    floor-truncated — exactly matching the DuckDB oracle's
    *    `CAST(ts AS TIMESTAMP)` truncation of TIMESTAMP_NS;
    *  - TIMESTAMP(MICROS) without timezone: Spark 4 infers
    *    TimestampNTZType, which time functions like `unix_micros` and
    *    streaming watermarks reject; cast to TimestampType (sessions
    *    pin UTC, so the wall-clock reading IS the instant — the same
    *    reading DuckDB's naive TIMESTAMP uses). */
  private[graft] def eventsNormalized(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
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
