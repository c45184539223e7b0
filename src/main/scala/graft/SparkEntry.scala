package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2) as named,
  * pure (SparkSession, sfDir) => DataFrame builders; `oracleSql` carries a
  * DuckDB-equivalent SQL string for every SQL-expressible query (same
  * output column names, same rounding, same total order).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.CoreQueries.defs ++
      analytics.ExtendedQueries.defs ++
      analytics.AdvancedQueries.defs ++
      analytics.TpchShapeQueries.defs ++
      analytics.ScaleQueries.defs ++
      analytics.ExtensionQueries.defs ++
      analytics.StreamingQueries.defs ++
      analytics.GeoQueries.defs ++
      analytics.GraphQueries.defs ++
      ingest.IngestQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    analytics.CoreQueries.oracle ++
      analytics.ExtendedQueries.oracle ++
      analytics.AdvancedQueries.oracle ++
      analytics.TpchShapeQueries.oracle ++
      analytics.ScaleQueries.oracle ++
      analytics.ExtensionQueries.oracle ++
      analytics.StreamingQueries.oracle ++
      analytics.GeoQueries.oracle ++
      analytics.GraphQueries.oracle ++
      ingest.IngestQueries.oracle
}
