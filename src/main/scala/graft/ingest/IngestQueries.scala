package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Driver-registered queries exercising the reference-faithful ingest
  * kernel (O3-O5) on lake data. The driver lake has no raw CSV zone, so
  * each query *synthesizes* reference-shaped CSV lines from the `nation`
  * table (integer-derived coordinates — no float formatting, so the
  * DuckDB oracle renders byte-identical strings), massages them, and
  * returns the result.
  */
object IngestQueries {

  /** A reference-shaped raw CSV line: `key,"MULTIPOLYGON (((x y, x y)))",name`.
    * Coordinates derive from n_nationkey via lpad'd integer strings. */
  private def rawLine: org.apache.spark.sql.Column = {
    val k2 = lpad(col("n_nationkey").cast("string"), 2, "0")
    concat(
      col("n_nationkey").cast("string"), lit(",\"MULTIPOLYGON (((-73."), k2,
      lit(" 40."), k2, lit(", -73.50 40.50)))\","), col("n_name"))
  }

  /** iq01 — actual reference behavior: quotes stripped, geometry block
    * deleted (`CSVIngest.java:64-68` golden semantics, SURVEY §3.2). */
  private def iq01(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .select(col("n_nationkey"), rawLine.as("raw_line"))
      .select(col("n_nationkey"),
        LineMassager.massage(col("raw_line"), IngestMode.Actual).as("massaged"))
      .orderBy(col("n_nationkey"))

  private val iq01Sql =
    """SELECT n_nationkey,
      |  regexp_replace(
      |    trim(replace(
      |      replace(concat(CAST(n_nationkey AS VARCHAR), ',"MULTIPOLYGON (((-73.',
      |                     lpad(CAST(n_nationkey AS VARCHAR), 2, '0'), ' 40.',
      |                     lpad(CAST(n_nationkey AS VARCHAR), 2, '0'),
      |                     ', -73.50 40.50)))",', n_name),
      |              '"', ''),
      |      'MULTIPOLYGON ', '')),
      |    '\(\(\([0-9.,() -]+\)\)\)', '', 'g') AS massaged
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** iq02 — intended reference behavior (the dead code at
    * `CSVIngest.java:71-81`): WKT block normalized to `x:y::x:y`. The
    * oracle constructs the expected output directly from the same integer
    * arithmetic — an independent derivation, not a transform mirror. */
  private def iq02(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .select(col("n_nationkey"), rawLine.as("raw_line"))
      .select(col("n_nationkey"),
        LineMassager.massage(col("raw_line"), IngestMode.NormalizeWkt).as("normalized"))
      .orderBy(col("n_nationkey"))

  private val iq02Sql =
    """SELECT n_nationkey,
      |  concat(CAST(n_nationkey AS VARCHAR), ',-73.',
      |         lpad(CAST(n_nationkey AS VARCHAR), 2, '0'), ':40.',
      |         lpad(CAST(n_nationkey AS VARCHAR), 2, '0'),
      |         '::-73.50:40.50,', n_name) AS normalized
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** iq03 — the custom single-pass [[WktNormalizeExpr]] applied directly
    * (iq02 exercises it via the massage pipeline; this exercises the raw
    * expression). Oracle: same independent string construction. */
  private def iq03(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .select(col("n_nationkey"), rawLine.as("raw_line"))
      .select(col("n_nationkey"),
        WktNormalizeExpr.wktNormalize(
          graft.ingest.LineMassager.stripQuotes(col("raw_line"))).as("normalized"))
      .orderBy(col("n_nationkey"))

  /** iq04 — quarantine classification (SURVEY O11, the error channel):
    * the EXACT try-cast predicate [[CsvIngestJob.promote]] uses to
    * divert malformed rows, run over synthesized values where every 5th
    * key carries a corrupt numeric field. The oracle replays TRY_CAST,
    * so the good/quarantined partition — not just its existence — is
    * hash-pinned. (The file-writing quarantine path itself is
    * spec-tested in CsvIngestJobSpec; this pins the row classification
    * rule cross-engine.) */
  private def iq04(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .select(col("n_nationkey"),
        when(col("n_nationkey") % 5 === 0,
            concat(lit("x"), col("n_nationkey").cast("string")))
          .otherwise(col("n_nationkey").cast("string")).as("raw_val"))
      .withColumn("quarantined", expr("try_cast(raw_val AS INT)").isNull)
      .groupBy(col("quarantined"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("n_nationkey")).as("min_key"),
        max(col("n_nationkey")).as("max_key"))
      .orderBy(col("quarantined"))

  private val iq04Sql =
    """WITH raw AS (
      |  SELECT n_nationkey,
      |    CASE WHEN n_nationkey % 5 = 0
      |         THEN 'x' || CAST(n_nationkey AS VARCHAR)
      |         ELSE CAST(n_nationkey AS VARCHAR) END AS raw_val
      |  FROM nation)
      |SELECT (TRY_CAST(raw_val AS INTEGER) IS NULL) AS quarantined,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  min(n_nationkey) AS min_key, max(n_nationkey) AS max_key
      |FROM raw GROUP BY 1
      |ORDER BY quarantined""".stripMargin

  val defs: Map[String, Q] = Map(
    "iq01_ingest_massage" -> (iq01 _),
    "iq02_wkt_normalize" -> (iq02 _),
    "iq03_wkt_normalize_expr" -> (iq03 _),
    "iq04_quarantine_classify" -> (iq04 _))

  val oracle: Map[String, String] = Map(
    "iq01_ingest_massage" -> iq01Sql,
    "iq02_wkt_normalize" -> iq02Sql,
    "iq03_wkt_normalize_expr" -> iq02Sql,
    "iq04_quarantine_classify" -> iq04Sql)
}
