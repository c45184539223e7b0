package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.GeoFunctions
import graft.operators.SpatialJoin

/** Geospatial queries over WKT polygon text (gq01-gq03) — the geometry
  * consumption layer the reference's landmark data calls for but its
  * ingest kernel never provides (it deletes or string-normalizes the WKT;
  * CSVIngest.java:64-81). Real-fixture behavior is pinned in GeoSpec
  * against rows of the reference's own testData.csv; the REGISTERED
  * queries synthesize reference-shaped WKT from the `nation` table with
  * integer-derived coordinates (the IngestQueries pattern) so each
  * DuckDB oracle is an INDEPENDENT closed-form derivation of the
  * geometry — parser bugs cannot cancel out of the compare.
  *
  * Per nation key k (s = k+2): one polygon, an s×s outer shell at the
  * origin with a unit hole from (1,1) to (2,2):
  * `MULTIPOLYGON (((0 0, s 0, s s, 0 s, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)))`
  * — area s²−1, centroid (s/2, s/2), bbox (0,0,s,s). The gq03 probe
  * point (t+0.5, t+0.5) with t = k mod 4 lands inside the hole exactly
  * when t = 1 (ray crossings: outer shell always 1, hole adds 1 iff
  * 1 < py < 2), giving varied in/out outcomes across rows.
  */
object GeoQueries {

  /** Synthesized WKT: integer coordinate strings render identically in
    * both engines, so the oracle rebuilds the same text byte-for-byte. */
  private def wkt: org.apache.spark.sql.Column = {
    val s = (col("n_nationkey") + 2).cast("string")
    concat(lit("MULTIPOLYGON (((0 0, "), s, lit(" 0, "), s, lit(" "), s,
      lit(", 0 "), s, lit(", 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)))"))
  }

  private def rings = GeoFunctions.wktRings(wkt)

  /** gq01 — WKT parse structure + bounding box. */
  private def gq01(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .select(col("n_nationkey"), rings.as("r"))
      .select(col("n_nationkey"),
        size(col("r")).as("n_rings"),
        aggregate(col("r"), lit(0), (acc, ring) => acc + size(ring)).as("n_points"),
        element_at(GeoFunctions.bbox(col("r")), 1).as("xmin"),
        element_at(GeoFunctions.bbox(col("r")), 2).as("ymin"),
        element_at(GeoFunctions.bbox(col("r")), 3).as("xmax"),
        element_at(GeoFunctions.bbox(col("r")), 4).as("ymax"))
      .orderBy(col("n_nationkey"))

  private val gq01Sql =
    """SELECT n_nationkey,
      |  2 AS n_rings, 10 AS n_points,
      |  CAST(0.0 AS DOUBLE) AS xmin, CAST(0.0 AS DOUBLE) AS ymin,
      |  CAST(n_nationkey + 2 AS DOUBLE) AS xmax,
      |  CAST(n_nationkey + 2 AS DOUBLE) AS ymax
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** gq02 — shoelace area (hole subtracted), signed shell area, shell
    * centroid. All values are exact in double (integer cross products;
    * the centroid division 3s³/6s² has a representable quotient), so the
    * closed-form oracle matches bit-for-bit under round(…, 6). */
  private def gq02(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .select(col("n_nationkey"), rings.as("r"))
      .select(col("n_nationkey"),
        round(GeoFunctions.polygonArea(col("r")), 6).as("area"),
        round(GeoFunctions.ringSignedArea(element_at(col("r"), 1)), 6).as("shell_signed"),
        round(element_at(GeoFunctions.ringCentroid(element_at(col("r"), 1)), 1), 6).as("cx"),
        round(element_at(GeoFunctions.ringCentroid(element_at(col("r"), 1)), 2), 6).as("cy"))
      .orderBy(col("n_nationkey"))

  private val gq02Sql =
    """SELECT n_nationkey,
      |  round(CAST((n_nationkey + 2) * (n_nationkey + 2) - 1 AS DOUBLE), 6) AS area,
      |  round(CAST((n_nationkey + 2) * (n_nationkey + 2) AS DOUBLE), 6) AS shell_signed,
      |  round(CAST(n_nationkey + 2 AS DOUBLE) / 2, 6) AS cx,
      |  round(CAST(n_nationkey + 2 AS DOUBLE) / 2, 6) AS cy
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** gq03 — even-odd point-in-polygon with a per-row probe point. */
  private def gq03(s: SparkSession, d: String): DataFrame = {
    val px = (col("n_nationkey") % 4).cast("double") + 0.5
    nation(s, d)
      .select(col("n_nationkey"), rings.as("r"), px.as("px"), px.as("py"))
      .select(col("n_nationkey"), col("px"), col("py"),
        GeoFunctions.crossingCount(col("r"), col("px"), col("py")).as("crossings"),
        GeoFunctions.pointInPolygon(col("r"), col("px"), col("py")).as("inside"))
      .orderBy(col("n_nationkey"))
  }

  private val gq03Sql =
    """SELECT n_nationkey,
      |  CAST(n_nationkey % 4 AS DOUBLE) + 0.5 AS px,
      |  CAST(n_nationkey % 4 AS DOUBLE) + 0.5 AS py,
      |  CASE WHEN n_nationkey % 4 = 1 THEN 2 ELSE 1 END AS crossings,
      |  n_nationkey % 4 <> 1 AS inside
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** gq04 — grid-blocked spatial join (see
    * [[graft.operators.SpatialJoin]]): customers become probe points at
    * `x = 3·(c_custkey mod 40) + 0.25, y = 1`, nations become disjoint
    * 2×2 squares at x-offset `3·n_nationkey` — so customer c lands
    * inside nation n's square exactly when `c mod 40 = n` (offsets 25-39
    * fall in the gap past the last square). The oracle is that closed
    * form: a plain modular equi-join, containing no geometry at all —
    * grid assignment, bbox cover, and the even-odd confirm must all be
    * right for the row sets to agree. */
  private def gq04(s: SparkSession, d: String): DataFrame = {
    val sq = (col("n_nationkey") * 3).cast("string")
    val sqEnd = (col("n_nationkey") * 3 + 2).cast("string")
    val polys = nation(s, d).select(col("n_nationkey"),
      GeoFunctions.wktRings(concat(
        lit("POLYGON (("), sq, lit(" 0, "), sqEnd, lit(" 0, "), sqEnd,
        lit(" 2, "), sq, lit(" 2, "), sq, lit(" 0))"))).as("rings"))
    val points = customer(s, d).select(col("c_custkey"),
      ((col("c_custkey") % 40).cast("double") * 3 + 0.25).as("px"),
      lit(1.0).as("py"))
    SpatialJoin.pointInPolygons(points, "c_custkey", "px", "py",
        polys, "n_nationkey", "rings", cell = 4.0)
      .select(col("c_custkey"), col("n_nationkey"))
      .orderBy(col("c_custkey"), col("n_nationkey"))
  }

  private val gq04Sql =
    """SELECT c_custkey, n_nationkey
      |FROM customer JOIN nation ON n_nationkey = c_custkey % 40
      |ORDER BY c_custkey, n_nationkey""".stripMargin

  val defs: Map[String, Q] = Map(
    "gq01_wkt_parse" -> (gq01 _),
    "gq02_polygon_area" -> (gq02 _),
    "gq03_point_in_polygon" -> (gq03 _),
    "gq04_spatial_join" -> (gq04 _))

  val oracle: Map[String, String] = Map(
    "gq01_wkt_parse" -> gq01Sql,
    "gq02_polygon_area" -> gq02Sql,
    "gq03_point_in_polygon" -> gq03Sql,
    "gq04_spatial_join" -> gq04Sql)
}
