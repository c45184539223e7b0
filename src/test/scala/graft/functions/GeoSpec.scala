package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** GeoFunctions: closed-form checks on synthetic shapes, then structural
  * + containment invariants on REAL reference-fixture geometry (rows of
  * the reference's own testData.csv — NYC landmark MULTIPOLYGONs up to
  * 42 KB of WKT). */
class GeoSpec extends AnyFunSuite with SparkTestSession {

  import GeoFunctions._

  private def one(wkt: String) = {
    import spark.implicits._
    Seq(wkt).toDF("wkt").select(wktRings(col("wkt")).as("r"))
  }

  private val squareWithHole =
    "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)))"

  test("wktRings: ring/point structure, closure, values") {
    val r = one(squareWithHole)
      .select(size(col("r")).as("nr"),
        transform(col("r"), x => size(x)).as("np"),
        col("r").getItem(0).getItem(0).as("first"),
        col("r").getItem(0).getItem(4).as("last"))
      .head()
    assert(r.getInt(0) === 2)
    assert(r.getSeq[Int](1) === Seq(5, 5))
    assert(r.getSeq[Double](2) === Seq(0.0, 0.0))
    assert(r.getSeq[Double](3) === Seq(0.0, 0.0))
  }

  test("shoelace: signed orientation, hole subtraction, centroid, bbox") {
    val r = one(squareWithHole)
      .select(ringSignedArea(element_at(col("r"), 1)).as("shell"),
        ringSignedArea(element_at(col("r"), 2)).as("hole"),
        polygonArea(col("r")).as("area"),
        ringCentroid(element_at(col("r"), 1)).as("c"),
        bbox(col("r")).as("bb"))
      .head()
    assert(r.getDouble(0) === 16.0) // CCW shell positive
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 15.0)
    assert(r.getSeq[Double](3) === Seq(2.0, 2.0))
    assert(r.getSeq[Double](4) === Seq(0.0, 0.0, 4.0, 4.0))
  }

  test("clockwise ring has negative signed area") {
    val cw = "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"
    assert(one(cw).select(ringSignedArea(element_at(col("r"), 1))).head().getDouble(0) === -1.0)
  }

  test("even-odd point-in-polygon: shell, hole, outside, second shell") {
    val two = "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)), ((10 10, 11 10, 11 11, 10 11, 10 10)))"
    val df = one(two)
    def in(px: Double, py: Double): Boolean =
      df.select(pointInPolygon(col("r"), lit(px), lit(py))).head().getBoolean(0)
    assert(in(3.0, 3.0))      // in shell
    assert(!in(1.5, 1.5))     // in hole
    assert(!in(5.0, 5.0))     // between shells
    assert(in(10.5, 10.5))    // second shell
    assert(!in(-1.0, 2.0))    // left of everything
  }

  test("real fixture geometry: parses, closed rings, NYC bounds, containment invariants") {
    import spark.implicits._
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/reference-fixture/input_lines.txt"), "UTF-8")
    val lines = try src.getLines().toList finally src.close()
    // the_geom is the only quoted CSV field
    val geoms = lines.drop(1).map(l => "\"([^\"]*)\"".r.findFirstMatchIn(l).get.group(1))
    assert(geoms.size === 5 && geoms.forall(_.startsWith("MULTIPOLYGON")))

    val rows = geoms.toDF("wkt")
      .select(wktRings(col("wkt")).as("r"))
      .select(col("r"),
        size(col("r")).as("nr"),
        aggregate(col("r"), lit(0), (a, ring) => a + size(ring)).as("np"),
        // every ring closed: first point == last point
        aggregate(col("r"), lit(true), (a, ring) =>
          a && element_at(ring, 1) === element_at(ring, size(ring))).as("closed"),
        abs(ringSignedArea(element_at(col("r"), 1))).as("shell_area"),
        bbox(col("r")).as("bb"),
        ringCentroid(element_at(col("r"), 1)).as("c"))
      .withColumn("far_outside",
        pointInPolygon(col("r"), element_at(col("bb"), 1) - 1.0, element_at(col("c"), 2)))
      .drop("r")
      .collect()

    rows.foreach { r =>
      assert(r.getInt(0) >= 1)
      assert(r.getInt(1) >= 4 * r.getInt(0))
      assert(r.getBoolean(2), "unclosed ring in fixture geometry")
      assert(r.getDouble(3) > 0.0)
      val bb = r.getSeq[Double](4)
      assert(bb(0) > -74.3 && bb(2) < -73.6, s"lon bbox outside NYC: $bb")
      assert(bb(1) > 40.4 && bb(3) < 41.0, s"lat bbox outside NYC: $bb")
      // a simple polygon's centroid lies in its convex hull => its bbox
      val c = r.getSeq[Double](5)
      assert(c(0) >= bb(0) && c(0) <= bb(2) && c(1) >= bb(1) && c(1) <= bb(3))
      assert(!r.getBoolean(6), "point left of the bbox reported inside")
    }
  }

  test("haversine matches textbook values: degree of longitude, antipodes, zero") {
    import org.apache.spark.sql.functions.{col, lit}
    def km(a: (Double, Double), b: (Double, Double)): Double =
      spark.range(1).select(GeoFunctions.haversineKm(
        lit(a._1), lit(a._2), lit(b._1), lit(b._2)).as("d"))
        .head().getDouble(0)
    // 1 degree of longitude at the equator: pi/180 * R = 111.195 km
    assert(math.abs(km((0, 0), (0, 1)) - 111.1949) < 0.001)
    // antipodal points: half the earth's circumference, pi * R
    assert(math.abs(km((0, 0), (0, 180)) - math.Pi * 6371.0088) < 0.001)
    assert(km((40.7, -74.0), (40.7, -74.0)) === 0.0)
    // symmetry (the formula must not care about argument order)
    assert(km((12.3, 45.6), (-7.8, 123.4)) === km((-7.8, 123.4), (12.3, 45.6)))
  }

  test("wktRings needs no custom expressions: plan stays codegen-friendly") {
    val df = one(squareWithHole).select(polygonArea(col("r")).as("a"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
