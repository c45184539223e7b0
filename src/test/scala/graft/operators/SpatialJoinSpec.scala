package graft.operators

import graft.SparkTestSession
import graft.functions.GeoFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SpatialJoin: the grid-blocked join must equal the brute-force
  * cross-join + exact containment filter on every (point, polygon) pair —
  * the same differential structure as the LSH dedup specs (scalable plan
  * vs exact oracle, same rows). */
class SpatialJoinSpec extends AnyFunSuite with SparkTestSession {

  // 60 deterministic pseudo-random squares (some overlapping, varied
  // sizes incl. multi-cell spans) and 300 points
  private def polys = {
    import spark.implicits._
    (0 until 60).map { i =>
      val x0 = (i * 2654435761L % 37).toDouble / 2
      val y0 = (i * 40503L % 29).toDouble / 2
      val w = 1.0 + (i % 5)
      (i.toLong, s"POLYGON (($x0 $y0, ${x0 + w} $y0, ${x0 + w} ${y0 + w}, $x0 ${y0 + w}, $x0 $y0))")
    }.toDF("poly_id", "wkt")
      .select(col("poly_id"), GeoFunctions.wktRings(col("wkt")).as("rings"))
  }

  private def points = {
    import spark.implicits._
    (0 until 300).map { i =>
      (i.toLong,
        (i * 48271L % 4100).toDouble / 200,
        (i * 16807L % 3100).toDouble / 200)
    }.toDF("pt_id", "px", "py")
  }

  test("grid-blocked join == brute-force containment, across cell sizes") {
    val brute = points.crossJoin(polys)
      .filter(GeoFunctions.pointInPolygon(col("rings"), col("px"), col("py")))
      .select(col("pt_id"), col("poly_id"))
    val expected = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "degenerate fixture: no containments at all")
    for (cell <- Seq(0.7, 2.0, 16.0)) {
      val got = SpatialJoin.pointInPolygons(points, "pt_id", "px", "py",
          polys, "poly_id", "rings", cell)
        .select(col("pt_id"), col("poly_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"mismatch at cell=$cell")
    }
  }

  test("candidates appear at most once: no dedup needed after the grid join") {
    val got = SpatialJoin.pointInPolygons(points, "pt_id", "px", "py",
      polys, "poly_id", "rings", 0.7)
    assert(got.count() === got.select(col("pt_id"), col("poly_id")).distinct().count())
  }

  test("bboxCells covers boundary-aligned boxes inclusively") {
    import spark.implicits._
    val bb = Seq(1).toDF("one")
      .select(SpatialJoin.bboxCells(array(lit(0.0), lit(0.0), lit(4.0), lit(2.0)), 2.0).as("c"))
      .select(size(col("c")))
      .head().getInt(0)
    // x cells 0,1,2 (8/2 boundary inclusive) × y cells 0,1 → 6
    assert(bb === 6)
  }
}
