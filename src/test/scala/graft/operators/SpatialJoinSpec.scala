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

  test("polygonOverlapJoin == brute-force overlap, across cell sizes, no dup pairs") {
    // reuse the squares as BOTH sides (self-join shape, ids offset so
    // the pair (i, j) is unambiguous); includes identical, contained,
    // partially-overlapping, touching and disjoint pairs
    val left = polys
    val right = polys.select((col("poly_id") + 1000).as("b_id"), col("rings").as("rings_b"))
    val brute = left.crossJoin(right)
      .filter(GeoFunctions.polygonsOverlap(col("rings"), col("rings_b")))
      .select(col("poly_id"), col("b_id"))
    val expected = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "degenerate fixture: no overlaps at all")
    // sanity on the brute predicate itself: identity pairs must overlap
    assert((0 until 60).forall(i => expected.contains((i.toLong, i + 1000L))))
    for (cell <- Seq(0.7, 2.0, 16.0)) {
      val got = SpatialJoin.polygonOverlapJoin(left, "poly_id", "rings",
          right, "b_id", "rings_b", cell)
        .select(col("poly_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size,
        s"reference-point dedup emitted a pair twice at cell=$cell")
      assert(got.toSet === expected, s"mismatch at cell=$cell")
    }
  }

  test("segment intersection handles crossing, touching, collinear and disjoint") {
    import spark.implicits._
    def edge(ax: Double, ay: Double, bx: Double, by: Double) =
      struct(array(lit(ax), lit(ay)).as("a"), array(lit(bx), lit(by)).as("b"))
    val cases = Seq(
      // (e1, e2, expected): proper X crossing
      ((0.0, 0.0, 2.0, 2.0), (0.0, 2.0, 2.0, 0.0), true),
      // T-touch: endpoint of e2 lies ON e1 (collinear o=0 branch)
      ((0.0, 0.0, 2.0, 0.0), (1.0, 0.0, 1.0, 5.0), true),
      // shared endpoint only
      ((0.0, 0.0, 2.0, 0.0), (2.0, 0.0, 3.0, 4.0), true),
      // collinear overlapping spans
      ((0.0, 0.0, 2.0, 0.0), (1.0, 0.0, 3.0, 0.0), true),
      // collinear but disjoint spans
      ((0.0, 0.0, 1.0, 0.0), (2.0, 0.0, 3.0, 0.0), false),
      // parallel, never meet
      ((0.0, 0.0, 2.0, 0.0), (0.0, 1.0, 2.0, 1.0), false),
      // would cross if extended, but segments stop short
      ((0.0, 0.0, 1.0, 1.0), (3.0, 0.0, 2.0, 0.9), false))
    cases.zipWithIndex.foreach { case (((a1, a2, a3, a4), (b1, b2, b3, b4), want), i) =>
      val got = Seq(1).toDF("one")
        .select(GeoFunctions.segmentsIntersect(
          edge(a1, a2, a3, a4), edge(b1, b2, b3, b4)).as("x"))
        .head().getBoolean(0)
      assert(got === want, s"case $i: ($a1,$a2)-($a3,$a4) vs ($b1,$b2)-($b3,$b4)")
    }
  }

  test("knnPolygons == brute-force centroid kNN when the probe window suffices") {
    import org.apache.spark.sql.expressions.Window
    // centroids of the 60 squares span x ∈ [0, ~20.5], y ∈ [0, ~16.5];
    // 300 points span [0, 20.5] × [0, 15.5] — k-th neighbor distances
    // stay well under (r−1)·cell = 4·3 = 12 for k=3 at this density
    val brute = points.crossJoin(
        polys.withColumn("c", GeoFunctions.ringCentroid(element_at(col("rings"), 1))))
      .withColumn("dist", sqrt(
        pow(col("px") - element_at(col("c"), 1), 2) +
          pow(col("py") - element_at(col("c"), 2), 2)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("pt_id")).orderBy(col("dist"), col("poly_id"))))
      .filter(col("rank") <= 3)
      .select(col("pt_id"), col("rank"), col("poly_id"))
    val expected = brute.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = SpatialJoin.knnPolygons(points, "pt_id", "px", "py",
        polys, "poly_id", "rings", k = 3, cell = 3.0, probeCells = 5)
      .select(col("pt_id"), col("rank"), col("poly_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.size === 300 * 3, "every point must rank exactly k polygons")
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
