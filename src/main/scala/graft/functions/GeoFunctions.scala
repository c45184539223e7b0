package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Planar geometry over WKT polygon text — the capability the landmark
  * dataset itself calls for: the reference's fixture rows carry WKT
  * `MULTIPOLYGON` geometry (reference: src/test/resources/testData.csv:2
  * onward) that its ingest kernel only ever strips or string-normalizes
  * (CSVIngest.java:64-81); these functions make the geometry QUERYABLE.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * higher-order array expressions — no UDFs, no driver round-trips, no
  * shuffles: each operation is a narrow per-row map, so the scan→filter
  * pipeline stays inside whole-stage codegen and the cost at 100 TB is
  * one pass over the geometry column.
  *
  * Representation: `array<array<array<double>>>` — rings → points →
  * (x, y). Polygon grouping inside a MULTIPOLYGON is flattened; by WKT
  * convention ring 0 is an outer shell and later rings are holes
  * (point-in-polygon uses the grouping-agnostic even-odd rule, so it is
  * exact even for multi-shell geometries).
  */
object GeoFunctions {

  /** Parse WKT `POLYGON`/`MULTIPOLYGON` text into rings: every innermost
    * parenthesized group is one ring, each a `(x y, x y, …)` coordinate
    * list (closed: first point == last point). One regexp pass + array
    * splits, all row-local. */
  def wktRings(wkt: Column): Column =
    transform(regexp_extract_all(wkt, lit("\\(([^()]+)\\)"), lit(1)),
      r => transform(split(r, ",\\s*"),
        p => transform(split(trim(p), "\\s+"), c => c.cast("double"))))

  /** Signed shoelace area of one closed ring: positive for
    * counter-clockwise winding. `sum(x_i·y_{i+1} − x_{i+1}·y_i) / 2`
    * over consecutive point pairs, folded in array order (deterministic —
    * the ring is a row-local array, no shuffle-order dependence). */
  def ringSignedArea(ring: Column): Column =
    aggregate(
      zip_with(slice(ring, lit(1), size(ring) - 1), slice(ring, lit(2), size(ring) - 1),
        (a, b) => a.getItem(0) * b.getItem(1) - b.getItem(0) * a.getItem(1)),
      lit(0.0), _ + _) / 2

  /** Area of a polygon with holes: |ring 0| − Σ|ring i>0| (WKT order:
    * shell first, holes after). */
  def polygonArea(rings: Column): Column = {
    val holes = slice(rings, lit(2), greatest(size(rings) - 1, lit(0)))
    abs(ringSignedArea(element_at(rings, 1))) -
      aggregate(holes, lit(0.0), (acc, r) => acc + abs(ringSignedArea(r)))
  }

  /** Centroid of one closed ring:
    * `C = Σ(p_i + p_{i+1})·cross_i / (3·Σcross_i)` — the standard
    * polygon-centroid formula; returns `array(cx, cy)`. */
  def ringCentroid(ring: Column): Column = {
    val a = slice(ring, lit(1), size(ring) - 1)
    val b = slice(ring, lit(2), size(ring) - 1)
    val crosses = zip_with(a, b,
      (p, q) => p.getItem(0) * q.getItem(1) - q.getItem(0) * p.getItem(1))
    val twiceArea = aggregate(crosses, lit(0.0), _ + _)
    def axis(i: Int): Column =
      aggregate(
        zip_with(zip_with(a, b, (p, q) => p.getItem(i) + q.getItem(i)), crosses,
          (s, c) => s * c),
        lit(0.0), _ + _) / (lit(3.0) * twiceArea)
    array(axis(0), axis(1))
  }

  /** Bounding box over every ring: `array(xmin, ymin, xmax, ymax)`. */
  def bbox(rings: Column): Column = {
    val pts = flatten(rings)
    def ext(i: Int, f: Column => Column): Column =
      f(transform(pts, p => p.getItem(i)))
    array(ext(0, array_min), ext(1, array_min), ext(0, array_max), ext(1, array_max))
  }

  /** Ray-casting crossing count for the even-odd point-in-polygon test:
    * edges whose y-span straddles `py` and whose x at `py` lies right of
    * `px`, summed over every ring. Vertex/edge degeneracies follow the
    * usual open-upper-bound convention (`ay > py` XOR `by > py`). */
  def crossingCount(rings: Column, px: Column, py: Column): Column =
    aggregate(rings, lit(0), (acc, ring) => acc + size(filter(
      zip_with(slice(ring, lit(1), size(ring) - 1), slice(ring, lit(2), size(ring) - 1),
        (a, b) => struct(a.as("a"), b.as("b"))),
      e => {
        val ax = e.getField("a").getItem(0); val ay = e.getField("a").getItem(1)
        val bx = e.getField("b").getItem(0); val by = e.getField("b").getItem(1)
        ((ay > py) =!= (by > py)) &&
          (px < ax + (bx - ax) * (py - ay) / (by - ay))
      })))

  /** Even-odd point-in-polygon: odd crossing parity = inside. Holes and
    * multiple shells need no special casing under this rule. */
  def pointInPolygon(rings: Column, px: Column, py: Column): Column =
    crossingCount(rings, px, py) % 2 === 1

  /** Consecutive-point edges of one closed ring:
    * `array<struct(a: point, b: point)>`. */
  def ringEdges(ring: Column): Column =
    zip_with(slice(ring, lit(1), size(ring) - 1), slice(ring, lit(2), size(ring) - 1),
      (a, b) => struct(a.as("a"), b.as("b")))

  /** Orientation sign of the turn a→b→c: +1 counter-clockwise, −1
    * clockwise, 0 collinear. */
  private def orient(a: Column, b: Column, c: Column): Column =
    signum((b.getItem(0) - a.getItem(0)) * (c.getItem(1) - a.getItem(1)) -
      (b.getItem(1) - a.getItem(1)) * (c.getItem(0) - a.getItem(0)))

  /** Collinear point-on-segment check (assumes `p` is already known to
    * be collinear with a→b): p inside the segment's bbox. */
  private def onSegment(a: Column, b: Column, p: Column): Column =
    p.getItem(0) >= least(a.getItem(0), b.getItem(0)) &&
      p.getItem(0) <= greatest(a.getItem(0), b.getItem(0)) &&
      p.getItem(1) >= least(a.getItem(1), b.getItem(1)) &&
      p.getItem(1) <= greatest(a.getItem(1), b.getItem(1))

  /** Exact segment-segment intersection (the standard orientation test
    * plus the four collinear-touch cases). `e1`/`e2` are
    * `struct(a, b)` edges from [[ringEdges]]. */
  def segmentsIntersect(e1: Column, e2: Column): Column = {
    val a = e1.getField("a"); val b = e1.getField("b")
    val c = e2.getField("a"); val d = e2.getField("b")
    val o1 = orient(a, b, c); val o2 = orient(a, b, d)
    val o3 = orient(c, d, a); val o4 = orient(c, d, b)
    (o1 =!= o2 && o3 =!= o4) ||
      (o1 === 0 && onSegment(a, b, c)) || (o2 === 0 && onSegment(a, b, d)) ||
      (o3 === 0 && onSegment(c, d, a)) || (o4 === 0 && onSegment(c, d, b))
  }

  /** True when any edge of polygon A intersects any edge of polygon B —
    * a row-local |edges_A|·|edges_B| scan (bounded by vertex counts; at
    * 100 TB this stays a narrow map because it only ever runs on
    * grid-blocked CANDIDATE pairs, never all pairs). */
  def polygonEdgesIntersect(ringsA: Column, ringsB: Column): Column = {
    val ea = flatten(transform(ringsA, ringEdges _))
    val eb = flatten(transform(ringsB, ringEdges _))
    exists(ea, e1 => exists(eb, e2 => segmentsIntersect(e1, e2)))
  }

  /** Polygon-polygon overlap (shared interior or boundary): some edge
    * pair intersects, or one polygon contains the other — containment
    * without edge contact means EVERY vertex is inside, so testing one
    * shell vertex per side is exact. */
  /** Great-circle distance in km (haversine, R = 6371.0088 — the IUGG
    * mean earth radius): `2R·asin(sqrt(sin²(Δφ/2) + cosφ1·cosφ2·
    * sin²(Δλ/2)))`. Pure codegen'd double math; sin/cos differ between
    * libm implementations only in the last ulp (~1e-13 km here), so
    * consumers round at ≥1e-6 km before comparing across engines
    * (gq07 does). */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val dphi = radians(lat2 - lat1) / 2.0
    val dlam = radians(lon2 - lon1) / 2.0
    val h = sin(dphi) * sin(dphi) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dlam) * sin(dlam)
    lit(2.0 * 6371.0088) * asin(sqrt(h))
  }

  def polygonsOverlap(ringsA: Column, ringsB: Column): Column = {
    def v0(rings: Column): Column = element_at(element_at(rings, 1), 1)
    polygonEdgesIntersect(ringsA, ringsB) ||
      pointInPolygon(ringsB, v0(ringsA).getItem(0), v0(ringsA).getItem(1)) ||
      pointInPolygon(ringsA, v0(ringsB).getItem(0), v0(ringsB).getItem(1))
  }
}
