package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-blocked point-in-polygon join — the spatial analogue of the LSH
  * dedup pipelines: candidates come only from shared grid cells, never
  * from an all-pairs comparison.
  *
  * Plan shape: polygons explode to the grid cells their bbox covers
  * (bounded fan-out: ceil(w/cell)·ceil(h/cell) rows per polygon), points
  * map to exactly ONE cell each; an equi-join on the cell key surfaces
  * candidates and the exact even-odd test confirms them. Both sides
  * shuffle on uniform cell keys, so at 100 TB this is one partitioned
  * hash join plus a row-local confirm — polygon count × point count
  * never materializes. A point's single cell means a (point, polygon)
  * candidate appears at most once: no post-join dedup pass.
  *
  * Cell size is the skew knob: cells ~the median polygon diameter keep
  * the per-polygon explode small while keeping cell populations even;
  * degenerate giant polygons fan out to bbox-area/cell² rows (cap via a
  * coarser grid or split such polygons upstream).
  */
object SpatialJoin {

  /** Grid cell of a point: `struct(floor(x/cell), floor(y/cell))`. */
  def pointCell(px: Column, py: Column, cell: Double): Column =
    struct(floor(px / cell).cast("long").as("cx"),
      floor(py / cell).cast("long").as("cy"))

  /** All grid cells covered by a bbox (inclusive of boundary cells). */
  def bboxCells(bb: Column, cell: Double): Column = {
    val x0 = floor(element_at(bb, 1) / cell).cast("long")
    val x1 = floor(element_at(bb, 3) / cell).cast("long")
    val y0 = floor(element_at(bb, 2) / cell).cast("long")
    val y1 = floor(element_at(bb, 4) / cell).cast("long")
    flatten(transform(sequence(x0, x1),
      cx => transform(sequence(y0, y1),
        cy => struct(cx.as("cx"), cy.as("cy")))))
  }

  /** Polygon-polygon overlap join: both sides explode to the grid cells
    * their bbox covers, candidates come from an equi-join on the cell
    * key, and the exact [[GeoFunctions.polygonsOverlap]] test confirms.
    *
    * A candidate pair can share MANY cells; instead of a post-join
    * `distinct` (a second shuffle over the pair set), each pair is
    * emitted only in its REFERENCE CELL — the cell containing the
    * top-left corner of the two bboxes' intersection (`max` of the two
    * minima per axis). That corner lies in some shared-covered cell
    * whenever the bboxes overlap, is computable row-locally on the
    * joined row, and is unique — so every overlapping pair survives
    * exactly once with zero extra passes (the standard PBSM/"reference
    * point" dedup). Pairs whose bboxes don't even overlap die at the
    * same filter before the expensive edge test runs.
    *
    * Returns one row per overlapping (idA, idB); extra columns survive. */
  def polygonOverlapJoin(polysA: DataFrame, idA: String, ringsA: String,
                         polysB: DataFrame, idB: String, ringsB: String,
                         cell: Double = 1.0): DataFrame = {
    val a = polysA.withColumn("__bba", GeoFunctions.bbox(col(ringsA)))
      .withColumn("__cell", explode(bboxCells(col("__bba"), cell)))
    val b = polysB.withColumn("__bbb", GeoFunctions.bbox(col(ringsB)))
      .withColumn("__cell", explode(bboxCells(col("__bbb"), cell)))
    val refX = greatest(element_at(col("__bba"), 1), element_at(col("__bbb"), 1))
    val refY = greatest(element_at(col("__bba"), 2), element_at(col("__bbb"), 2))
    a.join(b, "__cell")
      .filter(col("__cell") === pointCell(refX, refY, cell))
      .filter(GeoFunctions.polygonsOverlap(col(ringsA), col(ringsB)))
      .drop("__cell", "__bba", "__bbb")
  }

  /** All cells within `r` cells of a point's own cell — the bounded
    * probe window for [[knnPolygons]]: (2r+1)² structs, row-local. */
  def cellWindow(px: Column, py: Column, cell: Double, r: Int): Column = {
    val cx = floor(px / cell).cast("long")
    val cy = floor(py / cell).cast("long")
    flatten(transform(sequence(cx - r, cx + r),
      x => transform(sequence(cy - r, cy + r),
        y => struct(x.as("cx"), y.as("cy")))))
  }

  /** k nearest polygons per point by CENTROID (shell) Euclidean
    * distance, grid-blocked: polygons land in their centroid's single
    * cell, each point probes the (2r+1)² cells around its own, and a
    * per-point top-k window ranks the candidates — so the pairs
    * examined are |points|·(bounded candidate count), never
    * |points|·|polygons|.
    *
    * `probeCells` (= r) is the static form of an expanding-ring probe
    * and carries the correctness contract: every point's k-th nearest
    * centroid must lie within `(r−1)·cell` (candidates at cell distance
    * ≤ r are guaranteed only up to that geometric distance). Size it
    * from data bounds — polygon density per cell × window area ≥ k with
    * the k-th-neighbor distance bound — or run the query twice with
    * doubled r and diff (the recall pattern ss04 uses). A point whose
    * window holds fewer than k centroids returns fewer than k rows
    * rather than silently wrong ones. */
  def knnPolygons(points: DataFrame, idCol: String, pxCol: String, pyCol: String,
                  polys: DataFrame, polyIdCol: String, ringsCol: String,
                  k: Int, cell: Double = 1.0, probeCells: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = polys
      .withColumn("__cent", GeoFunctions.ringCentroid(element_at(col(ringsCol), 1)))
      .withColumn("__cx", element_at(col("__cent"), 1))
      .withColumn("__cy", element_at(col("__cent"), 2))
      .withColumn("__cell", pointCell(col("__cx"), col("__cy"), cell))
      .drop("__cent", ringsCol)
    val probes = points.withColumn("__cell",
      explode(cellWindow(col(pxCol), col(pyCol), cell, probeCells)))
    // a centroid has ONE cell and probe cells are distinct, so each
    // (point, polygon) candidate appears at most once — no dedup pass
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("dist"), col(polyIdCol))
    probes.join(cents, "__cell")
      .withColumn("dist", sqrt(
        pow(col(pxCol) - col("__cx"), 2) + pow(col(pyCol) - col("__cy"), 2)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("__cell", "__cx", "__cy")
  }

  /** Join `points(idCol, pxCol, pyCol)` to `polys(polyIdCol, ringsCol)`
    * on containment. Returns (idCol, polyIdCol) pairs. Extra columns on
    * either input survive the join. */
  def pointInPolygons(points: DataFrame, idCol: String, pxCol: String, pyCol: String,
                      polys: DataFrame, polyIdCol: String, ringsCol: String,
                      cell: Double = 1.0): DataFrame = {
    val pt = points.withColumn("__cell", pointCell(col(pxCol), col(pyCol), cell))
    val pl = polys
      .withColumn("__cell", explode(bboxCells(GeoFunctions.bbox(col(ringsCol)), cell)))
    pt.join(pl, "__cell")
      .filter(GeoFunctions.pointInPolygon(col(ringsCol), col(pxCol), col(pyCol)))
      .drop("__cell", ringsCol)
  }
}
