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
