package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial predicates for the reference's point-in-polygon enrichment,
  * v2 (exact): ray casting as a pure column expression over a polygon
  * represented as array<struct<x:double, y:double>> (closed implicitly —
  * last vertex connects back to the first).
  *
  * Scale story: exact PIP is expensive per (point, polygon) pair, so the
  * production shape is (1) coarse grid-cell equi-join (Joins.pipJoin) or
  * bbox prefilter (GraftOptimizerRule) to cut candidates, then (2) this
  * exact predicate on the survivors.
  */
object Geo {

  /** Axis-aligned bounding box test — the cheap prefilter. */
  def inBBox(px: Column, py: Column, poly: Column): Column = {
    val xs = transform(poly, v => v.getField("x"))
    val ys = transform(poly, v => v.getField("y"))
    px >= array_min(xs) && px <= array_max(xs) &&
      py >= array_min(ys) && py <= array_max(ys)
  }

  /** Exact ray-casting point-in-polygon: odd number of edge crossings of
    * the horizontal ray from (px, py) to +∞.
    */
  def pointInPolygon(px: Column, py: Column, poly: Column): Column = {
    val n = size(poly)
    val crossing = filter(sequence(lit(0), n - 1), i => {
      val a = element_at(poly, i + 1)
      val b = element_at(poly, pmod(i + 1, n) + 1)
      val ax = a.getField("x"); val ay = a.getField("y")
      val bx = b.getField("x"); val by = b.getField("y")
      ((ay > py) =!= (by > py)) &&
        (px < (bx - ax) * (py - ay) / (by - ay) + ax)
    })
    // degenerate polygons (< 3 vertices) are never "inside" — and the
    // n >= 3 guard keeps sequence(0, n-1) from going out of bounds for an
    // EMPTY polygon (sequence(0,-1) = [0,-1] → ANSI element_at error),
    // matching PointInPolygonExpr's false-for-degenerate behavior
    when(n >= 3, size(crossing) % 2 === 1).otherwise(lit(false))
  }
}
