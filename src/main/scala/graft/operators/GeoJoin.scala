package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-binned spatial join (SURVEY §2.7 J4 — the reference's
  * aspirational `LEFT JOIN … ON ST_Contains(geom, location)` example,
  * `ETL Scripts/README.md:201-209`, restricted to rectangles).
  *
  * Spark-first shape: a raw spatial predicate join is a broadcast
  * nested loop (all points × all boxes). Binning both sides onto a
  * `cellSize`-degree grid turns it into a HASH EQUI-JOIN on the cell
  * id: each point lands in exactly one cell, each box explodes into
  * the cells it covers, and the exact containment predicate runs only
  * on same-cell pairs. This is the same bin-then-verify rewrite as
  * operators/RangeJoin, in two dimensions — at 100 TB the shuffle key
  * is (cx, cy) and candidate pairs are proportional to points ×
  * boxes-per-cell, never points × boxes.
  *
  * Pick `cellSize` near the typical box extent: much smaller explodes
  * boxes into many cells (row blowup on the box side — fine, boxes are
  * the small side); much larger degrades toward all-pairs within a
  * cell. A point matching a box is counted ONCE by construction (one
  * cell per point), so no distinct pass is needed.
  *
  * `points` must carry `lonCol`/`latCol`; `boxes` must carry
  * `min_lon`/`min_lat`/`max_lon`/`max_lat`. Containment is inclusive
  * on all edges.
  */
object GeoJoin {

  def pointInBoxJoin(points: DataFrame, boxes: DataFrame,
                     lonCol: String, latCol: String,
                     cellSize: Double): DataFrame = {
    // fresh against BOTH frames: withColumn on the boxes side would
    // silently overwrite a same-named box attribute otherwise
    val taken = points.columns.toSet ++ boxes.columns
    val cx = Dedup.freshName(taken, "__gx")
    val cy = Dedup.freshName(taken + cx, "__gy")
    val p = points
      .withColumn(cx, floor(col(lonCol) / cellSize).cast("long"))
      .withColumn(cy, floor(col(latCol) / cellSize).cast("long"))
    val b = boxes
      .withColumn(cx, explode(sequence(
        floor(col("min_lon") / cellSize).cast("long"),
        floor(col("max_lon") / cellSize).cast("long"))))
      .withColumn(cy, explode(sequence(
        floor(col("min_lat") / cellSize).cast("long"),
        floor(col("max_lat") / cellSize).cast("long"))))
    p.join(b, Seq(cx, cy))
      .filter(col(lonCol) >= col("min_lon") && col(lonCol) <= col("max_lon") &&
              col(latCol) >= col("min_lat") && col(latCol) <= col("max_lat"))
      .drop(cx, cy)
  }

  /** Even-odd ray-cast point-in-polygon as a Column over a vertex
    * array (`array<struct<x:double,y:double>>`, implicitly closed —
    * last vertex connects back to the first). Counts edges crossed by
    * the +x ray from the point: edge i→i+1 crosses iff the vertices
    * straddle the point's y AND the point is left of the edge's
    * x-intercept at that y. Odd crossing count = inside; works for
    * CONVEX AND CONCAVE polygons, any vertex order.
    *
    * The straddle test `(a.y > y) != (b.y > y)` excludes horizontal
    * edges and guards the intercept division (a.y != b.y whenever it
    * holds; AND short-circuits on false in both engines). All
    * arithmetic is plain double in a fixed operation order, so a
    * DuckDB mirror written the same way agrees bit-for-bit — boundary
    * points included. Higher-order-function (interpreted) evaluation
    * is fine here BECAUSE the join below runs it on grid-cell
    * candidates only, never the full cross product.
    */
  def pointInPolygon(x: Column, y: Column, verts: Column): Column = {
    val n = size(verts)
    val crossed = filter(sequence(lit(1), n), i => {
      val a = element_at(verts, i)
      val b = element_at(verts, (i % n) + 1)
      val (ax, ay) = (a.getField("x"), a.getField("y"))
      val (bx, by) = (b.getField("x"), b.getField("y"))
      ((ay > y) =!= (by > y)) &&
        (x < (bx - ax) * (y - ay) / (by - ay) + ax)
    })
    size(crossed) % 2 === 1
  }

  /** Grid-binned point-in-POLYGON join (SURVEY §2.7 J4 complete — the
    * reference's `LEFT JOIN … ON ST_Contains(geometry, location)`
    * example, `ETL Scripts/README.md:201-209`, for arbitrary simple
    * polygons). Same bin-then-verify rewrite as [[pointInBoxJoin]]:
    * each polygon explodes into the grid cells covering its bounding
    * box (equi-join candidates ∝ points × polygons-per-cell), and
    * [[pointInPolygon]] verifies exactly on same-cell pairs. A point
    * matches a polygon at most once by construction (one cell per
    * point). `polys(vertsCol)` is `array<struct<x:double,y:double>>`.
    */
  def pointInPolygonJoin(points: DataFrame, polys: DataFrame,
                         lonCol: String, latCol: String, vertsCol: String,
                         cellSize: Double): DataFrame = {
    val taken = points.columns.toSet ++ polys.columns
    val cx = Dedup.freshName(taken, "__gx")
    val cy = Dedup.freshName(taken + cx, "__gy")
    val p = points
      .withColumn(cx, floor(col(lonCol) / cellSize).cast("long"))
      .withColumn(cy, floor(col(latCol) / cellSize).cast("long"))
    val xs = transform(col(vertsCol), v => v.getField("x"))
    val ys = transform(col(vertsCol), v => v.getField("y"))
    val b = polys
      .withColumn(cx, explode(sequence(
        floor(array_min(xs) / cellSize).cast("long"),
        floor(array_max(xs) / cellSize).cast("long"))))
      .withColumn(cy, explode(sequence(
        floor(array_min(ys) / cellSize).cast("long"),
        floor(array_max(ys) / cellSize).cast("long"))))
    p.join(b, Seq(cx, cy))
      .filter(pointInPolygon(col(lonCol), col(latCol), col(vertsCol)))
      .drop(cx, cy)
  }
}
