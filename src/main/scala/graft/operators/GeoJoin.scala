package graft.operators

import org.apache.spark.sql.DataFrame
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
}
