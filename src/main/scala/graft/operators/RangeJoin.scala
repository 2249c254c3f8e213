package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join by binning — the scale path for
  * `l.point BETWEEN r.lo AND r.hi` joins, which Catalyst can only plan
  * as a broadcast-nested-loop (every left row against every right
  * interval).
  *
  * Each right interval explodes into the fixed-width bins it overlaps;
  * each left point maps to its single bin; the join becomes a hash
  * EQUI-join on (bin) followed by the exact range predicate. Cost is
  * proportional to bin overlaps, not |L|×|R|. `binWidth` trades
  * duplication (wide intervals explode into many bins) against bucket
  * collision (too-wide bins put unrelated rows together) — set it near
  * the typical interval length.
  *
  * Works for time ranges and numeric ranges alike (caller provides
  * numeric columns; cast timestamps to epoch first).
  */
object RangeJoin {

  /** Inner range join: rows of `points` with `pointCol` in
    * [`loCol`, `hiCol`] of `intervals` (inclusive both ends).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    val bin = Dedup.freshName(points, "__bin")
    val p = points.withColumn(bin, floor(col(pointCol) / binWidth))
    val i = intervals.withColumn(bin,
      explode(sequence(floor(col(loCol) / binWidth),
        floor(col(hiCol) / binWidth))))
    p.join(i, Seq(bin))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(bin)
  }
}
