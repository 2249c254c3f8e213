package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the LATEST right row
  * with the same key and `rightTs <= leftTs` — the point-in-time lookup
  * (latest metric/snapshot at event time) that Spark has no built-in
  * operator for.
  *
  * Implemented by the union trick, not a range join: tag both sides,
  * union them, and run ONE window per key ordered by (ts, side) where
  * right rows sort before left rows at equal timestamps (inclusive
  * match); a forward-fill of the right columns lets every left row pick
  * up the most recent right values, then the left rows are filtered
  * back out. Cost: one hash shuffle on the key + a per-key sort —
  * identical shape to any keyed window, no matter how asymmetric the
  * sides are. A range-join (`l.key = r.key AND r.ts <= l.ts` + argmax)
  * would be O(left × right-per-key) per key; the union trick is
  * O((left + right) log) per key.
  *
  * `right` must be unique per (key, ts) — dedup it first (A10) or ties
  * are nondeterministic.
  */
object AsOf {

  def joinBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   rightCols: Seq[String]): DataFrame = {
    val side = Dedup.freshName(left, "__side")
    val ts   = Dedup.freshName(left, "__ts")
    val l = left.withColumn(side, lit(1)).withColumn(ts, col(leftTs))
    val r = right.select(
      (col(key) +: col(rightTs).as(ts) +: lit(0).as(side) +:
        rightCols.map(col)): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(side)) // right (0) before left (1) on tie
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col(side) === 1).drop(side, ts)
  }

  /** Forward as-of join: for each left row, attach the EARLIEST right
    * row with the same key and `rightTs >= leftTs` — the "next
    * scheduled event / next snapshot" lookup. Same union trick as
    * [[joinBackward]], mirrored: one window per key ordered by
    * (ts, side) with LEFT rows sorting before right rows at equal
    * timestamps (so an equal-ts right row is inside the inclusive
    * forward frame), and a backward fill via
    * `first(ignoreNulls)` over [current row, unbounded following].
    * Identical scale shape: one hash shuffle + per-key sort.
    */
  def joinForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  rightCols: Seq[String]): DataFrame = {
    val side = Dedup.freshName(left, "__side")
    val ts   = Dedup.freshName(left, "__ts")
    val l = left.withColumn(side, lit(0)).withColumn(ts, col(leftTs))
    val r = right.select(
      (col(key) +: col(rightTs).as(ts) +: lit(1).as(side) +:
        rightCols.map(col)): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(side)) // left (0) before right (1) on tie
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = rightCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col(side) === 0).drop(side, ts)
  }
}
