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

  /** Nearest as-of join: for each left row, attach the right row with
    * the same key whose timestamp is CLOSEST in either direction —
    * equal distance (and an exact timestamp hit) resolves to the
    * earlier (backward) row. The "closest sensor reading / closest
    * snapshot" lookup.
    *
    * One union + ONE window sort serves both directions: with right
    * rows sorting before left rows at equal timestamps, the backward
    * frame [unbounded, current] sees at-or-before matches (inclusive)
    * and the forward frame [current, unbounded] sees strictly-after
    * matches; the per-row choice is then a pure projection comparing
    * the two deltas. Cost identical to joinBackward: one hash shuffle
    * on the key + one per-key sort (Spark reuses the sort for both
    * frames — same partitioning and ordering).
    *
    * `delta(a, b)` must return a comparable "a minus b" for the ts
    * type (timestamps: `(a, b) => unix_micros(a) - unix_micros(b)`;
    * dates: `datediff`). `right` must be unique per (key, ts).
    * Output: left columns + chosen `rightCols` + the matched right
    * timestamp under its `rightTs` name (null when the key has no
    * right rows at all).
    */
  def joinNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  rightCols: Seq[String],
                  delta: (Column, Column) => Column): DataFrame = {
    val side = Dedup.freshName(left, "__side")
    val ts   = Dedup.freshName(left, "__ts")
    val mts  = Dedup.freshName(left, "__mts")
    val l = left.withColumn(side, lit(1)).withColumn(ts, col(leftTs))
    val r = right.select(
      (col(key) +: col(rightTs).as(ts) +: lit(0).as(side) +:
        col(rightTs).as(mts) +: rightCols.map(col)): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val ord = Window.partitionBy(col(key)).orderBy(col(ts), col(side))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = mts +: rightCols
    val filled = carried.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"${c}__p", last(col(c), ignoreNulls = true).over(wPrev))
        .withColumn(s"${c}__n", first(col(c), ignoreNulls = true).over(wNext))
    }
    val pTs = col(s"${mts}__p")
    val nTs = col(s"${mts}__n")
    val usePrev = pTs.isNotNull &&
      (nTs.isNull || delta(col(ts), pTs) <= delta(nTs, col(ts)))
    val out = carried.foldLeft(filled) { (d, c) =>
      val name = if (c == mts) rightTs else c
      d.withColumn(name,
        when(usePrev, col(s"${c}__p")).otherwise(col(s"${c}__n")))
    }
    out.filter(col(side) === 1)
      .drop(side +: ts +: mts +:
        carried.flatMap(c => Seq(s"${c}__p", s"${c}__n")): _*)
  }
}
