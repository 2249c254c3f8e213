package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra: merge overlapping/abutting per-key intervals into
  * maximal disjoint "islands" and report per-island coverage. This is
  * the duration-aware sibling of [[Sessionize]] — sessions split on the
  * *gap between instants*, interval merge unions *extents*: an event
  * that starts while an earlier one is still running extends the same
  * island even when the start-to-start gap is huge. The union length
  * ("busy time") is the standard utilization/coverage statistic
  * (machine busy-time, user watch-time, sensor uptime) that naive
  * sum-of-durations double-counts under overlap.
  *
  * Algorithm (gaps-and-islands over a running max): within a key,
  * ordered by start, an interval opens a new island iff its start is
  * strictly greater than the running max of all PREVIOUS ends
  * (equality abuts → merges). The island ordinal is then the running
  * sum of those open flags, and one groupBy(key, island) yields the
  * island extent and its event count.
  *
  * Scale shape: ONE hash shuffle on the key for the window plus one
  * partial-aggregated shuffle for the island rollup; no self-join of
  * the interval set (the textbook overlap-join formulation is
  * O(n²) per key). Each key's intervals sort within their task — same
  * single-hot-key caveat as Sessionize, same mitigation (the window
  * never holds more than one key per task; a pathological key is a
  * data bug, not a plan bug).
  */
object Intervals {

  /** Merge per-key intervals given as [startCol, endCol] (any ordered
    * numeric/timestamp columns; epoch micros recommended for exact
    * cross-engine arithmetic). `order` must be a total order within a
    * key (start + id tiebreak) so the running max's frame is
    * deterministic. Output: key columns + island_id (1-based), island
    * start/end, n_intervals.
    */
  def mergeIslands(df: DataFrame, keys: Seq[Column], startCol: Column,
                   endCol: Column, order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    val prevMaxEnd =
      max(endCol).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMaxEnd.isNull || startCol > prevMaxEnd, 1L)
      .otherwise(0L)
    val nm = Dedup.freshName(df, "__opens")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(nm, opens)
      .withColumn("island_id", sum(col(nm)).over(run))
      .groupBy(keys :+ col("island_id"): _*)
      .agg(min(startCol).as("island_start"), max(endCol).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }
}
