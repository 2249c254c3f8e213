package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Ordered analytics (SURVEY §2.6 W1–W4).
  *
  * Reference: grouped `cumsum` after a global `sort_values('Date')`
  * (`2024 Marathon Training Analysis.ipynb:5006`), `shift(1, fill_value=0)`
  * (`ETL Scripts/transform_running_data.py:195,200`), `ffill()`
  * (`PBI ...Wrangling.ipynb:1559`).
  *
  * The reference sorts the whole frame globally before each grouped
  * cumulative op; folding the order into the window's ORDER BY removes the
  * global sort entirely — each group sorts independently after one hash
  * shuffle (SURVEY §4). Callers must pass a TOTAL order (tiebreaker
  * included) or results are nondeterministic under parallelism.
  */
object Windows {

  def grouped(keys: Seq[Column], order: Seq[Column]): WindowSpec =
    Window.partitionBy(keys: _*).orderBy(order: _*)

  /** W1 — grouped running sum over an explicit total order. */
  def runningSum(value: Column, keys: Seq[Column], order: Seq[Column]): Column =
    sum(value).over(grouped(keys, order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** W2 — grouped lag with default (pandas shift(1, fill_value=d)). */
  def lagWithDefault(value: Column, keys: Seq[Column], order: Seq[Column],
                     default: Any): Column =
    lag(value, 1, default).over(grouped(keys, order))

  /** W3 — forward fill: last non-null value up to the current row.
    * NOTE: an unpartitioned ffill (`keys = Nil`) serializes into a single
    * task — fine for small daily tables (the reference's use), wrong for
    * big fact tables; partition by a coarse key there.
    */
  def forwardFill(value: Column, keys: Seq[Column], order: Seq[Column]): Column =
    last(value, ignoreNulls = true).over(grouped(keys, order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** W4 — rank rows within groups (top-k per group when filtered). */
  def rowNumber(keys: Seq[Column], order: Seq[Column]): Column =
    row_number().over(grouped(keys, order))

  /** Top-k per group with deterministic tiebreak ordering. */
  def topKPerGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                   k: Int): DataFrame = {
    val rk = Dedup.freshName(df, "__rk")
    df.withColumn(rk, rowNumber(keys, order))
      .filter(col(rk) <= k)
      .drop(rk)
  }
}
