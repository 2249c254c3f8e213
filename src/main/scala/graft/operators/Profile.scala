package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling + data-dependent pruning (SURVEY §2.2 P3/P4, §2.5 A5/A6).
  *
  * Reference: `dropna(axis=1, how='all')` (`ETL Scripts/transform_all_datasets.py:47`)
  * and drop-if-`nunique()==1` (`PBI ...Wrangling.ipynb:534,1498`).
  *
  * Data-dependent schema needs an action before the output plan can be
  * finalized (SURVEY §7.4#3), so this is explicitly two-phase: ONE profiling
  * aggregate pass over every column, then a generated `select` of the
  * survivors. The profile pass is a single job with map-side partial
  * aggregation — never one job per column.
  *
  * Scale note: exact `countDistinct` per column is a wide aggregate; for
  * 100 TB profiling set `exact = false` to use `approx_count_distinct`
  * (HLL, single pass, no per-column shuffle explosion). The pruning
  * decision only needs "is it >= 2 distinct", which HLL answers reliably.
  */
object Profile {

  /** Non-null count + distinct count per column, as a single 1-row frame
    * with columns `nonnull_<c>` / `distinct_<c>`.
    */
  def stats(df: DataFrame, exact: Boolean = true): DataFrame = {
    val aggs = df.columns.toSeq.flatMap { c =>
      val dc = if (exact) countDistinct(col(c))
               else approx_count_distinct(col(c))
      Seq(count(col(c)).as(s"nonnull_$c"), dc.as(s"distinct_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** P3 + P4: drop columns that are entirely null and/or carry a single
    * distinct value. Returns the pruned frame (original column order kept).
    */
  def pruneUninformative(df: DataFrame,
                         dropAllNull: Boolean = true,
                         dropSingleValue: Boolean = true,
                         exact: Boolean = true): DataFrame = {
    val row = stats(df, exact).head()
    val keep = df.columns.filter { c =>
      val nonnull  = row.getAs[Long](s"nonnull_$c")
      val distinct = row.getAs[Long](s"distinct_$c")
      val allNull  = nonnull == 0L
      val single   = distinct <= 1L
      !(dropAllNull && allNull) && !(dropSingleValue && single && !allNull)
    }
    df.select(keep.map(col).toSeq: _*)
  }
}
