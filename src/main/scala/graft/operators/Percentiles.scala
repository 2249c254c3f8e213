package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT percentile via a two-phase value histogram.
  *
  * Spark's built-in `percentile(col, p)` is exact but buffers every
  * value of the group in ONE aggregation buffer — for a global cutoff
  * (e.g. "drop the worst 25% of the corpus",
  * `2024 Marathon Training Analysis.ipynb` threshold idiom generalized)
  * that single task holds the whole corpus and is the job's memory
  * ceiling at 10⁹ rows. `approx_percentile` fixes the memory shape but
  * changes the answer.
  *
  * This operator keeps the answer EXACT and the shape distributed when
  * the value domain is bounded:
  *
  *   phase 1 — `groupBy(value).count()`: a shuffle keyed on the value
  *     with map-side partial aggregation; per-task state is
  *     O(distinct values in the task's input), and the shuffled
  *     histogram is O(distinct values) rows total, independent of row
  *     count.
  *   phase 2 — one cumulative-sum window over the HISTOGRAM (not the
  *     corpus) locates the two order statistics straddling rank
  *     h = p·(n−1), and a 1-row aggregate interpolates between them.
  *
  * The interpolation is Spark/NumPy type-7 — v_k + (h−k)·(v_{k+1} −
  * v_k), h = p·(n−1), k = ⌊h⌋ — i.e. bit-identical inputs to what
  * `percentile` / DuckDB `quantile_cont` compute, so existing oracles
  * keep hash-matching (after the same decimal stabilization the exact
  * aggregate already needed).
  *
  * CONTRACT: distinct values must be bounded well below corpus size —
  * true for score RATIOS with small integer numerator/denominator
  * (stop_ratio = n_stop/n_tokens with n_tokens ≤ a few thousand) and
  * for anything pre-quantized. The phase-2 window is single-partition
  * over the histogram; for a genuinely continuous unbounded column,
  * quantize first (`round(x·10^d)/10^d`) and accept grid error, or use
  * `approx_percentile`. Nulls are excluded, matching both engines'
  * aggregate semantics.
  */
object Percentiles {

  /** 1-row frame with column `alias` = exact p-quantile of
    * `df(valueCol)` (type-7 interpolation, null-excluded). Broadcast it
    * against the scoring frame for the filter phase — same two-phase
    * agg+broadcast shape as mean imputation (operators/Impute).
    */
  def exactByHistogram(df: DataFrame, valueCol: String, p: Double,
                       alias: String): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"percentile p must be in [0,1], got $p")
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    // Cumulative count over the tiny histogram: ranks covered by a
    // bucket are [__cum − __c, __cum − 1] (0-based).
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist.withColumn("__cum", sum(col("__c")).over(w))
    val n = last(col("__cum")).over(
      Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    val withRank = ranked
      .withColumn("__h", lit(p) * (n - lit(1)).cast("double"))
      .withColumn("__k", floor(col("__h")).cast("long"))
    def covers(rank: org.apache.spark.sql.Column) =
      col("__cum") - col("__c") <= rank && rank < col("__cum")
    withRank.agg(
        max(when(covers(col("__k")), col("__v"))).as("__vk"),
        max(when(covers(col("__k") + 1), col("__v"))).as("__vk1"),
        max(col("__h")).as("__hh"),
        max(col("__k")).as("__kk"))
      .select((col("__vk") + (col("__hh") - col("__kk"))
          * (coalesce(col("__vk1"), col("__vk")) - col("__vk")))
        .as(alias))
  }
}
