package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration / inequality statistics — "how skewed is the corpus
  * across sources?", "what share of revenue sits in the top accounts?".
  * The Gini coefficient is the standard single-number answer (0 =
  * uniform, →1 = one unit holds everything); data pipelines use it to
  * alert on source-mix collapse and key-skew the same way economists
  * use it on income.
  *
  * Derivation (histogram form, no per-row ranking): with values sorted
  * ascending, G = Σᵢ (2i − n − 1)·xᵢ / (n·Σx). A run of c equal values
  * after m smaller ones contributes x·Σ_{i=m+1}^{m+c}(2i−n−1) =
  * x·c·(2m + c − n) — rank order within ties cancels, so the whole
  * numerator folds from the VALUE HISTOGRAM: one groupBy pass over the
  * data, then a cumulative window over O(distinct values) rows (the
  * bounded-domain contract of operators/Percentiles; for genuinely
  * high-cardinality value domains quantize first or use the
  * bucket-carry running sum in operators/Windows).
  *
  * Exactness: values enter as INTEGERS (callers quantize money/scores
  * to fixed-point first — the scale cancels in the ratio), and every
  * sum/product rides DECIMAL(38,0), so rank-sum magnitudes ≈ n·Σx
  * cannot overflow at petabyte row counts. The single report row then
  * performs a handful of correctly-rounded double ops, with the final
  * ratio 6-decimal stabilized. Values are assumed nonnegative (Gini is
  * undefined for mixed-sign totals).
  */
object Concentration {

  /** One-row Gini report from a `(v, c)` value histogram, `v` integer-
    * valued: `n_values` (Σc), `total` (Σ v·c as double), `gini`
    * (6-decimal stabilized).
    */
  def giniFromHist(hist: DataFrame, vCol: String, cCol: String): DataFrame = {
    val v = col(vCol).cast("decimal(38,0)")
    val c = col(cCol).cast("decimal(38,0)")
    val h = hist.select(v.as("__v"), c.as("__c")).cache()
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = h.agg(sum(col("__c")).as("__n"),
      sum(col("__v") * col("__c")).as("__s"))
    val mBefore = coalesce(sum(col("__c")).over(w),
      lit(0L).cast("decimal(38,0)"))
    h.withColumn("__m", mBefore)
      .crossJoin(broadcast(tot))
      .select((col("__v") * col("__c") *
        (col("__m") * 2 + col("__c") - col("__n"))).as("__t"),
        col("__n"), col("__s"))
      .groupBy(col("__n"), col("__s"))
      .agg(sum(col("__t")).as("__num"))
      .select(col("__n").cast("long").as("n_values"),
        col("__s").cast("double").as("total"),
        graft.functions.Stabilize.stab(
          col("__num").cast("double") /
            (col("__n").cast("double") * col("__s").cast("double")), 6)
          .as("gini"))
  }

  /** Gini of integer-valued `value` over `df` rows (weight 1 each):
    * builds the value histogram, then [[giniFromHist]].
    */
  def gini(df: DataFrame, value: Column): DataFrame =
    giniFromHist(
      df.filter(value.isNotNull)
        .groupBy(value.as("v")).agg(count(lit(1)).as("c")),
      "v", "c")
}
