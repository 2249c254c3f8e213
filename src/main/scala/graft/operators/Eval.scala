package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation aggregates for curation models (quality
  * scorers, language filters, toxicity gates): rank-based AUC and
  * reliability (calibration) bins. Pipelines that train a fastText-
  * style quality classifier evaluate it IN the engine, on the full
  * corpus, before the filter ships — these are those two evaluations
  * as distributed plans.
  *
  * Scale shape (100 TB): both operators first collapse the corpus to a
  * score HISTOGRAM with one partial-aggregated groupBy — everything
  * downstream is O(distinct scores), never O(rows), the same
  * compression argument as [[Percentiles.exactByHistogram]]. AUC's
  * cumulative pass is a window over that histogram (distinct-value-
  * sized, not corpus-sized); calibration is a second tiny groupBy of
  * the histogram into bins.
  */
object Eval {

  /** Area under the ROC curve by the Mann-Whitney rank statistic, ties
    * counted half (the standard definition). All arithmetic up to the
    * final division is INTEGER — `2·Σ_v pos_v·(2·negBelow_v + neg_v)`
    * over distinct scores `v` — so the result is the exact rational
    * `num / (2·P·N)` rounded once by IEEE double division, bit-equal
    * in any engine.
    *
    * Output: one row `(n_pos, n_neg, auc)`. Degenerate inputs (no
    * positives or no negatives) yield auc = null rather than a
    * division error.
    */
  def aucByRank(df: DataFrame, scoreCol: String,
                labelCol: String): DataFrame = {
    val hist = df
      .select(col(scoreCol).as("__s"),
        when(col(labelCol), 1L).otherwise(0L).as("__y"))
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("__pos"),
        (count(lit(1)) - sum(col("__y"))).as("__neg"))
    // One window over O(distinct scores) rows; acceptable single-task
    // width for the same reason exactByHistogram's is (bounded domain).
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("__negUpTo", sum(col("__neg")).over(w))
    cum.agg(
        sum(col("__pos")).as("n_pos"),
        sum(col("__neg")).as("n_neg"),
        sum(col("__pos") *
          (lit(2) * (col("__negUpTo") - col("__neg")) + col("__neg")))
          .as("__num2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("__num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")))
          .as("auc"))
  }

  /** Reliability-diagram bins: equi-width bins of the score, each with
    * its row count, positive count, exact positive rate, and exact mean
    * score (decimal-accumulated sum, one IEEE division). A calibrated
    * scorer has pos_rate tracking mean_score bin by bin.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    df.select(
        floor(col(scoreCol) / binWidth).cast("long").as("bin"),
        col(scoreCol).cast("decimal(18,6)").as("__s"),
        when(col(labelCol), 1L).otherwise(0L).as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("n_pos"),
        (sum(col("__y")).cast("double") / count(lit(1))).as("pos_rate"),
        (sum(col("__s")).cast("double") / count(lit(1)))
          .as("mean_score"))
  }
}
