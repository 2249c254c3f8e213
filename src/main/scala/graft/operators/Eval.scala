package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** NDCG@k per ranking group (the standard retrieval-quality metric,
    * Järvelin & Kekäläinen 2002): rank each group's rows by `scoreCol`
    * descending (ties broken by `tieCol` ascending so the ranking is
    * total and reproducible), take the top k, and score
    * `DCG@k = Σ (2^rel − 1) / log2(rank + 1)` against the ideal
    * ordering's `IDCG@k` (rows re-ranked by relevance itself).
    *
    * Scale shape (100 TB): both rankings are windows PARTITIONED BY
    * the group column — per-group state, groups spread across tasks,
    * no global sort. The gains are integers; each discounted term is
    * rounded to a 1e-9 grid and accumulated as an exact DECIMAL, so
    * partial-aggregation order cannot change the sum; the final
    * DCG/IDCG ratio takes one more 1e-6 stabilization (cross-engine
    * log2 can differ in the last ulp).
    *
    * Output: one row per group `(group, n_rated, dcg, idcg, ndcg)`
    * with ndcg null when the group has no positive-gain row.
    */
  def ndcgAtK(df: DataFrame, groupCol: String, scoreCol: String,
              relCol: String, tieCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val stab = graft.functions.Stabilize.stab(_, _)
    val g = col(groupCol)
    val gain = (pow(lit(2.0), col(relCol).cast("double")) - 1.0)
    def discounted(rankCol: Column): Column =
      stab(gain / log2(rankCol.cast("double") + 1.0), 9)
        .cast("decimal(24,12)")
    val ranked = Window.partitionBy(g)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val ideal = Window.partitionBy(g)
      .orderBy(col(relCol).desc, col(tieCol).asc)
    df.select(g, col(scoreCol), col(relCol), col(tieCol))
      .withColumn("__r", row_number().over(ranked))
      .withColumn("__ir", row_number().over(ideal))
      .select(g,
        when(col("__r") <= k, discounted(col("__r")))
          .otherwise(lit(0).cast("decimal(24,12)")).as("__d"),
        when(col("__ir") <= k, discounted(col("__ir")))
          .otherwise(lit(0).cast("decimal(24,12)")).as("__i"))
      .groupBy(g)
      .agg(count(lit(1)).as("n_rated"),
        sum(col("__d")).cast("double").as("dcg"),
        sum(col("__i")).cast("double").as("idcg"))
      .select(g, col("n_rated"), col("dcg"), col("idcg"),
        when(col("idcg") > 0, stab(col("dcg") / col("idcg"), 6))
          .as("ndcg"))
  }

  /** Binary-relevance ranking metrics per query group: MRR and MAP@k
    * (AP@k normalized by min(R, k), the trec_eval convention). The
    * ranking is `scoreCol DESC, tieCol ASC` (a total order), relevance
    * is boolean `relCol`.
    *
    * Scale shape: one window pass PARTITIONED BY group (per-group
    * state only — candidate lists are bounded by the retriever's k,
    * never corpus-sized) computing rank and cumulative-relevant in the
    * same frame, then ONE partial-aggregated groupBy. Each AP term
    * `cumrel/rank` is one IEEE division 1e-9-stabilized and summed as
    * DECIMAL, so partial-agg order cannot move the result (the
    * [[ndcgAtK]] discipline); MRR's `1/first_rank` and AP's final
    * normalization are single IEEE divisions on exact integers.
    *
    * Output per group: `(group, n_docs, n_rel, first_rel_rank, mrr,
    * ap)` — `first_rel_rank`/`mrr`/`ap` are null when the group has no
    * relevant documents.
    */
  def mapMrrAtK(df: DataFrame, groupCol: String, scoreCol: String,
                relCol: String, tieCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val stab = graft.functions.Stabilize.stab(_, _)
    val g = col(groupCol)
    val w = Window.partitionBy(g)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val cum = Window.partitionBy(g)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rel = col(relCol).cast("boolean")
    df.select(g, col(scoreCol), col(tieCol), rel.as("__rel"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__cum",
        sum(when(col("__rel"), 1L).otherwise(0L)).over(cum))
      .select(g, col("__rel"), col("__rk"),
        when(col("__rel") && col("__rk") <= k,
            stab(col("__cum").cast("double") / col("__rk").cast("double"),
              9).cast("decimal(24,12)"))
          .otherwise(lit(0).cast("decimal(24,12)")).as("__t"))
      .groupBy(g)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__rel"), 1L).otherwise(0L)).as("n_rel"),
        min(when(col("__rel"), col("__rk").cast("long")))
          .as("first_rel_rank"),
        sum(col("__t")).cast("double").as("__ap_num"))
      .select(g, col("n_docs"), col("n_rel"), col("first_rel_rank"),
        when(col("n_rel") > 0,
          lit(1.0) / col("first_rel_rank").cast("double")).as("mrr"),
        when(col("n_rel") > 0,
          col("__ap_num") /
            least(col("n_rel"), lit(k.toLong)).cast("double")).as("ap"))
  }
}
