package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — "after D days, what fraction of
  * users is still active?" with CENSORING handled correctly: a user
  * whose observation simply ends inside the window (still active at
  * the snapshot) must not count as churned, which is exactly the
  * mistake a naive retention-by-duration histogram makes. The
  * product-limit estimator S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) is the
  * standard fix (lifetimes, churn, time-to-conversion, hardware
  * failure).
  *
  * Input: one row per subject with an integer `duration` and a 0/1
  * `event` flag (1 = the terminal event was OBSERVED, 0 = censored).
  *
  * Scale shape: one groupBy pass folds subjects into the duration
  * histogram (total + observed-event counts per duration — the same
  * persisted artifact shape as operators/Drift's histograms), at-risk
  * counts come from ONE cumulative window over the O(distinct
  * durations) histogram (the bounded-domain contract of
  * operators/Percentiles), and the survival product folds inside a
  * single collected array — subjects are never sorted row-by-row.
  *
  * Exactness: dᵢ, nᵢ are integers; each factor is one correctly
  * rounded division; the running product folds in duration order on
  * both engines (array fold here, ordered windowed product in the
  * oracle), and the emitted survival is 6-decimal stabilized so a
  * different internal accumulation (e.g. a segment-tree window
  * product) cannot surface as last-ulp drift.
  */
object Survival {

  /** KM table over `(durationCol, eventCol)` subject rows: one row per
    * distinct duration with an observed event — `t`, `n_risk`,
    * `d_events`, `survival`.
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    val hist = df.groupBy(col(durationCol).cast("long").as("t"))
      .agg(count(lit(1)).as("c"),
        sum(col(eventCol).cast("long")).as("d"))
      .cache() // O(distinct durations); feeds the total AND the window
    val tot = hist.agg(sum(col("c")).as("__n"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = hist
      .withColumn("__cb", coalesce(sum(col("c")).over(w), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("t"), (col("__n") - col("__cb")).as("n_risk"), col("d"))
      .filter(col("d") >= 1)
      .withColumn("factor", lit(1.0) -
        col("d").cast("double") / col("n_risk").cast("double"))
    // survival = ordered prefix products, built in ONE array fold over
    // the (bounded) event-time list — no per-row re-aggregation
    ev.agg(array_sort(collect_list(struct(col("t"), col("n_risk"),
        col("d"), col("factor")))).as("a"))
      .select(explode(expr(
        """aggregate(a,
          |  cast(array() as
          |    array<struct<t:bigint,n_risk:bigint,d:bigint,surv:double>>),
          |  (acc, x) -> array_append(acc, named_struct(
          |    't', x.t, 'n_risk', x.n_risk, 'd', x.d,
          |    'surv', if(size(acc) = 0, cast(1.0 as double),
          |       element_at(acc, -1).surv) * x.factor)))""".stripMargin))
        .as("r"))
      .select(col("r.t").as("t"), col("r.n_risk").as("n_risk"),
        col("r.d").as("d_events"),
        graft.functions.Stabilize.stab(col("r.surv"), 6).as("survival"))
      .orderBy(col("t"))
  }
}
