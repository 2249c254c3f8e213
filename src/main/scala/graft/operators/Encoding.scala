package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised categorical encodings — the feature-engineering steps a
  * training-data pipeline runs before model fitting: smoothed target
  * (mean) encoding with its leakage-safe leave-one-out variant, and
  * weight-of-evidence / information-value binning (the credit-scoring
  * standard for ranking feature strength).
  *
  * Scale shape (100 TB): every encoder is ONE partial-aggregated
  * groupBy producing a category/bin table that is orders of magnitude
  * smaller than the data, broadcast back for the row-level columns —
  * no windows, no per-row state. Exactness follows the repo-wide
  * discipline: integer/decimal arithmetic to the end, then single IEEE
  * divisions (target encoding), or one stabilized `ln` per bin
  * DECIMAL-summed (WOE/IV), so both engines land on identical bits.
  */
object Encoding {

  /** Smoothed target encoding per category (the Micci-Barreca 2001
    * scheme): `enc = (sum_c + m·mean_global) / (n_c + m)`, computed
    * over the common denominator as `(sum_c·N + m·S) / ((n_c + m)·N)`
    * — numerator and denominator exact, ONE IEEE division — plus the
    * leakage-safe leave-one-out row encoding
    * `(sum_c − y_i) / (n_c − 1)` (null for singleton categories,
    * which have no leave-one-out evidence).
    *
    * `target` must be exactly representable (cast to DECIMAL first).
    * Output: the input rows plus `(n_cat, enc_smooth, enc_loo)`.
    */
  def targetEncode(df: DataFrame, catCol: String, target: Column,
                   m: Long): DataFrame = {
    require(m >= 0, s"smoothing m must be >= 0, got $m")
    val cat = df.groupBy(col(catCol))
      .agg(sum(target).as("__sc"), count(lit(1)).as("__nc"))
    val tot = df.agg(sum(target).as("__s"), count(lit(1)).as("__n"))
    df.join(broadcast(cat.crossJoin(tot)), Seq(catCol))
      .withColumn("n_cat", col("__nc"))
      .withColumn("enc_smooth",
        (col("__sc") * col("__n") + lit(m) * col("__s")).cast("double") /
          ((col("__nc") + m) * col("__n")).cast("double"))
      .withColumn("enc_loo",
        when(col("__nc") > 1,
          (col("__sc") - target).cast("double") /
            (col("__nc") - 1).cast("double")))
      .drop("__sc", "__nc", "__s", "__n")
  }

  /** Weight-of-evidence / information-value report over pre-binned
    * rows: per bin `woe = ln((pos/P)/(neg/Neg))` (one stabilized `ln`
    * of an exact integer ratio — `(pos·Neg)/(neg·P)` — so both
    * engines round identically) and the bin's IV term
    * `(pos/P − neg/Neg)·woe`, DECIMAL-summed into `iv_total` on every
    * row. Bins with zero positives or zero negatives get null woe and
    * contribute nothing (the standard convention; smoothing is the
    * caller's choice of binning).
    *
    * `binCol` is any categorical/bucketed column; `label` a boolean.
    */
  def woeIv(df: DataFrame, binCol: String, label: Column): DataFrame = {
    val stab = graft.functions.Stabilize.stab(_: Column, 6)
    val bins = df.groupBy(col(binCol))
      .agg(sum(when(label, 1L).otherwise(0L)).as("pos"),
        sum(when(label, 0L).otherwise(1L)).as("neg"))
    val tot = bins.agg(sum(col("pos")).as("__p"), sum(col("neg")).as("__q"))
    val woe = stab(log((col("pos") * col("__q")).cast("double") /
      (col("neg") * col("__p")).cast("double")))
    val withWoe = bins.crossJoin(broadcast(tot))
      .withColumn("woe", when(col("pos") > 0 && col("neg") > 0, woe))
      .withColumn("__term",
        when(col("woe").isNotNull,
          stab((col("pos").cast("double") / col("__p").cast("double") -
            col("neg").cast("double") / col("__q").cast("double")) *
            col("woe")).cast("decimal(24,12)"))
          .otherwise(lit(0).cast("decimal(24,12)")))
    val iv = withWoe.agg(sum(col("__term")).cast("double").as("iv_total"))
    withWoe.crossJoin(broadcast(iv))
      .select(col(binCol), col("pos"), col("neg"), col("woe"),
        col("iv_total"))
  }
}
