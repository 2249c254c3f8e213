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
  * The interpolation is Spark/NumPy type-7 at h = p·(n−1), k = ⌊h⌋,
  * written EXACTLY as the built-in `percentile` writes it —
  * (⌈h⌉−h)·v_k + (h−k)·v_{k+1}, with the k==h case returning v_k
  * directly — so results are bit-identical to the built-in aggregate
  * (the algebraically-equal v_k + (h−k)·(v_{k+1}−v_k) form differs in
  * the last ulp on some inputs), and existing oracles keep
  * hash-matching (after the same decimal stabilization the exact
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
      .select(interp("__vk", "__vk1", "__hh", "__kk").as(alias))
  }

  /** WEIGHTED lower quantiles (nearest-rank on cumulative weight): for
    * each requested fraction num/den, the smallest value v whose
    * cumulative weight reaches (num/den)·W. The token-budget form of a
    * percentile — "the document length below which half the TOKENS
    * (not documents) sit" — and the exactness-preserving one: weights
    * accumulate in DECIMAL and the threshold test is the
    * cross-multiplied integer comparison cum·den >= tot·num, so no
    * float boundary can flip a bucket between engines.
    *
    * Fractions are passed as (num, den) pairs precisely so p·W is
    * never computed in floating point.
    *
    * Same histogram scale shape as [[exactByHistogram]]: one
    * map-side-combining (value, Σweight) aggregate, then a
    * single-partition window over the BOUNDED-DISTINCT histogram.
    */
  def weightedLowerQuantiles(df: DataFrame, valueCol: String,
      weightCol: String,
      fracs: Seq[(Int, Int, String)]): DataFrame = {
    require(fracs.nonEmpty, "need at least one (num, den, alias)")
    fracs.foreach { case (num, den, _) =>
      require(num >= 0 && den > 0 && num <= den,
        s"fraction must satisfy 0 <= num/den <= 1, got $num/$den") }
    val hist = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("__v"))
      .agg(sum(col(weightCol).cast("decimal(38,6)")).as("__w"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist.withColumn("__cum", sum(col("__w")).over(w))
      .withColumn("__tot", last(col("__cum")).over(
        Window.orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
    val aggs = fracs.map { case (num, den, alias) =>
      min(when(col("__cum") * den >= col("__tot") * num, col("__v")))
        .as(alias)
    } :+ max(col("__tot")).cast("double").as("total_weight")
    ranked.agg(aggs.head, aggs.tail: _*)
  }

  /** Grouped [[weightedLowerQuantiles]] — per-source token-budget
    * quantiles in one pass. Identical exactness contract; the
    * cumulative window partitions BY GROUP over the (group, value)
    * histogram, so a hot group costs O(its distinct values) and
    * groups spread across tasks (the [[groupedExactByHistogram]]
    * scale shape).
    */
  def weightedLowerQuantilesByGroup(df: DataFrame, keyCols: Seq[String],
      valueCol: String, weightCol: String,
      fracs: Seq[(Int, Int, String)]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one group column")
    require(fracs.nonEmpty, "need at least one (num, den, alias)")
    fracs.foreach { case (num, den, _) =>
      require(num >= 0 && den > 0 && num <= den,
        s"fraction must satisfy 0 <= num/den <= 1, got $num/$den") }
    val ks = keyCols.map(col)
    val hist = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(ks :+ col(valueCol).cast("double").as("__v"): _*)
      .agg(sum(col(weightCol).cast("decimal(38,6)")).as("__w"))
    val wCum = Window.partitionBy(ks: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(ks: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = hist.withColumn("__cum", sum(col("__w")).over(wCum))
      .withColumn("__tot", last(col("__cum")).over(wAll))
    val aggs = fracs.map { case (num, den, alias) =>
      min(when(col("__cum") * den >= col("__tot") * num, col("__v")))
        .as(alias)
    } :+ max(col("__tot")).cast("double").as("total_weight")
    ranked.groupBy(ks: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The built-in `percentile`'s interpolation, verbatim: v_k when
    * h == k, else (⌈h⌉−h)·v_k + (h−k)·v_{k+1}. ⌈h⌉ is k+1 on that
    * branch, and v_{k+1} falls back to v_k at the top rank (p = 1.0
    * lands exactly on k, so the fallback is never interpolated with a
    * nonzero weight against a different value).
    */
  /** Mergeable HISTOGRAM CATALOG — the distributions face of the
    * catalog family (HLL distincts, KMV set operations, count-min
    * frequencies, and now exact value distributions): one (value,
    * count) histogram per day PERSISTED to `catalogDir` with dynamic
    * partition overwrite, so a new day rewrites only its own partition
    * and history is never re-scanned. Histograms merge by per-value
    * COUNT ADDITION — and unlike the sketch catalogs the merge is
    * EXACT, so "p99 over the quarter" is the true type-7 quantile of
    * the whole period, computed from days × distinct-values tiny rows
    * however many raw rows the period holds.
    *
    * Same bounded-distinct-domain contract as [[exactByHistogram]]
    * (pre-quantize a genuinely continuous column to a fixed grid
    * first); same dsScoped-directory contract as the other catalog
    * writers (dynamic overwrite preserves foreign partitions — the
    * r13 lesson, pinned by InfraSpec's cross-dataset idempotence
    * test, which this report makes loud by leading every row with
    * n_days from the catalog READ-BACK).
    *
    * Returns one row: (n_days, <one column per (p, alias)>, n), the
    * quantiles interpolated through the shared [[interp]] helper so
    * they are bit-identical to the built-in `percentile` aggregate
    * over the same merged distribution.
    */
  def histogramCatalog(df: DataFrame, dayCol: org.apache.spark.sql.Column,
                       valueCol: String, ps: Seq[(Double, String)],
                       catalogDir: String): DataFrame = {
    require(ps.nonEmpty, "need at least one (p, alias)")
    ps.foreach { case (p, _) =>
      require(p >= 0.0 && p <= 1.0, s"percentile p must be in [0,1], got $p") }
    val daily = df.filter(col(valueCol).isNotNull)
      .groupBy(dayCol.as("day"), col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    daily.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(catalogDir)
    // Empty first input → partition-less dir → read.parquet throws.
    // A never-written catalog is a valid state: no days, no rows, and
    // the quantiles of nothing are null (r14 advice).
    if (!CountMin.catalogHasDays(df, catalogDir))
      return df.sparkSession.range(1).select(
        lit(0L).as("n_days") +:
          ps.map { case (_, a) => lit(null).cast("double").as(a) } :+
          lit(0L).as("n"): _*)
    val catalog = df.sparkSession.read.parquet(catalogDir)
    val merged = catalog.groupBy(col("__v")).agg(sum(col("__c")).as("__c"))
    val nDays = catalog.agg(count_distinct(col("day")).as("n_days"))
    percentilesOverHistogram(merged, ps)
      .crossJoin(broadcast(nDays))
      .select(col("n_days") +: ps.map { case (_, a) => col(a) } :+ col("n"): _*)
  }

  /** Phase 2 of the histogram plan over an ALREADY-BUILT (__v, __c)
    * histogram: cumulative window over the bounded histogram, then one
    * 1-row aggregate interpolating each requested quantile (shared
    * [[interp]] form) plus `n` = Σ__c.
    */
  private def percentilesOverHistogram(hist: DataFrame,
      ps: Seq[(Double, String)]): DataFrame = {
    val wCum = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val withH = ps.zipWithIndex.foldLeft(ranked) { case (acc, ((p, _), i)) =>
      acc.withColumn(s"__h$i",
        lit(p) * (col("__n") - lit(1)).cast("double"))
    }
    def covers(rank: org.apache.spark.sql.Column) =
      col("__cum") - col("__c") <= rank && rank < col("__cum")
    val aggs = ps.indices.flatMap { i =>
      val k = floor(col(s"__h$i")).cast("long")
      Seq(
        max(when(covers(k), col("__v"))).as(s"__vk$i"),
        max(when(covers(k + 1), col("__v"))).as(s"__vk1$i"),
        max(col(s"__h$i")).as(s"__hh$i"),
        max(k).as(s"__kk$i"))
    } :+ max(col("__n")).as("n")
    val out = withH.agg(aggs.head, aggs.tail: _*)
    val quantiles = ps.zipWithIndex.map { case ((_, alias), i) =>
      interp(s"__vk$i", s"__vk1$i", s"__hh$i", s"__kk$i").as(alias)
    }
    out.select(quantiles :+ col("n"): _*)
  }

  private def interp(vk: String, vk1: String, hh: String,
      kk: String): org.apache.spark.sql.Column = {
    val kD = col(kk).cast("double")
    when(col(hh) === kD, col(vk)).otherwise(
      ((col(kk) + 1).cast("double") - col(hh)) * col(vk)
        + (col(hh) - kD) * coalesce(col(vk1), col(vk)))
  }

  /** Grouped variant — the scale path for per-group exact percentiles.
    *
    * The array-percentile form (q_agg_percentiles) buffers and sorts
    * each group's raw values in ONE aggregation buffer, so a
    * pathologically hot group (one l_returnflag holding most of 100 TB)
    * recreates the global operator's single-task ceiling. Here phase 1
    * shuffles a (group, value) histogram with map-side combine, and
    * phase 2's windows partition BY GROUP over that histogram — the
    * hot group costs O(its distinct values), never O(its rows), and
    * groups spread across tasks.
    *
    * Output: one row per group with one exact type-7 quantile column
    * per `(p, alias)` plus `n` = the group's non-null value count
    * (callers whose value column is non-null can alias it as the
    * group's row count). Interpolation goes through the shared
    * [[interp]] helper — the built-in `percentile` aggregate's verbatim
    * `(⌈h⌉ − h)·v_k + (h − k)·v_{k+1}` form, NOT the algebraically equal
    * `v_k + (h − k)·(v_{k+1} − v_k)`, which can differ in the last ulp —
    * so results are bit-identical to the built-in and to the global
    * [[exactByHistogram]]. Same bounded-distinct-domain contract as
    * [[exactByHistogram]].
    */
  def groupedExactByHistogram(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[(Double, String)]): DataFrame = {
    require(ps.nonEmpty, "need at least one (p, alias)")
    ps.foreach { case (p, _) =>
      require(p >= 0.0 && p <= 1.0, s"percentile p must be in [0,1], got $p") }
    val g = groupCols.map(col)
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol).cast("double").as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val withH = ps.zipWithIndex.foldLeft(ranked) { case (acc, ((p, _), i)) =>
      acc.withColumn(s"__h$i",
        lit(p) * (col("__n") - lit(1)).cast("double"))
    }
    def covers(rank: org.apache.spark.sql.Column) =
      col("__cum") - col("__c") <= rank && rank < col("__cum")
    val aggs = ps.indices.flatMap { i =>
      val k = floor(col(s"__h$i")).cast("long")
      Seq(
        max(when(covers(k), col("__v"))).as(s"__vk$i"),
        max(when(covers(k + 1), col("__v"))).as(s"__vk1$i"),
        max(col(s"__h$i")).as(s"__hh$i"),
        max(k).as(s"__kk$i"))
    } :+ max(col("__n")).as("n")
    val out = withH.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    val quantiles = ps.zipWithIndex.map { case ((_, alias), i) =>
      interp(s"__vk$i", s"__vk1$i", s"__hh$i", s"__kk$i").as(alias)
    }
    out.select(g ++ quantiles :+ col("n"): _*)
  }
}
