package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots — the
  * monitoring gate a training-data pipeline runs before admitting a new
  * crawl batch ("did document length / quality / language mix shift?").
  *
  * Pearson's χ² over equi-depth bins of the REFERENCE snapshot:
  * boundaries are exact order statistics of the reference, both
  * snapshots assign by counting boundaries below their value, and the
  * statistic is Σ (cur_i − e_i)² / e_i with e_i = ref_i · curTotal /
  * refTotal.
  *
  * Scale shape: each snapshot is scanned ONCE, into its value
  * histogram; totals, boundaries, bin assignment, and bin counts all
  * derive from the cached histograms (O(grid) rows), so the corpus
  * cost is exactly two passes however many downstream consumers the
  * report has. The cumulative window runs over the HISTOGRAM (the
  * same bounded-domain contract as operators/Percentiles), and bin
  * assignment weights each distinct value by its count instead of
  * re-touching rows.
  *
  * χ² is used instead of PSI/KL deliberately: it needs NO logarithm —
  * every term is integer-derived IEEE arithmetic (one multiply, one
  * divide, one squared difference per bin), and the cross-bin total
  * folds in bin order, so the whole report is bit-reproducible across
  * engines. A bin with no reference mass (possible when a duplicated
  * boundary value absorbs the tail) contributes `cur_i` by the
  * standard unexpected-mass convention, guarding the zero division.
  *
  * `valueCol` must satisfy the bounded-domain histogram contract
  * (integer-ish grids: lengths, counts, quantized scores).
  */
object Drift {

  /** Builds the (gv, c) value histogram a snapshot contributes — the
    * persisted artifact a monitoring pipeline keeps per snapshot so
    * later gates never re-scan the corpus.
    */
  def valueHistogram(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.filter(v.isNotNull)
      .groupBy(v.cast("long").as("gv")).agg(count(lit(1)).as("c"))
  }

  /** One row per occupied bin: `bin`, `ref_n`, `cur_n`, `expected`,
    * `contrib`, plus the constant `chisq` total (folded in bin order).
    */
  def chiSquared(ref: DataFrame, cur: DataFrame, valueCol: String,
                 bins: Int): DataFrame =
    // one corpus pass per side; every consumer inside reads the cache
    // (Verify/Bench clearCache() between queries)
    chiSquaredFromHists(valueHistogram(ref, valueCol).cache(),
      valueHistogram(cur, valueCol).cache(), bins)

  /** [[chiSquared]] from pre-built `(gv, c)` histograms (e.g. a
    * persisted reference snapshot vs a streaming micro-batch). The
    * hists are consumed several times — callers holding anything
    * expensive should cache them first.
    */
  def chiSquaredFromHists(refHist: DataFrame, curHist: DataFrame,
                          bins: Int): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")

    val cum = refHist.withColumn("cum", sum(col("c")).over(
      Window.orderBy(col("gv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = refHist.agg(sum(col("c")).as("n"))
    val ranks = n.select(explode(sequence(lit(1), lit(bins - 1))).as("i"),
        col("n"))
      .withColumn("rank", expr(s"(i * n + ${bins - 1}) div $bins"))
    val bnds = cum.crossJoin(broadcast(ranks))
      .filter(col("cum") >= col("rank"))
      .groupBy(col("i")).agg(min(col("gv")).as("b"))
      .agg(sort_array(collect_list(col("b"))).as("bnds"))

    // bin assignment over the HISTOGRAM, weighted by each value's count
    def binned(h: DataFrame): DataFrame =
      h.crossJoin(broadcast(bnds))
        .select(size(filter(col("bnds"), b => b < col("gv")))
          .cast("long").as("bin"), col("c"))
        .groupBy(col("bin")).agg(sum(col("c")).as("n"))

    val refB = binned(refHist).withColumnRenamed("n", "ref_n")
    val curB = binned(curHist).withColumnRenamed("n", "cur_n")
    val tot = refHist.agg(sum(col("c")).as("ref_total"))
      .crossJoin(curHist.agg(sum(col("c")).as("cur_total")))
    val per = refB.join(curB, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
      .crossJoin(broadcast(tot))
      .withColumn("expected",
        col("ref_n").cast("double") * col("cur_total").cast("double")
          / col("ref_total").cast("double"))
      .withColumn("contrib", when(col("ref_n") === 0,
          col("cur_n").cast("double"))
        .otherwise(
          (col("cur_n").cast("double") - col("expected")) *
            (col("cur_n").cast("double") - col("expected")) /
            col("expected")))
      .select(col("bin"), col("ref_n"), col("cur_n"), col("expected"),
        col("contrib"))
    val total = per.agg(aggregate(
      transform(array_sort(collect_list(struct(col("bin"),
        col("contrib").as("__c")))), x => x.getField("__c")),
      lit(0.0), (a, x) => a + x).as("chisq"))
    per.crossJoin(broadcast(total)).orderBy(col("bin"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between the snapshots'
    * value distributions — the nonparametric sibling of the binned
    * gates: no bins, no smoothing, sensitive to ANY ECDF divergence
    * (shape shifts the equi-depth χ²/PSI can wash out).
    *
    * Every comparison is INTEGER: with cumulative counts R(v), C(v)
    * and totals rt/ct, D = max_v |R(v)·ct − C(v)·rt| / (rt·ct) — the
    * max runs over exact cross-multiplied integers (DECIMAL(38,0)
    * internally, so petabyte-scale count products cannot overflow) and
    * only the final report division produces doubles (correctly
    * rounded from the same exact integers on any engine).
    *
    * Output is ONE row: `at_value` (the largest value attaining the
    * max — deterministic tiebreak), `ref_total`, `cur_total`, `d_num`
    * (the integer numerator, BIGINT in the report), `d`.
    *
    * Scale shape: one histogram pass per snapshot (the same persisted
    * (gv, c) artifact the other gates consume), a full-outer merge of
    * the two O(distinct) histograms, and a cumulative window over the
    * HISTOGRAM — the bounded-domain contract of operators/Percentiles:
    * the single-partition window touches O(distinct values) rows,
    * never the corpus.
    */
  def ks(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame =
    ksFromHists(valueHistogram(ref, valueCol), valueHistogram(cur, valueCol))

  /** [[ks]] from pre-built `(gv, c)` histograms. */
  def ksFromHists(refHist: DataFrame, curHist: DataFrame): DataFrame = {
    val h = refHist.withColumnRenamed("c", "rn")
      .join(curHist.withColumnRenamed("c", "cn"), Seq("gv"), "full_outer")
      .select(col("gv"),
        coalesce(col("rn"), lit(0L)).as("rn"),
        coalesce(col("cn"), lit(0L)).as("cn"))
      // O(distinct) rows; lineage feeds both the totals aggregate and
      // the cumulative window below
      .cache()
    val w = Window.orderBy(col("gv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.select(col("gv"),
      sum(col("rn")).over(w).cast("decimal(38,0)").as("rc"),
      sum(col("cn")).over(w).cast("decimal(38,0)").as("cc"))
    val tot = h.agg(sum(col("rn")).as("ref_total"),
      sum(col("cn")).as("cur_total"))
    cum.crossJoin(broadcast(tot))
      .select(col("gv"), col("ref_total"), col("cur_total"),
        abs(col("rc") * col("cur_total").cast("decimal(38,0)")
          - col("cc") * col("ref_total").cast("decimal(38,0)")).as("diff"))
      .orderBy(col("diff").desc, col("gv").desc).limit(1)
      .select(col("gv").as("at_value"), col("ref_total"), col("cur_total"),
        col("diff").cast("long").as("d_num"),
        (col("diff").cast("double") /
          (col("ref_total").cast("double") * col("cur_total").cast("double")))
          .as("d"))
  }

  /** Two-sample Mann–Whitney U (Wilcoxon rank-sum) between the
    * snapshots' value distributions — the LOCATION-shift member of the
    * drift family: KS asks "did the shape change anywhere", U asks
    * "did one side stochastically dominate" (robust to outliers where
    * a mean-shift t-test is not).
    *
    * Rank arithmetic runs over the value HISTOGRAM, never per row: for
    * a value with rn + cn = t occurrences after m earlier occurrences,
    * the tie-averaged rank is m + (t+1)/2, so TWICE the rank-sum of
    * the reference side is Σ rn·(2m + t + 1) — all integers. U follows
    * as 2·U_ref = 2·R_ref − rt·(rt+1), kept in DECIMAL(38,0) so
    * petabyte-scale rank sums (≈N²) cannot overflow; the tie-correction
    * Σ(t³−t) likewise. Only the final report row produces doubles: the
    * halvings are exact, the normal-approximation z goes through the
    * 6-decimal stabilizer, and every other division is a single
    * correctly-rounded op on identical operands.
    *
    * Scale shape: one histogram pass per snapshot, a full-outer merge
    * of the O(distinct) histograms, one cumulative window over the
    * HISTOGRAM (the bounded-domain contract of operators/Percentiles),
    * and a one-row aggregate. The corpus is never ranked row-by-row —
    * the classic sort-and-rank formulation is a global sort this
    * derivation deletes.
    */
  def mannWhitney(ref: DataFrame, cur: DataFrame,
                  valueCol: String): DataFrame =
    mannWhitneyFromHists(valueHistogram(ref, valueCol),
      valueHistogram(cur, valueCol))

  /** [[mannWhitney]] from pre-built `(gv, c)` histograms. */
  def mannWhitneyFromHists(refHist: DataFrame,
                           curHist: DataFrame): DataFrame = {
    val h = refHist.withColumnRenamed("c", "rn")
      .join(curHist.withColumnRenamed("c", "cn"), Seq("gv"), "full_outer")
      .select(col("gv"),
        coalesce(col("rn"), lit(0L)).as("rn"),
        coalesce(col("cn"), lit(0L)).as("cn"))
      .cache() // O(distinct) rows; feeds the window AND the totals
    val w = Window.orderBy(col("gv"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = (col("rn") + col("cn")).cast("decimal(38,0)")
    val mBefore = coalesce(sum(col("rn") + col("cn")).over(w), lit(0L))
      .cast("decimal(38,0)")
    val terms = h.select(
      (col("rn").cast("decimal(38,0)") * (mBefore * 2 + t + 1)).as("rr2"),
      (t * t * t - t).as("tt"))
    val sums = terms.agg(sum(col("rr2")).as("r1x2"),
      sum(col("tt")).as("tie_sum"))
    val tot = h.agg(sum(col("rn")).cast("decimal(38,0)").as("rt"),
      sum(col("cn")).cast("decimal(38,0)").as("ct"))
    val rtd = col("rt").cast("double")
    val ctd = col("ct").cast("double")
    val nd = rtd + ctd
    val u1x2 = col("r1x2") - col("rt") * (col("rt") + 1)
    val uRefD = u1x2.cast("double") / 2
    val uCurD = (col("rt") * col("ct") * 2 - u1x2).cast("double") / 2
    val mu = rtd * ctd / 2
    val sig2 = rtd * ctd / 12 *
      ((nd + 1) - col("tie_sum").cast("double") / (nd * (nd - 1)))
    sums.crossJoin(tot).select(
      col("rt").cast("long").as("ref_total"),
      col("ct").cast("long").as("cur_total"),
      uRefD.as("u_ref"), uCurD.as("u_cur"),
      col("tie_sum").cast("double").as("tie_sum"),
      graft.functions.Stabilize.stab((uRefD - mu) / sqrt(sig2), 6).as("z"),
      graft.functions.Stabilize.stab(uRefD / (rtd * ctd), 6)
        .as("r_effect"))
  }

  /** Population stability index over the SAME equi-depth bins —
    * computed from [[chiSquaredFromHists]]'s report frame, so one bin
    * construction feeds both gates. psi = Σ (p_i − q_i)·ln(p_i/q_i)
    * with add-half (Laplace) smoothing on both proportions, which
    * keeps empty bins finite and every operand an exact half-integer
    * ratio. The industry alert grid (<0.1 stable, 0.1–0.25 shifting,
    * >0.25 drifted) is about the TOTAL, so each bin term is 6-decimal
    * stabilized BEFORE the bin-ordered fold — the cross-engine sum
    * then adds identical doubles and needs no stabilizer of its own.
    * Output: bin, ref_n, cur_n, term, psi (constant).
    */
  def psiFromReport(report: DataFrame): DataFrame = {
    // cached: O(bins) rows, but its lineage is the entire bin
    // pipeline — the totals aggregate, the term projection, and the
    // ordered fold would each replay it otherwise
    val binCounts = report
      .select(col("bin"), col("ref_n"), col("cur_n")).cache()
    val tot = binCounts.agg(
      sum(col("ref_n")).cast("double").as("__rt"),
      sum(col("cur_n")).cast("double").as("__ct"),
      count(lit(1)).cast("double").as("__k"))
    val p = (col("ref_n").cast("double") + lit(0.5)) /
      (col("__rt") + lit(0.5) * col("__k"))
    val q = (col("cur_n").cast("double") + lit(0.5)) /
      (col("__ct") + lit(0.5) * col("__k"))
    val terms = binCounts.crossJoin(broadcast(tot))
      .withColumn("term",
        graft.functions.Stabilize.stab((p - q) * log(p / q), 6))
    val total = terms.agg(aggregate(
      transform(array_sort(collect_list(struct(col("bin"),
        col("term").as("__t")))), x => x.getField("__t")),
      lit(0.0), (a, x) => a + x).as("psi"))
    terms.select(col("bin"), col("ref_n"), col("cur_n"), col("term"))
      .crossJoin(broadcast(total)).orderBy(col("bin"))
  }
}
