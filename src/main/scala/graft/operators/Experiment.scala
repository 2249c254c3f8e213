package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation analysis: Welch's unequal-variance t-test and CUPED
  * variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013) — the two
  * statistics an A/B-testing platform computes over unit-level
  * metrics at fleet scale.
  *
  * Scale shape (100 TB of events): metrics are first collapsed to one
  * row per UNIT (user) by an ordinary partial-aggregated groupBy, then
  * every statistic here is ONE more aggregation pass producing exact
  * DECIMAL moments (Σy, Σy², Σxy, … — order-independent, so partial
  * aggregation cannot move them), followed by a fixed scalar formula
  * tree on the driver-free 1-row frame. No windows, no second scan.
  *
  * Exactness: the moment sums are exact decimals; both engines cast
  * the SAME exact values to double and evaluate the IDENTICAL formula
  * tree (each step one correctly-rounded IEEE op), with a final 1e-6
  * stabilization absorbing any last-ulp engine variance — the
  * groupwise-zscore discipline.
  */
object Experiment {

  private def stab(c: Column) = graft.functions.Stabilize.stab(c, 6)

  /** Welch's t over a unit-level frame: `treat` marks the treatment
    * unit, `y` is the (exact DECIMAL) unit metric. One aggregation
    * pass via conditional sums; output one row
    * `(n_a, n_b, mean_a, mean_b, t_stat, df)` with Welch-Satterthwaite
    * degrees of freedom (a/b = control/treatment). Null t when either
    * arm has fewer than 2 units or zero pooled variance.
    */
  def welchTTest(df: DataFrame, treat: Column, y: Column): DataFrame = {
    val a = !treat
    val moments = df.agg(
      count(when(a, 1)).as("__na"),
      sum(when(a, y)).as("__sa"),
      sum(when(a, y * y)).as("__qa"),
      count(when(treat, 1)).as("__nb"),
      sum(when(treat, y)).as("__sb"),
      sum(when(treat, y * y)).as("__qb"))
    def d(c: String) = col(c).cast("double")
    val (na, nb) = (d("__na"), d("__nb"))
    val (sa, sb) = (d("__sa"), d("__sb"))
    val (qa, qb) = (d("__qa"), d("__qb"))
    val va = (qa - sa * sa / na) / (na - 1)
    val vb = (qb - sb * sb / nb) / (nb - 1)
    val se2 = va / na + vb / nb
    moments.select(
      col("__na").as("n_a"), col("__nb").as("n_b"),
      (sa / na).as("mean_a"), (sb / nb).as("mean_b"),
      when(na > 1 && nb > 1 && se2 > 0,
        stab((sb / nb - sa / na) / sqrt(se2))).as("t_stat"),
      when(na > 1 && nb > 1 && se2 > 0,
        stab((se2 * se2) / ((va / na) * (va / na) / (na - 1)
          + (vb / nb) * (vb / nb) / (nb - 1)))).as("df"))
  }

  /** Difference-in-differences over unit-level (pre, post) metric
    * pairs: the treatment-effect estimate when assignment isn't
    * randomized — `DiD = (post_t − pre_t) − (post_c − pre_c)`,
    * computed as the mean per-unit DELTA difference between arms
    * (the two-period panel form), with Welch's unequal-variance SE
    * over the per-unit deltas. One exact decimal moment pass on
    * δ = post − pre per arm; the same conditional-aggregation shape
    * as [[welchTTest]].
    *
    * Output one row: `(n_c, n_t, delta_c, delta_t, did, se)` — se
    * null when either arm has < 2 units.
    */
  def diffInDiff(df: DataFrame, treat: Column, pre: Column,
                 post: Column): DataFrame = {
    val delta = post - pre
    val c = !treat
    val moments = df.agg(
      count(when(c, 1)).as("__nc"),
      sum(when(c, delta)).as("__sc"),
      sum(when(c, delta * delta)).as("__qc"),
      count(when(treat, 1)).as("__nt"),
      sum(when(treat, delta)).as("__st"),
      sum(when(treat, delta * delta)).as("__qt"))
    def d(s: String) = col(s).cast("double")
    val (nc, nt) = (d("__nc"), d("__nt"))
    val (sc, st) = (d("__sc"), d("__st"))
    val vc = (d("__qc") - sc * sc / nc) / (nc - 1)
    val vt = (d("__qt") - st * st / nt) / (nt - 1)
    moments.select(
      col("__nc").as("n_c"), col("__nt").as("n_t"),
      (sc / nc).as("delta_c"), (st / nt).as("delta_t"),
      stab(st / nt - sc / nc).as("did"),
      when(nc > 1 && nt > 1,
        stab(sqrt(vc / nc + vt / nt))).as("se"))
  }

  /** z-quantiles for the standard 5% two-sided test at 80% power —
    * correctly rounded literals shared with the SQL mirror (the
    * poisson1Cdf discipline).
    */
  val zAlphaHalf = 1.9599639845400545
  val zPower = 0.8416212335729143

  /** Minimum detectable effect at the current sample: per variant arm
    * the pooled two-sample MDE `(z_{α/2} + z_β)·√(2σ̂²/n)` where σ̂² is
    * the standard POOLED WITHIN-ARM variance
    * `((n_a−1)·v_a + (n_b−1)·v_b)/(n_a+n_b−2)` and n the per-arm unit
    * count — the pre-experiment sizing readout every A/B platform
    * surfaces. Within-arm matters: the grand variance over both arms
    * combined would include the between-arm mean gap and inflate the
    * MDE precisely when a real effect is present. One exact decimal
    * moment pass; `mde_rel` is MDE over the pooled mean. Variance/MDE
    * columns are null unless BOTH arms have ≥ 2 units.
    */
  def minDetectableEffect(df: DataFrame, treat: Column,
                          y: Column): DataFrame = {
    val a = !treat
    val moments = df.agg(
      count(when(a, 1)).as("__na"),
      sum(when(a, y)).as("__sa"),
      sum(when(a, y * y)).as("__qa"),
      count(when(treat, 1)).as("__nb"),
      sum(when(treat, y)).as("__sb"),
      sum(when(treat, y * y)).as("__qb"))
    def d(s: String) = col(s).cast("double")
    val (na, nb) = (d("__na"), d("__nb"))
    val (sa, sb) = (d("__sa"), d("__sb"))
    val n = na + nb
    val mean = (sa + sb) / n
    // pooled WITHIN-arm variance: each arm's centered sum of squares
    // (Σy² − (Σy)²/n), summed, over n_a + n_b − 2
    val v = ((d("__qa") - sa * sa / na)
      + (d("__qb") - sb * sb / nb)) / (n - 2)
    val nArm = least(na, nb)
    val mde = lit(zAlphaHalf + zPower) * sqrt(lit(2.0) * v / nArm)
    val ok = na > 1 && nb > 1
    moments.select(
      col("__na").as("n_a"), col("__nb").as("n_b"),
      stab(mean).as("pooled_mean"),
      when(ok, stab(v)).as("pooled_var"),
      when(ok, stab(mde)).as("mde_abs"),
      when(ok && mean =!= 0,
        stab(mde / mean)).as("mde_rel"))
  }

  /** Delta-method variance for a RATIO metric (Deng et al., "Applying
    * the Delta Method in Metric Analytics", KDD 2018): per-user
    * numerator/denominator pairs (clicks/sessions, revenue/orders)
    * make the user-level ratio X̄/Ȳ a ratio of MEANS, whose variance
    * the naive per-row formula understates. The first-order expansion
    * gives `var(X̄/Ȳ) ≈ (v_x/ȳ² − 2·x̄·cov/ȳ³ + x̄²·v_y/ȳ⁴)/n`.
    * One exact decimal moment pass (n, Σx, Σy, Σxy, Σx², Σy²) →
    * identical IEEE formula trees, 1e-9 stabilized (ratio variances
    * are small — the finer grid keeps sf-scale signal).
    *
    * Output one row: `(n_units, ratio, se_naive, se_delta)` where
    * se_naive treats per-unit ratios x_i/y_i as iid (the common
    * mistake — units with y_i = 0 silently drop) and se_delta is the
    * correct standard error. Null ratio when Σy = 0.
    */
  def ratioDelta(df: DataFrame, x: Column, y: Column): DataFrame = {
    val stab9 = (c: Column) => graft.functions.Stabilize.stab(c, 9)
    val perUnit = x.cast("double") / y.cast("double")
    val moments = df.agg(
      count(lit(1)).as("__n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * y).as("__sxy"), sum(x * x).as("__sxx"),
      sum(y * y).as("__syy"),
      count(when(y =!= 0, 1)).as("__nr"),
      sum(when(y =!= 0, stab9(perUnit).cast("decimal(24,12)")))
        .as("__sr"),
      sum(when(y =!= 0,
        stab9(perUnit * perUnit).cast("decimal(24,12)"))).as("__srr"))
    def d(c: String) = col(c).cast("double")
    val n = d("__n")
    val (mx, my) = (d("__sx") / n, d("__sy") / n)
    val cov = (d("__sxy") - d("__sx") * d("__sy") / n) / (n - 1)
    val vx = (d("__sxx") - d("__sx") * d("__sx") / n) / (n - 1)
    val vy = (d("__syy") - d("__sy") * d("__sy") / n) / (n - 1)
    val varDelta = (vx / (my * my) - lit(2.0) * mx * cov / (my * my * my)
      + mx * mx * vy / (my * my * my * my)) / n
    val nr = d("__nr")
    val vNaive = (d("__srr") - d("__sr") * d("__sr") / nr) / (nr - 1)
    moments.select(
      col("__n").as("n_units"),
      when(d("__sy") =!= 0, stab9(mx / my)).as("ratio"),
      when(nr > 1, stab9(sqrt(vNaive / nr))).as("se_naive"),
      when(d("__sy") =!= 0 && n > 1,
        stab9(sqrt(varDelta))).as("se_delta"))
  }

  /** CUPED report over a unit-level frame with pre-experiment
    * covariate `x` and in-experiment metric `y` (both exact DECIMAL):
    * θ = cov(x,y)/var(x), and the adjusted-metric variance via the
    * closed form var(y − θx) = var(y) − cov²/var(x) — so ONE moment
    * pass yields θ, the variance before/after, and the reduction
    * ratio cov²/(var_x·var_y) = ρ² (the paper's headline number).
    * Null θ when var(x) = 0 (no pre-period signal to exploit).
    */
  def cuped(df: DataFrame, x: Column, y: Column): DataFrame = {
    val moments = df.agg(
      count(lit(1)).as("__n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * y).as("__sxy"), sum(x * x).as("__sxx"),
      sum(y * y).as("__syy"))
    def d(c: String) = col(c).cast("double")
    val n = d("__n")
    val cov = (d("__sxy") - d("__sx") * d("__sy") / n) / (n - 1)
    val vx = (d("__sxx") - d("__sx") * d("__sx") / n) / (n - 1)
    val vy = (d("__syy") - d("__sy") * d("__sy") / n) / (n - 1)
    moments.select(
      col("__n").as("n_units"),
      when(vx > 0, stab(cov / vx)).as("theta"),
      stab(vy).as("var_y"),
      when(vx > 0, stab(vy - cov * cov / vx)).as("var_y_adj"),
      when(vx > 0 && vy > 0,
        stab(cov * cov / (vx * vy))).as("var_reduction"))
  }
}
