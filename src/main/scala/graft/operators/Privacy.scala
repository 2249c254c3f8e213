package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators: k-anonymity suppression and
  * l-diversity auditing (Sweeney 2002; Machanavajjhala et al. 2007 —
  * both public papers). A training-data pipeline that exports user-
  * derived tables needs a release gate over quasi-identifier
  * combinations; these are the two standard ones, built as ordinary
  * aggregate-then-join plans so they scale like any groupBy.
  *
  * Scale shape (100 TB): the equivalence-class census is ONE
  * partial-aggregated `groupBy(quasi*)` — map-side combine shrinks it
  * to O(distinct QI combos) before the shuffle — and the row-level
  * suppression joins that census back on the same keys, so the two
  * shuffles share a partitioning (Catalyst reuses the exchange). No
  * windows (a window over the QI tuple would serialize hot classes:
  * the all-null QI combo is routinely a large fraction of real data),
  * no driver-side state.
  */
object Privacy {

  /** k-anonymity suppression: rows whose quasi-identifier equivalence
    * class holds fewer than `k` rows get ALL quasi-identifier columns
    * nulled (cell suppression — the release-safe default action), plus
    * a `suppressed` flag and the class size `k_size` for auditing.
    * Non-QI columns pass through untouched.
    *
    * Null QI values group as ordinary values (standard: null is itself
    * an identifying state when rare).
    */
  def kAnonymitySuppress(df: DataFrame, quasiCols: Seq[String],
                         k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    val census = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("k_size"))
    suppressWithCensus(df, quasiCols, census, k)
  }

  /** Suppression against a PROVIDED census — the seam the streaming
    * release gate uses (its census is cumulative across micro-batches,
    * not derived from the current frame). `census` must carry the
    * quasi-identifier columns plus `k_size`; classes absent from the
    * census count as size 0 (suppressed).
    */
  def suppressWithCensus(df: DataFrame, quasiCols: Seq[String],
                         census: DataFrame, k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    // Null-safe join keys: a null QI value is an equivalence class of
    // its own, and a plain equi-join would never match it back to its
    // census row (leaving k_size null and the row unsuppressed — the
    // exact rows most in need of suppression). <=> still extracts as
    // an equi-join key, so this stays a hash join, not a cross.
    val censusR = quasiCols.foldLeft(
        census.select((quasiCols.map(col) :+ col("k_size")): _*)) {
      (a, c) => a.withColumnRenamed(c, s"__q_$c")
    }
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c"))
      .reduce(_ && _)
    val joined = df.join(censusR, cond, "left")
      .drop(quasiCols.map(c => s"__q_$c"): _*)
      .withColumn("k_size", coalesce(col("k_size"), lit(0L)))
    val unsafe: Column = col("k_size") < k
    val out = quasiCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, when(unsafe, lit(null)).otherwise(col(c)))
    }
    out.withColumn("suppressed", unsafe)
  }

  /** Distinct-l-diversity audit: one row per quasi-identifier
    * equivalence class with its size, the number of DISTINCT sensitive
    * values it contains, and whether it meets the bar — a class where
    * every member shares one sensitive value re-identifies the
    * attribute even when k-anonymous (the homogeneity attack). One
    * aggregation pass; `count_distinct` partial-aggregates on
    * (QI, sensitive) first, so no class materializes its member list.
    */
  def lDiversityReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("k_size"),
        count_distinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("diverse", col("l_distinct") >= l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007 — the
    * third member of the release-gate family): per equivalence class,
    * the TOTAL VARIATION distance between the class's sensitive-value
    * distribution and the corpus-global one. A diverse class whose
    * distribution still skews hard toward one value (say 90% one
    * nation vs 4% globally) leaks probabilistic information that
    * l-diversity's distinct-count misses.
    *
    * Exactness: with class cells c_i (class size n), global counts g_i
    * (total N), TVD = Σ_i |c_i/n − g_i/N| / 2. Over the common
    * denominator this is `(Σ_present |c_i·N − g_i·n| + (n·N −
    * Σ_present g_i·n)) / (2·n·N)` — the second term is the mass of
    * sensitive values ABSENT from the class (Σ_all g_i·n = n·N), so no
    * class×domain cross join is ever built. All sums are exact
    * DECIMAL(38,0) integers; the single IEEE division at the end is
    * bit-equal cross-engine.
    *
    * Scale shape (100 TB): one partial-aggregated groupBy(QI,
    * sensitive) collapses the corpus to cells; the global distribution
    * (O(|sensitive domain|) rows) broadcasts onto them; class sizes
    * come from a window over the CELLS frame partitioned by QI —
    * bounded at |sensitive domain| rows per partition by construction,
    * so the hot-class hazard that bans row-level QI windows (see
    * object scaladoc) does not apply; the report is one more tiny
    * groupBy. No shuffle ever carries more than the cell frame.
    */
  def tClosenessReport(df: DataFrame, quasiCols: Seq[String],
                       sensitiveCol: String, t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(t > 0 && t <= 1, s"t must be in (0, 1], got $t")
    import org.apache.spark.sql.expressions.Window
    def dec(c: Column) = c.cast("decimal(38,0)")
    // global distribution and grand total derive from the cell frame,
    // not from re-scanning the corpus: ONE pass over the data total
    val cells = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val global = cells.groupBy(col(sensitiveCol).as("__sv"))
      .agg(sum(col("__c")).as("__g"))
      .crossJoin(cells.agg(sum(col("__c")).as("__tot")))
    // null-safe: a null sensitive value is a category of its own on
    // both sides, and <=> still extracts as a hash-join key
    val joined = cells.join(broadcast(global),
      col(sensitiveCol) <=> col("__sv"))
    val wc = Window.partitionBy(quasiCols.map(col): _*)
    joined
      .withColumn("__n", sum(col("__c")).over(wc))
      .groupBy(quasiCols.map(col): _*)
      .agg(max(col("__n")).as("k_size"),
        sum(abs(dec(col("__c")) * dec(col("__tot"))
          - dec(col("__g")) * dec(col("__n")))).as("__present"),
        sum(dec(col("__g")) * dec(col("__n"))).as("__present_gn"),
        max(dec(col("__n")) * dec(col("__tot"))).as("__nN"))
      .select((quasiCols.map(col) :+ col("k_size") :+
        ((col("__present") + (col("__nN") - col("__present_gn")))
          .cast("double") /
          (lit(2).cast("decimal(38,0)") * col("__nN")).cast("double"))
          .as("tvd")): _*)
      .withColumn("t_close", col("tvd") <= t)
  }

  /** ε-differentially-private group counts (Dwork et al. 2006) with
    * SEEDED Laplace noise: each group's count is released as
    * `n + Lap(1/ε)`, where the Laplace draw comes from a uniform
    * derived deterministically from `md5(salt || group key)` — so the
    * release is reproducible (and oracle-checkable in any engine that
    * has md5) while still being a genuine per-group Laplace mechanism
    * for a one-shot release of a count query with sensitivity 1.
    *
    * The uniform is `u = ((h mod 2^52) + 0.5) / 2^52 ∈ (0,1)` — the
    * numerator is an exact double (2k+1 < 2^53) and the divisor a
    * power of two, so u is bit-identical cross-engine; the inverse-CDF
    * transform `−(1/ε)·sgn(u−1/2)·ln(1−2|u−1/2|)` involves one `ln`,
    * whose last-ulp engine variance the 1e-6 stabilization absorbs.
    * u = 1/2 exactly is impossible (k + 1/2 is never 2^51), so the
    * transform never evaluates ln(0).
    *
    * Output: one row per group `(keys*, n, noisy_n)` — an AUDIT view;
    * a real release projects `(keys*, noisy_n)` only. Scale: one
    * partial-aggregated groupBy, then map-only noise.
    */
  def dpLaplaceCounts(df: DataFrame, keyCols: Seq[String],
                      epsilon: Double, salt: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one group key")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val twoPow52 = 4503599627370496L // 2^52
    val keyStr = concat_ws("|",
      lit(salt) +: keyCols.map(c => col(c).cast("string")): _*)
    val h = graft.functions.HashFns.md5Long(keyStr)
    val u = ((h % twoPow52).cast("double") + 0.5) / twoPow52.toDouble
    val noise = lit(-1.0 / epsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy_n",
        col("n") + graft.functions.Stabilize.stab(noise, 6))
  }

  /** DuckDB SQL fragment mirroring [[dpLaplaceCounts]]'s noise term for
    * a single key expression — kept adjacent so the sides can't drift.
    * `keyExpr` must evaluate to VARCHAR.
    */
  def dpNoiseSql(keyExpr: String, epsilon: Double, salt: String): String = {
    val h = graft.functions.HashFns.md5LongSql(s"'$salt|' || $keyExpr")
    val u = s"((CAST(($h) % 4503599627370496 AS DOUBLE) + 0.5)" +
      " / 4503599627370496.0)"
    graft.functions.Stabilize.stabSql(
      s"(-1.0 / $epsilon) * sign($u - 0.5) * ln(1.0 - 2.0 * abs($u - 0.5))",
      6)
  }
}
