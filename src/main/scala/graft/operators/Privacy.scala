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
}
