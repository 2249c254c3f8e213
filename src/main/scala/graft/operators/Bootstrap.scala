package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashFns

/** One-pass Poisson bootstrap (Chamandy et al., "Estimating Uncertainty
  * for Massive Data Streams", Google 2012): resampling-with-replacement
  * is approximated by giving each (unit, replica) pair an independent
  * Poisson(1) weight, so ALL B resamples materialize in a single scan —
  * no per-replica shuffles, no draw-n-of-n sampling state. This is the
  * standard way to put error bars on corpus statistics (mean quality
  * score, dedup rate, click value) at 100 TB, where a classical
  * bootstrap's B separate resamples are unrunnable.
  *
  * Determinism: the weight is a pure function of
  * md5(salt:replica:unit) — the engine-portable 60-bit hash mapped to
  * u ∈ [0,1) (long→double is correctly rounded, the 2⁻⁶⁰ scale is a
  * power of two, so u is bit-identical everywhere), then inverted
  * through the Poisson(1) CDF as a CASE ladder over SHARED literal
  * thresholds (the same decimal strings parse to the same doubles in
  * any IEEE engine; the Scala constants and the SQL fragment are
  * generated from ONE list so they cannot drift). Results are
  * reproducible across runs, engines, partitionings, and cluster
  * sizes — rand()-based bootstraps are none of these.
  *
  * Scale shape: explode(replicas) multiplies the SCAN, not the
  * shuffle — partial aggregation folds each partition's B×rows down to
  * B partial rows before the exchange, so the network cost is
  * O(B · partitions) regardless of data size.
  */
object Bootstrap {

  /** Cumulative Poisson(1) CDF, P(X ≤ k) for k = 0..9, as correctly
    * rounded double literals (10 terms put the truncation mass below
    * 1.2e-7 — far under the hash's 2⁻⁶⁰ resolution ceiling).
    */
  val poisson1Cdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402,
    0.9999998885745217)

  private val twoTo60 = 1.152921504606847e18 // 2^60, binary-exact

  /** u ∈ [0,1) from the portable hash of (salt:replica:unit). */
  def uniform(unit: Column, replica: Column, salt: String): Column =
    HashFns.md5Long(concat(lit(salt + ":"), replica.cast("string"),
      lit(":"), unit.cast("string"))).cast("double") / twoTo60

  /** DuckDB mirror of [[uniform]]; operand fragments must be VARCHAR
    * expressions.
    */
  def uniformSql(unitSql: String, replicaSql: String, salt: String): String =
    s"${HashFns.md5LongSql(s"'$salt:' || $replicaSql || ':' || $unitSql")}" +
      s" / 1.152921504606847e18"

  /** Poisson(1) weight via CDF inversion of `u`: the count of
    * thresholds at or below u (0 when u < cdf(0)).
    */
  def poissonWeight(u: Column): Column =
    // foldRight so the SMALLEST threshold is the OUTERMOST branch —
    // the CDF is increasing, so u < cdf(0) must win before u < cdf(9)
    poisson1Cdf.zipWithIndex.foldRight(lit(poisson1Cdf.size.toLong)) {
      case ((t, k), acc) => when(u < t, k.toLong).otherwise(acc)
    }

  /** DuckDB mirror of [[poissonWeight]] — generated from the SAME
    * threshold list, so the ladders cannot drift.
    */
  def poissonWeightSql(uSql: String): String =
    "CASE " + poisson1Cdf.zipWithIndex.map { case (t, k) =>
      s"WHEN ($uSql) < $t THEN $k"
    }.mkString(" ") + s" ELSE ${poisson1Cdf.size} END"

  /** Bootstrap replica table for a SUM/MEAN statistic: one row per
    * replica with the weighted decimal sum, weighted count, and the
    * replica mean (exact decimal → one correctly rounded division).
    * `value` must already be exactly representable (cast money/scores
    * to DECIMAL first). B replicas, unit identity from `unitKey`.
    */
  def replicateMean(df: DataFrame, unitKey: Column, value: Column,
                    b: Int, salt: String): DataFrame = {
    require(b >= 2, s"need at least 2 replicas, got $b")
    val u = uniform(col("__unit"), col("__rep"), salt)
    df.select(unitKey.as("__unit"), value.cast("decimal(38,6)").as("__v"))
      .select(col("__unit"), col("__v"),
        explode(sequence(lit(0), lit(b - 1))).as("__rep"))
      .withColumn("__w", poissonWeight(u).cast("decimal(38,0)"))
      .groupBy(col("__rep").as("replica"))
      .agg(sum(col("__v") * col("__w")).as("w_sum"),
        sum(col("__w")).cast("long").as("n_eff"))
      .select(col("replica").cast("long").as("replica"),
        col("w_sum").cast("double").as("w_sum"),
        col("n_eff"),
        (col("w_sum").cast("double") / col("n_eff").cast("double"))
          .as("mean"))
  }
}
