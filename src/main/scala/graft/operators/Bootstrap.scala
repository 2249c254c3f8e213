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
  * Determinism AND hash economy: md5 runs ONCE PER UNIT —
  * `h = md5(salt:unit)` (the portable 60-bit hash) — and each replica's
  * uniform is the affine map `m_r = (h·A_r + C_r) mod 2^60` with a FULL
  * 60-bit ODD multiplier A_r (odd ⟹ a unit in Z/2^60 ⟹ the map is an
  * EXACT BIJECTION of [0, 2^60), so m_r is marginally uniform whenever
  * h is — not an approximation). Per-replica constants are derived from
  * md5 of the replica index in PLAIN Scala (so both engines receive
  * them as shared literals, the poisson1Cdf discipline). To keep every
  * intermediate inside a signed 64-bit integer on BOTH engines the
  * product is computed split: with A = A_hi·2^30 + A_lo and
  * h = h_hi·2^30 + h_lo,
  *   h·A mod 2^60 = (h_lo·A_lo
  *                   + ((h_lo·A_hi + h_hi·A_lo) & mask30) << 30)
  *                  mod 2^60
  * — each partial product is ≤ (2^30−1)², their carries cannot exceed
  * 62 bits, and the h_hi·A_hi·2^60 term vanishes mod 2^60. The first
  * implementation hashed every (unit, replica) pair: B=100 made md5 +
  * string building ~60% of the query's CPU at sf0.1 (measured 16 s →
  * 6 s for the registered query). A prior mix used two independent
  * 30-bit multipliers on the halves, which is NOT marginally uniform
  * (the folded sum of two short-range terms is trapezoidal — per-replica
  * mean weights simulated 0.89–1.04); the full-multiplier bijection
  * above replaces it, and BootstrapUniformitySpec pins the marginals.
  *
  * The Poisson(1) inversion is integer-exact: thresholds
  * `T_k = cdf_k · 2^60` are EXACT longs (every double in (0,1) times
  * 2^60 is an integer; computed with BigDecimal and verified exact at
  * class-load), and the weight is the CASE ladder `m < T_k → k` — long
  * compares, no per-row division. Results are reproducible across
  * runs, engines, partitionings, and cluster sizes — rand()-based
  * bootstraps are none of these.
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

  private val two60 = BigDecimal(BigInt(1) << 60)

  /** The CDF thresholds scaled to the hash domain: T_k = cdf_k · 2^60,
    * exact (u < cdf_k ⟺ m < T_k for integer m = u·2^60).
    */
  val poisson1CdfT: Seq[Long] = poisson1Cdf.map { t =>
    // new java.math.BigDecimal(double) is the EXACT binary value of the
    // double (Scala's BigDecimal(d) would re-parse the decimal string)
    (BigDecimal(new java.math.BigDecimal(t)) * two60).toBigIntExact
      .getOrElse(sys.error(s"cdf threshold $t * 2^60 not exact")).toLong
  }

  private val mask30 = (1L << 30) - 1
  private val mod60 = 1L << 60

  /** Plain-Scala 60-bit md5 value of a string (same contract as
    * expressions.Md5Long / HashFns.md5LongSql).
    */
  private def md5Long60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(x => f"$x%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Per-replica mix constants, derived deterministically from the
    * replica index (shared literals on both engines): the 60-bit odd
    * multiplier A_r split into its 30-bit halves — A_lo forced odd (so
    * A_r is a unit in Z/2^60 and h ↦ h·A_r + C_r is a bijection) — and
    * a 60-bit offset C_r. Returned as (alos, ahis, cs).
    */
  def mixConstants(b: Int): (Seq[Long], Seq[Long], Seq[Long]) = {
    ((0 until b).map(r => (md5Long60(s"bootmix:alo:$r") & mask30) | 1L),
     (0 until b).map(r => md5Long60(s"bootmix:ahi:$r") & mask30),
     (0 until b).map(r => md5Long60(s"bootmix:c:$r") % mod60))
  }

  /** The per-unit portable hash: md5(salt:unit) ∈ [0, 2^60). */
  def unitHash(unit: Column, salt: String): Column =
    HashFns.md5Long(concat(lit(salt + ":"), unit.cast("string")))

  /** DuckDB mirror of [[unitHash]]; `unitSql` must be VARCHAR. */
  def unitHashSql(unitSql: String, salt: String): String =
    HashFns.md5LongSql(s"'$salt:' || $unitSql")

  /** Replica-r mixed value m ∈ [0, 2^60) from the unit hash `h`:
    * (h·A_r + C_r) mod 2^60 via the split-product identity (see the
    * object scaladoc), constants indexed by the replica column
    * (0-based, must be < b). Exact bijection of [0, 2^60) per replica.
    */
  def mixed(h: Column, rep: Column, b: Int): Column = {
    val (alos, ahis, cs) = mixConstants(b)
    val idx = (rep + 1).cast("int")
    val alo = element_at(typedLit(alos), idx)
    val ahi = element_at(typedLit(ahis), idx)
    val c = element_at(typedLit(cs), idx)
    val hLo = h.bitwiseAND(lit(mask30))
    val hHi = shiftright(h, 30)
    val cross = (hLo * ahi + hHi * alo).bitwiseAND(lit(mask30))
    ((hLo * alo + shiftleft(cross, 30) + c) % mod60).cast("long")
  }

  /** DuckDB mirror of [[mixed]] — the constant lists are generated from
    * the SAME [[mixConstants]] call, so the sides cannot drift.
    * `repSql` must be an integer expression.
    */
  def mixedSql(hSql: String, repSql: String, b: Int): String = {
    val (alos, ahis, cs) = mixConstants(b)
    def lst(xs: Seq[Long]) = xs.mkString("[", ", ", "]")
    val i = s"(CAST($repSql AS INT) + 1)"
    val hLo = s"(($hSql) & $mask30)"
    val hHi = s"(($hSql) >> 30)"
    val cross = s"(($hLo * (${lst(ahis)})[$i]" +
      s" + $hHi * (${lst(alos)})[$i]) & $mask30)"
    s"($hLo * (${lst(alos)})[$i]" +
      s" + ($cross << 30)" +
      s" + (${lst(cs)})[$i]) % $mod60"
  }

  /** Poisson(1) weight from a mixed value: the CASE ladder over the
    * EXACT integer thresholds [[poisson1CdfT]] (m < T_k → k).
    */
  def weightFromMixed(m: Column): Column =
    // foldRight so the SMALLEST threshold is the OUTERMOST branch —
    // the CDF is increasing, so m < T_0 must win before m < T_9
    poisson1CdfT.zipWithIndex.foldRight(lit(poisson1CdfT.size.toLong)) {
      case ((t, k), acc) => when(m < t, k.toLong).otherwise(acc)
    }

  /** DuckDB mirror of [[weightFromMixed]] — generated from the SAME
    * threshold list, so the ladders cannot drift.
    */
  def weightFromMixedSql(mSql: String): String =
    "CASE " + poisson1CdfT.zipWithIndex.map { case (t, k) =>
      s"WHEN ($mSql) < $t THEN $k"
    }.mkString(" ") + s" ELSE ${poisson1CdfT.size} END"

  /** Bootstrap replica table for a SUM/MEAN statistic: one row per
    * replica with the weighted sum (as double), weighted count, and
    * the replica mean. `value` must carry at most `scale` decimal
    * places (cast money/scores to DECIMAL first); internally it is
    * SCALED TO A LONG (`value · 10^scale`) so the entire
    * explode→ladder→multiply→partial-sum hot path is 64-bit integer
    * arithmetic — exact, engine-portable, and markedly cheaper than
    * decimal (measured on the registered query at sf0.1, 150k orders
    * × B=100: 6.4 s decimal path → 1.8 s long path, isolated 3-run
    * medians). Contract: |value|·10^scale·10·rows must fit in a
    * signed 64-bit long per replica; Spark's default ANSI mode turns
    * an overflow into an error, never a wrapped result.
    *
    * w_sum = (Σ v_scaled·w as double) / 10^scale and
    * mean = w_sum / n_eff — each a single correctly rounded IEEE
    * step from exact integers, so any engine replaying the same
    * formula agrees bit-for-bit.
    *
    * Physical-shape note (measured, not assumed): a "wide" variant —
    * one aggregation with 2·B expressions over the un-exploded scan,
    * no explode, unpivot after — was prototyped and measured 22 s vs
    * 6.9 s for this explode+groupBy form on the registered query at
    * sf0.1: two hundred aggregate expressions fall out of whole-stage
    * codegen, and interpreted ladder evaluation costs far more than
    * the explode it saves. The explode form keeps the ladder +
    * multiply inside ONE codegen'd explode→partial-agg pipeline; its
    * network cost is the same O(B·partitions).
    */
  // Contract note on `scale`: `value` is expected to carry at most
  // `scale` decimal places. A violating input is NOT rejected — the
  // decimal(38,scale) cast rounds it HALF_UP before the scaled-long
  // multiply, quietly changing the statistic, and a non-Spark replay
  // that rounds differently (e.g. banker's rounding) will hash-split.
  // Callers needing a loud failure should pre-check
  // `value == round(value, scale)` on their own scan; this hot path
  // deliberately does not pay a second comparison per row.
  def replicateMean(df: DataFrame, unitKey: Column, value: Column,
                    b: Int, salt: String, scale: Int = 6): DataFrame = {
    require(b >= 2, s"need at least 2 replicas, got $b")
    require(scale >= 0 && scale <= 12, s"scale out of range: $scale")
    val pow = math.pow(10, scale).toLong
    df.select(unitHash(unitKey, salt).as("__h"),
        (value.cast(s"decimal(38,$scale)") * pow).cast("long")
          .as("__vs"))
      .select(col("__h"), col("__vs"),
        explode(sequence(lit(0), lit(b - 1))).as("__rep"))
      .withColumn("__w",
        weightFromMixed(mixed(col("__h"), col("__rep"), b)))
      .groupBy(col("__rep").as("replica"))
      .agg(sum(col("__vs") * col("__w")).as("__ws"),
        sum(col("__w")).as("n_eff"))
      .select(col("replica").cast("long").as("replica"),
        (col("__ws").cast("double") / lit(pow.toDouble)).as("w_sum"),
        col("n_eff"),
        ((col("__ws").cast("double") / lit(pow.toDouble))
          / col("n_eff").cast("double")).as("mean"))
  }
}
