package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution (Anderl et al. 2016's
  * data-driven multi-touch model, the principled successor of
  * first/last-touch): model session journeys as a first-order Markov
  * chain over event types with a virtual `start` state and an
  * absorbing conversion state; each channel's credit is its REMOVAL
  * EFFECT — how much conversion probability disappears when every
  * path through that channel is deleted (no renormalization, so the
  * lost mass leaks to the implicit null state and effects are
  * provably non-negative).
  *
  * Conversion probability uses a fixed `steps`-horizon power
  * iteration from `start` (journeys longer than the horizon carry
  * negligible mass at typical session lengths; the horizon makes the
  * whole computation a finite, engine-replayable expression instead
  * of a linear solve).
  *
  * Determinism contract: transition probabilities are single
  * divisions of exact counts; each power-iteration step folds
  * incoming mass in `from_type` order (the ordered-fold convention,
  * seeded at 0.0 — exact identity for finite addends), and the
  * effect-share total folds in channel order — bit-identical on any
  * engine.
  *
  * 100 TB shape: ONE corpus-scale pass builds the transition counts
  * (sessionize window + one aggregation). The resulting matrix is an
  * O(states²) MODEL ARTIFACT — the event taxonomy, not the data — so
  * it is collected under a require() guard and the 5 variants × 6
  * power-iteration steps run as exact driver-side IEEE arithmetic
  * (the bucket-carry precedent of operators/Windows: a DataFrame
  * formulation of 30 five-row joins costs ~1 s of scheduler overhead
  * EACH, ~30 s total, for microseconds of math).
  */
object MarkovAttribution {

  /** Transition frame (`from_type`, `to_type`, `n`, `p`) from a raw
    * event stream: intra-session successor pairs (ordered by `tsCol`,
    * `idCol`) plus virtual `start` → first-event rows; rows FROM the
    * absorbing state are dropped (conversion ends the journey).
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String, gapSeconds: Long,
                  absorbing: String): DataFrame = {
    val sess = Sessionize.sessionize(events, col(userCol), col(tsCol),
      Seq(col(tsCol), col(idCol)), gapSeconds)
    val w = Window.partitionBy(col(userCol), col("session_id"))
      .orderBy(col(tsCol), col(idCol))
    val intra = sess
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .filter(col("from_type") =!= absorbing)
    val starts = sess.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(lit("start").as("from_type"), col(typeCol).as("to_type"))
    val counts = intra.unionAll(starts)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTot = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__ft"))
    counts.join(fromTot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("__ft").cast("double")).as("p"))
  }

  /** `steps`-horizon conversion probability of an edge list (pure
    * driver math; the edge list is the collected model artifact). The
    * absorbing state carries an explicit probability-1 self-loop so
    * converted mass rides the same iteration and the horizon
    * probability is the terminal vector's absorbing entry.
    */
  private def horizonConv(edges: Seq[(String, String, Double)],
                          absorbing: String, steps: Int): Double = {
    val withLoop = edges :+ ((absorbing, absorbing, 1.0))
    var v = Map("start" -> 1.0)
    for (_ <- 1 to steps) {
      v = withLoop
        .flatMap { case (f, t, p) => v.get(f).map(pv => (t, f, p * pv)) }
        .groupBy(_._1)
        .map { case (t, terms) =>
          // from-ordered left fold seeded at 0.0 — mirrors the oracle's
          // list_sum(list(term ORDER BY from_type)) bit for bit
          t -> terms.sortBy(_._2).foldLeft(0.0)((acc, x) => acc + x._3)
        }
    }
    v.getOrElse(absorbing, 0.0)
  }

  /** Per-channel removal-effect report: `channel`, `conv_base`,
    * `conv_removed`, `removal_effect` (= (base − removed)/base, in
    * [0,1]) and `share` (effects normalized in channel order).
    */
  def removalEffects(trans: DataFrame, absorbing: String,
                     channels: Seq[String], steps: Int): DataFrame = {
    require(steps >= 1, s"need steps >= 1, got $steps")
    val spark = trans.sparkSession
    val rows = trans.select(col("from_type"), col("to_type"), col("p"))
      .collect()
    // O(states²) model artifact, not data — same contract as the
    // one-row-per-bucket carry collect in operators/Windows
    require(rows.length <= 4096,
      s"transition matrix has ${rows.length} edges — state space is " +
        "not a bounded taxonomy; refusing driver-side iteration")
    val edges = rows.toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2)))
    val base = horizonConv(edges, absorbing, steps)
    val eff = channels.map { ch =>
      val removed = horizonConv(
        edges.filter(e => e._1 != ch && e._2 != ch), absorbing, steps)
      (ch, base, removed, (base - removed) / base)
    }
    val total = eff.sortBy(_._1).foldLeft(0.0)((a, x) => a + x._4)
    import spark.implicits._
    eff.map { case (ch, b, r, e) => (ch, b, r, e, e / total) }
      .toDF("channel", "conv_base", "conv_removed", "removal_effect",
        "share")
      .orderBy(col("channel"))
  }
}
