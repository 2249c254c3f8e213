package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** EXACT heavy-hitter detection with a bounded candidate phase
  * (Misra–Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS 2012 — re-derived from the published algorithms,
  * not copied).
  *
  * The gap this fills next to the count-min face
  * (q_profile_heavy_hitters): count-min ESTIMATES any key's frequency
  * but cannot enumerate the frequent keys without an external candidate
  * list — and the obvious candidate source, a full `groupBy(key).count`,
  * shuffles one row per DISTINCT key. For "which domains / tokens /
  * users exceed φ of a 100 TB corpus" with billions of distinct keys,
  * that shuffle IS the job. Misra–Gries bounds it: k counters per
  * partial summary, merged by Spark's partial aggregation into ONE
  * k-entry summary whose key set provably contains every item with
  * true count > n/(k+1) (the summary's residual undercounts by at most
  * the decrement total, which is bounded by n/(k+1)) — under ANY
  * partitioning of the rows, because the merge rule (sum counters,
  * subtract the (k+1)-th largest, drop non-positive) preserves the
  * error bound additively.
  *
  * [[exact]] then re-counts ONLY the ≤ k candidates: the second scan's
  * shuffle carries at most tasks × k partial rows however many distinct
  * keys the corpus holds, and the final filter `count·(k+1) > n` uses
  * exact integer arithmetic. The OUTPUT is therefore deterministic and
  * exact (the same set a full groupBy would return) even though the
  * intermediate candidate set depends on partitioning — which is what
  * makes the operator oracle-checkable by a plain GROUP BY / HAVING
  * replay.
  *
  * Driver-side state: one ≤ k-entry map (the merged summary) is
  * collected to build the broadcast `isin` probe — a bounded model
  * artifact in the audited-collect discipline (MMR pool, Markov matrix,
  * BPE rules, bucket carries), not a data-sized collect.
  */
object HeavyHitters {

  /** Misra–Gries summary: at most k (key, residual-count) entries.
    * reduce: increment a present key, insert when below capacity,
    * otherwise decrement ALL counters by one (dropping zeros) — the
    * arriving key is not inserted; the decrement "charges" k+1 distinct
    * stream positions, which is where the n/(k+1) bound comes from.
    * merge: sum counters, then restore |summary| <= k by subtracting
    * the (k+1)-th largest count from every entry and dropping the
    * non-positive ones (Agarwal et al. 2012, Fig. 1).
    */
  private final class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(m: Map[String, Long], key: String): Map[String, Long] =
      m.get(key) match {
        case Some(c) => m.updated(key, c + 1L)
        case None if m.size < k => m.updated(key, 1L)
        case None =>
          // decrement-all: one pass, keys at 1 fall out
          m.collect { case (x, c) if c > 1L => (x, c - 1L) }
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      shrink(sumMaps(a, b), k)
    def finish(m: Map[String, Long]): Map[String, Long] = m
    def bufferEncoder: ExpressionEncoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: ExpressionEncoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  private def sumMaps(a: Map[String, Long],
                      b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (x, c)) =>
      acc.updated(x, acc.getOrElse(x, 0L) + c)
    }

  /** Restore |summary| <= k: subtract the (k+1)-th largest count from
    * every entry, drop the non-positive. Each unit subtracted charges
    * k+1 units of distinct input mass (the k+1 largest entries all
    * lose `cut`), which is where the W/(k+1) undercount bound — and so
    * the superset guarantee — comes from, for counts and weights alike.
    */
  private def shrink(m: Map[String, Long], k: Int): Map[String, Long] =
    if (m.size <= k) m
    else {
      val v = m.valuesIterator.toArray
      java.util.Arrays.sort(v)
      val cut = v(v.length - (k + 1)) // (k+1)-th largest
      m.collect { case (x, c) if c > cut => (x, c - cut) }
    }

  /** Weighted Misra–Gries (Berinde et al., "Space-optimal heavy
    * hitters with strong error bounds", PODS 2009 — re-derived): the
    * arriving (key, weight) is folded in; when the buffer reaches 2k
    * entries it shrinks to k by the subtract-the-(k+1)-th-largest
    * rule, and finish shrinks once more so the emitted summary is
    * ≤ k. The shrink is LAZY (2k cap) so its O(k log k) sort and map
    * rebuild amortize over ≥ k cheap insertions instead of running on
    * every tail-key row — measured 4× on the sf0.1 bench leg. The
    * undercount bound is unchanged: each shrink subtracting `cut`
    * removes ≥ (k+1)·cut of buffered mass (the top k+1 entries all
    * hold ≥ cut), so total undercount stays ≤ W/(k+1) and the key set
    * still contains every key with total weight > W/(k+1). Weights
    * must be non-negative.
    */
  private final class WeightedMisraGriesAgg(k: Int)
      extends Aggregator[(String, Long), Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(m: Map[String, Long], in: (String, Long)): Map[String, Long] = {
      // The superset guarantee's charging argument assumes weights
      // only ever ADD mass; a negative weight could evict a true heavy
      // hitter with no error anywhere downstream (r14 advice). Enforce
      // the documented contract where the violation happens, loudly.
      require(in._2 >= 0L,
        s"exactWeighted: negative weight ${in._2} for key '${in._1}' — " +
          "weights must be non-negative for the Misra-Gries guarantee")
      val up = m.updated(in._1, m.getOrElse(in._1, 0L) + in._2)
      if (up.size < 2 * k) up else shrink(up, k)
    }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      shrink(sumMaps(a, b), k)
    def finish(m: Map[String, Long]): Map[String, Long] = shrink(m, k)
    def bufferEncoder: ExpressionEncoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: ExpressionEncoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** The Misra–Gries summary of `items(itemCol)` as (key, c) rows —
    * at most k of them, c the residual count (undercounts truth by at
    * most n/(k+1)). This is the STORABLE form: per-batch/per-shard
    * summaries written as tiny row sets merge through
    * [[mergeSummaryRows]] without rescanning their inputs.
    */
  def summary(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val mg = udaf(new MisraGriesAgg(k))
    items.filter(col(itemCol).isNotNull)
      .agg(mg(col(itemCol)).as("s"))
      .select(explode(col("s")).as(Seq("key", "c")))
  }

  /** Merge stored summary rows (any number of [[summary]] outputs
    * concatenated) into ONE ≤ k-entry summary: sum counts per key,
    * then subtract the (k+1)-th largest summed count from every entry
    * and drop the non-positive — the m-way form of the pairwise merge
    * rule, preserving the guarantee that every key with TOTAL count
    * > n/(k+1) across all summarized inputs survives (each unit of
    * subtraction charges k+1 units of distinct input mass, so total
    * undercount stays ≤ n/(k+1)). Input and output are bounded
    * (n_summaries × k rows in, ≤ k rows out), so every stage here is
    * driver-light and broadcast-size by construction.
    */
  def mergeSummaryRows(summaries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val summed = summaries.groupBy(col("key")).agg(sum(col("c")).as("c"))
    // (k+1)-th largest summed count; 0 when at most k entries survive
    val cut = summed.orderBy(col("c").desc).limit(k + 1)
      .agg(when(count(lit(1)) <= k, lit(0L))
        .otherwise(min(col("c"))).as("cut"))
    summed.crossJoin(broadcast(cut))
      .filter(col("c") > col("cut"))
      .select(col("key"), (col("c") - col("cut")).as("c"))
  }

  /** All keys of `items(itemCol)` with count strictly greater than
    * n/(k+1), with their EXACT counts: (key, exact_n, total_n), where
    * total_n = n (non-null rows). Two bounded passes — candidate
    * generation through the mergeable Misra–Gries aggregate (map-side
    * partial summaries, one k-entry result), then an exact count over
    * the ≤ k candidates behind a codegen'd `isin` hash probe. Null
    * keys are excluded from both the count base and the candidates,
    * matching the SQL GROUP BY / HAVING replay.
    */
  def exact(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val mg = udaf(new MisraGriesAgg(k))
    val keyed = items.filter(col(itemCol).isNotNull)
    val row = keyed
      .agg(mg(col(itemCol)).as("cands"), count(lit(1)).as("n")).head()
    val cands = row.getMap[String, Long](0).keys.toSeq.sorted
    val n = row.getLong(1)
    val base = keyed.groupBy(col(itemCol).as("key"))
      .agg(count(lit(1)).as("exact_n"))
    if (cands.isEmpty)
      // n == 0, or every counter decremented away — then no key can
      // exceed n/(k+1) (the superset guarantee ran in reverse); keep
      // the schema, return zero rows without another job.
      base.filter(lit(false)).withColumn("total_n", lit(n))
    else
      keyed.filter(col(itemCol).isin(cands: _*))
        .groupBy(col(itemCol).as("key"))
        .agg(count(lit(1)).as("exact_n"))
        .filter(col("exact_n") * (k + 1L) > n)
        .withColumn("total_n", lit(n))
  }

  /** The weighted face of [[exact]]: all keys whose TOTAL WEIGHT
    * strictly exceeds W/(k+1), with their exact weights — the "which
    * domains exceed 1/k of total bytes / revenue / tokens" ask, under
    * the same two-bounded-pass shape (weighted MG candidates, then an
    * exact weight sum over the ≤ k candidates). `weightCol` must be a
    * non-negative integral column (fixed-point your money/bytes to
    * longs first — integer sums keep the output engine-portable and
    * the threshold filter exact). Rows with a null key or null weight
    * are excluded from both W and the candidates. Returns
    * (key, exact_w, total_w).
    */
  def exactWeighted(items: DataFrame, itemCol: String, weightCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val mgw = udaf(new WeightedMisraGriesAgg(k))
    val keyed = items
      .filter(col(itemCol).isNotNull && col(weightCol).isNotNull)
    val row = keyed
      .agg(mgw(col(itemCol), col(weightCol).cast("long")).as("cands"),
        sum(col(weightCol).cast("long")).as("w")).head()
    val cands = row.getMap[String, Long](0).keys.toSeq.sorted
    val w = if (row.isNullAt(1)) 0L else row.getLong(1)
    val base = keyed.groupBy(col(itemCol).as("key"))
      .agg(sum(col(weightCol).cast("long")).as("exact_w"))
    if (cands.isEmpty)
      base.filter(lit(false)).withColumn("total_w", lit(w))
    else
      keyed.filter(col(itemCol).isin(cands: _*))
        .groupBy(col(itemCol).as("key"))
        .agg(sum(col(weightCol).cast("long")).as("exact_w"))
        .filter(col("exact_w") * (k + 1L) > w)
        .withColumn("total_w", lit(w))
  }
}
