package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation (Zhu & Ghahramani 2002) over a
  * weighted directed graph — the "grow a small human-labeled slice to
  * the whole corpus" step of dataset curation (quality tiers, topic
  * buckets, license classes).
  *
  * Each round, every node adopts the label with the highest total
  * incoming-neighbor weight (weighted majority vote); SEED labels are
  * clamped — a seed never changes. Unlabeled nodes with no labeled
  * neighbor stay null and can be reached in later rounds.
  *
  * Determinism: the per-(node, label) weight sum folds in neighbor-id
  * order (the same ordered-fold discipline as the PQ/PageRank
  * operators), the vote is `max_by(label, (score, -label))` — a real
  * partial AGGREGATE (skew-safe, no window), with bit-equal scores
  * resolving to the LOWEST label. Both are replayed verbatim by the
  * DuckDB oracle.
  *
  * Scale shape per round: one join of edges against the current label
  * frame (shuffle on dst), one aggregation keyed (src, label), one
  * argmax aggregation keyed src, and a left join back to the clamped
  * seeds. Edges and seeds are loop-invariant and cached
  * (Verify/Bench clearCache() between queries).
  */
object LabelProp {

  /** `edges`: (src, dst, w) — directed, w double. `seeds`: (id, lab) —
    * lab null for unlabeled nodes. Returns (id, lab) after `iters`
    * clamped rounds.
    */
  def run(edges: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "need at least one round")
    val e = edges.cache()
    val s0 = seeds.cache()
    var labels = s0
    for (_ <- 1 to iters) {
      val contrib = e
        .join(labels.select(col("id").as("dst"), col("lab")), Seq("dst"))
        .filter(col("lab").isNotNull)
        .groupBy(col("src"), col("lab"))
        .agg(aggregate(
          transform(array_sort(collect_list(struct(col("dst"),
            col("w").as("__w")))), x => x.getField("__w")),
          lit(0.0), (a, x) => a + x).as("sc"))
      val voted = contrib.groupBy(col("src"))
        .agg(max_by(col("lab"), struct(col("sc"), -col("lab")))
          .as("__vlab"))
        .select(col("src").as("id"), col("__vlab"))
      labels = s0.join(voted, Seq("id"), "left")
        .select(col("id"), coalesce(col("lab"), col("__vlab")).as("lab"))
    }
    labels
  }
}
