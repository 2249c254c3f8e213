package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) — the
  * standard hybrid-retrieval combiner: each ranker contributes
  * `1 / (k0 + rank)` for every (query, doc) it ranked, scores add, and
  * the fused order emerges without any score calibration between
  * rankers (ranks, not raw scores, so a BM25 ranker and a cosine
  * ranker fuse without normalizing apples to oranges).
  *
  * Cross-engine exactness: every part is one IEEE division of exact
  * integers, and the per-(query, doc) sum folds its (at most
  * `rankings.size`) parts in VALUE order — deterministic whatever
  * order the union delivers them, and equal parts commute exactly.
  *
  * 100 TB shape: inputs are already top-k frames (tiny per query); the
  * fuse is one union + one partial-aggregated groupBy on (qid, doc) —
  * the expensive work happened inside the rankers (postings join, ANN
  * probes), the fusion itself is O(queries × k × rankers).
  */
object Fusion {

  /** Fuse ranked frames — each (qid, doc_id, rk) with rk 1-based — and
    * keep each query's top `topK` by fused score (ties on doc_id).
    * Output: (qid, rk, doc_id, rrf_score).
    */
  def rrf(rankings: Seq[DataFrame], k0: Int, topK: Int): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val all = rankings
      .map(_.select(col("qid"), col("doc_id"), col("rk")))
      .reduce(_.unionByName(_))
    val scored = all
      .select(col("qid"), col("doc_id"),
        (lit(1.0) / (lit(k0) + col("rk"))).as("part"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(aggregate(array_sort(collect_list(col("part"))),
        lit(0.0), (acc, x) => acc + x).as("rrf_score"))
    Windows.topKPerGroupRanked(scored, Seq(col("qid")),
        Seq(col("rrf_score").desc, col("doc_id")), topK, "rk")
      .select(col("qid"), col("rk"), col("doc_id"), col("rrf_score"))
      .orderBy(col("qid"), col("rk"))
  }
}
