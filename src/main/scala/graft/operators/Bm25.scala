package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 top-k retrieval over an inverted-index join — the ranked
  * sibling of the TF-IDF characteristic-terms query (QueriesText), and
  * the retrieval primitive curation pipelines use for
  * query-by-document decontamination and targeted corpus audits.
  *
  * The idf uses the RATIONAL form `(N − df + ½) / (df + ½)` instead of
  * its logarithm: per query term the log is a monotone transform, and
  * summing rational idfs (vs summing logs) reweights terms while
  * keeping every factor an exactly-representable ratio of exact
  * integer counts — libm `ln` differs across engines in the last ulp
  * and would break the bit-exact oracle hash (same trade as
  * q_text_tfidf_terms). The tf saturation and length normalization are
  * textbook BM25: `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`.
  *
  * 100 TB shape: `tf`/`dl`/`df` are one partial-aggregated pass each
  * over the exploded token frame, shuffling (doc, term) counts, never
  * text. Scoring is an equi-join of the (small) query term list against
  * the df frame and the tf postings on `term` — the classic
  * inverted-index probe; AQE broadcasts the query side. The corpus
  * constants (N, avgdl) ride in on a broadcast 1-row aggregate. The
  * per-(query, doc) score sums its term parts in term order (ordered
  * fold) so ranks can never split on float summation order.
  */
object Bm25 {

  /** The BM25 term part as one expression tree over columns
    * (n_docs, df, tf, dl, avgdl) — ONE definition shared by the ad-hoc
    * [[topK]] path and the lake-served [[servedTopK]] path, so the two
    * plans can never drift arithmetically (both stay hash-exact
    * against the same DuckDB replay).
    */
  private def partExpr(k1: Double, b: Double) =
    ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
      (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b)
        + lit(b) * (col("dl") / col("avgdl"))))

  /** Ordered term-part fold + per-query ranking shared by both paths:
    * each (qid, doc) sums its parts in term order (so ranks can never
    * split on float summation order), then top-`k` by (score desc,
    * doc_id).
    */
  private def rankParts(parts: DataFrame, k: Int): DataFrame = {
    val scored = parts.groupBy(col("qid"), col("doc_id"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("term"), col("part")))),
          x => x.getField("part")),
        lit(0.0), (acc, x) => acc + x).as("score"))
    Windows.topKPerGroupRanked(scored, Seq(col("qid")),
        Seq(col("score").desc, col("doc_id")), k, "rk")
      .select(col("qid"), col("rk"), col("doc_id"), col("score"))
      .orderBy(col("qid"), col("rk"))
  }

  /** The persistable inverted index, shaped for INCREMENTAL
    * maintenance (the q_sim_lsh_incremental discipline — history is
    * never rescanned):
    *
    *  - `postings` (term, doc_id, tf, dl): APPEND-ONLY — a new batch of
    *    docs touches only its own rows. dl rides in the posting row
    *    (it is a property of the doc the row was built from, fixed at
    *    ingest), but df deliberately does NOT: df(term) changes when
    *    ANY later batch mentions the term, and denormalizing it would
    *    turn every ingest into a rewrite of all historical postings of
    *    the batch's terms.
    *  - `dfreq` (term, df): term-keyed — a merge updates exactly the
    *    batch's terms, nothing else.
    *  - `stats` 1-row (n_docs, sum_dl): EXACT INTEGER sums, so
    *    incremental addition is bit-lossless; avgdl is derived at
    *    serve time by the same single long→double division the batch
    *    rebuild performs — which is why [[mergeIndex]] == full rebuild
    *    holds hash-exactly, not approximately.
    *
    * Persist postings AND dfreq with `Lake.writeBucketed(_, t, "term",
    * n)` (co-bucketed): the serve-time probe and the df merge are both
    * term equi-joins, so neither ever shuffles the index.
    */
  def buildIndex(corpusToks: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val tf = corpusToks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val postings = tf.join(dl, Seq("doc_id"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    (postings, dfreq, stats)
  }

  /** Fold a NEW batch of docs into an existing index without touching
    * history: batch postings append, batch df counts add into the
    * term-keyed dfreq by one full-outer term join (only the batch's
    * terms shuffle — and none of the postings), and the 1-row stats
    * add exactly. Contract: the batch's doc_ids are DISJOINT from the
    * indexed corpus (new-document ingest — route updates through the
    * CDC/SCD2 machinery first, the exact-dedup convention). The result
    * is bit-identical to [[buildIndex]] over the union corpus —
    * q_text_bm25_incremental's oracle is the full-corpus replay, and
    * Bm25Spec pins the equivalence frame-by-frame.
    */
  def mergeIndex(postings: DataFrame, dfreq: DataFrame, stats: DataFrame,
                 batchToks: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val (bPost, bDfreq, bStats) = buildIndex(batchToks)
    val mPost = postings.unionByName(bPost)
    val mDfreq = dfreq.select(col("term"), col("df").as("__df_old"))
      .join(bDfreq.select(col("term"), col("df").as("__df_new")),
        Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("__df_old"), lit(0L))
          + coalesce(col("__df_new"), lit(0L))).as("df"))
    val mStats = stats.unionByName(bStats)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    (mPost, mDfreq, mStats)
  }

  /** Serve a query batch from a PERSISTED index ([[buildIndex]] layout):
    * probe = `term` equi-joins of the (small, broadcast) query term
    * list against dfreq and the postings — at 100 TB the index never
    * moves; only query terms do, and the postings/dfreq join keys
    * match the bucket layout. Same arithmetic, fold, and ranking as
    * [[topK]]; avgdl is derived here by the identical single division
    * the ad-hoc path performs.
    */
  def servedTopK(postings: DataFrame, dfreq: DataFrame, stats: DataFrame,
                 queryTerms: DataFrame,
                 k1: Double, b: Double, k: Int): DataFrame = {
    val st = stats.select(col("n_docs"),
      (col("sum_dl") / col("n_docs")).as("avgdl"))
    val parts = queryTerms
      .join(dfreq, Seq("term"))
      .join(postings, Seq("term"))
      .crossJoin(broadcast(st))
      .select(col("qid"), col("doc_id"), col("term"),
        partExpr(k1, b).as("part"))
    rankParts(parts, k)
  }

  /** Score `queryTerms` (qid, term — distinct) against the corpus token
    * frame `corpusToks` (doc_id, term — one row per token occurrence)
    * and keep each query's top `k` docs by BM25.
    *
    * Output: (qid, rk, doc_id, score), rk 1-based by (score desc,
    * doc_id).
    */
  def topK(corpusToks: DataFrame, queryTerms: DataFrame,
           k1: Double, b: Double, k: Int): DataFrame = {
    // One (doc, term) aggregation over the exploded tokens; dl and df
    // both derive FROM tf (dl = Σ tf per doc, df = tf's row count per
    // term — tf rows are distinct (doc, term) by construction), so the
    // three statistics share one canonical exchange subtree and
    // Catalyst's ReuseExchange materializes the token shuffle once.
    // Join order keeps the TINY query side first so only the probed
    // terms' postings ever join dl — the ad-hoc (index-free) shape;
    // [[servedTopK]] is the persisted-index shape.
    val tf = corpusToks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // N and avgdl as a broadcast 1-row frame; avgdl is one long/long
    // double division of exact integer aggregates — bit-identical in
    // the DuckDB oracle's CAST(sum AS DOUBLE)/count replay.
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")) / count(lit(1))).as("avgdl"))
    val parts = queryTerms
      .join(dfreq, Seq("term"))
      .join(tf, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"), col("term"),
        partExpr(k1, b).as("part"))
    rankParts(parts, k)
  }
}
