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

  /** The persistable inverted index: a DENORMALIZED postings frame
    * (term, doc_id, tf, dl, df) — every per-term statistic a serve-time
    * probe needs rides in the posting row, so serving is ONE equi-join
    * on `term` with no doc-side or term-side lookaside — plus the
    * 1-row (n_docs, avgdl) stats frame. Persist the postings with
    * `Lake.writeBucketed(_, table, "term", n)` and term-keyed probes
    * read the index without ever shuffling it (the q_text_bm25_lake
    * serving path).
    */
  def buildIndex(corpusToks: DataFrame): (DataFrame, DataFrame) = {
    val tf = corpusToks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")) / count(lit(1))).as("avgdl"))
    val postings = tf.join(dl, Seq("doc_id")).join(dfreq, Seq("term"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
    (postings, stats)
  }

  /** Serve a query batch from a PERSISTED index ([[buildIndex]] layout):
    * probe = one `term` equi-join of the (small, broadcast) query term
    * list against the postings — at 100 TB the index never moves; only
    * query terms do. Same arithmetic, fold, and ranking as [[topK]].
    */
  def servedTopK(postings: DataFrame, stats: DataFrame,
                 queryTerms: DataFrame,
                 k1: Double, b: Double, k: Int): DataFrame = {
    val parts = queryTerms
      .join(postings, Seq("term"))
      .crossJoin(broadcast(stats))
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
