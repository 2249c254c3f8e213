package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.HashFns

/** Span-level exact substring deduplication (the ExactSubstr side of
  * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  * Better"): instead of dropping whole near-duplicate DOCUMENTS, drop
  * every token covered by an n-token span that also appears in another
  * document — boilerplate headers, license blocks, syndicated
  * paragraphs — while keeping the unique remainder of each document.
  *
  * The reference paper builds a corpus-wide suffix array; that is a
  * single-machine construction. The distributed recast:
  *
  *   1. one row per in-document n-gram START, carrying an 8-byte
  *      portable digest of the n-gram (never the string) — the same
  *      hash-once discipline as the MinHash family;
  *   2. duplicated digests = groupBy(digest) having
  *      countDistinct(doc) > 1 — one shuffle keyed on the digest,
  *      map-side partial aggregation, state O(distinct n-grams);
  *   3. semi-join the duplicated digests back onto the starts (AQE can
  *      broadcast this side when few spans are duplicated — the common
  *      case on clean corpora);
  *   4. per-document coverage: a token at position p is covered iff
  *      some duplicated span starts in [p−n+1, p] — ONE window over
  *      token positions per document (positions are dense, so a
  *      rowsBetween(−(n−1), 0) running sum is exact), never a
  *      token×span join.
  *
  * Everything shuffles on 8-byte digests or the document id; the only
  * per-task state is the window's n-row frame. Digest collisions
  * (~2⁻⁶⁰ per pair) can only OVER-drop a span, never corrupt output
  * text — acceptable for training-data hygiene at corpus scale.
  */
object SpanDedup {

  /** One row per token with its coverage verdict: (idCol, pos, tok,
    * covered). `docs` must carry `idCol` and an array<string> column
    * `toksCol`; spans are `n` consecutive tokens. Documents shorter
    * than `n` tokens are never covered.
    */
  def coverage(docs: DataFrame, idCol: String, toksCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val id = col(idCol)
    val toks = col(toksCol)

    val tok = docs.select(id, posexplode(toks))
      .select(id, col("pos"), col("col").as("tok"))

    // n-gram starts: digest-only from the first projection on.
    val grams = docs.filter(size(toks) >= n).select(id,
        posexplode(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .select(id, col("pos").as("start"),
        HashFns.md5Long(col("col")).as("__g"))

    val dup = grams.groupBy(col("__g"))
      .agg(countDistinct(id).as("__nd"))
      .filter(col("__nd") > 1).select(col("__g"))

    // No distinct: grams carries each (doc, start) exactly once by
    // construction (posexplode over per-doc start ranges), and the
    // semi-join only removes rows — deduplicating again would be a
    // wasted full shuffle of the duplicated-span set.
    val dupStarts = grams.join(dup, Seq("__g"), "left_semi")
      .select(id, col("start").as("pos"))
      .withColumn("__dup", lit(1L))

    val w = Window.partitionBy(id).orderBy(col("pos"))
      .rowsBetween(-(n - 1), Window.currentRow)
    tok.join(dupStarts, Seq(idCol, "pos"), "left")
      .withColumn("covered",
        sum(coalesce(col("__dup"), lit(0L))).over(w) > 0)
      .select(id, col("pos"), col("tok"), col("covered"))
  }

  /** Per-document summary after span removal: token counts and a
    * portable fingerprint of the RETAINED text (covered spans cut,
    * survivors re-joined in position order) — the hash-checkable form
    * of "what the deduplicated corpus looks like".
    */
  def dedupFingerprints(docs: DataFrame, idCol: String, toksCol: String,
      n: Int): DataFrame = {
    val cov = coverage(docs, idCol, toksCol, n)
    cov.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(!col("covered"), 1L).otherwise(0L)).as("n_kept"),
        collect_list(when(!col("covered"),
          struct(col("pos"), col("tok")))).as("__kept"))
      .select(col(idCol), col("n_tokens"), col("n_kept"),
        HashFns.md5Long(concat_ws(" ",
            transform(array_sort(col("__kept")), x => x.getField("tok"))))
          .as("fingerprint"))
  }
}
