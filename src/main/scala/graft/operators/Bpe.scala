package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE-style merge training (Sennrich et al. 2016, the
  * tokenizer-induction step of an LLM data pipeline) over an already-
  * tokenized corpus: each round counts ADJACENT token pairs corpus-wide,
  * adopts the most frequent pair as a merge rule, and rewrites every
  * sequence by the greedy left-to-right application of that rule —
  * merged tokens participate in later rounds, exactly like subword BPE
  * (run on word tokens this induces phrases; on character tokens,
  * subwords).
  *
  * Scale shape per round: pair extraction is a map (one `transform` +
  * `explode` per sequence), the count is one shuffle with map-side
  * combine keyed on the pair, the winner is a TakeOrdered top-1 (never
  * a global sort materialization), and the rewrite is a broadcast of
  * the single merge rule + a map-only fold per sequence. K rounds cost
  * K corpus passes — the canonical distributed BPE trainer layout; the
  * evolving token frame is cached each round so the count and the
  * rewrite don't recompute the previous rewrites (Verify/Bench
  * clearCache() between queries).
  *
  * Determinism: winners tie-break on (count DESC, left ASC, right ASC);
  * the greedy rewrite is a sequential fold per sequence, identical to
  * DuckDB's `list_reduce` replay (seeding from the first element equals
  * folding from an empty accumulator — the first step's condition sees
  * an empty accumulator and appends). All outputs are integers/strings:
  * no float anywhere.
  */
object Bpe {

  /** One row per learned merge: `iter` (1-based round), `pair_l`,
    * `pair_r` (the adopted pair), `pair_n` (its corpus count when
    * adopted). The merged token is `pair_l + "_" + pair_r`.
    */
  def trainMerges(docs: DataFrame, toksCol: String, iters: Int): DataFrame = {
    require(iters >= 1, "need at least one merge round")
    var toks = docs.select(col(toksCol).as("toks")).cache()
    var out: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val t = col("toks")
      // size >= 2 guard: Spark's sequence(1, 0) DESCENDS, so a
      // single-token sequence would fabricate an out-of-bounds pair
      val pairs = toks
        .filter(size(t) >= 2)
        .select(explode(transform(sequence(lit(1), size(t) - 1),
          j => struct(element_at(t, j).as("pair_l"),
            element_at(t, j + 1).as("pair_r")))).as("p"))
        .select(col("p.pair_l"), col("p.pair_r"))
      val best = pairs.groupBy(col("pair_l"), col("pair_r"))
        .agg(count(lit(1)).as("pair_n"))
        .orderBy(col("pair_n").desc, col("pair_l"), col("pair_r"))
        .limit(1)
        .select(lit(i).cast("long").as("iter"), col("pair_l"),
          col("pair_r"), col("pair_n"))
      out = Some(out.fold(best)(_.unionByName(best)))
      if (i < iters) {
        val applied = toks
          .crossJoin(broadcast(best.select(col("pair_l"), col("pair_r"))))
          .select(aggregate(t,
            array().cast("array<string>"),
            (acc, tok) => when(
              size(acc) > 0 &&
                element_at(acc, -1) === col("pair_l") &&
                tok === col("pair_r"),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat(col("pair_l"), lit("_"), col("pair_r")))))
              .otherwise(concat(acc, array(tok)))).as("toks"))
        toks = applied.cache()
      }
    }
    out.get.orderBy(col("iter"))
  }

  /** ENCODE with a learned rule table: apply `rules` (in learned
    * order) to `toksCol`, returning the frame plus `bpe_toks`. Rules
    * are a driver-side literal table (the tokenizer artifact — a few
    * thousand entries at most, the classic broadcast-as-literals
    * shape), so encoding is a PURE MAP: K nested greedy folds compile
    * into one projection, no joins, no shuffles, trivially parallel
    * over any corpus size. The fold per rule is the same greedy
    * left-to-right pass the trainer's rewrite uses — training and
    * encoding cannot disagree.
    */
  def applyMerges(df: DataFrame, toksCol: String,
                  rules: Seq[(String, String)]): DataFrame = {
    val encoded = rules.foldLeft(col(toksCol)) { case (tc, (l, r)) =>
      aggregate(tc, array().cast("array<string>"),
        (acc, tok) => when(
          size(acc) > 0 && element_at(acc, -1) === l && tok === r,
          concat(slice(acc, lit(1), size(acc) - 1),
            array(lit(s"${l}_$r"))))
          .otherwise(concat(acc, array(tok))))
    }
    df.withColumn("bpe_toks", encoded)
  }
}
