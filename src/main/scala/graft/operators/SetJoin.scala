package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtered EXACT set-similarity self-join (the PPJoin family —
  * Xiao et al., "Efficient Similarity Joins for Near Duplicate
  * Detection", WWW 2008; re-derived here, not copied). Unlike the LSH
  * and rare-ngram candidate generators (operators/Similarity), the
  * prefix filter is LOSSLESS: every pair with Jaccard >= t is
  * guaranteed to collide on at least one prefix element, so the join
  * returns exactly the brute-force answer while pruning the candidate
  * space by construction rather than by probability.
  *
  * Why it is lossless: J(A,B) >= t implies |A∩B| >= t·|U| >= t·max(|A|,
  * |B|), so with elements ranked by ONE global total order, the
  * smallest element of A∩B sits within the first |A| − ⌈t·|A|⌉ + 1
  * elements of A AND the first |B| − ⌈t·|B|⌉ + 1 of B — the two
  * prefixes must share it. The same bound gives the length filter
  * min >= ⌈t·max⌉ (|A∩B| <= min), applied before the pair is ever
  * verified.
  *
  * Scale shape (100 TB): the global order is ascending document
  * frequency (ties by element value), which is the classic skew
  * killer — prefixes are made of each set's RAREST elements, so the
  * candidate join's bucket sizes are small by construction (a
  * stop-word-like element with df in the millions is almost never in
  * anyone's prefix). Costs: one (element) aggregate for df with
  * map-side combine; one per-set window to rank elements (partitions
  * are single sets, bounded by document length — no hot key possible);
  * a self-join that shuffles ONLY prefix rows (a (1−t) fraction of the
  * corpus); and exact verification that carries candidate pairs plus
  * 8-byte element hashes (Similarity.jaccardForPairs), never element
  * strings.
  *
  * COST CONTRACT — read before trusting the shape above at scale: the
  * candidate join's volume is Σ_e p(e)² over prefix-dfs p(e). That is
  * LINEAR in corpus growth only while the element vocabulary grows
  * with the corpus (Heaps' law, true of real text), keeping rare
  * elements rare. On a CLOSED vocabulary the dfs themselves scale with
  * the corpus and the join goes quadratic — measured on the synthetic
  * 31-word corpus at the sf1 decade: distinct 3-grams grew only +9%
  * (27,213 → 29,791) while docs grew 10×, so every prefix-df grew ~10×
  * (max 10 → 83) and Σ p(e)² grew 98× (731,791 → 71,940,464), with
  * wall-clock tracking it (SCALING.md round 11). An exact algorithm
  * cannot dodge this — the information is in the collisions — so the
  * guards are: [[prefixHotElements]] (the observability report that
  * says WHICH elements are inflating, the Similarity.hotBuckets
  * convention), the positional filter below (cuts verification, the
  * dominant stage, for the pairs the bound disproves), and the
  * ROUTING RULE: closed-vocab corpora belong on the probabilistic
  * banded twins — Jaccard joins on q_sim_lsh_neardup's banding (held
  * 4.8× on the same decade), and containment/quote joins on
  * [[containmentBanded]] (the ratio-bounded banded index probe; the
  * exact [[containmentSelfJoin]] stays the labeled recall baseline,
  * generation-bound at 51×/decade on this corpus).
  */
object SetJoin {

  /** ceil() for the LOSSLESS bound computations below, guarded against
    * float round-up: the exact bounds are rational (t·k, t/(1+t)·k for
    * integer k), but the doubles computing them can land epsilon ABOVE
    * a product that is mathematically an exact integer — and then
    * `ceil` demands one more shared element than the math does, which
    * OVER-prunes a qualifying pair (lossy, silently). Subtracting an
    * epsilon far above double rounding error (~1e-16 relative) and far
    * below any real fractional part makes ceil come out at the exact
    * value on both sides of the hazard; in the residual case (a true
    * fractional part under 1e-9, impossible for thresholds with short
    * decimal expansions) the bound relaxes by one, which only admits
    * an extra candidate into exact verification — still lossless.
    */
  private def ceilSafe(x: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = ceil(x - 1e-9)

  /** All unordered pairs (id_a < id_b) with exact Jaccard >= `t` over a
    * distinct (`idCol`, `elemCol`) frame. Output: (id_a, id_b, jaccard)
    * with jaccard an exact-integer ratio (bit-identical across engines).
    */
  def jaccardSelfJoin(sets: DataFrame, idCol: String, elemCol: String,
                      t: Double): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"threshold must be in (0,1], got $t")
    // cached: consumed by the df aggregate, the per-set ranking, and
    // the exact-verify intersection joins — the cache pins ONE
    // evaluation of the caller's shingle pipeline (hash-compact rows:
    // pre-hash elements to longs, see q_sim_setjoin_prefix)
    val distinctSets = sets.select(col(idCol), col(elemCol)).distinct()
      .cache()
    val dfreq = distinctSets.groupBy(col(elemCol))
      .agg(count(lit(1)).as("__df"))
    val sized = distinctSets
      .withColumn("__sz", count(lit(1)).over(Window.partitionBy(col(idCol))))
    val ranked = sized.join(dfreq, Seq(elemCol))
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("__df"), col(elemCol))))
    // prefix length |S| − ⌈t·|S|⌉ + 1; __pos rides along for the
    // positional filter below
    val prefix = ranked
      .filter(col("__pos") <= col("__sz") - ceilSafe(lit(t) * col("__sz")) + 1)
      .select(col(idCol), col(elemCol), col("__sz"), col("__pos"))
    val cand = prefix.select(col(elemCol), col(idCol).as("id_a"),
        col("__sz").as("__sa"), col("__pos").as("__pa"))
      .join(prefix.select(col(elemCol), col(idCol).as("id_b"),
        col("__sz").as("__sb"), col("__pos").as("__pb")), Seq(elemCol))
      .filter(col("id_a") < col("id_b"))
      // length filter: |A∩B| <= min and >= ⌈t·max⌉ force min >= ⌈t·max⌉
      .filter(least(col("__sa"), col("__sb")) >=
        ceilSafe(lit(t) * greatest(col("__sa"), col("__sb"))))
      // POSITIONAL filter (PPJoin's second filter, same paper): a
      // shared element at ranks (pa, pb) caps the overlap at
      // 1 + min(|A|−pa, |B|−pb), and Jaccard >= t needs overlap
      // >= ⌈t/(1+t)·(|A|+|B|)⌉. Keep a pair iff SOME shared occurrence
      // still allows it — lossless, because for a true pair the FIRST
      // common element in the global order (provably inside both
      // prefixes) realizes a bound >= the true overlap. The groupBy
      // replaces the old distinct() — same shuffle, and every pair
      // this drops skips the (pair × set-size) verification join,
      // which dominates when a closed element vocabulary inflates
      // candidate counts (see scaladoc).
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(least(col("__sa") - col("__pa"),
          col("__sb") - col("__pb"))).as("__m"),
        first(col("__sa")).as("__sa"), first(col("__sb")).as("__sb"))
      .filter(lit(1) + col("__m") >=
        ceilSafe(lit(t) / (1 + t) * (col("__sa") + col("__sb"))))
      .select(col("id_a"), col("id_b"))
    // verify directly on the element column (jaccardForPairsHashed only
    // needs equality — pre-hash elements to 8-byte longs upstream and
    // every stage here, prefix AND verify, shuffles longs not strings)
    Similarity.jaccardForPairsHashed(cand,
        distinctSets.select(col(idCol), col(elemCol).as("h")), idCol)
      .filter(col("jaccard") >= t)
  }

  /** Prefix-df report — the early warning for the closed-vocabulary
    * regime in the cost contract above: elements whose PREFIX df
    * exceeds `maxDf`, with their prefix and global dfs, heaviest
    * first. Each row contributes p(e)² candidate pairs; a fattening
    * tail here is the signal to route the corpus to the banded
    * probabilistic twins (or raise `t`) BEFORE the join is attempted.
    * Same shuffle shape (and key) as the candidate join itself, minus
    * the square.
    */
  def prefixHotElements(sets: DataFrame, idCol: String, elemCol: String,
                        t: Double, maxDf: Long): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"threshold must be in (0,1], got $t")
    val distinctSets = sets.select(col(idCol), col(elemCol)).distinct()
    val dfreq = distinctSets.groupBy(col(elemCol))
      .agg(count(lit(1)).as("__df"))
    val sized = distinctSets
      .withColumn("__sz", count(lit(1)).over(Window.partitionBy(col(idCol))))
    val ranked = sized.join(dfreq, Seq(elemCol))
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("__df"), col(elemCol))))
    ranked
      .filter(col("__pos") <= col("__sz") - ceilSafe(lit(t) * col("__sz")) + 1)
      .groupBy(col(elemCol), col("__df"))
      .agg(count(lit(1)).as("prefix_df"))
      .filter(col("prefix_df") > maxDf)
      .select(col(elemCol), col("prefix_df"), col("__df").as("global_df"))
      .orderBy(col("prefix_df").desc, col(elemCol))
  }

  /** Directional containment self-join: all ordered pairs (id_a, id_b),
    * a != b, with |A∩B|/|A| >= `t` — the quote/subset detector that
    * Jaccard misses (a paragraph fully contained in a much larger
    * document has high containment but low Jaccard). Same lossless
    * prefix principle, asymmetric: |A∩B| >= ⌈t·|A|⌉ forces the
    * CONTAINED side's prefix (its |A| − ⌈t·|A|⌉ + 1 rarest elements)
    * to intersect A∩B, so A-prefix rows join against the full corpus
    * — still skew-safe, because only RARE elements appear on the
    * prefix side of the join key. The length filter is
    * |B| >= ⌈t·|A|⌉ (the intersection fits inside B).
    *
    * Output: (id_a, id_b, n_inter, containment) with containment an
    * exact integer ratio.
    */
  def containmentSelfJoin(sets: DataFrame, idCol: String, elemCol: String,
                          t: Double): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"threshold must be in (0,1], got $t")
    val distinctSets = sets.select(col(idCol), col(elemCol)).distinct()
      .cache()
    val dfreq = distinctSets.groupBy(col(elemCol))
      .agg(count(lit(1)).as("__df"))
    val sized = distinctSets
      .withColumn("__sz", count(lit(1)).over(Window.partitionBy(col(idCol))))
    val ranked = sized.join(dfreq, Seq(elemCol))
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("__df"), col(elemCol))))
    val prefix = ranked
      .filter(col("__pos") <= col("__sz") - ceilSafe(lit(t) * col("__sz")) + 1)
      .select(col(idCol), col(elemCol), col("__sz"), col("__pos"))
    val cand = prefix.select(col(elemCol), col(idCol).as("id_a"),
        col("__sz").as("__sa"), col("__pos").as("__pa"))
      .join(ranked.select(col(elemCol), col(idCol).as("id_b"),
        col("__sz").as("__sb"), col("__pos").as("__pb")), Seq(elemCol))
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("__sb") >= ceilSafe(lit(t) * col("__sa")))
      // positional filter, asymmetric form: overlap needs >= ⌈t·|A|⌉,
      // and a shared element at ranks (pa, pb) caps it at
      // 1 + min(|A|−pa, |B|−pb). Keep-if-any is lossless by the same
      // first-common-element argument as the Jaccard form (the first
      // common element provably sits inside A's prefix; pb is its rank
      // in B's FULL df-ranked list, which the join side carries).
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(least(col("__sa") - col("__pa"),
          col("__sb") - col("__pb"))).as("__m"),
        first(col("__sa")).as("__sa"))
      .filter(lit(1) + col("__m") >= ceilSafe(lit(t) * col("__sa")))
      .select(col("id_a"), col("id_b"))
    val shd = distinctSets.select(col(idCol), col(elemCol).as("h"))
    val sizes = shd.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    cand
      .join(shd.select(col(idCol).as("id_a"), col("h")), Seq("id_a"))
      .join(shd.select(col(idCol).as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col(idCol).as("id_a"), col("__n").as("__na")),
        Seq("id_a"))
      .select(col("id_a"), col("id_b"), col("n_inter"),
        (col("n_inter") / col("__na")).as("containment"))
      .filter(col("containment") >= t)
  }

  /** The SCALE TWIN of [[containmentSelfJoin]] — a banded-signature
    * INDEX probe whose candidate volume is bounded by construction,
    * for the closed-vocabulary regime where the exact join's
    * generation stage (Σ_e prefix-df(e)·df(e)) goes quadratic
    * (measured 51×/decade at sf1, SCALING.md round 11). The exact
    * form's probe cost is intrinsic — ANY lossless signature of A must
    * probe its ⌊(1−t)·|A|⌋+1 rarest elements, and on a closed
    * vocabulary every element's df grows with the corpus — so the
    * scale path trades the worst-case guarantee for a banded
    * probabilistic candidate generator with bucket sizes capped by
    * construction, exactly the q_sim_lsh_neardup discipline.
    *
    * Reduction (the LSH-Ensemble idea — Zhu et al., "LSH Ensemble:
    * Internet-Scale Domain Search", VLDB 2016; re-derived, not
    * copied): containment |A∩B|/|A| ≥ t bounds Jaccard from below via
    * J = |A∩B|/(|A|+|B|−|A∩B|) ≥ t·|A|/(|A|+|B|−t·|A|), so for pairs
    * whose size ratio |B|/|A| ≤ ρ the MinHash band index has the
    * classic 1−(1−J^r)^b recall at J ≥ t/(ρ+1−t). With the defaults
    * (K=48, r=2 → b=24 bands) recall at ρ=2, t=0.9 (J ≥ 0.43) is
    * ≥ 0.992, and ≥ 1−4·10⁻¹² at the J ≥ 0.8 the corpus's actual
    * contained pairs carry. r=2 (never 1) matters on closed
    * vocabularies: single-minhash buckets concentrate on the globally
    * minimal element (bucket ~ df(e*), corpus-linear), while paired
    * minhashes keep expected bucket size O(n·J²/vocab²) — small by
    * construction — and `maxBucket` caps the residue.
    *
    * COVERAGE CONTRACT: pairs beyond the size-ratio envelope (a tiny
    * quote inside a document ρ× larger, J ≈ t/ρ) fall off the recall
    * curve — extreme-asymmetry quote detection belongs on the exact
    * [[containmentSelfJoin]] (whose cost contract prices it) or on a
    * size-stratified index with per-stratum band tuning (the full
    * LSH-Ensemble construction). Candidate work here is bounded by
    * b·n·maxBucket pairs REGARDLESS of vocabulary growth — the
    * property the exact join cannot have.
    *
    * `elemCol` should carry pre-hashed 8-byte elements (the
    * [[Similarity.hashedShingles]] convention — every shuffle moves
    * longs). Output matches [[containmentSelfJoin]]: ordered pairs
    * (id_a, id_b, n_inter, containment), containment = |A∩B|/|A| ≥ t
    * verified EXACTLY — the banding only generates candidates, every
    * emitted row is exact-integer-ratio true.
    */
  def containmentBanded(sets: DataFrame, idCol: String, elemCol: String,
                        t: Double, numHashes: Int = 48,
                        rowsPerBand: Int = 2,
                        maxBucket: Int = 64): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"threshold must be in (0,1], got $t")
    // cached: consumed by the signature aggregate, both exact-verify
    // intersection joins, and the size aggregate
    val hashed = sets.select(col(idCol), col(elemCol).as("h")).distinct()
      .cache()
    val sig = Similarity.minhashFromHashes(hashed, idCol, numHashes)
    val bands = Similarity.lshBands(sig, idCol, numHashes, rowsPerBand)
    val cand = Similarity.candidatePairs(bands, idCol, maxBucket)
    val sizes = hashed.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    // ONE unordered candidate pair yields BOTH directed containments
    // from the same intersection count — the verify joins run once.
    val inter = cand
      .join(hashed.select(col(idCol).as("id_a"), col("h")), Seq("id_a"))
      .join(hashed.select(col(idCol).as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col(idCol).as("id_a"), col("__n").as("__na")),
        Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("__n").as("__nb")),
        Seq("id_b"))
    // Both orientations from ONE pass over `inter` — a unionAll of two
    // selects would execute the candidate+verify pipeline twice
    // (measured 2x wall-clock before this explode form)
    inter.select(explode(array(
        struct(col("id_a"), col("id_b"), col("n_inter"),
          (col("n_inter") / col("__na")).as("containment")),
        struct(col("id_b").as("id_a"), col("id_a").as("id_b"),
          col("n_inter"),
          (col("n_inter") / col("__nb")).as("containment"))))
        .as("__o"))
      .select(col("__o.id_a").as("id_a"), col("__o.id_b").as("id_b"),
        col("__o.n_inter").as("n_inter"),
        col("__o.containment").as("containment"))
      .filter(col("containment") >= t)
  }
}
