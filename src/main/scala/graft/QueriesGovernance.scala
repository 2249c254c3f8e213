package graft

import org.apache.spark.sql.functions._
import graft.operators.{Eval, Privacy}
import graft.sources.Tables

/** Data-governance and model-evaluation queries: privacy release gates
  * (k-anonymity, l-diversity) over the customer table and classifier
  * evaluation (rank AUC, reliability bins) over the document corpus.
  *
  * These extend the reference's surface the same way the similarity /
  * text families do: a pipeline exporting user-derived training data
  * needs a release gate, and a pipeline training a quality filter
  * needs in-engine evaluation of that filter at corpus scale (the
  * fastText-quality-classifier loop of CCNet/RedPajama-style curation).
  *
  * Oracle-parity rules are the repo-wide ones (Queries.scala header):
  * exact integer arithmetic everywhere except single final IEEE
  * divisions, identical aliases both sides, total ORDER BY.
  */
object QueriesGovernance {

  /** Quasi-identifier set used by both privacy queries: market segment
    * plus the account-balance thousand-bin (coarse, realistic QIs);
    * nation is the sensitive attribute.
    */
  private val kanonPrepSql =
    """SELECT c_custkey, c_mktsegment,
      |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bin,
      |  c_nationkey
      |FROM customer""".stripMargin

  val qs: Seq[Q] = Seq(

    // ------------------------------------------ k-anonymity suppression
    // Release gate: rows whose (segment, balance-bin) equivalence class
    // has fewer than k=20 members get their quasi-identifiers nulled.
    // One census groupBy + one join back on the same keys (shared
    // partitioning); no windows, so a giant equivalence class costs its
    // aggregate, never a single-task sort (operators/Privacy).
    Q("q_priv_kanon",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey"),
          col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bin"))
        Privacy.kAnonymitySuppress(c, Seq("c_mktsegment", "bal_bin"), 20L)
          .select(col("c_custkey"), col("c_mktsegment"), col("bal_bin"),
            col("k_size"), col("suppressed"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""WITH base AS ($kanonPrepSql),
              |census AS (
              |  SELECT c_mktsegment, bal_bin, count(*) AS k_size
              |  FROM base GROUP BY 1, 2)
              |SELECT b.c_custkey,
              |  CASE WHEN c.k_size < 20 THEN NULL
              |       ELSE b.c_mktsegment END AS c_mktsegment,
              |  CASE WHEN c.k_size < 20 THEN NULL
              |       ELSE b.bal_bin END AS bal_bin,
              |  c.k_size, c.k_size < 20 AS suppressed
              |FROM base b JOIN census c USING (c_mktsegment, bal_bin)
              |ORDER BY b.c_custkey""".stripMargin)),

    // --------------------------------------------- l-diversity audit
    // Homogeneity-attack audit: per equivalence class, the number of
    // DISTINCT sensitive values (nation); a k-anonymous class where
    // everyone shares a nation still leaks it. One aggregation pass
    // with (QI, sensitive)-level partial aggregation.
    Q("q_priv_ldiversity",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bin"),
          col("c_nationkey"))
        Privacy.lDiversityReport(c, Seq("c_mktsegment", "bal_bin"),
            "c_nationkey", 10L)
          .orderBy(col("c_mktsegment"), col("bal_bin"))
      },
      Some(s"""WITH base AS ($kanonPrepSql)
              |SELECT c_mktsegment, bal_bin,
              |  count(*) AS k_size,
              |  count(DISTINCT c_nationkey) AS l_distinct,
              |  count(DISTINCT c_nationkey) >= 10 AS diverse
              |FROM base GROUP BY 1, 2
              |ORDER BY c_mktsegment, bal_bin""".stripMargin)),

    // ------------------------------------------------- rank-based AUC
    // Evaluate a curation scorer (here the length heuristic n_chars)
    // against a binary target (is-English) by Mann-Whitney AUC with
    // ties counted half. The corpus collapses to a score histogram
    // first, so the ranking pass is O(distinct scores) — see
    // operators/Eval.aucByRank. Integer numerator, one IEEE division.
    Q("q_eval_auc",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("n_chars").as("score"),
            (col("lang") === "en").as("label"))
        Eval.aucByRank(docs, "score", "label").orderBy(col("n_pos"))
      },
      Some("""WITH h AS (
             |  SELECT n_chars AS s,
             |    count(*) FILTER (WHERE lang = 'en') AS pos,
             |    count(*) - count(*) FILTER (WHERE lang = 'en') AS neg
             |  FROM documents GROUP BY 1),
             |c AS (
             |  SELECT s, pos, neg, sum(neg) OVER (ORDER BY s) AS negUpTo
             |  FROM h)
             |SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
             |  CAST(sum(neg) AS BIGINT) AS n_neg,
             |  CASE WHEN sum(pos) > 0 AND sum(neg) > 0 THEN
             |    CAST(sum(pos * (2 * (negUpTo - neg) + neg)) AS DOUBLE)
             |      / (2.0 * sum(pos) * sum(neg))
             |  ELSE NULL END AS auc
             |FROM c ORDER BY n_pos""".stripMargin)),

    // --------------------------------------------- reliability bins
    // Calibration diagram for the same scorer: equi-width score bins
    // with exact positive rate and decimal-exact mean score. A single
    // partial-aggregated groupBy over the corpus.
    Q("q_eval_calibration",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("n_chars").as("score"),
            (col("lang") === "en").as("label"))
        Eval.calibrationBins(docs, "score", "label", 50.0)
          .orderBy(col("bin"))
      },
      Some("""SELECT CAST(floor(n_chars / 50.0) AS BIGINT) AS bin,
             |  count(*) AS n,
             |  CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT)
             |    AS n_pos,
             |  CAST(count(*) FILTER (WHERE lang = 'en') AS DOUBLE)
             |    / count(*) AS pos_rate,
             |  CAST(sum(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE)
             |    / count(*) AS mean_score
             |FROM documents GROUP BY 1 ORDER BY bin""".stripMargin)),

    // ------------------------------------------ precision-recall curve
    // The operating-point companion to q_eval_auc: one row per DISTINCT
    // score threshold t (predict positive when score >= t) with exact
    // tp / predicted counts and the two IEEE divisions. Same
    // histogram-first shape — the curve is O(distinct scores) long no
    // matter the corpus size, and the cumulative pass is a window over
    // that histogram.
    Q("q_eval_pr_curve",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hist = Tables.documents(s, d)
          .select(col("n_chars").as("threshold"),
            when(col("lang") === "en", 1L).otherwise(0L).as("__y"))
          .groupBy(col("threshold"))
          .agg(sum(col("__y")).as("__pos"),
            (count(lit(1)) - sum(col("__y"))).as("__neg"))
        val wDesc = Window.orderBy(col("threshold").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val totals = hist.agg(sum(col("__pos")).as("__p"))
        hist
          .withColumn("tp", sum(col("__pos")).over(wDesc))
          .withColumn("n_pred",
            sum(col("__pos") + col("__neg")).over(wDesc))
          .crossJoin(broadcast(totals))
          .select(col("threshold"), col("tp"), col("n_pred"),
            (col("tp").cast("double") / col("n_pred")).as("precision"),
            (col("tp").cast("double") / col("__p")).as("recall"))
          .orderBy(col("threshold"))
      },
      Some("""WITH h AS (
             |  SELECT n_chars AS threshold,
             |    count(*) FILTER (WHERE lang = 'en') AS pos,
             |    count(*) AS n
             |  FROM documents GROUP BY 1),
             |c AS (
             |  SELECT threshold,
             |    sum(pos) OVER (ORDER BY threshold DESC) AS tp,
             |    sum(n) OVER (ORDER BY threshold DESC) AS n_pred,
             |    sum(pos) OVER () AS p
             |  FROM h)
             |SELECT threshold, CAST(tp AS BIGINT) AS tp,
             |  CAST(n_pred AS BIGINT) AS n_pred,
             |  CAST(tp AS DOUBLE) / n_pred AS precision,
             |  CAST(tp AS DOUBLE) / p AS recall
             |FROM c ORDER BY threshold""".stripMargin)),

    // ------------------------------------------- t-closeness audit
    // Distribution-skew release gate completing the k-anon/l-diversity
    // family: per equivalence class, the total-variation distance
    // between the class's nation distribution and the global one,
    // computed exactly over the common denominator (one IEEE division
    // per class at the end — operators/Privacy.tClosenessReport). The
    // missing-sensitive-value mass falls out algebraically (n·N −
    // Σ_present g·n), so no class×domain cross join exists in the
    // plan. t = 0.2, the paper's running-example threshold.
    Q("q_priv_tcloseness",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bin"),
          col("c_nationkey"))
        Privacy.tClosenessReport(c, Seq("c_mktsegment", "bal_bin"),
            "c_nationkey", 0.2)
          .orderBy(col("c_mktsegment"), col("bal_bin"))
      },
      Some(s"""WITH base AS ($kanonPrepSql),
              |cells AS (
              |  SELECT c_mktsegment, bal_bin, c_nationkey,
              |    count(*) AS c
              |  FROM base GROUP BY 1, 2, 3),
              |gdist AS (
              |  SELECT c_nationkey, count(*) AS g
              |  FROM base GROUP BY 1),
              |tot AS (SELECT count(*) AS totn FROM base),
              |j AS (
              |  SELECT cells.c_mktsegment, cells.bal_bin, c, g, totn,
              |    sum(c) OVER (
              |      PARTITION BY cells.c_mktsegment, cells.bal_bin)
              |      AS clsn
              |  FROM cells JOIN gdist USING (c_nationkey), tot),
              |r AS (
              |  SELECT c_mktsegment, bal_bin,
              |    CAST(max(clsn) AS BIGINT) AS k_size,
              |    sum(abs(CAST(c AS HUGEINT) * totn
              |        - CAST(g AS HUGEINT) * clsn)) AS present,
              |    sum(CAST(g AS HUGEINT) * clsn) AS present_gn,
              |    max(CAST(clsn AS HUGEINT) * totn) AS nN
              |  FROM j GROUP BY 1, 2)
              |SELECT c_mktsegment, bal_bin, k_size,
              |  CAST(present + (nN - present_gn) AS DOUBLE)
              |    / CAST(2 * nN AS DOUBLE) AS tvd,
              |  CAST(present + (nN - present_gn) AS DOUBLE)
              |    / CAST(2 * nN AS DOUBLE) <= 0.2 AS t_close
              |FROM r ORDER BY c_mktsegment, bal_bin""".stripMargin)),

    // ------------------------------------- ε-DP noisy count release
    // Differentially-private release of per-segment counts: n +
    // Laplace(1/ε) with ε = 1, the Laplace draw seeded from
    // md5(salt || segment) so the release is reproducible and
    // cross-engine checkable (operators/Privacy.dpLaplaceCounts — the
    // uniform is bit-exact by construction; the one ln() is 1e-6
    // stabilized). One partial-aggregated groupBy + map-only noise.
    Q("q_priv_dp_counts",
      (s, d) => {
        Privacy.dpLaplaceCounts(Tables.customer(s, d),
            Seq("c_mktsegment"), 1.0, "dp")
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
              |  CAST(count(*) AS BIGINT) +
              |    ${Privacy.dpNoiseSql("c_mktsegment", 1.0, "dp")}
              |    AS noisy_n
              |FROM customer GROUP BY c_mktsegment
              |ORDER BY c_mktsegment""".stripMargin)),

    // ---------------------------------------------------- NDCG@10
    // Graded-relevance ranking quality of a retrieval scorer, one row
    // per query group. Each `source` is a "query" whose candidate set
    // is its 25 documents, the ranker is the length heuristic
    // (n_chars DESC, doc_id tie-break), and the graded labels come
    // from language (en = 2, other latin = 1, zh = 0). Both rankings
    // are windows PARTITIONED BY source (per-group state, no global
    // sort); discounted gains are 1e-9-stabilized then DECIMAL-summed
    // so partial-agg order can't move the result (operators/Eval).
    Q("q_eval_ndcg",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"),
            when(col("lang") === "en", 2L)
              .when(col("lang") === "zh", 0L)
              .otherwise(1L).as("rel"))
        Eval.ndcgAtK(docs, "source", "n_chars", "rel", "doc_id", 10)
          .orderBy(col("source"))
      },
      Some {
        val term = graft.functions.Stabilize.stabSql(
          "(pow(2.0, rel) - 1.0) / log2(CAST(rk AS DOUBLE) + 1.0)", 9)
        val ratio = graft.functions.Stabilize.stabSql(
          "CAST(sum(dterm) AS DOUBLE) / CAST(sum(iterm) AS DOUBLE)", 6)
        s"""WITH r AS (
           |  SELECT source, doc_id, n_chars,
           |    CASE WHEN lang = 'en' THEN 2
           |         WHEN lang = 'zh' THEN 0 ELSE 1 END AS rel
           |  FROM documents),
           |rk AS (
           |  SELECT source, rel,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY n_chars DESC, doc_id) AS r,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY rel DESC, doc_id) AS ir
           |  FROM r),
           |t AS (
           |  SELECT source,
           |    CASE WHEN r <= 10 THEN CAST(
           |      ${term.replace("rk", "r")} AS DECIMAL(24,12))
           |      ELSE CAST(0 AS DECIMAL(24,12)) END AS dterm,
           |    CASE WHEN ir <= 10 THEN CAST(
           |      ${term.replace("rk", "ir")} AS DECIMAL(24,12))
           |      ELSE CAST(0 AS DECIMAL(24,12)) END AS iterm
           |  FROM rk)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_rated,
           |  CAST(sum(dterm) AS DOUBLE) AS dcg,
           |  CAST(sum(iterm) AS DOUBLE) AS idcg,
           |  CASE WHEN CAST(sum(iterm) AS DOUBLE) > 0
           |    THEN $ratio END AS ndcg
           |FROM t GROUP BY source ORDER BY source""".stripMargin
      }),

    // ------------------------------------------------ MAP@10 + MRR
    // Binary-relevance companions to q_eval_ndcg over the same
    // source-as-query framing (ranker = n_chars DESC, relevant =
    // English): mean-reciprocal-rank and average-precision@10
    // normalized by min(R, 10), the trec_eval convention
    // (operators/Eval.mapMrrAtK). Each AP term is one stabilized IEEE
    // division DECIMAL-summed — partial-agg order can't move it — and
    // MRR/AP normalization are single divisions on exact integers.
    Q("q_eval_map_mrr",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"),
            (col("lang") === "en").as("rel"))
        Eval.mapMrrAtK(docs, "source", "n_chars", "rel", "doc_id", 10)
          .orderBy(col("source"))
      },
      Some {
        val term = graft.functions.Stabilize.stabSql(
          "CAST(cumrel AS DOUBLE) / CAST(rk AS DOUBLE)", 9)
        s"""WITH r AS (
           |  SELECT source, doc_id, n_chars, lang = 'en' AS rel
           |  FROM documents),
           |rk AS (
           |  SELECT source, rel,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY n_chars DESC, doc_id) AS rk,
           |    sum(CASE WHEN rel THEN 1 ELSE 0 END) OVER (
           |      PARTITION BY source ORDER BY n_chars DESC, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS cumrel
           |  FROM r),
           |t AS (
           |  SELECT source, rel, rk,
           |    CASE WHEN rel AND rk <= 10
           |      THEN CAST($term AS DECIMAL(24,12))
           |      ELSE CAST(0 AS DECIMAL(24,12)) END AS term
           |  FROM rk)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(count(*) FILTER (WHERE rel) AS BIGINT) AS n_rel,
           |  CAST(min(CASE WHEN rel THEN rk END) AS BIGINT)
           |    AS first_rel_rank,
           |  CASE WHEN count(*) FILTER (WHERE rel) > 0
           |    THEN CAST(1 AS DOUBLE)
           |      / CAST(min(CASE WHEN rel THEN rk END) AS DOUBLE)
           |    END AS mrr,
           |  CASE WHEN count(*) FILTER (WHERE rel) > 0
           |    THEN CAST(sum(term) AS DOUBLE)
           |      / CAST(least(count(*) FILTER (WHERE rel), 10)
           |             AS DOUBLE)
           |    END AS ap
           |FROM t GROUP BY source ORDER BY source""".stripMargin
      }),

    // ---------------------------------------- smoothed target encoding
    // Supervised categorical encoding (Micci-Barreca 2001) for the
    // order-priority feature against order value: the smoothed mean
    // enc = (sum_c + m·mean_global)/(n_c + m) over the COMMON
    // denominator (one IEEE division on exact decimals), plus the
    // leakage-safe leave-one-out row encoding (sum_c − y_i)/(n_c − 1).
    // One category aggregate + broadcast back — no windows, no per-row
    // state (operators/Encoding.targetEncode).
    Q("q_feat_target_encoding",
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,2)").as("__y"))
        graft.operators.Encoding.targetEncode(
            o, "o_orderpriority", col("__y"), 10L)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("n_cat"), col("enc_smooth"), col("enc_loo"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH cat AS (
             |  SELECT o_orderpriority,
             |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sc,
             |    count(*) AS nc
             |  FROM orders GROUP BY 1),
             |tot AS (
             |  SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
             |    count(*) AS n
             |  FROM orders)
             |SELECT o.o_orderkey, o.o_orderpriority,
             |  CAST(nc AS BIGINT) AS n_cat,
             |  CAST(sc * n + 10 * s AS DOUBLE)
             |    / CAST((nc + 10) * n AS DOUBLE) AS enc_smooth,
             |  CASE WHEN nc > 1 THEN
             |    CAST(sc - CAST(o.o_totalprice AS DECIMAL(18,2))
             |         AS DOUBLE) / CAST(nc - 1 AS DOUBLE)
             |  END AS enc_loo
             |FROM orders o JOIN cat USING (o_orderpriority), tot
             |ORDER BY o_orderkey""".stripMargin)),

    // --------------------------------------- weight of evidence / IV
    // Credit-scoring-standard feature-strength report for the length
    // feature against is-English, over the calibration query's 50-char
    // bins: per-bin woe = ln((pos/P)/(neg/Neg)) as ONE stabilized ln
    // of an exact integer ratio, IV as the stabilize-then-DECIMAL-sum
    // fold of the bin terms (operators/Encoding.woeIv). Zero-pos or
    // zero-neg bins carry null woe and contribute nothing.
    Q("q_feat_woe_iv",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(floor(col("n_chars") / 50).cast("long").as("bin"),
            (col("lang") === "en").as("__lab"))
        graft.operators.Encoding.woeIv(docs, "bin", col("__lab"))
          .orderBy(col("bin"))
      },
      Some {
        val stab = graft.functions.Stabilize.stabSql(_: String, 6)
        val woe = stab("ln(CAST(pos * q AS DOUBLE)" +
          " / CAST(neg * p AS DOUBLE))")
        val term = stab("(CAST(pos AS DOUBLE) / CAST(p AS DOUBLE)" +
          " - CAST(neg AS DOUBLE) / CAST(q AS DOUBLE)) * woe")
        s"""WITH b AS (
           |  SELECT CAST(floor(n_chars / 50) AS BIGINT) AS bin,
           |    count(*) FILTER (WHERE lang = 'en') AS pos,
           |    count(*) - count(*) FILTER (WHERE lang = 'en') AS neg
           |  FROM documents GROUP BY 1),
           |tot AS (SELECT sum(pos) AS p, sum(neg) AS q FROM b),
           |w AS (
           |  SELECT bin, pos, neg, p, q,
           |    CASE WHEN pos > 0 AND neg > 0 THEN $woe END AS woe
           |  FROM b, tot),
           |t AS (
           |  SELECT bin, pos, neg, woe,
           |    CASE WHEN woe IS NOT NULL THEN
           |      CAST($term AS DECIMAL(24,12))
           |    ELSE CAST(0 AS DECIMAL(24,12)) END AS term
           |  FROM w),
           |iv AS (SELECT CAST(sum(term) AS DOUBLE) AS iv_total FROM t)
           |SELECT bin, CAST(pos AS BIGINT) AS pos,
           |  CAST(neg AS BIGINT) AS neg, woe, iv_total
           |FROM t, iv ORDER BY bin""".stripMargin
      }),

    // --------------------------- Poisson bootstrap CI (one-pass)
    // operators/Bootstrap.replicateMean: error bars on the mean order
    // value via the Google one-pass Poisson bootstrap — each
    // (order, replica) pair draws a deterministic Poisson(1) weight
    // from the portable hash, so all 100 resamples fall out of ONE
    // scan with partial aggregation (network cost O(B·partitions),
    // data-size-free). The CI is the exact 2.5%/97.5% order statistic
    // of the replica means (rank selection over 100 rows — no float
    // combining); the weight ladder's thresholds are one shared
    // literal list on both sides. Everything is hash-deterministic:
    // same result on any engine, partitioning, or cluster size.
    Q("q_eval_bootstrap_ci",
      (s, d) => {
        val b = 100
        val reps = graft.operators.Bootstrap.replicateMean(
          Tables.orders(s, d), col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)"), b, "boot",
          scale = 2)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("mean"), col("replica"))
        val ranked = reps.withColumn("__rn", row_number().over(w))
        val ci = ranked.agg(
          min(when(col("__rn") === 3, col("mean"))).as("ci_lo"),
          min(when(col("__rn") === 98, col("mean"))).as("ci_hi"),
          count(lit(1)).cast("long").as("b_replicas"))
        val full = Tables.orders(s, d).agg(
          count(lit(1)).as("n_orders"),
          (sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / count(lit(1)).cast("double")).as("mean_full"))
        full.crossJoin(broadcast(ci))
          .select(col("n_orders"), col("mean_full"), col("b_replicas"),
            col("ci_lo"), col("ci_hi"))
      },
      Some {
        import graft.operators.Bootstrap
        val m = Bootstrap.mixedSql("h", "r.rep", 100)
        s"""WITH uh AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           |      AS BIGINT) AS vs,
           |    ${Bootstrap.unitHashSql(
                  "CAST(o_orderkey AS VARCHAR)", "boot")} AS h
           |  FROM orders),
           |reps AS (
           |  SELECT vs, r.rep,
           |    CAST(${Bootstrap.weightFromMixedSql(m)}
           |      AS BIGINT) AS w
           |  FROM uh, (SELECT unnest(range(0, 100)) AS rep) r),
           |agg AS (
           |  SELECT rep AS replica,
           |    CAST(sum(vs * w) AS DOUBLE) / 100.0 AS w_sum,
           |    CAST(sum(w) AS BIGINT) AS n_eff
           |  FROM reps GROUP BY 1),
           |m AS (
           |  SELECT replica, w_sum / CAST(n_eff AS DOUBLE) AS mean
           |  FROM agg),
           |rk AS (
           |  SELECT mean, row_number() OVER (ORDER BY mean, replica)
           |    AS rn
           |  FROM m),
           |ci AS (
           |  SELECT min(CASE WHEN rn = 3 THEN mean END) AS ci_lo,
           |    min(CASE WHEN rn = 98 THEN mean END) AS ci_hi,
           |    CAST(count(*) AS BIGINT) AS b_replicas
           |  FROM rk),
           |f AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_orders,
           |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |      / CAST(count(*) AS DOUBLE) AS mean_full
           |  FROM orders)
           |SELECT n_orders, mean_full, b_replicas, ci_lo, ci_hi
           |FROM f, ci""".stripMargin
      })
  )
}
