package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the properties that make these queries hold up
  * at 100 TB are asserted here so a regression (a lost pushdown, a
  * sneaky unpartitioned window, a fact-table broadcast) fails CI, not
  * the cluster.
  */
class PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def df(name: String): DataFrame = Queries.all(name)(spark, sf)
  private def planString(d: DataFrame): String =
    d.queryExecution.executedPlan.toString
  private def formatted(d: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(out)(d.explain("formatted"))
    out.toString
  }

  test("filters and projections push into the parquet scan (P8/P1)") {
    val p8 = formatted(df("q_p8_range_filter"))
    assert(p8.contains("PushedFilters:"))
    assert(p8.contains("IsNotNull(o_orderdate)"))
    // column pruning: the scan reads only the 3 projected columns
    val read = p8.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("o_orderkey") && read.contains("o_orderdate") &&
      read.contains("o_totalprice"))
    assert(!read.contains("o_orderpriority") && !read.contains("o_custkey"))
  }

  test("ORC read prunes partitions and pushes the row predicate") {
    // q_orc_roundtrip writes ORC partitioned by l_returnflag, then
    // filters on the partition column AND l_quantity. The flag filter
    // must land in PartitionFilters (directory pruning — no I/O for
    // other flags) and the quantity predicate in PushedFilters (ORC
    // stripe-statistics skipping), mirroring the parquet discipline.
    val d = df("q_orc_roundtrip")
    d.collect() // runs the write, so the read side has real files
    val plan = planString(d)
    val scanLine = plan.linesIterator
      .filter(l => l.contains("FileScan orc")).mkString
    assert(scanLine.nonEmpty, s"no ORC scan in plan:\n$plan")
    assert(scanLine.contains("PartitionFilters:") &&
      scanLine.replaceAll(".*PartitionFilters", "")
        .takeWhile(_ != ']').contains("l_returnflag"),
      s"partition filter not pruned:\n$scanLine")
    assert(scanLine.contains("GreaterThanOrEqual(l_quantity,45"),
      s"quantity predicate not pushed:\n$scanLine")
  }

  test("star join broadcasts fixed-size dims, never forces customer") {
    val plan = planString(df("q_join_star_revenue"))
    // nation + region arrive via explicit broadcast hints
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2)
    // the SCALING side must not carry a broadcast HINT — its strategy is
    // AQE's runtime call (logical plan check: hints survive analysis)
    val logical = df("q_join_star_revenue").queryExecution.analyzed.toString
    val hinted = "(?s)UnresolvedHint|ResolvedHint".r.findAllIn(logical).size
    assert(hinted == 2, s"expected exactly 2 broadcast hints, got $hinted")
  }

  test("mean imputation runs as agg + broadcast join, not a global window") {
    val plan = planString(df("q_a8_mean_impute"))
    assert(!plan.contains("Window"),
      "A8 must not use an unpartitioned window over the fact table")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"))
  }

  test("scalar pipelines stay inside whole-stage codegen") {
    // `*(N)` node prefixes mark whole-stage-codegen stages; the AQE plan
    // finalizes on execution, so collect() first.
    for (q <- Seq("q_f15_unit_conversions", "q_f18_binning",
        "q_f3_f9_f12_durations")) {
      val d = df(q)
      d.collect()
      assert(planString(d).contains("*("),
        s"$q fell out of whole-stage codegen:\n${planString(d)}")
    }
  }

  test("custom py_round expression participates in codegen") {
    import org.apache.spark.sql.functions._
    // range-backed (not a local relation, which would constant-fold the
    // whole projection before any codegen happens)
    val frame = spark.range(3).select(
      graft.datasets.PipelineOps.pyRound1(
        when(col("id") === 0, 2.15).when(col("id") === 1, 0.25)
          .otherwise(1.05)).as("r"))
    assert(frame.collect().map(_.getDouble(0)).toSeq == Seq(2.1, 0.2, 1.1))
    // `*(1) Project [py_round(...)]` = the expression runs INSIDE a
    // whole-stage-codegen stage (its doGenCode emitted the static call)
    assert(planString(frame).contains("*("))
    assert(planString(frame).contains("py_round"))
  }

  test("plan snapshots: the expensive queries keep their exchange/scan budgets") {
    // Ceilings = round-3 measured counts (executed-plan string node
    // occurrences at sf0.001, AQE-final) + ~25% slack. These are the 10+
    // most expensive queries per the bench; a lost broadcast, a
    // de-bucketed join, or a new shuffle stage blows the budget and
    // fails HERE instead of on the cluster. Counts include repeated
    // prints of reused subtrees — that repetition is part of the
    // snapshot, not a bug to normalize away.
    val budgets = Map( // name -> (maxExchanges, maxFileScans)
      "q_sim_embedding_neardup" -> (5, 5),
      "q_corpus_clean"          -> (95, 42),
      // 115 -> 135 in the r15 optimization round: the documentsSpread
      // scan fan-out adds ONE real exchange below the dedup window
      // (narrow text rows, before the ngram explode) which the cached
      // shingle lineage re-PRINTS once per consumer — the executed
      // plan gains exactly one (PlanDump: distinctExchanges before/
      // after in plans/r15/), the print count gains ~15.
      "q_sim_ngram_jaccard"     -> (135, 40),
      "q_sim_lsh_neardup"       -> (90, 40),
      "q_sim_ann_quantized"     -> (8, 5),
      "q_sim_ann_ivf"           -> (35, 13),
      // re-pinned round 13: the shash frame is cached (one row per
      // doc, five consumers) and InMemoryRelation reprints its build
      // lineage per consumer — measured 65/24 at sf0.001 AND sf0.01
      // via PlanProbe (+25% slack); identity-walk distinct counts are
      // 10/1 (the work went DOWN — the token-vote aggregate runs once)
      "q_sim_simhash_neardup"   -> (82, 30),
      "q_sim_minhash_signature" -> (5, 3),
      "q_sim_cosine_topk"       -> (8, 5),
      "q_ev_sessionize"         -> (5, 3),
      "q_a9_corr_matrix"        -> (3, 3), // the one-pass contract
      // re-pinned after the rank-limited sample rewrite: sizes +
      // samples branches each shuffle and join — the price of O(sampleK)
      // per-bucket state instead of collect_list over a hot bucket
      "q_sim_lsh_bucket_report" -> (20, 8),
      // round-3 additions
      "q_agg_percentiles"       -> (5, 3),
      "q_text_contamination"    -> (26, 9),
      "q_text_pack_sequences"   -> (8, 3),
      "q_geo_bbox_join"         -> (5, 5),
      "q_mm_features"           -> (3, 3),
      "q_sample_mixture"        -> (5, 3),
      // round-7 additions (measured via graft.tools.PlanProbe + ~25%)
      "q_text_span_dedup"        -> (15, 8),
      "q_sim_label_centroids"    -> (13, 5),
      "q_sim_incremental_dedup"  -> (9, 9),
      "q_text_quality_classifier"-> (3, 3), // map-only + final sort
      "q_text_diversity"         -> (8, 3),
      "q_text_contamination_bloom" -> (52, 15),
      "q_profile_approx_distinct"-> (5, 3),
      "q_agg_percentiles_hist"   -> (8, 3),
      "q_agg_mad_outliers"       -> (25, 9),
      "q_agg_equidepth_bins"     -> (13, 5),
      "q_quality_checks"         -> (5, 3), // the one-pass gate contract
      "q_ev_resample_ohlc"       -> (5, 3),
      "q_agg_cube"               -> (5, 3),
      "q_agg_pivot"              -> (8, 3), // declared values: no distinct pre-job
      "q_p_unpivot_melt"         -> (3, 3), // map-only + final sort
      "q_mm_phash_neardup"       -> (12, 4),
      "q_agg_groupwise_zscore"   -> (8, 5), // agg + broadcast, no window
      // round-4 additions
      "q_text_repetition"       -> (8, 2),
      "q_text_winnowing"        -> (8, 2),
      "q_sim_semdedup"          -> (40, 16),
      "q_asof_forward"          -> (6, 4),
      // round-7 additions
      // dup_clusters' FINAL plan must stay checkpoint-backed: 0 file
      // scans and ~2 exchanges PROVES per-round lineage truncation —
      // drop a localCheckpoint in Components and rounds×pipeline
      // replay lands here as a budget blowout, not on the cluster
      "q_sim_dup_clusters"      -> (3, 0),
      "q_geo_polygon_join"      -> (3, 3),
      // re-pinned round 12: the scan-spread repartition + cached
      // scored frame (SCALING.md serial-scan finding) print the
      // InMemoryRelation lineage once per consumer — measured 16/8
      "q_text_quality_prune"    -> (20, 10),
      // round-8 additions (measured via graft.tools.PlanProbe + ~25%)
      "q_text_span_dup_by_source" -> (23, 10),
      "q_u2_dedup_keep_first_agg" -> (5, 3),
      "q_text_quality_prune_approx" -> (18, 10), // round 12: 14/8 measured (same repartition+cache)
      "q_sim_ann_pq"              -> (41, 18),
      "q_scd2_history"            -> (5, 3),
      "q_text_unigram_nll"        -> (19, 7),
      "q_corpus_shuffle_shard"    -> (5, 3),
      "q_split_leakage_safe"      -> (3, 3),
      "q_mm_image_decode"         -> (3, 3),
      "q_sim_ann_ivfpq"           -> (90, 33),
      "q_text_bm25_topk"          -> (41, 10),
      "q_sim_lsh_incremental"     -> (51, 50),
      "q_profile_heavy_hitters"   -> (8, 5),
      // map-side keys + TakeOrdered: a shuffle appearing here means the
      // sampler stopped being the zero-shuffle top-n it exists to be
      "q_sample_weighted"         -> (1, 3),
      "q_lake_zorder"             -> (10, 5),
      "q_text_rrf_fusion"         -> (54, 15),
      // round-8 second wave (measured via PlanProbe + ~25%).
      // q_emb_power_iteration is NOT pinned: its cached loop-invariant
      // frames print their full lineage per reuse (the PageRank
      // precedent), so exchange counts are meaningless there.
      // (q_text_bpe_merges and q_drift_chisq are NOT pinned: both
      // cache loop-invariant/histogram frames, and InMemoryRelation
      // reprints its build lineage per consumer — counts there track
      // printing, not work; same waiver as q_graph_pagerank and
      // q_emb_power_iteration.)
      "q_ev_ewma"                 -> (5, 3),
      "q_text_mixture_budget"     -> (29, 10),
      "q_lake_range_partition"    -> (18, 8),
      // editdist caches the shared uniq stage AND (round 13) the band
      // frame — candidatePairs' three reads of the shingle→minhash
      // pipeline collapse to one (2.4× wall at sf0.1); the cached
      // lineage prints per reuse, so counts include that repetition
      // (stable across SFs: measured 75/40 at both sf0.001 and
      // sf0.01; identity-walk distinct counts are 11/1)
      "q_sim_lsh_editdist"        -> (95, 50),
      "q_asof_nearest"            -> (8, 5),
      "q_o2_topk_per_group_agg"   -> (5, 3),
      "q_text_bigram_nll"         -> (29, 10),
      "q_ev_markov_transitions"   -> (18, 4),
      "q_text_source_overlap"     -> (37, 12),
      "q_lake_pack_plan"          -> (5, 3),
      "q_ev_twap"                 -> (5, 3),
      // re-pinned round 13: the rank-3 window became the bounded-buffer
      // kMinPairsPerGroup aggregate and the pool gained a corpus-count
      // sizing branch (measured 10/6 at sf0.001 AND sf0.01 + slack)
      "q_text_negative_sampling"  -> (13, 8),
      "q_text_quantile_norm"      -> (18, 8),
      // final plan sits ABOVE the checkpoint-truncated components, so
      // the counts cover only the canonical-selection joins
      "q_sim_dup_canonical"       -> (13, 6),
      "q_agg_winsorize"           -> (18, 8),
      // round-9 additions (measured via PlanProbe + ~25%, stable
      // across sf0.001 and sf0.01)
      "q_priv_kanon"              -> (8, 5),
      "q_priv_ldiversity"         -> (8, 3),
      "q_eval_auc"                -> (5, 3),
      "q_eval_calibration"        -> (5, 3),
      "q_text_dsir"               -> (19, 7),
      "q_split_cluster_safe"      -> (10, 5),
      "q_ev_trajectory"           -> (5, 3),
      "q_ev_anomaly_grouped"      -> (25, 9),
      "q_eval_pr_curve"           -> (13, 5),
      "q_sim_ann_ivf_lake"        -> (28, 14),
      // round-8 continuation (measured via PlanProbe + ~25%).
      // q_sim_setjoin_prefix and q_graph_triangles are NOT pinned:
      // both cache their shared frame (distinct sets / undirected
      // edges) and InMemoryRelation reprints its build lineage per
      // consumer — the pagerank/editdist waiver.
      "q_assoc_copurchase"        -> (49, 13),
      "q_lake_snapshot_diff"      -> (8, 5),
      "q_ts_ols_trend"            -> (5, 3),
      "q_ev_rolling_distinct"     -> (15, 5),
      "q_ev_gap_fill"             -> (15, 8),
      "q_text_pmi_collocations"   -> (29, 10),
      "q_agg_weighted_percentile" -> (5, 3),
      "q_profile_key_skew"        -> (5, 3),
      "q_agg_mode"                -> (8, 3),
      "q_text_word_entropy"       -> (8, 3),
      "q_ev_seasonal_residuals"   -> (8, 5),
      // (q_sim_containment and q_drift_psi cache their shared frame —
      // same lineage-reprint waiver as setjoin/triangles above)
      "q_ev_rolling_distinct_approx" -> (30, 8),
      "q_a8_median_impute"        -> (13, 5),
      "q_ev_attribution"          -> (15, 8),
      "q_ev_holt"                 -> (5, 3),
      "q_agg_weighted_percentile_grouped" -> (8, 3),
      "q_a9_corr_grouped"         -> (5, 3),
      "q_profile_moments"         -> (5, 3),
      // round-10 additions (measured via PlanProbe, identical counts
      // at sf0.001 and sf0.01, + ~25% slack). q_sim_minhash_estimate's
      // counts include cached-lineage reprints (the editdist
      // precedent: stable across SFs, so the repetition is part of the
      // snapshot). The graph triangle/clustering twins stay waived —
      // their counts track InMemoryRelation printing, not work.
      "q_eval_bootstrap_ci"       -> (10, 5),
      // 3 -> 5 in the r15 optimization round: documentsSpread adds ONE
      // real exchange (narrow text rows before the encode fold) that
      // bought the map-only encode 32x scan parallelism (5.46 -> 1.88 s
      // at sf0.1; plans/r15/q_text_bpe_encode_{before,after}.txt)
      "q_text_bpe_encode"         -> (5, 3),
      "q_sim_minhash_estimate"    -> (90, 45),
      "q_text_bm25_lake"          -> (18, 10),
      "q_text_bm25_incremental"   -> (65, 18),
      // round-12: the lake-served incremental LSH probe (PlanProbe
      // 22/14 at sf0.001 AND sf0.01 + ~25%): history exists only as
      // catalog scans (bands/digests/sizes), the batch side is tiny
      "q_sim_lsh_incremental_lake" -> (28, 18),
      "q_graph_label_prop_lsh"    -> (41, 28),
      "q_mm_phash_real"           -> (3, 3),
      "q_text_ngram_novelty"      -> (13, 5),
      "q_ev_funnel_latency"       -> (25, 12),
      "q_corpus_stage_audit"      -> (38, 15),
      // (q_graph_clustering_coeff caches the undirected edges — waived)
      "q_ev_user_profile"         -> (8, 3),
      "q_text_zipf"               -> (5, 3),
      "q_ev_gap_stats"            -> (19, 5),
      "q_profile_table_checksum"  -> (5, 3),
      // round-8 diagnostics wave (PlanProbe sf0.001 + ~25%; the
      // histogram/one-row-frame queries print reused cached subtrees
      // repeatedly, hence the large-but-stable counts)
      "q_drift_ks"                -> (68, 35),
      "q_ts_acf"                  -> (80, 23),
      "q_ts_cusum"                -> (60, 15),
      "q_ev_top_paths"            -> (5, 3),
      "q_profile_benford"         -> (14, 4),
      "q_sim_sorted_neighborhood" -> (10, 8),
      "q_ev_concurrency"          -> (12, 4),
      "q_profile_cramers_v"       -> (80, 40),
      "q_agg_grouping_sets"       -> (5, 3),
      "q_text_heaps"              -> (20, 8),
      // round-8 stats wave (PlanProbe, identical at sf0.001 and
      // sf0.01; mannwhitney/gini/mutual_info cache their histogram /
      // cell frame, so counts include the usual InMemoryRelation
      // lineage reprints — large but stable)
      "q_ev_interval_merge"       -> (5, 3),
      "q_drift_mannwhitney"       -> (68, 35),
      "q_profile_gini"            -> (28, 10),
      "q_profile_mutual_info"     -> (123, 60),
      // kcore's FINAL plan must stay checkpoint-backed: 0 file scans
      // proves per-round lineage truncation (the dup_clusters pin) —
      // drop the localCheckpoint in KCore and the 3^rounds lineage
      // replay lands here (measured 27k exchange nodes uncut)
      "q_graph_kcore"             -> (5, 0),
      "q_eval_bootstrap_ci"       -> (10, 5),
      // survival/period/split cache or reuse their histogram frames —
      // counts include cached-lineage reprints, stable across SFs
      "q_ev_survival_km"          -> (48, 20),
      "q_ts_period_detect"        -> (78, 23),
      "q_split_temporal_gap"      -> (24, 7),
      "q_emb_silhouette"          -> (24, 9),
      // governance completers (probed 20/4 and 4/2, identical at
      // sf0.001 and sf0.01; tcloseness' count includes the two
      // ReusedExchange prints of the single cells shuffle — the
      // corpus is physically scanned ONCE)
      "q_priv_tcloseness"         -> (25, 6),
      "q_eval_map_mrr"            -> (5, 3),
      // experimentation / feature-engineering / sweep wave (probed at
      // sf0.001 and sf0.01, identical; all one-moment-pass or
      // aggregate+broadcast shapes)
      "q_ab_welch_ttest"          -> (5, 3),
      "q_ab_cuped"                -> (5, 3),
      "q_ab_ratio_delta"          -> (5, 3),
      "q_ts_forecast_error"       -> (8, 3),
      "q_feat_target_encoding"    -> (13, 8),
      "q_feat_woe_iv"             -> (29, 7),
      "q_gpx_track_stats"         -> (5, 3),
      "q_text_bpe_encode"         -> (5, 3), // r15: documentsSpread, see above

      "q_ab_diff_in_diff"         -> (5, 3),
      "q_ab_mde"                  -> (5, 3),
      "q_ev_growth_wow"           -> (8, 3))
      // (q_ts_theilsen / q_sample_kcenter waived: their k-deep
      // broadcast pyramids print hundreds of repeated cached subtrees,
      // so string counts track print depth, not work)
    budgets.toSeq.sortBy(_._1).foreach { case (q, (maxEx, maxScan)) =>
      val d = df(q)
      d.collect() // finalize the adaptive plan
      val plan = planString(d)
      val ex = "Exchange".r.findAllIn(plan).size
      val scans = "FileScan".r.findAllIn(plan).size
      assert(ex <= maxEx,
        s"$q: $ex exchanges > budget $maxEx — a new shuffle crept in:\n$plan")
      assert(scans <= maxScan,
        s"$q: $scans file scans > budget $maxScan — a scan stopped being reused:\n$plan")
      // same per-query isolation as Verify/Bench: a query that caches a
      // stage must not donate that cache to the NEXT query's plan
      // (InMemoryRelation lineage printing would shift its counts)
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("quality-prune cutoff is histogram-shaped, never a percentile buffer") {
    // The exact `percentile` aggregate executes as ObjectHashAggregate
    // holding every score in ONE task's buffer — the shape this query
    // was rewritten to eliminate (Percentiles.exactByHistogram). The
    // approx variant legitimately uses an ObjectHashAggregate (a
    // bounded mergeable GK sketch), so only the exact query is pinned.
    val d = df("q_text_quality_prune")
    d.collect()
    val plan = planString(d)
    assert(!plan.contains("ObjectHashAggregate"),
      s"exact prune regressed to a value-buffering aggregate:\n$plan")
    assert(plan.contains("Window"), "histogram cumulative pass missing")
  }

  test("grouped percentiles scale path is histogram-shaped") {
    // Same pin as the global prune: q_agg_percentiles_hist must never
    // regress to a per-group value-buffering percentile aggregate
    // (ObjectHashAggregate); its phase-2 window partitions by the
    // group over the (group, value) histogram.
    val d = df("q_agg_percentiles_hist")
    d.collect()
    val plan = planString(d)
    assert(!plan.contains("ObjectHashAggregate"),
      s"grouped percentiles regressed to a value-buffering aggregate:\n$plan")
    assert(plan.contains("Window"), "histogram cumulative pass missing")
  }

  test("bloom prefilters participate in the plan as codegen'd probes") {
    // Both bloom-prefiltered queries must carry the might_contain
    // probe in their executed plan — if the filter silently drops out
    // (e.g. the predicate is optimized away), the big side shuffles
    // unfiltered and the scale story is gone.
    for (q <- Seq("q_text_contamination_bloom", "q_sim_incremental_dedup")) {
      val d = df(q)
      d.collect()
      assert(planString(d).contains("might_contain"),
        s"$q lost its bloom prefilter")
    }
  }

  test("dedup and windows shuffle ONCE on their keys (no extra exchanges)") {
    val plan = planString(df("q_u2_dedup_keep_first"))
    // one hash exchange for the window partition key; the final orderBy
    // adds a range exchange — anything more means a wasted shuffle
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$plan")
  }

  test("IVF lake serving scan is partition-pruned to the probed cells") {
    // The whole point of q_sim_ann_ivf_lake: the index scan must carry
    // a PartitionFilters entry on `cell`, so only probed directories
    // load (nProbe/nCells of the corpus at scale). An empty partition
    // filter means the serving path silently reads the full index.
    val d = df("q_sim_ann_ivf_lake")
    d.collect()
    val plan = planString(d)
    val pruned = "PartitionFilters: \\[[^\\]]*cell[^\\]]*(?:IN|in)"
      .r.findFirstIn(plan)
    assert(pruned.isDefined,
      s"served IVF scan lost its cell partition filter:\n$plan")
  }

  test("q_lake_dpp_join: fact scan prunes at RUNTIME via DynamicPruning") {
    // q_lake_roundtrip pins STATIC partition pruning (literal day
    // predicate). This pins the DYNAMIC half the lake claims: the day
    // set comes from a filtered dimension, so the fact scan's
    // partition filters must carry a DynamicPruningExpression — the
    // dim's broadcast deciding at runtime which day= directories are
    // read. Losing this silently reverts to scanning every day.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression
    val d = df("q_lake_dpp_join")
    d.collect() // materializes the lake writes + the AQE final plan
    val scans = allNodes(d.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
    val dppScans = scans.filter(_.partitionFilters.exists(
      _.find(_.isInstanceOf[DynamicPruningExpression]).isDefined))
    assert(dppScans.nonEmpty,
      s"no scan carries a DynamicPruningExpression:\n${planString(d)}")
    // and it is the day-partitioned FACT scan being pruned
    assert(dppScans.exists(_.partitionFilters.exists(
        _.references.exists(_.name == "day"))),
      s"DPP landed on the wrong scan:\n${planString(d)}")
  }

  test("AQE splits a manufactured hot-key sort-merge join (skew=true)") {
    // q_salted_skew_join covers the REWRITE answer to join skew; this
    // pins the RUNTIME answer its scaladoc defers to for big × big:
    // AQE's OptimizeSkewedJoin must split a hot shuffle partition into
    // advisory-sized chunks (duplicating the matching other side)
    // instead of letting one reducer absorb the hot key. Thresholds
    // are lowered to make a local-scale hot key visible; the assertion
    // is structural (SortMergeJoinExec.isSkewJoin), not a string grep.
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    // Option(...) guards keys whose getter returns null when unset —
    // restoring null via conf.set throws; unset them instead.
    val saved = keys.map(k =>
      k -> scala.util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        (256 * 1024).toString)
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        (128 * 1024).toString)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // The fixture's sizes are calibrated to a shuffle width equal to
      // the session's shuffle.partitions; a wider AQE
      // initialPartitionNum (Sessions.builder auto-sizes it from the
      // input dir — 1 under test, but env overrides exist) would
      // spread 60k rows so thin that the skew detector's calculus
      // changes on this synthetic. Pin the width the fixture was
      // built for — production skew (partitions past the REAL 256 MB
      // threshold) is width-independent.
      conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        conf.get("spark.sql.shuffle.partitions"))
      // 60k rows, half on ONE hot key, ~75 B/row → the hot partition is
      // ~2.2 MB against a ~70 KB median: over threshold AND over factor
      val pad = "x" * 64
      val big = spark.range(0, 60000).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id")).as("k"),
        concat(lit(pad), col("id")).as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") * 7).as("v"))
      val j = big.join(dim, Seq("k"))
      // collect j ITSELF (count() would execute a different plan and
      // leave j's adaptive plan unfinalized); sanity: 30000 hot-key
      // matches + the 500 odd ids below 1000
      assert(j.collect().length == 30500)
      val smjs = allNodes(j.queryExecution.executedPlan)
        .collect { case s: SortMergeJoinExec => s }
      assert(smjs.nonEmpty, s"expected a sort-merge join:\n${planString(j)}")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the hot-key join as skew:\n${planString(j)}")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("q_salted_skew_join executes on (key, salt) — the spread is real") {
    // The salted twin's whole point: the equi-join must carry TWO keys
    // (business key + salt), so the hot key's rows land on `buckets`
    // reducers. A refactor that drops the salt from the join keys
    // silently reverts to the single hot reducer.
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val d = df("q_salted_skew_join")
    d.collect()
    val joins = allNodes(d.queryExecution.executedPlan).collect {
      case s: SortMergeJoinExec    => s.leftKeys.length
      case s: ShuffledHashJoinExec => s.leftKeys.length
      case s: BroadcastHashJoinExec => s.leftKeys.length
    }
    assert(joins.exists(_ >= 2),
      s"salted join lost its salt key:\n${planString(d)}")
  }

  /** Every physical node in the FINAL executed plan, descending through
    * AQE stages, cached-relation lineages, reused exchanges, and
    * subqueries — text-grepping the plan can't distinguish WHICH join a
    * node belongs to; walking the tree can. (Not identity-deduped:
    * for the no-cartesian pin, seeing a node through ANY path is
    * enough to reject it. graft.tools.PlanWalk.distinctNodes is the
    * deduped variant the executed-exchange budgets use.)
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val kids: Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
      case o                        => o.children
    }) ++ p.subqueries
    p +: kids.flatMap(allNodes)
  }

  test("executed-exchange budgets: cached-lineage queries, identity-walk counts") {
    // The queries waived from the plan-string budgets above — their
    // cached frames reprint the build lineage once per consumer, so
    // string counts track PRINTING (q_drift_psi: 2045 printed
    // exchanges, 43 executed). PlanWalk.distinctNodes walks the tree
    // deduping by reference, counting what EXECUTES — stable across
    // SFs (measured identical ±2 AQE variance at sf0.001/sf0.01),
    // so every formerly waived query is pinnable after all. Ceilings
    // = measured + ~30% slack.
    val budgets = Map( // name -> (maxDistinctExchanges, maxDistinctScans)
      "q_sim_setjoin_prefix"         -> (20, 2),
      "q_graph_triangles"            -> (28, 3),
      "q_sim_containment"            -> (15, 2),
      "q_drift_psi"                  -> (55, 5),
      "q_text_bpe_merges"            -> (10, 2),
      "q_drift_chisq"                -> (48, 5),
      "q_sim_minhash_estimate"       -> (25, 2),
      "q_emb_power_iteration"        -> (30, 3),
      "q_graph_pagerank"             -> (32, 3),
      "q_graph_triangles_lsh"        -> (29, 3),
      "q_graph_clustering_coeff_lsh" -> (31, 3),
      // round-12: containment banded twin (PlanProbe distinct 32/1 at
      // sf0.001 AND sf0.01 + ~25%; printed counts track the cached
      // hashed frame's lineage reprints, the setjoin waiver)
      "q_sim_containment_indexed"    -> (42, 2),
      // round-13: stratified containment (PlanWalk distinct 24/6 at
      // sf0.001 + ~25%). The 6 scans are DELIBERATE: caching the
      // ordered (id, pos, h) frame to serve both strata measured 1.5×
      // WORSE at sf10 (440 vs 289 s — storage pressure beats columnar
      // re-scan), so the plan recomputes lineage instead — the pin
      // allows the re-scans while still catching a runaway.
      "q_sim_containment_stratified" -> (30, 7))
    for ((q, (maxEx, maxScan)) <- budgets.toSeq.sortBy(_._1)) {
      val d = df(q)
      d.collect()
      val (ex, scans) = graft.tools.PlanWalk.exchangeScanCounts(
        d.queryExecution.executedPlan)
      assert(ex <= maxEx && scans <= maxScan,
        s"$q executed-plan budget blown: $ex exchanges (max $maxEx), " +
          s"$scans scans (max $maxScan)")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("kmv setops lake SERVE plan reads stored sketches, never the corpus") {
    // The lake-served claim, pinned physically: after the one-time
    // build (idempotent per JVM+dataset), the registered query's
    // executed plan must scan the persisted sketch parquet and must
    // NOT contain any scan of documents.parquet — the overlap report
    // is answered entirely from stored k-min arrays.
    val d1 = df("q_profile_kmv_setops_lake")
    d1.collect() // guarantees the lake build has happened
    val d2 = df("q_profile_kmv_setops_lake") // serve-only invocation
    d2.collect()
    val plan = planString(d2)
    assert(plan.contains("kmv_source_sketches"),
      s"served plan does not read the sketch lake:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"served plan still scans the corpus:\n$plan")
  }

  test("LSH scale twins carry NO cartesian node anywhere in the plan") {
    // The whole point of the `_lsh`/`_ann` twins: the kNN edge build /
    // ANN candidate pool is multi-probe sign-bit buckets EQUI-joined —
    // at no stage (edge build, iteration joins, peeling, fusion) may
    // the executed plan contain a CartesianProduct, nor any
    // BroadcastNestedLoopJoin except BM25's documented 1-row
    // corpus-stats broadcast (Bm25.scala: the (n_docs, avgdl) aggregate
    // rides in on a broadcast cross of exactly one row — O(n) work, the
    // right 100 TB trade vs re-running the token aggregation for a
    // driver collect). The exact siblings are the labeled recall
    // baselines and legitimately cross-join; these twins are the plans
    // you'd run at 100 TB, so any OTHER cartesian appearing here is a
    // scale regression.
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    for (q <- Seq("q_graph_pagerank_lsh", "q_graph_kcore_lsh",
        "q_graph_label_prop_lsh", "q_graph_triangles_lsh",
        "q_graph_clustering_coeff_lsh", "q_text_rrf_fusion_ann",
        "q_sim_semdedup_lsh", "q_sim_containment_indexed",
        "q_sim_containment_stratified")) {
      val d = df(q)
      d.collect()
      val nodes = allNodes(d.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
        s"$q grew a CartesianProduct:\n${planString(d)}")
      // Whitelist = the BM25 stats broadcast, identified STRUCTURALLY:
      // the broadcast side must output exactly {n_docs, avgdl} AND be a
      // global (grouping-less) aggregate subtree — guaranteed 1 row. An
      // unrelated future cartesian that merely names its columns
      // n_docs/avgdl would not be a global aggregate and still fails.
      def isGlobalAgg(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        allNodes(p).exists {
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
            a.groupingExpressions.isEmpty
          case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
            a.groupingExpressions.isEmpty
          case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
            a.groupingExpressions.isEmpty
          case _ => false
        }
      val rogue = nodes.collect { case b: BroadcastNestedLoopJoinExec => b }
        .filterNot(b => b.children.exists(c =>
          c.output.map(_.name).toSet == Set("n_docs", "avgdl")
            && isGlobalAgg(c)))
      assert(rogue.isEmpty,
        s"$q grew a BroadcastNestedLoopJoin beyond the 1-row BM25 stats " +
          s"broadcast: ${rogue.map(_.verboseString(3))}\n${planString(d)}")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("keepFirstAgg dedup is a partial aggregate, never a window") {
    // The skew-safe dedup's whole point: min_by(struct, struct) runs as
    // an aggregate with map-side combine, so a hot key collapses per
    // map task instead of serializing into one window task. A Window
    // node reappearing here means the skew immunity silently vanished.
    val d = df("q_u2_dedup_keep_first_agg")
    d.collect()
    val plan = planString(d)
    assert(!plan.contains("Window"),
      s"skew-safe dedup regressed to a window plan:\n$plan")
    assert(plan.contains("Aggregate"),
      s"expected an aggregate-based plan:\n$plan")
  }

  test("topKPerGroupAgg is a bounded-buffer aggregate, never a window") {
    // Same contract as the dedup pin: the udaf's whole point is O(k)
    // state with map-side combine; a Window node here means the skew
    // immunity silently regressed to a per-group sort.
    val d = df("q_o2_topk_per_group_agg")
    d.collect()
    val plan = planString(d)
    assert(!plan.contains("Window"),
      s"skew-safe top-k regressed to a window plan:\n$plan")
    assert(plan.contains("Aggregate"),
      s"expected an aggregate-based plan:\n$plan")
  }
}
