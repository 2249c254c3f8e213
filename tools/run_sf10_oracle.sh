#!/bin/bash
# sf10 oracle widening (round 12): extend CORRECTNESS_SF10.json from the
# r11 dozen to the full sf1-headliner set — the graph _lsh family,
# span_dedup's 60M-row window coverage, the remaining similarity twins,
# and the new round-12 queries. One Verify dump + one check_sf1 replay.
#
# Deliberately EXCLUDED (each with a reason, not silently):
#  - q_sim_containment / q_sim_containment_indexed /
#    q_sim_containment_stratified: the shared exact oracle's
#    intersection join is Sigma df^2 over full dfs (~80 G
#    intermediate rows at 500k docs on the closed vocabulary) — DuckDB
#    cannot replay it at this scale; the twins are hash-verified at
#    sf1 instead and only TIMED at sf10 (SCALING.md). Round 14 closes
#    the hash gap: q_sim_containment_indexed_sampled (INCLUDED below)
#    runs the identical banded plan with a deterministic id_a % 97
#    probe subsample whose A-side predicate bounds the oracle join to
#    ~1/97 — exact-truth hash evidence for the banded operator AT sf10.
#    Recall at scale
#    is guarded observably, not assumed: hot-bucket/hot-span drops are
#    enumerable via Similarity.hotBuckets and
#    SetJoin.spanHotFingerprints, and the stratified twin's span leg
#    carries a DETERMINISTIC run guarantee (no ratio envelope to
#    silently fall off — the r12 advice's q_sim_containment_indexed
#    concern is closed by routing the quote regime there).
#  - q_sim_semdedup (exact baseline): its own n^1.5 contract makes the
#    255 s Spark side + sqrt(n)-centroid SQL replay a poor use of the
#    gate; the LSH twin (included) is the scale path.
#  - the five exact graph recall baselines (q_graph_pagerank /
#    _label_prop / _triangles / _clustering_coeff / _kcore): the exact
#    all-pairs kNN build is 4e10 pairs at 200k vectors — replayable in
#    no engine. Round 15 closes the gap the containment way: their
#    _sampled twins (INCLUDED below) run the identical exact chains
#    over a deterministic 1/13 hash-sampled node slice whose (n/13)^2
#    pair join IS replayable (~2.4e8 pairs, DuckDB minutes/query).
set -u
cd /root/repo
# Scale-scoped TMP (round 14): the r13 red row came from this script's
# Spark leg sharing target/tmp with the sf0.01 driver runs — the sf10
# events left 3000 day partitions in the (then dataset-agnostic)
# hll_catalog that dynamic partition overwrite preserves. Catalog dirs
# are now dataset-keyed in-code (QueriesSources.dsScoped), and this
# belt-and-braces env keeps EVERY tmp artifact of a sweep out of the
# default tree.
export GRAFT_TMP_DIR=/root/repo/target/tmp_sf10
QUERIES="q_graph_pagerank_sampled,q_graph_label_prop_sampled,q_graph_triangles_sampled,q_graph_clustering_coeff_sampled,q_graph_kcore_sampled,q_profile_mg_served,q_profile_heavy_hitters_exact,q_profile_heavy_hitters_weighted,q_profile_cm_catalog,q_profile_pctl_catalog,q_profile_kmv_setops_lake,q_text_contamination_salted,q_text_contamination_salted_bloom,q_text_source_overlap_salted,q_sim_containment_indexed_sampled,q_profile_kmv_catalog,q_agg_percentiles_hist,q_corpus_clean,q_sim_containment_lake,q_sim_lsh_incremental_lake_probe,q_graph_clustering_coeff_lsh,q_graph_kcore_lsh,q_graph_label_prop_lsh,q_graph_pagerank_lsh,q_graph_triangles_lsh,q_lake_dpp_join,q_sim_ann_ivf,q_sim_ann_ivf_incremental,q_sim_ann_ivf_lake,q_sim_ann_ivfpq,q_sim_ann_ivfpq_incremental,q_sim_ann_pq,q_sim_dup_clusters,q_sim_embedding_neardup,q_sim_lsh_neardup,q_sim_lsh_incremental_lake,q_sim_semdedup_lsh,q_sim_sorted_neighborhood,q_split_cluster_safe,q_text_bm25_incremental,q_text_bm25_lake,q_text_bm25_topk,q_text_quality_prune,q_text_quality_prune_approx,q_text_rrf_fusion,q_text_rrf_fusion_ann,q_text_span_dedup,q_u2_dedup_keep_first,q_u2_dedup_keep_first_agg,q_w3_ffill_distributed,q_ev_sessionize,q_join_star_revenue,q_profile_approx_distinct,q_profile_kmv_setops,q_sim_cosine_topk,q_sim_exact_dedup,q_text_tfidf_terms"
# Skip the (expensive) Spark leg when the dump already covers every
# query in $QUERIES — set SF10_FORCE_VERIFY=1 to force a re-dump.
need_verify=0
IFS=',' read -ra QARR <<< "$QUERIES"
for q in "${QARR[@]}"; do
  [ -d "target/verify_sf10/$q" ] || need_verify=1
done
if [ "$need_verify" = 1 ] || [ "${SF10_FORCE_VERIFY:-0}" = 1 ]; then
  SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.Verify /root/repo/target/sf10 target/verify_sf10" \
    > /tmp/verify_sf10.log 2>&1
fi
# --isolate: one DuckDB process per query. DuckDB's allocator is
# process-global — the r12 run proved one OOM oracle poisons every
# later oracle in the same process (13 red rows from 1-2 real OOMs).
python3 tools/check_sf1.py /root/repo/target/sf10 target/verify_sf10 \
  CORRECTNESS_SF10.json --isolate --merge 2>&1 | tee /tmp/check_sf10.log

# Round 13: the WHOLE §2-parity family also verifies at sf10 (55/55
# green, merged into CORRECTNESS_SF10.json). One named exclusion:
#  - q_a9_corr_matrix: its exact-decimal co-moment contract REFUSES
#    the sf10 tiling by design — re-keyed l_orderkey values (~3.7e7)
#    scaled by 10^2 exceed the 3e9 long-product bound, so
#    Correlation.matrix raises its documented loud-fail guard instead
#    of silently losing precision (the guard working as specified;
#    the fixture correlates an ID column, which no real pipeline
#    rescales this way). Reproduce with:
#      SPARK_GRAFT_FAMILY=parity SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
#        sbt -batch "runMain graft.Verify /root/repo/target/sf10 target/verify_sf10_parity"
#      python3 tools/check_sf1.py /root/repo/target/sf10 \
#        target/verify_sf10_parity PARITY_SF10.json --isolate
