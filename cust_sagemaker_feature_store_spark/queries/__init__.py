"""Declared query surface. Importing this package registers every
query module into REGISTRY (consumed by __spark_entry__.py and bench)."""

from .registry import REGISTRY, QuerySpec

from . import feature_store_q  # noqa: E402,F401
from . import relational_q  # noqa: E402,F401
from . import relational2_q  # noqa: E402,F401
from . import relational3_q  # noqa: E402,F401
from . import relational4_q  # noqa: E402,F401
from . import relational5_q  # noqa: E402,F401
from . import relational6_q  # noqa: E402,F401
from . import events_q  # noqa: E402,F401
from . import text_q  # noqa: E402,F401
from . import retrieval_q  # noqa: E402,F401
from . import graph_q  # noqa: E402,F401
from . import similarity_q  # noqa: E402,F401
from . import functions_q  # noqa: E402,F401
from . import relational7_q  # noqa: E402,F401
from . import relational8_q  # noqa: E402,F401
from . import sketches_q  # noqa: E402,F401
from . import gbt_q  # noqa: E402,F401

# -- registry ordering ---------------------------------------------------
#
# The driver's correctness gate checks the FIRST 50 registered queries in
# order. Policy: queries WITHOUT a current driver-green row go first —
# exact-oracle ones (hard hash evidence) ahead of rows-only ones — and
# already-green queries go last. "Current" means the green row was earned
# by the SHIPPED implementation AGAINST THE SHIPPED INPUTS: evidence is
# invalidated both when an operator or query body changes after its green
# round (round-2 advice) AND when the input environment changes under it —
# a testdata re-encoding (e.g. events.ts TIMESTAMP(NANOS)->TIMESTAMP_NTZ
# between r1 and r3) falsified two "green" queries without any code
# change, which is why schema drift now also rotates queries back into
# the window (round-3 advice).
_R1_DRIVER_GREEN = [
    # green rows in CORRECTNESS_r01.json still earned by unchanged code.
    # Removed on purpose (r2 rewrote the as-of operator internals —
    # __pid window partitioning, atomic struct fill, tie-breaker — so
    # the r1 evidence no longer covers the shipped code):
    # fs_asof_join, fs_asof_join_agg, fs_asof_join_union,
    # fs_multi_group_asof.
    "fs_time_range", "fs_latest_snapshot", "fs_snapshot_asof",
    "fs_point_lookup", "fs_latest_snapshot_maxby",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "join_semi_customers_with_open_orders", "agg_orders_by_status",
    "agg_rollup_status_priority", "filter_part_predicates",
    "sort_topk_orders", "set_union_segments", "set_intersect_segments",
    "set_except_segments", "window_rank_orders", "q4_order_priority",
    "q7_nation_pair_revenue", "q10_returned_items", "q14_promo_effect",
    "q17_small_quantity_revenue", "q18_large_orders",
    "agg_cube_status_priority", "filter_in_like_null",
    "scalar_subquery_above_avg", "not_exists_slow_orders",
    "window_ntile_cume", "q6_forecast_revenue",
    "q13_customer_order_distribution", "q16_supplier_count_by_brand",
    "q19_disjunctive_predicates", "q2_min_balance_supplier",
    "unpivot_flag_metrics", "agg_exact_moments",
    "sample_hash_deterministic",
    # range_join_event_followups REMOVED: its r1 green predates the
    # testdata's ts re-encoding to TIMESTAMP_NTZ, which broke it (and
    # crashed BENCH_r03) until the r4 catalog fix — schema-drift
    # invalidation, see policy note above.
    "q8_market_share", "q11_important_parts", "q15_top_supplier",
    "agg_percentiles_exact",
]

_R2_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r02.json earned by unchanged code.
    # sim_lsh_dup_pairs / sim_ivf_topk (rows-only r2 evidence) are NOT
    # listed: their internals (_exact_pairs tiling, IVF cell assignment)
    # change in r3, so they rotate back into the window.
    "fs_asof_join_tolerance", "fs_asof_join_strategy_auto",
    "join_anti_customers_without_orders", "q12_priority_by_returnflag",
    "q22_idle_customers", "pivot_priority_by_status",
    "q9_profit_by_nation_year", "agg_order_status_history",
    "agg_grouping_sets", "window_topk_per_group", "fn_regex_surface",
    "dedup_levenshtein_verify", "q20_heavy_part_suppliers",
    "q21_waiting_suppliers", "sample_stratified_exact",
    "fs_decayed_features", "sample_split_three_way",
    "events_json_extract", "events_json_schema_parse", "events_lag_lead",
    "events_rolling_agg", "events_tumbling_hourly",
    # events_sessionize REMOVED: same TIMESTAMP_NTZ schema-drift
    # invalidation as range_join_event_followups (r2 green, broken by
    # the re-encoded testdata until the r4 catalog fix).
    "text_stats", "text_quality_filter", "text_langid", "text_token_topk",
    "text_fingerprint", "dedup_exact_groups", "dedup_jaccard_pairs",
    "dedup_minhash_signatures", "dedup_minhash_candidates",
    "text_winnow_fingerprints", "pipeline_clean_corpus",
    "text_chunk_windows", "text_pack_bins", "text_mixture_resample",
    "text_scrub_entities", "sim_cosine_topk", "sim_pairs_blocked",
    "sim_label_centroids", "fn_scalar_surface", "udf_user_zscore",
    "window_user_zscore", "udf_multimodal_bytes",
    # rows-only entries whose r2 `spark_rows` evidence still matches the
    # shipped code (no r3 changes):
    "dedup_simhash", "dedup_simhash_candidates", "sim_lsh_ann_topk",
]

_R3_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r03.json earned by code unchanged
    # since (r1/r2 re-verifications already listed above are omitted).
    "fs_tombstone_snapshot", "fs_asof_join", "fs_asof_join_forward",
    "fs_asof_join_nearest", "fs_asof_join_agg", "fs_asof_join_union",
    "fs_resample_ffill_6h", "fs_incremental_agg", "fs_multi_group_asof",
    "layout_zorder_key",
    # dedup_clusters NOT listed: r4 replaces hash-min label propagation
    # with large-star/small-star contraction (diameter-independent
    # rounds for skewed/chain graphs), invalidating its r3 green.
    # rows-only entries whose r3 `spark_rows` evidence covers unchanged
    # code (no exact oracle exists by construction):
    "agg_approx_distinct", "agg_approx_percentile", "sim_lsh_dup_pairs",
    # sim_ivf_topk REMOVED: r11 factors ivf_topk's cell assignment
    # into the shared _with_cells helper (reused by the new
    # ivf_filtered_topk), rotating every ivf_topk caller per the
    # ANY-operator-change policy.
]

_R4_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r04.json (50/50 green) earned by
    # code unchanged in r5. Excluded on purpose (r5 changes their
    # implementation, invalidating the r4 evidence per the policy above):
    #   text_contamination_overlap — r5 lifts it to a parameterized
    #     contamination_overlap(corpus, benchmark_df) operator with
    #     size-aware broadcast (r4 verdict's one scale-weak component);
    #   sim_srp_banded_recall — r5 derives the planted-id offset from
    #     max(vec_id) instead of a constant (ADVICE r4);
    #   sim_ann_recall_floor — r5 fixes the persist-without-unpersist
    #     leak in its exact-floor stage (ADVICE r4).
    "range_join_event_followups", "events_sessionize", "fs_snapshot_diff",
    "fs_scd2_history", "fs_incremental_join", "ml_ols_closed_form",
    "events_funnel_ordered", "agg_value_histogram", "events_trailing_1h",
    "events_cohort_retention", "dedup_clusters", "text_repetition_filter",
    "dedup_simhash_md5", "dedup_simhash_md5_candidates",
    "dedup_triangle_count", "dedup_canonical_docs", "text_token_doc_freq",
    "text_unigram_familiarity", "sim_gram_matrix",
    "sim_text_embedding_agreement", "agg_approx_distinct_floor",
    "agg_approx_percentile_floor",
    # r1/r2/r3 re-verifications also green in r04 are already listed in
    # the earlier lists and are omitted here.
]

_R5_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r05.json (49/50 green; the one err
    # was text_inverted_index's driver-hostile ArrayType schema, fixed
    # this round — it has never had a driver row and stays in the
    # window). Excluded on purpose (r6 changes their implementation,
    # invalidating the r5 evidence per the policy above):
    #   range_join_keyless_nearby — r6 replaces the double-evaluated
    #     floor(t/tol) bucket key with exact integer floor division
    #     (ADVICE r5 #3: magnitude assumption near 2^53);
    #   sim_pca_power_floor — r6 adds the RQI dominance guard (keep the
    #     polished eigenpair only if its Rayleigh quotient >= the
    #     pre-RQI power-iteration quotient; ADVICE r5 #1);
    #   graph_pagerank_parts — r6 adds the per-group pair cap to
    #     cooccurrence_edges, its edge derivation (r5 verdict #3);
    #   sim_ivfpq_recall_floor — r6 adds the trained-centroid `cent`
    #     injection parameter to ivfpq_topk (the seeded default path is
    #     unchanged, but the operator body changed, so the r5 evidence
    #     rotates back in per the policy).
    "text_contamination_overlap", "sim_srp_banded_recall",
    # sim_ann_recall_floor REMOVED: r11's ivf_topk refactor
    # (_with_cells extraction) rotates it per the operator-change
    # policy.
    "fs_ttl_snapshot", "fs_feature_drift_psi",
    "fs_rollup_reaggregation", "fs_bitemporal_asof", "agg_corr_matrix",
    "agg_chi_squared", "ml_ridge_closed_form", "agg_key_skew_profile",
    "ml_auc_exact", "ml_mutual_information", "join_runtime_filter_orders",
    "layout_hilbert_key", "dq_profile_orders", "stream_attribution_twin",
    "stream_running_features_twin", "events_mad_outliers",
    "ml_quantile_binning", "fs_freshness_stats", "events_ewma_window",
    "events_seasonal_anomaly", "events_active_sessions_peak",
    "ml_winsorize_robust_scale", "events_changepoint_cusum",
    "events_survival_km", "dedup_containment_pairs", "pipeline_curate_v2",
    # text_kl_domain_shift REMOVED: r11 replaces its dense |S|x|V|
    # crossJoin spine with the closed-form absent-token remainder
    # (r10 verdict next-round #4), invalidating the r5 evidence.
    "text_zipf_slope", "dedup_incremental_batch",
    "text_ngram_novelty", "text_tfidf_topk", "text_bm25_topk",
    "text_bigram_lift", "ml_hashed_features", "ml_target_encoding",
    "text_bigram_lm", "ml_naive_bayes", "graph_clustering_coeff",
    "sim_semantic_dedup", "sim_kmeans_refined",
    "agg_freq_items_floor", "agg_hll_merge_floor",
]

# First-in-window priority: the r6-green queries whose implementations
# r7 touches (evidence invalidated by the change — see the exclusion
# note above) lead the window so the external gate re-proves them
# before anything else; r7's 16 brand-new queries follow automatically
# as non-green exact-oracle entries in module-import order (20
# unverified total — the remaining ~30 slots re-prove already-green
# queries for free).
#
_R6_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r06.json (50/50 green, 0 errors)
    # earned by code unchanged in r7. Excluded on purpose (r7 changes
    # their implementation, invalidating the r6 evidence per the
    # policy above):
    #   graph_kcore_floor — r7 batches the kcore fixpoint probe
    #     (test the edge count every probe_every rounds instead of
    #     every round; r6 verdict "What's wrong" #3);
    #   sim_pca_power_floor — r7 restructures the dominance guard to
    #     compute the exact spectrum ONCE via eigh and reuse it for
    #     both probe and replacement (ADVICE r6 #2);
    #   sim_ivfpq_recall_floor / sim_ivfpq_lloyd_recall_floor — r7
    #     adds Lloyd-trained PQ sub-codebook injection to ivfpq_topk
    #     (r6 verdict next-round #3), changing the operator body both
    #     queries flow through.
    # graph_pagerank_parts / graph_pagerank_deep REMOVED (r10 extends
    # cooccurrence_edges with the with_support branch; evidence for
    # every caller rotates per the ANY-operator-change policy).
    "range_join_keyless_nearby",
    "fs_feature_vector_pivot", "join_full_outer_distress",
    "ml_calibration_bins", "events_type_transitions",
    "events_dense_spine", "events_running_distinct_users",
    "events_sliding_2h_hourly", "events_inter_arrival_stats",
    "events_rfm_segments", "text_char_diversity",
    "sample_weighted_docs", "text_inverted_index", "text_word_dropout",
    "fn_array_surface", "window_first_last_nth",
    "agg_mode_value", "fn_map_surface", "fn_datetime_surface",
    "ml_ks_test", "ml_gini_stump", "dq_benford_digits",
    "dq_referential_orphans", "dq_uniqueness_keys",
    "er_customer_supplier_match", "events_acf_daily",
    "events_transition_gini", "sample_group_quota",
    "graph_degree_assortativity", "text_lm_doc_nll",
    "ml_logreg_newton", "ml_lift_gains_deciles", "fs_leakage_audit",
    "dq_order_total_consistency", "dq_orderkey_gap_islands",
    "agg_exact_median_orders", "ml_ols_cv_kfold",
    "agg_exact_median_by_type",
    # r1/r3 re-verifications also green in r06 (fs_time_range,
    # fs_latest_snapshot, fs_snapshot_asof, fs_snapshot_diff,
    # fs_scd2_history, fs_tombstone_snapshot) are already listed in
    # the earlier lists and are omitted here.
]

_R7_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r07.json (50/50 green, 0 errors)
    # earned by code unchanged in r8. Excluded on purpose (r8 changes
    # their implementation, invalidating the r7 evidence per the
    # policy above):
    #   graph_kcore_floor — r8 allows one confirming probe past
    #     max_rounds in the batched kcore fixpoint (ADVICE r7 #1);
    #   ml_pr_curve_topf1 — r8 filters NULL scores so the NULL
    #     threshold row can't enter the top-10 F1 tie-break
    #     (ADVICE r7 #2);
    #   sim_ivfpq_trained_codebook_floor — r8 adds the int64 wrap
    #     guard to pq_distortion's batch accumulation (ADVICE r7 #3);
    #   agg_exact_quantiles_by_type / agg_iqr_outliers_by_priority /
    #   agg_trimmed_mean_by_priority / agg_weighted_median_by_flag /
    #   events_time_to_convert_quantiles — r8 adds the positive-weight
    #     validation to order_stats.grouped_cumulative_counts, the
    #     operator all five flow through (ADVICE r7 #4).
    # sim_ivfpq_recall_floor / sim_ivfpq_lloyd_recall_floor REMOVED:
    # r12 extracts the ADC shortlist tier from ivfpq_topk
    # (_adc_shortlist, shared with the new filtered + stored-probe
    # paths), rotating every caller per the operator-change policy.
    "sim_pca_power_floor", "stream_interval_join_twin",
    # dedup_cluster_size_histogram REMOVED: r12 adds the candidate-pair
    # lazy pin (r11 verdict #5), rotating per the ANY-change policy.
    "stream_session_window_twin",
    # graph_bfs_depths / graph_closeness_seeds REMOVED (same r10
    # cooccurrence_edges rotation as the pagerank pair above).
    "graph_sssp_weighted",
    # sim_ivf_nprobe_sweep REMOVED: r11's ivf_topk refactor
    # (_with_cells extraction) rotates it per the operator-change
    # policy.
    "ml_association_rules",
    "ml_ab_test_proportions", "fs_training_set_pit", "ml_brier_score",
    "events_dau_wau_stickiness", "agg_exact_moments_by_flag",
    # r1–r6 re-verifications also green in r07 (the fs_* family,
    # q1_pricing_summary, q3_shipping_priority, ...) are already
    # listed in the earlier lists and are omitted here.
]

_R8_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r08.json (50/50 green, 0 errors)
    # earned by code unchanged in r9. Excluded on purpose (r9 changes
    # their implementation, invalidating the r8 evidence per the
    # policy above):
    #   graph_kcore_floor — r9 makes max_rounds a hard peel budget in
    #     kcore (the confirming probe raises if it actually peels;
    #     ADVICE r8 #1);
    #   sim_ivfpq_trained_codebook_floor — r9 converts pq_distortion's
    #     wrap guard to the exact integer form (ADVICE r8 #2);
    #   ml_pr_curve_topf1 — r9 documents the scored-rows-only recall
    #     semantics in the query description (ADVICE r8 #3; text-only,
    #     but the module body changed, so the evidence rotates per the
    #     policy).
    "agg_exact_quantiles_by_type", "agg_iqr_outliers_by_priority",
    "agg_trimmed_mean_by_priority", "agg_weighted_median_by_flag",
    "events_time_to_convert_quantiles",
    # r1–r7 re-verifications also green in r08 (the fs_* family,
    # q1_pricing_summary, the set/window/sort surfaces, ...) are
    # already listed in the earlier lists and are omitted here.
]

_R9_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r09.json (50/50 green, 0 errors)
    # earned by code unchanged in r10. Excluded on purpose:
    #   graph_link_prediction — r10 caps its support self-join via
    #     cooccurrence_edges(with_support=True) (the r9 verdict's one
    #     `weak` finding), so the r9 evidence rotates per policy;
    #   graph_kcore_floor / graph_ppr_seeds — r10 extends the
    #     cooccurrence_edges operator they call (with_support branch),
    #     rotating every caller per the ANY-operator-change policy.
    # sim_ivfpq_trained_codebook_floor / sim_ivf_kmeanspar_recall_floor
    # REMOVED: same r12 _adc_shortlist rotation as the r7 pair above.
    "ml_pr_curve_topf1",
    "fs_training_set_multi", "fs_asof_join_composite",
    "join_interval_overlap", "sample_group_split_audit",
    "ml_negative_sampling", "text_boilerplate_lines",
    "text_strip_boilerplate", "dedup_threshold_sweep",
    "dedup_loss_weights", "text_repeated_spans", "pipeline_curate_v3",
    "dedup_candidate_quality", "retrieval_rrf_fusion",
    "sim_matryoshka_recall",
    "udf_multimodal_bmp", "agg_count_min_sketch", "fn_luhn_check_digit",
    "stream_count_min_twin", "dq_functional_dependency",
    "events_theil_sen_daily", "ml_pinball_loss", "ml_average_precision",
    # r1–r8 re-verifications also green in r09 (the fs_* family, ...)
    # are already listed in the earlier lists and are omitted here.
]

_R10_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r10.json (50/50 green, 0 errors)
    # earned by code unchanged in r11. Excluded on purpose (r11 changes
    # their implementation, invalidating the r10 evidence per the
    # policy above):
    #   dedup_allpairs_prefix — r11 converts allpairs_prefix_join's
    #     prefix length and length filter to exact integer/rational
    #     arithmetic (ADVICE r10 #1: float F.ceil(n*t) overshoots by an
    #     ULP for thresholds not representable in binary);
    #   graph_mst_boruvka / graph_single_linkage_cut — r11 removes
    #     boruvka_forest's silent cast-to-long of the weight column
    #     (ADVICE r10 #2), rotating both callers;
    #   sort_skyline_parts — r11 makes skyline_2d's NULL handling
    #     explicit (ADVICE r10 #3);
    #   ml_subsample_stability — r11 replaces the double-division bit
    #     test with integer shiftright (ADVICE r10 #4).
    # ml_shapley_r2 / ml_learning_curve REMOVED: r13's first full
    # sf0.1 registry replica caught a one-ULP cross-engine divergence
    # in their cancellation-heavy sufficient-statistic ratios (native
    # FMA contraction of a*b - c*d vs the JVM's strict evaluation);
    # both now snap outputs onto the 1e-12 grid, rotating them.
    # graph_bfs_depths REMOVED: the same sf0.1 replica blew DuckDB's
    # temp disk because the oracle's chained CTEs re-evaluated
    # ~2^depth times when inlined; every CTE is now MATERIALIZED,
    # rotating it (oracle-text change, same values).
    "dedup_phash_pairs", "dq_k_anonymity", "events_holt_trend",
    "events_markov_attribution", "events_rolling_slope",
    "fs_snapshot_drift_psi", "graph_closeness_seeds",
    "graph_kcore_floor", "graph_label_propagation",
    "graph_link_prediction", "graph_modularity_lpa",
    "graph_pagerank_deep", "graph_pagerank_parts", "graph_ppr_seeds",
    "ml_conformal_coverage", "ml_group_influence",
    "ml_isotonic_calibration", "ml_item_item_cf",
    "ml_woe_iv", "pipeline_curriculum_pack",
    "pipeline_dataset_card", "retrieval_mmr_rerank",
    "retrieval_ndcg_eval", "retrieval_prf_expansion",
    "stream_asof_twin", "stream_dedup_twin", "text_bpe_fertility",
    "text_bpe_merges", "text_shared_spans", "text_vocab_growth",
    "udf_multimodal_frames", "udf_multimodal_phash",
    "udf_multimodal_png", "udf_multimodal_resize",
    # r1–r9 re-verifications also green in r10 (fs_time_range,
    # fs_latest_snapshot, fs_snapshot_asof, fs_point_lookup,
    # fs_asof_join, fs_tombstone_snapshot, fs_snapshot_diff,
    # fs_scd2_history) are already listed in the earlier lists and are
    # omitted here.
]

_R11_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r11.json (49/50 green + the
    # by-construction no_oracle sim_ivf_topk, 0 errors) earned by code
    # unchanged in r12. Excluded on purpose (r12 changes their
    # implementation, invalidating the r11 evidence per the policy
    # above):
    #   dedup_allpairs_prefix — r12 floors computed-float thresholds
    #     onto a 1e-6 grid in allpairs_prefix_join instead of raising
    #     (ADVICE r11 #4);
    #   stream_dedup_index_twin — r12 converts the index existence
    #     probe to the Hadoop FileSystem API (ADVICE r11 #3);
    #   sim_filtered_topk — r12 re-pins its row order after the label
    #     join (ADVICE r11 #1);
    #   sim_ivf_filtered_recall_floor — r12 rounds (not truncates) the
    #     recall-floor hit count (ADVICE r11 #2);
    #   sim_ann_recall_floor / sim_ivf_nprobe_sweep — r12 adds the
    #     persisted build/probe index split to the IVF family in
    #     operators/similarity.py, rotating every ivf_topk caller per
    #     the ANY-operator-change policy.
    #   text_bpe_encode — r12 switches the encode replay to the
    #     single-pass grouped-pandas `apply_merges_fast` (bit-identical
    #     to the round replay, equality-pinned by test; encode stage
    #     3.8s -> 0.9s warm at sf0.1 for 12 merges, 99s -> 2.2s for 24).
    "graph_mst_boruvka", "graph_single_linkage_cut",
    "sort_skyline_parts", "ml_subsample_stability",
    "text_kl_domain_shift", "dedup_minhash_estimate_error",
    "sample_weighted_reservoir",
    "retrieval_query_likelihood", "sample_coreset_kcenter",
    # r1–r10 re-verifications also green in r11 (the fs_* family,
    # q1/q3/q5, the semi/anti joins, agg_orders_by_status) are already
    # listed in the earlier lists and are omitted here.
]

_R12_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r12.json (49/50 green + the
    # by-construction no_oracle sim_ivf_topk, 0 errors) earned by code
    # unchanged in r13. Excluded on purpose (r13 changes their
    # implementation, invalidating the r12 evidence per the policy
    # above):
    #   sim_ivfpq_filtered_recall_floor — r13 makes the post-filter
    #     dominance STRUCTURAL (union the unfiltered nprobe
    #     shortlist's eligible members into the rerank pool) and
    #     gates the eligible-id broadcast on the measured match count
    #     (ADVICE r12 #1/#4), changing ivfpq_filtered_topk's body;
    #   dedup_allpairs_prefix — r13 documents allpairs_prefix_join's
    #     floor-to-grid threshold semantics (ADVICE r12 #2; text-only,
    #     but the operator body changed, so the evidence rotates per
    #     the policy — the ml_pr_curve_topf1 r9 precedent);
    #   stream_dedup_index_twin / stream_ivf_index_twin — r13 moves
    #     both modules' epoch-compaction swaps to the Hadoop
    #     FileSystem API (ADVICE r12 #3) and extends the IVF
    #     maintainer with PQ-code upkeep; the twins' own data paths
    #     (replay_epochs / grid_assign_cells) are untouched, but the
    #     maintainer-module-change discipline rotates them (the r12
    #     _read_or_empty precedent);
    #   pipeline_curate_v4 — r13 factors its body into the shared
    #     _curate_v4_bins tail (reused verbatim by the new
    #     pipeline_curate_stream_twin), rotating it per the policy;
    #   sim_ivf_list_skew — r13 factors grid_assign_cells' distance
    #     fold into grid_distance_array (shared with the new
    #     sim_quantizer_drift), rotating every grid_assign_cells
    #     caller per the policy.
    "sim_filtered_topk", "sim_ivf_filtered_recall_floor",
    "sim_ann_recall_floor", "sim_ivf_nprobe_sweep",
    "sim_ivfpq_recall_floor", "sim_ivfpq_lloyd_recall_floor",
    "sim_ivfpq_trained_codebook_floor", "sim_ivf_kmeanspar_recall_floor",
    "text_bpe_encode", "dedup_cluster_size_histogram",
    "fs_late_data_impact", "dq_t_closeness",
    "sample_dsir_importance", "dedup_incremental_components",
    "text_code_switching", "sample_dsir_resample",
    "sim_corpus_diversity",
    # rows-only entry whose r12 `spark_rows` evidence covers unchanged
    # code (no exact oracle exists by construction; its hash-green
    # floors sit in the same driver window):
    "sim_ivf_topk",
    # r1–r11 re-verifications also green in r12 (the fs_* family) are
    # already listed in the earlier lists and are omitted here.
]

_R13_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r13.json (50/50 green, 0 errors)
    # earned by code unchanged in r14. Excluded on purpose (r14
    # changes their implementation or their paired maintainer module,
    # invalidating the r13 evidence per the policy above):
    #   er_blocking_quality — r14 gates the gold standard's supplier
    #     broadcast on a measured row count with an exact FastSS
    #     deletion-neighborhood fallback (r13 verdict nit; the query
    #     body now routes through _er_gold_pairs);
    #   stream_dedup_index_twin / stream_ivf_index_twin /
    #   stream_ivfpq_index_twin / stream_kmv_store_twin /
    #   pipeline_curate_stream_twin — r14 replaces the maintainers'
    #     staged swaps with the epoch-pointer publish and routes every
    #     store read/append through _fsutil.resolve (r13 verdict
    #     next-round #4); the twins' own data paths are exact-math
    #     ports, but the maintainer-module-change discipline rotates
    #     them (the r13 precedent for the r12 Hadoop-FS move);
    #   sim_ivfpq_retrained_floor — the paired store-side retrain
    #     (streaming/ivf_index.retrain_ivfpq_index) now publishes its
    #     four-table group through pointer markers, rotating the floor
    #     that certifies the retrain recipe;
    #   udf_multimodal_wav — r14 adds the baseline JPEG codec and the
    #     FFD8 decode_media dispatch to operators/multimodal.py (the
    #     module-change rotation; decode_wav itself is untouched).
    "dedup_allpairs_prefix", "pipeline_curate_v4", "sim_ivf_list_skew",
    "ml_shapley_r2", "ml_learning_curve", "graph_bfs_depths",
    "sample_neyman_allocation", "events_seasonal_decompose",
    "events_holt_winters", "events_rolling_median", "events_top_paths",
    "text_kneser_ney", "text_good_turing", "sample_importance_ess",
    "sim_quantizer_drift", "sim_batch_topk", "sim_silhouette_cells",
    "sim_sq8_recall_floor", "sim_ivfsq_recall_floor",
    "sim_ivfpq_filtered_recall_floor",
    "ml_permutation_importance", "agg_kmv_distinct", "agg_hll_custom",
    "stream_hll_registers_twin", "agg_theta_intersection",
    "join_bloom_prune", "agg_histogram_quantiles",
    "pipeline_dataset_card_sketch", "stream_histogram_twin",
    "ml_gbt_stumps", "fs_time_range", "fs_latest_snapshot",
    "fs_snapshot_asof", "fs_snapshot_diff", "fs_scd2_history",
    "fs_tombstone_snapshot", "fs_point_lookup", "fs_asof_join",
    "fs_asof_join_tolerance", "fs_asof_join_forward",
    "fs_asof_join_nearest", "fs_latest_snapshot_maxby",
]

_R14_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r14.json (50/50 green) earned by
    # code unchanged in r15. Excluded on purpose (r15 changes their
    # implementation or a paired module, invalidating the evidence):
    #   ml_permutation_importance — r15 replaces the corpus-scale
    #     single-partition window with the boundary-stitched
    #     per-partition cyclic shift AND extends the permutation key
    #     to (h, rid, x1, x2, y) on both engines (rid is not unique
    #     in the testdata — r14 verdict item #1);
    #   udf_multimodal_{jpeg,tiff,gif,png,png_palette,wav,g711,phash}
    #   + dedup_phash_pairs — operators/multimodal.py changes in r15
    #     (TIFF LZW compression 5, decode_jpeg ValueError contract
    #     wrapper, encode_wav_raw RIFF pad byte) — the module-change
    #     rotation precedent from r14's udf_multimodal_wav note;
    #   stream_{dedup,ivf,ivfpq,kmv}_store/index twins,
    #   pipeline_curate_stream_twin, sim_ivfpq_retrained_floor — r15
    #     touches streaming/_fsutil.py (deferred retirement keep_old,
    #     reset_store version-suffix guard) — the maintainer-module
    #     rotation precedent from r13->r14.
    "er_blocking_quality", "fs_time_range", "fs_latest_snapshot",
    "fs_snapshot_asof", "fs_snapshot_diff", "fs_scd2_history",
    "fs_tombstone_snapshot", "fs_point_lookup", "fs_asof_join",
    "fs_asof_join_tolerance", "fs_asof_join_forward",
    "fs_asof_join_nearest", "fs_latest_snapshot_maxby",
    "fs_asof_join_agg", "fs_asof_join_union",
    "fs_asof_join_strategy_auto", "fs_resample_ffill_6h",
    "fs_incremental_agg", "fs_incremental_join", "fs_multi_group_asof",
    "fs_training_set_multi", "fs_ttl_snapshot", "fs_feature_drift_psi",
    "fs_rollup_reaggregation", "fs_bitemporal_asof",
    "fs_feature_vector_pivot", "fs_asof_join_composite",
    "fs_snapshot_drift_psi", "fs_late_data_impact",
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "join_semi_customers_with_open_orders",
    "join_anti_customers_without_orders", "agg_orders_by_status",
]

_R15_DRIVER_GREEN = [
    # hash-green rows in CORRECTNESS_r15.json (50/50 green) earned by
    # code unchanged in r16. Excluded on purpose (r16 changes their
    # implementation or a paired module, invalidating the evidence):
    #   udf_multimodal_{jpeg,tiff,gif,png,png_palette,wav,g711,phash}
    #   + dedup_phash_pairs — operators/multimodal.py changes in r16
    #     (subsampled-JPEG MCU generalization of encode_jpeg/
    #     decode_jpeg, stale-docstring refresh) — the module-change
    #     rotation precedent from r14/r15;
    #   source_avro_scan — sources/avro_py.py changes in r16 (snappy
    #     bounds check, executor-side schema-mismatch guard, general
    #     union decode, write path).
    "ml_permutation_importance", "graph_sssp_weighted",
    "stream_dedup_index_twin", "stream_ivf_index_twin",
    "stream_ivfpq_index_twin", "stream_kmv_store_twin",
    "pipeline_curate_stream_twin", "sim_ivfpq_retrained_floor",
    "sim_ann_recall_floor", "sim_ivf_nprobe_sweep",
    "sim_ivfpq_recall_floor", "sim_ivfpq_lloyd_recall_floor",
    "sim_ivfpq_trained_codebook_floor", "sim_ivf_kmeanspar_recall_floor",
    "er_blocking_quality", "fs_time_range", "fs_latest_snapshot",
    "fs_snapshot_asof", "fs_snapshot_diff", "fs_scd2_history",
    "fs_tombstone_snapshot", "fs_point_lookup", "fs_asof_join",
    "fs_asof_join_tolerance", "fs_asof_join_forward",
    "fs_asof_join_nearest", "fs_latest_snapshot_maxby",
    "fs_asof_join_agg", "fs_asof_join_union",
    "fs_asof_join_strategy_auto", "fs_resample_ffill_6h",
    "fs_incremental_agg", "fs_incremental_join", "fs_multi_group_asof",
    "fs_training_set_multi", "fs_ttl_snapshot", "fs_feature_drift_psi",
    "fs_rollup_reaggregation", "fs_bitemporal_asof",
    "fs_feature_vector_pivot",
]

# ROUND-17 MAINTENANCE (same discipline as every round): fold
# CORRECTNESS_r16.json's green rows into an _R16_DRIVER_GREEN list
# (EXCLUDING any query whose implementation r17 changes), then
# retarget _WINDOW_PRIORITY at whatever r17 invalidates.
_WINDOW_PRIORITY = [
    # Queries r16 invalidates — see the exclusion notes in
    # _R15_DRIVER_GREEN: re-prove them before anything else — plus
    # the r16 additions (subsampled JPEG, Avro unions/write).
    "udf_multimodal_jpeg_subsampled",  # NEW r16
    "udf_multimodal_jpeg_progressive",  # NEW r16: SOF2 de-gated
    "udf_multimodal_tiff_jpeg",  # NEW r16: compression-7 de-gated
    "udf_multimodal_jpeg", "udf_multimodal_tiff", "udf_multimodal_wav",
    "udf_multimodal_g711", "udf_multimodal_gif", "udf_multimodal_png",
    "udf_multimodal_png_palette", "udf_multimodal_phash",
    "dedup_phash_pairs",
    "source_avro_scan",
    "source_avro_union_scan",  # NEW r16: general unions de-gated
    "sink_avro_roundtrip",  # NEW r16: write path
    "sink_avro_timestamps",  # NEW r16: logical types end-to-end
]

# Unverified entries deliberately ordered at the BACK of the front
# when the front exceeds the 50-slot window. EMPTY this round: the 3
# r9-invalidated entries plus r9's new queries all fit in the 50-slot
# window, enforced by the spill-size assertion in _reorder_registry
# (ADVICE r5 #2).
_WINDOW_BACK: list[str] = []

_DRIVER_WINDOW = 50  # the driver checks the FIRST 50 registered queries


def _reorder_registry() -> None:
    green = (
        set(_R1_DRIVER_GREEN) | set(_R2_DRIVER_GREEN)
        | set(_R3_DRIVER_GREEN) | set(_R4_DRIVER_GREEN)
        | set(_R5_DRIVER_GREEN) | set(_R6_DRIVER_GREEN)
        | set(_R7_DRIVER_GREEN) | set(_R8_DRIVER_GREEN)
        | set(_R9_DRIVER_GREEN) | set(_R10_DRIVER_GREEN)
        | set(_R11_DRIVER_GREEN) | set(_R12_DRIVER_GREEN)
        | set(_R13_DRIVER_GREEN) | set(_R14_DRIVER_GREEN)
        | set(_R15_DRIVER_GREEN)
    )
    green -= set(_WINDOW_PRIORITY)
    priority = [n for n in _WINDOW_PRIORITY if n in REGISTRY]
    deprio = set(_WINDOW_BACK)
    rest = [
        n for n in REGISTRY
        if n not in green and n not in priority and n not in deprio
    ]
    front_exact = [n for n in rest if REGISTRY[n].oracle is not None]
    front_rows_only = [n for n in rest if REGISTRY[n].oracle is None]
    spill = [n for n in _WINDOW_BACK if n in REGISTRY and n not in green]
    # ADVICE r5 #2: the "exactly front_size - window names belong in
    # _WINDOW_BACK" invariant was comment-only — a drifted back-list let
    # uncurated unverified queries silently spill past the window. Fail
    # loudly instead: every spilled entry must be a CHOSEN one.
    n_unverified = len(priority) + len(front_exact) + len(front_rows_only) + len(spill)
    expected_spill = max(0, n_unverified - _DRIVER_WINDOW)
    if len(spill) != expected_spill:
        raise AssertionError(
            f"window curation drift: {n_unverified} driver-unverified "
            f"queries need {expected_spill} chosen spill entries in "
            f"_WINDOW_BACK, found {len(spill)}. Curate the spill "
            "explicitly (lowest-stakes entries last) instead of letting "
            "registration order pick which queries miss the driver gate."
        )
    # Spare window slots (when unverified queries don't fill all 50)
    # re-prove greens — spend them on the LEAST-RECENTLY verified ones
    # instead of whatever module-import order puts first (r16: the
    # import-order fill re-proved the same fs_* family two rounds
    # running while r1-era greens went 10+ rounds unchecked).
    rounds = [
        _R1_DRIVER_GREEN, _R2_DRIVER_GREEN, _R3_DRIVER_GREEN,
        _R4_DRIVER_GREEN, _R5_DRIVER_GREEN, _R6_DRIVER_GREEN,
        _R7_DRIVER_GREEN, _R8_DRIVER_GREEN, _R9_DRIVER_GREEN,
        _R10_DRIVER_GREEN, _R11_DRIVER_GREEN, _R12_DRIVER_GREEN,
        _R13_DRIVER_GREEN, _R14_DRIVER_GREEN, _R15_DRIVER_GREEN,
    ]
    latest_round = {}
    for i, lst in enumerate(rounds):
        for n in lst:
            latest_round[n] = i
    reg_pos = {n: i for i, n in enumerate(REGISTRY)}
    back = sorted(
        (n for n in REGISTRY if n in green),
        key=lambda n: (latest_round.get(n, -1), reg_pos[n]),
    )
    ordered = {
        n: REGISTRY[n]
        for n in priority + front_exact + front_rows_only + spill + back
    }
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["REGISTRY", "QuerySpec"]
