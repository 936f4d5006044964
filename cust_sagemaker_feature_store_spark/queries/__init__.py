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
from . import similarity_q  # noqa: E402,F401
from . import functions_q  # noqa: E402,F401

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
    "sim_ivf_topk",
]

# First-in-window priority: the two queries un-broken by the r4
# TIMESTAMP_NTZ catalog fix — freshly-repaired behavior gets re-checked
# by the external gate before anything else.
_WINDOW_PRIORITY = ["range_join_event_followups", "events_sessionize"]

# ROUND-5 MAINTENANCE (do this first next round): read
# CORRECTNESS_r04.json, add an _R4_DRIVER_GREEN list holding its
# hash-green names (and rows-only names whose code is unchanged), fold
# it into `green` below, and empty/retarget _WINDOW_PRIORITY. The r4
# window leads with: the two repaired queries, dedup_clusters
# (star-contraction rewrite), and the ~20 new r4 queries (floors,
# gram/OLS/IVM, funnel/cohort/SCD2/diff/trailing, repetition/
# contamination/canonical/triangle/cross-modal, simhash-md5 twins).
# Evidence invalidation applies to BOTH code changes and input-schema
# drift — see the policy note above and tests/test_testdata_contract.py.


def _reorder_registry() -> None:
    green = (
        set(_R1_DRIVER_GREEN) | set(_R2_DRIVER_GREEN) | set(_R3_DRIVER_GREEN)
    )
    priority = [n for n in _WINDOW_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in green and n not in priority]
    front_exact = [n for n in rest if REGISTRY[n].oracle is not None]
    front_rows_only = [n for n in rest if REGISTRY[n].oracle is None]
    back = [n for n in REGISTRY if n in green]
    ordered = {
        n: REGISTRY[n]
        for n in priority + front_exact + front_rows_only + back
    }
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["REGISTRY", "QuerySpec"]
