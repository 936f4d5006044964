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
# order (CORRECTNESS_r01.json = exactly the first 50). Round 1 verified 45
# of them green; re-listing those first would waste the whole round-2
# window, leaving the LLM-pipeline half of the engine (text/dedup/
# similarity/events/functions) permanently "claimed but unverified".
#
# So: queries WITHOUT a prior driver-green row go first — exact-oracle
# ones (hard hash evidence) ahead of rows-only ones (weaker check) —
# and the 45 r1-green queries go last; their evidence is already on
# record. Newly added exact-oracle queries automatically land in the
# window until it fills.
_R1_DRIVER_GREEN = [
    # green rows in CORRECTNESS_r01.json. Excluded on purpose:
    # q12_priority_by_returnflag / pivot_priority_by_status (r1 hash
    # FAIL, oracle fixed this round) and join_anti_customers_without_
    # orders / q22_idle_customers / q9_profit_by_nation_year (r1 passed
    # vacuously with 0 rows, predicates loosened this round) — all five
    # need fresh driver rows.
    "fs_time_range", "fs_latest_snapshot", "fs_snapshot_asof",
    "fs_point_lookup", "fs_asof_join", "fs_latest_snapshot_maxby",
    "fs_asof_join_agg", "fs_asof_join_union", "fs_multi_group_asof",
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
    "sample_hash_deterministic", "range_join_event_followups",
    "q8_market_share", "q11_important_parts", "q15_top_supplier",
    "agg_percentiles_exact",
]


def _reorder_registry() -> None:
    green = set(_R1_DRIVER_GREEN)
    front_exact = [
        n for n, s in REGISTRY.items() if n not in green and s.oracle is not None
    ]
    front_rows_only = [
        n for n, s in REGISTRY.items() if n not in green and s.oracle is None
    ]
    back = [n for n in REGISTRY if n in green]
    ordered = {n: REGISTRY[n] for n in front_exact + front_rows_only + back}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["REGISTRY", "QuerySpec"]
