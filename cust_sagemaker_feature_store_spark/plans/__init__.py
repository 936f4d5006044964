from .inspect import (
    count_exchanges,
    has_partial_aggregate,
    has_window_group_limit,
    partition_filters,
    plan_string,
    pushed_filters,
    read_schemas,
    uses_broadcast_join,
    uses_sort_merge_join,
    uses_take_ordered,
)

__all__ = [
    "count_exchanges", "has_partial_aggregate", "has_window_group_limit",
    "partition_filters", "plan_string", "pushed_filters", "read_schemas",
    "uses_broadcast_join", "uses_sort_merge_join", "uses_take_ordered",
]
