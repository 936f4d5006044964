from .asof import asof_join, asof_join_agg, asof_join_auto, asof_join_union
from .latest import latest_snapshot, latest_snapshot_window

__all__ = [
    "asof_join", "asof_join_agg", "asof_join_auto", "asof_join_union",
    "latest_snapshot", "latest_snapshot_window",
]
