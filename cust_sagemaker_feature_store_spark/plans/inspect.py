"""Physical-plan inspection (SURVEY.md §4): make 'the plan we want' an
assertable property instead of something eyeballed once.

At 100 TB the difference between a broadcast join and a sort-merge
join, or a pushed filter and a post-scan filter, is the difference
between minutes and hours. tests/test_plans.py pins the critical plan
shapes so a regression (lost pushdown, lost partial agg, surprise
shuffle) fails CI rather than surfacing in production."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded)."""
    plan = plan_string(df)
    return sum(
        1
        for line in plan.splitlines()
        if ") Exchange" in line or line.strip().startswith("Exchange ")
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_string(df)


def uses_take_ordered(df: DataFrame) -> bool:
    """True when orderBy+limit compiled to TakeOrderedAndProject
    (per-partition top-k, no global sort)."""
    return "TakeOrderedAndProject" in plan_string(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when the plan aggregates before AND after the exchange
    (map-side combine)."""
    plan = plan_string(df)
    lines = plan.splitlines()
    agg_idx = [
        i
        for i, l in enumerate(lines)
        if ") HashAggregate" in l or ") SortAggregate" in l
    ]
    exch_idx = [i for i, l in enumerate(lines) if ") Exchange" in l]
    # formatted output lists operators leaf-first: partial agg appears
    # before the exchange line, final after
    return bool(agg_idx and exch_idx and min(agg_idx) < max(exch_idx) < max(agg_idx))


def pushed_filters(df: DataFrame) -> list[str]:
    """The filters that reached the parquet scan."""
    out = []
    for line in plan_string(df).splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            out.append(s.removeprefix("PushedFilters:").strip())
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """The partition-pruning predicates applied at each scan."""
    out = []
    for line in plan_string(df).splitlines():
        s = line.strip()
        if s.startswith("PartitionFilters:"):
            out.append(s.removeprefix("PartitionFilters:").strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — column pruning evidence."""
    out = []
    for line in plan_string(df).splitlines():
        s = line.strip()
        if s.startswith("ReadSchema:"):
            out.append(s.removeprefix("ReadSchema:").strip())
    return out


def has_window_group_limit(df: DataFrame) -> bool:
    """True when a rank<=k window filter was pushed to a partial
    per-partition limit (Spark's WindowGroupLimit)."""
    return "WindowGroupLimit" in plan_string(df)
