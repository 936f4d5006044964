"""Latest-record-per-key (SURVEY.md §2.4 A1) — the engine's core aggregate.

The reference's online store keeps exactly one record per key: the one
with the greatest event time; later writes win ties (reference:
update_feature_store.py:18-19 chronological sort + :26-27,:38-47 dict
overwrite; consumed at real_time_inference.py:16-19). We reproduce that
with a deterministic tie-break on `(event_time, tie_breaker)` where the
tie-breaker is a monotone ingest sequence, making the result independent
of arrival order (SURVEY.md §7.3).

Scale notes: both forms are a single hash-shuffle on the key.
`latest_snapshot` (max_by) does a partial (map-side) aggregate before
the exchange, so shuffled bytes are O(distinct keys), not O(rows) — the
form to prefer at 100 TB. `latest_snapshot_window` shuffles all rows
but preserves exact row identity; it is the oracle-checkable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot_window(
    df: DataFrame,
    key_cols: list[str] | str,
    event_time_col: str,
    tie_breaker: str | None = None,
) -> DataFrame:
    """Exact A1 via ranking window: row_number()==1 per key ordered by
    (event_time desc, tie_breaker desc)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.col(event_time_col).desc()]
    if tie_breaker:
        order.append(F.col(tie_breaker).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_snapshot(
    df: DataFrame,
    key_cols: list[str] | str,
    event_time_col: str,
    tie_breaker: str | None = None,
) -> DataFrame:
    """A1 via `max_by(struct(*), struct(event_time, tie))` — partial-agg
    friendly, the scale path. Output columns match the input frame."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ordering = (
        F.struct(event_time_col, tie_breaker) if tie_breaker else F.col(event_time_col)
    )
    payload_cols = [c for c in df.columns if c not in keys]
    agg = df.groupBy(*keys).agg(
        F.max_by(F.struct(*payload_cols), ordering).alias("__latest")
    )
    return agg.select(
        *keys, *[F.col(f"__latest.{c}").alias(c) for c in payload_cols]
    )
