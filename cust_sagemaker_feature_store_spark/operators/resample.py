"""Time-grid resampling with forward fill (SURVEY.md §2.3/§2.4 [EXT]).

Regularizes an irregular event history onto a fixed time grid per key —
what training pipelines do before windowed feature extraction, and what
a scheduled batch-serving job materializes (the reference serves only
the single latest record per key; a grid generalizes that to "latest
record as of every grid instant").

Shape: the grid is generated per distinct key with ``sequence()`` (one
narrow explode after a keys-distinct shuffle — no driver-side range
loop), then filled by the union-and-window as-of strategy
(`operators/asof.asof_join_union`): ONE shuffle on the key, no
grid x history join materialization. At 100 TB this is the only shape
that survives — a grid-to-history range join would build |grid| x
|qualifying history| rows per key before pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .asof import asof_join_union


def resample_ffill(
    events: DataFrame,
    key_cols: str | list[str],
    time_col: str,
    start_iso: str,
    end_iso: str,
    interval_seconds: int,
    payload_cols: list[str],
    tie_breaker: str | None = None,
    grid_col: str = "grid_ts",
) -> DataFrame:
    """One row per (key, grid instant) from ``start_iso`` to ``end_iso``
    inclusive, stepping ``interval_seconds``, carrying the latest
    payload at-or-before each grid instant (nulls before a key's first
    event). Keys are the distinct keys present in ``events``."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    grid = (
        events.select(*keys)
        .distinct()
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.lit(start_iso).cast("timestamp"),
                    F.lit(end_iso).cast("timestamp"),
                    F.expr(f"INTERVAL {interval_seconds} SECONDS"),
                )
            ).alias(grid_col),
        )
    )
    extra = [tie_breaker] if tie_breaker and tie_breaker not in payload_cols else []
    feat = events.select(*keys, time_col, *payload_cols, *extra)
    return asof_join_union(
        grid,
        feat,
        on=keys,
        probe_time=grid_col,
        feature_time=time_col,
        feature_cols=payload_cols,
        tie_breaker=tie_breaker,
    )
