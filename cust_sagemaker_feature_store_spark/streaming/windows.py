"""Streaming feature engineering (SURVEY.md §2.9 [EXT]): watermarked
event-time windows over a stream.

The reference has no windowed aggregates — its only late-data semantic
is "an old record lands in history but never surfaces online" (A1's
max-wins rule). These add the standard Structured Streaming surface:
tumbling/sliding window aggregates with a watermark bounding state, and
a stateful session aggregation. Batch twins of these exact queries are
oracle-checked in queries/events_q.py (events_tumbling_hourly,
events_sessionize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window aggregate. State per (window, keys)
    is dropped once the watermark passes window end — bounded memory on
    an unbounded stream."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_size).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def sliding_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window per-user activity rate."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_size, slide).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_events",
        )
    )


def stream_dedup(
    stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """At-least-once source -> effectively-once stream: drop duplicate
    keys arriving within the watermark horizon. State holds one entry
    per key seen in the horizon and is evicted as the watermark
    advances — bounded memory, unlike an unbounded dropDuplicates."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def session_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (gap-close semantics) per user — the streaming
    twin of the batch events_sessionize query."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "session_value"
            ),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )
