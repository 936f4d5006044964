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


def count_min_counters(
    stream: DataFrame,
    key_col: str,
    hash_a: tuple[int, ...],
    hash_b: tuple[int, ...],
    prime: int,
    width: int,
) -> DataFrame:
    """Count-Min sketch counters maintained ON THE STREAM: each row
    increments one bucket per hash row, so the counter table is a plain
    streaming aggregation (complete/update mode) whose state is the
    depth x width cells — CONSTANT memory on an unbounded stream, the
    property that makes the sketch the streaming heavy-hitter primitive
    (point estimate = min over rows of the bucket counters, one-sided
    >= true). Same engine-portable multiplicative hashes as the batch
    query (queries/functions_q.agg_count_min_sketch), so shard/stream
    counters merge with batch counters BY ADDITION. Works identically
    on batch frames (the twin's oracle pins the arithmetic)."""
    depth = len(hash_a)
    if depth != len(hash_b) or depth < 1:
        raise ValueError("hash_a and hash_b must be equal-length, non-empty")
    k = F.col(key_col)
    return (
        stream.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            (((k * hash_a[i] + hash_b[i]) % prime) % width)
                            .cast("long")
                            .alias("b"),
                        )
                        for i in range(depth)
                    ]
                )
            ).alias("s")
        )
        .select(F.col("s.i").alias("i"), F.col("s.b").alias("b"))
        .groupBy("i", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def hll_register_counters(stream: DataFrame, key_col: str) -> DataFrame:
    """HyperLogLog registers maintained ON THE STREAM: the register
    table is a plain streaming MAX aggregation over (bucket, rho), so
    state is exactly m = 64 cells on an unbounded stream — the
    distinct-count companion to `count_min_counters`'s frequency
    cells. Registers merge with batch/shard registers by MAX (the HLL
    merge operator), and because the bucket/rho arithmetic is the
    portable md5-derived hash48 (operators/sketches.hll_registers),
    the cells are oracle-exact in DuckDB — Spark's built-in HLL++
    state is engine-private and offers no such twin. Works identically
    on batch frames (stream_hll_registers_twin pins the arithmetic);
    stream == batch register equality is pinned by
    tests/test_streaming.py."""
    from ..operators.sketches import hll_registers

    return hll_registers(stream, [], F.col(key_col))


def histogram_bin_counters(
    stream: DataFrame, value_col: str, bin_width: int
) -> DataFrame:
    """Fixed-bin histogram counters maintained ON THE STREAM: one
    grouped COUNT per value bin, state = O(value range / bin width)
    cells on an unbounded stream — the quantile companion to
    `count_min_counters` (frequency) and `hll_register_counters`
    (cardinality). Counters merge with batch/shard histograms by
    ADDITION, and quantiles read off the cumulative counts with the
    agg_histogram_quantiles interpolation, so a serving layer can
    answer p50/p95 from the live counter table at any moment. Works
    identically on batch frames (stream_histogram_twin pins the bin
    arithmetic); stream == batch counter equality is pinned by
    tests/test_streaming.py."""
    return (
        stream.select(
            F.expr(
                f"CAST(ROUND({value_col} * 100) AS BIGINT)"
                f" div {bin_width} "
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
