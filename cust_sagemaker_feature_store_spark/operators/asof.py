"""Point-in-time (as-of) join (SURVEY.md §2.3 [EXT]).

The canonical feature-store offline operation: for each probe row
(entity, timestamp) fetch the latest feature row for that entity at or
before the probe time. The reference approximates this with a global
time-range filter plus client-side sort (reference:
historical_features.py:28-31,67-68); we implement the real thing.

Two strategies:

- `asof_join` — join on key with a range predicate, then keep the max
  feature time per probe row via max_by. Partial aggregation keeps the
  shuffle bounded by probe rows; AQE handles the skew. Right default
  for wide time ranges.
- `asof_join_union` — the union-and-sort technique: tag probes and
  features, union, and use a single `last(value, ignorenulls)` window
  ordered by time per key. One shuffle, no join blow-up; the scale path
  when one entity has many probes AND many feature rows (the join form
  would materialize their cross product before aggregating).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    features: DataFrame,
    on: str | list[str],
    probe_time: str,
    feature_time: str,
    how: str = "left",
    tolerance_seconds: int | None = None,
    tie_breaker: str | None = None,
) -> DataFrame:
    """For each probe row, attach the feature row with the greatest
    `feature_time` <= `probe_time` for the same key(s); `tie_breaker`
    (a feature column, e.g. an ingest sequence) makes equal-timestamp
    picks deterministic.

    Output columns: all probe columns, then the feature payload columns
    (feature time included), null when no feature row qualifies and
    how='left'.
    """
    keys = [on] if isinstance(on, str) else list(on)
    f = features
    payload = [c for c in f.columns if c not in keys]
    cond = F.col(f"__f.{feature_time}") <= F.col(f"__p.{probe_time}")
    if tolerance_seconds is not None:
        cond = cond & (
            F.col(f"__f.{feature_time}")
            >= F.col(f"__p.{probe_time}") - F.expr(f"INTERVAL {tolerance_seconds} SECONDS")
        )
    p, fa = probe.alias("__p"), f.alias("__f")
    join_cond = cond
    for k in keys:
        join_cond = (F.col(f"__p.{k}") == F.col(f"__f.{k}")) & join_cond
    joined = p.join(fa, join_cond, "inner")

    probe_cols = probe.columns
    ordering = (
        F.struct(F.col(f"__f.{feature_time}"), F.col(f"__f.{tie_breaker}"))
        if tie_breaker
        else F.col(f"__f.{feature_time}")
    )
    # max_by over the feature time per probe row: partial-agg friendly.
    agg = (
        joined.groupBy(*[F.col(f"__p.{c}").alias(c) for c in probe_cols])
        .agg(
            F.max_by(
                F.struct(*[F.col(f"__f.{c}").alias(c) for c in payload]),
                ordering,
            ).alias("__feat")
        )
        .select(*probe_cols, *[F.col(f"__feat.{c}").alias(c) for c in payload])
    )
    if how == "inner":
        return agg
    # left: reattach probes with no qualifying feature row
    return probe.join(agg.select(*probe_cols, *payload), probe_cols, "left")


def asof_join_union(
    probe: DataFrame,
    features: DataFrame,
    on: str | list[str],
    probe_time: str,
    feature_time: str,
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """Union-and-window as-of join: one shuffle on the key, no join
    explosion. Features sort before probes at equal timestamps (a
    feature row AT the probe time is visible to it)."""
    keys = [on] if isinstance(on, str) else list(on)
    feature_cols = feature_cols or [
        c for c in features.columns if c not in keys and c != feature_time
    ]
    probe_payload = [c for c in probe.columns if c not in keys]

    f_tagged = features.select(
        *keys,
        F.col(feature_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in feature_cols],
        *[F.lit(None).cast(dict(probe.dtypes)[c]).alias(f"__p_{c}") for c in probe_payload],
    )
    p_tagged = probe.select(
        *keys,
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(features.dtypes)[c]).alias(c) for c in feature_cols],
        *[F.col(c).alias(f"__p_{c}") for c in probe_payload],
    )
    unioned = f_tagged.unionByName(p_tagged)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *keys,
        "__t",
        "__side",
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in feature_cols],
        *[F.col(f"__p_{c}") for c in probe_payload],
    )
    return filled.filter(F.col("__side") == 1).select(
        *keys,
        F.col("__t").alias(probe_time),
        *[F.col(f"__p_{c}").alias(c) for c in probe_payload],
        *feature_cols,
    )
