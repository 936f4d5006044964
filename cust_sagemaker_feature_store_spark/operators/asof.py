"""Point-in-time (as-of) join (SURVEY.md §2.3 [EXT]).

The canonical feature-store offline operation: for each probe row
(entity, timestamp) fetch the latest feature row for that entity at or
before the probe time. The reference approximates this with a global
time-range filter plus client-side sort (reference:
historical_features.py:28-31,67-68); we implement the real thing.

Three strategies, one semantics (pinned by the shared DuckDB oracle):

- `asof_join` (default) — ONE left join on the key + range predicate,
  then `row_number()==1` per probe row ordered by feature time desc.
  Spark's WindowGroupLimit pushes the rank<=1 limit map-side, and left
  semantics come for free (the unmatched row is its own rank-1), so the
  whole thing is join + one exchange. Small feature side broadcasts.
- `asof_join_agg` — inner join + partial max_by aggregation; shuffles
  only (probe, best-feature) pairs, at the cost of a second join to
  reattach unmatched probes. Wins when probes match MANY feature rows
  (partial agg collapses them before the exchange).
- `asof_join_union` — union-and-window: tag both sides, one shuffle on
  the key, `last(ignorenulls)` carries features forward. No join at
  all; the scale path when one entity has many probes AND many feature
  rows (a join would materialize the cross product).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _range_condition(
    keys: list[str],
    probe_time: str,
    feature_time: str,
    tolerance_seconds: int | None,
    direction: str = "backward",
) -> Column:
    ft, pt = F.col(f"__f.{feature_time}"), F.col(f"__p.{probe_time}")
    tol = (
        F.expr(f"INTERVAL {tolerance_seconds} SECONDS")
        if tolerance_seconds is not None
        else None
    )
    if direction == "backward":
        cond = ft <= pt
        if tol is not None:
            cond = cond & (ft >= pt - tol)
    elif direction == "forward":
        cond = ft >= pt
        if tol is not None:
            cond = cond & (ft <= pt + tol)
    elif direction == "nearest":
        cond = (ft >= pt - tol) & (ft <= pt + tol) if tol is not None else F.lit(True)
    else:
        raise ValueError(f"unknown as-of direction {direction!r}")
    for k in keys:
        cond = (F.col(f"__p.{k}") == F.col(f"__f.{k}")) & cond
    return cond


def asof_join(
    probe: DataFrame,
    features: DataFrame,
    on: str | list[str],
    probe_time: str,
    feature_time: str,
    how: str = "left",
    tolerance_seconds: int | None = None,
    tie_breaker: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each probe row, attach the qualifying feature row for the
    same key(s); `tie_breaker` (a feature column, e.g. an ingest
    sequence) makes equal-timestamp picks deterministic.

    `direction` (pandas merge_asof semantics, [EXT] vs the reference):
    - 'backward' (default): greatest `feature_time` <= `probe_time`;
    - 'forward': smallest `feature_time` >= `probe_time`;
    - 'nearest': smallest |feature_time - probe_time| within the
      tolerance (ties prefer the backward candidate — the one that was
      actually knowable at probe time). Without a tolerance, 'nearest'
      scans each key's whole history; bound it when the feature side
      is large.

    Output columns: all probe columns, then the feature payload columns
    (feature time included), null when no feature row qualifies and
    how='left'.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in features.columns if c not in keys]
    # Internal unique probe-row id: the rank-1 window partitions on it, so
    # fully duplicate probe rows each keep their own output row (without
    # it, partitioning on the probe columns silently collapsed them — a
    # multiplicity bug flagged in round-1 review). The id is per-row
    # identity only; its values never surface or order anything.
    p = probe.withColumn("__pid", F.monotonically_increasing_id()).alias("__p")
    fa = features.alias("__f")
    joined = p.join(
        fa,
        _range_condition(keys, probe_time, feature_time, tolerance_seconds, direction),
        how,
    )
    ft, pt = F.col(f"__f.{feature_time}"), F.col(f"__p.{probe_time}")
    if direction == "backward":
        order = [ft.desc_nulls_last()]
    elif direction == "forward":
        order = [ft.asc_nulls_last()]
    else:  # nearest: exact microsecond distance, backward wins ties
        # cast tolerates ISO-string time columns, which compare fine for
        # backward/forward but need real instants for distance math
        dist = F.abs(
            F.unix_micros(ft.cast("timestamp")) - F.unix_micros(pt.cast("timestamp"))
        )
        order = [dist.asc_nulls_last(), F.when(ft <= pt, 0).otherwise(1).asc_nulls_last()]
    if tie_breaker:
        order.append(F.col(f"__f.{tie_breaker}").desc_nulls_last())
    w = Window.partitionBy(F.col("__p.__pid")).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(f"__p.{c}").alias(c) for c in probe.columns],
            *[F.col(f"__f.{c}").alias(c) for c in payload],
        )
    )


def asof_join_agg(
    probe: DataFrame,
    features: DataFrame,
    on: str | list[str],
    probe_time: str,
    feature_time: str,
    how: str = "left",
    tolerance_seconds: int | None = None,
    tie_breaker: str | None = None,
) -> DataFrame:
    """max_by variant: partial aggregation collapses the per-probe
    candidate set map-side before the shuffle — prefer when probes
    match many feature rows each."""
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in features.columns if c not in keys]
    p, fa = probe.alias("__p"), features.alias("__f")
    joined = p.join(
        fa, _range_condition(keys, probe_time, feature_time, tolerance_seconds), "inner"
    )
    probe_cols = probe.columns
    ordering = (
        F.struct(F.col(f"__f.{feature_time}"), F.col(f"__f.{tie_breaker}"))
        if tie_breaker
        else F.col(f"__f.{feature_time}")
    )
    agg = (
        joined.groupBy(*[F.col(f"__p.{c}").alias(c) for c in probe_cols])
        .agg(
            F.max_by(
                F.struct(*[F.col(f"__f.{c}").alias(c) for c in payload]), ordering
            ).alias("__feat")
        )
        .select(*probe_cols, *[F.col(f"__feat.{c}").alias(c) for c in payload])
    )
    if how == "inner":
        return agg
    return probe.join(agg, probe_cols, "left")


def asof_join_union(
    probe: DataFrame,
    features: DataFrame,
    on: str | list[str],
    probe_time: str,
    feature_time: str,
    feature_cols: list[str] | None = None,
    tie_breaker: str | None = None,
) -> DataFrame:
    """Union-and-window as-of join: one shuffle on the key, no join
    explosion. Features sort before probes at equal timestamps (a
    feature row AT the probe time is visible to it).

    The feature payload travels as ONE struct column filled with a
    single ``last(ignorenulls)``, so the winning feature row is selected
    atomically — per-column fills could stitch together a mixed row
    (column A from the latest row, column B backfilled from an older one
    when the latest held a NULL) that no real feature row ever was.
    `tie_breaker` (a feature column, e.g. an ingest sequence; greatest
    wins) makes equal-timestamp picks deterministic, matching the
    ``row_number(... DESC, tie DESC)`` semantics of the join strategy.
    """
    keys = [on] if isinstance(on, str) else list(on)
    feature_cols = feature_cols or [
        c for c in features.columns if c not in keys and c != feature_time
    ]
    probe_payload = [c for c in probe.columns if c not in keys and c != probe_time]

    feat_struct_type = (
        "struct<"
        + ",".join(f"{c}:{dict(features.dtypes)[c]}" for c in feature_cols)
        + ">"
    )
    tie_type = dict(features.dtypes)[tie_breaker] if tie_breaker else "int"
    f_tagged = features.select(
        *keys,
        F.col(feature_time).alias("__t"),
        F.lit(0).alias("__side"),
        (F.col(tie_breaker) if tie_breaker else F.lit(0)).cast(tie_type).alias("__tie"),
        F.struct(*[F.col(c) for c in feature_cols]).alias("__feat"),
        *[
            F.lit(None).cast(dict(probe.dtypes)[c]).alias(f"__p_{c}")
            for c in probe_payload
        ],
    )
    p_tagged = probe.select(
        *keys,
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tie_type).alias("__tie"),
        F.lit(None).cast(feat_struct_type).alias("__feat"),
        *[F.col(c).alias(f"__p_{c}") for c in probe_payload],
    )
    unioned = f_tagged.unionByName(p_tagged)
    # Order: time, then side (features before the probes they serve),
    # then tie ascending — so among equal-time feature rows the frame's
    # last non-null struct is the greatest-tie row, atomically.
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side", F.col("__tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *keys,
        "__t",
        "__side",
        F.last(F.col("__feat"), ignorenulls=True).over(w).alias("__feat"),
        *[F.col(f"__p_{c}") for c in probe_payload],
    )
    return filled.filter(F.col("__side") == 1).select(
        *keys,
        F.col("__t").alias(probe_time),
        *[F.col(f"__p_{c}").alias(c) for c in probe_payload],
        *[F.col(f"__feat.{c}").alias(c) for c in feature_cols],
    )


def asof_join_auto(
    probe: DataFrame,
    features: DataFrame,
    on: str | list[str],
    probe_time: str,
    feature_time: str,
    how: str = "left",
    tolerance_seconds: int | None = None,
    tie_breaker: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Strategy-picking as-of join.

    The default join-then-rank strategy materializes probe x
    qualifying-history per key before WindowGroupLimit trims it — fine
    when a tolerance bounds the history each probe can see, a
    scale-killer when the feature side is unbounded (every probe joins
    its key's entire past). Rule:

    - bounded candidates (``tolerance_seconds`` set): join + rank —
      broadcastable, WindowGroupLimit prunes map-side;
    - unbounded left join: union-and-window — one shuffle on the key,
      never materializes the cross product;
    - unbounded inner/other: max_by aggregation — partial agg collapses
      candidates map-side before the exchange.

    Non-backward directions always take join + rank: forward/nearest
    are lookahead semantics the carry-forward union window can't
    express, and they're near-always tolerance-bounded in practice.
    """
    if direction != "backward" or tolerance_seconds is not None:
        return asof_join(
            probe, features, on, probe_time, feature_time, how,
            tolerance_seconds, tie_breaker, direction,
        )
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in features.columns if c not in keys]
    if how == "left":
        joined = asof_join_union(
            probe, features, on, probe_time, feature_time,
            feature_cols=payload, tie_breaker=tie_breaker,
        )
        return joined.select(*probe.columns, *payload)
    return asof_join_agg(
        probe, features, on, probe_time, feature_time, how, None, tie_breaker
    )
