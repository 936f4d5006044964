"""Stream-stream joins (SURVEY.md §2.9 [EXT]).

Structured Streaming's watermarked stream-stream join: each side's
watermark bounds how long the other side's rows are buffered in the
state store, so an unbounded pair of streams joins in bounded memory.
The canonical feature-store use: attribute each purchase event to the
click that preceded it within an attribution window — the streaming
twin of the batch range join (range_join_event_followups) and as-of
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_click_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    window: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner stream-stream join: purchases to prior clicks by the same
    user within `window`. Both sides carry watermarks; click state older
    than watermark + window is evicted.

    Expects event columns (event_id, ts, user_id, value); output one row
    per qualifying (click, purchase) pair.
    """
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


def enrich_with_features(
    stream: DataFrame,
    snapshot: DataFrame,
    on: str,
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """Stream-static serving join: attach the online snapshot's latest
    features to each live event — the streaming form of the reference's
    per-request feature fetch (reference: real_time_inference.py:16-25),
    which pulled one record per inference call.

    Structured Streaming re-plans the static side each micro-batch, so
    a snapshot maintained by a concurrent upsert (core/online.py) is
    picked up at batch boundaries — serving lag is one trigger, with no
    state store involved. The snapshot side is broadcastable (it is
    keys x features, not history); events with no feature row keep
    nulls (left join) so the serving layer can apply defaults
    (functions/casts.double_with_default) explicitly.
    """
    feats = snapshot if feature_cols is None else snapshot.select(
        on, *feature_cols
    )
    return stream.join(F.broadcast(feats), on, "left")


def event_followups(
    first: DataFrame,
    nxt: DataFrame,
    window: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream INTERVAL self-join: every (first,
    next) event pair by the same user with 0 < next.ts − first.ts <=
    `window` — the streaming execution of the batch range join
    (queries/relational3_q.range_join_event_followups), where the
    reference's equivalent is an offline Athena pass.

    Both sides carry watermarks, so Structured Streaming buffers each
    side only watermark + window deep: the state bound that makes an
    unbounded pair of streams joinable. Pairs are emitted in the
    micro-batch where the LATER side arrives; a checkpoint restart
    recovers the buffered side so cross-batch pairs are exactly-once
    (tests/test_streaming.py::test_stream_interval_join_restart_matches_batch).

    Expects event columns (event_id, ts, user_id, event_type); output
    one row per qualifying pair with both ids/types/timestamps.
    """
    a = first.withWatermark("ts", watermark).select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("first_id"),
        F.col("event_type").alias("first_type"),
        F.col("ts").alias("first_ts"),
    )
    b = nxt.withWatermark("ts", watermark).select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("next_id"),
        F.col("event_type").alias("next_type"),
        F.col("ts").alias("next_ts"),
    )
    return a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("next_ts") > F.col("first_ts"))
        & (F.col("next_ts") <= F.col("first_ts") + F.expr(f"INTERVAL {window}")),
        "inner",
    ).select(
        F.col("a_user").alias("user_id"),
        "first_id",
        "first_type",
        "first_ts",
        "next_id",
        "next_type",
        "next_ts",
    )


def enrich_asof_snapshot(
    stream: DataFrame,
    snapshot: DataFrame,
    on: str = "user_id",
    event_ts: str = "ts",
    feature_ts: str = "feature_ts",
    feature_cols: list[str] | None = None,
    staleness: str = "6 hours",
) -> DataFrame:
    """Stream-static AS-OF probe with a staleness budget — the
    streaming form of the tolerance as-of join (operators/asof.py),
    probing the ONLINE snapshot (one latest row per key, the
    core/online.py layout) instead of the full feature history.

    Per event: the snapshot's feature row for the key is attached only
    when it is usable as-of the event — feature_ts <= event_ts (replay
    can see "future" features; live serving cannot) AND event_ts −
    feature_ts <= `staleness` (the budget: features older than the
    budget are worse than no features for training parity). Unusable
    or missing features come through as NULLs with `fresh` = false, so
    the serving layer applies defaults explicitly.

    Scale/streaming shape: the snapshot side is keys x features (not
    history) and broadcast, so the probe is a narrow per-row transform
    — no state store, no shuffle, append-mode safe; Structured
    Streaming re-plans the static side each micro-batch, picking up
    concurrent online upserts at trigger boundaries. A checkpoint
    restart is stateless-exact (tests/test_streaming.py::
    test_stream_asof_enrich_restart_matches_batch)."""
    feats = snapshot if feature_cols is None else snapshot.select(
        on, feature_ts, *feature_cols
    )
    fresh = (F.col(feature_ts) <= F.col(event_ts)) & (
        F.col(feature_ts)
        >= F.col(event_ts) - F.expr(f"INTERVAL {staleness}")
    )
    # pin `fresh` BEFORE nulling feature columns: the predicate reads
    # feature_ts, which the nulling below replaces
    out = stream.join(F.broadcast(feats), on, "left").withColumn(
        "fresh", F.coalesce(fresh, F.lit(False))
    )
    for c in feats.columns:
        if c != on:
            out = out.withColumn(c, F.when(F.col("fresh"), F.col(c)))
    return out
