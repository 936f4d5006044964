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
