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
