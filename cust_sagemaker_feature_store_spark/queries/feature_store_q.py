"""Feature-store query surface (SURVEY.md §2.1-2.4, §2.3 [EXT] as-of).

The `events` table plays the role of a feature group: record identifier
`user_id`, event time `ts` (SURVEY.md §7.1 step 3 — the reference's
historical query semantics re-keyed onto driver testdata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..core.feature_store import DELETED_COL
from ..operators.asof import (
    asof_join,
    asof_join_agg,
    asof_join_auto,
    asof_join_union,
)
from ..operators.latest import latest_snapshot, latest_snapshot_window
from ..operators.resample import resample_ffill
from .registry import REGISTRY, iso, register, sql_davg, sql_dsum, sql_iso

TIME_LO = "2024-01-05T00:00:00Z"
TIME_HI = "2024-01-20T23:59:59Z"


@register(
    "fs_time_range",
    oracle=f"""
SELECT event_id, user_id, event_type, value,
       {sql_iso('ts')} AS event_time
FROM events
WHERE {sql_iso('ts')} BETWEEN '{TIME_LO}' AND '{TIME_HI}'
""",
    description=(
        "P1 projection + P2 inclusive BETWEEN on the ISO-8601-Z string "
        "event time — the reference's canonical offline query "
        "(reference: historical_features.py:28-31)."
    ),
)
def fs_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("event_time", iso("ts"))
        .filter(F.col("event_time").between(TIME_LO, TIME_HI))
        .select("event_id", "user_id", "event_type", "value", "event_time")
    )


_LATEST_ORACLE = f"""
SELECT user_id, event_id, event_type, value, {sql_iso('ts')} AS event_time
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register(
    "fs_latest_snapshot",
    oracle=_LATEST_ORACLE,
    description=(
        "A1 latest-record-per-key — the online store's contents "
        "(reference: update_feature_store.py:26-47); event_id is the "
        "deterministic later-write-wins tie-break."
    ),
)
def fs_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    latest = latest_snapshot_window(ev, "user_id", "ts", tie_breaker="event_id")
    return latest.select(
        "user_id", "event_id", "event_type", "value", iso("ts").alias("event_time")
    )


@register(
    "fs_snapshot_asof",
    oracle=f"""
SELECT user_id, event_id, event_type, value, {sql_iso('ts')} AS event_time
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
) WHERE rn = 1
""",
    description=(
        "Point-in-time snapshot reconstruction: the online view AS OF a "
        "past instant (latest record per key at or before the cutoff) — "
        "what training-set reproduction needs and a KV online store "
        "cannot answer; the append-only history makes it one filtered "
        "window pass."
    ),
)
def fs_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") <= F.lit("2024-01-15 00:00:00").cast("timestamp")
    )
    latest = latest_snapshot_window(ev, "user_id", "ts", tie_breaker="event_id")
    return latest.select(
        "user_id", "event_id", "event_type", "value", iso("ts").alias("event_time")
    )


DIFF_T1 = "2024-01-10 00:00:00"
DIFF_T2 = "2024-01-20 00:00:00"


@register(
    "fs_snapshot_diff",
    oracle=f"""
WITH s1 AS (
  SELECT user_id, event_id, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts <= TIMESTAMP '{DIFF_T1}'
  ) WHERE rn = 1
),
s2 AS (
  SELECT user_id, event_id, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts <= TIMESTAMP '{DIFF_T2}'
  ) WHERE rn = 1
)
SELECT COALESCE(s2.user_id, s1.user_id) AS user_id,
       CASE WHEN s1.user_id IS NULL THEN 'added'
            WHEN s2.user_id IS NULL THEN 'removed'
            WHEN s1.event_id <> s2.event_id THEN 'changed'
            ELSE 'unchanged' END AS status,
       s1.event_id AS old_event_id, s2.event_id AS new_event_id,
       s1.value AS old_value, s2.value AS new_value
FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
WHERE NOT (s1.user_id IS NOT NULL AND s2.user_id IS NOT NULL
           AND s1.event_id = s2.event_id)
""",
    description=(
        "[EXT] snapshot churn diff between two as-of instants: keys "
        "added / changed (with old+new record ids and values) between "
        "the T1 and T2 point-in-time views — the training-set drift "
        "audit an append-only history answers with two windowed scans "
        "and a key-sized full outer join (no history x history work)."
    ),
)
def fs_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def snap(cut: str) -> DataFrame:
        s = ev.filter(F.col("ts") <= F.lit(cut).cast("timestamp"))
        return latest_snapshot_window(
            s, "user_id", "ts", tie_breaker="event_id"
        ).select("user_id", "event_id", "value")

    s1 = snap(DIFF_T1).alias("s1")
    s2 = snap(DIFF_T2).alias("s2")
    joined = s1.join(
        s2, F.col("s1.user_id") == F.col("s2.user_id"), "full_outer"
    )
    status = (
        F.when(F.col("s1.user_id").isNull(), F.lit("added"))
        .when(F.col("s2.user_id").isNull(), F.lit("removed"))
        .when(F.col("s1.event_id") != F.col("s2.event_id"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            F.coalesce(F.col("s2.user_id"), F.col("s1.user_id")).alias("user_id"),
            status.alias("status"),
            F.col("s1.event_id").alias("old_event_id"),
            F.col("s2.event_id").alias("new_event_id"),
            F.col("s1.value").alias("old_value"),
            F.col("s2.value").alias("new_value"),
        )
        .filter(F.col("status") != "unchanged")
    )


SCD2_OPEN_END = "9999-12-31T23:59:59Z"


@register(
    "fs_scd2_history",
    oracle=f"""
SELECT user_id, event_id, value,
       {sql_iso('ts')} AS effective_from,
       COALESCE({sql_iso('lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)')},
                '{SCD2_OPEN_END}') AS effective_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM events
""",
    description=(
        "[EXT] SCD2 / temporal-table materialization of the append-only "
        "history: per record its validity window [effective_from, "
        "effective_to) from one lead() pass, open-ended sentinel for "
        "the current record — the slowly-changing-dimension view that "
        "turns the offline store into a bitemporal lookup table."
    ),
)
def fs_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        iso("ts").alias("effective_from"),
        F.coalesce(iso(nxt), F.lit(SCD2_OPEN_END)).alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )


# late in the final event day, so BOTH races are non-vacuous at every
# SF: some tombstoned keys have no later record (they vanish) and some
# do (the older delete must not remove the newer write)
TOMBSTONE_TS = "2024-01-30 18:00:00"
TOMBSTONE_SEQ_BASE = 1_000_000_000_000  # above any event_id-derived seq


@register(
    "fs_tombstone_snapshot",
    oracle=f"""
WITH h AS (
  SELECT user_id, event_id, event_type, value, ts,
         event_id AS ingest_seq, FALSE AS is_deleted
  FROM events
), t AS (
  SELECT DISTINCT user_id,
         CAST(NULL AS BIGINT) AS event_id,
         CAST(NULL AS VARCHAR) AS event_type,
         CAST(NULL AS DOUBLE) AS value,
         TIMESTAMP '{TOMBSTONE_TS}' AS ts,
         {TOMBSTONE_SEQ_BASE} + user_id AS ingest_seq,
         TRUE AS is_deleted
  FROM events WHERE user_id % 10 = 3
), u AS (
  SELECT * FROM h UNION ALL SELECT * FROM t
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, ingest_seq DESC
  ) AS rn
  FROM u
)
SELECT user_id, event_id, event_type, value, {sql_iso('ts')} AS event_time
FROM r WHERE rn = 1 AND NOT is_deleted
""",
    description=(
        "[EXT] CDC tombstone latest-wins — the batch twin of "
        "delete_record + latest_view (core/feature_store.py:192,242): "
        "every user_id % 10 = 3 gets a delete tombstone at a mid-history "
        "instant with an ingest_seq above every record's. Exercises both "
        "sides of the race through the SAME latest-wins primitive the "
        "serving view uses: keys whose last activity precedes the "
        "tombstone vanish from the snapshot, keys with LATER records "
        "keep them (an older delete never removes a newer write), and "
        "an exact-timestamp tie resolves to the tombstone by ingest "
        "order (later write wins). History stays append-only — only the "
        "derived view changes."
    ),
)
def fs_tombstone_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hist = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "ts",
        F.col("event_id").alias("ingest_seq"),
        F.lit(False).alias(DELETED_COL),
    )
    tomb = (
        ev.filter(F.col("user_id") % 10 == 3)
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("string").alias("event_type"),
            F.lit(None).cast("double").alias("value"),
            F.lit(TOMBSTONE_TS).cast("timestamp").alias("ts"),
            (F.lit(TOMBSTONE_SEQ_BASE) + F.col("user_id")).alias("ingest_seq"),
            F.lit(True).alias(DELETED_COL),
        )
    )
    snap = latest_snapshot(
        hist.unionByName(tomb),
        key_cols="user_id",
        event_time_col="ts",
        tie_breaker="ingest_seq",
    )
    return snap.filter(~F.col(DELETED_COL)).select(
        "user_id", "event_id", "event_type", "value", iso("ts").alias("event_time")
    )


@register(
    "fs_point_lookup",
    oracle=f"""
SELECT user_id, event_type,
       COALESCE(value, 0.0) AS value,
       {sql_iso('ts')} AS event_time
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND user_id = 7
""",
    description=(
        "P3 key point lookup over the latest view + P4 missing-value "
        "default (reference: real_time_inference.py:16-22,47)."
    ),
)
def fs_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    latest = latest_snapshot_window(ev, "user_id", "ts", tie_breaker="event_id")
    return latest.filter(F.col("user_id") == 7).select(
        "user_id",
        "event_type",
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
        iso("ts").alias("event_time"),
    )


@register(
    "fs_asof_join",
    oracle=f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts, value AS click_value
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ts, p.purchase_value,
         c.click_ts, c.click_value,
         row_number() OVER (
           PARTITION BY p.purchase_id
           ORDER BY c.click_ts DESC NULLS LAST, c.click_id DESC NULLS LAST
         ) AS rn
  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.click_ts <= p.purchase_ts
)
SELECT purchase_id, user_id,
       {sql_iso('purchase_ts')} AS purchase_time, purchase_value,
       {sql_iso('click_ts')} AS last_click_time, click_value AS last_click_value
FROM j WHERE rn = 1
""",
    description=(
        "[EXT] point-in-time (as-of) join — for each purchase event, the "
        "user's latest click at or before it (SURVEY.md §2.3); the "
        "canonical feature-store retrieval the reference approximates "
        "with a global BETWEEN (reference: historical_features.py:28-31)."
    ),
)
def fs_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    feat = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        probe,
        feat,
        on="user_id",
        probe_time="purchase_ts",
        feature_time="click_ts",
        how="left",
        tie_breaker="click_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        iso("purchase_ts").alias("purchase_time"),
        "purchase_value",
        iso("click_ts").alias("last_click_time"),
        F.col("click_value").alias("last_click_value"),
    )


@register(
    "fs_asof_join_tolerance",
    oracle=f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts, value AS click_value
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ts, p.purchase_value,
         c.click_ts, c.click_value,
         row_number() OVER (
           PARTITION BY p.purchase_id
           ORDER BY c.click_ts DESC NULLS LAST, c.click_id DESC NULLS LAST
         ) AS rn
  FROM p LEFT JOIN c
    ON p.user_id = c.user_id
   AND c.click_ts <= p.purchase_ts
   AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
)
SELECT purchase_id, user_id,
       {sql_iso('purchase_ts')} AS purchase_time, purchase_value,
       {sql_iso('click_ts')} AS last_click_time, click_value AS last_click_value
FROM j WHERE rn = 1
""",
    description=(
        "[EXT] bounded as-of join: latest click within ONE HOUR before "
        "each purchase (purchases with only stale clicks keep nulls). "
        "The tolerance is the scale lever for the join-then-rank "
        "strategy — it bounds the per-probe candidate history the join "
        "materializes, which is why asof_join_auto picks this strategy "
        "exactly when a tolerance is present."
    ),
)
def fs_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    feat = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        probe,
        feat,
        on="user_id",
        probe_time="purchase_ts",
        feature_time="click_ts",
        how="left",
        tolerance_seconds=3600,
        tie_breaker="click_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        iso("purchase_ts").alias("purchase_time"),
        "purchase_value",
        iso("click_ts").alias("last_click_time"),
        F.col("click_value").alias("last_click_value"),
    )


@register(
    "fs_asof_join_forward",
    oracle=f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts, value AS click_value
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ts, p.purchase_value,
         c.click_ts, c.click_value,
         row_number() OVER (
           PARTITION BY p.purchase_id
           ORDER BY c.click_ts ASC NULLS LAST, c.click_id DESC NULLS LAST
         ) AS rn
  FROM p LEFT JOIN c
    ON p.user_id = c.user_id
   AND c.click_ts >= p.purchase_ts
   AND c.click_ts <= p.purchase_ts + INTERVAL 1 HOUR
)
SELECT purchase_id, user_id,
       {sql_iso('purchase_ts')} AS purchase_time, purchase_value,
       {sql_iso('click_ts')} AS next_click_time, click_value AS next_click_value
FROM j WHERE rn = 1
""",
    description=(
        "[EXT] FORWARD as-of join (pandas merge_asof direction="
        "'forward'): for each purchase, the user's EARLIEST click at or "
        "after it within one hour — the label-attachment direction "
        "(outcome lookahead) the backward join can't express. Same "
        "join+rank plan, reversed rank order."
    ),
)
def fs_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    feat = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join_auto(
        probe,
        feat,
        on="user_id",
        probe_time="purchase_ts",
        feature_time="click_ts",
        how="left",
        tolerance_seconds=3600,
        tie_breaker="click_id",
        direction="forward",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        iso("purchase_ts").alias("purchase_time"),
        "purchase_value",
        iso("click_ts").alias("next_click_time"),
        F.col("click_value").alias("next_click_value"),
    )


@register(
    "fs_asof_join_nearest",
    oracle=f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts, value AS click_value
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ts, p.purchase_value,
         c.click_ts, c.click_value,
         row_number() OVER (
           PARTITION BY p.purchase_id
           ORDER BY abs(epoch_us(c.click_ts) - epoch_us(p.purchase_ts)) ASC NULLS LAST,
                    CASE WHEN c.click_ts <= p.purchase_ts THEN 0 ELSE 1 END ASC,
                    c.click_id DESC NULLS LAST
         ) AS rn
  FROM p LEFT JOIN c
    ON p.user_id = c.user_id
   AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
   AND c.click_ts <= p.purchase_ts + INTERVAL 1 HOUR
)
SELECT purchase_id, user_id,
       {sql_iso('purchase_ts')} AS purchase_time, purchase_value,
       {sql_iso('click_ts')} AS nearest_click_time, click_value AS nearest_click_value
FROM j WHERE rn = 1
""",
    description=(
        "[EXT] NEAREST as-of join (pandas merge_asof direction="
        "'nearest'): the click closest in time to each purchase within "
        "±1 hour, measured at exact microsecond distance; equidistant "
        "ties prefer the backward candidate (the one knowable at probe "
        "time), then the ingest tie-breaker."
    ),
)
def fs_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    feat = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join_auto(
        probe,
        feat,
        on="user_id",
        probe_time="purchase_ts",
        feature_time="click_ts",
        how="left",
        tolerance_seconds=3600,
        tie_breaker="click_id",
        direction="nearest",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        iso("purchase_ts").alias("purchase_time"),
        "purchase_value",
        iso("click_ts").alias("nearest_click_time"),
        F.col("click_value").alias("nearest_click_value"),
    )


@register(
    "fs_latest_snapshot_maxby",
    oracle=_LATEST_ORACLE,
    description=(
        "A1 via groupBy+max_by — the partial-aggregation form whose "
        "shuffle is O(distinct keys) not O(rows); same oracle as the "
        "window form, pinning both strategies to one semantics."
    ),
)
def fs_latest_snapshot_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    latest = latest_snapshot(ev, "user_id", "ts", tie_breaker="event_id")
    return latest.select(
        "user_id", "event_id", "event_type", "value", iso("ts").alias("event_time")
    )


@register(
    "fs_asof_join_agg",
    oracle=REGISTRY["fs_asof_join"].oracle,
    description=(
        "[EXT] as-of join via inner-join + partial max_by aggregation — "
        "shuffles only (probe, best-feature) pairs; third strategy "
        "pinned to the same oracle as the join and union forms."
    ),
)
def fs_asof_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    feat = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join_agg(
        probe,
        feat,
        on="user_id",
        probe_time="purchase_ts",
        feature_time="click_ts",
        how="left",
        tie_breaker="click_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        iso("purchase_ts").alias("purchase_time"),
        "purchase_value",
        iso("click_ts").alias("last_click_time"),
        F.col("click_value").alias("last_click_value"),
    )


@register(
    "fs_asof_join_union",
    oracle=REGISTRY["fs_asof_join"].oracle,
    description=(
        "[EXT] as-of join via union-and-window — one shuffle, no join "
        "blow-up; the scale strategy for many-probes x many-features "
        "keys, pinned to the same oracle as the join form."
    ),
)
def fs_asof_join_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    feat = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join_union(
        probe,
        feat,
        on="user_id",
        probe_time="purchase_ts",
        feature_time="click_ts",
        feature_cols=["click_ts", "click_value"],
        tie_breaker="click_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        iso("purchase_ts").alias("purchase_time"),
        "purchase_value",
        iso("click_ts").alias("last_click_time"),
        F.col("click_value").alias("last_click_value"),
    )


@register(
    "fs_asof_join_strategy_auto",
    oracle=REGISTRY["fs_asof_join"].oracle,
    description=(
        "[EXT] as-of join through the strategy-picking dispatcher "
        "(operators/asof.asof_join_auto): unbounded left probe routes "
        "to union-and-window — the plan that never materializes "
        "probe x history per key — pinned to the SAME oracle as the "
        "three explicit strategies, so the dispatcher cannot drift "
        "semantically from them."
    ),
)
def fs_asof_join_strategy_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    feat = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join_auto(
        probe,
        feat,
        on="user_id",
        probe_time="purchase_ts",
        feature_time="click_ts",
        how="left",
        tie_breaker="click_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        iso("purchase_ts").alias("purchase_time"),
        "purchase_value",
        iso("click_ts").alias("last_click_time"),
        F.col("click_value").alias("last_click_value"),
    )


@register(
    "fs_resample_ffill_6h",
    oracle=f"""
WITH g AS (
  SELECT user_id,
         unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-30 00:00:00',
                                INTERVAL 6 HOUR)) AS grid_ts
  FROM (SELECT DISTINCT user_id FROM events)
), j AS (
  SELECT g.user_id, g.grid_ts, e.ts, e.event_id, e.value,
         row_number() OVER (
           PARTITION BY g.user_id, g.grid_ts
           ORDER BY e.ts DESC NULLS LAST, e.event_id DESC NULLS LAST
         ) AS rn
  FROM g LEFT JOIN events e
    ON g.user_id = e.user_id AND e.ts <= g.grid_ts
)
SELECT user_id, {sql_iso('grid_ts')} AS grid_time,
       {sql_iso('ts')} AS last_event_time,
       COALESCE(event_id, -1) AS last_event_id,
       value AS last_value
FROM j WHERE rn = 1
""",
    description=(
        "[EXT] time-grid resample + forward fill "
        "(operators/resample.resample_ffill): every user's latest "
        "record as of EVERY 6-hour grid instant over the event month — "
        "the batch-serving materialization that generalizes the "
        "reference's single latest-record view to a training-ready "
        "regular time series. Grid rows fan out from a keys-distinct "
        "scan via sequence(); the fill is the union-and-window as-of "
        "strategy (one shuffle, no grid x history join)."
    ),
)
def fs_resample_ffill_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.col("ts").alias("last_event_ts"),
        "event_id",
        "value",
    )
    res = resample_ffill(
        ev,
        key_cols="user_id",
        time_col="ts",
        start_iso="2024-01-01 00:00:00",
        end_iso="2024-01-30 00:00:00",
        interval_seconds=6 * 3600,
        payload_cols=["last_event_ts", "event_id", "value"],
        tie_breaker="event_id",
    )
    return res.select(
        "user_id",
        iso("grid_ts").alias("grid_time"),
        iso("last_event_ts").alias("last_event_time"),
        F.coalesce(F.col("event_id"), F.lit(-1)).alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


@register(
    "fs_incremental_agg",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CAST(ROUND(value*1000000) AS BIGINT))/1000000.0 AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       SUM(CAST(ROUND(value*1000000) AS BIGINT))/1000000.0/COUNT(*) AS avg_value
FROM events GROUP BY user_id
""",
    description=(
        "[EXT] incremental aggregate maintenance "
        "(operators/incremental.py): per-user count/sum/min/max/avg "
        "computed by splitting history at mid-month, building algebraic "
        "partials per batch, and MERGING them — while the oracle "
        "aggregates the whole history directly in one pass. A hash "
        "match proves merge(partials(b1), partials(b2)) is bit-"
        "identical to the full recompute, which is what lets a 100 TB "
        "refresh cost O(batch), not O(history). Exact scaled-int sums "
        "make the equality order-independent."
    ),
)
def fs_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import (
        agg_partials,
        finalize_partials,
        merge_partials,
    )

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    b1 = ev.filter(F.col("ts") < cut)
    b2 = ev.filter(F.col("ts") >= cut)
    merged = merge_partials(
        agg_partials(b1, "user_id", "value"),
        agg_partials(b2, "user_id", "value"),
    )
    return finalize_partials(merged, "value")


@register(
    "fs_incremental_join",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, c.c_name, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
    description=(
        "[EXT] incremental JOIN view maintenance "
        "(operators/incremental.incremental_join_refresh): orders and "
        "customer are each split into a deterministic base + delta, "
        "the base x base join plays the stored materialized view, and "
        "the refresh adds only the three delta terms (dA x B, A x dB, "
        "dA x dB) — while the oracle joins the full tables directly. A "
        "hash match proves the delta-rule refresh is row-identical to "
        "the full recompute, which is what lets a join view refresh in "
        "O(delta x match) instead of rescanning both tables at 100 TB."
    ),
)
def fs_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import incremental_join_refresh

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a_base = orders.filter(F.col("o_orderkey") % 10 < 8)
    a_delta = orders.filter(F.col("o_orderkey") % 10 >= 8)
    b_base = cust.filter(F.col("c_custkey") % 7 != 0)
    b_delta = cust.filter(F.col("c_custkey") % 7 == 0)
    on = F.col("o_custkey") == F.col("c_custkey")
    materialized = a_base.join(b_base, on).select(
        "o_orderkey", "o_custkey", "c_name", "o_totalprice"
    )
    return incremental_join_refresh(
        materialized, a_base, a_delta, b_base, b_delta, on=on
    )


@register(
    "fs_multi_group_asof",
    oracle=f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts, value AS click_value
  FROM events WHERE event_type = 'click'
), j1 AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ts, c.click_value,
         row_number() OVER (
           PARTITION BY p.purchase_id
           ORDER BY c.click_ts DESC NULLS LAST, c.click_id DESC NULLS LAST
         ) AS rn
  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.click_ts <= p.purchase_ts
), f1 AS (SELECT purchase_id, user_id, purchase_ts, click_value FROM j1 WHERE rn = 1),
j2 AS (
  SELECT f1.*, o.o_orderdate, o.o_totalprice,
         row_number() OVER (
           PARTITION BY f1.purchase_id
           ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST
         ) AS rn
  FROM f1 LEFT JOIN orders o
    ON f1.user_id = o.o_custkey AND o.o_orderdate <= f1.purchase_ts
)
SELECT purchase_id, user_id,
       {sql_iso('purchase_ts')} AS purchase_time,
       click_value,
       {sql_iso('o_orderdate')} AS last_order_time,
       o_totalprice AS last_order_price
FROM j2 WHERE rn = 1
""",
    description=(
        "[EXT] multi-group point-in-time retrieval — the training-"
        "dataset-generation primitive: one probe set (purchases) "
        "enriched as-of from TWO feature tables (click events and "
        "orders) with no leakage past each probe timestamp. Composes "
        "asof_join per group; each stage is a WindowGroupLimit-pruned "
        "join keyed on the entity id, so N feature groups cost N "
        "co-partitioned joins, not a blow-up."
    ),
)
def fs_multi_group_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    stage1 = asof_join(
        probe,
        clicks,
        on="user_id",
        probe_time="purchase_ts",
        feature_time="click_ts",
        how="left",
        tie_breaker="click_id",
    ).select("purchase_id", "user_id", "purchase_ts", "click_value")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
    )
    stage2 = asof_join(
        stage1,
        orders,
        on="user_id",
        probe_time="purchase_ts",
        feature_time="o_orderdate",
        how="left",
        tie_breaker="o_orderkey",
    )
    return stage2.select(
        "purchase_id",
        "user_id",
        iso("purchase_ts").alias("purchase_time"),
        "click_value",
        iso("o_orderdate").alias("last_order_time"),
        F.col("o_totalprice").alias("last_order_price"),
    )


@register(
    "fs_training_set_multi",
    oracle=f"""
WITH p AS (
  SELECT event_id AS label_id, user_id, ts AS purchase_ts, value AS label_value
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts, value AS click_value
  FROM events WHERE event_type = 'click'
), v AS (
  SELECT user_id, event_id AS view_id, ts AS view_ts, value AS view_value
  FROM events WHERE event_type = 'view'
), s AS (
  SELECT user_id, event_id AS signup_id, ts AS signup_ts, value AS signup_value
  FROM events WHERE event_type = 'signup'
), j1 AS (
  SELECT p.*, c.click_ts, c.click_value,
         row_number() OVER (
           PARTITION BY p.label_id
           ORDER BY c.click_ts DESC NULLS LAST, c.click_id DESC NULLS LAST
         ) AS rn
  FROM p LEFT JOIN c
    ON p.user_id = c.user_id AND c.click_ts <= p.purchase_ts
   AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
), f1 AS (SELECT * EXCLUDE rn FROM j1 WHERE rn = 1),
j2 AS (
  SELECT f1.*, v.view_ts, v.view_value,
         row_number() OVER (
           PARTITION BY f1.label_id
           ORDER BY v.view_ts DESC NULLS LAST, v.view_id DESC NULLS LAST
         ) AS rn
  FROM f1 LEFT JOIN v
    ON f1.user_id = v.user_id AND v.view_ts <= f1.purchase_ts
   AND v.view_ts >= f1.purchase_ts - INTERVAL 6 HOUR
), f2 AS (SELECT * EXCLUDE rn FROM j2 WHERE rn = 1),
j3 AS (
  SELECT f2.*, s.signup_ts, s.signup_value,
         row_number() OVER (
           PARTITION BY f2.label_id
           ORDER BY s.signup_ts DESC NULLS LAST, s.signup_id DESC NULLS LAST
         ) AS rn
  FROM f2 LEFT JOIN s
    ON f2.user_id = s.user_id AND s.signup_ts <= f2.purchase_ts
   AND s.signup_ts >= f2.purchase_ts - INTERVAL 3 DAY
), f3 AS (SELECT * EXCLUDE rn FROM j3 WHERE rn = 1)
SELECT label_id, user_id,
       {sql_iso('purchase_ts')} AS label_time, label_value,
       click_value,
       CAST(epoch_us(purchase_ts) - epoch_us(click_ts) AS DOUBLE) AS click_age_us,
       view_value,
       CAST(epoch_us(purchase_ts) - epoch_us(view_ts) AS DOUBLE) AS view_age_us,
       signup_value,
       CAST(epoch_us(purchase_ts) - epoch_us(signup_ts) AS DOUBLE) AS signup_age_us,
       (CASE WHEN click_ts IS NOT NULL THEN 1 ELSE 0 END
      + CASE WHEN view_ts IS NOT NULL THEN 1 ELSE 0 END
      + CASE WHEN signup_ts IS NOT NULL THEN 1 ELSE 0 END) AS n_fresh_groups
FROM f3
""",
    description=(
        "[EXT] multi-feature-group training-set assembly with PER-GROUP "
        "staleness budgets — the real serving contract: each group "
        "contributes its latest row only if it is FRESH ENOUGH by that "
        "group's own max-age (clicks 1h, views 6h, signups 3d); a stale "
        "group yields NULLs for that label, never a leaked-stale value, "
        "and n_fresh_groups reports per-label feature completeness (the "
        "reference's get-historical-features is the degenerate one-"
        "group no-budget case). Composes the tolerance as-of join per "
        "group: N groups = N WindowGroupLimit-pruned joins co-"
        "partitioned on the entity key; each tolerance bounds that "
        "group's candidate history, which is exactly what keeps the "
        "join-then-rank strategy scan-bounded at 100 TB. Feature ages "
        "are exact integer microseconds (unix_micros/epoch_us twins)."
    ),
)
def fs_training_set_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("label_value"),
    )

    def group(event_type: str, stem: str) -> DataFrame:
        return ev.filter(F.col("event_type") == event_type).select(
            "user_id",
            F.col("event_id").alias(f"{stem}_id"),
            F.col("ts").alias(f"{stem}_ts"),
            F.col("value").alias(f"{stem}_value"),
        )

    out = probe
    for event_type, stem, budget_s in (
        ("click", "click", 3600),
        ("view", "view", 6 * 3600),
        ("signup", "signup", 3 * 86400),
    ):
        out = asof_join(
            out,
            group(event_type, stem),
            on="user_id",
            probe_time="purchase_ts",
            feature_time=f"{stem}_ts",
            how="left",
            tolerance_seconds=budget_s,
            tie_breaker=f"{stem}_id",
        ).drop(f"{stem}_id")

    def age_us(stem: str):
        # DOUBLE, not BIGINT: a nullable int column round-trips through
        # pandas as float64 on the oracle side, so matching the dtype
        # explicitly keeps the hash comparable; µs ages are < 2^53 and
        # exact in float64
        return (
            (
                F.unix_micros(F.col("purchase_ts"))
                - F.unix_micros(F.col(f"{stem}_ts"))
            )
            .cast("double")
            .alias(f"{stem}_age_us")
        )

    fresh = sum(
        F.when(F.col(f"{stem}_ts").isNotNull(), 1).otherwise(0)
        for stem in ("click", "view", "signup")
    )
    return out.select(
        "label_id",
        "user_id",
        iso("purchase_ts").alias("label_time"),
        "label_value",
        "click_value",
        age_us("click"),
        "view_value",
        age_us("view"),
        "signup_value",
        age_us("signup"),
        fresh.cast("int").alias("n_fresh_groups"),
    )


TTL_ASOF = "2024-01-15 00:00:00"
TTL_EXPIRY = "2024-01-12 00:00:00"  # as-of minus the 3-day TtlDuration


@register(
    "fs_ttl_snapshot",
    oracle=f"""
SELECT user_id, event_id, event_type, value, {sql_iso('ts')} AS event_time
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE ts <= TIMESTAMP '{TTL_ASOF}' AND ts > TIMESTAMP '{TTL_EXPIRY}'
) WHERE rn = 1
""",
    description=(
        "[EXT] online snapshot with record TTL (SageMaker online-store "
        "TtlDuration semantics, public API: records expire TtlDuration "
        "after their event time and vanish from GetRecord): the view AS "
        "OF an instant contains the latest record per key among records "
        "younger than the TTL; keys whose freshest record has expired "
        "are absent entirely. Because event times are scanned, not "
        "stored-state, the filter composes with the same single "
        "window pass as fs_snapshot_asof — the TTL predicate is pushed "
        "to the parquet scan, so expired history is never shuffled."
    ),
)
def fs_ttl_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") <= F.lit(TTL_ASOF).cast("timestamp"))
        & (F.col("ts") > F.lit(TTL_EXPIRY).cast("timestamp"))
    )
    latest = latest_snapshot_window(ev, "user_id", "ts", tie_breaker="event_id")
    return latest.select(
        "user_id", "event_id", "event_type", "value", iso("ts").alias("event_time")
    )


DRIFT_SPLIT = "2024-01-16 00:00:00"  # reference window | current window
DRIFT_BINS = 10
DRIFT_BIN_WIDTH = 50.0  # value spans [0, 500) across all SFs


@register(
    "fs_feature_drift_psi",
    oracle=f"""
WITH binned AS (
  SELECT event_type,
         CAST(FLOOR(value / {DRIFT_BIN_WIDTH}) AS BIGINT) AS bin,
         CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 1 ELSE 0 END AS is_ref
  FROM events
),
spine AS (
  SELECT DISTINCT b.event_type, s.bin
  FROM binned b CROSS JOIN (SELECT UNNEST(range({DRIFT_BINS})) AS bin) s
),
cnt AS (
  SELECT event_type, bin,
         SUM(is_ref) AS n_ref, SUM(1 - is_ref) AS n_cur
  FROM binned GROUP BY 1, 2
),
dense AS (
  SELECT s.event_type, s.bin,
         CAST(COALESCE(c.n_ref, 0) AS BIGINT) AS n_ref,
         CAST(COALESCE(c.n_cur, 0) AS BIGINT) AS n_cur
  FROM spine s LEFT JOIN cnt c
    ON s.event_type = c.event_type AND s.bin = c.bin
),
tot AS (
  SELECT event_type, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
  FROM dense GROUP BY 1
),
term AS (
  SELECT d.event_type, d.n_ref, d.n_cur, t.t_ref, t.t_cur,
         (CAST(d.n_ref + 1 AS DOUBLE) / CAST(t.t_ref + {DRIFT_BINS} AS DOUBLE)) AS p,
         (CAST(d.n_cur + 1 AS DOUBLE) / CAST(t.t_cur + {DRIFT_BINS} AS DOUBLE)) AS q
  FROM dense d JOIN tot t USING (event_type)
)
SELECT event_type,
       CAST(MAX(t_ref) AS BIGINT) AS n_ref,
       CAST(MAX(t_cur) AS BIGINT) AS n_cur,
       SUM(CAST(ROUND((p - q) * ln(p / q) * 1000000000) AS BIGINT)) / 1000000000.0 AS psi,
       CAST(SUM(ABS(n_ref * t_cur - n_cur * t_ref)) AS DOUBLE)
         / (2.0 * MAX(t_ref) * MAX(t_cur)) AS tvd
FROM term
GROUP BY event_type
""",
    description=(
        "[EXT] feature drift monitor per feature group (the Model-"
        "Monitor-style data-quality check a feature store runs between "
        "a training reference window and the serving window): events."
        "value is binned on a fixed grid, and per event_type the "
        "Population Stability Index (Laplace-smoothed, sum of "
        "(p-q)*ln(p/q) over a DENSE bin spine so empty bins count) and "
        "the exact total-variation distance (integer cross-multiplied "
        "|n_ref*T_cur - n_cur*T_ref| — no float summation order "
        "anywhere) come out of one scan + one vocabulary-sized shuffle. "
        "PSI per-bin terms are rounded to a 1e-9 grid and summed as "
        "int64 so both engines agree bit-for-bit; output is "
        "#event_types rows regardless of corpus size."
    ),
)
def fs_feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.floor(F.col("value") / DRIFT_BIN_WIDTH).cast("long").alias("bin"),
        F.when(
            F.col("ts") < F.lit(DRIFT_SPLIT).cast("timestamp"), F.lit(1)
        ).otherwise(F.lit(0)).alias("is_ref"),
    )
    # lazy pin: the spine, the dense join and the per-type totals all
    # read this #types x #bins frame; unpinned each branch re-scans and
    # re-bins the event history (per-branch pruning defeats
    # ReuseExchange). The spine's type set comes from cnt itself — any
    # type present anywhere has at least one non-empty bin.
    cnt = binned.groupBy("event_type", "bin").agg(
        F.sum("is_ref").alias("n_ref"),
        F.sum(F.lit(1) - F.col("is_ref")).alias("n_cur"),
    ).localCheckpoint(eager=False)
    spine = (
        cnt.select("event_type").distinct()
        .crossJoin(
            ev.sparkSession.range(DRIFT_BINS).select(F.col("id").alias("bin"))
        )
    )
    dense = (
        spine.join(cnt, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    tot = dense.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = (F.col("n_ref") + 1).cast("double") / (
        F.col("t_ref") + DRIFT_BINS
    ).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (
        F.col("t_cur") + DRIFT_BINS
    ).cast("double")
    term = dense.join(tot, "event_type").select(
        "event_type", "n_ref", "n_cur", "t_ref", "t_cur",
        p.alias("p"), q.alias("q"),
    )
    return term.groupBy("event_type").agg(
        F.max("t_ref").cast("long").alias("n_ref"),
        F.max("t_cur").cast("long").alias("n_cur"),
        (
            F.sum(
                F.round(
                    (F.col("p") - F.col("q"))
                    * F.log(F.col("p") / F.col("q"))
                    * F.lit(1_000_000_000)
                ).cast("long")
            )
            / F.lit(1_000_000_000.0)
        ).alias("psi"),
        (
            F.sum(
                F.abs(
                    F.col("n_ref") * F.col("t_cur")
                    - F.col("n_cur") * F.col("t_ref")
                ).cast("decimal(38,0)")
            ).cast("double")
            / (F.lit(2.0) * F.max("t_ref") * F.max("t_cur"))
        ).alias("tvd"),
    )


@register(
    "fs_rollup_reaggregation",
    oracle=f"""
SELECT event_type,
       (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS week,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_dsum('value', 2)} AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       {sql_davg('value', 2)} AS avg_value
FROM events
GROUP BY 1, 2
""",
    description=(
        "[EXT] hierarchical rollup by re-aggregation of STORED partials "
        "(operators/incremental.agg_partials): weekly statistics are "
        "computed by merging the per-day partial states — never by "
        "rescanning raw history — and the oracle computes the weekly "
        "numbers DIRECTLY from raw rows, so the hash match proves the "
        "partial->merge path is bit-identical to a full recompute. "
        "This is the day->week->month rollup pattern a 100 TB store "
        "lives on: each level's input is the level below (calendar-"
        "sized), and the exact-int64 sum discipline makes the merge "
        "order unobservable. Week ids are epoch-days//7 (engine-"
        "neutral, no locale week rules)."
    ),
)
def fs_rollup_reaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import agg_partials

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    daily = agg_partials(ev, ["event_type", "day"], "value", scale_decimals=2)
    weekly = (
        daily.withColumn(
            "week",
            F.floor(
                F.datediff("day", F.lit("1970-01-01").cast("date")) / F.lit(7)
            ),
        )
        .groupBy("event_type", "week")
        .agg(
            F.sum("__n").alias("__n"),
            F.sum("__s").alias("__s"),
            F.min("__mn").alias("__mn"),
            F.max("__mx").alias("__mx"),
        )
    )
    return weekly.select(
        "event_type",
        "week",
        F.col("__n").alias("n"),
        (F.col("__s") / F.lit(100.0)).alias("sum_value"),
        F.col("__mn").alias("min_value"),
        F.col("__mx").alias("max_value"),
        (F.col("__s") / F.lit(100.0) / F.col("__n")).alias("avg_value"),
    )


BT_EVENT_ASOF = "2024-01-15 00:00:00"  # event-time cutoff (what happened)
BT_KNOWLEDGE_SEQ = 5000  # processing-time cutoff (what was known)


@register(
    "fs_bitemporal_asof",
    oracle=f"""
SELECT user_id, event_id, event_type, value, {sql_iso('ts')} AS event_time
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE ts <= TIMESTAMP '{BT_EVENT_ASOF}' AND event_id <= {BT_KNOWLEDGE_SEQ}
) WHERE rn = 1
""",
    description=(
        "[EXT] bitemporal snapshot — the reproducibility query a "
        "feature store must answer when data arrives LATE: 'what was "
        "the state as of event time T, using only records the store "
        "had ingested by processing point K'. Event time is ts; "
        "processing time is the monotone ingest sequence (event_id "
        "here — functions/ids.with_dense_row_ids provides it for real "
        "ingests). A training run pinned to (T, K) reproduces its "
        "exact inputs forever, even after late records for t <= T "
        "arrive with seq > K — the un-pinned fs_snapshot_asof view "
        "silently changes under it, which is how offline/online skew "
        "and unreproducible models happen. Same single filtered "
        "window pass as fs_snapshot_asof; both cutoffs push to the "
        "parquet scan."
    ),
)
def fs_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") <= F.lit(BT_EVENT_ASOF).cast("timestamp"))
        & (F.col("event_id") <= BT_KNOWLEDGE_SEQ)
    )
    latest = latest_snapshot_window(ev, "user_id", "ts", tie_breaker="event_id")
    return latest.select(
        "user_id", "event_id", "event_type", "value", iso("ts").alias("event_time")
    )


FV_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "fs_feature_vector_pivot",
    oracle=f"""
WITH latest AS (
  SELECT user_id, event_type, value FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT user_id,
       {", ".join(f"MAX(CASE WHEN event_type = '{t}' THEN value END) AS latest_{t}" for t in FV_TYPES)}
FROM latest GROUP BY user_id
""",
    description=(
        "[EXT] wide feature-vector assembly — the serving-side record "
        "shape: per entity, the LATEST value of every feature (event "
        "type) pivoted into one row with NULLs where a feature was "
        "never observed (downstream imputation's job, P4). One "
        "(user,type)-keyed window pass then a pivot on the small fixed "
        "type set — the declared-schema form (explicit type list, like "
        "a feature group's feature definitions) so the output schema "
        "is stable however the data drifts. This is the batch "
        "materialization of what real_time_inference.py assembles "
        "per-record from the online store (reference: "
        "real_time_inference.py:16-25)."
    ),
)
def fs_feature_vector_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "value")
    )
    return latest.groupBy("user_id").agg(
        *[
            F.max(
                F.when(F.col("event_type") == t, F.col("value"))
            ).alias(f"latest_{t}")
            for t in FV_TYPES
        ]
    )


@register(
    "fs_asof_join_composite",
    oracle=f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, event_type, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), h AS (
  SELECT user_id, 'purchase' AS event_type, event_id AS prior_id,
         ts AS prior_ts, value AS prior_value
  FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ts,
         h.prior_id, h.prior_ts, h.prior_value,
         row_number() OVER (
           PARTITION BY p.purchase_id
           ORDER BY h.prior_ts DESC NULLS LAST, h.prior_id DESC NULLS LAST
         ) AS rn
  FROM p LEFT JOIN h
    ON p.user_id = h.user_id AND p.event_type = h.event_type
   AND h.prior_ts < p.purchase_ts
)
SELECT purchase_id, user_id,
       {sql_iso('purchase_ts')} AS purchase_time,
       CAST(prior_id AS DOUBLE) AS prior_id,
       {sql_iso('prior_ts')} AS prior_time, prior_value
FROM j WHERE rn = 1
""",
    description=(
        "[EXT] COMPOSITE-KEY as-of join — the multi-key form of the "
        "point-in-time family the single-key queries leave "
        "unevidenced: each purchase fetches the same user's STRICTLY "
        "previous purchase, keyed on (user_id, event_type), i.e. the "
        "previous-order features a repeat-purchase model needs. "
        "Strict inequality (prior_ts < probe_ts, not <=) keeps the "
        "probe row from matching itself through the shared-table "
        "self-join. Same join-then-rank WindowGroupLimit plan, keys "
        "hashed together — N-column entity keys cost the same one "
        "co-partitioned join."
    ),
)
def fs_asof_join_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase")
    probe = purch.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "event_type",
        F.col("ts").alias("purchase_ts"),
    )
    # shift the probe time by -1µs to express the STRICT "previous
    # row" bound through the operator's <= predicate (µs-integer
    # timestamps make the shift exact)
    probe_shifted = probe.withColumn(
        "__probe_ts",
        F.timestamp_micros(F.unix_micros("purchase_ts") - 1),
    )
    feats = purch.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("prior_id"),
        F.col("ts").alias("prior_ts"),
        F.col("value").alias("prior_value"),
    )
    joined = asof_join(
        probe_shifted,
        feats,
        on=["user_id", "event_type"],
        probe_time="__probe_ts",
        feature_time="prior_ts",
        how="left",
        tie_breaker="prior_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        iso("purchase_ts").alias("purchase_time"),
        # DOUBLE, not BIGINT: nullable ints round-trip pandas as
        # float64 on the oracle side (fs_training_set_multi precedent)
        F.col("prior_id").cast("double").alias("prior_id"),
        iso("prior_ts").alias("prior_time"),
        "prior_value",
    )


SNAP_DRIFT_T1 = "2024-01-10 00:00:00"
SNAP_DRIFT_T2 = "2024-01-20 00:00:00"


@register(
    "fs_snapshot_drift_psi",
    oracle=f"""
WITH snap AS (
  SELECT 1 AS which, event_type, CAST(FLOOR(value / {DRIFT_BIN_WIDTH}) AS BIGINT) AS bin
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts <= TIMESTAMP '{SNAP_DRIFT_T1}'
  ) WHERE rn = 1
  UNION ALL
  SELECT 2, event_type, CAST(FLOOR(value / {DRIFT_BIN_WIDTH}) AS BIGINT)
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts <= TIMESTAMP '{SNAP_DRIFT_T2}'
  ) WHERE rn = 1
),
cnt AS (
  SELECT event_type, bin,
         SUM(CASE WHEN which = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN which = 2 THEN 1 ELSE 0 END) AS n2
  FROM snap GROUP BY 1, 2
),
spine AS (
  SELECT DISTINCT c.event_type, s.bin
  FROM cnt c CROSS JOIN (SELECT UNNEST(range({DRIFT_BINS})) AS bin) s
),
dense AS (
  SELECT s.event_type, s.bin,
         CAST(COALESCE(c.n1, 0) AS BIGINT) AS n1,
         CAST(COALESCE(c.n2, 0) AS BIGINT) AS n2
  FROM spine s LEFT JOIN cnt c ON s.event_type = c.event_type AND s.bin = c.bin
),
tot AS (SELECT event_type, SUM(n1) AS t1, SUM(n2) AS t2 FROM dense GROUP BY 1),
term AS (
  SELECT d.event_type, d.n1, d.n2, t.t1, t.t2,
         (CAST(d.n1 + 1 AS DOUBLE) / CAST(t.t1 + {DRIFT_BINS} AS DOUBLE)) AS p,
         (CAST(d.n2 + 1 AS DOUBLE) / CAST(t.t2 + {DRIFT_BINS} AS DOUBLE)) AS q
  FROM dense d JOIN tot t USING (event_type)
)
SELECT event_type,
       CAST(MAX(t1) AS BIGINT) AS n_snap1,
       CAST(MAX(t2) AS BIGINT) AS n_snap2,
       SUM(CAST(ROUND((p - q) * ln(p / q) * 1000000000) AS BIGINT)) / 1000000000.0 AS psi,
       CAST(SUM(ABS(n1 * t2 - n2 * t1)) AS DOUBLE)
         / (2.0 * MAX(t1) * MAX(t2)) AS tvd
FROM term GROUP BY event_type
""",
    description=(
        "[EXT] SERVING-STATE drift between two point-in-time online "
        "snapshots: the latest value per (user, feature) AS OF Jan 10 "
        "vs AS OF Jan 20, binned and compared per feature with "
        "Laplace-smoothed PSI (terms on the 1e-9 grid) and exact "
        "cross-multiplied total variation. Complements "
        "fs_feature_drift_psi, which measures the event FLOW — this "
        "measures what the ONLINE STORE would serve, i.e. the drift "
        "the model actually eats between two training cuts (the PIT "
        "backtest question). Two WindowGroupLimit snapshot passes, "
        "then everything is #features x #bins-sized."
    ),
)
def fs_snapshot_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def snap(asof: str, which: int):
        w = Window.partitionBy("user_id", "event_type").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            ev.filter(F.col("ts") <= F.lit(asof).cast("timestamp"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.lit(which).alias("which"),
                "event_type",
                F.floor(F.col("value") / DRIFT_BIN_WIDTH).cast("long").alias("bin"),
            )
        )

    snaps = snap(SNAP_DRIFT_T1, 1).unionByName(snap(SNAP_DRIFT_T2, 2))
    cnt = (
        snaps.groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("which") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("which") == 2, 1).otherwise(0)).alias("n2"),
        )
        .localCheckpoint(eager=False)
    )
    spine = cnt.select("event_type").distinct().crossJoin(
        ev.sparkSession.range(DRIFT_BINS).select(F.col("id").alias("bin"))
    )
    dense = spine.join(cnt, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("n1", F.lit(0)).cast("long").alias("n1"),
        F.coalesce("n2", F.lit(0)).cast("long").alias("n2"),
    )
    tot = dense.groupBy("event_type").agg(
        F.sum("n1").alias("t1"), F.sum("n2").alias("t2")
    )
    p = (F.col("n1") + 1).cast("double") / (F.col("t1") + DRIFT_BINS).cast("double")
    q = (F.col("n2") + 1).cast("double") / (F.col("t2") + DRIFT_BINS).cast("double")
    return (
        dense.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("t1").cast("long").alias("n_snap1"),
            F.max("t2").cast("long").alias("n_snap2"),
            (
                F.sum(
                    F.round((p - q) * F.log(p / q) * 1e9).cast("long")
                )
                / 1e9
            ).alias("psi"),
            (
                F.sum(
                    F.abs(F.col("n1") * F.col("t2") - F.col("n2") * F.col("t1"))
                ).cast("double")
                / (F.lit(2.0) * F.max("t1") * F.max("t2"))
            ).alias("tvd"),
        )
    )


@register(
    "fs_late_data_impact",
    oracle=f"""
WITH late AS (
  SELECT * FROM events WHERE event_id % 10 = 7
),
cur AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_id % 10 <> 7
  ) WHERE rn = 1
)
SELECT l.event_id, l.user_id, {sql_iso('l.ts')} AS event_time,
       CASE WHEN c.user_id IS NULL THEN 'new_key'
            WHEN (l.ts > c.ts) OR (l.ts = c.ts AND l.event_id > c.event_id)
              THEN 'wins'
            ELSE 'no_op' END AS impact
FROM late l LEFT JOIN cur c USING (user_id)
ORDER BY l.event_id
""",
    description=(
        "[EXT] late-data / backfill IMPACT AUDIT: before replaying a "
        "late-arriving shard (here the event_id % 10 = 7 slice) into "
        "the store, classify each late record against the CURRENT "
        "serving snapshot — 'wins' (outranks the key's latest by the "
        "(event_time, ingest-order) contract and will flip serving "
        "state), 'no_op' (history-only append), or 'new_key'. The "
        "decision an operator makes before an expensive backfill: if "
        "everything is no_op, the replay only rewrites history "
        "partitions and the online store is untouched. One "
        "WindowGroupLimit snapshot + one key-sized left join — the "
        "late shard never scans history beyond the latest-per-key "
        "frame."
    ),
)
def fs_late_data_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    is_late = F.col("event_id") % 10 == 7
    late = ev.filter(is_late)
    cur = latest_snapshot_window(
        ev.filter(~is_late), "user_id", "ts", tie_breaker="event_id"
    ).select(
        "user_id", F.col("ts").alias("__cts"), F.col("event_id").alias("__cid")
    )
    wins = (F.col("ts") > F.col("__cts")) | (
        (F.col("ts") == F.col("__cts")) & (F.col("event_id") > F.col("__cid"))
    )
    return (
        late.join(cur, "user_id", "left")
        .select(
            "event_id",
            "user_id",
            iso("ts").alias("event_time"),
            F.when(F.col("__cts").isNull(), "new_key")
            .when(wins, "wins")
            .otherwise("no_op")
            .alias("impact"),
        )
        .orderBy("event_id")
    )
