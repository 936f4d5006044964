"""Event-stream query surface: lag/lead, rolling frames, tumbling
windows, sessionization, JSON extraction (SURVEY.md §2.5, §2.8, §2.9).

These are the batch twins of the streaming feature-engineering path
(`streaming/`): identical window semantics, oracle-checkable here.
Timestamp arithmetic uses integer microseconds (`unix_micros` /
`epoch_us`) on both sides so gap comparisons are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.timeutil import to_ltz
from .registry import dsum, iso, register, sql_dsum, sql_iso

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@register(
    "events_json_extract",
    oracle="""
SELECT event_id, user_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
""",
    description="JSON path extraction from the semi-structured props column (SURVEY.md §2.8 [EXT]).",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("prop_k", k)
        .filter(F.col("prop_k") >= 50)
        .select("event_id", "user_id", "event_type", "prop_k")
    )


@register(
    "events_json_schema_parse",
    oracle="""
SELECT (CAST(json_extract_string(props, '$.k') AS BIGINT) % 10) AS k_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
WHERE props IS NOT NULL
GROUP BY 1
""",
    description=(
        "Schema-driven JSON parse: from_json with a declared struct "
        "(vs. path-at-a-time get_json_object) feeding a grouped "
        "aggregate — the parse happens once per row however many fields "
        "are consumed."
    ),
)
def events_json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.filter(F.col("props").isNotNull()).withColumn(
        "p", F.from_json("props", "k LONG")
    )
    return parsed.groupBy((F.col("p.k") % 10).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("p.k").alias("sum_k"),
    )


@register(
    "events_lag_lead",
    oracle=f"""
SELECT event_id, user_id,
       {sql_iso('ts')} AS event_time, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       value - lag(value) OVER w AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    description="lag/lead per user in event-time order — per-entity feature deltas (SURVEY.md §2.5 [EXT]).",
)
def events_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        iso("ts").alias("event_time"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "events_rolling_agg",
    oracle=f"""
SELECT event_id, user_id, {sql_iso('ts')} AS event_time,
       SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)/100.0 AS rolling_sum_3,
       SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0 AS running_total
FROM events
""",
    description="Rolling 3-row and running-total frames per user, exact integer-cents arithmetic.",
)
def events_rolling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    last3 = base.rowsBetween(-2, Window.currentRow)
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        iso("ts").alias("event_time"),
        (F.sum(cents).over(last3) / 100.0).alias("rolling_sum_3"),
        (F.sum(cents).over(running) / 100.0).alias("running_total"),
    )


@register(
    "events_tumbling_hourly",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%dT%H:%M:%SZ') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value', 2)} AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
""",
    description=(
        "Tumbling 1-hour event-time windows via F.window — the batch twin "
        "of the streaming windowed aggregate (SURVEY.md §2.9 [EXT])."
    ),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            iso("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


@register(
    "events_sessionize",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT *, CAST(SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM gaps
)
SELECT user_id, session_id,
       {sql_iso('MIN(ts)')} AS session_start,
       {sql_iso('MAX(ts)')} AS session_end,
       COUNT(*) AS n_events,
       {sql_dsum('value', 2)} AS session_value
FROM sessions
GROUP BY user_id, session_id
""",
    description=(
        "Gap-based sessionization (30-min inactivity): lag + cumulative-sum "
        "session ids, then per-session aggregates — the batch twin of a "
        "session_window streaming aggregate."
    ),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(to_ltz("ts"))
    gaps = ev.withColumn(
        "new_session",
        F.when(us - F.lag(us).over(w) > SESSION_GAP_US, F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = gaps.withColumn("session_id", F.sum("new_session").over(run))
    return sessions.groupBy("user_id", "session_id").agg(
        iso(F.min("ts")).alias("session_start"),
        iso(F.max("ts")).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value"), 2).alias("session_value"),
    )


@register(
    "events_funnel_ordered",
    oracle=f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT v.user_id,
       {sql_iso('v.t1')} AS first_view,
       {sql_iso('c.t2')} AS first_click,
       {sql_iso('p.t3')} AS first_purchase
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON c.user_id = p.user_id
""",
    description=(
        "[EXT] ordered funnel (view -> click -> purchase): per user the "
        "first view, the first click strictly AFTER it, and the first "
        "purchase strictly after that — the sequential-pattern analytic "
        "(match_recognize shape) as three stage-filtered min-aggregates "
        "chained by joins on the shrinking user set. Scales as three "
        "pushed-filter scans; the per-stage state is one timestamp per "
        "surviving user, and the join strategy is left to AQE — the "
        "stage frames are broadcast-sized for most funnels but can be "
        "billion-key, so no forced broadcast hint."
    ),
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")

    def stage(etype: str, prev: DataFrame | None, prev_t: str, out_t: str) -> DataFrame:
        s = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return s.groupBy("user_id").agg(F.min("ts").alias(out_t))

    v = stage("view", None, "", "t1")
    c = stage("click", v, "t1", "t2")
    p = stage("purchase", c, "t2", "t3")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            iso("t1").alias("first_view"),
            iso("t2").alias("first_click"),
            iso("t3").alias("first_purchase"),
        )
    )


HIST_BIN_WIDTH = 50.0


@register(
    "agg_value_histogram",
    oracle=f"""
SELECT CAST(FLOOR(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
       COUNT(*) AS n,
       {sql_dsum('value', 2)} AS sum_value
FROM events
GROUP BY 1
""",
    description=(
        "[EXT] fixed-width histogram of events.value (width "
        f"{HIST_BIN_WIDTH}): bin id + count + exact-decimal sum per "
        "bin — the map-side-combined binned aggregation every feature "
        "profile / data-quality dashboard starts from."
    ),
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / HIST_BIN_WIDTH).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value"), 2).alias("sum_value"),
    )


TRAIL_US = 3_600 * 1_000_000  # 1 hour in microseconds


@register(
    "events_trailing_1h",
    oracle=f"""
SELECT event_id, user_id, {sql_iso('ts')} AS event_time,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w / 100.0 AS sum_value_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN {TRAIL_US} PRECEDING AND CURRENT ROW
)
""",
    description=(
        "[EXT] time-interval rolling features (rangeBetween, not row "
        "frames): per event the trailing-1-hour count and exact-decimal "
        "value sum for the same user — the sliding-window feature a "
        "fraud/abuse pipeline computes per event. The frame is defined "
        "on integer microseconds so both engines bound it identically; "
        "scaled-int window sums keep the hash exact. One shuffle on "
        "user_id at any scale."
    ),
)
def events_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(to_ltz("ts")))
        .rangeBetween(-TRAIL_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        iso("ts").alias("event_time"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        (F.sum(F.round(F.col("value") * 100).cast("long")).over(w) / 100.0).alias(
            "sum_value_1h"
        ),
    )


@register(
    "events_cohort_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
)
SELECT CAST(cohort_day AS VARCHAR) AS cohort_day, day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM activity
GROUP BY cohort_day, day_offset
""",
    description=(
        "[EXT] cohort retention: users grouped by first-seen day, "
        "distinct-user activity counts per (cohort, day-offset) — the "
        "classic retention triangle. The first-seen side is key-sized "
        "(join strategy left to AQE — user sets can exceed broadcast "
        "scale); the activity scan shuffles only (user, cohort, offset) "
        "triples."
    ),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.col("cohort_day").cast("string").alias("cohort_day"), "day_offset"
    ).agg(F.count(F.lit(1)).alias("n_active_users"))


ATTRIBUTION_WINDOW = "6 hours"  # SQL twin below must stay in lockstep


@register(
    "stream_attribution_twin",
    oracle=f"""
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.event_id AS purchase_id,
       {sql_iso('p.ts')} AS purchase_time, p.value AS purchase_value,
       c.event_id AS click_id, {sql_iso('c.ts')} AS click_time
FROM p JOIN c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL 6 HOUR
""",
    description=(
        "[EXT] batch twin of the watermarked stream-stream attribution "
        "join (streaming/joins.purchase_click_attribution): each "
        "purchase paired with every same-user click in the preceding "
        "6-hour attribution window. Runs the STREAMING operator's own "
        "function on batch frames (withWatermark is a no-op in batch "
        "execution), so the oracle pins the join predicate and column "
        "contract of the code the stream actually runs; bounded-state "
        "streaming execution itself is pinned by tests/test_streaming.py."
    ),
)
def stream_attribution_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import purchase_click_attribution

    ev = load_table(spark, sf_dir, "events")
    out = purchase_click_attribution(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        window=ATTRIBUTION_WINDOW,
    )
    return out.select(
        "user_id",
        "purchase_id",
        iso("purchase_ts").alias("purchase_time"),
        "purchase_value",
        "click_id",
        iso("click_ts").alias("click_time"),
    )


@register(
    "stream_running_features_twin",
    oracle=f"""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(CAST(ROUND(value*100) AS BIGINT))/100.0 AS total_value,
       {sql_iso('MAX(ts)')} AS last_time
FROM events
GROUP BY user_id
""",
    description=(
        "[EXT] batch twin of the applyInPandasWithState running-feature "
        "operator (streaming/stateful.running_user_features): the final "
        "per-user state — event count, exact-cents value total, last "
        "event time — computed through the SAME _fold_events update "
        "rule via applyInPandas. The oracle pins the fold's arithmetic "
        "(dsum cents discipline, null-skipping, max-ts) as hard hash "
        "evidence; cross-micro-batch state round-trip and restart "
        "exactly-once are pinned by tests/test_streaming.py."
    ),
)
def stream_running_features_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import running_user_features_batch

    ev = load_table(spark, sf_dir, "events")
    out = running_user_features_batch(ev.select("user_id", "ts", "value"))
    return out.select(
        "user_id", "n_events", "total_value", iso("last_ts").alias("last_time")
    )


@register(
    "events_mad_outliers",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(ROUND(value*100) AS BIGINT) AS v FROM events
),
m AS (
  SELECT user_id, median(v) AS med, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM e GROUP BY 1
),
d AS (
  SELECT e.user_id, abs(e.v - m.med) AS dev
  FROM e JOIN m USING (user_id)
),
md AS (SELECT user_id, median(dev) AS mad FROM d GROUP BY 1),
o AS (
  SELECT d.user_id,
         CAST(COUNT(*) FILTER (WHERE d.dev > 3 * md.mad) AS BIGINT) AS n_outliers
  FROM d JOIN md USING (user_id) GROUP BY 1
)
SELECT m.user_id, m.n_events,
       m.med / 100.0 AS median_value,
       md.mad / 100.0 AS mad_value,
       o.n_outliers
FROM m JOIN md USING (user_id) JOIN o USING (user_id)
""",
    description=(
        "Robust per-user outlier detection: median + median-absolute-"
        "deviation with a 3xMAD fence. Values are lifted onto the exact "
        "cent grid first, so every median/deviation lands on a "
        "dyadic-exact grid and interpolated medians agree bit-for-bit "
        "across engines — robust statistics without FP drift. The "
        "median stages shuffle the events on user_id; the re-join and "
        "fence stages exchange only key-sized frames (the plan shows "
        "several exchanges but all post-aggregate ones carry one row "
        "per user)."
    ),
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    # lazy pins on the two key-sized aggregate frames: the median feeds
    # the deviation join, the MAD join and the final select, and the MAD
    # feeds the fence and the final select — per-branch pruning defeats
    # ReuseExchange, so unpinned the event history is scanned 7 times
    # (3 after pinning; the deviation stream itself is recomputed rather
    # than pinned because it is corpus-sized).
    m = e.groupBy("user_id").agg(
        F.median("v").alias("med"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    ).localCheckpoint(eager=False)
    d = e.join(m.select("user_id", "med"), "user_id").select(
        "user_id", (F.abs(F.col("v") - F.col("med"))).alias("dev")
    )
    md = d.groupBy("user_id").agg(
        F.median("dev").alias("mad")
    ).localCheckpoint(eager=False)
    o = (
        d.join(md, "user_id")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers")
        )
    )
    return (
        m.join(md, "user_id")
        .join(o, "user_id")
        .select(
            "user_id",
            "n_events",
            (F.col("med") / 100.0).alias("median_value"),
            (F.col("mad") / 100.0).alias("mad_value"),
            "n_outliers",
        )
    )


@register(
    "ml_quantile_binning",
    oracle="""
WITH t AS (
  SELECT event_type, event_id,
         CAST(ROUND(value*100) AS BIGINT) AS cents,
         NTILE(10) OVER (
           PARTITION BY event_type
           ORDER BY CAST(ROUND(value*100) AS BIGINT), event_id) AS decile
  FROM events
)
SELECT event_type, decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(cents) / 100.0 AS lo_value,
       MAX(cents) / 100.0 AS hi_value
FROM t GROUP BY 1, 2
""",
    description=(
        "Equal-frequency discretization (decile binning) per event "
        "type — the numeric-feature bucketizer: NTILE over the exact "
        "cent grid with an event_id tie-break makes bin membership "
        "deterministic across engines; output is the bin-edge table "
        "(10 x |types| rows) a downstream encoder consumes. One "
        "window shuffle on event_type."
    ),
)
def ml_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    return (
        ev.select("event_type", "event_id", cents.alias("cents"))
        .withColumn("decile", F.ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.min("cents") / 100.0).alias("lo_value"),
            (F.max("cents") / 100.0).alias("hi_value"),
        )
    )


FRESHNESS_ASOF_S = 1706659200  # 2024-01-31T00:00:00Z, just past max(ts) so bands split


@register(
    "fs_freshness_stats",
    oracle=f"""
WITH latest AS (
  SELECT user_id, MAX(ts) AS last_ts, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT user_id, {sql_iso('last_ts')} AS last_time, n_events,
       1706659200 - CAST(floor(epoch(last_ts)) AS BIGINT) AS age_seconds,
       CASE WHEN 1706659200 - CAST(floor(epoch(last_ts)) AS BIGINT) <= 21600 THEN 'fresh'
            WHEN 1706659200 - CAST(floor(epoch(last_ts)) AS BIGINT) <= 86400 THEN 'day_stale'
            ELSE 'stale' END AS freshness_band
FROM latest
""",
    description=(
        "[EXT] feature-freshness monitoring: per-key age of the latest "
        "record at a fixed as-of instant, banded 6h/1d/stale — the "
        "operational staleness report a serving store needs (alerts on "
        "keys whose features stopped updating). Key-sized output, one "
        "map-side-combined aggregate; integer epoch-second arithmetic."
    ),
)
def fs_freshness_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    latest = ev.groupBy("user_id").agg(
        F.max(to_ltz("ts")).alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    asof_s = F.lit(FRESHNESS_ASOF_S).cast("long")
    age = (asof_s - (F.unix_micros("last_ts") / 1_000_000).cast("long")).alias(
        "age_seconds"
    )
    band = (
        F.when(F.col("age_seconds") <= 21600, "fresh")
        .when(F.col("age_seconds") <= 86400, "day_stale")
        .otherwise("stale")
    )
    return latest.select(
        "user_id", iso("last_ts").alias("last_time"), "n_events", age
    ).withColumn("freshness_band", band)


@register(
    "events_type_transitions",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
t AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM ordered WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
row_tot AS (
  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_n FROM t GROUP BY 1
)
SELECT t.prev_type, t.next_type, t.n,
       CAST(t.n AS DOUBLE) / r.row_n AS p_transition
FROM t JOIN row_tot r USING (prev_type)
""",
    description=(
        "[EXT] first-order Markov transition matrix over per-user "
        "event sequences: lag() pairs within the (ts, event_id) order, "
        "counts map-side combined to a |types|^2-sized matrix, "
        "transition probabilities as exact int64 ratios. The "
        "sequence-mining primitive behind next-event prediction "
        "features; one window shuffle on user_id."
    ),
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = ordered.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    row_tot = t.groupBy("prev_type").agg(F.sum("n").cast("long").alias("row_n"))
    return (
        t.join(row_tot, "prev_type")
        .select(
            "prev_type", "next_type", "n",
            (F.col("n").cast("double") / F.col("row_n")).alias("p_transition"),
        )
    )


SPINE_START, SPINE_END = "2024-01-01", "2024-01-31"


@register(
    "events_dense_spine",
    oracle=f"""
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '{SPINE_START}',
                                     DATE '{SPINE_END}',
                                     INTERVAL 1 DAY)) AS DATE) AS day
),
types AS (SELECT DISTINCT event_type FROM events),
daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         {sql_dsum('value', 2)} AS total_value
  FROM events GROUP BY 1, 2
)
SELECT strftime(days.day, '%Y-%m-%d') AS day, types.event_type,
       COALESCE(daily.n_events, 0) AS n_events,
       COALESCE(daily.total_value, 0.0) AS total_value
FROM days CROSS JOIN types
LEFT JOIN daily ON daily.day = days.day
               AND daily.event_type = types.event_type
""",
    description=(
        "[EXT] dense time spine: day x event-type grid generated by "
        "sequence()+explode cross-joined against the observed type "
        "set, daily aggregates left-joined on, gaps zero-filled — the "
        "canonical gap-free series a downstream model or dashboard "
        "needs (a plain GROUP BY silently drops empty days). The "
        "spine is calendar-sized and the type set is tiny, so the "
        "cross join and the left join's build side are both "
        "broadcast; the only full-data pass is the map-side-combined "
        "daily aggregate. Spine bounds cover the testdata's pinned "
        "Jan-2024 window (TESTDATA.md)."
    ),
)
def events_dense_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(SPINE_START).cast("date"),
                F.lit(SPINE_END).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    types = ev.select("event_type").distinct()
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value"), 2).alias("total_value"),
    )
    return (
        days.crossJoin(F.broadcast(types))
        .join(F.broadcast(daily), ["day", "event_type"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


EWMA_K = 8  # trailing window; decay 0.8 = 4/5 per step
# integer weights 4^j * 5^(K-1-j): w_j / sum(w) == 0.8^j renormalized,
# so the whole EWMA is exact int64 arithmetic with ONE final division.
EWMA_W = [4 ** j * 5 ** (EWMA_K - 1 - j) for j in range(EWMA_K)]


@register(
    "events_ewma_window",
    oracle=f"""
WITH s AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS c,
         {' , '.join(
             f"LAG(CAST(ROUND(value * 100) AS BIGINT), {j}) OVER "
             f"(PARTITION BY user_id ORDER BY ts, event_id) AS c{j}"
             for j in range(1, EWMA_K)
         )}
  FROM s0
)
SELECT event_id, user_id,
       CAST(({' + '.join(
            f"CASE WHEN c{j} IS NULL THEN 0 ELSE {EWMA_W[j]} * c{j} END"
            if j else f"{EWMA_W[0]} * c"
            for j in range(EWMA_K)
        )}) AS DOUBLE)
       / ({' + '.join(
            f"CASE WHEN c{j} IS NULL THEN 0 ELSE {EWMA_W[j]} END"
            if j else f"{EWMA_W[0]}"
            for j in range(EWMA_K)
        )})
       / 100.0 AS ewma_value
FROM s
""".replace("FROM s0", "FROM events"),
    description=(
        "[EXT] trailing exponentially-weighted moving average per user "
        "(decay 0.8 over the last 8 events, re-normalized over the "
        "weights actually present near series heads) — the bounded-"
        "window EWMA feature a streaming feature store materializes. "
        "Exactness without rounding: 0.8^j is rational (4/5)^j, so "
        "integer weights 4^j*5^(K-1-j) make numerator and denominator "
        "exact int64 sums; the single final division produces the "
        "identical double in both engines (a naive double-weight sum "
        "differed by 1 ulp on 3 of 10k rows — FMA contraction). One "
        "shuffle (the per-user window sort); the K lag columns are "
        "one WindowExec pass, not K self-joins."
    ),
)
def events_ewma_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = F.round(F.col("value") * 100).cast("long")
    s = ev.select(
        "event_id", "user_id",
        c.alias("c"),
        *[F.lag(c, j).over(w).alias(f"c{j}") for j in range(1, EWMA_K)],
    )
    num = F.lit(EWMA_W[0]) * F.col("c")
    den = F.lit(EWMA_W[0])
    for j in range(1, EWMA_K):
        present = F.col(f"c{j}").isNotNull()
        num = num + F.when(
            present, F.lit(EWMA_W[j]) * F.col(f"c{j}")
        ).otherwise(F.lit(0))
        den = den + F.when(present, F.lit(EWMA_W[j])).otherwise(F.lit(0))
    return s.select(
        "event_id", "user_id",
        (num.cast("double") / den / F.lit(100.0)).alias("ewma_value"),
    )


ANOM_K2 = 4  # flag |z| > 2: (x*n - S)^2 > K^2 * (n*SS - S^2)


@register(
    "events_seasonal_anomaly",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
keyed AS (
  SELECT *, (day - DATE '1970-01-01') % 7 AS dow FROM daily
),
base AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS s, SUM(CAST(x AS HUGEINT) * x) AS ss
  FROM keyed GROUP BY 1, 2
)
SELECT k.event_type, strftime(k.day, '%Y-%m-%d') AS day, k.x AS n_events,
       (CAST(k.x * b.n - b.s AS HUGEINT) * (k.x * b.n - b.s))
         > """ + str(ANOM_K2) + """ * (b.n * b.ss - CAST(b.s AS HUGEINT) * b.s)
         AS is_anomaly
FROM keyed k JOIN base b ON k.event_type = b.event_type AND k.dow = b.dow
""",
    description=(
        "[EXT] seasonal anomaly detection on the event stream: daily "
        "counts per event type are scored against their day-of-week "
        "baseline (weekday seasonality), flagging days where the "
        "squared deviation exceeds K^2 times the population variance — "
        "i.e. |z| > 2 — computed ENTIRELY in cross-multiplied integer "
        "arithmetic ((x*n - S)^2 > K^2*(n*SS - S^2)), so there is no "
        "float epsilon and both engines agree exactly. Day-of-week is "
        "derived as epoch-days mod 7 (engine-neutral, no locale). Two "
        "tiny shuffles over a calendar-sized frame; the only full-data "
        "pass is the map-side-combined daily count. The same rewrite "
        "is how a 100 TB monitor avoids per-row float z-scores: the "
        "baseline is 7 rows per series, broadcastable everywhere."
    ),
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    # lazy pin: the baseline aggregate and the scoring join both read
    # this calendar-sized frame; unpinned each branch rescans events.
    keyed = daily.withColumn(
        "dow", F.datediff("day", F.lit("1970-01-01").cast("date")) % 7
    ).localCheckpoint(eager=False)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = keyed.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("ss"),
    )
    dev = F.col("x") * F.col("n") - F.col("s")
    return keyed.join(F.broadcast(base), ["event_type", "dow"]).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("n_events"),
        (
            dec(dev) * dev
            > F.lit(ANOM_K2) * (F.col("n") * F.col("ss") - dec(F.col("s")) * F.col("s"))
        ).alias("is_anomaly"),
    )


@register(
    "events_active_sessions_peak",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT *, CAST(SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM gaps
), intervals AS (
  SELECT user_id, session_id,
         epoch_us(MIN(ts)) // 60000000 AS m0,
         epoch_us(MAX(ts)) // 60000000 AS m1
  FROM sessions GROUP BY 1, 2
), minutes AS (
  SELECT UNNEST(range(m0, m1 + 1)) AS minute FROM intervals
), per_min AS (
  SELECT minute, CAST(COUNT(*) AS BIGINT) AS active,
         CAST(minute // 1440 AS BIGINT) AS epoch_day
  FROM minutes GROUP BY 1
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY epoch_day ORDER BY active DESC, minute) AS rn
  FROM per_min
)
SELECT strftime(DATE '1970-01-01' + CAST(epoch_day AS INTEGER), '%Y-%m-%d') AS day,
       strftime(TIMESTAMP '1970-01-01 00:00:00' + INTERVAL (minute) MINUTE,
                '%Y-%m-%dT%H:%M:%SZ') AS peak_minute,
       active AS peak_active
FROM ranked WHERE rn = 1
""",
    description=(
        "[EXT] interval-overlap analytics: per calendar day, the "
        "minute-granularity peak of concurrently active sessions (gap-"
        "based sessions from events_sessionize, exploded onto a minute "
        "spine, counted per minute, window-argmaxed per day with the "
        "earliest-minute tie-break). The minute-bucket formulation is "
        "the distributed-friendly rewrite of the classic sweep-line "
        "max-overlap: a global ordered cumulative sum would serialize "
        "on one task, while bucket counting is a plain hash shuffle "
        "that scales with executors; precision is the bucket width, "
        "chosen at the resolution dashboards actually read. Explode "
        "factor is bounded by session length in minutes."
    ),
)
def events_active_sessions_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(to_ltz("ts"))
    gaps = ev.withColumn(
        "new_session",
        F.when(us - F.lag(us).over(w) > SESSION_GAP_US, F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = gaps.withColumn("session_id", F.sum("new_session").over(run))
    intervals = sessions.groupBy("user_id", "session_id").agg(
        F.floor(F.unix_micros(to_ltz(F.min("ts"))) / F.lit(60_000_000)).alias("m0"),
        F.floor(F.unix_micros(to_ltz(F.max("ts"))) / F.lit(60_000_000)).alias("m1"),
    )
    per_min = (
        intervals.select(F.explode(F.sequence("m0", "m1")).alias("minute"))
        .groupBy("minute")
        .agg(F.count(F.lit(1)).alias("active"))
        .withColumn("epoch_day", F.floor(F.col("minute") / F.lit(1440)))
    )
    rank_w = Window.partitionBy("epoch_day").orderBy(
        F.col("active").desc(), F.col("minute")
    )
    return (
        per_min.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") == 1)
        .select(
            F.date_format(
                F.date_add(
                    F.lit("1970-01-01").cast("date"),
                    F.col("epoch_day").cast("int"),
                ),
                "yyyy-MM-dd",
            ).alias("day"),
            iso(F.timestamp_seconds(F.col("minute") * 60)).alias("peak_minute"),
            F.col("active").alias("peak_active"),
        )
    )


@register(
    "events_running_distinct_users",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
),
per_day AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM first_seen GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM per_day
""",
    description=(
        "[EXT] cumulative distinct users by day (the audience-growth "
        "curve): a naive COUNT(DISTINCT) OVER a running frame holds "
        "per-day distinct state proportional to the user universe; the "
        "scalable rewrite is first-seen-day per user (one hash "
        "aggregate), daily new-user counts, and a running sum over the "
        "CALENDAR-sized day frame — the only ordered window in the "
        "plan runs over ~tens of rows regardless of corpus size. Same "
        "formulation on both engines."
    ),
)
def events_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("day")
    )
    per_day = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    cum_w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(cum_w).alias("cum_users"),
    )


@register(
    "events_sliding_2h_hourly",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts) - TO_HOURS(k), '%Y-%m-%dT%H:%M:%SZ')
         AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_dsum('value', 2)} AS total_value
FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k)
GROUP BY 1
""",
    description=(
        "[EXT] sliding event-time windows (2-hour width, 1-hour slide) "
        "via F.window's slideDuration — the overlapping-window batch "
        "twin of streaming/windows.sliding_agg, completing the oracle "
        "coverage of Spark's three windowing modes (tumbling: "
        "events_tumbling_hourly; session: events_sessionize). Each "
        "event lands in exactly width/slide = 2 windows; the oracle "
        "reproduces that by cross-joining each row with hour offsets "
        "{{0,1}} — the same replicate-then-group plan Spark generates "
        "for a sliding window, still one map-side-combined aggregate "
        "with a bounded x2 expansion."
    ),
)
def events_sliding_2h_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            iso("w.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "ml_winsorize_robust_scale",
    oracle="""
WITH e AS (
  SELECT event_id, event_type, CAST(ROUND(value*100) AS BIGINT) AS c
  FROM events
),
s1 AS (
  SELECT event_type,
         quantile_cont(c, 0.05) AS p05,
         quantile_cont(c, 0.95) AS p95,
         quantile_cont(c, 0.5) AS med
  FROM e GROUP BY 1
),
mad AS (
  SELECT e.event_type, quantile_cont(ABS(e.c - s1.med), 0.5) AS mad
  FROM e JOIN s1 USING (event_type) GROUP BY 1
)
SELECT e.event_id, e.event_type,
       LEAST(GREATEST(CAST(e.c AS DOUBLE), s1.p05), s1.p95) / 100.0
         AS clipped_value,
       CASE WHEN mad.mad = 0 THEN 0.0
            ELSE (LEAST(GREATEST(CAST(e.c AS DOUBLE), s1.p05), s1.p95)
                  - s1.med) / mad.mad END AS robust_z
FROM e JOIN s1 USING (event_type) JOIN mad USING (event_type)
""",
    description=(
        "[EXT] winsorization + robust scaling per feature group — the "
        "outlier-tolerant featurizer (clip to [p5, p95], then "
        "(x - median)/MAD): the preprocessing step that makes "
        "heavy-tailed features usable without letting a single "
        "corrupt reading dominate, companion to events_mad_outliers' "
        "detection. Values sit on the exact cent grid so interpolated "
        "percentiles are dyadic-exact and engine-agnostic; the scale "
        "itself is one IEEE division (zero-MAD guarded to 0). Plan "
        "shape: two type-sized aggregate passes (pinned, broadcast "
        "back onto the stream), then a narrow map — per-row output "
        "with model state that is |types| rows at any corpus size."
    ),
)
def ml_winsorize_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    # lazy pin: the deviation pass and the final scaling both read the
    # percentile stats; pinned so the event history is scanned twice
    # (stats + output), not four times.
    s1 = e.groupBy("event_type").agg(
        F.percentile("c", F.lit(0.05)).alias("p05"),
        F.percentile("c", F.lit(0.95)).alias("p95"),
        F.percentile("c", F.lit(0.5)).alias("med"),
    ).localCheckpoint(eager=False)
    mad = (
        e.join(F.broadcast(s1), "event_type")
        .select("event_type", F.abs(F.col("c") - F.col("med")).alias("dev"))
        .groupBy("event_type")
        .agg(F.percentile("dev", F.lit(0.5)).alias("mad"))
    )
    clipped = F.least(
        F.greatest(F.col("c").cast("double"), F.col("p05")), F.col("p95")
    )
    return (
        e.join(F.broadcast(s1), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_id",
            "event_type",
            (clipped / 100.0).alias("clipped_value"),
            F.when(F.col("mad") == 0, F.lit(0.0))
            .otherwise((clipped - F.col("med")) / F.col("mad"))
            .alias("robust_z"),
        )
    )


@register(
    "events_changepoint_cusum",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS s
  FROM daily GROUP BY 1
),
cum AS (
  SELECT d.event_type, d.day, t.n,
         SUM(d.x * t.n - t.s) OVER (
           PARTITION BY d.event_type ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sp
  FROM daily d JOIN tot t USING (event_type)
),
ranked AS (
  SELECT event_type, day, ABS(sp) AS a, n,
         row_number() OVER (
           PARTITION BY event_type ORDER BY ABS(sp) DESC, day) AS rn
  FROM cum
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS changepoint_day,
       CAST(a AS DOUBLE) / n AS cusum_peak
FROM ranked WHERE rn = 1
""",
    description=(
        "[EXT] CUSUM changepoint detection on the daily event series "
        "(Page 1954, public methodology): per event type, the running "
        "sum of deviations from the series mean, kept EXACT by the "
        "cross-multiplied form sum(x_i*n - S) — integers, no float "
        "accumulation — and the level-shift estimate is the day where "
        "|CUSUM| peaks (earliest-day tie-break), reported in units of "
        "events (one final division). The only full-data pass is the "
        "map-side-combined daily count; the ordered cumulative sum "
        "runs over a calendar-sized frame partitioned by series — "
        "tens of rows per task regardless of corpus size."
    ),
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # lazy pin: totals and the cumulative pass both read the daily frame
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x")).localCheckpoint(eager=False)
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    cw = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "day",
        "n",
        F.sum(F.col("x") * F.col("n") - F.col("s")).over(cw).alias("sp"),
    )
    rw = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("sp")).desc(), F.col("day")
    )
    return (
        cum.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("changepoint_day"),
            (F.abs(F.col("sp")).cast("double") / F.col("n")).alias("cusum_peak"),
        )
    )


@register(
    "events_inter_arrival_stats",
    oracle="""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       quantile_cont(gap_us, 0.5) AS median_gap_us,
       quantile_cont(gap_us, 0.9) AS p90_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY user_id
""",
    description=(
        "[EXT] inter-arrival statistics per entity (min/median/p90/max "
        "gap between consecutive events) — the activity-cadence "
        "features behind churn models and the empirical basis for "
        "choosing sessionization gaps and watermark delays. Gaps are "
        "exact integer microseconds from one lag() pass; interpolated "
        "percentiles over integers are dyadic-exact, so both engines "
        "agree bit-for-bit. One window shuffle + one map-side-combined "
        "aggregate, both keyed by the entity."
    ),
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(to_ltz("ts"))
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.percentile("gap_us", F.lit(0.5)).alias("median_gap_us"),
        F.percentile("gap_us", F.lit(0.9)).alias("p90_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


@register(
    "events_survival_km",
    oracle="""
WITH signup AS (
  SELECT user_id, MIN(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
conv AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN signup s ON e.user_id = s.user_id AND e.ts > s.s_ts
  WHERE e.event_type = 'purchase' GROUP BY 1
),
horizon AS (SELECT MAX(ts) AS h FROM events),
subj AS (
  SELECT s.user_id,
         CASE WHEN c.p_ts IS NOT NULL
              THEN (epoch_us(c.p_ts) - epoch_us(s.s_ts)) // 86400000000
              ELSE (epoch_us(h.h) - epoch_us(s.s_ts)) // 86400000000 END AS t,
         CASE WHEN c.p_ts IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM signup s LEFT JOIN conv c ON s.user_id = c.user_id CROSS JOIN horizon h
),
n_total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM subj),
per_day AS (
  SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS leave
  FROM subj GROUP BY 1
),
risk AS (
  SELECT t, d,
         n_total.n - COALESCE(SUM(leave) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS n_risk
  FROM per_day CROSS JOIN n_total
),
terms AS (
  SELECT t, d, n_risk,
         CAST(ROUND(ln(1.0 - CAST(d AS DOUBLE) / n_risk) * 1000000000)
              AS BIGINT) AS lt
  FROM risk WHERE d > 0 AND d < n_risk
)
SELECT CAST(t AS BIGINT) AS day, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
       ROUND(exp(CAST(SUM(lt) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / 1000000000.0), 12) AS survival
FROM terms
""",
    description=(
        "[EXT] Kaplan-Meier survival curve (Kaplan & Meier 1958, public "
        "methodology) for signup->first-purchase with right censoring "
        "at the stream horizon — the time-to-event family (conversion "
        "lag, churn, retention) none of the moment/quantile operators "
        "cover, and the censoring is the point: users who never "
        "converted still inform the risk set. Per-subject times are "
        "exact integer days; risk sets come from one cumulative pass "
        "over the DAY-sized frame (never subject-sized); the product "
        "over (1 - d/n) is carried as exp(sum(ln .)) with each log "
        "term snapped to a 1e-9 integer grid, so both engines feed "
        "bit-identical arguments to the same libm functions (the "
        "repo-wide log-parity discipline). Days where every remaining "
        "subject exits (d = n_risk) are excluded from the curve "
        "rather than emitting S=0 with ln(0)."
    ),
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = lambda c: F.unix_micros(to_ltz(c))  # noqa: E731
    signup = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("s_ts")
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    horizon = ev.agg(F.max("ts").alias("h"))
    subj = (
        signup.join(conv, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("p_ts").isNotNull(),
                F.floor((us(F.col("p_ts")) - us(F.col("s_ts"))) / F.lit(86_400_000_000)),
            )
            .otherwise(
                F.floor((us(F.col("h")) - us(F.col("s_ts"))) / F.lit(86_400_000_000))
            )
            .alias("t"),
            F.when(F.col("p_ts").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    n_total = subj.agg(F.count(F.lit(1)).alias("n"))
    # lazy pin: the risk-set cumulative and the total both read this
    # day-sized frame; unpinned each branch re-derives the subject table
    per_day = subj.groupBy("t").agg(
        F.sum("ev").alias("d"), F.count(F.lit(1)).alias("leave")
    ).localCheckpoint(eager=False)
    cw = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_day.crossJoin(F.broadcast(n_total)).select(
        "t",
        "d",
        (F.col("n") - F.coalesce(F.sum("leave").over(cw), F.lit(0))).alias("n_risk"),
    )
    terms = risk.filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk"))).select(
        "t",
        "d",
        "n_risk",
        F.round(
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"))
            * F.lit(1_000_000_000)
        ).cast("long").alias("lt"),
    )
    sw = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return terms.select(
        F.col("t").cast("long").alias("day"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        # exp() is the one libm call measured to differ by 1 ULP across
        # engines (sf0.1, 2/329 rows) — snap the output to a 12-decimal
        # grid, comfortably above ULP noise and below any analytic use
        F.round(
            F.exp(F.sum("lt").over(sw).cast("double") / F.lit(1_000_000_000.0)),
            12,
        ).alias("survival"),
    )


RFM_ASOF_S = 1706659200  # 2024-01-31T00:00:00Z, just past max(ts)


@register(
    "events_rfm_segments",
    oracle=f"""
WITH base AS (
  SELECT user_id,
         {RFM_ASOF_S} - CAST(floor(epoch(MAX(ts))) AS BIGINT) AS recency_s,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS monetary_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
b AS (
  SELECT quantile_cont(recency_s, 0.2) AS r1, quantile_cont(recency_s, 0.4) AS r2,
         quantile_cont(recency_s, 0.6) AS r3, quantile_cont(recency_s, 0.8) AS r4,
         quantile_cont(frequency, 0.2) AS f1, quantile_cont(frequency, 0.4) AS f2,
         quantile_cont(frequency, 0.6) AS f3, quantile_cont(frequency, 0.8) AS f4,
         quantile_cont(monetary_cents, 0.2) AS m1, quantile_cont(monetary_cents, 0.4) AS m2,
         quantile_cont(monetary_cents, 0.6) AS m3, quantile_cont(monetary_cents, 0.8) AS m4
  FROM base
),
scored AS (
  SELECT user_id, recency_s, frequency, monetary_cents / 100.0 AS monetary,
         1 + CAST(recency_s < b.r1 AS INT) + CAST(recency_s < b.r2 AS INT)
           + CAST(recency_s < b.r3 AS INT) + CAST(recency_s < b.r4 AS INT) AS r,
         1 + CAST(frequency > b.f1 AS INT) + CAST(frequency > b.f2 AS INT)
           + CAST(frequency > b.f3 AS INT) + CAST(frequency > b.f4 AS INT) AS f,
         1 + CAST(monetary_cents > b.m1 AS INT) + CAST(monetary_cents > b.m2 AS INT)
           + CAST(monetary_cents > b.m3 AS INT) + CAST(monetary_cents > b.m4 AS INT) AS m
  FROM base CROSS JOIN b
)
SELECT user_id, recency_s, frequency, monetary, r, f, m,
       CASE WHEN r >= 4 AND f >= 4 THEN 'champion'
            WHEN r >= 4 THEN 'recent'
            WHEN f >= 4 THEN 'loyal_lapsing'
            WHEN r <= 2 AND f <= 2 THEN 'at_risk'
            ELSE 'regular' END AS segment
FROM scored
""",
    description=(
        "[EXT] RFM segmentation (recency/frequency/monetary) — the "
        "canonical customer featurization: per purchaser, seconds "
        "since last purchase at a pinned as-of, purchase count, and "
        "exact-cent spend, each scored 1-5 against the population's "
        "quintile BOUNDARIES (broadcast 4-number cutpoints from exact "
        "dyadic percentiles; higher = better on every axis, recency "
        "reversed) and mapped to a named segment. Boundary assignment "
        "— not a global NTILE — is the 100 TB form: a rank window "
        "over the purchaser frame would single-task a billion rows, "
        "while boundary compare is a narrow map after one aggregate; "
        "equal inputs get equal scores by construction, so no "
        "tie-break column is needed. The composed output is what "
        "campaign targeting and churn models consume directly."
    ),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            (
                F.lit(RFM_ASOF_S)
                - F.floor(F.unix_micros(to_ltz(F.max("ts"))) / F.lit(1_000_000))
            ).alias("recency_s"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "monetary_cents"
            ),
        )
        # lazy pin: the boundary aggregate and the scoring pass both
        # read this purchaser-sized frame
        .localCheckpoint(eager=False)
    )
    b = base.agg(
        *[
            F.percentile(c, F.lit(q)).alias(f"{a}{i}")
            for c, a in (
                ("recency_s", "r"),
                ("frequency", "f"),
                ("monetary_cents", "m"),
            )
            for i, q in ((1, 0.2), (2, 0.4), (3, 0.6), (4, 0.8))
        ]
    )

    def score(col, prefix, reverse):
        op = (lambda c, b_: c < b_) if reverse else (lambda c, b_: c > b_)
        e = F.lit(1)
        for i in (1, 2, 3, 4):
            e = e + op(F.col(col), F.col(f"{prefix}{i}")).cast("int")
        return e

    scored = base.crossJoin(F.broadcast(b)).select(
        "user_id",
        "recency_s",
        "frequency",
        (F.col("monetary_cents") / F.lit(100.0)).alias("monetary"),
        score("recency_s", "r", reverse=True).alias("r"),
        score("frequency", "f", reverse=False).alias("f"),
        score("monetary_cents", "m", reverse=False).alias("m"),
    )
    segment = (
        F.when((F.col("r") >= 4) & (F.col("f") >= 4), "champion")
        .when(F.col("r") >= 4, "recent")
        .when(F.col("f") >= 4, "loyal_lapsing")
        .when((F.col("r") <= 2) & (F.col("f") <= 2), "at_risk")
        .otherwise("regular")
    )
    return scored.withColumn("segment", segment)


@register(
    "stream_interval_join_twin",
    oracle="""
SELECT a.event_type AS first_type, b.event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(epoch_us(b.ts) - epoch_us(a.ts)) AS DOUBLE)/COUNT(*)/1000000.0 AS avg_gap_s
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY 1, 2
""",
    description=(
        "[EXT] batch twin of the watermarked stream-stream INTERVAL "
        "join (streaming/joins.event_followups): follow-up events "
        "within 10 minutes of a prior same-user event, aggregated to "
        "the same (first_type, next_type) pair counts/gap averages as "
        "the batch range join — so the oracle pins the streaming "
        "operator's join predicate and column contract bit-for-bit "
        "against range_join_event_followups' own SQL. Runs the "
        "STREAMING operator's function on batch frames (withWatermark "
        "is a no-op in batch execution); bounded-state streaming "
        "execution + checkpoint-restart exactly-once are pinned by "
        "tests/test_streaming.py::test_stream_interval_join_restart_"
        "matches_batch. Closes the one untwinned Structured Streaming "
        "surface (r6 verdict #5)."
    ),
)
def stream_interval_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import event_followups

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    pairs = event_followups(ev, ev, window="10 minutes")
    gap_us = F.unix_micros(to_ltz(F.col("next_ts"))) - F.unix_micros(
        to_ltz(F.col("first_ts"))
    )
    return pairs.groupBy(
        F.col("first_type"), F.col("next_type")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.sum(gap_us).cast("double") / F.count(F.lit(1)) / 1000000.0).alias(
            "avg_gap_s"
        ),
    )


@register(
    "stream_session_window_twin",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT *, CAST(SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
  FROM gaps
)
SELECT user_id,
       {sql_iso('MIN(ts)')} AS session_start,
       {sql_iso('MAX(ts)')} AS last_time,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_dsum('value', 2)} AS session_value
FROM sessions
GROUP BY user_id, sid
""",
    description=(
        "[EXT] batch twin of Spark's NATIVE session_window aggregation "
        "(the streaming session operator events_sessionize's docstring "
        "points at): groupBy(user_id, F.session_window(ts, 30 min)). "
        "The oracle re-derives the same sessions declaratively via the "
        "lag/cumsum islands form — with the >= gap predicate, because "
        "session windows are half-open [first, last+gap): an event at "
        "EXACTLY last+gap starts a new session, where the classic "
        "islands formulation (events_sessionize, gap > threshold) "
        "would merge it. Pinning both queries documents that boundary "
        "divergence as hash evidence instead of leaving it as a "
        "footgun. Session aggregates use the exact-cents dsum "
        "discipline; ties are impossible at microsecond resolution "
        "within a user stream (event times are distinct per user in "
        "this corpus, and the window itself never needs a tiebreak)."
    ),
)
def stream_session_window_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("__w")
        )
        .agg(
            F.min("ts").alias("__start"),
            F.max("ts").alias("__last"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            iso("__start").alias("session_start"),
            iso("__last").alias("last_time"),
            "n_events",
            "session_value",
        )
    )


ASOF_STALENESS_HOURS = 6


@register(
    "stream_asof_twin",
    oracle=f"""
WITH c AS (
  SELECT user_id, ts AS feature_ts, value AS feature_value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type = 'click'
), snap AS (
  SELECT user_id, feature_ts, feature_value FROM c WHERE rn = 1
), p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
         value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT p.*, s.feature_ts, s.feature_value,
         COALESCE(s.feature_ts <= p.purchase_ts
                  AND s.feature_ts >= p.purchase_ts
                      - INTERVAL {ASOF_STALENESS_HOURS} HOUR,
                  FALSE) AS fresh
  FROM p LEFT JOIN snap s USING (user_id)
)
SELECT purchase_id, user_id,
       {sql_iso('purchase_ts')} AS purchase_time, purchase_value,
       CASE WHEN fresh THEN {sql_iso('feature_ts')} END AS feature_time,
       CASE WHEN fresh THEN feature_value END AS feature_value,
       fresh
FROM j
""",
    description=(
        "[EXT] batch twin of the streaming AS-OF snapshot probe "
        "(streaming/joins.enrich_asof_snapshot): every purchase event "
        "probes the ONLINE latest-click snapshot with a 6-hour "
        "staleness budget — the streaming composition of "
        "latest-per-key (A1) and the tolerance as-of join, i.e. what "
        "a live serving path does instead of a full history as-of. "
        "Features that are future-relative-to-the-event (replay "
        "artifact) or older than the budget come through as NULLs "
        "with fresh=false, pinning the default-application contract. "
        "Runs the STREAMING operator's function on batch frames; the "
        "broadcast stream-static probe is narrow (no state store, no "
        "shuffle), and checkpoint-restart equivalence is pinned by "
        "tests/test_streaming.py::test_stream_asof_enrich_restart_"
        "matches_batch."
    ),
)
def stream_asof_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.latest import latest_snapshot_window
    from ..streaming.joins import enrich_asof_snapshot

    ev = load_table(spark, sf_dir, "events")
    snap = latest_snapshot_window(
        ev.filter(F.col("event_type") == "click"),
        "user_id",
        "ts",
        tie_breaker="event_id",
    ).select(
        "user_id",
        F.col("ts").alias("feature_ts"),
        F.col("value").alias("feature_value"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    out = enrich_asof_snapshot(
        probes,
        snap,
        on="user_id",
        event_ts="purchase_ts",
        feature_ts="feature_ts",
        staleness=f"{ASOF_STALENESS_HOURS} hours",
    )
    return out.select(
        "purchase_id",
        "user_id",
        iso("purchase_ts").alias("purchase_time"),
        "purchase_value",
        iso("feature_ts").alias("feature_time"),
        "feature_value",
        "fresh",
    )


MARKOV_CHANNELS = ("click", "error", "signup", "view")
MARKOV_ITERS = 8
_MGRID = 1_000_000_000_000  # 1e-12 value grid per iteration


def _markov_journey_pairs_sql() -> str:
    """Journey transition pairs: per (user, day), events ordered by
    (ts, event_id), truncated at the first purchase; START opens every
    journey, CONV/NULL closes it."""
    return """
base0 AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn
  FROM events
),
ordered AS (
  SELECT user_id, day, event_type, rn,
         MIN(CASE WHEN event_type = 'purchase' THEN rn END)
           OVER (PARTITION BY user_id, day) AS pmin
  FROM base0
),
pre AS (
  SELECT user_id, day, event_type, rn, pmin,
         ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY rn) AS prn,
         COUNT(*) OVER (PARTITION BY user_id, day) AS npre
  FROM ordered
  WHERE event_type <> 'purchase' AND (pmin IS NULL OR rn < pmin)
),
journeys AS (
  SELECT user_id, day,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_conv
  FROM ordered GROUP BY 1, 2
),
chain AS (
  SELECT p.user_id, p.day, p.event_type AS s,
         COALESCE(LEAD(p.event_type) OVER (PARTITION BY p.user_id, p.day ORDER BY p.prn),
                  CASE WHEN j.has_conv = 1 THEN 'CONV' ELSE 'NULL' END) AS t
  FROM pre p JOIN journeys j USING (user_id, day)
),
starts AS (
  SELECT p.user_id, p.day, 'START' AS s, p.event_type AS t
  FROM pre p WHERE p.prn = 1
  UNION ALL
  SELECT j.user_id, j.day, 'START' AS s, 'CONV' AS t
  FROM journeys j
  WHERE j.has_conv = 1
    AND NOT EXISTS (SELECT 1 FROM pre p
                    WHERE p.user_id = j.user_id AND p.day = j.day)
),
pairs AS (SELECT s, t FROM chain UNION ALL SELECT s, t FROM starts),
tr AS (
  SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(COUNT(*) AS DOUBLE)
           / SUM(COUNT(*)) OVER (PARTITION BY s) AS p
  FROM pairs GROUP BY 1, 2
)"""


def _markov_oracle() -> str:
    runs = [("base", None)] + [(ch, ch) for ch in MARKOV_CHANNELS]
    parts = ["WITH " + _markov_journey_pairs_sql().strip()]
    for run, removed in runs:
        cond = f"WHERE t <> '{removed}'" if removed else ""
        parts.append(f",\ntr_{run} AS (SELECT s, t, p FROM tr {cond})")
        parts.append(
            f",\nv_{run}_0 AS (SELECT DISTINCT s, CAST(0.0 AS DOUBLE) AS vv FROM tr_{run})"
        )
        for k in range(1, MARKOV_ITERS + 1):
            parts.append(f""",
v_{run}_{k} AS (
  SELECT tr.s,
         SUM(CAST(ROUND(tr.p * (CASE WHEN tr.t = 'CONV' THEN 1.0
                                     WHEN tr.t = 'NULL' THEN 0.0
                                     ELSE COALESCE(v.vv, 0.0) END) * {_MGRID}) AS BIGINT))
           / {_MGRID}.0 AS vv
  FROM tr_{run} tr LEFT JOIN v_{run}_{k - 1} v ON v.s = tr.t
  GROUP BY 1
)""")
    sel = []
    for ch in MARKOV_CHANNELS:
        sel.append(f"""
SELECT '{ch}' AS channel,
       (SELECT vv FROM v_base_{MARKOV_ITERS} WHERE s = 'START') AS base_conv,
       COALESCE((SELECT vv FROM v_{ch}_{MARKOV_ITERS} WHERE s = 'START'), 0.0) AS removed_conv,
       ((SELECT vv FROM v_base_{MARKOV_ITERS} WHERE s = 'START')
        - COALESCE((SELECT vv FROM v_{ch}_{MARKOV_ITERS} WHERE s = 'START'), 0.0))
         / (SELECT vv FROM v_base_{MARKOV_ITERS} WHERE s = 'START') AS removal_effect""")
    parts.append("\n" + "\nUNION ALL\n".join(sel))
    return "".join(parts)


@register(
    "events_markov_attribution",
    oracle=_markov_oracle(),
    description=(
        "[EXT] Markov-chain removal-effect attribution (Anderl et al. "
        "2016, the data-driven alternative to last-touch): per-(user, "
        "day) journeys truncated at first purchase become first-order "
        "transition probabilities (START / channels / CONV / NULL); "
        "conversion probability from START by 8 fixed absorption "
        "iterations, then each channel's removal effect = relative "
        "drop in conversion when its inbound edges divert to NULL. "
        "Every iteration floors each term onto the 1e-12 grid and "
        "int64-sums, so both engines run the identical fixed-point "
        "arithmetic (convergence is not assumed — the iteration COUNT "
        "is the contract). Corpus-sized work: ONE windowed pass to "
        "pairs; the 5 runs x 8 iterations operate on the pinned "
        "|states|^2 transition table (<= 36 rows), constant at any "
        "corpus size."
    ),
)
def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    wkey = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    wpart = Window.partitionBy("user_id", F.to_date("ts"))
    ordered = ev.select(
        "user_id",
        day.alias("day"),
        "event_type",
        F.row_number().over(wkey).alias("rn"),
    ).withColumn(
        "pmin",
        F.min(F.when(F.col("event_type") == "purchase", F.col("rn"))).over(
            Window.partitionBy("user_id", "day")
        ),
    )
    pre = (
        ordered.filter(
            (F.col("event_type") != "purchase")
            & (F.col("pmin").isNull() | (F.col("rn") < F.col("pmin")))
        )
        .withColumn(
            "prn",
            F.row_number().over(
                Window.partitionBy("user_id", "day").orderBy("rn")
            ),
        )
    )
    journeys = ordered.groupBy("user_id", "day").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "has_conv"
        )
    )
    chain = (
        pre.join(journeys, ["user_id", "day"])
        .withColumn(
            "nxt",
            F.lead("event_type").over(
                Window.partitionBy("user_id", "day").orderBy("prn")
            ),
        )
        .select(
            F.col("event_type").alias("s"),
            F.coalesce(
                F.col("nxt"),
                F.when(F.col("has_conv") == 1, F.lit("CONV")).otherwise(
                    F.lit("NULL")
                ),
            ).alias("t"),
        )
    )
    starts = (
        pre.filter(F.col("prn") == 1)
        .select("user_id", "day")
        .withColumn("s", F.lit("START"))
        .join(
            pre.filter(F.col("prn") == 1).select(
                "user_id", "day", F.col("event_type").alias("t")
            ),
            ["user_id", "day"],
        )
        .select("s", "t")
    )
    conv_only = (
        journeys.filter(F.col("has_conv") == 1)
        .join(pre.select("user_id", "day").distinct(), ["user_id", "day"], "left_anti")
        .select(F.lit("START").alias("s"), F.lit("CONV").alias("t"))
    )
    pairs = chain.unionByName(starts).unionByName(conv_only)
    tr_full = (
        pairs.groupBy("s", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn(
            "p",
            F.col("c").cast("double")
            / F.sum("c").over(Window.partitionBy("s")),
        )
        .select("s", "t", "p")
        .localCheckpoint(eager=True)  # 5 runs x 8 iterations reuse this
    )

    def absorb(tr: DataFrame) -> DataFrame:
        v = tr.select("s").distinct().withColumn("vv", F.lit(0.0))
        for _ in range(MARKOV_ITERS):
            val = (
                F.when(F.col("t") == "CONV", F.lit(1.0))
                .when(F.col("t") == "NULL", F.lit(0.0))
                .otherwise(F.coalesce(F.col("vv"), F.lit(0.0)))
            )
            v = (
                tr.join(v.select(F.col("s").alias("t"), "vv"), "t", "left")
                .groupBy("s")
                .agg(
                    (
                        F.sum(F.round(F.col("p") * val * _MGRID).cast("long"))
                        / F.lit(float(_MGRID))
                    ).alias("vv")
                )
            )
        return v

    base = absorb(tr_full).filter(F.col("s") == "START").select(
        F.col("vv").alias("base_conv")
    )
    out = None
    for ch in MARKOV_CHANNELS:
        rem = absorb(tr_full.filter(F.col("t") != ch))
        rc = rem.filter(F.col("s") == "START").select(
            F.col("vv").alias("removed_conv")
        )
        row = (
            base.crossJoin(F.broadcast(rc))
            .select(
                F.lit(ch).alias("channel"),
                "base_conv",
                F.coalesce(F.col("removed_conv"), F.lit(0.0)).alias("removed_conv"),
                (
                    (F.col("base_conv") - F.coalesce(F.col("removed_conv"), F.lit(0.0)))
                    / F.col("base_conv")
                ).alias("removal_effect"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


HOLT_GRID = 1_000_000  # 1e-6 state grid: floor(x*1e6 + 0.5) both engines


@register(
    "events_holt_trend",
    oracle="""
WITH RECURSIVE d AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
o AS MATERIALIZED (SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM d),
h(rn, day, y, level, trend) AS (
  SELECT o.rn, o.day, o.y, CAST(o.y AS DOUBLE),
         CAST(o2.y AS DOUBLE) - CAST(o.y AS DOUBLE)
  FROM o, o AS o2 WHERE o.rn = 1 AND o2.rn = 2
  UNION ALL
  SELECT o.rn, o.day, o.y,
         floor((0.5 * o.y + 0.5 * (h.level + h.trend)) * 1000000 + 0.5) / 1000000.0,
         floor((0.25 * (floor((0.5 * o.y + 0.5 * (h.level + h.trend)) * 1000000 + 0.5) / 1000000.0
                        - h.level)
                + 0.75 * h.trend) * 1000000 + 0.5) / 1000000.0
  FROM h JOIN o ON o.rn = h.rn + 1
)
SELECT CAST(rn AS BIGINT) AS rn, CAST(day AS VARCHAR) AS day, y, level, trend FROM h
""",
    description=(
        "[EXT] Holt linear-trend exponential smoothing over the daily "
        "event series (alpha=1/2, beta=1/4 — dyadic coefficients, so "
        "each step is exact IEEE; the state additionally snaps to the "
        "1e-6 grid via floor(x*1e6+0.5) on BOTH engines, avoiding the "
        "round-half conventions that differ between them). The "
        "recurrence is inherently sequential, so it runs in ONE "
        "applyInPandas over the DAILY AGGREGATE — bounded by the "
        "calendar (a century is 36.5k rows), never the corpus; the "
        "corpus-sized stage is the one groupBy(day). The oracle walks "
        "the same recurrence as a recursive CTE. Completes the "
        "series shelf (EWMA, CUSUM, Theil-Sen) with the forecasting "
        "rung: yhat(t+h) = level + h*trend."
    ),
)
def events_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        if len(pdf) < 2:
            raise ValueError("Holt smoothing needs at least 2 days")

        def snap(x: float) -> float:
            return math.floor(x * HOLT_GRID + 0.5) / HOLT_GRID

        levels, trends = [], []
        for i, y in enumerate(pdf["y"]):
            y = float(y)
            if i == 0:
                lv, tr = y, float(pdf["y"][1]) - y
            else:
                lv = snap(0.5 * y + 0.5 * (levels[-1] + trends[-1]))
                tr = snap(0.25 * (lv - levels[-1]) + 0.75 * trends[-1])
            levels.append(lv)
            trends.append(tr)
        return pd.DataFrame(
            {
                "rn": range(1, len(pdf) + 1),
                "day": pdf["day"].map(lambda d: d.isoformat()),
                "y": pdf["y"],
                "level": levels,
                "trend": trends,
            }
        )

    return daily.groupBy(F.lit(1).alias("__g")).applyInPandas(
        holt, schema="rn long, day string, y long, level double, trend double"
    )


@register(
    "events_rolling_slope",
    oracle="""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         (CAST(ts AS DATE) - DATE '1970-01-01') AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT day, x, y,
         COUNT(*) OVER win AS n,
         SUM(x) OVER win AS sx, SUM(y) OVER win AS sy,
         SUM(x*x) OVER win AS sxx, SUM(x*y) OVER win AS sxy
  FROM d
  WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT CAST(day AS VARCHAR) AS day, y, CAST(n AS BIGINT) AS n_window,
       CASE WHEN n >= 2 THEN
         (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
       END AS slope_7d
FROM w
""",
    description=(
        "[EXT] rolling 7-day OLS trend slope of the daily event count "
        "— the windowed-regression monitor ('is this metric "
        "accelerating?') next to EWMA/CUSUM/Theil-Sen. Sufficient "
        "statistics (n, Sx, Sy, Sxx, Sxy) are exact int64 sums over a "
        "ROWS BETWEEN 6 PRECEDING frame on the DAILY aggregate — "
        "calendar-sized, never the corpus — and each slope is the "
        "closed-form division mirrored term-for-term; days with a "
        "single point yield NULL rather than 0/0."
    ),
)
def events_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.to_date("ts").alias("day"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("x"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    win = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    n = F.count(F.lit(1)).over(win)
    sx = F.sum("x").over(win)
    sy = F.sum("y").over(win)
    sxx = F.sum(F.col("x") * F.col("x")).over(win)
    sxy = F.sum(F.col("x") * F.col("y")).over(win)
    nd = n.cast("double")
    slope = (nd * sxy.cast("double") - sx.cast("double") * sy.cast("double")) / (
        nd * sxx.cast("double") - sx.cast("double") * sx.cast("double")
    )
    return d.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "y",
        n.cast("long").alias("n_window"),
        F.when(n >= 2, slope).alias("slope_7d"),
    )


DECOMP_GRID = 1_000_000_000


@register(
    "events_seasonal_decompose",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
ma AS (
  SELECT event_type, day, x,
         SUM(x) OVER w AS s7, COUNT(*) OVER w AS w_n,
         (day - DATE '1970-01-01') % 7 AS dow
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
full_w AS (
  SELECT event_type, day, dow, x, s7,
         CAST({DECOMP_GRID} AS HUGEINT) * s7 // 7 AS trend_grid,
         CAST({DECOMP_GRID} AS HUGEINT) * (7 * x - s7) // 7 AS detr_grid
  FROM ma WHERE w_n = 7
),
seas AS (
  SELECT event_type, dow,
         CAST(CAST({DECOMP_GRID} AS HUGEINT) * SUM(7 * x - s7)
              // (7 * COUNT(*)) AS BIGINT) AS seasonal_grid
  FROM full_w GROUP BY 1, 2
)
SELECT f.event_type, strftime(f.day, '%Y-%m-%d') AS day, f.x AS n_events,
       CAST(f.trend_grid AS BIGINT) AS trend_grid,
       CAST(f.detr_grid AS BIGINT) AS detrended_grid,
       s.seasonal_grid,
       CAST(f.detr_grid AS BIGINT) - s.seasonal_grid AS remainder_grid
FROM full_w f JOIN seas s ON s.event_type = f.event_type AND s.dow = f.dow
""",
    description=(
        "[EXT] classical additive seasonal decomposition of the daily "
        "event series (the moving-average method of Persons 1919 — "
        "STL's ancestor and the standard first look at any metric): "
        "trend = centered 7-day moving average (full windows only), "
        "detrended = x - trend, seasonal index = per-day-of-week mean "
        "of the detrended series, remainder = detrended - seasonal. "
        "Every component is an exact rational snapped onto the 1e-9 "
        "grid by HUGEINT/decimal(38,0) integral division — TRUNCATING "
        "toward zero in both engines (probed: -7//2 = -3 = -7 div 2), "
        "which matters here because detrended values go negative — so "
        "the whole decomposition is bit-identical cross-engine with "
        "no float summation anywhere. "
        "One calendar-sized daily aggregate, one window pass, one "
        "dow-sized join: nothing scales with raw event volume beyond "
        "the first groupBy, the same shape as the EWMA/Holt/slope "
        "rungs beside it. remainder_grid is defined as the grid "
        "difference (truncation commutes with neither sum, documented)."
    ),
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    ma = daily.select(
        "event_type",
        "day",
        "x",
        F.sum("x").over(w).alias("s7"),
        F.count(F.lit(1)).over(w).alias("w_n"),
        (F.datediff("day", F.lit("1970-01-01").cast("date")) % 7).alias("dow"),
    )
    g = f"CAST({DECOMP_GRID} AS DECIMAL(38,0))"
    full_w = ma.filter(F.col("w_n") == 7).select(
        "event_type",
        "day",
        "dow",
        "x",
        "s7",
        F.expr(f"CAST({g} * s7 div 7 AS BIGINT)").alias("trend_grid"),
        F.expr(f"CAST({g} * (7 * x - s7) div 7 AS BIGINT)").alias(
            "detrended_grid"
        ),
    )
    seas = full_w.groupBy("event_type", "dow").agg(
        F.expr(
            f"CAST({g} * SUM(7 * x - s7) div (7 * COUNT(*)) AS BIGINT)"
        ).alias("seasonal_grid")
    )
    return full_w.join(seas, ["event_type", "dow"]).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("n_events"),
        "trend_grid",
        "detrended_grid",
        "seasonal_grid",
        (F.col("detrended_grid") - F.col("seasonal_grid")).alias(
            "remainder_grid"
        ),
    )


HW_PERIOD = 7


def _hw_snap_sql(x: str) -> str:
    return f"floor(({x}) * {HOLT_GRID} + 0.5) / {HOLT_GRID}.0"


def _hw_oracle() -> str:
    pos = f"((o.rn - 1) % {HW_PERIOD}) + 1"
    lv = _hw_snap_sql(
        f"0.5 * (o.y - h.s[{pos}]) + 0.5 * (h.level + h.trend)"
    )
    tr = _hw_snap_sql(f"0.25 * (({lv}) - h.level) + 0.75 * h.trend")
    snew = _hw_snap_sql(f"0.5 * (o.y - ({lv})) + 0.5 * h.s[{pos}]")
    m1 = f"SUM(CASE WHEN rn <= {HW_PERIOD} THEN y END) / {HW_PERIOD}.0"
    m2 = (
        f"SUM(CASE WHEN rn BETWEEN {HW_PERIOD + 1} AND {2 * HW_PERIOD} "
        f"THEN y END) / {HW_PERIOD}.0"
    )
    return f"""
WITH RECURSIVE d AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
o AS MATERIALIZED (
  SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM d
),
init AS MATERIALIZED (
  SELECT {_hw_snap_sql(m1)} AS lv0,
         {_hw_snap_sql(f"(({m2}) - ({m1})) / {HW_PERIOD}.0")} AS tr0
  FROM o WHERE rn <= {2 * HW_PERIOD}
),
ys AS (SELECT list(y ORDER BY rn) AS yl FROM o WHERE rn <= {HW_PERIOD}),
h(rn, day, y, level, trend, snow, s) AS (
  SELECT CAST({HW_PERIOD} AS BIGINT), o.day, o.y, i.lv0, i.tr0,
         {_hw_snap_sql(f"ys.yl[{HW_PERIOD}] - i.lv0")},
         list_transform(range(1, {HW_PERIOD + 1}),
                        i2 -> {_hw_snap_sql("ys.yl[i2] - i.lv0")})
  FROM o, init i, ys WHERE o.rn = {HW_PERIOD}
  UNION ALL
  SELECT o.rn, o.day, o.y,
         {lv}, {tr}, {snew},
         list_transform(range(1, {HW_PERIOD + 1}),
           i2 -> CASE WHEN i2 = {pos} THEN {snew} ELSE h.s[i2] END)
  FROM h JOIN o ON o.rn = h.rn + 1
)
SELECT CAST(rn AS BIGINT) AS rn, CAST(day AS VARCHAR) AS day, y,
       level, trend, snow AS seasonal
FROM h WHERE rn > {HW_PERIOD}
"""


@register(
    "events_holt_winters",
    oracle=_hw_oracle(),
    description=(
        "[EXT] Holt-Winters ADDITIVE seasonal smoothing over the daily "
        "event series (period m=7; dyadic alpha=1/2, beta=1/4, "
        "gamma=1/2, so each step is exact IEEE arithmetic; every state "
        "— level, trend, and all m seasonal indices — snaps to the "
        "1e-6 grid via floor(x*1e6+0.5) on BOTH engines, the "
        "events_holt_trend discipline): level_t = a(y_t - s_{t-m}) + "
        "(1-a)(level+trend), trend_t = b(dlevel) + (1-b)trend, "
        "s_t = g(y_t - level_t) + (1-g)s_{t-m}. Init: level = mean of "
        "week 1, trend = (mean week 2 - mean week 1)/m, seasonals = "
        "week-1 deviations. The recurrence is inherently sequential, "
        "so it runs in ONE applyInPandas over the DAILY AGGREGATE "
        "(calendar-bounded, never the corpus); the oracle walks the "
        "identical recurrence as a recursive CTE carrying the m "
        "seasonal states as a LIST column. Completes the forecasting "
        "shelf: EWMA -> Holt -> Holt-Winters, the first rung that "
        "models the weekday cycle the seasonal-anomaly/decomposition "
        "queries only measure."
    ),
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    m = HW_PERIOD

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        if len(pdf) < 2 * m:
            raise ValueError("Holt-Winters needs at least 2 full periods")

        def snap(x: float) -> float:
            return math.floor(x * HOLT_GRID + 0.5) / HOLT_GRID

        ys = [float(v) for v in pdf["y"]]
        m1 = sum(ys[:m]) / float(m)
        m2 = sum(ys[m : 2 * m]) / float(m)
        lv = snap(m1)
        tr = snap((m2 - m1) / float(m))
        s = [snap(ys[i] - lv) for i in range(m)]
        out = []
        for t in range(m, len(ys)):
            pos = t % m
            s_lag = s[pos]
            lv_new = snap(0.5 * (ys[t] - s_lag) + 0.5 * (lv + tr))
            tr = snap(0.25 * (lv_new - lv) + 0.75 * tr)
            s[pos] = snap(0.5 * (ys[t] - lv_new) + 0.5 * s_lag)
            lv = lv_new
            out.append(
                (
                    t + 1,
                    pdf["day"][t].isoformat(),
                    int(pdf["y"][t]),
                    lv,
                    tr,
                    s[pos],
                )
            )
        return pd.DataFrame(
            out, columns=["rn", "day", "y", "level", "trend", "seasonal"]
        )

    return daily.groupBy(F.lit(1).alias("__g")).applyInPandas(
        hw,
        schema="rn long, day string, y long, level double, "
        "trend double, seasonal double",
    )


@register(
    "events_rolling_median",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
w7 AS (
  SELECT event_type, day, x,
         list_sort(list(x) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
  FROM daily
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x AS n_events,
       win[4] AS med7
FROM w7 WHERE len(win) = 7
""",
    description=(
        "[EXT] exact 7-day rolling MEDIAN of the daily event series — "
        "the robust companion to events_rolling_agg's mean windows "
        "(one stuck-pipeline spike moves a rolling mean for a week "
        "but the median not at all). Spark refuses a window frame on "
        "median(), so both engines take the same route that stays "
        "exact: collect the 7-row frame as an array, sort, take the "
        "middle element — pure integer selection, no interpolation, "
        "bit-identical cross-engine (only full windows emit). The "
        "frame is the CALENDAR-sized daily aggregate, so the "
        "array-per-row costs 7 ints per day, not per event; the "
        "corpus-sized stage is the one groupBy(day)."
    ),
)
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return (
        daily.select(
            "event_type",
            "day",
            "x",
            F.array_sort(F.collect_list("x").over(w)).alias("win"),
        )
        .filter(F.size("win") == 7)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("x").alias("n_events"),
            F.element_at("win", 4).alias("med7"),
        )
    )


PATH_LEN = 3
PATH_TOP_K = 25


@register(
    "events_top_paths",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT *, CAST(SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM gaps
), ordered AS (
  SELECT user_id, session_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                            ORDER BY ts, event_id) AS rn
  FROM sessions
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY rn) AS path,
         CAST(COUNT(*) AS BIGINT) AS path_len
  FROM ordered WHERE rn <= {PATH_LEN}
  GROUP BY user_id, session_id
)
SELECT path, path_len,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM paths
GROUP BY path, path_len
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOP_K}
""",
    description=(
        "[EXT] top session-opening paths — the user-journey mining "
        "rung next to funnel/Markov attribution: sessions (same "
        "30-min-gap contract as events_sessionize) reduce to their "
        f"first {PATH_LEN} event types joined as an ordered path "
        "string, then paths rank by session count with user reach "
        "alongside. Deterministic everywhere a float could hide: the "
        "within-session order ties on (ts, event_id), the path "
        "string is an ORDER-qualified aggregation in both engines "
        "(collect_list over the ranked window in Spark, "
        "string_agg ORDER BY in DuckDB), and the top-k carries the "
        "path itself as the tie-break. Scale shape: two window "
        "passes + one truncated per-session aggregation — state per "
        f"session is <= {PATH_LEN} types, the path table is "
        "path-vocabulary-sized, and the final top-k is "
        "TakeOrderedAndProject."
    ),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.col("ts").cast("long") * 1_000_000 - F.lag(
        F.col("ts").cast("long") * 1_000_000
    ).over(w)
    sess = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(gap_us > SESSION_GAP_US, 1).otherwise(0).alias("new_session"),
    ).select(
        "*",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("session_id"),
    )
    ranked = sess.select(
        "user_id",
        "session_id",
        "event_type",
        F.row_number()
        .over(
            Window.partitionBy("user_id", "session_id").orderBy(
                "ts", "event_id"
            )
        )
        .alias("rn"),
    ).filter(F.col("rn") <= PATH_LEN)
    paths = ranked.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).cast("long").alias("path_len"),
    )
    return (
        paths.groupBy("path", "path_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATH_TOP_K)
    )
