"""Round-7 query surface: grouped exact order statistics as first-class
operators — quantile vectors (p50/p90/p99 in one pass), Tukey IQR
fences, and trimmed means (SURVEY.md §2.4 [EXT] — the robust-statistics
layer of the monitoring suite, generalizing r6's single grouped median
via operators/order_stats.py).

Exactness discipline (registry.py): values live on the int64 cents
grid, counts/ranks/partial sums are int64, each statistic ends in at
most one correctly-rounded division — DuckDB and the JVM agree
bit-for-bit. Quantiles are type-1 (inverse CDF) selected by the pure
integer predicate den·cum_n >= num·n.

Scale: all three queries share the sharded-prefix-sum shape audited in
r6 (one data-sized groupBy, windows partitioned by (group, value-range
shard), broadcast offset frames bounded by the VALUE RANGE, never the
row count) — see operators/order_stats.py for the invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.order_stats import (
    grouped_exact_quantiles,
    grouped_iqr_fences,
    grouped_trimmed_mean,
)
from .registry import register

# events.value spans ~[0, 1000] -> cents <= ~100k: shard 100 keeps the
# per-group offset frame <= ~1000 rows (range-bounded), same bound the
# r6 grouped median documented.
EVENT_VALUE_SHARD = 100
# o_totalprice spans ~[900, 600k] -> cents <= ~6e7: shard 1e6 keeps the
# per-group offset frame <= ~60 rows.
PRICE_SHARD = 1_000_000


@register(
    "agg_exact_quantiles_by_type",
    oracle="""
WITH pv AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS nn
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, cents,
         CAST(SUM(nn) OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT)
           AS cum_n
  FROM pv
),
tot AS (
  SELECT event_type, CAST(SUM(nn) AS BIGINT) AS n FROM pv GROUP BY 1
)
SELECT tot.event_type, tot.n AS n_rows,
       MIN(CASE WHEN cum.cum_n * 2 >= tot.n THEN cum.cents END) AS p50_cents,
       MIN(CASE WHEN cum.cum_n * 10 >= tot.n * 9 THEN cum.cents END) AS p90_cents,
       MIN(CASE WHEN cum.cum_n * 100 >= tot.n * 99 THEN cum.cents END) AS p99_cents,
       MIN(CASE WHEN cum.cum_n * 2 >= tot.n THEN cum.cents END) / 100.0 AS p50_value,
       MIN(CASE WHEN cum.cum_n * 10 >= tot.n * 9 THEN cum.cents END) / 100.0 AS p90_value,
       MIN(CASE WHEN cum.cum_n * 100 >= tot.n * 99 THEN cum.cents END) / 100.0 AS p99_value
FROM cum JOIN tot USING (event_type)
GROUP BY tot.event_type, tot.n
""",
    description=(
        "[EXT] exact p50/p90/p99 quantile VECTOR per event type from "
        "ONE cumulative-count pass (operators/order_stats."
        "grouped_exact_quantiles) — the grouped SLO/latency report "
        "every pipeline wants, with zero sketch error. Generalizes "
        "r6's agg_exact_median_by_type: same sharded prefix sum, N "
        "quantiles selected by integer predicates den*cum_n >= num*n "
        "in a single conditional-min aggregation instead of one scan "
        "per quantile. The offset frame stays bounded by |groups| x "
        "value-range/shard — independent of row count."
    ),
)
def agg_exact_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    q = grouped_exact_quantiles(
        base, "event_type", shard_size=EVENT_VALUE_SHARD
    )
    return q.select(
        "event_type",
        "n_rows",
        "p50_cents",
        "p90_cents",
        "p99_cents",
        (F.col("p50_cents") / 100.0).alias("p50_value"),
        (F.col("p90_cents") / 100.0).alias("p90_value"),
        (F.col("p99_cents") / 100.0).alias("p99_value"),
    )


@register(
    "agg_iqr_outliers_by_priority",
    oracle="""
WITH pv AS (
  SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS nn
  FROM orders GROUP BY 1, 2
),
cum AS (
  SELECT o_orderpriority, cents, nn,
         CAST(SUM(nn) OVER (PARTITION BY o_orderpriority ORDER BY cents)
              AS BIGINT) AS cum_n
  FROM pv
),
tot AS (
  SELECT o_orderpriority, CAST(SUM(nn) AS BIGINT) AS n FROM pv GROUP BY 1
),
quart AS (
  SELECT tot.o_orderpriority, tot.n AS n_rows,
         MIN(CASE WHEN cum.cum_n * 4 >= tot.n THEN cum.cents END) AS q1_cents,
         MIN(CASE WHEN cum.cum_n * 4 >= tot.n * 3 THEN cum.cents END) AS q3_cents
  FROM cum JOIN tot USING (o_orderpriority)
  GROUP BY 1, 2
),
fence AS (
  SELECT *, q3_cents - q1_cents AS iqr_cents FROM quart
)
SELECT f.o_orderpriority, f.n_rows, f.q1_cents, f.q3_cents, f.iqr_cents,
       f.q1_cents / 100.0 AS q1_value, f.q3_cents / 100.0 AS q3_value,
       COALESCE(CAST(SUM(CASE
         WHEN c.cents * 2 < f.q1_cents * 2 - f.iqr_cents * 3 THEN c.nn
         WHEN c.cents * 2 > f.q3_cents * 2 + f.iqr_cents * 3 THEN c.nn
         ELSE 0 END) AS BIGINT), 0) AS n_outliers
FROM fence f JOIN cum c USING (o_orderpriority)
GROUP BY 1, 2, 3, 4, 5, 6, 7
""",
    description=(
        "[EXT] Tukey boxplot audit per order priority: exact type-1 "
        "quartiles, IQR, and the count of orders beyond the 1.5*IQR "
        "fences (operators/order_stats.grouped_iqr_fences) — the "
        "robust outlier-rate monitor that does not move when a whale "
        "order lands. The half-cent 1.5*IQR product stays exact by "
        "comparing at 2x scale (2*cents vs 2*q1 - 3*iqr): no floating "
        "point ever enters the predicate, so the outlier COUNT — the "
        "alert-worthy number — is bit-stable across engines and "
        "partitionings."
    ),
)
def agg_iqr_outliers_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    f = grouped_iqr_fences(base, "o_orderpriority", shard_size=PRICE_SHARD)
    return f.select(
        "o_orderpriority",
        "n_rows",
        "q1_cents",
        "q3_cents",
        "iqr_cents",
        (F.col("q1_cents") / 100.0).alias("q1_value"),
        (F.col("q3_cents") / 100.0).alias("q3_value"),
        "n_outliers",
    )


@register(
    "agg_trimmed_mean_by_priority",
    oracle="""
WITH pv AS (
  SELECT o_orderpriority AS g, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS nn
  FROM orders GROUP BY 1, 2
),
cum AS (
  SELECT g, cents, nn,
         CAST(SUM(nn) OVER (PARTITION BY g ORDER BY cents) AS BIGINT) AS cum_n
  FROM pv
),
tot AS (
  SELECT g, CAST(SUM(nn) AS BIGINT) AS n FROM pv GROUP BY 1
),
kk AS (
  SELECT g, n, CAST(n // 10 AS BIGINT) AS k FROM tot WHERE n > 2 * (n // 10)
),
kept AS (
  SELECT c.g, k.n, k.k,
         GREATEST(0, LEAST(c.cum_n, k.n - k.k)
                     - GREATEST(c.cum_n - c.nn, k.k)) * c.cents AS contrib
  FROM cum c JOIN kk k USING (g)
)
SELECT g AS o_orderpriority, n AS n_rows,
       k AS n_trimmed_each_side,
       CAST(n - 2 * k AS BIGINT) AS n_kept,
       CAST(SUM(contrib) AS BIGINT) AS kept_sum_cents,
       CAST(SUM(contrib) AS BIGINT) / 100.0 / CAST(n - 2 * k AS BIGINT)
         AS trimmed_mean
FROM kept GROUP BY 1, 2, 3
""",
    description=(
        "[EXT] exact 10%-trimmed mean of order totals per priority "
        "(operators/order_stats.grouped_trimmed_mean): drop the "
        "lowest and highest floor(n/10) orders, average the rest — "
        "robust location without the median's information loss. Each "
        "distinct value contributes the pure-integer overlap of its "
        "rank interval with [k, n-k), so the kept sum is an exact "
        "int64 and the mean is ONE final division — no sort of the "
        "raw rows, no per-row rank materialization, just the shared "
        "sharded prefix sum."
    ),
)
def agg_trimmed_mean_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    t = grouped_trimmed_mean(
        base, "o_orderpriority", trim_num=1, trim_den=10,
        shard_size=PRICE_SHARD,
    )
    return t.select(
        "o_orderpriority",
        "n_rows",
        "n_trimmed_each_side",
        "n_kept",
        "kept_sum_cents",
        (F.col("kept_sum_cents") / 100.0 / F.col("n_kept")).alias(
            "trimmed_mean"
        ),
    )
