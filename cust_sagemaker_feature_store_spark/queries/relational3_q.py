"""Relational surface completion: outer joins, NOT IN, disjunctive
predicates, pivot/unpivot, exact moments, deterministic sampling, and
range joins (SURVEY.md §2.2-2.6 [EXT]).

The reference delegates all SQL to Athena/Presto (reference:
historical_features.py:28-37); these queries complete the surface a
Presto user would expect, each expressed as declarative DataFrame code
so Catalyst keeps pushdown/pruning/broadcast decisions. Scale notes per
query explain why the plan survives 1000 executors and 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.timeutil import to_ltz
from .registry import davg, dsum, register, sql_davg, sql_dsum


@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice*l_discount', 4)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    description=(
        "TPC-H Q6-style forecast revenue: pure scan+filter+agg, no "
        "join/shuffle beyond the final single-group combine — all three "
        "predicates push to the parquet scan."
    ),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q12_priority_by_returnflag",
    oracle="""
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_returnflag
""",
    description=(
        "TPC-H Q12-style: CASE-classified counts over a fact-fact join; "
        "orders projects two columns so the join build side stays narrow."
    ),
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
""",
    description=(
        "TPC-H Q13-style customer order distribution: LEFT OUTER join "
        "with an ON-clause filter (kept out of WHERE so zero-order "
        "customers survive), COUNT(col) null-skipping, then a second "
        "aggregation over the counts."
    ),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q16_supplier_count_by_brand",
    oracle="""
SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand NOT IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND p.p_type <> 'PROMO'
GROUP BY p.p_brand, p.p_type
""",
    description=(
        "TPC-H Q16-style supplier counts: NOT IN exclusion list + "
        "COUNT(DISTINCT) per group; lineitem stands in for partsupp as "
        "the part-supplier link. Distinct-agg expands then dedups — the "
        "one shape where Spark plans a two-stage expand/agg."
    ),
)
def q16_supplier_count_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        ~F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & (F.col("p_type") != "PROMO")
    ).select("p_partkey", "p_brand", "p_type")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
SELECT {sql_dsum('l.l_extendedprice*(1-l.l_discount)', 4)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
""",
    description=(
        "TPC-H Q19-style OR-of-AND blocks spanning both join sides: "
        "Catalyst extracts the common join key and evaluates the "
        "disjunction post-join; per-side conjuncts (brand/size) still "
        "push into the part scan via the derived IN-filter."
    ),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(part, li.l_partkey == part.p_partkey)
    block = lambda brand, szhi, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, szhi)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return j.filter(
        block("Brand#12", 15, 1, 11)
        | block("Brand#23", 25, 10, 20)
        | block("Brand#3", 35, 20, 30)
    ).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q22_idle_customers",
    oracle=f"""
WITH avg_bal AS (
  SELECT {sql_davg('c_acctbal', 2)} AS v FROM customer WHERE c_acctbal > 0.0
)
SELECT (c.c_custkey % 10) AS cntrycode,
       COUNT(*) AS numcust,
       {sql_dsum('c.c_acctbal', 2)} AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.v
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY 1
""",
    description=(
        "TPC-H Q22-style idle high-balance customers (no urgent orders): "
        "scalar average subquery (broadcast one-row join), NOT EXISTS "
        "anti join over a filtered build side, modulo-derived country "
        "code grouping. The 'no orders at all' form passed vacuously "
        "with 0 rows at sf0.01 (r1), so the idleness predicate is "
        "priority-scoped to actually exercise the anti join."
    ),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal"), 2).alias("v")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("v"))
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy((F.col("c_custkey") % 10).alias("cntrycode")).agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
    )


@register(
    "q2_min_balance_supplier",
    oracle="""
SELECT s.s_suppkey, s.s_name, n.n_name AS nation, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN (
  SELECT s_nationkey, MIN(s_acctbal) AS min_bal
  FROM supplier GROUP BY s_nationkey
) m ON s.s_nationkey = m.s_nationkey AND s.s_acctbal = m.min_bal
""",
    description=(
        "TPC-H Q2-style correlated MIN: suppliers holding their "
        "nation's minimum balance, decorrelated as a per-nation window "
        "min — one shuffle on nationkey instead of an agg+self-join."
    ),
)
def q2_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    w = Window.partitionBy("s_nationkey")
    return (
        supp.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"), "s_acctbal")
    )


@register(
    "pivot_priority_by_status",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders
GROUP BY o_orderpriority
""",
    description=(
        "PIVOT: order counts spread across status columns. Explicit "
        "pivot values keep the plan single-pass (no distinct-values "
        "pre-query) — mandatory at 100 TB."
    ),
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    )


@register(
    "unpivot_flag_metrics",
    oracle=f"""
WITH agg AS (
  SELECT l_returnflag,
         {sql_dsum('l_quantity', 2)} AS sum_qty,
         {sql_dsum('l_extendedprice', 2)} AS sum_price,
         {sql_dsum('l_discount', 2)} AS sum_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, value FROM (
  SELECT l_returnflag, 'qty' AS metric, sum_qty AS value FROM agg
  UNION ALL SELECT l_returnflag, 'price', sum_price FROM agg
  UNION ALL SELECT l_returnflag, 'disc', sum_disc FROM agg
)
""",
    description=(
        "UNPIVOT (melt): wide per-flag aggregates to long (flag, "
        "metric, value) via stack() — generator expression, zero extra "
        "shuffle after the aggregation."
    ),
)
def unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dsum(F.col("l_quantity"), 2).alias("sum_qty"),
        dsum(F.col("l_extendedprice"), 2).alias("sum_price"),
        dsum(F.col("l_discount"), 2).alias("sum_disc"),
    )
    return agg.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'qty', sum_qty, 'price', sum_price, 'disc', sum_disc)"
        ).alias("metric", "value"),
    )


@register(
    "agg_exact_moments",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS s1,
         SUM(CAST(ROUND(l_quantity*100) AS BIGINT) * CAST(ROUND(l_quantity*100) AS BIGINT)) AS s2
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(s1 AS DOUBLE)/100.0/n AS mean_qty,
       (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/n)/n/10000.0 AS var_qty
FROM s
""",
    description=(
        "Population mean/variance via exact integer moment sums "
        "(scale-to-int64 s1/s2), so the result is bit-identical across "
        "engines and summation orders — the dsum discipline extended to "
        "second moments. One map-side-combined shuffle."
    ),
)
def agg_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity") * 100).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
    )
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    return s.select(
        "l_returnflag",
        "n",
        (s1d / 100.0 / F.col("n")).alias("mean_qty"),
        ((s2d - s1d * s1d / F.col("n")) / F.col("n") / 10000.0).alias("var_qty"),
    )


@register(
    "sample_hash_deterministic",
    oracle=f"""
SELECT COUNT(*) AS n_sampled,
       {sql_dsum('o_totalprice', 2)} AS sum_price
FROM orders
WHERE (o_orderkey * 2654435761) % 1000 < 100
""",
    description=(
        "Deterministic ~10% sample via multiplicative key hashing — "
        "unlike rand()-based sampling this is reproducible across "
        "engines, partitions, and reruns, which is what a training-data "
        "pipeline needs for stable holdout splits."
    ),
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderkey") * F.lit(2654435761)) % 1000 < 100
    ).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        dsum(F.col("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "range_join_event_followups",
    oracle="""
SELECT a.event_type AS first_type, b.event_type AS next_type,
       COUNT(*) AS n_pairs,
       CAST(SUM(epoch_us(b.ts) - epoch_us(a.ts)) AS DOUBLE)/COUNT(*)/1000000.0 AS avg_gap_s
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY 1, 2
""",
    description=(
        "Range (interval) self-join: follow-up events within 10 minutes "
        "of a prior event by the same user. Equi-key on user_id makes "
        "it a hash join with a range residual — no O(n²) cross product; "
        "gap average uses exact integer microsecond sums."
    ),
)
def range_join_event_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    a = ev.alias("a")
    b = ev.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    gap_us = F.unix_micros(to_ltz(F.col("b.ts"))) - F.unix_micros(to_ltz(F.col("a.ts")))
    return (
        pairs.groupBy(
            F.col("a.event_type").alias("first_type"),
            F.col("b.event_type").alias("next_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (F.sum(gap_us).cast("double") / F.count(F.lit(1)) / 1000000.0).alias(
                "avg_gap_s"
            ),
        )
    )


KEYLESS_TOL_US = 60 * 1_000_000  # +/- 1 minute


@register(
    "range_join_keyless_nearby",
    oracle=f"""
SELECT a.event_type AS err_type, b.event_type AS near_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM (SELECT * FROM events WHERE event_type = 'error') a
JOIN (SELECT * FROM events WHERE event_type IN ('purchase', 'signup')) b
  ON ABS(epoch_us(a.ts) - epoch_us(b.ts)) <= {KEYLESS_TOL_US}
GROUP BY 1, 2
""",
    description=(
        "[EXT] KEYLESS time-tolerance join (operators/rangejoin."
        "time_tolerance_join): purchases/signups within +/-1 minute of "
        "any error event, across ALL users — the incident-correlation "
        "query that has no equi key to hash on. The naive theta form "
        "(what the oracle runs) examines |errors| x |others| pairs; "
        "the operator buckets both sides on floor(t/tol) and "
        "replicates one side to its three adjacent buckets, turning "
        "it into a hash equi join on the bucket key + exact residual "
        "— pairs examined collapse to co-located buckets only. "
        "Exact integer-microsecond arithmetic throughout."
    ),
)
def range_join_keyless_nearby(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import time_tolerance_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_type").alias("err_type"), F.col("ts").alias("err_ts")
    )
    others = ev.filter(F.col("event_type").isin("purchase", "signup")).select(
        F.col("event_type").alias("near_type"), F.col("ts").alias("near_ts")
    )
    joined = time_tolerance_join(
        errors,
        others,
        F.unix_micros(to_ltz(F.col("err_ts"))),
        F.unix_micros(to_ltz(F.col("near_ts"))),
        KEYLESS_TOL_US,
    )
    return joined.groupBy("err_type", "near_type").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


PROMO_DAYS = ("2024-01-01", "2024-01-30")


@register(
    "join_interval_overlap",
    oracle=f"""
WITH spans AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         epoch_us(MIN(ts)) AS ls, epoch_us(MAX(ts)) + 1 AS le
  FROM events GROUP BY 1, 2
),
promos AS (
  SELECT CAST(d.d AS DATE) AS promo_day,
         epoch_us(CAST(d.d AS DATE) + INTERVAL 10 HOUR) AS rs,
         epoch_us(CAST(d.d AS DATE) + INTERVAL 14 HOUR) AS re
  FROM unnest(generate_series(DATE '{PROMO_DAYS[0]}',
                              DATE '{PROMO_DAYS[1]}',
                              INTERVAL 1 DAY)) AS d(d)
)
SELECT s.user_id,
       strftime(s.day, '%Y-%m-%d') AS day,
       strftime(p.promo_day, '%Y-%m-%d') AS promo_day,
       least(s.le, p.re) - greatest(s.ls, p.rs) AS overlap_us
FROM spans s JOIN promos p ON s.ls < p.re AND p.rs < s.le
""",
    description=(
        "[EXT] general interval-OVERLAP join (the §2.3 member the "
        "as-of/range family lacked): per-user daily activity spans "
        "[first event, last event + 1µs) joined against daily promo "
        "windows [10:00, 14:00) on the half-open overlap predicate, "
        "with the exact overlap duration in integer µs. The operator "
        "(operators/rangejoin.interval_overlap_join) explodes both "
        "sides into covering 6h buckets and hash-joins on the bucket "
        "id — a pair is kept only in its CANONICAL bucket (the bucket "
        "of max(start, start), which both expansions cover), so "
        "dedup costs nothing and the plan is a plain shuffled "
        "equi-join with a residual filter, never a broadcast nested "
        "loop; replication is ceil(span/bucket)+1 per row. The oracle "
        "states the overlap predicate directly (DuckDB's optimizer "
        "may nested-loop it — at oracle scale that is fine; at 100 TB "
        "the bucketed plan is the point)."
    ),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.unix_micros(F.min("ts")).alias("span_s"),
        (F.unix_micros(F.max("ts")) + 1).alias("span_e"),
    )
    promos = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(PROMO_DAYS[0]).cast("date"),
                F.lit(PROMO_DAYS[1]).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("promo_day")
    ).select(
        F.col("promo_day").cast("date").alias("promo_day"),
        F.unix_micros(
            F.col("promo_day").cast("timestamp") + F.expr("INTERVAL 10 HOURS")
        ).alias("promo_s"),
        F.unix_micros(
            F.col("promo_day").cast("timestamp") + F.expr("INTERVAL 14 HOURS")
        ).alias("promo_e"),
    )
    joined = interval_overlap_join(
        spans,
        promos,
        F.col("span_s"),
        F.col("span_e"),
        F.col("promo_s"),
        F.col("promo_e"),
        bucket_us=6 * 3600 * 1_000_000,
    )
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.date_format("promo_day", "yyyy-MM-dd").alias("promo_day"),
        (
            F.least("span_e", "promo_e") - F.greatest("span_s", "promo_s")
        ).alias("overlap_us"),
    )
