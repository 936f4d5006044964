"""Advanced relational surface: subqueries, HAVING, conditional and
grouping-set aggregation, multi-join star queries (SURVEY.md §2.2-2.5
[EXT]).

The reference's only query is a single-table projection+BETWEEN
(reference: historical_features.py:28-31); everything here is the
[EXT] completion of the relational surface that Athena/Presto gave the
reference for free. All of it is declarative DataFrame code: EXISTS /
NOT EXISTS become semi/anti joins (no Python loop), scalar subqueries
become broadcast one-row joins, and HAVING is a post-aggregation
filter — exactly the shapes Catalyst knows how to optimize, and at
100 TB the fact-table side never moves except for its one groupBy/join
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import davg, dsum, iso, register, sql_davg, sql_dsum, sql_iso


@register(
    "q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
""",
    description=(
        "TPC-H Q4-style: correlated EXISTS as a left-semi join with a "
        "non-equi conjunct, then count by priority."
    ),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    exists = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return exists.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q7_nation_pair_revenue",
    oracle=f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       {sql_dsum('l.l_extendedprice*(1-l.l_discount)', 4)} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE ns.n_name <> nc.n_name
GROUP BY ns.n_name, nc.n_name
""",
    description=(
        "TPC-H Q7-style nation-pair revenue: five-way star join. Only "
        "the bounded dim (nation) carries a broadcast hint; orders/"
        "customer/supplier scale with the data, so their join strategy "
        "is left to the optimizer's size estimates — auto-broadcast at "
        "small SF, shuffle join at 100 TB."
    ),
)
def q7_nation_pair_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("cnk"),
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("snk"),
        )
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy("supp_nation", "cust_nation").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       {sql_dsum('l.l_extendedprice*(1-l.l_discount)', 4)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    description=(
        "TPC-H Q10-style top-20 customers by returned-item revenue: "
        "join + group + deterministic top-k (exact-decimal revenue, "
        "custkey tie-break)."
    ),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_effect",
    oracle=f"""
SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m') AS ship_month,
       {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice*(1-l.l_discount) ELSE 0 END", 4)} AS promo_revenue,
       {sql_dsum('l.l_extendedprice*(1-l.l_discount)', 4)} AS total_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
""",
    description=(
        "TPC-H Q14-style promo effect: conditional aggregation (CASE "
        "inside SUM) per ship month over a part join (strategy "
        "size-estimated by the optimizer)."
    ),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.groupBy(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month")
    ).agg(
        dsum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)), 4).alias(
            "promo_revenue"
        ),
        dsum(disc, 4).alias("total_revenue"),
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
WITH pa AS (
  SELECT l_partkey, {sql_davg('l_quantity', 2)} AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT COUNT(*) AS n_lines, {sql_dsum('l.l_extendedprice', 2)} AS sum_revenue
FROM lineitem l
JOIN pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < 0.5 * pa.avg_qty
""",
    description=(
        "TPC-H Q17-style: correlated scalar subquery (per-part average "
        "quantity) decorrelated into an aggregate self-join; exact-"
        "decimal average keeps the < comparison engine-identical."
    ),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        davg(F.col("l_quantity"), 2).alias("avg_qty")
    )
    joined = li.join(
        per_part,
        (li.l_partkey == F.col("pa_partkey"))
        & (li.l_quantity < 0.5 * F.col("avg_qty")),
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(F.col("l_extendedprice"), 2).alias("sum_revenue"),
    )


@register(
    "q18_large_orders",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey, {sql_dsum('l_quantity', 2)} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {sql_dsum('l_quantity', 2)} > 300
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, {sql_iso('o.o_orderdate')} AS order_date,
       o.o_totalprice, big.sum_qty
FROM big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",
    description=(
        "TPC-H Q18-style large orders: HAVING over a groupBy (post-"
        "aggregation filter), then joins back to orders/customer — the "
        "aggregate runs first so only qualifying keys join."
    ),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            iso("o_orderdate").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
    )


@register(
    "agg_cube_status_priority",
    oracle=f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice', 2)} AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    description=(
        "CUBE grouping sets over (status, priority) — all four grouping "
        "combinations in one pass; NULL markers coalesced to 'ALL' so "
        "both engines agree on the wire shape."
    ),
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_price",
        )
    )


@register(
    "filter_in_like_null",
    oracle="""
SELECT p_partkey, p_brand, p_type, p_size,
       (p_type LIKE 'PRO%') AS is_promo,
       (NULLIF(p_type, 'ECONOMY') IS NULL) AS is_economy
FROM part
WHERE p_brand IN ('Brand#1', 'Brand#5', 'Brand#13')
  AND p_type NOT LIKE 'MED%'
  AND p_size IS NOT NULL
""",
    description=(
        "Predicate surface beyond BETWEEN: IN-list, LIKE / NOT LIKE, "
        "IS (NOT) NULL — all pushdown-eligible at the parquet scan."
    ),
)
def filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_brand").isin("Brand#1", "Brand#5", "Brand#13")
        & ~F.col("p_type").like("MED%")
        & F.col("p_size").isNotNull()
    ).select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_size",
        F.col("p_type").like("PRO%").alias("is_promo"),
        F.nullif(F.col("p_type"), F.lit("ECONOMY")).isNull().alias("is_economy"),
    )


@register(
    "scalar_subquery_above_avg",
    oracle=f"""
SELECT p_partkey, p_name, p_retailprice,
       (SELECT {sql_davg('p_retailprice', 2)} FROM part) AS avg_price
FROM part
WHERE p_retailprice > (SELECT {sql_davg('p_retailprice', 2)} FROM part)
""",
    description=(
        "Uncorrelated scalar subquery (global average price) as a "
        "broadcast one-row cross join — no driver-side collect."
    ),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    avg_row = part.agg(davg(F.col("p_retailprice"), 2).alias("avg_price"))
    return (
        part.join(F.broadcast(avg_row))
        .filter(F.col("p_retailprice") > F.col("avg_price"))
        .select("p_partkey", "p_name", "p_retailprice", "avg_price")
    )


@register(
    "not_exists_slow_orders",
    oracle="""
SELECT o.o_orderstatus, COUNT(*) AS n_orders
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
)
GROUP BY o.o_orderstatus
""",
    description=(
        "Correlated NOT EXISTS with a non-equi conjunct as a left-anti "
        "join: orders none of whose lines shipped within a week."
    ),
)
def not_exists_slow_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    anti = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")),
        "left_anti",
    )
    return anti.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "window_ntile_cume",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       NTILE(4) OVER w AS balance_quartile,
       ROUND(CUME_DIST() OVER w, 8) AS balance_cume,
       ROUND(PERCENT_RANK() OVER w, 8) AS balance_pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    description=(
        "Distribution window functions (ntile / cume_dist / "
        "percent_rank) per market segment; custkey tie-break makes the "
        "frame order total, hence engine-deterministic."
    ),
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.cume_dist().over(w), 8).alias("balance_cume"),
        F.round(F.percent_rank().over(w), 8).alias("balance_pct_rank"),
    )
