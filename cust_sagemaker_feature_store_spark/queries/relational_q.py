"""Relational query surface over the star schema (SURVEY.md §2.2-2.7).

The reference delegates all of this to Athena/Presto (reference:
historical_features.py:28-37); here it is the engine's own DataFrame
surface, expressed declaratively so Catalyst gets pushdown/pruning/join
reordering for free (SURVEY.md §4). Dimension joins use explicit
broadcast hints — at 100 TB the fact table never shuffles for a
dimension join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import davg, dsum, register, sql_davg, sql_dsum


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 2)} AS sum_qty,
       {sql_dsum('l_extendedprice', 2)} AS sum_base_price,
       {sql_dsum('l_extendedprice*(1-l_discount)', 4)} AS sum_disc_price,
       {sql_dsum('l_extendedprice*(1-l_discount)*(1+l_tax)', 6)} AS sum_charge,
       {sql_davg('l_quantity', 2)} AS avg_qty,
       {sql_davg('l_extendedprice', 2)} AS avg_price,
       {sql_davg('l_discount', 2)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    description="TPC-H Q1-style pricing summary: multi-aggregate groupBy with map-side partial aggregation.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg(F.col("l_quantity"), 2).alias("avg_qty"),
            davg(F.col("l_extendedprice"), 2).alias("avg_price"),
            davg(F.col("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       {sql_dsum('l_extendedprice*(1-l_discount)', 4)} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    description="TPC-H Q3-style: fact-dim joins (customer broadcast) + group + deterministic top-10.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
SELECT r_name, n_name,
       {sql_dsum('l_extendedprice*(1-l_discount)', 4)} AS revenue,
       COUNT(*) AS n_items
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r_name, n_name
""",
    description="TPC-H Q5-style: 5-way star join, all dimensions broadcast, revenue per region/nation.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    return (
        li.join(
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_semi_customers_with_open_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
""",
    description="Left-semi join: keyset filtering without payload duplication (SURVEY.md §2.3 [EXT]).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "join_anti_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
""",
    description=(
        "Left-anti join: customers with no partial-status orders. The "
        "build side is filtered before the anti join (predicate inside "
        "NOT EXISTS, not WHERE) — at sf0.01 every customer has *some* "
        "order, so the unfiltered form verified nothing (r1 vacuous "
        "0-row pass)."
    ),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    partial = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "P"
    )
    return cust.join(partial, cust.c_custkey == partial.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "agg_orders_by_status",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice', 2)} AS total_revenue,
       {sql_davg('o_totalprice', 2)} AS avg_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY o_orderstatus
""",
    description="Standard groupBy aggregate surface: count/sum/avg/min/max/countDistinct (SURVEY.md §2.4 [EXT]).",
)
def agg_orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), 2).alias("total_revenue"),
        davg(F.col("o_totalprice"), 2).alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "agg_rollup_status_priority",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) + 2*GROUPING(o_orderpriority) AS grp,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice', 2)} AS total_revenue
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    description="Hierarchical ROLLUP with grouping id — multi-level aggregates in one pass.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        (F.grouping("o_orderstatus") + 2 * F.grouping("o_orderpriority")).alias("grp"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), 2).alias("total_revenue"),
    ).select(
        "o_orderstatus", "o_orderpriority", "grp", "n_orders", "total_revenue"
    )


@register(
    "filter_part_predicates",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE p_type IN ('ECONOMY', 'PROMO')
  AND p_brand LIKE 'Brand#1%'
  AND p_size BETWEEN 5 AND 40
  AND p_name IS NOT NULL
""",
    description="Predicate surface: IN-list, LIKE prefix, numeric BETWEEN, IS NOT NULL — all pushdown-eligible.",
)
def filter_part_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").isin("ECONOMY", "PROMO")
        & F.col("p_brand").like("Brand#1%")
        & F.col("p_size").between(5, 40)
        & F.col("p_name").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@register(
    "sort_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    description="Top-k: orderBy+limit compiles to TakeOrderedAndProject — no full sort at scale.",
)
def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "set_union_segments",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    description="Distinct union of two keysets (SURVEY.md §2.7 [EXT]).",
)
def set_union_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.union(b).distinct()


@register(
    "set_intersect_segments",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    description="Set intersection of two keysets.",
)
def set_intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.intersect(b)


@register(
    "set_except_segments",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""",
    description="Set difference of two keysets.",
)
def set_except_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.subtract(b)  # EXCEPT (distinct) semantics


@register(
    "window_rank_orders",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank,
       dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_dense_rank,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
""",
    description="Ranking windows per customer (SURVEY.md §2.5 [EXT]); row_number carries a unique tie-break.",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    by_price = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    by_price_uniq = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(by_price).alias("price_rank"),
        F.dense_rank().over(by_price).alias("price_dense_rank"),
        F.row_number().over(by_price_uniq).alias("rn"),
    )
