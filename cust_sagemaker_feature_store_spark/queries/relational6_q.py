"""TPC-H Q20/Q21-shaped queries, completing the nested-subquery join
surface (SURVEY.md §2.3 [EXT]).

The reference delegates all SQL to Athena/Presto (reference:
historical_features.py:28-37); these two shapes are the hardest of the
classic 22 — a semi-join against a HAVING-filtered aggregate subquery
(Q20) and a correlated EXISTS + NOT-EXISTS self-reference (Q21). The
testdata lacks ``partsupp`` and ``l_commitdate``/``l_receiptdate``, so
each is adapted to the available star schema while preserving the exact
plan character the original exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import dsum, register, sql_dsum

_Q20_NATIONS = ("NATION_1", "NATION_7", "NATION_13", "NATION_19", "NATION_24")
_Q20_NATION_SQL = ", ".join(f"'{n}'" for n in _Q20_NATIONS)


@register(
    "q20_heavy_part_suppliers",
    oracle=f"""
SELECT s.s_suppkey, s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_name IN ({_Q20_NATION_SQL}))
  AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'red %'
        GROUP BY l.l_suppkey
        HAVING {sql_dsum('l.l_quantity', 2)} > 2000)
ORDER BY s.s_name
""",
    description=(
        "TPC-H Q20-style potential promotion: suppliers in a nation set "
        "who shipped > 2000 units of red parts — a semi join against a "
        "HAVING-filtered aggregate subquery. The part dim filter "
        "broadcasts into the lineitem scan; the aggregated supplier set "
        "(bounded by |supplier|) broadcasts back as the IN-list, so the "
        "only shuffle at 100 TB is the per-suppkey partial aggregate."
    ),
)
def q20_heavy_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity"), 2).alias("qty"))
        .filter(F.col("qty") > 2000)
        .select("l_suppkey")
    )
    nations = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*_Q20_NATIONS))
        .select("n_nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(
            F.broadcast(nations),
            supp.s_nationkey == nations.n_nationkey,
            "left_semi",
        )
        .join(F.broadcast(heavy), F.col("s_suppkey") == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
SELECT s.s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
""",
    description=(
        "TPC-H Q21-style waiting suppliers: the sole supplier late on a "
        "multi-supplier finalized order ('late' adapted to shipdate > "
        "orderdate + 90 days, since the testdata has no commit/receipt "
        "dates). EXISTS -> left-semi and NOT EXISTS -> left-anti, both "
        "keyed on l_orderkey so they co-partition with the late set; "
        "(numwait DESC, s_name) is a total order, making the top-10 "
        "deterministic in both engines."
    ),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    waiting = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(supp), waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@register(
    "sample_stratified_exact",
    oracle="""
SELECT status, orderkey, totalprice
FROM (
  SELECT o_orderstatus AS status, o_orderkey AS orderkey,
         o_totalprice AS totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderstatus
           ORDER BY (o_orderkey * 2654435761) % 4294967296, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 50
""",
    description=(
        "Exact stratified sampling: exactly k=50 rows per o_orderstatus "
        "stratum, the class-balanced draw a training pipeline needs when "
        "label frequencies are skewed. Ordering by a multiplicative key "
        "hash (not rand()) makes the draw reproducible across engines, "
        "partitions, and reruns; rank<=k compiles to WindowGroupLimit, "
        "so each map task keeps only k rows per stratum before the "
        "shuffle — at 100 TB the exchange carries k*|strata| rows per "
        "task, not the table. Complements the Bernoulli hash sample "
        "(sample_hash_deterministic), which cannot guarantee per-class "
        "counts."
    ),
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    h = (F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296)
    w = Window.partitionBy("o_orderstatus").orderBy(h, "o_orderkey")
    return (
        orders.select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 50)
        .drop("rn")
    )


@register(
    "fs_decayed_features",
    oracle=f"""
SELECT o_custkey AS custkey,
       COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice * pow(0.5, CAST(FLOOR(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-08-01') / 180.0) AS BIGINT))", 4)} AS decayed_spend
FROM orders
GROUP BY o_custkey
""",
    description=(
        "Time-decayed feature engineering: per-customer spend with a "
        "180-day half-life relative to a reference date — the standard "
        "recency-weighted feature a feature store materializes. The "
        "half-life exponent is an integer (floor of age/180), so the "
        "0.5^n weight is an exact power-of-two scaling that both "
        "engines compute bit-identically — decayed sums stay inside the "
        "exact-decimal gate with no float drift. Plan is scan + partial "
        "agg: one shuffle on custkey at any scale."
    ),
)
def fs_decayed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    half_lives = F.floor(
        F.datediff(F.lit("2001-08-01").cast("date"), F.col("o_orderdate").cast("date"))
        / 180.0
    )
    decayed = F.col("o_totalprice") * F.pow(F.lit(0.5), half_lives)
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(decayed, 4).alias("decayed_spend"),
    )


@register(
    "sample_split_three_way",
    oracle=f"""
SELECT CASE WHEN (c_custkey * 2654435761) % 1000 < 800 THEN 'train'
            WHEN (c_custkey * 2654435761) % 1000 < 900 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_customers,
       {sql_dsum('c_acctbal', 2)} AS sum_bal
FROM customer
GROUP BY 1
""",
    description=(
        "Deterministic 80/10/10 train/val/test split — the holdout "
        "assignment a training-data pipeline must make reproducibly: a "
        "pure per-row predicate on a multiplicative key hash, so the "
        "same record lands in the same split on any engine, partition "
        "layout, or rerun, and splits stay disjoint BY CONSTRUCTION "
        "(one hash, three ranges). Completes the sampling quartet with "
        "Bernoulli, stratified, and mixture draws. Scan-narrow: the "
        "split column costs no shuffle; the per-split summary is one "
        "partial-agg exchange of 3 rows."
    ),
)
def sample_split_three_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    h = (F.col("c_custkey") * F.lit(2654435761)) % 1000
    split = (
        F.when(h < 800, "train").when(h < 900, "val").otherwise("test")
    )
    return cust.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(F.col("c_acctbal"), 2).alias("sum_bal"),
    )


# -- Z-order layout key ([EXT], SURVEY.md §4 scale lever) ----------------

from ..operators.layout import sql_zvalue, zvalue  # noqa: E402

_Z_DUCK_DIMS = ["o_custkey", "(CAST(epoch(o_orderdate) AS BIGINT) // 86400)"]


@register(
    "layout_zorder_key",
    oracle=f"""
SELECT o_orderkey, {sql_zvalue(_Z_DUCK_DIMS)} AS zval
FROM orders
""",
    description=(
        "[EXT] Z-order (Morton) layout key over (customer, order-day) — "
        "operators/layout.zvalue: pure shift/mask expression arithmetic "
        "inside whole-stage codegen, bit-identical to the SQL twin "
        "generated from the same loop (sql_zvalue). Range-partitioning "
        "and sorting a 100 TB write by this key gives EVERY "
        "participating dimension ~file^(1/d) locality, so row-group "
        "min/max stats prune multi-dimensional range predicates — the "
        "Delta/Iceberg OPTIMIZE ZORDER effect as a plain DataFrame op "
        "(clustering property asserted in tests/test_plans.py)."
    ),
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        zvalue(
            [
                F.col("o_custkey"),
                # NTZ -> TIMESTAMP is wall-clock identity under the UTC
                # session, so the epoch-seconds cast matches DuckDB epoch()
                F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) div 86400"),
            ]
        ).alias("zval"),
    )


@register(
    "join_runtime_filter_orders",
    oracle=f"""
SELECT o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_dsum('o.o_totalprice', 2)} AS total_price
FROM orders o
WHERE o.o_custkey IN (
  SELECT c.c_custkey
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA')
GROUP BY o.o_orderstatus
""",
    description=(
        "[EXT] semi-join scan reduction (runtime filter) on the q5 star "
        "shape: orders of one region's customers, aggregated by status. "
        "The region-filtered customer key set is collected (bounded by "
        "the operator's IN-list cutoff) and pushed into the orders scan "
        "as a sargable IN predicate, so the fact table's parquet reader "
        "prunes before any join — the dynamic-filter lever Catalyst's "
        "runtime bloom filter does not apply in broadcast-star layouts "
        "(operators/runtime_filter.runtime_filtered_semi_join; plan "
        "pinned in tests/test_plans.py, exact fallback-regime "
        "equivalence in tests/test_operators.py)."
    ),
)
def join_runtime_filter_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.runtime_filter import runtime_filtered_semi_join

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dim = cust.join(
        nat, cust["c_nationkey"] == nat["n_nationkey"]
    ).join(reg, nat["n_regionkey"] == reg["r_regionkey"])
    fact = runtime_filtered_semi_join(orders, dim, "c_custkey", "o_custkey")
    return fact.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), 2).alias("total_price"),
    )


# -- Hilbert layout key ([EXT] r5, SURVEY.md §4 scale lever) -------------

from ..operators.layout import hilbert_value, sql_hilbert_query  # noqa: E402

_H_DAY_SQL = "(CAST(epoch(o_orderdate) AS BIGINT) // 86400)"


@register(
    "layout_hilbert_key",
    oracle=sql_hilbert_query(
        "orders", "o_orderkey", "o_orderkey", "o_custkey", _H_DAY_SQL
    ),
    description=(
        "[EXT] 2-D Hilbert layout key over (customer, order-day) — the "
        "better-locality sibling of layout_zorder_key: consecutive key "
        "values are always ADJACENT cells (unit Manhattan step — Z-order "
        "jumps diagonally at quadrant boundaries), so files in a "
        "range-partitioned write cover tighter rectangles of both "
        "dimensions. One aggregate fold per row (plan linear in bits), "
        "bit-identical to the list_reduce SQL twin generated from the "
        "same per-level rotate-and-accumulate."
    ),
)
def layout_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    day = F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) div 86400")
    return orders.select(
        "o_orderkey",
        hilbert_value(F.col("o_custkey"), day).alias("hval"),
    )


DQ_DATE_LO, DQ_DATE_HI = "1995-01-01", "2000-12-31"
DQ_PRICE_FLOOR = 1100.0


@register(
    "dq_profile_orders",
    oracle=f"""
WITH base AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS rows_total,
    CAST(COUNT(*) FILTER (o_orderkey IS NULL) AS BIGINT) AS orderkey_nulls,
    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS orderkey_dupes,
    CAST(COUNT(*) FILTER (o_totalprice IS NULL OR o_totalprice < {DQ_PRICE_FLOOR})
         AS BIGINT) AS price_below_floor,
    CAST(COUNT(*) FILTER (o_orderdate < TIMESTAMP '{DQ_DATE_LO}'
                          OR o_orderdate > TIMESTAMP '{DQ_DATE_HI}')
         AS BIGINT) AS date_out_of_range,
    CAST(COUNT(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P'))
         AS BIGINT) AS status_domain_violations
  FROM orders
),
orphans AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders o
  WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT 'rows_total' AS check_name, rows_total AS n FROM base
UNION ALL SELECT 'orderkey_nulls', orderkey_nulls FROM base
UNION ALL SELECT 'orderkey_dupes', orderkey_dupes FROM base
UNION ALL SELECT 'price_below_floor', price_below_floor FROM base
UNION ALL SELECT 'date_out_of_range', date_out_of_range FROM base
UNION ALL SELECT 'status_domain_violations', status_domain_violations FROM base
UNION ALL SELECT 'custkey_orphans', n FROM orphans
""",
    description=(
        "[EXT] declarative data-quality profile (the Deequ-style "
        "expectation suite a 100 TB ingest gate runs before "
        "publishing a table): completeness (null counts), uniqueness "
        "(key duplicate count), range plausibility (price floor, "
        "date window), domain membership (status codes), and "
        "referential integrity (FK orphans via anti join). All "
        "row-level checks fold into ONE map-side-combined pass over "
        "the fact table — conditional aggregates, not per-check "
        "scans — and the FK check is a key-only left-anti join; the "
        "output is check-count rows regardless of table size. "
        "Thresholds are chosen so the profile is non-vacuous at "
        "sf0.01 (date/price checks fire; null/dupe/orphan checks "
        "prove absence)."
    ),
)
def dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    base = orders.agg(
        F.count(F.lit(1)).alias("rows_total"),
        cnt(F.col("o_orderkey").isNull()).alias("orderkey_nulls"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("orderkey_dupes"),
        cnt(
            F.col("o_totalprice").isNull()
            | (F.col("o_totalprice") < DQ_PRICE_FLOOR)
        ).alias("price_below_floor"),
        cnt(
            (F.col("o_orderdate") < F.lit(DQ_DATE_LO).cast("timestamp"))
            | (F.col("o_orderdate") > F.lit(DQ_DATE_HI).cast("timestamp"))
        ).alias("date_out_of_range"),
        cnt(~F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "status_domain_violations"
        ),
    )
    checks = base.selectExpr(
        "stack(6, "
        "'rows_total', rows_total, "
        "'orderkey_nulls', orderkey_nulls, "
        "'orderkey_dupes', orderkey_dupes, "
        "'price_below_floor', price_below_floor, "
        "'date_out_of_range', date_out_of_range, "
        "'status_domain_violations', status_domain_violations"
        ") AS (check_name, n)"
    )
    orphans = (
        orders.join(
            cust, orders["o_custkey"] == cust["c_custkey"], "left_anti"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("custkey_orphans").alias("check_name"), "n")
    )
    return checks.unionByName(orphans)


# -- group-aware splitting + negative sampling (r9) ----------------------

@register(
    "sample_group_split_audit",
    oracle="""
WITH s AS (
  SELECT user_id,
         (user_id * 2654435761) % 1000 AS gh,
         (event_id * 2654435761) % 1000 AS rh
  FROM events
), pu AS (
  SELECT user_id,
         COUNT(DISTINCT CASE WHEN gh < 800 THEN 'train'
                             WHEN gh < 900 THEN 'val'
                             ELSE 'test' END) AS g,
         COUNT(DISTINCT CASE WHEN rh < 800 THEN 'train'
                             WHEN rh < 900 THEN 'val'
                             ELSE 'test' END) AS r
  FROM s GROUP BY 1
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN g > 1 THEN 1 ELSE 0 END) AS BIGINT) AS sg,
         CAST(SUM(CASE WHEN r > 1 THEN 1 ELSE 0 END) AS BIGINT) AS sr
  FROM pu
)
SELECT 'group_hash' AS strategy, n_users,
       sg AS n_straddling_users,
       CAST(sg AS DOUBLE) / n_users AS straddle_frac
FROM a
UNION ALL
SELECT 'row_hash', n_users, sr, CAST(sr AS DOUBLE) / n_users FROM a
""",
    description=(
        "[EXT] leakage-safe GROUP-AWARE splitting, audited: assign the "
        "80/10/10 split by hashing the ENTITY (user_id) vs hashing the "
        "row (event_id), and count users whose events straddle folds "
        "under each strategy. The group hash pins ZERO straddlers by "
        "construction — the contract that keeps a user's history out "
        "of both train and test (the CV leakage fs_leakage_audit "
        "measures in time, measured here across folds); the row hash "
        "row quantifies how badly the naive split breaks it. One "
        "narrow pass + one user-keyed partial agg; output is 2 rows."
    ),
)
def sample_group_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def split(col: str):
        h = (F.col(col) * F.lit(2654435761)) % 1000
        return F.when(h < 800, "train").when(h < 900, "val").otherwise("test")

    per_user = ev.select(
        "user_id",
        split("user_id").alias("sg"),
        split("event_id").alias("sr"),
    ).groupBy("user_id").agg(
        F.countDistinct("sg").alias("g"), F.countDistinct("sr").alias("r")
    )
    a = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("g") > 1, 1).otherwise(0)).cast("long").alias("sg"),
        F.sum(F.when(F.col("r") > 1, 1).otherwise(0)).cast("long").alias("sr"),
    )
    g_row = a.select(
        F.lit("group_hash").alias("strategy"),
        "n_users",
        F.col("sg").alias("n_straddling_users"),
        (F.col("sg").cast("double") / F.col("n_users")).alias("straddle_frac"),
    )
    r_row = a.select(
        F.lit("row_hash").alias("strategy"),
        "n_users",
        F.col("sr").alias("n_straddling_users"),
        (F.col("sr").cast("double") / F.col("n_users")).alias("straddle_frac"),
    )
    return g_row.unionByName(r_row)


NEG_SAMPLES_PER_LABEL = 3
NEG_HASH_A = 2654435761
NEG_HASH_B = 40503


@register(
    "ml_negative_sampling",
    oracle=f"""
WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS p FROM part),
n AS (
  SELECT e.event_id AS label_id, e.user_id, j.j AS neg_rank,
         (e.event_id * {NEG_HASH_A} + j.j * {NEG_HASH_B}) % c.p AS neg_partkey
  FROM events e CROSS JOIN c,
       unnest(generate_series(1, {NEG_SAMPLES_PER_LABEL})) AS j(j)
  WHERE e.event_type = 'purchase'
)
SELECT n.label_id, n.user_id, CAST(n.neg_rank AS INTEGER) AS neg_rank,
       n.neg_partkey, p.p_retailprice AS neg_price
FROM n JOIN part p ON p.p_partkey = n.neg_partkey
""",
    description=(
        "[EXT] deterministic negative sampling for recommendation/"
        "ranking training sets: each purchase label draws k=3 negative "
        "items by a pure multiplicative hash of (label, rank) modulo "
        "the item count — TPC-H partkeys are dense 0..P-1, so the index "
        "IS the key and no row_number spine or collect is needed; the "
        "same label draws the same negatives on any engine, partition "
        "layout, or rerun. The item join attaches payload (price) on "
        "the equi key. A production variant anti-joins the user's "
        "positives out of the draw (here events carry no item key, so "
        "that step has nothing to bind to — documented, not faked). "
        "Plan: narrow explode x3, one equi join keyed on the dense "
        "item id; the 1-row item count broadcasts."
    ),
)
def ml_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    part = load_table(spark, sf_dir, "part")
    cnt = part.agg(F.count(F.lit(1)).cast("long").alias("p"))
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_id"), "user_id"
    )
    j = F.explode(
        F.array(*[F.lit(i) for i in range(1, NEG_SAMPLES_PER_LABEL + 1)])
    )
    neg = (
        purch.crossJoin(F.broadcast(cnt))
        .select("label_id", "user_id", j.alias("neg_rank"), "p")
        .withColumn(
            "neg_partkey",
            (
                F.col("label_id") * NEG_HASH_A
                + F.col("neg_rank") * NEG_HASH_B
            )
            % F.col("p"),
        )
    )
    return neg.join(
        part.select(
            F.col("p_partkey").alias("neg_partkey"),
            F.col("p_retailprice").alias("neg_price"),
        ),
        "neg_partkey",
    ).select("label_id", "user_id", "neg_rank", "neg_partkey", "neg_price")


@register(
    "dq_k_anonymity",
    oracle="""
WITH sens AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(floor(CAST(ROUND(c_acctbal * 100) AS BIGINT) / 100000.0) AS BIGINT) AS bal_band,
         n_regionkey
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
lv AS (
  SELECT 0 AS level, c_nationkey AS q1, c_mktsegment AS q2, bal_band, c_custkey FROM sens
  UNION ALL
  SELECT 1, n_regionkey, c_mktsegment, bal_band, c_custkey FROM sens
  UNION ALL
  SELECT 2, -1, c_mktsegment, bal_band, c_custkey FROM sens
),
grp AS (
  SELECT level, q1, q2, COUNT(*) AS k, COUNT(DISTINCT bal_band) AS l
  FROM lv GROUP BY 1, 2, 3
)
SELECT level,
       COUNT(*) AS n_groups,
       MIN(k) AS k_min,
       MIN(l) AS l_min,
       CAST(SUM(CASE WHEN k < 10 THEN k ELSE 0 END) AS BIGINT) AS at_risk_rows,
       CAST(SUM(CASE WHEN l < 2 THEN k ELSE 0 END) AS BIGINT) AS low_diversity_rows
FROM grp GROUP BY 1
""",
    description=(
        "k-anonymity / l-diversity audit with a generalization ladder "
        "(Sweeney 2002; Machanavajjhala 2007): quasi-identifiers "
        "(nation, mktsegment) coarsened stepwise to (region, segment) "
        "then (segment) — per level, the minimum equivalence-class size "
        "k, minimum sensitive-value diversity l over acctbal bands, and "
        "how many rows sit in classes below k=10 / l=2. One groupBy per "
        "level over compact derived keys; the nation->region lookup is "
        "a broadcast dim join — privacy release audits at 100 TB are "
        "exactly this shape."
    ),
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    sens = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(
            F.round(F.col("c_acctbal") * 100).cast("long") / 100000.0
        ).cast("long").alias("bal_band"),
        "n_regionkey",
    )
    levels = (
        sens.select(
            F.lit(0).alias("level"),
            F.col("c_nationkey").cast("long").alias("q1"),
            F.col("c_mktsegment").alias("q2"),
            "bal_band",
        )
        .unionByName(
            sens.select(
                F.lit(1).alias("level"),
                F.col("n_regionkey").cast("long").alias("q1"),
                F.col("c_mktsegment").alias("q2"),
                "bal_band",
            )
        )
        .unionByName(
            sens.select(
                F.lit(2).alias("level"),
                F.lit(-1).cast("long").alias("q1"),
                F.col("c_mktsegment").alias("q2"),
                "bal_band",
            )
        )
    )
    grp = levels.groupBy("level", "q1", "q2").agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct("bal_band").alias("l"),
    )
    return grp.groupBy("level").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("k").cast("long").alias("k_min"),
        F.min("l").cast("long").alias("l_min"),
        F.sum(F.when(F.col("k") < 10, F.col("k")).otherwise(F.lit(0)))
        .cast("long")
        .alias("at_risk_rows"),
        F.sum(F.when(F.col("l") < 2, F.col("k")).otherwise(F.lit(0)))
        .cast("long")
        .alias("low_diversity_rows"),
    )


@register(
    "ml_group_influence",
    oracle="""
WITH s AS (
  SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
a AS (
  SELECT ship_year, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx, SUM(x*y) AS sxy
  FROM s GROUP BY 1
),
t AS (
  SELECT SUM(n) AS tn, SUM(sx) AS tsx, SUM(sy) AS tsy,
         SUM(sxx) AS tsxx, SUM(sxy) AS tsxy
  FROM a
),
d AS (
  SELECT ship_year, CAST(n AS BIGINT) AS n,
         CAST(tn - n AS DOUBLE) AS nd,
         CAST(tsx - sx AS DOUBLE) AS sxd,
         CAST(tsy - sy AS DOUBLE) AS syd,
         CAST(tsxx - sxx AS DOUBLE) AS sxxd,
         CAST(tsxy - sxy AS DOUBLE) AS sxyd,
         CAST(tn AS DOUBLE) AS gnd, CAST(tsx AS DOUBLE) AS gsxd,
         CAST(tsy AS DOUBLE) AS gsyd, CAST(tsxx AS DOUBLE) AS gsxxd,
         CAST(tsxy AS DOUBLE) AS gsxyd
  FROM a, t
)
SELECT ship_year, n,
       (gnd*gsxyd - gsxd*gsyd) / (gnd*gsxxd - gsxd*gsxd) AS slope_full,
       (nd*sxyd - sxd*syd) / (nd*sxxd - sxd*sxd) AS slope_loo,
       ((nd*sxyd - sxd*syd) / (nd*sxxd - sxd*sxd))
         - ((gnd*gsxyd - gsxd*gsyd) / (gnd*gsxxd - gsxd*gsxd)) AS delta_slope
FROM d
""",
    description=(
        "Leave-one-group-out OLS influence: for each ship-year cohort, "
        "the regression slope (extendedprice ~ quantity) refit WITHOUT "
        "that cohort, via subtraction of exact int64 sufficient "
        "statistics from the global totals — influence analysis with "
        "NO per-group refit pass. One data-sized scan produces 5 "
        "decimal sums per group (map-side combine); every downstream "
        "term is group-count-sized. The 100 TB form of 'which data "
        "source moves the model': delete-a-group influence from one "
        "aggregation, the Cook's-distance idea lifted to groups."
    ),
)
def ml_group_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = (
        li.select(
            F.year("l_shipdate").cast("long").alias("ship_year"),
            x.alias("x"),
            y.alias("y"),
        )
        .groupBy("ship_year")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(F.col("x"))).alias("sx"),
            F.sum(dec(F.col("y"))).alias("sy"),
            F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
            F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        )
    )
    t = a.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
    )
    d = a.crossJoin(F.broadcast(t))
    nd = (F.col("tn") - F.col("n")).cast("double")
    sxd = (F.col("tsx") - F.col("sx")).cast("double")
    syd = (F.col("tsy") - F.col("sy")).cast("double")
    sxxd = (F.col("tsxx") - F.col("sxx")).cast("double")
    sxyd = (F.col("tsxy") - F.col("sxy")).cast("double")
    gnd = F.col("tn").cast("double")
    gsxd = F.col("tsx").cast("double")
    gsyd = F.col("tsy").cast("double")
    gsxxd = F.col("tsxx").cast("double")
    gsxyd = F.col("tsxy").cast("double")
    slope_full = (gnd * gsxyd - gsxd * gsyd) / (gnd * gsxxd - gsxd * gsxd)
    slope_loo = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return d.select(
        "ship_year",
        F.col("n").cast("long").alias("n"),
        slope_full.alias("slope_full"),
        slope_loo.alias("slope_loo"),
        (slope_loo - slope_full).alias("delta_slope"),
    )


@register(
    "ml_item_item_cf",
    oracle="""
WITH e AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst,
         COUNT(DISTINCT a.l_orderkey) AS support
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
),
n AS (SELECT l_partkey AS item, COUNT(DISTINCT l_orderkey) AS n_orders
      FROM lineitem GROUP BY 1),
sim AS (
  SELECT e.src, e.dst, CAST(e.support AS BIGINT) AS support,
         CAST(e.support AS DOUBLE)
           / sqrt(CAST(na.n_orders AS DOUBLE) * CAST(nb.n_orders AS DOUBLE)) AS cosine
  FROM e
  JOIN n na ON na.item = e.src
  JOIN n nb ON nb.item = e.dst
  WHERE e.support >= 2
),
rk AS (
  SELECT src, dst, support, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS BIGINT) AS rank
  FROM sim
)
SELECT src AS item, dst AS neighbor, support, cosine, rank
FROM rk WHERE rank <= 3
""",
    description=(
        "Item-item collaborative filtering (Sarwar et al. 2001, the "
        "Amazon 'bought together' primitive): cosine similarity between "
        "items over basket-membership vectors — support(i,j) / "
        "sqrt(n_i*n_j) — for co-purchased pairs with support >= 2, "
        "top-3 neighbors per item with deterministic tie-break. "
        "Complements graph_link_prediction, which scores NON-adjacent "
        "2-hop pairs; this ranks the adjacent ones. Support comes from "
        "cooccurrence_edges(with_support=True), so the per-basket "
        "dense_rank cap bounds the quadratic blowup on hot baskets; "
        "rank<=3 compiles to WindowGroupLimit, so each task keeps 3 "
        "rows per item before the shuffle."
    ),
)
def ml_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph as G

    li = load_table(spark, sf_dir, "lineitem")
    e = G.cooccurrence_edges(
        li, "l_orderkey", "l_partkey", with_support=True
    ).filter(F.col("support") >= 2)
    n = li.groupBy(F.col("l_partkey").alias("item")).agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    sim = (
        e.join(n.select(F.col("item").alias("src"), F.col("n_orders").alias("na")), "src")
        .join(n.select(F.col("item").alias("dst"), F.col("n_orders").alias("nb")), "dst")
        .select(
            "src",
            "dst",
            F.col("support").cast("long").alias("support"),
            (
                F.col("support").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), "dst")
    return (
        sim.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("src").alias("item"),
            F.col("dst").alias("neighbor"),
            "support",
            "cosine",
            "rank",
        )
    )


@register(
    "ml_conformal_coverage",
    oracle="""
WITH base AS (
  SELECT ((l_orderkey * 8 + l_linenumber) * 2654435761) % 4294967296 AS h,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
sp AS (SELECT h % 4 AS split, x, y FROM base),
tr AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(x*y) AS sxy
  FROM sp WHERE split <= 1
),
par AS (
  SELECT CAST(n AS BIGINT) AS n_train,
         (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) AS slope,
         (CAST(sy AS DOUBLE)
           - ((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))
             * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
  FROM tr
),
scored AS (
  SELECT sp.split,
         CAST(ROUND(abs(CAST(sp.y AS DOUBLE) - (par.slope * CAST(sp.x AS DOUBLE) + par.intercept))) AS BIGINT) AS score_c
  FROM sp, par
),
cal AS (SELECT score_c FROM scored WHERE split = 2),
kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
              (9 * (COUNT(*) + 1) + 9) // 10 AS k
       FROM cal),
hist AS (SELECT score_c, COUNT(*) AS nn FROM cal GROUP BY 1),
cum AS (SELECT score_c, SUM(nn) OVER (ORDER BY score_c) AS cum_n FROM hist),
qq AS (SELECT MIN(score_c) AS q_c FROM cum, kk WHERE cum.cum_n >= kk.k),
tst AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN score_c <= qq.q_c THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM scored, qq WHERE split = 3
)
SELECT par.n_train, kk.n_cal, tst.n_test,
       par.slope, qq.q_c,
       CAST(tst.n_covered AS DOUBLE) / CAST(tst.n_test AS DOUBLE) AS coverage
FROM par, kk, qq, tst
""",
    description=(
        "Split-conformal prediction coverage (Vovk; Lei et al. 2018): "
        "deterministic hash split into train/calibration/test, OLS fit "
        "on train from exact int64 sufficient statistics, conformal "
        "quantile q = the ceil((n_cal+1)*0.9)-th smallest absolute "
        "residual on calibration (type-1 selection over the cent-grid "
        "histogram via the sharded cumulative-count operator — no "
        "unbounded window), then the empirical coverage of |y - yhat| "
        "<= q on test. The distribution-free 90% interval check every "
        "model-serving pipeline should ship; all passes are scans + "
        "compact-key aggregations, the quantile state is the residual "
        "RANGE, never the row count."
    ),
)
def ml_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.order_stats import grouped_cumulative_counts

    li = load_table(spark, sf_dir, "lineitem")
    h = (
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")) * F.lit(2654435761)
    ) % F.lit(4294967296)
    sp = li.select(
        (h % 4).alias("split"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tr = sp.filter(F.col("split") <= 1).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxyd = F.col("sxy").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    par = tr.select(
        F.col("n").cast("long").alias("n_train"),
        slope.alias("slope"),
        ((syd - slope * sxd) / nd).alias("intercept"),
    )
    scored = sp.crossJoin(F.broadcast(par)).select(
        "split",
        "n_train",
        "slope",
        F.round(
            F.abs(
                F.col("y").cast("double")
                - (F.col("slope") * F.col("x").cast("double") + F.col("intercept"))
            )
        )
        .cast("long")
        .alias("score_c"),
    )
    cal = scored.filter(F.col("split") == 2).withColumn("g", F.lit(1))
    kk = cal.agg(
        F.count(F.lit(1)).cast("long").alias("n_cal"),
        F.expr("(9 * (count(1) + 1) + 9) div 10").alias("k"),
    )
    cum = grouped_cumulative_counts(cal, "g", cents_col="score_c", shard_size=1_000_000)
    qq = (
        cum.crossJoin(F.broadcast(kk))
        .filter(F.col("cum_n") >= F.col("k"))
        .agg(F.min("cents").alias("q_c"))
    )
    tst = (
        scored.filter(F.col("split") == 3)
        .crossJoin(F.broadcast(qq))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(F.when(F.col("score_c") <= F.col("q_c"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        par.select("n_train", "slope")
        .crossJoin(F.broadcast(kk.select("n_cal")))
        .crossJoin(F.broadcast(qq))
        .crossJoin(F.broadcast(tst))
        .select(
            "n_train",
            "n_cal",
            "n_test",
            "slope",
            "q_c",
            (F.col("n_covered").cast("double") / F.col("n_test").cast("double")).alias(
                "coverage"
            ),
        )
    )


@register(
    "ml_shapley_r2",
    oracle="""
WITH s AS (
  SELECT CAST(ROUND(l_quantity * 100) AS BIGINT) AS x1,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
a AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(x1 AS HUGEINT)) AS s1, SUM(CAST(x2 AS HUGEINT)) AS s2,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x1 AS HUGEINT)*x1) AS s11, SUM(CAST(x2 AS HUGEINT)*x2) AS s22,
         SUM(CAST(x1 AS HUGEINT)*x2) AS s12,
         SUM(CAST(x1 AS HUGEINT)*y) AS s1y, SUM(CAST(x2 AS HUGEINT)*y) AS s2y,
         SUM(CAST(y AS HUGEINT)*y) AS syy
  FROM s
),
c AS (
  SELECT CAST(n AS BIGINT) AS n,
         CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE) AS c11,
         CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE)*CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE) AS c22,
         CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE) AS c12,
         CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE) AS c1y,
         CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE) AS c2y,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE) AS cyy
  FROM a
),
f AS (
  SELECT n,
         (c1y * c1y) / (c11 * cyy) AS r2_1,
         (c2y * c2y) / (c22 * cyy) AS r2_2,
         (((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12)) * c1y
          + ((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12)) * c2y) / cyy AS r2_12
  FROM c
)
SELECT 'quantity' AS feature, n,
       CAST(ROUND(r2_1 * 1000000000000) AS BIGINT) / 1000000000000.0 AS r2_alone,
       CAST(ROUND(r2_12 * 1000000000000) AS BIGINT) / 1000000000000.0 AS r2_full,
       CAST(ROUND((0.5 * r2_1 + 0.5 * (r2_12 - r2_2)) * 1000000000000) AS BIGINT)
         / 1000000000000.0 AS shapley_phi
FROM f
UNION ALL
SELECT 'discount' AS feature, n,
       CAST(ROUND(r2_2 * 1000000000000) AS BIGINT) / 1000000000000.0 AS r2_alone,
       CAST(ROUND(r2_12 * 1000000000000) AS BIGINT) / 1000000000000.0 AS r2_full,
       CAST(ROUND((0.5 * r2_2 + 0.5 * (r2_12 - r2_1)) * 1000000000000) AS BIGINT)
         / 1000000000000.0 AS shapley_phi
FROM f
""",
    description=(
        "Exact Shapley R-squared attribution over the two-feature "
        "coalition lattice (Lipovetsky & Conklin 2001): each feature's "
        "phi averages its marginal R-squared contribution over both "
        "join orders, phi_1 + phi_2 = full-model R-squared by "
        "construction (pinned in a test). All four coalition fits come "
        "from ONE scan's exact sufficient statistics (the ridge/OLS "
        "shelf pattern — 10 decimal sums, 2x2 Cramer solve in IEEE "
        "mirrored term-for-term); the 'which feature earns the fit' "
        "report with no refits and no sampling, at any corpus size."
    ),
)
def ml_shapley_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x1 = F.round(F.col("l_quantity") * 100).cast("long")
    x2 = F.round(F.col("l_discount") * 100).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = li.select(x1.alias("x1"), x2.alias("x2"), y.alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x1"))).alias("s1"),
        F.sum(dec(F.col("x2"))).alias("s2"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x1") * F.col("x1"))).alias("s11"),
        F.sum(dec(F.col("x2") * F.col("x2"))).alias("s22"),
        F.sum(dec(F.col("x1") * F.col("x2"))).alias("s12"),
        F.sum(dec(F.col("x1") * F.col("y"))).alias("s1y"),
        F.sum(dec(F.col("x2") * F.col("y"))).alias("s2y"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
    )
    nd = F.col("n").cast("double")
    s1, s2, sy = (F.col(c).cast("double") for c in ("s1", "s2", "sy"))
    c11 = F.col("s11").cast("double") - s1 * s1 / nd
    c22 = F.col("s22").cast("double") - s2 * s2 / nd
    c12 = F.col("s12").cast("double") - s1 * s2 / nd
    c1y = F.col("s1y").cast("double") - s1 * sy / nd
    c2y = F.col("s2y").cast("double") - s2 * sy / nd
    cyy = F.col("syy").cast("double") - sy * sy / nd
    r2_1 = (c1y * c1y) / (c11 * cyy)
    r2_2 = (c2y * c2y) / (c22 * cyy)
    det = c11 * c22 - c12 * c12
    r2_12 = (((c22 * c1y - c12 * c2y) / det) * c1y + ((c11 * c2y - c12 * c1y) / det) * c2y) / cyy
    base = a.select(
        F.col("n").cast("long").alias("n"),
        r2_1.alias("r2_1"),
        r2_2.alias("r2_2"),
        r2_12.alias("r2_12"),
    )
    # r13: snap every ratio output onto the 1e-12 grid — the unsnapped
    # r2_12 diverged from DuckDB by one ULP at sf0.1 (native FMA
    # contraction of a*b - c*d vs the JVM's strict evaluation; the
    # ml_learning_curve comment has the full analysis). Phis snap
    # INDEPENDENTLY, so the efficiency axiom holds to 3 grid units,
    # not exactly (the test's tolerance reflects that).
    snap = lambda c: F.round(c * F.lit(1e12)).cast("long") / F.lit(1e12)  # noqa: E731
    q = base.select(
        F.lit("quantity").alias("feature"),
        "n",
        snap(F.col("r2_1")).alias("r2_alone"),
        snap(F.col("r2_12")).alias("r2_full"),
        snap(
            F.lit(0.5) * F.col("r2_1")
            + F.lit(0.5) * (F.col("r2_12") - F.col("r2_2"))
        ).alias("shapley_phi"),
    )
    d = base.select(
        F.lit("discount").alias("feature"),
        "n",
        snap(F.col("r2_2")).alias("r2_alone"),
        snap(F.col("r2_12")).alias("r2_full"),
        snap(
            F.lit(0.5) * F.col("r2_2")
            + F.lit(0.5) * (F.col("r2_12") - F.col("r2_1"))
        ).alias("shapley_phi"),
    )
    return q.unionByName(d)


LEARNING_FRACTIONS = ((1, 10), (1, 4), (1, 2), (1, 1))  # 10/25/50/100 %


@register(
    "ml_learning_curve",
    oracle="""
WITH s AS (
  SELECT ((l_orderkey * 8 + l_linenumber) * 2654435761) % 4294967296 AS h,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
fr AS (
  SELECT f.num, f.den FROM (VALUES (1, 10), (1, 4), (1, 2), (1, 1)) AS f(num, den)
),
a AS (
  SELECT fr.num, fr.den, COUNT(*) AS n,
         SUM(s.x) AS sx, SUM(s.y) AS sy,
         SUM(s.x*s.x) AS sxx, SUM(s.y*s.y) AS syy, SUM(s.x*s.y) AS sxy
  FROM s JOIN fr ON s.h * fr.den < 4294967296 * fr.num
  GROUP BY 1, 2
)
SELECT CAST(num AS DOUBLE) / den AS train_frac,
       CAST(n AS BIGINT) AS n,
       CAST(ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
         * 1000000000000) AS BIGINT) / 1000000000000.0 AS slope,
       CAST(ROUND(((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        * (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)))
         / ((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
         * 1000000000000) AS BIGINT) / 1000000000000.0 AS r2
FROM a
""",
    description=(
        "Learning curve from nested deterministic subsamples: OLS "
        "slope and R-squared at 10/25/50/100% train fractions, where "
        "fraction f keeps rows with hash < f (NESTED samples — each "
        "smaller set is a subset of every larger one, so the curve "
        "measures data volume, not sample luck). The pure-integer "
        "predicate h*den < 2^32*num avoids any float threshold; each "
        "fraction's fit comes from exact int64 sufficient statistics "
        "in one scan over the fraction lattice (a 4-row broadcast "
        "join). The 'is more data still buying accuracy' planning "
        "report every 100 TB pipeline needs before the next crawl."
    ),
)
def ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = (
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")) * F.lit(2654435761)
    ) % F.lit(4294967296)
    s = li.select(
        h.alias("h"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    fr = li.sparkSession.createDataFrame(
        list(LEARNING_FRACTIONS), "num long, den long"
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = (
        s.join(
            F.broadcast(fr),
            F.col("h") * F.col("den") < F.lit(4294967296) * F.col("num"),
        )
        .groupBy("num", "den")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(F.col("x"))).alias("sx"),
            F.sum(dec(F.col("y"))).alias("sy"),
            F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
            F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
            F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    syyd = F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    num = nd * sxyd - sxd * syd
    # r13: snap the ratio outputs onto the 1e-12 grid. The unsnapped
    # doubles diverged by one ULP from DuckDB at sf0.1 — native builds
    # may contract a*b - c*d into an FMA while the JVM never does, so
    # the "mirror the IEEE op tree" discipline alone is not sufficient
    # for these cancellation-heavy sufficient-statistic ratios; the
    # grid snap (the ml_woe_iv convention) absorbs the contraction.
    snap = lambda c: F.round(c * F.lit(1e12)).cast("long") / F.lit(1e12)  # noqa: E731
    return a.select(
        (F.col("num").cast("double") / F.col("den")).alias("train_frac"),
        F.col("n").cast("long").alias("n"),
        snap(num / (nd * sxxd - sxd * sxd)).alias("slope"),
        snap(
            (num * num)
            / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))
        ).alias("r2"),
    )


SUBSAMPLE_BITS = 8  # replicate b = rows whose hash bit b is 0 (~half each)


@register(
    "ml_subsample_stability",
    oracle=f"""
WITH s AS (
  SELECT ((l_orderkey * 8 + l_linenumber) * 2654435761) % 4294967296 AS h,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
reps AS (
  SELECT b.b AS replicate, s.x, s.y
  FROM s, unnest(generate_series(0, {SUBSAMPLE_BITS - 1})) AS b(b)
  WHERE (s.h // (1 << b.b)) % 2 = 0
),
a AS (
  SELECT replicate, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(x*y) AS sxy
  FROM reps GROUP BY 1
),
f AS (
  SELECT CAST(replicate AS BIGINT) AS replicate, CAST(n AS BIGINT) AS n,
         (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) AS slope
  FROM a
),
g AS (
  SELECT CAST(SUM(CAST(ROUND(slope * 1000000000) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / {SUBSAMPLE_BITS} AS mean_slope,
         CAST(SUM(CAST(ROUND(slope * slope * 1000000000) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / {SUBSAMPLE_BITS} AS mean_sq
  FROM f
)
SELECT f.replicate, f.n, f.slope,
       g.mean_slope,
       sqrt(g.mean_sq - g.mean_slope * g.mean_slope) AS slope_sd
FROM f, g
""",
    description=(
        "Deterministic subsample-stability error bars: 8 overlapping "
        "half-samples defined by hash BITS (replicate b keeps rows "
        "whose key-hash bit b is 0 — no RNG, so the 'bootstrap' is "
        "reproducible on any cluster), OLS slope per replicate from "
        "exact sufficient statistics in ONE grouped pass (explode by "
        "bit, map-side combine), then the across-replicate mean and "
        "sd of the slope with grid-floored moment sums. The "
        "uncertainty-quantification rung next to the conformal "
        "interval: how much does the fit move when half the data "
        "leaves?"
    ),
)
def ml_subsample_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = (
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")) * F.lit(2654435761)
    ) % F.lit(4294967296)
    s = li.select(
        h.alias("h"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    bits = F.array(*[F.lit(b) for b in range(SUBSAMPLE_BITS)])
    # integer bit test, matching the oracle's (h // (1 << b)) % 2
    # semantics directly (ADVICE r10 #4: the former double division
    # was exact only because h < 2^32 fits a double — fragile).
    reps = (
        s.select(F.explode(bits).alias("replicate"), "h", "x", "y")
        .filter(F.expr("shiftright(h, cast(replicate as int)) % 2 = 0"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = reps.groupBy("replicate").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxyd = F.col("sxy").cast("double")
    f = a.select(
        F.col("replicate").cast("long").alias("replicate"),
        F.col("n").cast("long").alias("n"),
        ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)).alias("slope"),
    )
    g = f.agg(
        (
            F.sum(F.round(F.col("slope") * 1e9).cast("long")).cast("double")
            / 1e9
            / SUBSAMPLE_BITS
        ).alias("mean_slope"),
        (
            F.sum(F.round(F.col("slope") * F.col("slope") * 1e9).cast("long")).cast(
                "double"
            )
            / 1e9
            / SUBSAMPLE_BITS
        ).alias("mean_sq"),
    )
    return f.crossJoin(F.broadcast(g)).select(
        "replicate",
        "n",
        "slope",
        "mean_slope",
        F.sqrt(F.col("mean_sq") - F.col("mean_slope") * F.col("mean_slope")).alias(
            "slope_sd"
        ),
    )


@register(
    "dq_t_closeness",
    oracle="""
WITH sens AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(floor(CAST(ROUND(c_acctbal * 100) AS BIGINT) / 100000.0) AS BIGINT) AS bal_band
  FROM customer
),
cls AS (
  SELECT c_nationkey AS q1, c_mktsegment AS q2, bal_band,
         CAST(COUNT(*) AS BIGINT) AS k_cb
  FROM sens GROUP BY 1, 2, 3
),
ksz AS (SELECT q1, q2, CAST(SUM(k_cb) AS BIGINT) AS k_c FROM cls GROUP BY 1, 2),
gb AS (SELECT bal_band, CAST(SUM(k_cb) AS BIGINT) AS g_b FROM cls GROUP BY 1),
gt AS (SELECT CAST(SUM(g_b) AS BIGINT) AS g FROM gb),
grid AS (
  SELECT ksz.q1, ksz.q2, ksz.k_c, gb.bal_band, gb.g_b,
         COALESCE(cls.k_cb, 0) AS k_cb
  FROM ksz CROSS JOIN gb
  LEFT JOIN cls ON cls.q1 = ksz.q1 AND cls.q2 = ksz.q2
              AND cls.bal_band = gb.bal_band
),
cum AS (
  SELECT q1, q2, k_c, bal_band,
         CAST(SUM(k_cb) OVER (PARTITION BY q1, q2 ORDER BY bal_band
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS f_c,
         CAST(SUM(g_b) OVER (PARTITION BY q1, q2 ORDER BY bal_band
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS f_g
  FROM grid
),
emd AS (
  SELECT q1, q2, MAX(k_c) AS k_c,
         CAST(SUM(ABS(f_c * (SELECT g FROM gt) - f_g * k_c)) AS BIGINT) AS num
  FROM cum GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       MAX(CAST(num AS DOUBLE) / (CAST(k_c AS DOUBLE) * (SELECT g FROM gt))) AS emd_max,
       CAST(SUM(CASE WHEN num * 10 > 3 * k_c * (SELECT g FROM gt)
                     THEN k_c ELSE 0 END) AS BIGINT) AS rows_above_t
FROM emd
""",
    description=(
        "[EXT] t-closeness audit (Li, Li & Venkatasubramanian 2007 — "
        "the third privacy rung after k-anonymity and l-diversity): "
        "per quasi-identifier class, the 1-D earth-mover's distance "
        "between the class's sensitive-attribute (acctbal band) "
        "distribution and the global one — computed as the sum of "
        "|CDF difference| over ordered bands in EXACT integer "
        "arithmetic (f_c * G - f_g * k_c, one double division per "
        "class only for the report), with the t = 0.3 breach count "
        "decided by integer cross-multiplication. A class can be "
        "k-anonymous and l-diverse yet leak via a skewed sensitive "
        "distribution; this is the audit that catches it. Shapes: the "
        "class x band grid is (classes x bands)-sized (both bounded "
        "taxonomies), never row-scale; one window cumsum + one "
        "grouped sum."
    ),
)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    sens = cust.select(
        F.col("c_nationkey").alias("q1"),
        F.col("c_mktsegment").alias("q2"),
        F.floor(
            F.round(F.col("c_acctbal") * 100).cast("long") / 100000.0
        ).cast("long").alias("bal_band"),
    )
    cls = sens.groupBy("q1", "q2", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("k_cb")
    )
    # class-x-band grid (bounded taxonomies) -> lazy pin: feeds the
    # class sizes, the global band masses, and the grid join
    cls = cls.localCheckpoint(eager=False)
    ksz = cls.groupBy("q1", "q2").agg(F.sum("k_cb").cast("long").alias("k_c"))
    gb = cls.groupBy("bal_band").agg(F.sum("k_cb").cast("long").alias("g_b"))
    g_total = int(gb.agg(F.sum("g_b")).head()[0])
    grid = (
        ksz.crossJoin(F.broadcast(gb))
        .join(cls, ["q1", "q2", "bal_band"], "left")
        .select(
            "q1", "q2", "k_c", "bal_band", "g_b",
            F.coalesce("k_cb", F.lit(0)).alias("k_cb"),
        )
    )
    w = (
        Window.partitionBy("q1", "q2")
        .orderBy("bal_band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "q1", "q2", "k_c",
        F.sum("k_cb").over(w).cast("long").alias("f_c"),
        F.sum("g_b").over(w).cast("long").alias("f_g"),
    )
    emd = cum.groupBy("q1", "q2").agg(
        F.max("k_c").alias("k_c"),
        F.sum(
            F.abs(F.col("f_c") * F.lit(g_total) - F.col("f_g") * F.col("k_c"))
        ).cast("long").alias("num"),
    )
    return emd.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.max(
            F.col("num").cast("double")
            / (F.col("k_c").cast("double") * F.lit(float(g_total)))
        ).alias("emd_max"),
        F.sum(
            F.when(
                F.col("num") * 10 > F.lit(3) * F.col("k_c") * F.lit(g_total),
                F.col("k_c"),
            ).otherwise(0)
        ).cast("long").alias("rows_above_t"),
    )


NEYMAN_N = 500  # total sample budget across strata
NEYMAN_WGRID = 1_000_000  # stratum weights N_h * sd_h on the 1e-6 grid


@register(
    "sample_neyman_allocation",
    oracle=f"""
WITH s AS (
  SELECT o_orderpriority AS stratum,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS sc,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)::HUGEINT
             * CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS ssc
  FROM orders GROUP BY 1
),
w AS (
  SELECT stratum, n_rows,
         CAST(ROUND({NEYMAN_WGRID} * n_rows
           * sqrt(CAST(n_rows * ssc - sc * sc AS DOUBLE)
                  / CAST(n_rows AS DOUBLE) / CAST(n_rows AS DOUBLE))
           / 100.0) AS BIGINT) AS w_grid
  FROM s
),
tot AS (SELECT SUM(w_grid) AS w_total FROM w),
base AS (
  SELECT w.stratum, w.n_rows, w.w_grid,
         {NEYMAN_N} * w.w_grid // t.w_total AS n_base,
         ({NEYMAN_N} * w.w_grid) % t.w_total AS rem
  FROM w, tot t
),
extra AS (
  SELECT SUM(n_base) AS base_total,
         {NEYMAN_N} - SUM(n_base) AS n_extra
  FROM base
),
alloc AS (
  SELECT b.stratum, b.n_rows, b.w_grid,
         b.n_base
           + CASE WHEN row_number() OVER (ORDER BY b.rem DESC, b.stratum)
                       <= e.n_extra THEN 1 ELSE 0 END AS n_alloc
  FROM base b, extra e
),
ranked AS (
  SELECT o_orderpriority AS stratum, o_orderkey,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY (o_orderkey * 2654435761) % 4294967296, o_orderkey
         ) AS rn
  FROM orders
),
drawn AS (
  SELECT r.stratum, CAST(COUNT(*) AS BIGINT) AS drawn_n,
         CAST(SUM(r.o_orderkey) AS BIGINT) AS drawn_sum_orderkey
  FROM ranked r JOIN alloc a ON a.stratum = r.stratum
  WHERE r.rn <= a.n_alloc
  GROUP BY 1
)
SELECT a.stratum, a.n_rows, a.w_grid, CAST(a.n_alloc AS BIGINT) AS n_alloc,
       d.drawn_n, d.drawn_sum_orderkey,
       (SELECT SUM(n_alloc) FROM alloc) = {NEYMAN_N} AS total_ok
FROM alloc a JOIN drawn d ON d.stratum = a.stratum
""",
    description=(
        "[EXT] Neyman-optimal stratified allocation (Neyman 1934): a "
        f"total budget of n={NEYMAN_N} rows is split across order-"
        "priority strata proportionally to N_h * sd_h (stratum size x "
        "stddev of o_totalprice) — the allocation that minimizes the "
        "variance of the stratified mean estimator, vs the equal or "
        "proportional splits of sample_stratified_exact / "
        "sample_group_quota. Determinism discipline: the per-stratum "
        "sd comes from exact integer-cents sufficient statistics "
        "(ss in HUGEINT/decimal(38,0)); ONE IEEE-exact sqrt/divide "
        "chain produces the weight, which is immediately snapped to "
        "the 1e-6 grid — every subsequent step (largest-remainder "
        "apportionment via integral div/mod, remainder ranking with "
        "stratum tie-break, the multiplicative-hash draw) is pure "
        "int64, so allocations and the drawn sample hash-match "
        "cross-engine, and sum(n_alloc) == n EXACTLY (pinned) — no "
        "float quota rounding that over- or under-shoots the budget. "
        "The draw is a per-stratum hash rank cut against the "
        "BROADCAST strata-sized allocation table (rank <= n_alloc; a "
        "column limit cannot compile to WindowGroupLimit the way a "
        "literal k does, so the broadcast is the scale property), "
        "reproducible across engines and reruns."
    ),
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    s = orders.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(cents).cast("decimal(38,0)").alias("sc"),
        F.sum(cents.cast("decimal(38,0)") * cents).alias("ssc"),
    )
    w = s.select(
        "stratum",
        "n_rows",
        F.round(
            NEYMAN_WGRID
            * F.col("n_rows")
            * F.sqrt(
                (F.col("n_rows") * F.col("ssc") - F.col("sc") * F.col("sc"))
                .cast("double")
                / F.col("n_rows").cast("double")
                / F.col("n_rows").cast("double")
            )
            / 100.0
        )
        .cast("long")
        .alias("w_grid"),
    )
    tot = w.agg(F.sum("w_grid").alias("w_total"))
    base = w.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_rows",
        "w_grid",
        F.expr(f"{NEYMAN_N} * w_grid div w_total").alias("n_base"),
        ((NEYMAN_N * F.col("w_grid")) % F.col("w_total")).alias("rem"),
    )
    extra = base.agg(
        (NEYMAN_N - F.sum("n_base")).alias("n_extra")
    )
    rem_rank = Window.orderBy(F.desc("rem"), F.asc("stratum"))
    alloc = (
        base.crossJoin(F.broadcast(extra))
        .withColumn("rr", F.row_number().over(rem_rank))
        .select(
            "stratum",
            "n_rows",
            "w_grid",
            (
                F.col("n_base")
                + F.when(F.col("rr") <= F.col("n_extra"), 1).otherwise(0)
            ).alias("n_alloc"),
        )
    )
    ranked = orders.select(
        F.col("o_orderpriority").alias("stratum"),
        "o_orderkey",
        F.row_number()
        .over(
            Window.partitionBy("o_orderpriority").orderBy(
                (F.col("o_orderkey") * 2654435761) % 4294967296,
                "o_orderkey",
            )
        )
        .alias("rn"),
    )
    drawn = (
        ranked.join(F.broadcast(alloc.select("stratum", "n_alloc")), "stratum")
        .filter(F.col("rn") <= F.col("n_alloc"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("drawn_n"),
            F.sum("o_orderkey").cast("long").alias("drawn_sum_orderkey"),
        )
    )
    total = alloc.agg(F.sum("n_alloc").alias("alloc_total"))
    return (
        alloc.join(drawn, "stratum")
        .crossJoin(F.broadcast(total))
        .select(
            "stratum",
            "n_rows",
            "w_grid",
            F.col("n_alloc").cast("long").alias("n_alloc"),
            "drawn_n",
            "drawn_sum_orderkey",
            (F.col("alloc_total") == NEYMAN_N).alias("total_ok"),
        )
    )
