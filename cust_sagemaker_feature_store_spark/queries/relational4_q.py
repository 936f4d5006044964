"""Final TPC-H-shape batch + collection-function surface
(SURVEY.md §2.3-2.5, §2.8 [EXT]).

Q8 (market share), Q9 (profit by nation/year), Q11 (important parts via
HAVING against a scalar subquery), Q15 (argmax via window over an
aggregate), and a collect_list/array pipeline — the remaining classic
analytics shapes the reference's Athena backend would have answered.
Ratios divide two exact-decimal sums, so both engines derive the same
doubles from the same integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import dsum, register, sql_dsum


@register(
    "q8_market_share",
    oracle=f"""
WITH flat AS (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         ns.n_name AS supp_nation,
         CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*10000) AS BIGINT) AS rev_i
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r ON nc.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  WHERE r.r_name = 'ASIA'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN rev_i ELSE 0 END) AS DOUBLE)
         / SUM(rev_i) AS mkt_share
FROM flat
GROUP BY o_year
""",
    description=(
        "TPC-H Q8-style market share: one supplier nation's revenue "
        "fraction inside the ASIA-customer market per order year. "
        "Bounded dims (nation/region) broadcast by hint, scale-variant "
        "sides by optimizer estimate only; the ratio divides two exact "
        "integer sums so it is engine-deterministic."
    ),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_nations = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("cnk"))
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    rev_i = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
    flat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cnk"), "left_semi")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("snk"))
        .select(F.year("o_orderdate").alias("o_year"), "supp_nation", rev_i.alias("rev_i"))
    )
    return flat.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("rev_i")).otherwise(0)).cast("double")
            / F.sum("rev_i")
        ).alias("mkt_share")
    )


@register(
    "q9_profit_by_nation_year",
    oracle=f"""
SELECT ns.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
       {sql_dsum('l.l_extendedprice*(1-l.l_discount) - l.l_quantity*l.l_tax*100', 4)} AS profit
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2
""",
    description=(
        "TPC-H Q9-style profit: revenue minus a quantity-scaled cost "
        "proxy (the testdata has no partsupp supplycost), grouped by "
        "supplier nation and order year, parts filtered by a LIKE "
        "pattern."
    ),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "l_quantity"
    ) * F.col("l_tax") * 100
    return (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(amount, 4).alias("profit"))
    )


@register(
    "q11_important_parts",
    oracle=f"""
WITH per_part AS (
  SELECT l_partkey, {sql_dsum('l_extendedprice', 2)} AS part_value
  FROM lineitem GROUP BY l_partkey
), total AS (
  SELECT SUM(part_value) AS tv FROM per_part
)
SELECT p.l_partkey AS partkey, p.part_value
FROM per_part p, total t
WHERE p.part_value > t.tv * 0.0005
""",
    description=(
        "TPC-H Q11-style important parts: per-part value filtered by a "
        "global-total scalar subquery (HAVING against an aggregate of an "
        "aggregate) — the one-row total broadcasts, no second shuffle."
    ),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        dsum(F.col("l_extendedprice"), 2).alias("part_value")
    )
    total = per_part.agg(F.sum("part_value").alias("tv"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("tv") * 0.0005)
        .select("partkey", "part_value")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, {sql_dsum('l_extendedprice*(1-l_discount)', 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
    description=(
        "TPC-H Q15-style top supplier: argmax over an aggregate — the "
        "global max reduces to one broadcast row (never a global-frame "
        "window, which would single-partition the aggregate); ties all "
        "surface, matching the SQL scalar-subquery form."
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    top = rev.join(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return top.join(supp, top.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "agg_percentiles_exact",
    oracle="""
SELECT o_orderpriority,
       quantile_cont(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.25)/100.0 AS p25,
       quantile_cont(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.50)/100.0 AS p50,
       quantile_cont(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.75)/100.0 AS p75
FROM orders
GROUP BY o_orderpriority
""",
    description=(
        "Exact grouped percentiles: linear-interpolated quantiles over "
        "integer cents are bit-identical across engines (dyadic "
        "interpolation fractions on int64 values are exact IEEE ops), "
        "so even order statistics pass the hash gate. The approximate "
        "sketch twin for 100 TB is approx_percentile / percentile_approx."
    ),
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = F.round(F.col("o_totalprice") * 100).cast("long")
    return orders.groupBy("o_orderpriority").agg(
        (F.percentile(c, F.lit(0.25)) / 100.0).alias("p25"),
        (F.percentile(c, F.lit(0.50)) / 100.0).alias("p50"),
        (F.percentile(c, F.lit(0.75)) / 100.0).alias("p75"),
    )


@register(
    "agg_order_status_history",
    oracle="""
SELECT o_custkey AS custkey,
       COUNT(*) AS n_orders,
       string_agg(o_orderstatus, ',' ORDER BY o_orderdate, o_orderkey) AS status_seq
FROM orders
GROUP BY o_custkey
""",
    description=(
        "Collection-function surface: per-customer chronological order-"
        "status sequence via collect_list(struct) + array_sort + "
        "transform + array_join — the Spark idiom for SQL's ordered "
        "string_agg; (date, orderkey) sort key makes the order total."
    ),
)
def agg_order_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("o_orderdate", "o_orderkey", "o_orderstatus"))
            ),
            lambda x: x["o_orderstatus"],
        ),
        ",",
    )
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"), seq.alias("status_seq")
    )


@register(
    "ml_ols_closed_form",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
a AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
  FROM s GROUP BY 1
),
d AS (
  SELECT l_returnflag, CAST(n AS BIGINT) AS n,
         CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
         CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
         CAST(syy AS DOUBLE) AS syyd, CAST(sxy AS DOUBLE) AS sxyd
  FROM a
),
f AS (
  SELECT l_returnflag, n,
         (nd*sxyd - sxd*syd) / (nd*sxxd - sxd*sxd) AS slope
  FROM d
)
SELECT f.l_returnflag, f.n, f.slope,
       (d.syd - f.slope*d.sxd) / d.nd / 100.0 AS intercept,
       ((d.nd*d.sxyd - d.sxd*d.syd) * (d.nd*d.sxyd - d.sxd*d.syd))
         / ((d.nd*d.sxxd - d.sxd*d.sxd) * (d.nd*d.syyd - d.syd*d.syd)) AS r2
FROM f JOIN d USING (l_returnflag)
""",
    description=(
        "[EXT] closed-form OLS (l_extendedprice ~ l_quantity per return "
        "flag) from exact sufficient statistics: one pass computes "
        "micro-scaled int64 sums (n, Σx, Σy, Σx², Σy², Σxy) with "
        "map-side combine — decimal accumulation so Σy² can't wrap — "
        "then slope/intercept/R² by the normal-equation formulas in "
        "IEEE double, mirrored term-for-term in the oracle. The "
        "distributed-ML primitive: training-set size only affects the "
        "scan; the shuffle is 6 numbers per group. Complements the "
        "RandomForest parity path (ml/regression), which the oracle "
        "cannot reach."
    ),
)
def ml_ols_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = li.select(
        "l_returnflag", x.alias("x"), y.alias("y")
    ).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    syyd = F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return a.select(
        "l_returnflag",
        F.col("n"),
        slope.alias("slope"),
        ((syd - slope * sxd) / nd / F.lit(100.0)).alias("intercept"),
        (
            ((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd))
            / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))
        ).alias("r2"),
    )


def _sql_corr(a: str, b: str) -> str:
    """Pearson r from exact int sums, term-for-term IEEE mirror."""
    return (
        f"(nd*s{a}{b} - s{a}*s{b})"
        f" / sqrt((nd*s{a}{a} - s{a}*s{a}) * (nd*s{b}{b} - s{b}*s{b}))"
    )


@register(
    "agg_corr_matrix",
    oracle=f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS d
  FROM lineitem
),
a AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(CAST(q AS HUGEINT)) AS sq, SUM(CAST(p AS HUGEINT)) AS sp,
         SUM(CAST(d AS HUGEINT)) AS sd,
         SUM(CAST(q AS HUGEINT)*q) AS sqq, SUM(CAST(p AS HUGEINT)*p) AS spp,
         SUM(CAST(d AS HUGEINT)*d) AS sdd,
         SUM(CAST(q AS HUGEINT)*p) AS sqp, SUM(CAST(q AS HUGEINT)*d) AS sqd,
         SUM(CAST(p AS HUGEINT)*d) AS spd
  FROM s GROUP BY 1
),
c AS (
  SELECT l_returnflag, CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS nd,
         CAST(sq AS DOUBLE) AS sq, CAST(sp AS DOUBLE) AS sp,
         CAST(sd AS DOUBLE) AS sd,
         CAST(sqq AS DOUBLE) AS sqq, CAST(spp AS DOUBLE) AS spp,
         CAST(sdd AS DOUBLE) AS sdd,
         CAST(sqp AS DOUBLE) AS sqp, CAST(sqd AS DOUBLE) AS sqd,
         CAST(spd AS DOUBLE) AS spd
  FROM a
)
SELECT l_returnflag, n,
       {_sql_corr('q', 'p')} AS corr_qty_price,
       {_sql_corr('q', 'd')} AS corr_qty_disc,
       {_sql_corr('p', 'd')} AS corr_price_disc
FROM c
""",
    description=(
        "[EXT] pairwise Pearson correlation matrix (quantity, "
        "extendedprice, discount per return flag) from one pass of "
        "exact sufficient statistics: per-row cent-grid int64s, "
        "decimal(38,0) accumulation so squared-cent sums cannot wrap, "
        "then the textbook r = (nSxy-SxSy)/sqrt((nSxx-Sx^2)(nSyy-Sy^2)) "
        "in IEEE double, mirrored term-for-term (sqrt is correctly "
        "rounded by the standard, so both engines emit identical "
        "bits). The shuffle is 11 numbers per group regardless of "
        "table size — the same distributed-ML sufficient-statistics "
        "pattern as ml_ols_closed_form, widened to the full "
        "covariance structure."
    ),
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity") * 100).cast("long")
    p = F.round(F.col("l_extendedprice") * 100).cast("long")
    d = F.round(F.col("l_discount") * 100).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = (
        li.select("l_returnflag", q.alias("q"), p.alias("p"), d.alias("d"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(F.col("q"))).alias("sq"),
            F.sum(dec(F.col("p"))).alias("sp"),
            F.sum(dec(F.col("d"))).alias("sd"),
            F.sum(dec(F.col("q") * F.col("q"))).alias("sqq"),
            F.sum(dec(F.col("p") * F.col("p"))).alias("spp"),
            F.sum(dec(F.col("d") * F.col("d"))).alias("sdd"),
            F.sum(dec(F.col("q") * F.col("p"))).alias("sqp"),
            F.sum(dec(F.col("q") * F.col("d"))).alias("sqd"),
            F.sum(dec(F.col("p") * F.col("d"))).alias("spd"),
        )
    )
    nd = F.col("n").cast("double")
    v = {k: F.col(k).cast("double") for k in
         ["sq", "sp", "sd", "sqq", "spp", "sdd", "sqp", "sqd", "spd"]}

    def corr(x, y, xy, xx, yy):
        return (nd * v[xy] - v[x] * v[y]) / F.sqrt(
            (nd * v[xx] - v[x] * v[x]) * (nd * v[yy] - v[y] * v[y])
        )

    return a.select(
        "l_returnflag",
        "n",
        corr("sq", "sp", "sqp", "sqq", "spp").alias("corr_qty_price"),
        corr("sq", "sd", "sqd", "sqq", "sdd").alias("corr_qty_disc"),
        corr("sp", "sd", "spd", "spp", "sdd").alias("corr_price_disc"),
    )


CUST_BAL_CUT = -800
SUPP_BAL_CUT = -200


@register(
    "join_full_outer_distress",
    oracle=f"""
WITH c AS (
  SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
         {sql_dsum('c_acctbal', 2)} AS cust_bal
  FROM customer WHERE c_acctbal < {CUST_BAL_CUT} GROUP BY 1
),
s AS (
  SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_supp,
         {sql_dsum('s_acctbal', 2)} AS supp_bal
  FROM supplier WHERE s_acctbal < {SUPP_BAL_CUT} GROUP BY 1
)
SELECT n.n_name AS nation,
       COALESCE(c.n_cust, 0) AS n_cust,
       COALESCE(c.cust_bal, 0.0) AS cust_bal,
       COALESCE(s.n_supp, 0) AS n_supp,
       COALESCE(s.supp_bal, 0.0) AS supp_bal,
       CASE WHEN c.nationkey IS NULL THEN 'supplier_only'
            WHEN s.nationkey IS NULL THEN 'customer_only'
            ELSE 'both' END AS coverage
FROM c FULL OUTER JOIN s USING (nationkey)
JOIN nation n ON n.n_nationkey = COALESCE(c.nationkey, s.nationkey)
""",
    description=(
        "[EXT] FULL OUTER join surface (the one join type the rest of "
        "the registry never exercises): distressed-balance customers "
        "vs suppliers per nation, with NULL-side coalescing and a "
        "coverage tag; thresholds chosen so all three coverage cases "
        "are non-empty at the driver's sf0.01 gate. Both inputs "
        "pre-aggregate to nation-sized frames before the outer join, "
        "so the join itself is trivially broadcastable at any corpus "
        "scale; USING-key coalescing is the standard Spark "
        "full-outer idiom."
    ),
)
def join_full_outer_distress(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    c = (
        cust.filter(F.col("c_acctbal") < CUST_BAL_CUT)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum(F.col("c_acctbal"), 2).alias("cust_bal"),
        )
    )
    s = (
        supp.filter(F.col("s_acctbal") < SUPP_BAL_CUT)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            dsum(F.col("s_acctbal"), 2).alias("supp_bal"),
        )
    )
    cs = c.alias("c").join(
        s.alias("s"),
        F.col("c.nationkey") == F.col("s.nationkey"),
        "full_outer",
    )
    coverage = (
        F.when(F.col("c.nationkey").isNull(), F.lit("supplier_only"))
        .when(F.col("s.nationkey").isNull(), F.lit("customer_only"))
        .otherwise(F.lit("both"))
    )
    nk = F.coalesce(F.col("c.nationkey"), F.col("s.nationkey"))
    return (
        cs.select(
            nk.alias("nationkey"),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("cust_bal"), F.lit(0.0)).alias("cust_bal"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
            F.coalesce(F.col("supp_bal"), F.lit(0.0)).alias("supp_bal"),
            coverage.alias("coverage"),
        )
        .join(
            F.broadcast(nation),
            F.col("nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            "n_cust", "cust_bal", "n_supp", "supp_bal", "coverage",
        )
    )


@register(
    "agg_chi_squared",
    oracle="""
WITH cells AS (
  SELECT o_orderpriority AS pri, o_orderstatus AS st,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2
),
rt AS (SELECT pri, SUM(o) AS r FROM cells GROUP BY 1),
ct AS (SELECT st, SUM(o) AS c FROM cells GROUP BY 1),
n AS (SELECT SUM(o) AS n FROM cells),
term AS (
  SELECT cells.o,
         CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST(n.n AS DOUBLE) AS e
  FROM cells JOIN rt USING (pri) JOIN ct USING (st) CROSS JOIN n
)
SELECT SUM(CAST(ROUND((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
                       * 1000000000) AS BIGINT)) / 1000000000.0 AS chi2,
       CAST((SELECT (COUNT(DISTINCT pri) - 1) * (COUNT(DISTINCT st) - 1)
             FROM cells) AS BIGINT) AS dof,
       (SELECT CAST(n AS BIGINT) FROM n) AS n
FROM term
""",
    description=(
        "[EXT] chi-squared test of independence (o_orderpriority x "
        "o_orderstatus): observed cell counts from one map-side-"
        "combined pass, expected counts row_total*col_total/N, "
        "statistic = sum (o-e)^2/e with each cell's term rounded to a "
        "1e-9 grid and summed as int64 (bit-stable across engines and "
        "summation orders). The contingency table is "
        "|priorities|x|statuses| rows — KBs however large the fact "
        "table — so marginals and the statistic are driver-trivial "
        "joins on a broadcast-sized frame; the data-sized work is "
        "exactly one aggregate scan. The categorical-association "
        "screen feature selection runs over 100 TB of labels."
    ),
)
def agg_chi_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # lazy pin: five branches (marginals, total, dof, terms) read this
    # contingency frame, and per-branch column pruning makes their
    # subplans non-identical, so ReuseExchange does NOT collapse them —
    # measured 11 fact-table scans unpinned. The frame is
    # |priorities|x|statuses| rows, so the checkpoint is KBs.
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count(F.lit(1)).alias("o")).localCheckpoint(eager=False)
    rt = cells.groupBy("pri").agg(F.sum("o").alias("r"))
    ct = cells.groupBy("st").agg(F.sum("o").alias("c"))
    n = cells.agg(F.sum("o").alias("n"))
    od = F.col("o").cast("double")
    e = F.col("r").cast("double") * F.col("c").cast("double") / F.col("n").cast(
        "double"
    )
    term = (
        cells.join(F.broadcast(rt), "pri")
        .join(F.broadcast(ct), "st")
        .crossJoin(F.broadcast(n))
        .select("o", "pri", "st", e.alias("e"))
    )
    dof = cells.agg(
        (
            (F.count_distinct("pri") - 1) * (F.count_distinct("st") - 1)
        ).cast("long").alias("dof")
    )
    chi2 = term.agg(
        (
            F.sum(
                F.round(
                    (F.col("o").cast("double") - F.col("e"))
                    * (F.col("o").cast("double") - F.col("e"))
                    / F.col("e")
                    * F.lit(1_000_000_000)
                ).cast("long")
            )
            / F.lit(1_000_000_000.0)
        ).alias("chi2")
    )
    return chi2.crossJoin(dof).crossJoin(n.select(F.col("n").cast("long").alias("n")))


RIDGE_LAMBDA = 1_000_000.0  # on the 100-scaled integer grid (= 100 raw units^2)


@register(
    "ml_ridge_closed_form",
    oracle=f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS x1,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
a AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(CAST(x1 AS HUGEINT)) AS s1, SUM(CAST(x2 AS HUGEINT)) AS s2,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x1 AS HUGEINT)*x1) AS s11, SUM(CAST(x2 AS HUGEINT)*x2) AS s22,
         SUM(CAST(x1 AS HUGEINT)*x2) AS s12,
         SUM(CAST(x1 AS HUGEINT)*y) AS s1y, SUM(CAST(x2 AS HUGEINT)*y) AS s2y
  FROM s GROUP BY 1
),
d AS (
  SELECT l_returnflag, CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
         CAST(sy AS DOUBLE) AS sy, CAST(s11 AS DOUBLE) AS s11,
         CAST(s22 AS DOUBLE) AS s22, CAST(s12 AS DOUBLE) AS s12,
         CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y
  FROM a
),
c AS (
  SELECT l_returnflag, n, nd, s1, s2, sy,
         s11 - s1*s1/nd AS c11, s22 - s2*s2/nd AS c22,
         s12 - s1*s2/nd AS c12, s1y - s1*sy/nd AS c1y,
         s2y - s2*sy/nd AS c2y
  FROM d
),
f AS (
  SELECT l_returnflag, n, nd, s1, s2, sy,
         ((c22 + {RIDGE_LAMBDA}) * c1y - c12 * c2y)
           / ((c11 + {RIDGE_LAMBDA}) * (c22 + {RIDGE_LAMBDA}) - c12 * c12)
           AS slope_qty,
         ((c11 + {RIDGE_LAMBDA}) * c2y - c12 * c1y)
           / ((c11 + {RIDGE_LAMBDA}) * (c22 + {RIDGE_LAMBDA}) - c12 * c12)
           AS slope_disc
  FROM c
)
SELECT l_returnflag, n, slope_qty, slope_disc,
       (sy - slope_qty*s1 - slope_disc*s2) / nd / 100.0 AS intercept
FROM f
""",
    description=(
        "[EXT] closed-form ridge regression (l_extendedprice ~ "
        "l_quantity + l_discount per return flag, L2 penalty on the "
        "centered 2x2 normal equations, intercept unpenalized): one "
        "pass computes exact micro-scaled int64/decimal sufficient "
        "statistics, then the 2x2 Cramer solve with (C + lambda*I) in "
        "IEEE double, mirrored term-for-term in the oracle. Extends "
        "ml_ols_closed_form to multivariate + regularized — still the "
        "distributed-ML shape where the shuffle is 10 numbers per "
        "group no matter how many rows were scanned, and lambda "
        "guards the near-collinear case that makes plain OLS blow up."
    ),
)
def ml_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x1 = F.round(F.col("l_quantity") * 100).cast("long")
    x2 = F.round(F.col("l_discount") * 100).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = li.select(
        "l_returnflag", x1.alias("x1"), x2.alias("x2"), y.alias("y")
    ).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x1"))).alias("s1"),
        F.sum(dec(F.col("x2"))).alias("s2"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x1") * F.col("x1"))).alias("s11"),
        F.sum(dec(F.col("x2") * F.col("x2"))).alias("s22"),
        F.sum(dec(F.col("x1") * F.col("x2"))).alias("s12"),
        F.sum(dec(F.col("x1") * F.col("y"))).alias("s1y"),
        F.sum(dec(F.col("x2") * F.col("y"))).alias("s2y"),
    )
    nd = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    sy = F.col("sy").cast("double")
    c11 = F.col("s11").cast("double") - s1 * s1 / nd
    c22 = F.col("s22").cast("double") - s2 * s2 / nd
    c12 = F.col("s12").cast("double") - s1 * s2 / nd
    c1y = F.col("s1y").cast("double") - s1 * sy / nd
    c2y = F.col("s2y").cast("double") - s2 * sy / nd
    lam = F.lit(RIDGE_LAMBDA)
    det = (c11 + lam) * (c22 + lam) - c12 * c12
    b1 = ((c22 + lam) * c1y - c12 * c2y) / det
    b2 = ((c11 + lam) * c2y - c12 * c1y) / det
    return a.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        b1.alias("slope_qty"),
        b2.alias("slope_disc"),
        ((sy - b1 * s1 - b2 * s2) / nd / F.lit(100.0)).alias("intercept"),
    )


SKEW_TOP_K = 10


@register(
    "agg_key_skew_profile",
    oracle=f"""
WITH per_key AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
tot AS (SELECT SUM(n_orders) AS total, COUNT(*) AS n_keys FROM per_key),
top AS (
  SELECT o_custkey, n_orders,
         row_number() OVER (ORDER BY n_orders DESC, o_custkey) AS rank
  FROM per_key
  QUALIFY rank <= {SKEW_TOP_K}
)
SELECT rank, o_custkey, n_orders,
       CAST(n_orders AS DOUBLE) / CAST(tot.total AS DOUBLE) AS share,
       CAST(SUM(n_orders) OVER (ORDER BY rank) AS DOUBLE)
         / CAST(tot.total AS DOUBLE) AS cum_share,
       CAST(tot.n_keys AS BIGINT) AS n_keys
FROM top CROSS JOIN tot
""",
    description=(
        "[EXT] shuffle-skew diagnosis: the top-10 heaviest join keys "
        "(orders per o_custkey), each with its share and cumulative "
        "share of all rows plus the total key cardinality — exactly "
        "the profile that decides between a plain hash join, AQE skew "
        "splitting, or the salted operators in operators/skew.py. The "
        "heavy-hitter extraction is orderBy+limit (TakeOrderedAndProject "
        "— per-partition top-k then a 10-row driver merge, never a "
        "global sort), the totals are a scalar aggregate, and the "
        "cumulative window runs over 10 rows; nothing keys-cardinality-"
        "sized is ever single-tasked."
    ),
)
def agg_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    # lazy pin: both the totals branch and the top-k branch read this
    # per-key frame; unpinned they each rescan the fact table.
    per_key = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    ).localCheckpoint(eager=False)
    tot = per_key.agg(
        F.sum("n_orders").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = per_key.orderBy(F.col("n_orders").desc(), "o_custkey").limit(SKEW_TOP_K)
    rank_w = Window.orderBy(F.col("n_orders").desc(), "o_custkey")
    cum_w = rank_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(rank_w))
        .select(
            "rank",
            "o_custkey",
            "n_orders",
            (
                F.col("n_orders").cast("double") / F.col("total").cast("double")
            ).alias("share"),
            (
                F.sum("n_orders").over(cum_w).cast("double")
                / F.col("total").cast("double")
            ).alias("cum_share"),
            F.col("n_keys").cast("long").alias("n_keys"),
        )
    )


@register(
    "ml_auc_exact",
    oracle="""
WITH scored AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
hist AS (
  SELECT s, SUM(y) AS p, SUM(1 - y) AS n
  FROM scored GROUP BY 1
),
cum AS (
  SELECT s, p, n,
         COALESCE(SUM(n) OVER (
           ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_n_before
  FROM hist
),
tot AS (SELECT SUM(p) AS pp, SUM(n) AS nn FROM hist)
SELECT CAST(tot.pp AS BIGINT) AS n_pos, CAST(tot.nn AS BIGINT) AS n_neg,
       CAST(SUM(p * (2 * cum_n_before + n)) AS DOUBLE)
         / (2.0 * tot.pp * tot.nn) AS auc
FROM cum CROSS JOIN tot
GROUP BY tot.pp, tot.nn
""",
    description=(
        "[EXT] exact distributed AUC (Mann-Whitney rank-sum with "
        "average-rank tie handling) for a score/label stream — the "
        "model-evaluation primitive a 100 TB training pipeline runs on "
        "held-out data ('does value rank purchases above "
        "non-purchases'). The scalable rewrite: instead of a global "
        "rank window over every row, counts fold into a per-SCORE "
        "histogram (cent-grid cardinality, independent of row count), "
        "the cumulative-negatives pass runs over that histogram, and "
        "AUC = sum p_s*(2*cumN_before + n_s) / (2*P*N) in exact "
        "integers with ONE final division — ties contribute exactly "
        "1/2 per the Mann-Whitney definition. At extreme score "
        "cardinality the ordered pass shards like text_pack_bins; on "
        "a cent grid it is thousands of rows at any corpus size."
    ),
)
def ml_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    hist = scored.groupBy("s").agg(
        F.sum("y").alias("p"), F.sum(F.lit(1) - F.col("y")).alias("n")
    )
    cw = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.withColumn(
        "cum_n_before", F.coalesce(F.sum("n").over(cw), F.lit(0))
    )
    tot = hist.agg(F.sum("p").alias("pp"), F.sum("n").alias("nn"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("pp", "nn")
        .agg(
            (
                F.sum(
                    F.col("p") * (2 * F.col("cum_n_before") + F.col("n"))
                ).cast("double")
                / (F.lit(2.0) * F.col("pp") * F.col("nn"))
            ).alias("auc")
        )
        .select(
            F.col("pp").cast("long").alias("n_pos"),
            F.col("nn").cast("long").alias("n_neg"),
            "auc",
        )
    )


CAL_BINS = 10
CAL_BIN_WIDTH = 50.0  # value spans [0, 500)


@register(
    "ml_calibration_bins",
    oracle=f"""
SELECT CAST(FLOOR(value / {CAL_BIN_WIDTH}) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pos,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS pos_rate,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 / COUNT(*)
         AS mean_score
FROM events
GROUP BY 1
""",
    description=(
        "[EXT] calibration / reliability table: fixed score bins with "
        "observed positive rate and exact-decimal mean score per bin — "
        "AUC's companion diagnostic (ranking can be perfect while "
        "probabilities are off; the reliability curve is how you see "
        "it). One map-side-combined pass; output is #bins rows at any "
        "corpus size. Counts are exact int64, the two ratios are one "
        "IEEE division each."
    ),
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.groupBy(
        F.floor(F.col("value") / CAL_BIN_WIDTH).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).cast("long").alias("n_pos"),
        (F.sum(y).cast("double") / F.count(F.lit(1))).alias("pos_rate"),
        (F.sum(cents) / F.lit(100.0) / F.count(F.lit(1))).alias("mean_score"),
    )


@register(
    "ml_mutual_information",
    oracle="""
WITH stacked AS (
  SELECT f.feature, f.x,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events, LATERAL (VALUES
    ('value_bin', CAST(FLOOR(value / 50.0) AS BIGINT)),
    ('hour_of_day', CAST(EXTRACT(HOUR FROM ts) AS BIGINT)),
    ('day_of_week', (CAST(ts AS DATE) - DATE '1970-01-01') % 7)
  ) AS f(feature, x)
),
joint AS (
  SELECT feature, x, y, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM stacked GROUP BY 1, 2, 3
),
mx AS (SELECT feature, x, SUM(c_xy) AS c_x FROM joint GROUP BY 1, 2),
my AS (SELECT feature, y, SUM(c_xy) AS c_y FROM joint GROUP BY 1, 2),
n AS (SELECT feature, SUM(c_xy) AS n FROM joint GROUP BY 1),
term AS (
  SELECT j.feature,
         (CAST(j.c_xy AS DOUBLE) / n.n)
           * ln(CAST(j.c_xy AS DOUBLE) * n.n / (CAST(mx.c_x AS DOUBLE) * my.c_y))
           AS t
  FROM joint j
  JOIN mx ON j.feature = mx.feature AND j.x = mx.x
  JOIN my ON j.feature = my.feature AND j.y = my.y
  JOIN n ON j.feature = n.feature
)
SELECT feature,
       SUM(CAST(ROUND(t * 1000000000) AS BIGINT)) / 1000000000.0 AS mi_nats
FROM term GROUP BY feature
""",
    description=(
        "[EXT] mutual-information feature ranking — the model-free "
        "feature-selection screen ('which candidate features carry "
        "signal about the purchase label'): I(X;Y) = sum p_xy * "
        "ln(p_xy/(p_x p_y)) over observed cells, for three candidate "
        "featurizations (value bin, hour-of-day, epoch-dow) stacked "
        "into ONE scan via an inline table — 3 features never cost 3 "
        "passes. All counts exact int64; per-cell terms follow the "
        "repo's 1e-9-grid discipline so the sums are order-independent "
        "across engines. The joint table is (feature x bins x 2) rows "
        "— KBs at any corpus size — so every join here is "
        "broadcast-trivial; the derived marginals read the pinned "
        "joint frame, not the corpus."
    ),
)
def ml_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    stacked = ev.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("value_bin").alias("feature"),
                    F.floor(F.col("value") / F.lit(50.0)).cast("long").alias("x"),
                ),
                F.struct(
                    F.lit("hour_of_day").alias("feature"),
                    F.hour(F.col("ts")).cast("long").alias("x"),
                ),
                F.struct(
                    F.lit("day_of_week").alias("feature"),
                    (
                        F.datediff(
                            F.col("ts").cast("date"),
                            F.lit("1970-01-01").cast("date"),
                        )
                        % 7
                    ).cast("long").alias("x"),
                ),
            )
        ).alias("f"),
        y.alias("y"),
    ).select(F.col("f.feature").alias("feature"), F.col("f.x").alias("x"), "y")
    # lazy pin: marginals and totals are derived from the joint table
    joint = stacked.groupBy("feature", "x", "y").agg(
        F.count(F.lit(1)).alias("c_xy")
    ).localCheckpoint(eager=False)
    mx = joint.groupBy("feature", "x").agg(F.sum("c_xy").alias("c_x"))
    my = joint.groupBy("feature", "y").agg(F.sum("c_xy").alias("c_y"))
    n = joint.groupBy("feature").agg(F.sum("c_xy").alias("n"))
    t = (F.col("c_xy").cast("double") / F.col("n")) * F.log(
        F.col("c_xy").cast("double")
        * F.col("n")
        / (F.col("c_x").cast("double") * F.col("c_y"))
    )
    term = (
        joint.join(F.broadcast(mx), ["feature", "x"])
        .join(F.broadcast(my), ["feature", "y"])
        .join(F.broadcast(n), "feature")
        .select("feature", t.alias("t"))
    )
    return term.groupBy("feature").agg(
        (
            F.sum(F.round(F.col("t") * F.lit(1_000_000_000)).cast("long"))
            / F.lit(1_000_000_000.0)
        ).alias("mi_nats")
    )


@register(
    "ml_isotonic_calibration",
    oracle=f"""
WITH b AS (
  SELECT CAST(FLOOR(value / {CAL_BIN_WIDTH}) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
  FROM events GROUP BY 1
),
pre AS (
  SELECT bin, n, p,
         SUM(n) OVER (ORDER BY bin) AS cn,
         SUM(p) OVER (ORDER BY bin) AS cp
  FROM b
),
ivl AS (
  SELECT kf.bin AS k, jf.bin AS j,
         CAST(jf.cp - (kf.cp - kf.p) AS DOUBLE)
           / CAST(jf.cn - (kf.cn - kf.n) AS DOUBLE) AS m
  FROM pre kf JOIN pre jf ON kf.bin <= jf.bin
),
mk AS (
  SELECT g.bin AS i, ivl.k, MIN(ivl.m) AS mn
  FROM b g JOIN ivl ON ivl.k <= g.bin AND ivl.j >= g.bin
  GROUP BY 1, 2
),
fit AS (SELECT i, MAX(mn) AS fitted FROM mk GROUP BY 1)
SELECT b.bin, b.n, b.p AS n_pos,
       CAST(b.p AS DOUBLE) / b.n AS pos_rate,
       fit.fitted AS fitted_rate
FROM b JOIN fit ON fit.i = b.bin
""",
    description=(
        "[EXT] isotonic (PAV) probability calibration over the "
        "reliability bins, via the min-max closed form: fitted(i) = "
        "max over k<=i of min over j>=i of the pooled rate on bins "
        "[k..j] (Ayer et al. 1955; Zadrozny & Elkan 2002) — the "
        "monotone-nondecreasing fit the raw reliability curve may "
        "violate. The corpus-sized stage is ONE binning pass; all "
        "interval enumeration runs on the B-bin aggregate (B**3 "
        "candidate terms at B=10 — constant at any corpus size, the "
        "Theil-Sen bounded-quadratic pattern). Pooled rates are one "
        "IEEE division of exact int64 prefix sums, so min/max "
        "decisions are bit-identical cross-engine; monotonicity of "
        "the output is pinned by a test."
    ),
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    b = ev.groupBy(
        F.floor(F.col("value") / CAL_BIN_WIDTH).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).cast("long").alias("p"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = b.select(
        "bin", "n", "p",
        F.sum("n").over(w).alias("cn"),
        F.sum("p").over(w).alias("cp"),
    )
    kf = pre.select(
        F.col("bin").alias("k"),
        (F.col("cp") - F.col("p")).alias("cp_km1"),
        (F.col("cn") - F.col("n")).alias("cn_km1"),
    )
    jf = pre.select(
        F.col("bin").alias("j"), F.col("cp").alias("cp_j"), F.col("cn").alias("cn_j")
    )
    ivl = kf.join(jf, F.col("k") <= F.col("j")).select(
        "k",
        "j",
        (
            (F.col("cp_j") - F.col("cp_km1")).cast("double")
            / (F.col("cn_j") - F.col("cn_km1")).cast("double")
        ).alias("m"),
    )
    grid = b.select(F.col("bin").alias("i"))
    mk = (
        grid.join(ivl, (F.col("k") <= F.col("i")) & (F.col("j") >= F.col("i")))
        .groupBy("i", "k")
        .agg(F.min("m").alias("mn"))
    )
    fit = mk.groupBy("i").agg(F.max("mn").alias("fitted_rate"))
    return b.join(fit, b.bin == fit.i).select(
        "bin",
        "n",
        F.col("p").alias("n_pos"),
        (F.col("p").cast("double") / F.col("n")).alias("pos_rate"),
        "fitted_rate",
    )


@register(
    "ml_woe_iv",
    oracle=f"""
WITH b AS (
  SELECT CAST(FLOOR(value / {CAL_BIN_WIDTH}) AS BIGINT) AS bin,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS BIGINT) AS neg
  FROM events GROUP BY 1
),
t AS (SELECT SUM(pos) AS tp, SUM(neg) AS tn FROM b),
w AS (
  SELECT b.bin, b.pos, b.neg,
         CAST(ROUND(ln(((b.pos + 0.5) / t.tp) / ((b.neg + 0.5) / t.tn))
                    * 1000000000) AS BIGINT) / 1000000000.0 AS woe,
         (((b.pos + 0.5) / t.tp) - ((b.neg + 0.5) / t.tn)) AS gap
  FROM b, t
),
w2 AS (SELECT bin, pos, neg, woe, gap * woe AS iv_term FROM w)
SELECT bin, pos, neg, woe,
       CAST(SUM(CAST(ROUND(iv_term * 1000000000) AS BIGINT)) OVER ()
            AS DOUBLE) / 1000000000.0 AS iv_total
FROM w2
""",
    description=(
        "[EXT] weight of evidence + information value over the score "
        "bins (the credit-scoring feature screen; Siddiqi 2006): WoE = "
        "ln(bin's share of positives / share of negatives), IV = sum "
        "over bins of (share gap) * WoE — IV < 0.02 means the feature "
        "carries no signal, > 0.5 suspiciously much. Counts exact "
        "int64 with the standard +0.5 smoothing (zero-positive bins "
        "stay finite); WoE snaps onto the 1e-9 grid (ln differs by an "
        "ULP between libm and the JVM — the mutual-information rule), "
        "and the IV sum is grid-floored first "
        "(mutual-information pattern) so the total is order-"
        "independent. One map-side-combined pass, #bins output rows."
    ),
)
def ml_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    b = ev.groupBy(
        F.floor(F.col("value") / CAL_BIN_WIDTH).cast("long").alias("bin")
    ).agg(
        F.sum(y).cast("long").alias("pos"),
        F.sum(1 - y).cast("long").alias("neg"),
    )
    t = b.agg(F.sum("pos").alias("tp"), F.sum("neg").alias("tn"))
    w = b.crossJoin(F.broadcast(t)).select(
        "bin",
        "pos",
        "neg",
        (
            F.round(
                F.log(
                    ((F.col("pos") + F.lit(0.5)) / F.col("tp"))
                    / ((F.col("neg") + F.lit(0.5)) / F.col("tn"))
                )
                * 1e9
            ).cast("long")
            / F.lit(1e9)
        ).alias("woe"),
        (
            ((F.col("pos") + F.lit(0.5)) / F.col("tp"))
            - ((F.col("neg") + F.lit(0.5)) / F.col("tn"))
        ).alias("gap"),
    ).withColumn("iv_term", F.col("gap") * F.col("woe")).drop("gap")
    return w.select(
        "bin",
        "pos",
        "neg",
        "woe",
        (
            F.sum(F.round(F.col("iv_term") * 1e9).cast("long")).over(
                Window.partitionBy()
            )
            / F.lit(1e9)
        ).cast("double").alias("iv_total"),
    )
