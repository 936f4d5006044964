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

from pyspark.sql import DataFrame, SparkSession, Window
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


# l_extendedprice spans ~[900, 105k] -> cents <= ~1.05e7
EXT_PRICE_SHARD = 1_000_000


@register(
    "agg_weighted_median_by_flag",
    oracle="""
WITH pv AS (
  SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS nn
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, cents,
         CAST(SUM(nn) OVER (PARTITION BY l_returnflag ORDER BY cents) AS BIGINT)
           AS cum_n
  FROM pv
),
tot AS (
  SELECT l_returnflag, CAST(SUM(nn) AS BIGINT) AS w FROM pv GROUP BY 1
)
SELECT tot.l_returnflag, tot.w AS total_weight,
       MIN(CASE WHEN cum.cum_n * 2 >= tot.w THEN cum.cents END) AS median_cents,
       MIN(CASE WHEN cum.cum_n * 2 >= tot.w THEN cum.cents END) / 100.0
         AS median_value
FROM cum JOIN tot USING (l_returnflag)
GROUP BY tot.l_returnflag, tot.w
""",
    description=(
        "[EXT] exact QUANTITY-WEIGHTED median of extended price per "
        "return flag (operators/order_stats.grouped_exact_quantiles "
        "with weight_col): each lineitem counts for its quantity, so "
        "the statistic answers 'the price level at which half the "
        "UNITS ship' — the inventory-weighted location estimate the "
        "unweighted median cannot give. Same sharded prefix sum, same "
        "pure-integer selection predicate (2*cum_w >= W); only the "
        "mass function changed."
    ),
)
def agg_weighted_median_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    q = grouped_exact_quantiles(
        base,
        "l_returnflag",
        quantiles=(("median", 1, 2),),
        shard_size=EXT_PRICE_SHARD,
        weight_col="qty",
    )
    return q.select(
        "l_returnflag",
        F.col("n_rows").alias("total_weight"),
        "median_cents",
        (F.col("median_cents") / 100.0).alias("median_value"),
    )


PR_TOP_F1_ROWS = 10


@register(
    "ml_pr_curve_topf1",
    oracle=f"""
WITH scored AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE value IS NOT NULL
),
hist AS (
  SELECT s, CAST(SUM(y) AS BIGINT) AS p, CAST(SUM(1 - y) AS BIGINT) AS n
  FROM scored GROUP BY 1
),
cum AS (
  SELECT s,
         CAST(SUM(p) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
         CAST(SUM(n) OVER (ORDER BY s DESC) AS BIGINT) AS fp
  FROM hist
),
tot AS (SELECT CAST(SUM(p) AS BIGINT) AS pp FROM hist),
curve AS (
  SELECT s AS threshold_cents, tp, fp, tot.pp - tp AS fn,
         CAST(tp AS DOUBLE) / (tp + fp) AS prec,
         CAST(tp AS DOUBLE) / tot.pp AS rec,
         CAST(2 * tp AS DOUBLE) / (2 * tp + fp + (tot.pp - tp)) AS f1
  FROM cum CROSS JOIN tot
)
SELECT threshold_cents, threshold_cents / 100.0 AS threshold_value,
       tp, fp, fn, prec, rec, f1
FROM curve
ORDER BY f1 DESC, threshold_cents ASC
LIMIT {PR_TOP_F1_ROWS}
""",
    description=(
        "[EXT] exact precision-recall curve with best-F1 operating "
        "points: sweep every distinct score threshold (predict "
        "positive when score >= t), TP/FP from ONE descending "
        "cumulative pass over the per-score histogram (cent-grid "
        "cardinality — independent of row count, the ml_auc_exact "
        "shape), and return the top-10 thresholds by F1 — the "
        "threshold-selection step that turns a ranked model into a "
        "classifier. All counts int64; precision/recall/F1 are one "
        "correctly-rounded division each from identical integers, so "
        "ordering by F1 agrees bit-for-bit across engines (ties break "
        "to the lower threshold). Semantics (ADVICE r8 #3): the curve "
        "is computed over SCORED rows only — a NULL score is not an "
        "operating point, and NULL-scored purchases are excluded from "
        "the positive total pp, i.e. recall/FN denominators count "
        "scored positives, not all positives (applied identically in "
        "the oracle's WHERE value IS NOT NULL). Top-k via TakeOrdered, "
        "no global row sort."
    ),
)
def ml_pr_curve_topf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # a NULL score is not an operating point: unfiltered it yields a
    # NULL threshold row whose ASC tie-break position differs between
    # Spark (NULLs first) and DuckDB (NULLs last) — ADVICE r7 #2
    scored = ev.filter(F.col("value").isNotNull()).select(
        F.round(F.col("value") * 100).cast("long").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    hist = scored.groupBy("s").agg(
        F.sum("y").cast("long").alias("p"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("n"),
    )
    # descending cumulative over the cent-grid histogram (bounded by
    # the value RANGE, not the row count — ml_auc_exact precedent)
    w = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "s",
        F.sum("p").over(w).cast("long").alias("tp"),
        F.sum("n").over(w).cast("long").alias("fp"),
    )
    tot = hist.agg(F.sum("p").cast("long").alias("pp"))
    curve = cum.crossJoin(F.broadcast(tot)).select(
        F.col("s").alias("threshold_cents"),
        "tp",
        "fp",
        (F.col("pp") - F.col("tp")).alias("fn"),
        (F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))).alias("prec"),
        (F.col("tp").cast("double") / F.col("pp")).alias("rec"),
        (
            (F.col("tp") * 2).cast("double")
            / (F.col("tp") * 2 + F.col("fp") + (F.col("pp") - F.col("tp")))
        ).alias("f1"),
    )
    return (
        curve.orderBy(F.desc("f1"), F.asc("threshold_cents"))
        .limit(PR_TOP_F1_ROWS)
        .select(
            "threshold_cents",
            (F.col("threshold_cents") / 100.0).alias("threshold_value"),
            "tp",
            "fp",
            "fn",
            "prec",
            "rec",
            "f1",
        )
    )


RULE_MIN_PAIR_SUPPORT = 2
RULE_TOP_K = 20


@register(
    "ml_association_rules",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_ord AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM items
),
supp AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS s FROM items GROUP BY 1
),
pair AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS sab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {RULE_MIN_PAIR_SUPPORT}
),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, sab,
         sa.s AS supp_ante, sb.s AS supp_cons
  FROM pair JOIN supp sa ON pair.pa = sa.l_partkey
            JOIN supp sb ON pair.pb = sb.l_partkey
  UNION ALL
  SELECT pb, pa, sab, sb.s, sa.s
  FROM pair JOIN supp sa ON pair.pa = sa.l_partkey
            JOIN supp sb ON pair.pb = sb.l_partkey
)
SELECT antecedent, consequent, sab AS supp_pair, supp_ante, supp_cons,
       CAST(sab AS DOUBLE) / supp_ante AS confidence,
       CAST(sab * n_ord.n AS DOUBLE) / (supp_ante * supp_cons) AS lift
FROM rules CROSS JOIN n_ord
ORDER BY lift DESC, confidence DESC, antecedent, consequent
LIMIT {RULE_TOP_K}
""",
    description=(
        "[EXT] market-basket association rules over order baskets: "
        "pair supports from the distinct (order, part) self-join, "
        "confidence = supp(a,b)/supp(a), lift = supp(a,b)*N/"
        "(supp(a)*supp(b)), top-20 rules by lift — the co-purchase "
        "recommendation primitive (classic Agrawal-Srikant support/"
        "confidence framework, public methodology). Exact: supports "
        "are int64 counts, confidence/lift one division each from "
        "identical integers; ranking ties break on the (antecedent, "
        "consequent) key. Scale: the pair join is bounded per order by "
        "basket size (<= 7 here; the cooccurrence cap pattern applies "
        "beyond), supports shuffle on part keys, and top-k is "
        "TakeOrdered — no global sort. The min-support floor "
        "(>= {0}) prunes the pair tail before any rule math.".format(
            RULE_MIN_PAIR_SUPPORT
        )
    ),
)
def ml_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_ord = items.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n")
    )
    supp = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("s")
    )
    a = items.alias("a")
    b = items.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("sab"))
        .filter(F.col("sab") >= RULE_MIN_PAIR_SUPPORT)
    )
    with_supp = (
        pair.join(supp.select(F.col("l_partkey").alias("pa"), F.col("s").alias("sa")), "pa")
        .join(supp.select(F.col("l_partkey").alias("pb"), F.col("s").alias("sb")), "pb")
    )
    fwd = with_supp.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "sab",
        F.col("sa").alias("supp_ante"),
        F.col("sb").alias("supp_cons"),
    )
    rev = with_supp.select(
        F.col("pb").alias("antecedent"),
        F.col("pa").alias("consequent"),
        "sab",
        F.col("sb").alias("supp_ante"),
        F.col("sa").alias("supp_cons"),
    )
    rules = fwd.unionByName(rev).crossJoin(F.broadcast(n_ord))
    return (
        rules.select(
            "antecedent",
            "consequent",
            F.col("sab").alias("supp_pair"),
            "supp_ante",
            "supp_cons",
            (F.col("sab").cast("double") / F.col("supp_ante")).alias("confidence"),
            (
                (F.col("sab") * F.col("n")).cast("double")
                / (F.col("supp_ante") * F.col("supp_cons"))
            ).alias("lift"),
        )
        .orderBy(
            F.desc("lift"), F.desc("confidence"), "antecedent", "consequent"
        )
        .limit(RULE_TOP_K)
    )


@register(
    "ml_ab_test_proportions",
    oracle="""
WITH g AS (
  SELECT CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS weekend,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
agg AS (
  SELECT CAST(SUM(CASE WHEN weekend = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN weekend = 1 THEN y ELSE 0 END) AS BIGINT) AS x_a,
         CAST(SUM(CASE WHEN weekend = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN weekend = 0 THEN y ELSE 0 END) AS BIGINT) AS x_b
  FROM g
)
SELECT n_a, x_a, n_b, x_b,
       CAST(x_a AS DOUBLE) / n_a AS rate_a,
       CAST(x_b AS DOUBLE) / n_b AS rate_b,
       (CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
         / SQRT((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                * (1.0 / n_a + 1.0 / n_b)) AS z_score
FROM agg
""",
    description=(
        "[EXT] two-proportion z-test (pooled): weekend vs weekday "
        "purchase-rate difference with its z-score — the A/B "
        "experimentation primitive that turns two exact count pairs "
        "into a significance read. ONE map-side-combined aggregation "
        "over the stream (4 int64 counters at any corpus size); the "
        "z-score is a fixed tree of correctly-rounded IEEE ops "
        "(divisions, one sqrt) over identical integers, so it pins "
        "bit-for-bit — the same discipline as agg_corr_matrix. "
        "Weekend uses ISO day-of-week (Spark weekday()>=5 == DuckDB "
        "isodow()>=6), sidestepping the engines' different Sunday "
        "conventions."
    ),
)
def ml_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    weekend = F.when(F.expr("weekday(ts)") >= 5, 1).otherwise(0)
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    agg = ev.select(weekend.alias("w"), y.alias("y")).agg(
        F.sum(F.when(F.col("w") == 1, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("w") == 1, F.col("y")).otherwise(0)).cast("long").alias("x_a"),
        F.sum(F.when(F.col("w") == 0, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("w") == 0, F.col("y")).otherwise(0)).cast("long").alias("x_b"),
    )
    pooled = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    rate_a = F.col("x_a").cast("double") / F.col("n_a")
    rate_b = F.col("x_b").cast("double") / F.col("n_b")
    return agg.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        (
            (rate_a - rate_b)
            / F.sqrt(
                pooled
                * (F.lit(1.0) - pooled)
                * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
            )
        ).alias("z_score"),
    )


@register(
    "fs_training_set_pit",
    oracle="""
WITH feats AS (
  SELECT event_id, user_id, ts, event_type, value,
         COALESCE(CAST(COUNT(*) OVER w AS BIGINT), 0) AS n_prior_events,
         COALESCE(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
                       AS BIGINT), 0) AS prior_value_cents
  FROM events
  WINDOW w AS (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  )
)
SELECT event_id AS label_id, user_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS label_time,
       value AS label_value,
       n_prior_events,
       prior_value_cents,
       prior_value_cents / 100.0 AS prior_value
FROM feats
WHERE event_type = 'purchase'
""",
    description=(
        "[EXT] point-in-time training-set assembly — the deliverable "
        "every feature-store query ultimately serves: one row per "
        "label event (purchase) carrying features computed from "
        "STRICTLY-PRIOR history only (running event count and exact-"
        "cents value sum over [start, label)), so the set is leakage-"
        "free by construction — the positive counterpart of "
        "fs_leakage_audit, which quantifies what a naive join would "
        "contaminate. One pass: a user-partitioned running window "
        "ending at 1 PRECEDING (ties broken by event_id) computed "
        "over the full stream, then filtered to labels — no join at "
        "all, versus the as-of join family's two-table shape. Window "
        "partitions are per-user (bounded), sums are int64 cents."
    ),
)
def fs_training_set_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    feats = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.coalesce(F.count(F.lit(1)).over(w), F.lit(0))
        .cast("long")
        .alias("n_prior_events"),
        F.coalesce(F.sum(cents).over(w), F.lit(0))
        .cast("long")
        .alias("prior_value_cents"),
    )
    return feats.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("label_time"),
        F.col("value").alias("label_value"),
        "n_prior_events",
        "prior_value_cents",
        (F.col("prior_value_cents") / 100.0).alias("prior_value"),
    )


# events.value spans [0, ~500): p = cents/50000 is a well-defined
# pseudo-probability for the Brier diagnostic (the score's GRID, not a
# model claim — what matters is exactness of the mean squared gap).
BRIER_SCALE = 50_000


@register(
    "ml_brier_score",
    oracle=f"""
WITH s AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST((cents - y * {BRIER_SCALE}) AS BIGINT)
                * CAST((cents - y * {BRIER_SCALE}) AS BIGINT)) AS BIGINT)
         AS sq_err_scaled,
       CAST(SUM(CAST((cents - y * {BRIER_SCALE}) AS BIGINT)
                * CAST((cents - y * {BRIER_SCALE}) AS BIGINT)) AS DOUBLE)
         / COUNT(*) / ({BRIER_SCALE}.0 * {BRIER_SCALE}.0) AS brier
FROM s
""",
    description=(
        "[EXT] exact Brier score (mean squared probability error) for "
        "the score/label stream: p = cents/50000 on a fixed grid, so "
        "each residual (cents - y*50000) is an int64, squared "
        "residuals sum EXACTLY, and the score is two divisions at the "
        "end — the calibration-error companion to ml_auc_exact "
        "(ranking) and ml_calibration_bins (reliability curve). One "
        "map-side-combined aggregation; two int64 counters at any "
        "corpus size. Max |residual| = 5e4, squared 2.5e9: an int64 "
        "sum wraps only past ~3.7e9 rows — at that scale switch the "
        "accumulator to decimal(38,0) as gram_matrix does."
    ),
)
def ml_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    resid = cents - y * BRIER_SCALE
    return ev.filter(F.col("value").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(resid * resid).cast("long").alias("sq_err_scaled"),
        (
            F.sum(resid * resid).cast("double")
            / F.count(F.lit(1))
            / (float(BRIER_SCALE) * float(BRIER_SCALE))
        ).alias("brier"),
    )


@register(
    "events_dau_wau_stickiness",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM ud),
dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1
),
cover AS (
  SELECT DISTINCT ud.user_id, days.day
  FROM ud JOIN days
    ON days.day >= ud.day AND days.day <= ud.day + INTERVAL 6 DAY
),
wau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM cover GROUP BY 1
)
SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
FROM dau JOIN wau USING (day)
""",
    description=(
        "[EXT] DAU/WAU stickiness per day — the product-analytics "
        "engagement ratio, computed EXACTLY (no HLL): WAU(d) = "
        "distinct users active in [d-6, d] via the bounded covering "
        "expansion — each (user, day) activity row covers at most 7 "
        "report days, so the 'sliding distinct' that resists window "
        "functions becomes a x7-bounded self-join + exact distinct "
        "count. Scale: the expansion is 7x the DISTINCT (user, day) "
        "frame (already radically smaller than the event stream), "
        "shuffles on day; counts int64, ratio one division. The "
        "running-distinct machinery (events_running_distinct_users) "
        "covers the unbounded-prefix form; this is the bounded-window "
        "form every dashboard actually wants."
    ),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    # covering expansion as a MAP-SIDE explode (each activity day emits
    # its 7 covering report days) — the non-equi range-join formulation
    # compiles to a broadcast nested loop, O(|activity| x |days|)
    # comparisons, which is the quadratic trap at corpus scale; the
    # explode is exactly 7x the activity frame with no join at all.
    # Report days with no activity of their own drop out at the final
    # inner join with dau (matching the oracle, which only counts
    # observed activity days).
    cover = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("day"),
        )
        .distinct()
    )
    wau = cover.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@register(
    "events_time_to_convert_quantiles",
    oracle="""
WITH first_signup AS (
  SELECT user_id, MIN(ts) AS su_ts FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
first_purchase_after AS (
  SELECT f.user_id,
         MIN(e.ts) AS pu_ts
  FROM first_signup f JOIN events e
    ON e.user_id = f.user_id AND e.event_type = 'purchase' AND e.ts >= f.su_ts
  GROUP BY 1
),
dur AS (
  SELECT f.user_id,
         CAST(epoch_us(p.pu_ts) - epoch_us(f.su_ts) AS BIGINT) // 1000000
           AS secs
  FROM first_signup f JOIN first_purchase_after p USING (user_id)
),
cum AS (
  SELECT secs, CAST(COUNT(*) AS BIGINT) AS nn FROM dur GROUP BY 1
),
c2 AS (
  SELECT secs, CAST(SUM(nn) OVER (ORDER BY secs) AS BIGINT) AS cum_n FROM cum
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dur)
SELECT tot.n AS n_converted,
       MIN(CASE WHEN c2.cum_n * 2 >= tot.n THEN c2.secs END) AS p50_secs,
       MIN(CASE WHEN c2.cum_n * 10 >= tot.n * 9 THEN c2.secs END) AS p90_secs
FROM c2 CROSS JOIN tot
GROUP BY tot.n
""",
    description=(
        "[EXT] funnel time-to-convert quantiles: per user, the gap "
        "from first signup to first subsequent purchase; p50/p90 of "
        "those durations selected EXACTLY by the cumulative-count "
        "integer predicate over the distinct-seconds grid — the "
        "composition that shows the order-statistic machinery "
        "consuming a derived (joined, windowed) measure rather than a "
        "raw column. Durations are exact integer seconds (epoch "
        "microsecond subtraction, one integer division); conversion "
        "counts int64. The cumulative pass runs through operators/"
        "order_stats (day-sized duration shards), NOT a global "
        "single-partition window — the distinct-duration grid is "
        "user-count-sized, so the unsharded form would hit the "
        "one-reducer trap at scale."
    ),
)
def events_time_to_convert_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timeutil import to_ltz

    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("su_ts"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("su_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pu_ts"), F.min("su_ts").alias("su_ts"))
    )
    dur = pu.select(
        (
            F.unix_micros(to_ltz(F.col("pu_ts")))
            - F.unix_micros(to_ltz(F.col("su_ts")))
        ).alias("us")
    ).select(
        F.lit(1).alias("__all"), F.expr("us div 1000000").alias("secs")
    )
    # day-sized shards: durations span ~a year of seconds, so the
    # shard-offset frame is bounded by ~365 rows regardless of users
    q = grouped_exact_quantiles(
        dur,
        "__all",
        cents_col="secs",
        quantiles=(("p50", 1, 2), ("p90", 9, 10)),
        shard_size=86_400,
    )
    return q.select(
        F.col("n_rows").alias("n_converted"),
        F.col("p50_cents").alias("p50_secs"),
        F.col("p90_cents").alias("p90_secs"),
    )


@register(
    "agg_exact_moments_by_flag",
    oracle="""
WITH s AS (
  SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(c) AS BIGINT) AS sum_cents,
       CAST(SUM(c) AS DOUBLE) / 100.0 / COUNT(*) AS mean_value,
       CAST(CAST(COUNT(*) AS HUGEINT) * CAST(SUM(c * c) AS HUGEINT)
            - CAST(SUM(c) AS HUGEINT) * CAST(SUM(c) AS HUGEINT) AS DOUBLE)
         / COUNT(*) / COUNT(*) / 10000.0 AS variance
FROM s GROUP BY 1
""",
    description=(
        "[EXT] grouped exact moments: count, exact-cents sum, mean "
        "and POPULATION variance per return flag from one pass of "
        "int64/decimal sufficient statistics — var = (n*SS - S^2)/n^2 "
        "with SS accumulated exactly (decimal(38,0): c^2 reaches "
        "~1e14, summed past int64 at real scale), so the variance is "
        "a fixed tree of correctly-rounded IEEE ops over identical "
        "integers. The grouped companion of the global "
        "agg_exact_moments; feeds z-scoring and drift monitors "
        "without a second scan."
    ),
)
def agg_exact_moments_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    c = F.round(F.col("l_extendedprice") * 100).cast("long")
    cd = c.cast("decimal(38,0)")
    return (
        li.select("l_returnflag", c.alias("c"), (cd * cd).alias("c2"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("c").cast("long").alias("sum_cents"),
            (
                F.sum("c").cast("double") / 100.0 / F.count(F.lit(1))
            ).alias("mean_value"),
            (
                (
                    F.count(F.lit(1)).cast("decimal(38,0)") * F.sum("c2")
                    - F.sum("c").cast("decimal(38,0)")
                    * F.sum("c").cast("decimal(38,0)")
                )
                .cast("double")
                / F.count(F.lit(1))
                / F.count(F.lit(1))
                / 10000.0
            ).alias("variance"),
        )
    )


# -- pinball (quantile) loss, exact (r9) ---------------------------------

PINBALL_TAUS_X10 = (5, 9)  # tau = 0.5, 0.9 on the exact 1/10 grid


def _pinball_oracle(taus_x10) -> str:
    blocks = []
    for t10 in taus_x10:
        blocks.append(
            f"""
SELECT {t10} / 10.0 AS tau,
       (SELECT MIN(c) FROM cum WHERE 10 * cn >= {t10} * (SELECT n FROM tot))
         / 100.0 AS quantile_pred,
       (SELECT CAST(SUM(CASE WHEN s.c > q.qc
                             THEN {t10} * (s.c - q.qc)
                             ELSE ({10 - t10}) * (q.qc - s.c) END) AS DOUBLE)
          / (SELECT n FROM tot) / 1000.0
        FROM s CROSS JOIN (
          SELECT MIN(c) AS qc FROM cum
          WHERE 10 * cn >= {t10} * (SELECT n FROM tot)) q)
         AS mean_pinball
FROM (SELECT 1)"""
        )
    return (
        """
WITH s AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY 1),
cum AS (
  SELECT c, SUM(n) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cn
  FROM hist
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s)
SELECT * FROM ("""
        + "\nUNION ALL".join(blocks)
        + ")"
    )


@register(
    "ml_pinball_loss",
    oracle=_pinball_oracle(PINBALL_TAUS_X10),
    description=(
        "[EXT] exact pinball (quantile) loss at tau = 0.5 and 0.9 — "
        "the metric that scores a quantile forecast the way MSE scores "
        "a mean forecast, completing the evaluation shelf (AUC, "
        "calibration, Brier, PR curve). The predictor is the exact "
        "type-1 tau-quantile selected by the integer predicate "
        "10·cum >= 10tau·n over the distinct-cents histogram (bounded "
        "by the value RANGE, the ml_auc_exact shape — never a global "
        "row sort), and the loss sums int64 cent residuals weighted "
        "by 10tau / 10(1-tau), exact at any row count, with two final "
        "divisions. One histogram pass serves every tau."
    ),
)
def ml_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("value").isNotNull()).select(
        F.round(F.col("value") * 100).cast("long").alias("c")
    )
    hist = s.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("c", F.sum("n").over(w).alias("cn"))
    tot = s.agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = None
    for t10 in PINBALL_TAUS_X10:
        pred = (
            cum.crossJoin(F.broadcast(tot))
            .filter(10 * F.col("cn") >= t10 * F.col("n"))
            .agg(F.min("c").alias("qc"))
        )
        row = (
            s.crossJoin(F.broadcast(pred))
            .crossJoin(F.broadcast(tot))
            .agg(
                F.lit(t10 / 10.0).alias("tau"),
                F.first(F.col("qc") / 100.0).alias("quantile_pred"),
                (
                    F.sum(
                        F.when(
                            F.col("c") > F.col("qc"),
                            t10 * (F.col("c") - F.col("qc")),
                        ).otherwise(
                            (10 - t10) * (F.col("qc") - F.col("c"))
                        )
                    ).cast("double")
                    / F.first("n")
                    / 1000.0
                ).alias("mean_pinball"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "ml_average_precision",
    oracle="""
WITH scored AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
  WHERE value IS NOT NULL
),
hist AS (
  SELECT s, CAST(SUM(y) AS BIGINT) AS p, CAST(SUM(1 - y) AS BIGINT) AS n
  FROM scored GROUP BY 1
),
cum AS (
  SELECT s,
         CAST(SUM(p) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
         CAST(SUM(n) OVER (ORDER BY s DESC) AS BIGINT) AS fp,
         CAST(COALESCE(SUM(p) OVER (ORDER BY s DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tp_prev
  FROM hist
),
tot AS (SELECT CAST(SUM(p) AS BIGINT) AS pp FROM hist),
terms AS (
  SELECT CAST(floor(((tp - tp_prev) * 1000000)
                    * (CAST(tp AS DOUBLE) / (tp + fp))) AS BIGINT) AS t
  FROM cum
)
SELECT tot.pp,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hist) AS n_thresholds,
       (SELECT CAST(SUM(t) AS DOUBLE) FROM terms) / 1000000.0 / tot.pp
         AS average_precision
FROM tot
""",
    description=(
        "[EXT] exact average precision (step-wise area under the PR "
        "curve, the sklearn AP definition): AP = sum over descending "
        "thresholds of delta-recall x precision, computed on the same "
        "cent-grid histogram as ml_pr_curve_topf1 (bounded by the "
        "value RANGE, not rows) — the single-number PR summary that "
        "completes the shelf alongside exact ROC-AUC. Exactness: each "
        "term is (delta-tp x 1e6), an exact int, times one "
        "correctly-rounded precision division, floored onto the 1e-6 "
        "grid BEFORE the int64 sum, so the total is order-independent "
        "(float accumulation over thresholds would not be); one "
        "division by pp at the end. Same scored-rows-only semantics "
        "as the PR curve (NULL scores excluded, documented there)."
    ),
)
def ml_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    scored = ev.filter(F.col("value").isNotNull()).select(
        F.round(F.col("value") * 100).cast("long").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    hist = scored.groupBy("s").agg(
        F.sum("y").cast("long").alias("p"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("n"),
    )
    w = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wprev = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        F.sum("p").over(w).cast("long").alias("tp"),
        F.sum("n").over(w).cast("long").alias("fp"),
        F.coalesce(F.sum("p").over(wprev), F.lit(0))
        .cast("long")
        .alias("tp_prev"),
    )
    term = F.floor(
        ((F.col("tp") - F.col("tp_prev")) * 1_000_000)
        * (F.col("tp").cast("double") / (F.col("tp") + F.col("fp")))
    ).cast("long")
    ap_scaled = cum.agg(F.sum(term).alias("t"))
    pp = hist.agg(F.sum("p").cast("long").alias("pp"))
    nthr = hist.agg(F.count(F.lit(1)).cast("long").alias("n_thresholds"))
    return (
        pp.crossJoin(F.broadcast(nthr))
        .crossJoin(F.broadcast(ap_scaled))
        .select(
            "pp",
            "n_thresholds",
            (
                F.col("t").cast("double") / 1_000_000.0 / F.col("pp")
            ).alias("average_precision"),
        )
    )


@register(
    "sort_skyline_parts",
    oracle="""
SELECT p.p_partkey, CAST(p.p_retailprice AS DOUBLE) AS retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
""",
    description=(
        "2D skyline (Pareto frontier) of part under (minimize "
        "retailprice, maximize size): the multi-objective shortlist "
        "query. Spark side is the O(n log n) sort-based algorithm with "
        "sharded prefix-max windows (operators/skyline.py) — one "
        "data-sized groupBy, no self-join; the oracle states the "
        "textbook quadratic NOT EXISTS dominance, so the hash match "
        "proves the sort-based plan computes the same frontier."
    ),
)
def sort_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skyline import skyline_2d

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        "p_size",
    )
    return skyline_2d(
        part, "price_cents", "p_size", shard_size=PRICE_SHARD
    ).select(
        "p_partkey",
        (F.col("price_cents").cast("double") / 100.0).alias("retailprice"),
        "p_size",
    )
