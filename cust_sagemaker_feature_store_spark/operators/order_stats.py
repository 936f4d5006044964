"""Grouped exact order statistics via the sharded prefix sum.

The round-6 order-statistic queries (exact global/grouped median, KS,
Gini stump — queries/relational7_q.py) all instantiate one pattern:
cumulative counts over sorted distinct values computed with a window
partitioned by a VALUE-RANGE shard plus a broadcast per-shard offset
frame, so no window ever sees an unbounded partition. This module
lifts that pattern into a reusable operator and generalizes it from
the single median to ARBITRARY grouped quantile vectors (p50/p90/p99
in one pass — the SLO/latency report shape), plus the two classic
derived statistics: Tukey IQR fences and the trimmed mean.

Exactness discipline (queries/registry.py): values are int64 "cents"
on a fixed decimal grid; counts, ranks and partial sums are int64;
each output statistic performs at most one final correctly-rounded
division — so DuckDB and the JVM agree bit-for-bit.

Quantile definition: type-1 (inverse CDF) — Q(p) = the smallest value
v whose cumulative count reaches ceil(p·n). For p = num/den the
selection predicate is the pure-integer `den·cum_n >= num·n`
(cum_n >= p·n ⟺ cum_n >= ceil(p·n) for integer cum_n), which both
engines evaluate without any floating point.

Scale shape (identical to the r6 queries it generalizes): one groupBy
over (group, value) — the only data-sized shuffle; a window
partitioned by (group, value-range shard); a join of the
per-(group, shard) offset frame — |groups| × value_range/shard_size
rows, independent of the corpus row count; AQE broadcasts it while
small and shuffle-joins it at extreme group cardinality (no forced
hint) — then one final per-group aggregation. No single-partition
window ever touches more than the range-bounded shard-offset frame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (name, numerator, denominator) — p50/p90/p99, the latency-report vector
DEFAULT_QUANTILES: tuple[tuple[str, int, int], ...] = (
    ("p50", 1, 2),
    ("p90", 9, 10),
    ("p99", 99, 100),
)


def _mass_expr(weight_col: str | None):
    """The row-mass aggregate: COUNT(*) unweighted, SUM(weight) with
    `weight_col` — where each weight is validated STRICTLY POSITIVE
    in the aggregate's input expression (ADVICE r7 #4: a zero or
    negative weight silently breaks the cum_n monotonicity every
    selection predicate relies on, turning an exactness guarantee
    into a wrong answer). The check lives INSIDE the mass expression
    — not a droppable assert column Catalyst could prune — so any
    invalid weight (NULL included) fails the job loudly at the first
    aggregation instead of returning wrong quantiles. Cost: one
    per-row conditional on the weighted path only."""
    if weight_col is None:
        return F.count(F.lit(1)).cast("long")
    w = F.col(weight_col)
    checked = F.when(w > 0, w).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"order_stats: weight_col {weight_col!r} must be "
                    "strictly positive (cum_n monotonicity); got "
                ),
                F.coalesce(w.cast("string"), F.lit("NULL")),
            )
        )
    )
    return F.sum(checked).cast("long")


def grouped_cumulative_counts(
    df: DataFrame,
    group_col: str,
    cents_col: str = "cents",
    shard_size: int = 1_000_000,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-(group, distinct value) rows with exact running totals.

    Input: any frame with `group_col` and an int64 `cents_col` (plus,
    optionally, an int64 `weight_col` — each row then counts for its
    weight, turning every downstream statistic into its WEIGHTED
    form; weights MUST be strictly positive — enforced at execution
    time, see _mass_expr).
    Output: (group, cents, nn, cum_n) — nn the value's count (or
    weight mass) in the group, cum_n the running total over ascending
    cents within the group.

    The cumulative sums run in a window partitioned by
    (group, cents div shard_size) — parallel across shards — with the
    per-(group, shard) offsets computed over a frame bounded by
    |groups| × value_range/shard_size rows (range-bounded per group,
    NOT data-bounded), the invariant that makes the pattern safe at
    100 TB — joined back without a broadcast hint so AQE picks the
    strategy by the frame's actual size.
    """
    mass = _mass_expr(weight_col)
    pv = df.groupBy(
        F.col(group_col).alias("__g"), F.col(cents_col).alias("cents")
    ).agg(mass.alias("nn"))
    pv = pv.withColumn("__shard", F.expr(f"cents div {shard_size}"))
    w_in = (
        Window.partitionBy("__g", "__shard")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = pv.withColumn("__cn", F.sum("nn").over(w_in))
    shard_tot = pv.groupBy("__g", "__shard").agg(F.sum("nn").alias("__sn"))
    w_sh = (
        Window.partitionBy("__g")
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = shard_tot.select(
        "__g",
        "__shard",
        (F.sum("__sn").over(w_sh) - F.col("__sn")).alias("__on"),
    )
    # no broadcast HINT: the offset frame is |groups| x shards rows —
    # tiny for range-bounded shards over few groups (AQE broadcasts it
    # anyway), but a FORCED broadcast would break at extreme group
    # cardinality (1e8 user-level groups), where a shuffle join on the
    # (group, shard) key is the right plan and AQE picks it.
    return within.join(offsets, ["__g", "__shard"]).select(
        F.col("__g").alias(group_col),
        "cents",
        "nn",
        (F.col("__cn") + F.col("__on")).cast("long").alias("cum_n"),
    )


def grouped_exact_quantiles(
    df: DataFrame,
    group_col: str,
    cents_col: str = "cents",
    quantiles: Sequence[tuple[str, int, int]] = DEFAULT_QUANTILES,
    shard_size: int = 1_000_000,
    weight_col: str | None = None,
) -> DataFrame:
    """One row per group with the EXACT type-1 quantile vector — every
    requested quantile selected from ONE cumulative-count pass (no
    per-quantile rescans, no approx-percentile sketch error). With
    `weight_col`, the WEIGHTED quantile: the smallest value whose
    cumulative weight reaches p · total_weight (n_rows then reports
    total mass, and the integer selection predicate is unchanged).

    Returns (group, n_rows, {name}_cents ...) with each quantile as the
    int64 cents value; callers divide back to the decimal grid once.
    """
    for name, num, den in quantiles:
        if not (0 < num <= den):
            raise ValueError(f"quantile {name}: need 0 < {num}/{den} <= 1")
    cum = grouped_cumulative_counts(
        df, group_col, cents_col, shard_size, weight_col
    )
    mass = _mass_expr(weight_col)
    tot = (
        df.groupBy(F.col(group_col).alias(group_col))
        .agg(mass.alias("n_rows"))
    )
    j = cum.join(tot, group_col)  # group-count-sized: AQE picks the join
    sel = [
        F.min(
            F.when(
                F.col("cum_n") * den >= F.col("n_rows") * num, F.col("cents")
            )
        ).alias(f"{name}_cents")
        for name, num, den in quantiles
    ]
    return j.groupBy(group_col, "n_rows").agg(*sel)


def grouped_iqr_fences(
    df: DataFrame,
    group_col: str,
    cents_col: str = "cents",
    shard_size: int = 1_000_000,
) -> DataFrame:
    """Tukey boxplot statistics per group, all integer-exact: quartiles
    (type-1), IQR, and the count of rows beyond the 1.5·IQR fences —
    the robust outlier-rate monitor. The half-cent 1.5·IQR products are
    kept exact by comparing at 2× scale (2·cents vs 2·q1 − 3·iqr), so
    no floating point enters the predicate.
    """
    cum = grouped_cumulative_counts(df, group_col, cents_col, shard_size)
    tot = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    j = cum.join(tot, group_col)  # group-count-sized: AQE picks the join
    quart = j.groupBy(group_col, "n_rows").agg(
        F.min(
            F.when(F.col("cum_n") * 4 >= F.col("n_rows"), F.col("cents"))
        ).alias("q1_cents"),
        F.min(
            F.when(F.col("cum_n") * 4 >= F.col("n_rows") * 3, F.col("cents"))
        ).alias("q3_cents"),
    ).withColumn("iqr_cents", F.col("q3_cents") - F.col("q1_cents"))
    # outlier count: join the per-group fence frame (|groups| rows)
    # back to the per-distinct-value counts and sum
    out = (
        cum.join(quart, group_col)
        .filter(
            (F.col("cents") * 2 < F.col("q1_cents") * 2 - F.col("iqr_cents") * 3)
            | (F.col("cents") * 2 > F.col("q3_cents") * 2 + F.col("iqr_cents") * 3)
        )
        .groupBy(group_col)
        .agg(F.sum("nn").cast("long").alias("n_outliers"))
    )
    return (
        quart.join(out, group_col, "left")
        .withColumn("n_outliers", F.coalesce("n_outliers", F.lit(0)).cast("long"))
    )


def grouped_trimmed_mean(
    df: DataFrame,
    group_col: str,
    cents_col: str = "cents",
    trim_num: int = 1,
    trim_den: int = 10,
    shard_size: int = 1_000_000,
) -> DataFrame:
    """Exact symmetric trimmed mean per group: drop the lowest and
    highest k = floor(n·trim) rows and average the rest — the robust
    location estimate that survives fat tails without the median's
    information loss.

    Each distinct value contributes `clamp(min(cum_n, n−k) −
    max(cum_n − nn, k), 0, nn)` copies to the kept mass — the pure
    integer overlap of its rank interval with [k, n−k) — so the kept
    sum is an exact int64 and the mean is one final division. Needs
    n > 2k; groups at or below the bound are dropped (their trimmed
    mean is undefined).
    """
    if not (0 <= trim_num * 2 < trim_den):
        raise ValueError("trim fraction must be in [0, 0.5)")
    cum = grouped_cumulative_counts(df, group_col, cents_col, shard_size)
    tot = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    k = F.expr(f"n_rows * {trim_num} div {trim_den}")
    j = cum.join(tot, group_col).withColumn("__k", k)
    kept = F.greatest(
        F.lit(0),
        F.least(F.col("cum_n"), F.col("n_rows") - F.col("__k"))
        - F.greatest(F.col("cum_n") - F.col("nn"), F.col("__k")),
    )
    return (
        j.filter(F.col("n_rows") > F.col("__k") * 2)
        .groupBy(group_col, "n_rows", "__k")
        .agg(F.sum(kept * F.col("cents")).cast("long").alias("kept_sum_cents"))
        .select(
            group_col,
            "n_rows",
            F.col("__k").cast("long").alias("n_trimmed_each_side"),
            "kept_sum_cents",
            (F.col("n_rows") - F.col("__k") * 2).cast("long").alias("n_kept"),
        )
    )
