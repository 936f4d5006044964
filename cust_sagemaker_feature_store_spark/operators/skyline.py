"""2D skyline (Pareto frontier) via the sharded prefix MAX.

The skyline of a relation under (minimize x, maximize y) is the set of
rows not dominated by any other row (another row with x' <= x and
y' >= y, strict in at least one). The textbook formulation is a
quadratic NOT EXISTS self-join — the DuckDB oracle states it that way
— but the 2D case has a classic O(n log n) sort-based algorithm: a row
is on the frontier iff its y strictly exceeds the best y seen at any
STRICTLY smaller x (and it attains the best y at its own x).

This module implements that algorithm with the same sharded-window
discipline as operators/order_stats.py: the prefix max over ascending
x runs in a window partitioned by a VALUE-RANGE shard of x plus a
per-shard offset frame whose size is x_range/shard_size — independent
of the row count — so no window ever sees an unbounded partition and
the operator survives 100 TB. Total cost: one groupBy on x (the only
data-sized shuffle, with map-side combine), two bounded windows, one
join back to the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    shard_size: int = 1_000_000,
) -> DataFrame:
    """Rows of `df` on the (minimize x, maximize y) Pareto frontier.

    `x_col` must be integer-valued (scale decimals to cents first —
    the registry's exactness discipline); `y_col` any orderable
    numeric. Dominance is non-strict in both coordinates with strict
    inequality in at least one, so duplicate (x, y) points are all on
    the frontier together or not at all — matching the NOT EXISTS
    oracle bit-for-bit.

    NULL coordinates (ADVICE r10 #3): under the NOT EXISTS contract a
    row with NULL x or y is incomparable to everything — every
    dominance predicate evaluates to unknown — so it is always on the
    frontier and never dominates. The former implementation silently
    DROPPED such rows (F.max skips NULLs and the equality join back
    never matches NULL); they are now split off up front and passed
    through, and they never enter the best-y aggregation.
    """
    null_rows = df.filter(F.col(x_col).isNull() | F.col(y_col).isNull())
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    # best y at each distinct x — the only data-sized shuffle
    pv = df.groupBy(F.col(x_col).alias("__x")).agg(
        F.max(F.col(y_col)).alias("__best")
    )
    pv = pv.withColumn("__shard", F.expr(f"__x div {shard_size}"))
    # strict prefix max within shard: everything at smaller x, same shard
    w_in = (
        Window.partitionBy("__shard")
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = pv.withColumn("__pm_in", F.max("__best").over(w_in))
    # per-shard offset: max over all strictly earlier shards — a frame
    # of x_range/shard_size rows, independent of |df|
    shard_best = pv.groupBy("__shard").agg(F.max("__best").alias("__sb"))
    w_sh = (
        Window.orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = shard_best.select(
        "__shard", F.max("__sb").over(w_sh).alias("__pm_off")
    )
    frontier_x = (
        within.join(offsets, "__shard")
        .withColumn(
            "__pm", F.greatest(F.col("__pm_in"), F.col("__pm_off"))
        )
        .filter(F.col("__pm").isNull() | (F.col("__best") > F.col("__pm")))
        .select("__x", "__best")
    )
    # keep input rows attaining the best y at a frontier x; AQE picks
    # broadcast for the (frontier-sized) right side
    frontier = df.join(
        frontier_x,
        (F.col(x_col) == F.col("__x")) & (F.col(y_col) == F.col("__best")),
    ).drop("__x", "__best")
    # incomparable NULL-coordinate rows rejoin the frontier (see note)
    return frontier.unionByName(null_rows)
