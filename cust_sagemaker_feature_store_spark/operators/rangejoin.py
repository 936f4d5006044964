"""Keyless time-tolerance join (SURVEY.md §2.3 [EXT]).

`range_join_event_followups` covers the common interval join that has
an equi key (user_id) to hash on; this operator covers the harder case
with NO equi key — "every pair of rows within `tol` of each other,
across the whole table" — where a naive theta join degenerates to a
cross product with a residual filter (O(n²) pairs examined however few
match).

The standard distributed rewrite (the same bucketing Structured
Streaming's interval join state uses): bucket both sides on
floor(t / tol). Any pair with |t_l - t_r| <= tol sits in the same or
an adjacent bucket, so replicating ONE side to its three adjacent
bucket ids turns the theta join into an equi join on the bucket key
plus an exact residual filter. Cost: 3x replication of one side and a
hash shuffle — pairs examined shrink from |L|·|R| to the pairs inside
co-located buckets, which is what bounds the work when timestamps are
spread (the dense-bucket worst case is inherent to the problem: those
pairs are real output candidates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start_us: Column,
    l_end_us: Column,
    r_start_us: Column,
    r_end_us: Column,
    bucket_us: int,
) -> DataFrame:
    """Inner-join interval pairs that OVERLAP — half-open semantics:
    l_start < r_end AND r_start < l_end — with NO nested-loop plan:
    both sides explode into the `bucket_us`-wide buckets their interval
    covers, the join is hash-equi on the bucket id, and the residual
    predicate restores exactness. Duplicate elimination is free — a
    pair is kept only in its CANONICAL bucket, the bucket of
    max(l_start, r_start), which both expansions necessarily cover
    when the intervals overlap, so no distinct pass and no
    multiplicity bugs.

    Replication per row is ceil(span / bucket_us) + 1: pick `bucket_us`
    near the typical span so expansion stays O(1) per row (Spark's
    sequence() hard-caps elements, so a pathological span fails loudly
    rather than exploding). The same bucketing Structured Streaming's
    interval-join state manager uses, applied batch-side. Column names
    must be disjoint between the two sides; start/end Columns are
    integer microseconds over the respective frames."""
    if bucket_us <= 0:
        raise ValueError("interval_overlap_join needs bucket_us > 0")

    def bucket(col: str) -> Column:
        # exact int64 floor division (see time_tolerance_join)
        return F.expr(f"({col} - pmod({col}, {bucket_us})) div {bucket_us}")

    l = (
        left.withColumn("__ls", l_start_us)
        .withColumn("__le", l_end_us)
        .withColumn(
            "__b",
            F.explode(F.sequence(bucket("__ls"), bucket("__le"))),
        )
    )
    r = (
        right.withColumn("__rs", r_start_us)
        .withColumn("__re", r_end_us)
        .withColumn(
            "__b",
            F.explode(F.sequence(bucket("__rs"), bucket("__re"))),
        )
    )
    joined = l.join(r, "__b").filter(
        (F.col("__ls") < F.col("__re"))
        & (F.col("__rs") < F.col("__le"))
        & (
            F.col("__b")
            == F.expr(
                "(greatest(__ls, __rs) - pmod(greatest(__ls, __rs), "
                f"{bucket_us})) div {bucket_us}"
            )
        )
    )
    return joined.drop("__b", "__ls", "__le", "__rs", "__re")


def time_tolerance_join(
    left: DataFrame,
    right: DataFrame,
    left_us: Column,
    right_us: Column,
    tol_us: int,
) -> DataFrame:
    """Inner-join rows with |left_us - right_us| <= tol_us, no equi key.

    `left_us` / `right_us` are integer-microsecond Columns over the
    respective frames. Returns left.* + right.* with helper columns
    dropped; callers filter/aggregate the joined frame. Column names
    must be disjoint between the two sides.
    """
    if tol_us <= 0:
        raise ValueError("time_tolerance_join needs tol_us > 0")

    def bucket(col: str) -> F.Column:
        # Exact int64 floor division (ADVICE r5): floor(col / tol)
        # evaluated as long/long division goes through a double, whose
        # 53-bit mantissa can mis-bucket values approaching 2^53 and
        # silently drop boundary pairs. (col - pmod(col, tol)) is an
        # exact multiple of tol (pmod is non-negative, so this IS the
        # floor), and integer `div` of an exact multiple is exact — no
        # magnitude assumption anywhere in int64 range.
        return F.expr(f"({col} - pmod({col}, {tol_us})) div {tol_us}")

    l = left.withColumn("__lus", left_us).withColumn("__b", bucket("__lus"))
    r = (
        right.withColumn("__rus", right_us)
        .withColumn(
            "__b",
            F.explode(
                F.array(
                    bucket("__rus") - 1,
                    bucket("__rus"),
                    bucket("__rus") + 1,
                )
            ),
        )
    )
    joined = l.join(r, "__b").filter(
        F.abs(F.col("__lus") - F.col("__rus")) <= F.lit(tol_us)
    )
    return joined.drop("__b", "__lus", "__rus")
