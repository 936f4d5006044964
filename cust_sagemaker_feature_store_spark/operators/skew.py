"""Skew mitigation (SURVEY.md §4, BASELINE scale contract).

AQE's skew-join splitting handles most hot-key cases at runtime, but
two patterns still need explicit salting at 100 TB:

- a groupBy whose key distribution is pathological (one key = half the
  table) overwhelms a single reducer even after AQE coalescing;
- a shuffle join against a hot key set where the small side can be
  replicated per salt.

`salted_agg` implements the classic two-phase aggregate: append a
random salt to the key, partially aggregate (n_salts-way fan-out of the
hot key), then aggregate the partials. Works for any algebraic
aggregate expressed as (partial, merge) pairs; exposed here for
count/sum since those cover the feature-engineering hot paths. The
result is exactly the direct aggregation (asserted in tests) — salting
changes the physical distribution only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    sum_exprs: dict[str, Column] | None = None,
    count_alias: str = "n",
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy: count(*) plus exact integer sums.

    sum_exprs maps output name -> a *long* Column to sum (use the dsum
    scale-to-int64 discipline before calling for decimal data).
    """
    sum_exprs = sum_exprs or {}
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__pn"),
        *[F.sum(c).alias(f"__ps_{name}") for name, c in sum_exprs.items()],
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__pn").alias(count_alias),
        *[F.sum(f"__ps_{name}").alias(name) for name in sum_exprs],
    )
