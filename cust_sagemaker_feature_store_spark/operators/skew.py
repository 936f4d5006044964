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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi join: salt-replicate the small side.

    The big (skewed) side gets a uniform random salt per row; the small
    side is replicated once per salt value, so each (key, salt) bucket
    joins in its own task — a hot key's rows spread over `n_salts`
    reducers instead of one. Join semantics are unchanged (asserted
    equal to the direct join in tests): every big row sees exactly one
    replica of its key's small rows. Shuffle cost: |small| * n_salts
    extra rows — the standard trade for unsticking a hot key when AQE's
    runtime splitting isn't available or the skew is in a groupBy-free
    join. `how` must keep the big side on the preserved side ('inner'
    or 'left')."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves the big side: use 'inner' or 'left'")
    keys = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    small_s = small.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt"),
    )
    return big_s.join(small_s, keys + ["__salt"], how).drop("__salt")
