"""Incremental aggregate maintenance (SURVEY.md §2.4 [EXT]).

A 100 TB feature pipeline cannot re-scan full history to refresh
per-key aggregates on every batch; it maintains ALGEBRAIC PARTIALS
(count / exact scaled sum / min / max) that merge associatively:

    partials(history ∪ batch) == merge(partials(history), partials(batch))

so a refresh costs O(batch + touched-key partials), never O(history) —
the aggregate-state analog of the online store's dirty-bucket MERGE
(`core/online.py`). Sums use the engine-wide exact-decimal discipline
(`queries/registry.dsum`): scale to int64, sum exactly, divide back
once — merge order can never perturb a result, which is what makes the
incremental path bit-identical to the direct one (asserted in tests and
by the `fs_incremental_agg` driver oracle).

Finalized means: count `n`, `sum_<col>`, `min_<col>`, `max_<col>`,
`avg_<col>` (= exact sum / n, one division).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_partials(
    df: DataFrame,
    key_cols: str | list[str],
    value_col: str,
    scale_decimals: int = 6,
) -> DataFrame:
    """Per-key mergeable partial state for one batch (map-side
    combinable: a plain partial-agg groupBy)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    scale = 10**scale_decimals
    scaled = F.round(F.col(value_col) * scale).cast("long")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(scaled).alias("__s"),
        F.min(value_col).alias("__mn"),
        F.max(value_col).alias("__mx"),
    )


def merge_partials(*partials: DataFrame) -> DataFrame:
    """Associative merge of any number of partial frames (same keys)."""
    keys = [c for c in partials[0].columns if not c.startswith("__")]
    u = reduce(lambda a, b: a.unionByName(b), partials)
    return u.groupBy(*keys).agg(
        F.sum("__n").alias("__n"),
        F.sum("__s").alias("__s"),
        F.min("__mn").alias("__mn"),
        F.max("__mx").alias("__mx"),
    )


def finalize_partials(
    partials: DataFrame, value_name: str, scale_decimals: int = 6
) -> DataFrame:
    keys = [c for c in partials.columns if not c.startswith("__")]
    scale = float(10**scale_decimals)
    total = F.col("__s") / scale
    return partials.select(
        *keys,
        F.col("__n").alias("n"),
        total.alias(f"sum_{value_name}"),
        F.col("__mn").alias(f"min_{value_name}"),
        F.col("__mx").alias(f"max_{value_name}"),
        (F.col("__s") / scale / F.col("__n")).alias(f"avg_{value_name}"),
    )


def incremental_join_refresh(
    materialized: DataFrame,
    a_base: DataFrame,
    a_delta: DataFrame,
    b_base: DataFrame,
    b_delta: DataFrame,
    on,  # column name(s) or a join Column expression
) -> DataFrame:
    """Incremental INNER-join view maintenance (classic delta rule):

        (A ∪ ΔA) ⋈ (B ∪ ΔB)
          == (A ⋈ B)  ∪  (ΔA ⋈ B)  ∪  (A ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)

    given the four join terms are disjoint in origin (append-only
    deltas; updates/deletes compose this with the tombstone MERGE of
    `core/online.py`). The refresh reads the MATERIALIZED view plus
    three joins whose probe side is a delta — O(Δ · matched rows),
    never a rescan of A ⋈ B. At 100 TB the delta sides are broadcast-
    or bucket-joined against the base tables' pruned partitions; the
    stored view itself is only appended to, exactly like the offline
    store. Every delta term is projected to the materialized view's
    column list before the union, so all four terms share one schema.
    """
    delta_terms = (
        a_delta.join(b_base, on),
        a_base.join(b_delta, on),
        a_delta.join(b_delta, on),
    )
    out = materialized
    for t in delta_terms:
        out = out.unionByName(t.select(*materialized.columns))
    return out
