"""Semi-join scan reduction — explicit runtime filters for star joins
(SURVEY.md §2.3 [EXT]; the dynamic-filter / semi-join-reduction lever
of Trino, Snowflake, and Spark's own runtime bloom filter, applied
where Catalyst does NOT apply it).

The star-schema pattern: a tiny filtered dimension (customers in one
region, parts of one brand) gates a huge fact scan. A broadcast hash
join already avoids shuffling the fact side — but it still READS the
whole fact table; the filter is applied post-scan by the join
operator. Spark's automatic runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) targets shuffle
exchanges and injects a non-sargable bloom probe, so in the
broadcast-star layout it does not fire, and it can never reach parquet
row-group pruning either way.

`runtime_filtered_semi_join` closes that gap with the classic
two-regime design:

- **IN-list regime** (dimension key set <= ``max_in_keys``): collect
  the distinct keys (one bounded job on the *dimension* side — driver
  cost is capped by the threshold, never corpus-proportional) and
  rewrite the semi join as ``fact_key IN (...)``. The predicate is
  sargable: it reaches the parquet reader as a PushedFilter, prunes
  row groups by min/max stats and rows by dictionary pages, and the
  join disappears from the plan entirely.
- **Range + semi regime** (key set too large to inline): push only the
  sargable envelope ``fact_key BETWEEN min AND max`` (two scalars,
  regardless of key count) into the scan, then keep an exact semi join
  for the residual. Surrogate-key dimensions are typically
  range-clustered, so the envelope alone often prunes most files; the
  semi join guarantees exactness.

Both regimes preserve exact semi-join semantics (the IN list IS the
full key set, not an approximation), so the same oracle pins either
plan. At 100 TB the win scales with fact size: the bytes a scan never
reads are the cheapest bytes in the system.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_IN_KEYS = 10_000
"""Default IN-list cutoff. ~10k literals keeps plan size and driver
memory trivial (KBs) while covering filtered dimensions far beyond
typical selectivity; past it, two scalars (min/max) are pushed
instead."""


def runtime_filtered_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_key: str | None = None,
    max_in_keys: int = MAX_IN_KEYS,
) -> DataFrame:
    """Rows of ``fact`` whose ``fact_key`` appears in ``dim[key]`` —
    exact ``LEFT SEMI`` semantics, planned so the dimension's
    selectivity reaches the fact table's parquet scan (see module
    docstring for the two regimes)."""
    fact_key = fact_key or key
    keys_df = dim.select(key).distinct()
    probe = keys_df.limit(max_in_keys + 1).collect()
    if len(probe) <= max_in_keys:
        in_list = [r[0] for r in probe]
        return fact.filter(F.col(fact_key).isin(in_list))
    lo, hi = keys_df.agg(F.min(key), F.max(key)).head()
    return fact.filter(F.col(fact_key).between(F.lit(lo), F.lit(hi))).join(
        keys_df.withColumnRenamed(key, fact_key), fact_key, "left_semi"
    )
