"""Compute-parallelism spreading for Python-boundary stages.

A scan's task count follows the INPUT SPLIT layout, not the compute
cost of what runs above it: a single-file / single-row-group parquet
table scans as exactly one task, so an expensive mapInPandas placed
directly over it runs its whole decode loop on one core while the rest
of the cluster idles (optimization guide §4/§6 — split-size knobs
cannot subdivide one parquet row group).

``spread_for_compute`` hash-repartitions such a frame to the session's
default parallelism before the Python stage. It is only for NARROW
frames (ids/keys, a few bytes per row): the exchange then moves
metadata, never payloads — the guide §8 rule — so at cluster scale the
shuffle stays noise next to the decode work it balances, and when the
input already carries enough partitions (a real multi-split table) the
repartition is skipped outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition a narrow frame to ``defaultParallelism`` ahead of a
    compute-bound Python stage; no-op when it already has that many
    partitions. With ``cols``, partitioning is a deterministic hash of
    those columns (stable under task retry — guide §2.5); without, the
    round-robin form.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
