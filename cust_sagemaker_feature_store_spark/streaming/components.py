"""Streaming maintenance of the dup-cluster LABEL STORE — the third
leg of the incremental dedup story. StreamingDedupIndex keeps the
hash/band indexes current (who collides), incremental_components
folds a batch of candidate pairs into component labels (who merges);
this module runs that fold under a PAIR stream against a persisted,
bucket-partitioned (node, label) store, so the corpus's dup-cluster
state is always serving-fresh without ever re-contracting the full
graph.

Store layout: parquet partitioned by bucket = pmod(xxhash64(node), n)
— the online-store shape (core/online.py). A micro-batch's merge can
relabel nodes in buckets its edges never touched (a component merge
propagates the new minimum to every member), so dirty buckets are
discovered from the UPDATE DIFF (rows whose label changed + new
nodes), not from the incoming keys; only those partitions are
rewritten (scratch write + dynamic partition overwrite, the
core/online.py discipline).

Replay safety needs no epoch stamp here: `incremental_components` is
IDEMPOTENT — re-applying a batch's edges to the already-updated store
maps both endpoints of every edge to the same label, the merge graph
is empty, and the diff is empty, so the replayed batch rewrites
nothing. The restart test pins this.

Scale story: per micro-batch the work is one hash join of the batch
edges against the label store, a component-sized star contraction,
and a rewrite of only the dirty buckets — O(batch + affected
components), never O(corpus). The full-recompute equality is oracled
by `dedup_incremental_components` (same math, batch form).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dup_clusters, incremental_components
from ._fsutil import (
    data_file_count,
    fs_delete,
    resolve,
    staged_swap,
    store_exists,
)


def _exists(spark: SparkSession, path: str) -> bool:
    # pointer-resolved: a store whose legacy dir was retired by a
    # vacuum publish still exists at its current version
    return store_exists(spark, path)


class StreamingComponentStore:
    """File-source streaming maintainer for a persisted component-label
    store; new candidate pairs stream in as parquet files of
    (src, dst) rows."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        store_dir: str,
        n_buckets: int = 8,
    ):
        self.spark = spark
        self.input_dir = input_dir
        self.store_dir = store_dir
        self.n_buckets = n_buckets
        self.checkpoint_dir = store_dir + "_checkpoint"

    def _bucketed(self, labels: DataFrame) -> DataFrame:
        return labels.withColumn(
            "bucket", F.pmod(F.xxhash64("node"), F.lit(self.n_buckets))
        )

    # -- micro-batch sink ---------------------------------------------------

    def process_batch(self, edges: DataFrame, batch_id: int) -> None:
        edges.persist()
        try:
            if not edges.take(1):
                return
            if not _exists(self.spark, self.store_dir):
                # bootstrap: full contraction of the first batch
                self._bucketed(dup_clusters(edges, "src", "dst")).write.partitionBy(
                    "bucket"
                ).mode("overwrite").parquet(self.store_dir, compression="snappy")
                return
            old = self.spark.read.parquet(resolve(self.spark, self.store_dir))
            updated = incremental_components(
                old.select("node", "label"), edges
            ).localCheckpoint(eager=True)  # feeds the diff AND the rewrite
            changed = (
                updated.join(
                    old.select("node", F.col("label").alias("__old")),
                    "node",
                    "left",
                )
                .filter(
                    F.col("__old").isNull() | (F.col("__old") != F.col("label"))
                )
            )
            dirty = [
                r["bucket"]
                for r in self._bucketed(changed.select("node", "label"))
                .select("bucket")
                .distinct()
                .collect()
            ]
            if not dirty:
                return  # replay of an already-applied batch, or all no-ops
            rows = self._bucketed(updated).filter(F.col("bucket").isin(dirty))
            scratch = self.store_dir + "__merge_scratch"
            rows.write.partitionBy("bucket").mode("overwrite").parquet(
                scratch, compression="snappy"
            )
            (
                # resolve: after a vacuum publishes an epoch-pointer
                # version, dirty-bucket rewrites land in the current
                # version directory, not the retired legacy path
                self.spark.read.parquet(scratch)
                .write.option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .mode("overwrite")
                .parquet(resolve(self.spark, self.store_dir), compression="snappy")
            )
        finally:
            edges.unpersist()

    # -- stream wiring ------------------------------------------------------

    def start(self, schema: str = "src long, dst long"):
        src = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.input_dir)
        )
        return (
            src.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def labels(self) -> DataFrame:
        return (
            self.spark.read.parquet(resolve(self.spark, self.store_dir))
            .select("node", "label")
        )


def vacuum_component_store(spark: SparkSession, store_dir: str) -> dict[str, int]:
    """Physical vacuum of the label store (r12 verdict next-round #6)
    — core/maintenance.compact_offline's role for the online-store
    bucket layout. The store never holds LOGICALLY stale rows: every
    dirty-bucket rewrite is a dynamic partition overwrite of the
    bucket's full fresh content, so merged-away labels are gone the
    moment their bucket rewrites (content equality before/after is
    the test's assertion). What a long-running stream DOES accumulate
    is physical debris: the ``__merge_scratch`` staging sibling left
    by the last micro-batch, and up to shuffle-partition-count small
    files per rewritten bucket. This pass deletes the scratch sibling
    and rewrites the store at one file per bucket (repartition on the
    bucket column — each bucket hashes to exactly one writer task),
    published through the epoch-pointer swap (_fsutil.staged_swap:
    readers keep the old version until the one atomic marker create;
    a crash at any point leaves a consistent store). Requires the
    single-writer, no-concurrent-reader window (stream stopped) for
    the retire phase, like every maintenance op here. Returns
    {"files_before", "files_after"} for the store's data files."""
    fs_delete(spark, store_dir + "__merge_scratch")
    before = data_file_count(spark, store_dir)
    staged = store_dir + ".__vacuum__"
    (
        spark.read.parquet(resolve(spark, store_dir))
        .repartition("bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(staged, compression="snappy")
    )
    staged_swap(spark, store_dir, staged)
    return {
        "files_before": before,
        "files_after": data_file_count(spark, store_dir),
    }
