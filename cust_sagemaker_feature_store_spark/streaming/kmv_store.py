"""Streaming maintenance of per-group KMV distinct-count synopses.

`streaming/windows.hll_register_counters` keeps a GLOBAL cardinality
sketch as in-memory streaming-aggregation state; this module is its
PERSISTED, per-group counterpart: a file-source stream feeds a
foreachBatch sink that appends each micro-batch's own KMV minset
(operators/sketches.kmv_minset — the k smallest distinct md5-hash48
values per group, <= k rows per group per batch) to a parquet store.
The serving read merges the stored per-epoch minsets losslessly
(kmv_merge_minsets: the KMV merge theorem), so `serve()` answers
"distinct values per group, so far" from state that is bytes per
group — never a rescan of the stream's history.

Exactly-once discipline (the streaming/dedup_index.py epoch idiom):
every batch's minset is stamped with the micro-batch epoch (batch_id)
and written as a DYNAMIC PARTITION OVERWRITE of that epoch's
partition, so a checkpoint replay rewrites the identical partition
instead of duplicating rows — and because the per-batch minset is a
pure function of the batch's rows, the rewrite is bit-identical.

Scale story: per micro-batch the work is one bounded aggregation of
the batch (shuffle carries <= k hashes per group); the store grows by
<= k * groups rows per epoch until `compact_kmv_epochs` folds all
epochs back to <= k rows per group (lossless, same theorem). Serving
merges minsets whose total size is epochs * k * groups — bounded and
byte-sized, independent of stream length.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import kmv_estimate, kmv_merge_minsets, kmv_minset
from ._fsutil import read_or_empty, resolve, staged_swap


class StreamingKmvStore:
    """File-source streaming KMV-synopsis maintainer: per `group_col`
    group, the k smallest distinct hash48 values of `value_col`."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        store_root: str,
        group_col: str = "event_type",
        value_col: str = "user_id",
        k: int = 128,
    ):
        self.spark = spark
        self.input_dir = input_dir
        self.group_col = group_col
        self.value_col = value_col
        self.k = k
        self.minsets_dir = os.path.join(store_root, "minsets")
        self.checkpoint_dir = os.path.join(store_root, "_checkpoint")
        self._schema = f"{group_col} string, hv bigint, epoch bigint"

    # -- micro-batch sink ---------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        (
            kmv_minset(batch, [self.group_col], F.col(self.value_col), self.k)
            .select(
                self.group_col,
                "hv",
                F.lit(batch_id).cast("long").alias("epoch"),
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            # resolve: appends land in the current epoch-pointer
            # version after a compaction, not the retired legacy path
            .parquet(resolve(self.spark, self.minsets_dir), compression="snappy")
        )

    # -- stream wiring ------------------------------------------------------

    def start(self, schema: str = "event_id long, event_type string, user_id long"):
        src = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .csv(self.input_dir, header=True)
        )
        return (
            src.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    # -- serving read -------------------------------------------------------

    def minsets(self) -> DataFrame:
        return read_or_empty(self.spark, self.minsets_dir, self._schema)

    def serve(self) -> DataFrame:
        """Distinct-count synopsis per group over everything ingested:
        lossless merge of the stored per-epoch minsets, then the KMV
        estimate — (group, kth_hash, kmv_estimate, sketch_size)."""
        return kmv_estimate(
            kmv_merge_minsets(self.minsets(), [self.group_col], self.k),
            [self.group_col],
            self.k,
        )


def replay_kmv_epochs(
    df: DataFrame,
    epoch_col,
    group_cols: list[str],
    value_col,
    k: int = 128,
) -> DataFrame:
    """Batch twin of the maintainer + serve() read: per-(group, epoch)
    minsets merged per group — one declarative plan that states what
    the stream builds operationally. By the KMV merge theorem this
    EQUALS the direct minset over all rows, which is what lets the
    twin's oracle pin the store's serving arithmetic exactly."""
    tagged = df.withColumn("__epoch", epoch_col.cast("long"))
    return kmv_estimate(
        kmv_merge_minsets(
            kmv_minset(tagged, group_cols + ["__epoch"], value_col, k),
            group_cols,
            k,
        ),
        group_cols,
        k,
    )


def compact_kmv_epochs(
    spark: SparkSession,
    store_root: str,
    group_col: str = "event_type",
    k: int = 128,
) -> int:
    """Fold all stored epochs into one (the minimum present), re-cutting
    each group to its k smallest hashes — LOSSLESS for every future
    serve() by the merge theorem, and it keeps the store at <= k rows
    per group under a long-running stream. Same single-writer window
    and Hadoop-FS epoch-pointer publish discipline as
    compact_dedup_epochs / compact_ivf_epochs (MUST run only while the
    stream is stopped with no pending replay; the marker publish makes
    a crash at any point leave a consistent readable store — see
    _fsutil.staged_swap). Returns folded epochs beyond the first
    (0 = already compact)."""
    path = os.path.join(store_root, "minsets")
    schema = f"{group_col} string, hv bigint, epoch bigint"
    df = read_or_empty(spark, path, schema)
    epochs = [r["epoch"] for r in df.select("epoch").distinct().collect()]
    if len(epochs) <= 1:
        return 0
    base = min(epochs)
    staged = path + ".__compact__"
    (
        kmv_merge_minsets(df, [group_col], k)
        .select(group_col, "hv", F.lit(base).cast("long").alias("epoch"))
        .write.mode("overwrite")
        .partitionBy("epoch")
        .parquet(staged, compression="snappy")
    )
    staged_swap(spark, path, staged)
    return len(epochs) - 1
