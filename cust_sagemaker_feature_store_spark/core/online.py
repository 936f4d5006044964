"""Bucketed online-snapshot upsert: the keyed-MERGE shape on parquet.

BASELINE.json names the approach "DataFrame transformations +
Delta/Iceberg writes"; delta-spark is absent in this environment, so
this module implements the MERGE-keyed-upsert *shape* behind the same
interface (the documented gate, as with Avro): the online snapshot is
partitioned by a stable key-hash bucket, and an upsert

1. reduces the incoming batch to its per-key latest rows,
2. finds the buckets those keys hash into (the DIRTY buckets —
   collected driver-side; it is at most ``n_buckets`` small ints),
3. reads ONLY the dirty bucket partitions of the stored snapshot
   (partition pruning on the bucket directory column),
4. merges latest-wins per key, and
5. rewrites ONLY the dirty partitions via dynamic partition overwrite.

Work per refresh is O(batch + dirty-bucket rows), never O(snapshot) —
the full-snapshot recompute + write-then-swap it replaces re-read and
re-wrote the entire store per micro-batch (round-1 scale-killer,
VERDICT r1 perf §). With Delta/Iceberg available, steps 2-5 collapse
into ``MERGE INTO ... WHEN MATCHED``; semantics are identical.

The merged dirty slice takes a hop through a scratch directory before
the dynamic overwrite: Spark (correctly) refuses to overwrite a path
that is also a source of the running plan. That double-write touches
dirty buckets only, so the amplification is bounded by the batch's key
spread, not the snapshot.

Tombstones must be RETAINED in the snapshot (not filtered at write):
a deleted key's tombstone row is what outranks late-arriving older
records in future merges. Serving reads filter them out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.latest import latest_snapshot

BUCKET_COL = "bucket"
DEFAULT_N_BUCKETS = 64


def bucket_expr(keys: list[str], n_buckets: int) -> Column:
    """Stable key->bucket assignment (xxhash64, engine-deterministic)."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")


def upsert_bucketed_snapshot(
    spark: SparkSession,
    snapshot_dir: str,
    incoming: DataFrame,
    keys: list[str] | str,
    event_time_col: str,
    tie_breaker: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> None:
    """Merge ``incoming`` rows into the bucketed snapshot at
    ``snapshot_dir``, latest-wins per key on (event_time, tie).
    ``incoming`` must carry exactly the snapshot's data columns."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    inc_latest = latest_snapshot(
        incoming, key_list, event_time_col, tie_breaker
    ).withColumn(BUCKET_COL, bucket_expr(key_list, n_buckets))

    try:
        stored = spark.read.parquet(snapshot_dir)
    except Exception:  # bootstrap: no snapshot yet
        inc_latest.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(
            snapshot_dir, compression="snappy"
        )
        return

    # the batch's latest rows feed two actions (dirty-bucket discovery
    # and the merge write); persist so the batch lineage — which may
    # reach back through the ingest join — runs once
    inc_latest.persist()
    try:
        dirty = [r[0] for r in inc_latest.select(BUCKET_COL).distinct().collect()]
        stored_dirty = stored.filter(F.col(BUCKET_COL).isin(dirty))
        merged = latest_snapshot(
            stored_dirty.unionByName(inc_latest), key_list, event_time_col, tie_breaker
        )

        scratch = snapshot_dir + "__merge_scratch"
        merged.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(
            scratch, compression="snappy"
        )
        (
            spark.read.parquet(scratch)
            .write.option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(snapshot_dir, compression="snappy")
        )
    finally:
        inc_latest.unpersist()


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    return spark.read.parquet(snapshot_dir)


def read_snapshot_bucket(
    spark: SparkSession,
    snapshot_dir: str,
    keys: list[str] | str,
    key_values: list,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Point/batch lookup path: prune the scan to the bucket partitions
    the requested keys hash into (single-key groups only)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    snap = spark.read.parquet(snapshot_dir)
    probe = spark.createDataFrame(
        [(v,) for v in key_values], f"{key_list[0]} {dict(snap.dtypes)[key_list[0]]}"
    ).select(bucket_expr(key_list, n_buckets).alias("b"))
    buckets = [r["b"] for r in probe.distinct().collect()]
    return snap.filter(F.col(BUCKET_COL).isin(buckets))
