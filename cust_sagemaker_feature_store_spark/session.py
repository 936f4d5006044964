"""SparkSession factory with engine-wide configuration.

Every entry point (tests, bench, driver contract) goes through
:func:`get_spark` so the whole engine runs with one consistent set of
scale-oriented defaults:

- UTC session timezone — the reference normalizes all event times to UTC
  (reference: update_feature_store.py:35-36), so timestamp<->string
  round-trips must be zone-stable.
- AQE on — runtime shuffle-partition coalescing + skew-join splitting;
  on a 1000-executor cluster this is the difference between a tuned plan
  and a guessed one.
- Arrow on — every pandas boundary (toPandas, pandas_udf, applyInPandas)
  is Arrow-batched, not pickled rows.
- `nanosAsLong` — driver testdata stores `events.ts` as parquet
  TIMESTAMP(NANOS), which Spark's vectorized reader rejects; we read it
  as long and convert to microsecond TimestampType in the catalog layer
  (matching DuckDB's own ns->us truncation).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "cust_sagemaker_feature_store_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    In local mode shuffle partitions default to the core count; on a real
    cluster the caller sets it to ~2-3x total cores and AQE coalesces
    down at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    nparts = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(nparts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
