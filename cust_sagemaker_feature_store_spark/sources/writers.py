"""Sink surface (SURVEY.md §2.1 [EXT]): the write-side twins of
readers.py, plus schema-evolution reads for long-lived stores.

The reference's only sink is the managed offline store's Snappy parquet
(setup.sh:86,139-141 contract, reproduced by core/feature_store.py);
these are the general-purpose sinks an engine user needs for exports
and interchange. All writers take a DataFrame and a path — layout
decisions (partition columns, mode) are explicit arguments, never
inferred, so a caller can't accidentally rewrite a store in a
different layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Snappy parquet (Spark's default codec), optionally
    partition_by-ed — the interchange/export sink. At 100 TB pick
    partition columns with bounded cardinality (date, bucket), never a
    key column: one directory per value."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_json_lines(df: DataFrame, path: str, mode: str = "error") -> None:
    """JSON-lines export (one object per line) — the common exchange
    format for downstream tokenizer/training jobs."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    df.write.mode(mode).orc(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "error"
) -> None:
    """CSV export, quoted-all like the reference's result files
    (readers.read_quoted_csv_as_strings is its read twin)."""
    df.write.mode(mode).option("header", header).option("quoteAll", True).csv(path)


def write_avro(
    df: DataFrame, path: str, codec: str = "deflate", mode: str = "error"
) -> None:
    """[EXT] Avro export (r16 — the write twin of readers.read_avro).
    Prefers the spark-avro connector when its jar is present; where it
    is absent (this container — gate re-probed every round) falls back
    to the pure-python distributed writer (avro_py.py): one container
    file per partition, Arrow-batched executor-side encode,
    interop-verified against the in-container org.apache.avro jars."""
    try:
        df.write.format("avro").mode(mode).save(path)
    except Exception as e:
        msg = str(e)
        if not (
            "Failed to find data source" in msg
            or "Failed to find the data source" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
        ):
            raise
        from .avro_py import write_avro_distributed

        write_avro_distributed(df, path, codec=codec, mode=mode)


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written under
    EVOLVING schemas (columns added over time): mergeSchema unions the
    per-file footers and back-fills missing columns with NULL, so old
    files stay readable after a store gains columns — the additive
    half of schema evolution (renames/drops need a real table format;
    see the documented Delta/Iceberg gate in README.md).

    mergeSchema is opt-in here, not default, because it footer-scans
    every file; the plain read_parquet path keeps the single-footer
    fast path for stable-schema stores."""
    return spark.read.option("mergeSchema", True).parquet(path)
