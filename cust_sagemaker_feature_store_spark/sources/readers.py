"""Sources (SURVEY.md §2.1 S1-S4): explicit-schema readers.

The reference reads its ingestion CSV with pandas type inference
(reference: update_feature_store.py:9-10) and the Athena result CSV as
all-quoted strings (reference: historical_features.py:66). Here every
reader takes an explicit schema — inference is nondeterministic at
100 TB (it scans data to guess) and the feature-group contract is
schema-fixed anyway (SURVEY.md §1.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# A1 fixture shape — reference: test_task_data.csv header
PURCHASE_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("purchase_timestamp", T.StringType()),  # loose format, parsed by F1
        T.StructField("purchase_value", T.DoubleType()),
        T.StructField("loyalty_score", T.DoubleType()),
    ]
)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """S1: CSV scan with a declared schema (no inference pass)."""
    return spark.read.csv(path, header=header, schema=schema)


def read_quoted_csv_as_strings(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """S2: all-quoted query-result CSV — every field lands as a string
    (the reference's Athena result shape), caller casts explicitly."""
    schema = T.StructType([T.StructField(c, T.StringType()) for c in columns])
    return spark.read.csv(path, header=True, schema=schema)


def read_json_lines(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """[EXT] JSON-lines source with declared schema."""
    return spark.read.schema(schema).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S4: parquet scan (the offline-store read path)."""
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """[EXT] ORC scan — columnar alternative, same pushdown/pruning."""
    return spark.read.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """[EXT] Avro scan. Prefers the spark-avro connector when its jar
    is on the classpath (block-split reads, pushdown into the datum
    reader); where it is absent — this environment bundles avro-core
    but NOT the connector (gate re-probed r7-r15) — falls back to the
    r15 pure-python DISTRIBUTED reader (sources/avro_py.py):
    binaryFile listing + mapInPandas block decode, file-granular
    parallelism, null/deflate/snappy codecs, interop-verified against
    the in-container org.apache.avro reference jars in both
    directions. The env gate this row carried since r1 is closed for
    the read path; only the connector's intra-file split remains a
    connector-only nicety."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:
        # Fall back ONLY on datasource-resolution failure (connector jar
        # absent). With the jar present, a genuine load error (missing
        # path, corrupt file, permissions) must surface, not be masked
        # by a fallback that decodes logical types as base types.
        msg = str(e)
        if not (
            "Failed to find data source" in msg
            or "Failed to find the data source" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
        ):
            raise
        from .avro_py import read_avro_distributed

        return read_avro_distributed(spark, path)
