"""Testdata type contract (round-3 postmortem).

Between rounds the driver re-encoded `events.ts` from parquet
TIMESTAMP(NANOS) to zone-less `timestamp[us]` (= TIMESTAMP_NTZ in Spark
3.5+); `catalog.load_table` normalized only the first encoding, so two
previously-green queries silently broke and the round-3 bench crashed at
analysis time. These tests pin the POST-LOAD dtype of every column for
every `/root/testdata/sf*` directory present, so any future encoding
drift fails fast and loudly instead of surfacing as a driver crash.

Also verifies the normalization itself against synthetic parquet files
in all three encodings the driver has shipped (ns, us-ntz, us-ltz):
same post-load dtype, same wall-clock values.
"""

from __future__ import annotations

import datetime
import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from cust_sagemaker_feature_store_spark.catalog import TABLES, load_table
from cust_sagemaker_feature_store_spark.functions.timeutil import to_ltz

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

# Exact post-load contract. `ts` MUST land as session-local timestamp —
# that is the normalization load_table exists to provide. Wall-clock-only
# date columns may arrive ntz or ltz (every consumer treats them as wall
# clock under the pinned UTC session zone), hence the tuple entries.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": ("timestamp_ntz", "timestamp"),
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": ("timestamp_ntz", "timestamp"),
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # the load_table normalization contract
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("sf", SF_DIRS)
@pytest.mark.parametrize("name", TABLES)
def test_post_load_dtypes_pinned(spark, sf, name):
    got = dict(load_table(spark, sf, name).dtypes)
    want = EXPECTED[name]
    assert set(got) == set(want), f"{sf}/{name}: column drift {got}"
    for col, typ in want.items():
        allowed = typ if isinstance(typ, tuple) else (typ,)
        assert got[col] in allowed, (
            f"{sf}/{name}.{col}: got {got[col]}, expected one of {allowed} — "
            "driver testdata encoding drifted; extend catalog.load_table "
            "normalization (this exact failure mode crashed the r3 bench)"
        )


# -- the normalization itself, against all three shipped encodings -------

_WALL = [
    datetime.datetime(2024, 3, 1, 7, 43, 18, 123456),
    datetime.datetime(2024, 3, 2, 23, 59, 59, 999999),
]


def _write_events(tmpdir: str, arrow_type) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(_WALL).cast(arrow_type),
        }
    )
    d = os.path.join(tmpdir, arrow_type.unit + ("tz" if arrow_type.tz else ""))
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize(
    "arrow_type",
    [pa.timestamp("ns"), pa.timestamp("us"), pa.timestamp("us", tz="UTC")],
    ids=["nanos", "us_ntz", "us_ltz"],
)
def test_load_table_normalizes_every_ts_encoding(spark, tmp_path, arrow_type):
    d = _write_events(str(tmp_path), arrow_type)
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [
        r["iso"]
        for r in df.select(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("iso")
        )
        .orderBy("event_id")
        .collect()
    ]
    assert got == [t.strftime("%Y-%m-%d %H:%M:%S.%f") for t in _WALL]


def test_to_ltz_accepts_ntz_and_ltz(spark):
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ'2024-03-01 07:43:18' AS ntz,"
        "       TIMESTAMP'2024-03-01 07:43:18' AS ltz"
    )
    row = df.select(
        F.unix_micros(to_ltz("ntz")).alias("a"),
        F.unix_micros(to_ltz("ltz")).alias("b"),
    ).first()
    assert row["a"] == row["b"]
