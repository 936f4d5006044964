"""Shared oracle-comparison helpers (used by tests and tools/verify_oracle).

Mirrors the driver's t2 gate: row count + sorted column names + an
order-insensitive multiset of normalized values, exact equality.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb


def norm_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def frame_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_value(r[i]) for i in order) for r in rows)


def duckdb_connection(sf_dir: str, tables: tuple[str, ...]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_spark_to_oracle(sdf, con, oracle: str) -> list[str]:
    """Return a list of problems (empty == match)."""
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    problems: list[str] = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if not problems:
        sm = frame_multiset(scols, srows)
        om = frame_multiset(ocols, orows)
        if sm != om:
            only_s = list((sm - om).items())[:3]
            only_o = list((om - sm).items())[:3]
            problems.append(
                f"values differ; spark-only={only_s} oracle-only={only_o}"
            )
    return problems
