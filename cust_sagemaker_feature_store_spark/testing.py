"""Shared oracle-comparison helpers (used by tests and tools/verify_oracle).

Mirrors the driver's t2 gate: row count + sorted column names + an
order-insensitive multiset of normalized values, exact equality.

Fidelity notes (round-2 hardening — VERDICT r1 "What's wrong" #3): the
driver fetches the DuckDB oracle **through pandas**, which coerces
- HUGEINT (DuckDB's type for SUM over integers) -> float64,
- any nullable integer column                   -> float64 with NaN,
- DATE                                          -> midnight Timestamp.
The old replica folded int-valued floats back to ints, which masked the
q12/pivot driver hash failures. This version reproduces the coercion
(oracle rows come from ``.df()``) and keeps the float/int distinction
in ``norm_value``, so local green predicts driver green. Consequences
for query authors: CAST integer SUMs to BIGINT in oracle SQL, avoid
nullable integer output columns, and emit dates as ISO strings.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter

import duckdb
import numpy as np


def norm_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, np.generic):  # numpy scalar from the pandas fetch
        v = v.item()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, float):
        if math.isnan(v):
            # pandas renders SQL NULL in a float64 column as NaN on BOTH
            # sides of the driver's compare, so NaN == NULL here.
            return "NULL"
        return repr(v)  # type-sensitive: 123.0 stays "123.0", not "123"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if isinstance(v, _dt.datetime):  # covers pd.Timestamp (a subclass)
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
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


def oracle_fetch(con, oracle: str) -> tuple[list[str], list[tuple]]:
    """Fetch oracle rows the way the driver does: through pandas, so
    HUGEINT/nullable-int -> float64 coercion is part of what we test."""
    pdf = con.execute(oracle).df()
    cols = list(pdf.columns)
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    return cols, rows


def compare_spark_to_oracle(sdf, con, oracle: str) -> list[str]:
    """Return a list of problems (empty == match)."""
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = oracle_fetch(con, oracle)

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
