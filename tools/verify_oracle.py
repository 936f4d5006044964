"""Local replica of the driver's t2 correctness gate.

Runs every REGISTRY query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, sorted column names,
and an order-insensitive multiset of normalized values. Exact equality
— no tolerance — because the driver hashes values; any FP drift must be
fixed in the query (exact decimal arithmetic), not papered over here.

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cust_sagemaker_feature_store_spark import get_spark
from cust_sagemaker_feature_store_spark.catalog import TABLES
from cust_sagemaker_feature_store_spark.queries import REGISTRY
from cust_sagemaker_feature_store_spark.testing import (
    compare_spark_to_oracle,
    duckdb_connection,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("verify_oracle")
    con = duckdb_connection(sf_dir, TABLES)

    n_pass = n_fail = 0
    for name, spec in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = sdf.count()
                print(f"ok   {name}: rows-only ({n} rows, {time.time()-t0:.1f}s)")
                n_pass += 1
                continue
            problems = compare_spark_to_oracle(sdf, con, spec.oracle)
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail @ {sf_dir}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
