"""Measure the IVF-PQ memory claim (r5 verdict #7): bytes per vector
the ADC shortlist stage reads — PQ codes vs raw float vectors — at a
given SF, using the exact encoder `ivfpq_topk` runs (same n_lists=8,
M=16, n_codes=64 defaults).

Three representations are written to parquet and sized:
  raw     (vec_id, embedding array<float8>)  — what flat IVF scans
  codes   (vec_id, __cell, __codes array<int>) — the shipped index frame
  packed  (vec_id, __cell, codes binary[16])   — the production layout
          (n_codes=64 < 256, so each code fits one byte)

Parquet-on-disk is the proxy for scan bytes (both sides snappy, same
row count); the in-memory ADC working set is codes-only either way.

Usage: python tools/measure_pq_bytes.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from cust_sagemaker_feature_store_spark import get_spark
    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.operators import similarity as S

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("measure_pq_bytes")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    d = len(emb.select("embedding").first()[0])

    n_lists, m, n_codes = 8, 16, 64
    sub = d // m
    cent = S._seed_vectors(emb, n_lists, "vec_id", "embedding")
    seed_src = S._seed_vectors(
        emb, n_codes, "vec_id", "embedding", salt=S.PQ_SEED_SALT
    )
    c_sq = (cent * cent).sum(axis=1)
    seed_cells = (c_sq[None, :] - 2.0 * (seed_src @ cent.T)).argmin(axis=1)
    seed_resid = seed_src - cent[seed_cells]
    codebooks = np.stack(
        [seed_resid[:, j * sub : (j + 1) * sub] for j in range(m)]
    )
    index = S.pq_encode(emb, cent, codebooks, "vec_id", "embedding")

    out = tempfile.mkdtemp(prefix="pq_bytes_")
    try:
        raw_p = os.path.join(out, "raw")
        codes_p = os.path.join(out, "codes")
        packed_p = os.path.join(out, "packed")
        emb.select("vec_id", "embedding").write.parquet(raw_p)
        index.write.parquet(codes_p)
        # pack: one byte per code (n_codes=64 <= 255)
        packed = index.select(
            "vec_id",
            "__cell",
            F.expr(
                "cast(concat_ws('', transform(__codes, c -> chr(c))) as binary)"
            ).alias("codes"),
        )
        packed.write.parquet(packed_p)
        rows = []
        for name, p in (("raw_float_vectors", raw_p), ("pq_codes_array_int", codes_p), ("pq_codes_packed_u8", packed_p)):
            b = _dir_bytes(p)
            rows.append((name, b, b / n))
        print(f"sf_dir={sf_dir} vectors={n} dim={d} M={m} n_codes={n_codes}")
        for name, b, per in rows:
            print(f"{name}: {b} bytes total, {per:.1f} bytes/vector")
        print(
            f"shortlist_scan_ratio raw/packed = {rows[0][1] / rows[2][1]:.1f}x"
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
