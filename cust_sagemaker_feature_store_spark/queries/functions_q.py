"""Scalar-function and UDF query surface (SURVEY.md §2.8, §2.10 [EXT]).

`fn_scalar_surface` pins the string/math/conversion builtins; the
`udf_*` queries exercise the engine's user-function tiers —
applyInPandas (grouped UDF) and mapInPandas (streaming-batch UDF) —
with DuckDB oracles, which is only possible because the UDF bodies use
exact integer arithmetic mirrored in SQL (same trick as dsum/davg).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..operators.spread import spread_for_compute
from .registry import register


@register(
    "fn_scalar_surface",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substr(p_name, 1, 8) AS name_prefix,
       p_brand || '/' || p_type AS brand_type,
       length(p_name) AS name_len,
       replace(p_brand, 'Brand#', 'B') AS brand_short,
       abs(p_retailprice - 1000.0) AS price_dist,
       round(sqrt(p_retailprice), 6) AS price_sqrt,
       round(ln(p_retailprice), 6) AS price_ln,
       CAST(p_size AS VARCHAR) AS size_str,
       CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class,
       coalesce(nullif(p_type, 'ECONOMY'), 'STANDARD') AS type_defaulted
FROM part
""",
    description="Scalar builtin surface: string ops, math, casts, CASE, nullif/coalesce defaults (F4/F5/P4).",
)
def fn_scalar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dist"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.col("p_size").cast("string").alias("size_str"),
        F.when(F.col("p_size") >= 25, "large").otherwise("small").alias("size_class"),
        F.coalesce(F.nullif(F.col("p_type"), F.lit("ECONOMY")), F.lit("STANDARD")).alias(
            "type_defaulted"
        ),
    )


_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user z-score with exact integer sums: every float op below
    is a single IEEE operation on exactly-derived values, mirrored
    token-for-token in the SQL oracle, so results match bit-for-bit."""
    cents = (pdf["value"] * 100).round().astype("int64")
    n = len(pdf)
    s = int(cents.sum())
    ss = int((cents * cents).sum())
    mean = s / 100.0 / n
    if n > 1:
        var = (ss / 10000.0 - n * mean * mean) / (n - 1)
    else:
        var = 0.0
    if var > 0:
        z = (cents / 100.0 - mean) / math.sqrt(var)
    else:
        z = pd.Series([0.0] * n, index=pdf.index)
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "value": pdf["value"],
            "zscore": z,
        }
    )


_ZSCORE_ORACLE = """
WITH s AS (
  SELECT event_id, user_id, value,
         CAST(ROUND(value*100) AS BIGINT) AS c,
         SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS sc,
         SUM(CAST(ROUND(value*100) AS BIGINT)*CAST(ROUND(value*100) AS BIGINT)) OVER w AS ssc,
         COUNT(*) OVER w AS n
  FROM events
  WINDOW w AS (PARTITION BY user_id)
), m AS (
  SELECT *, sc/100.0/n AS mean,
         CASE WHEN n > 1 THEN (ssc/10000.0 - n*(sc/100.0/n)*(sc/100.0/n))/(n-1) ELSE 0.0 END AS var
  FROM s
)
SELECT event_id, user_id, value,
       CASE WHEN var > 0 THEN (c/100.0 - mean)/sqrt(var) ELSE 0.0 END AS zscore
FROM m
"""


@register(
    "udf_user_zscore",
    oracle=_ZSCORE_ORACLE,
    description=(
        "Grouped pandas UDF (applyInPandas): per-user z-score via exact "
        "integer sums — the Arrow-batched UDAF/UDTF surface, oracle-checked."
    ),
)
def udf_user_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.groupBy("user_id").applyInPandas(_zscore_group, schema=_ZSCORE_SCHEMA)


@register(
    "window_user_zscore",
    oracle=_ZSCORE_ORACLE,
    description=(
        "JVM-native per-user z-score: same semantics (and oracle) as "
        "udf_user_zscore but as unbounded window aggregates — whole-stage "
        "codegen, no Python workers, one shuffle on user_id. This is the "
        "form a 100 TB pipeline should run; the UDF twin exists to pin "
        "the pandas surface."
    ),
)
def window_user_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    w = Window.partitionBy("user_id")
    c = F.round(F.col("value") * 100).cast("long")
    sc = F.sum(c).over(w)
    ssc = F.sum(c * c).over(w)
    n = F.count(F.lit(1)).over(w)
    # Arithmetic mirrors _zscore_group token-for-token so all three
    # implementations (pandas UDF, this window form, the SQL oracle)
    # agree bit-for-bit: each step is one IEEE op on exact integers.
    mean = sc / 100.0 / n
    var = F.when(n > 1, (ssc / 10000.0 - n * mean * mean) / (n - 1)).otherwise(0.0)
    z = F.when(var > 0, (c / 100.0 - mean) / F.sqrt(var)).otherwise(0.0)
    return ev.select("event_id", "user_id", "value", z.alias("zscore"))


_MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


@register(
    "udf_multimodal_bytes",
    oracle="""
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_hash
FROM documents
""",
    description=(
        "mapInPandas over binary media columns (documents' text re-cast as "
        "opaque bytes): byte length + content hash — the multimodal "
        "plumbing's oracle-checkable core."
    ),
)
def udf_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_hash": pdf["content"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(run, schema=_MEDIA_FEATURES_SCHEMA)


_BMP_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


@register(
    "udf_multimodal_bmp",
    oracle="""
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST(1 + doc_id % 7 AS BIGINT) AS width,
         CAST(1 + doc_id % 5 AS BIGINT) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height, x.x AS x, y.y AS y
  FROM dims,
       unnest(generate_series(0, width - 1)) AS x(x),
       unnest(generate_series(0, height - 1)) AS y(y)
)
SELECT media_id, width, height,
       CAST(54 + (3 * width + 3) // 4 * 4 * height AS BIGINT) AS n_bytes,
       CAST(SUM((media_id + 3 * x + 5 * y) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((2 * media_id + 7 * x + y) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((3 * media_id + x + 2 * y) % 256) AS BIGINT) AS sum_b,
       CAST(SUM((media_id + 3 * x + 5 * y) % 256) AS DOUBLE)
         / (width * height) AS mean_r,
       CAST(SUM((2 * media_id + 7 * x + y) % 256) AS DOUBLE)
         / (width * height) AS mean_g,
       CAST(SUM((3 * media_id + x + 2 * y) % 256) AS DOUBLE)
         / (width * height) AS mean_b
FROM px GROUP BY 1, 2, 3
""",
    description=(
        "[EXT] REAL image decode path, oracle-pinned: per document a "
        "deterministic raster (width 1+id%7, height 1+id%5, channels "
        "closed-form in (id, x, y)) is ENCODED as an uncompressed "
        "24-bit BMP and decoded back by the pure-numpy decode_bmp "
        "inside mapInPandas — real header parse, row padding, "
        "bottom-up row order, zero codec dependencies (the de-gated "
        "rung of the multimodal ladder; JPEG/PNG remain env-gated). "
        "The oracle never sees BMP bytes: it recomputes width/height/"
        "byte size/channel sums straight from the pixel rule, so any "
        "decoder bug (padding, BGR order, row flip) breaks the hash. "
        "Narrow per-row transform, no shuffle; only compact features "
        "leave the executor."
    ),
)
def udf_multimodal_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import decode_bmp, encode_bmp

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 1 + mid % 7, 1 + mid % 5
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = np.stack(
                    [
                        (mid + 3 * x + 5 * y) % 256,
                        (2 * mid + 7 * x + y) % 256,
                        (3 * mid + x + 2 * y) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                bmp = encode_bmp(px)
                dec = decode_bmp(bmp)  # the REAL decode under test
                sums = dec.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n = dec.shape[0] * dec.shape[1]
                rows.append(
                    (
                        mid,
                        dec.shape[1],
                        dec.shape[0],
                        len(bmp),
                        int(sums[0]),
                        int(sums[1]),
                        int(sums[2]),
                        float(int(sums[0])) / n,
                        float(int(sums[1])) / n,
                        float(int(sums[2])) / n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_bytes",
                    "sum_r", "sum_g", "sum_b",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return docs.mapInPandas(run, schema=_BMP_FEATURES_SCHEMA)


_WAV_FEATURES_SCHEMA = (
    "media_id long, sample_rate long, n_channels long, n_frames long, "
    "n_bytes long, sum_abs long, mean_abs double, zero_crossings long"
)


@register(
    "udf_multimodal_wav",
    oracle="""
WITH frames AS (
  SELECT doc_id AS media_id,
         CAST(16 + doc_id % 17 AS BIGINT) AS n_frames,
         CAST(8000 + (doc_id % 4) * 2000 AS BIGINT) AS sample_rate
  FROM documents
),
samp AS (
  SELECT media_id, n_frames, sample_rate, i.i AS i,
         (media_id * 37 + i.i * 251) % 4001 - 2000 AS s
  FROM frames, unnest(generate_series(0, n_frames - 1)) AS i(i)
),
x AS (
  SELECT media_id, n_frames, sample_rate, i, s,
         lag(s) OVER (PARTITION BY media_id ORDER BY i) AS prev
  FROM samp
)
SELECT media_id, sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       n_frames,
       CAST(CASE WHEN media_id % 2 = 1 THEN 68 ELSE 44 END
            + 2 * n_frames AS BIGINT) AS n_bytes,
       CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
       CAST(SUM(ABS(s)) AS DOUBLE) / n_frames AS mean_abs,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND prev * s < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
FROM x GROUP BY 1, 2, 3, 4, 5
""",
    description=(
        "[EXT] REAL audio decode path, oracle-pinned (r13 — the "
        "de-gated audio rung of the multimodal ladder next to BMP/"
        "PNG): per document a deterministic mono PCM waveform "
        "(n = 16 + id%17 frames, sample i = (id*37 + i*251) % 4001 - "
        "2000, rate 8000 + (id%4)*2000) is ENCODED as a 16-bit "
        "RIFF/WAVE file and decoded back by the pure-stdlib "
        "decode_wav inside mapInPandas — real chunk walk, fmt parse, "
        "zero-copy PCM reinterpret, zero codec dependencies. Features "
        "are exact integers: |sample| sum (one division for the "
        "mean), strict sign-change zero crossings, byte size. The "
        "oracle never sees WAV bytes: it regenerates the waveform "
        "from the integer rule, so any decoder bug (chunk offsets, "
        "endianness, block alignment) breaks the hash. Narrow per-row "
        "transform, no shuffle; compressed audio stays env-gated."
    ),
)
def udf_multimodal_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import (
            decode_wav,
            encode_wav,
            encode_wav_raw,
        )

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 16 + mid % 17
                rate = 8000 + (mid % 4) * 2000
                i = np.arange(n, dtype=np.int64)
                s = (mid * 37 + i * 251) % 4001 - 2000
                if mid % 2:
                    # r16: odd ids wrap the same PCM frames in a
                    # WAVE_FORMAT_EXTENSIBLE (0xFFFE) header — the
                    # modern container form; fmt grows 16 -> 40 bytes
                    # (n_bytes 68 + 2n, mirrored in the oracle), and
                    # the decoder resolves the SubFormat GUID
                    wav = encode_wav_raw(
                        s.astype(np.int16).tobytes(), 1, 1, rate, 16,
                        extensible=True,
                    )
                else:
                    wav = encode_wav(s.astype(np.int16), rate)
                dec, dec_rate = decode_wav(wav)  # the REAL decode
                c0 = dec[:, 0].astype(np.int64)
                sum_abs = int(np.abs(c0).sum())
                zc = int(((c0[:-1] * c0[1:]) < 0).sum())
                rows.append(
                    (
                        mid, dec_rate, dec.shape[1], dec.shape[0],
                        len(wav), sum_abs,
                        float(sum_abs) / dec.shape[0], zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_frames",
                    "n_bytes", "sum_abs", "mean_abs", "zero_crossings",
                ],
            )

    return docs.mapInPandas(run, schema=_WAV_FEATURES_SCHEMA)


_JPEG_FEATURES_SCHEMA = (
    "media_id long, width long, height long, sum_gray long, "
    "sum_rgb long, grad_err_le_8 boolean"
)


@register(
    "udf_multimodal_jpeg",
    oracle="""
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST(8 * (1 + doc_id % 3) - doc_id % 5 AS BIGINT) AS width,
         CAST(8 * (1 + doc_id % 2) - doc_id % 3 AS BIGINT) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height, x.x AS x, y.y AS y
  FROM dims,
       unnest(generate_series(0, width - 1)) AS x(x),
       unnest(generate_series(0, height - 1)) AS y(y)
)
SELECT media_id, width, height,
       CAST(SUM((media_id + 7 * (x // 8) + 13 * (y // 8)) % 256)
            AS BIGINT) AS sum_gray,
       CAST(3 * SUM((3 * media_id + 11 * (x // 8) + 5 * (y // 8)) % 256)
            AS BIGINT) AS sum_rgb,
       TRUE AS grad_err_le_8
FROM px GROUP BY 1, 2, 3
""",
    description=(
        "[EXT] REAL baseline JPEG decode path, oracle-pinned (r13 "
        "verdict next-round #2 — the codec ladder's largest real-"
        "corpus image rung, after BMP/PNG/WAV). Three fixtures per "
        "document, all decoded by the pure-numpy decode_jpeg inside "
        "mapInPandas: (1) a GRAYSCALE 8x8-block-constant raster "
        "(block value (id + 7*bx + 13*by) % 256, cropped to a non-"
        "multiple-of-8 width/height) whose decode is EXACT under "
        "all-ones quant tables — constant blocks carry only a DC "
        "coefficient, an exact multiple of 8 — so sum_gray hashes "
        "the Huffman walk, DC prediction chain, dequant, IDCT DC "
        "path and crop bit-for-bit; (2) a COLOR 4:4:4 fixture with "
        "Cb=Cr=128 and block-constant Y, encoded with restart "
        "markers every 2 MCUs, whose decoded RGB equals Y exactly "
        "(the chroma terms vanish), so sum_rgb = 3*sum_Y hashes the "
        "interleaved-MCU, RSTn and color-transform paths; (3) a "
        "full-gradient raster whose reconstruction error is bounded "
        "by the all-ones-quant THEOREM (each orthonormal-DCT "
        "coefficient rounds by <= 1/2, so per-pixel error < 8), "
        "floored as grad_err_le_8. The oracle never sees JPEG bytes: "
        "it recomputes the sums from the pixel rules. Narrow per-row "
        "transform, no shuffle; progressive/subsampled JPEG stays "
        "env-gated."
    ),
)
def udf_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"))
        # the test corpus arrives as ONE parquet file -> one scan
        # partition, which would serialize this CPU-bound transform
        # (3 encodes + 3 decodes per row, the heaviest codec fixture).
        # One narrow shuffle of the 8-byte ids buys every core; at
        # corpus scale the scan already has >= this many partitions
        # and the repartition is a cheap rebalance.
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import decode_jpeg, encode_jpeg

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w = 8 * (1 + mid % 3) - mid % 5
                h = 8 * (1 + mid % 2) - mid % 3
                bw, bh = (w + 7) // 8, (h + 7) // 8
                bx = np.arange(bw, dtype=np.int64)[None, :]
                by = np.arange(bh, dtype=np.int64)[:, None]

                gray_blocks = (mid + 7 * bx + 13 * by) % 256
                gray = (
                    np.repeat(np.repeat(gray_blocks, 8, 0), 8, 1)[:h, :w]
                ).astype(np.uint8)
                dec_g = decode_jpeg(encode_jpeg(gray))  # REAL decode
                sum_gray = int(dec_g.astype(np.int64).sum())

                y_blocks = (3 * mid + 11 * bx + 5 * by) % 256
                y = (
                    np.repeat(np.repeat(y_blocks, 8, 0), 8, 1)[:h, :w]
                ).astype(np.uint8)
                color = np.stack(
                    [y, np.full_like(y, 128), np.full_like(y, 128)], axis=2
                )
                dec_c = decode_jpeg(
                    encode_jpeg(color, colorspace="ycbcr", restart_interval=2)
                )
                sum_rgb = int(dec_c.astype(np.int64).sum())

                x = np.arange(w, dtype=np.int64)[None, :]
                yy = np.arange(h, dtype=np.int64)[:, None]
                grad = ((mid + 5 * x + 2 * yy) % 256).astype(np.uint8)
                dec_grad = decode_jpeg(encode_jpeg(grad))
                err = int(
                    np.abs(
                        dec_grad.astype(np.int64) - grad.astype(np.int64)
                    ).max()
                )
                rows.append(
                    (mid, dec_g.shape[1], dec_g.shape[0],
                     sum_gray, sum_rgb, err <= 8)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "sum_gray", "sum_rgb", "grad_err_le_8",
                ],
            )

    return docs.mapInPandas(run, schema=_JPEG_FEATURES_SCHEMA)


_JPEG_SUB_SCHEMA = (
    "media_id long, width long, height long, samp string, sum_rgb long"
)


@register(
    "udf_multimodal_jpeg_subsampled",
    oracle="""
WITH dims AS (
  SELECT doc_id AS media_id,
         doc_id % 3 AS mode,
         CAST(16 * (1 + doc_id % 2) - doc_id % 7 AS BIGINT) AS width,
         CAST(16 * (1 + doc_id % 3) - doc_id % 5 AS BIGINT) AS height,
         CASE doc_id % 3 WHEN 2 THEN 8 ELSE 16 END AS mw,
         CASE doc_id % 3 WHEN 1 THEN 8 ELSE 16 END AS mh
  FROM documents
),
px AS (
  SELECT media_id, mode, width, height, mw, mh, x.x AS x, y.y AS y
  FROM dims,
       unnest(generate_series(0, width - 1)) AS x(x),
       unnest(generate_series(0, height - 1)) AS y(y)
),
v AS (
  SELECT media_id, mode, width, height,
         (7 * media_id + 11 * (x // 8) + 3 * (y // 8)) % 256 AS yv,
         ((3 * media_id + 5 * (x // mw) + 7 * (y // mh)) % 11) - 5 AS dcb,
         ((5 * media_id + 2 * (x // mw) + 3 * (y // mh)) % 11) - 5 AS dcr
  FROM px
)
SELECT media_id, width, height,
       CASE mode WHEN 0 THEN '420' WHEN 1 THEN '422' ELSE '440' END AS samp,
       CAST(SUM(
         LEAST(GREATEST(ROUND(yv + 1.402e0 * dcr), 0), 255)
         + LEAST(GREATEST(ROUND(yv - 0.344136e0 * dcb
                                - 0.714136e0 * dcr), 0), 255)
         + LEAST(GREATEST(ROUND(yv + 1.772e0 * dcb), 0), 255)
       ) AS BIGINT) AS sum_rgb
FROM v GROUP BY 1, 2, 3, 4
""",
    description=(
        "[EXT] REAL subsampled-JPEG decode path, oracle-pinned (r16 "
        "verdict next-round #3 — the most common real-world JPEG "
        "form, de-gated via T.81 A.2.3 interleaved MCUs). Per "
        "document the sampling mode rotates by id%3 over 4:2:0 / "
        "4:2:2 / 4:4:0; the fixture has 8x8-block-constant Y "
        "((7id+11bx+3by)%256) and PER-MCU-CONSTANT chroma (Cb/Cr = "
        "128 + ((..)%11) - 5), so the box-downsampled chroma blocks "
        "carry only a DC coefficient and decode EXACTLY, replication "
        "upsampling maps every pixel back to its MCU's chroma value, "
        "and the decoded RGB is the closed form round(y + c*d) the "
        "oracle recomputes in SQL (chroma deltas in [-5,5] keep every "
        "value >= 0.012 away from a .5 rounding boundary — design-"
        "asserted in tests — so numpy half-even vs DuckDB half-away "
        "can never disagree). Even ids add DRI/RSTn restart markers "
        "every 2 MCUs, pinning the restart path through multi-block "
        "MCUs. sum_rgb therefore hashes the subsampled MCU "
        "interleave, per-component DC prediction, chroma downsample/ "
        "upsample geometry, crop, and the color transform bit-for-"
        "bit. The oracle never sees JPEG bytes. Narrow per-row "
        "transform, no shuffle; subsampled and progressive forms have "
        "their own oracle tiers since r16."
    ),
)
def udf_multimodal_jpeg_subsampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"))
        # single-file corpus -> one scan partition would serialize
        # this CPU-bound codec fixture; cheap 8-byte-id rebalance
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import decode_jpeg, encode_jpeg

        modes = {0: ("420", 16, 16), 1: ("422", 16, 8), 2: ("440", 8, 16)}
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                samp, mw, mh = modes[mid % 3]
                w = 16 * (1 + mid % 2) - mid % 7
                h = 16 * (1 + mid % 3) - mid % 5
                bx = np.arange((w + 7) // 8, dtype=np.int64)[None, :]
                by = np.arange((h + 7) // 8, dtype=np.int64)[:, None]
                yb = np.repeat(
                    np.repeat((7 * mid + 11 * bx + 3 * by) % 256, 8, 0), 8, 1
                )[:h, :w]
                mx = np.arange((w + mw - 1) // mw, dtype=np.int64)[None, :]
                my = np.arange((h + mh - 1) // mh, dtype=np.int64)[:, None]
                cb = 128 + ((3 * mid + 5 * mx + 7 * my) % 11) - 5
                cr = 128 + ((5 * mid + 2 * mx + 3 * my) % 11) - 5
                cb = np.repeat(np.repeat(cb, mh, 0), mw, 1)[:h, :w]
                cr = np.repeat(np.repeat(cr, mh, 0), mw, 1)[:h, :w]
                img = np.stack([yb, cb, cr], axis=2).astype(np.uint8)
                blob = encode_jpeg(
                    img,
                    colorspace="ycbcr",
                    sampling=samp,
                    restart_interval=2 if mid % 2 == 0 else 0,
                )
                dec = decode_jpeg(blob)  # the REAL subsampled decode
                rows.append(
                    (mid, dec.shape[1], dec.shape[0], samp,
                     int(dec.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "samp", "sum_rgb"],
            )

    return docs.mapInPandas(run, schema=_JPEG_SUB_SCHEMA)


_JPEG_PROG_SCHEMA = (
    "media_id long, width long, height long, samp string, "
    "sum_gray long, sum_rgb long"
)


@register(
    "udf_multimodal_jpeg_progressive",
    oracle="""
WITH dims AS (
  SELECT doc_id AS media_id,
         doc_id % 4 AS mode,
         CAST(16 * (1 + doc_id % 2) - doc_id % 7 AS BIGINT) AS width,
         CAST(16 * (1 + doc_id % 3) - doc_id % 5 AS BIGINT) AS height,
         CASE doc_id % 4 WHEN 0 THEN 8 WHEN 3 THEN 8 ELSE 16 END AS mw,
         CASE doc_id % 4 WHEN 0 THEN 8 WHEN 2 THEN 8 ELSE 16 END AS mh
  FROM documents
),
px AS (
  SELECT media_id, mode, width, height, mw, mh, x.x AS x, y.y AS y
  FROM dims,
       unnest(generate_series(0, width - 1)) AS x(x),
       unnest(generate_series(0, height - 1)) AS y(y)
),
v AS (
  SELECT media_id, mode, width, height,
         (3 * media_id + 5 * (x // 8) + 7 * (y // 8)) % 256 AS gv,
         (11 * media_id + 7 * (x // 8) + 5 * (y // 8)) % 256 AS yv,
         ((2 * media_id + 3 * (x // mw) + 5 * (y // mh)) % 11) - 5 AS dcb,
         ((7 * media_id + (x // mw) + 3 * (y // mh)) % 11) - 5 AS dcr
  FROM px
)
SELECT media_id, width, height,
       CASE mode WHEN 0 THEN '444' WHEN 1 THEN '420'
                 WHEN 2 THEN '422' ELSE '440' END AS samp,
       CAST(SUM(gv) AS BIGINT) AS sum_gray,
       CAST(SUM(
         LEAST(GREATEST(ROUND(yv + 1.402e0 * dcr), 0), 255)
         + LEAST(GREATEST(ROUND(yv - 0.344136e0 * dcb
                                - 0.714136e0 * dcr), 0), 255)
         + LEAST(GREATEST(ROUND(yv + 1.772e0 * dcb), 0), 255)
       ) AS BIGINT) AS sum_rgb
FROM v GROUP BY 1, 2, 3, 4
""",
    description=(
        "[EXT] REAL progressive (SOF2) JPEG decode path, oracle-"
        "pinned (r16 — the last JPEG mode, after baseline r14 and "
        "subsampled r16): per document a GRAYSCALE fixture and a "
        "COLOR fixture (sampling rotating by id%4 over 4:4:4 / 4:2:0 "
        "/ 4:2:2 / 4:4:0) are encoded PROGRESSIVELY — interleaved DC "
        "scan at Al=1, spectral-split AC scans (luma 1-5/6-63) at "
        "Al=1, AC refinement scans at Ah=1, raw-bit DC refinement — "
        "and decoded by the pure-numpy multi-scan coefficient "
        "accumulator in mapInPandas. Block-constant Y and per-MCU-"
        "constant chroma decode EXACTLY (DC-only blocks; successive "
        "approximation reassembles d = (d>>1)<<1 | bit losslessly), "
        "so sum_gray/sum_rgb hash the scan-script walk, per-scan DHT "
        "snapshots, band accumulation, bit-plane reassembly, and the "
        "shared dequant/IDCT/upsample finish bit-for-bit against the "
        "closed form the oracle recomputes in SQL (same 0.012 "
        "rounding-margin design as the subsampled tier). Odd ids add "
        "restart intervals (DC-pred/EOB-run reset per RSTn). The "
        "decoder additionally reads libjpeg-scripted streams (cross-"
        "block EOB runs with buffered correction bits) — pinned "
        "against JDK-written progressive files in the suite, max "
        "diff 1 on grayscale. Narrow per-row transform, no shuffle."
    ),
)
def udf_multimodal_jpeg_progressive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"))
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import decode_jpeg, encode_jpeg

        modes = {
            0: ("444", 8, 8), 1: ("420", 16, 16),
            2: ("422", 16, 8), 3: ("440", 8, 16),
        }
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                samp, mw, mh = modes[mid % 4]
                w = 16 * (1 + mid % 2) - mid % 7
                h = 16 * (1 + mid % 3) - mid % 5
                ri = 3 if mid % 2 else 0
                bx = np.arange((w + 7) // 8, dtype=np.int64)[None, :]
                by = np.arange((h + 7) // 8, dtype=np.int64)[:, None]
                gray = np.repeat(
                    np.repeat((3 * mid + 5 * bx + 7 * by) % 256, 8, 0), 8, 1
                )[:h, :w].astype(np.uint8)
                dec_g = decode_jpeg(
                    encode_jpeg(gray, progressive=True, restart_interval=ri)
                )
                yb = np.repeat(
                    np.repeat((11 * mid + 7 * bx + 5 * by) % 256, 8, 0), 8, 1
                )[:h, :w]
                mx = np.arange((w + mw - 1) // mw, dtype=np.int64)[None, :]
                my = np.arange((h + mh - 1) // mh, dtype=np.int64)[:, None]
                cb = 128 + ((2 * mid + 3 * mx + 5 * my) % 11) - 5
                cr = 128 + ((7 * mid + mx + 3 * my) % 11) - 5
                cb = np.repeat(np.repeat(cb, mh, 0), mw, 1)[:h, :w]
                cr = np.repeat(np.repeat(cr, mh, 0), mw, 1)[:h, :w]
                img = np.stack([yb, cb, cr], axis=2).astype(np.uint8)
                dec_c = decode_jpeg(
                    encode_jpeg(
                        img, colorspace="ycbcr", sampling=samp,
                        progressive=True, restart_interval=ri,
                    )
                )
                rows.append(
                    (mid, dec_c.shape[1], dec_c.shape[0], samp,
                     int(dec_g.astype(np.int64).sum()),
                     int(dec_c.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "samp",
                         "sum_gray", "sum_rgb"],
            )

    return docs.mapInPandas(run, schema=_JPEG_PROG_SCHEMA)


_TIFF_FEATURES_SCHEMA = (
    "media_id long, width long, height long, n_strips long, "
    "sum_gray long, sum_rgb long"
)


@register(
    "udf_multimodal_tiff",
    oracle="""
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST(2 + doc_id % 9 AS BIGINT) AS width,
         CAST(1 + doc_id % 7 AS BIGINT) AS height,
         CAST(1 + doc_id % 4 AS BIGINT) AS rps
  FROM documents
),
px AS (
  SELECT media_id, width, height, rps, x.x AS x, y.y AS y
  FROM dims,
       unnest(generate_series(0, width - 1)) AS x(x),
       unnest(generate_series(0, height - 1)) AS y(y)
)
SELECT media_id, width, height,
       (height + rps - 1) // rps AS n_strips,
       CAST(SUM((9 * media_id + 4 * x + 3 * y) % 256) AS BIGINT) AS sum_gray,
       CAST(SUM((media_id + 2 * x + 7 * y) % 256
                + (4 * media_id + 6 * x + y) % 256
                + (2 * media_id + x + 5 * y) % 256) AS BIGINT) AS sum_rgb
FROM px GROUP BY 1, 2, 3, 4
""",
    description=(
        "[EXT] REAL TIFF decode path, oracle-pinned (r14; LZW r15 — "
        "the scan/scientific-corpus rung of the codec ladder, and the "
        "only one that exercises BOTH byte orders: odd ids encode "
        "big-endian MM, even ids little-endian II). Per document a "
        "grayscale and an RGB raster (channels closed-form in "
        "(id, x, y)) are encoded as strip-based TIFF 6.0 with "
        "RowsPerStrip = 1 + id%4 (multi-strip reassembly hot) and the "
        "compression rotating by id%5 — uncompressed / PackBits "
        "32773 / LZW 5 (r14 verdict next-round #4: variable-width "
        "MSB-first codes, EarlyChange bump, per-strip streams) / "
        "Deflate 8 / LZW+horizontal-predictor-2 (r15 wave 2) — then "
        "decoded back by decode_tiff inside mapInPandas: IFD walk, "
        "inline-vs-pointed values, StripOffsets/ByteCounts, per-strip "
        "decompression dispatch. r16 rotates the RGB fixture's LAYOUT "
        "by id%3 — chunky strips / PlanarConfiguration-2 strips / "
        "16x16 tiles (tags 322-325, padded edge tiles) — decoded "
        "pixels are layout-invariant so the oracle hash is unchanged "
        "while the tile and planar reassembly paths run hot. Every "
        "rung is lossless, so ONE oracle recomputes exact channel "
        "sums from the pixel rules without seeing TIFF bytes; "
        "JPEG-in-TIFF has its own oracle tier "
        "(udf_multimodal_tiff_jpeg) since r16."
    ),
)
def udf_multimodal_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    # single-file corpus -> one scan partition would serialize this
    # CPU-bound codec fixture on one core; cheap 8-byte-id rebalance
    docs = spread_for_compute(docs, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import decode_tiff, encode_tiff

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h, rps = 2 + mid % 9, 1 + mid % 7, 1 + mid % 4
                be = bool(mid % 2)
                comp = {  # id%5 rotates the per-strip compression
                    0: {},
                    1: {"packbits": True},
                    2: {"lzw": True},
                    3: {"deflate": True},
                    4: {"lzw": True, "predictor": 2},
                }[mid % 5]
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                gray = ((9 * mid + 4 * x + 3 * y) % 256).astype(np.uint8)
                dec_g = decode_tiff(
                    encode_tiff(
                        gray, big_endian=be, rows_per_strip=rps, **comp
                    )
                )
                rgb = np.stack(
                    [
                        (mid + 2 * x + 7 * y) % 256,
                        (4 * mid + 6 * x + y) % 256,
                        (2 * mid + x + 5 * y) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                # r16: the RGB fixture additionally rotates the LAYOUT
                # by id%3 — chunky strips / planar strips (284=2) /
                # tiled 16x16 (tags 322-325, single padded edge tile
                # at these dims). Decoded pixels are layout-invariant,
                # so the oracle hash is untouched while the tile and
                # planar reassembly paths go hot.
                layout = {
                    0: {},
                    1: {"planar": True},
                    2: {"tile": (16, 16)},
                }[mid % 3]
                dec_c = decode_tiff(
                    encode_tiff(
                        rgb, big_endian=be, rows_per_strip=rps,
                        **comp, **layout,
                    )
                )
                rows.append(
                    (
                        mid, w, h, (h + rps - 1) // rps,
                        int(dec_g.astype(np.int64).sum()),
                        int(dec_c.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_strips",
                    "sum_gray", "sum_rgb",
                ],
            )

    return docs.mapInPandas(run, schema=_TIFF_FEATURES_SCHEMA)


_TIFF_JPEG_SCHEMA = (
    "media_id long, width long, height long, n_strips long, "
    "sum_gray long, noisy_err_le_8 boolean"
)


@register(
    "udf_multimodal_tiff_jpeg",
    oracle="""
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST(8 * (2 + doc_id % 3) - doc_id % 5 AS BIGINT) AS width,
         CAST(8 * (2 + doc_id % 2) - doc_id % 3 AS BIGINT) AS height,
         CAST(3 + doc_id % 6 AS BIGINT) AS rps
  FROM documents
),
px AS (
  SELECT media_id, width, height, rps, x.x AS x, y.y AS y
  FROM dims,
       unnest(generate_series(0, width - 1)) AS x(x),
       unnest(generate_series(0, height - 1)) AS y(y)
)
SELECT media_id, width, height,
       (height + rps - 1) // rps AS n_strips,
       CAST(SUM((13 * media_id + 3 * (x // 8) + 11 * (y // 8)) % 256)
            AS BIGINT) AS sum_gray,
       TRUE AS noisy_err_le_8
FROM px GROUP BY 1, 2, 3, 4
""",
    description=(
        "[EXT] REAL JPEG-in-TIFF decode path (r16 — TIFF TechNote 2 "
        "new-style JPEG, compression 7: each strip is a full JPEG "
        "stream, with even ids moving the shared DQT/DHT into the "
        "JPEGTables tag 347 that every strip inherits, odd ids "
        "keeping self-contained strips; byte order alternates too). "
        "Two fixtures per document: (1) an 8x8-block-constant "
        "grayscale raster (value (13id + 3bx + 11by) % 256) whose "
        "multi-strip JPEG decode is EXACT under all-ones quant "
        "tables — DC-only blocks — so sum_gray hashes the IFD walk, "
        "tag-347 table merge, per-strip JPEG decode and strip "
        "reassembly bit-for-bit; (2) a noisy raster whose per-pixel "
        "reconstruction error is bounded by the all-ones-quant "
        "theorem (< 8), floored as noisy_err_le_8. The oracle "
        "recomputes sum_gray from the pixel rule via SQL. Narrow "
        "per-row transform, no shuffle; planar JPEG-in-TIFF keeps "
        "its gate."
    ),
)
def udf_multimodal_tiff_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("media_id"))
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import decode_tiff, encode_tiff

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w = 8 * (2 + mid % 3) - mid % 5
                h = 8 * (2 + mid % 2) - mid % 3
                rps = 3 + mid % 6
                be = bool(mid % 2)
                jt = mid % 2 == 0
                bx = np.arange((w + 7) // 8, dtype=np.int64)[None, :]
                by = np.arange((h + 7) // 8, dtype=np.int64)[:, None]
                gray = np.repeat(
                    np.repeat((13 * mid + 3 * bx + 11 * by) % 256, 8, 0),
                    8, 1,
                )[:h, :w].astype(np.uint8)
                dec = decode_tiff(encode_tiff(
                    gray, big_endian=be, rows_per_strip=rps,
                    jpeg=True, jpeg_tables=jt,
                ))
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                noisy = ((mid + 5 * x + 2 * y) % 256).astype(np.uint8)
                dec_n = decode_tiff(encode_tiff(
                    noisy, big_endian=be, rows_per_strip=rps,
                    jpeg=True, jpeg_tables=jt,
                ))
                err = int(np.abs(
                    dec_n.astype(np.int64) - noisy.astype(np.int64)
                ).max())
                rows.append(
                    (mid, w, h, (h + rps - 1) // rps,
                     int(dec.astype(np.int64).sum()), err <= 8)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_strips",
                         "sum_gray", "noisy_err_le_8"],
            )

    return docs.mapInPandas(run, schema=_TIFF_JPEG_SCHEMA)


_PNG2_FEATURES_SCHEMA = (
    "media_id long, width long, height long, n_colors long, "
    "sum_gray long, sum_rgb_palette long"
)


@register(
    "udf_multimodal_png_palette",
    oracle="""
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST(1 + doc_id % 8 AS BIGINT) AS width,
         CAST(1 + doc_id % 5 AS BIGINT) AS height,
         CAST(2 + doc_id % 6 AS BIGINT) AS n_colors
  FROM documents
),
px AS (
  SELECT media_id, width, height, n_colors, x.x AS x, y.y AS y,
         (media_id + x.x + 2 * y.y) % n_colors AS c
  FROM dims,
       unnest(generate_series(0, width - 1)) AS x(x),
       unnest(generate_series(0, height - 1)) AS y(y)
)
SELECT media_id, width, height, n_colors,
       CAST(SUM((7 * media_id + 3 * x + 5 * y) % 256) AS BIGINT) AS sum_gray,
       CAST(SUM((5 * media_id + 2 * c) % 256
                + (media_id + 9 * c) % 256
                + (3 * media_id + 4 * c) % 256) AS BIGINT)
         AS sum_rgb_palette
FROM px GROUP BY 1, 2, 3, 4
""",
    description=(
        "[EXT] REAL PNG decode for the r14-de-gated color types: per "
        "document a GRAYSCALE raster (color type 0, value (7id + 3x + "
        "5y) % 256, scanline filter (id + y) % 5 so all five "
        "de-filter paths run single-channel) and a PALETTE raster "
        "(color type 3, PLTE chunk of 2 + id%6 closed-form colors, "
        "indices (id + x + 2y) % P, filter (2id + y) % 5) are encoded "
        "and decoded back by the stdlib-zlib decode_png inside "
        "mapInPandas. Both types are lossless, so the oracle "
        "recomputes the exact channel sums from the pixel/palette "
        "rules without ever seeing PNG bytes. Narrow per-row "
        "transform, no shuffle; 16-bit and Adam7-interlaced PNG were "
        "de-gated in r15 (suite-verified rungs)."
    ),
)
def udf_multimodal_png_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    # single-file corpus -> one scan partition would serialize this
    # CPU-bound codec fixture on one core; cheap 8-byte-id rebalance
    docs = spread_for_compute(docs, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import decode_png, encode_png

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h, p = 1 + mid % 8, 1 + mid % 5, 2 + mid % 6
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                gray = ((7 * mid + 3 * x + 5 * y) % 256).astype(np.uint8)
                dec_g = decode_png(
                    encode_png(gray, row_filters=[(mid + yy) % 5 for yy in range(h)])
                )
                c = np.arange(p, dtype=np.int64)
                pal = np.stack(
                    [
                        (5 * mid + 2 * c) % 256,
                        (mid + 9 * c) % 256,
                        (3 * mid + 4 * c) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                idx = (mid + x + 2 * y) % p
                dec_p = decode_png(
                    encode_png(
                        idx,
                        row_filters=[(2 * mid + yy) % 5 for yy in range(h)],
                        palette=pal,
                    )
                )
                rows.append(
                    (
                        mid, w, h, p,
                        int(dec_g.astype(np.int64).sum()),
                        int(dec_p.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_colors",
                    "sum_gray", "sum_rgb_palette",
                ],
            )

    return docs.mapInPandas(run, schema=_PNG2_FEATURES_SCHEMA)


_GIF_FEATURES_SCHEMA = (
    "media_id long, width long, height long, n_colors long, "
    "sum_r long, sum_g long, sum_b long"
)


@register(
    "udf_multimodal_gif",
    oracle="""
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST(2 + doc_id % 9 AS BIGINT) AS width,
         CAST(1 + doc_id % 6 AS BIGINT) AS height,
         CAST(2 + doc_id % 7 AS BIGINT) AS n_colors
  FROM documents
),
px AS (
  SELECT media_id, width, height, n_colors,
         (media_id + 3 * x.x + 2 * y.y) % n_colors AS c
  FROM dims,
       unnest(generate_series(0, width - 1)) AS x(x),
       unnest(generate_series(0, height - 1)) AS y(y)
)
SELECT media_id, width, height, n_colors,
       CAST(SUM((media_id + 3 * c) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((2 * media_id + 5 * c) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((media_id + 7 * c) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY 1, 2, 3, 4
""",
    description=(
        "[EXT] REAL GIF decode path, oracle-pinned (r14 — the "
        "palette-image rung the PNG codec gates, and GIF is lossless "
        "so the decode is EXACT, not a floor). Per document a "
        "deterministic palette (2 + id%7 colors, channels closed-form "
        "in (id, c)) and index raster (c = (id + 3x + 2y) % P) are "
        "ENCODED as a GIF89a file — INTERLACED for odd ids, so the "
        "four-pass row order is on the hot path — and decoded back by "
        "decode_gif inside mapInPandas: sub-block reassembly, "
        "variable-width LZW with CLEAR/EOI, palette lookup, "
        "de-interlace. The oracle never sees GIF bytes: it recomputes "
        "the channel sums from the palette and index rules, so any "
        "LZW/bit-packing/interlace bug breaks the hash. Narrow "
        "per-row transform, no shuffle."
    ),
)
def udf_multimodal_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import decode_gif, encode_gif

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h, p = 2 + mid % 9, 1 + mid % 6, 2 + mid % 7
                c = np.arange(p, dtype=np.int64)
                pal = np.stack(
                    [
                        (mid + 3 * c) % 256,
                        (2 * mid + 5 * c) % 256,
                        (mid + 7 * c) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                idx = (mid + 3 * x + 2 * y) % p
                blob = encode_gif(idx, pal, interlace=bool(mid % 2))
                dec = decode_gif(blob)  # the REAL decode under test
                sums = dec.reshape(-1, 3).astype(np.int64).sum(axis=0)
                rows.append(
                    (mid, dec.shape[1], dec.shape[0], p,
                     int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_colors",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return docs.mapInPandas(run, schema=_GIF_FEATURES_SCHEMA)


_G711_FEATURES_SCHEMA = (
    "media_id long, n_frames long, sum_abs_mulaw long, "
    "sum_abs_alaw long, zero_crossings_mulaw long"
)


@register(
    "udf_multimodal_g711",
    oracle="""
WITH frames AS (
  SELECT doc_id AS media_id, CAST(12 + doc_id % 13 AS BIGINT) AS n_frames
  FROM documents
),
b AS (
  SELECT media_id, n_frames, i.i AS i,
         (media_id * 31 + i.i * 7) % 256 AS code
  FROM frames, unnest(generate_series(0, n_frames - 1)) AS i(i)
),
mu AS (
  SELECT media_id, n_frames, i,
         ((u % 16) * 8 + 132) * (1 << ((u % 128) // 16)) AS t, u
  FROM (SELECT media_id, n_frames, i, 255 - code AS u FROM b)
),
mu_lin AS (
  SELECT media_id, n_frames, i,
         CASE WHEN u >= 128 THEN 132 - t ELSE t - 132 END AS s
  FROM mu
),
al AS (
  SELECT media_id, i,
         CASE WHEN (x % 128) // 16 = 0 THEN (x % 16) * 16 + 8
              ELSE ((x % 16) * 16 + 264) * (1 << ((x % 128) // 16 - 1))
         END AS mag, x
  FROM (SELECT media_id, i, xor(code, 85) AS x FROM b)
),
al_lin AS (
  SELECT media_id, i,
         CASE WHEN x >= 128 THEN mag ELSE -mag END AS s
  FROM al
),
mu_x AS (
  SELECT media_id, n_frames, s,
         lag(s) OVER (PARTITION BY media_id ORDER BY i) AS prev
  FROM mu_lin
)
SELECT m.media_id, m.n_frames,
       CAST(SUM(ABS(m.s)) AS BIGINT) AS sum_abs_mulaw,
       (SELECT CAST(SUM(ABS(a.s)) AS BIGINT) FROM al_lin a
        WHERE a.media_id = m.media_id) AS sum_abs_alaw,
       CAST(SUM(CASE WHEN m.prev IS NOT NULL AND m.prev * m.s < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings_mulaw
FROM mu_x m GROUP BY 1, 2
""",
    description=(
        "[EXT] REAL G.711 companded-audio decode path, oracle-pinned "
        "(r14 — de-gating the telephony rungs of the compressed-audio "
        "gate next to the PCM/float tags): per document a "
        "deterministic byte stream ((id*31 + i*7) % 256, n = 12 + "
        "id%13 frames) is wrapped as BOTH a mu-law (format tag 7) and "
        "an A-law (tag 6) RIFF/WAVE file and decoded back by "
        "decode_wav's exact CCITT expansions inside mapInPandas. "
        "Features are exact integers: |sample| sums for both codecs "
        "and strict sign-change zero crossings on the mu-law channel. "
        "The oracle never sees WAV bytes OR the numpy tables: it "
        "recomputes both expansions from the published G.711 bit "
        "formulas (complement/XOR-0x55, segment shift, bias), so any "
        "table or chunk-walk bug breaks the hash. Narrow per-row "
        "transform, no shuffle; ADPCM and true compressed audio stay "
        "env-gated."
    ),
)
def udf_multimodal_g711(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    # single-file corpus -> one scan partition would serialize this
    # CPU-bound codec fixture on one core; cheap 8-byte-id rebalance
    docs = spread_for_compute(docs, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import decode_wav, encode_wav_raw

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 12 + mid % 13
                i = np.arange(n, dtype=np.int64)
                codes = ((mid * 31 + i * 7) % 256).astype(np.uint8)
                mu, _ = decode_wav(
                    encode_wav_raw(codes.tobytes(), 7, 1, 8000, 8)
                )
                al, _ = decode_wav(
                    encode_wav_raw(codes.tobytes(), 6, 1, 8000, 8)
                )
                c0 = mu[:, 0].astype(np.int64)
                rows.append(
                    (
                        mid, n,
                        int(np.abs(c0).sum()),
                        int(np.abs(al[:, 0].astype(np.int64)).sum()),
                        int(((c0[:-1] * c0[1:]) < 0).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_frames", "sum_abs_mulaw",
                    "sum_abs_alaw", "zero_crossings_mulaw",
                ],
            )

    return docs.mapInPandas(run, schema=_G711_FEATURES_SCHEMA)


@register(
    "agg_approx_distinct",
    oracle=None,  # HLL estimate is engine-specific; exactness checked in tests
    description="approx_count_distinct (HyperLogLog++) per order priority — the sketch-aggregate surface.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )


@register(
    "agg_approx_percentile",
    oracle=None,  # sketch estimate is engine-specific; error bound checked vs exact cols
    description=(
        "percentile_approx (KLL-style sketch) vs the exact percentile, "
        "side by side per priority — the single-pass mergeable-sketch "
        "path for order statistics at 100 TB, where exact percentile's "
        "per-group sort is the bottleneck."
    ),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact_median"),
    )


# Relative-error ceilings for the sketch floor queries, with ~1.5-5x
# margin over the worst error measured across sf0.001/sf0.01 groups
# (HLL++ 9.7% on the smallest group at default rsd; KLL-style
# percentile_approx 1.1% at accuracy 10000). Both sketches are
# deterministic for a given input, so the floors are stable.
HLL_REL_TOL = 0.15
PCTL_REL_TOL = 0.05

_SKETCH_FLOOR_ORACLE = """
SELECT DISTINCT o_orderpriority, TRUE AS within_tol FROM orders
"""


@register(
    "agg_approx_distinct_floor",
    oracle=_SKETCH_FLOOR_ORACLE,
    description=(
        "Driver-visible accuracy floor for approx_count_distinct "
        "(round-3 advice #8 pattern): per-group relative error vs the "
        "exact distinct count, compared to a 15% ceiling INSIDE Spark; "
        "the oracle pins within_tol == TRUE per group, so HLL breakage "
        "hash-mismatches instead of hiding behind a rows-only record."
    ),
)
def agg_approx_distinct_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = F.approx_count_distinct("o_custkey")
    e = F.countDistinct("o_custkey")
    return orders.groupBy("o_orderpriority").agg(
        (F.abs(a - e) / e <= HLL_REL_TOL).alias("within_tol")
    )


@register(
    "agg_approx_percentile_floor",
    oracle=_SKETCH_FLOOR_ORACLE,
    description=(
        "Driver-visible accuracy floor for percentile_approx: per-group "
        "relative error of the sketch median vs the exact median under "
        "a 5% ceiling, oracle-pinned TRUE per group."
    ),
)
def agg_approx_percentile_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = F.percentile_approx("o_totalprice", 0.5, 10000)
    e = F.percentile("o_totalprice", F.lit(0.5))
    return orders.groupBy("o_orderpriority").agg(
        (F.abs(a - e) / e <= PCTL_REL_TOL).alias("within_tol")
    )


FREQ_SUPPORT = 0.03  # top-of-vocabulary tokens sit at ~3.5% frequency


def _freq_items_floor_audit(spark: SparkSession, sf_dir: str):
    """Plan-audit hook (registry.QuerySpec.audit_frames): the two
    corpus-scale passes the eager floor runs — the exact heavy-hitter
    aggregate (threshold is a placeholder literal; the real one is a
    scalar computed from toks.count()) and the distributed CMS
    aggregate."""
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    heavy = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    cms = toks.agg(
        F.count_min_sketch(
            "token", F.lit(0.001), F.lit(0.99), F.lit(42)
        ).alias("s")
    )
    return {"heavy_hitters": heavy, "cms_agg": cms}


@register(
    "agg_freq_items_floor",
    oracle="""
SELECT 'count_min' AS method, TRUE AS guarantee_ok
UNION ALL
SELECT 'freq_items' AS method, TRUE AS guarantee_ok
""",
    description=(
        "Driver-visible guarantee floor for the frequent-items sketches "
        "(completing the sketch family next to the HLL/KLL floors): "
        "exact token heavy hitters (frequency > support, via groupBy "
        "count) must ALL appear in DataFrame.stat.freqItems's output "
        "(Karp-Shenker-Papadimitriou one-pass guarantee: no false "
        "negatives above the support threshold), and "
        "DataFrame.stat.countMinSketch must estimate each heavy "
        "hitter's count at >= its true count (CMS errs strictly upward "
        "by construction). Both checks computed in-engine over the "
        "documents token stream; the oracle pins the two booleans, so a "
        "sketch regression hash-mismatches. All driver-side state is "
        "bounded by 1/support and the sketch dimensions — "
        "corpus-size-independent."
    ),
    audit_frames=_freq_items_floor_audit,
)
def agg_freq_items_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    total = toks.count()
    thresh = FREQ_SUPPORT * total
    # bounded collect: at most 1/support heavy hitters exist
    heavy = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > thresh)
        .collect()
    )
    fi = set(toks.stat.freqItems(["token"], FREQ_SUPPORT).head()[0])
    fi_ok = all(r["token"] in fi for r in heavy)
    # the CMS aggregate runs distributed (partial sketches merged
    # map-side); only the fixed-size serialized sketch reaches the
    # driver, deserialized through Spark's public sketch class
    sk = toks.agg(
        F.count_min_sketch(
            "token", F.lit(0.001), F.lit(0.99), F.lit(42)
        ).alias("s")
    ).head()["s"]
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sk))
    )
    cms_ok = all(cms.estimateCount(r["token"]) >= r["n"] for r in heavy)
    return spark.createDataFrame(
        [("count_min", bool(cms_ok)), ("freq_items", bool(fi_ok))],
        "method string, guarantee_ok boolean",
    )


@register(
    "fn_array_surface",
    oracle="""
SELECT p_partkey,
       len(toks) AS n_words,
       array_to_string(list_sort(toks), ' ') AS words_sorted,
       toks[1] AS first_word,
       toks[len(toks)] AS last_word,
       array_to_string(list_sort(list_distinct(toks)), ' ') AS words_distinct,
       len(list_filter(toks, w -> length(w) > 5)) AS n_long_words,
       array_to_string(list_reverse(list_sort(toks)), '-') AS joined_desc,
       list_contains(toks, 'green') AS has_green
FROM (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part)
""",
    description=(
        "[EXT] array-function surface over split part names: size/"
        "sort/index/distinct/lambda-filter/reverse-join/contains — the "
        "collection builtins (SURVEY §2.8), all JVM expression "
        "arithmetic inside codegen, no UDF. Array-valued results are "
        "space-joined on output (driver canonicalizer contract — flat "
        "scalar columns only)."
    ),
)
def fn_array_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    t = part.select("p_partkey", toks.alias("toks"))
    return t.select(
        "p_partkey",
        F.size("toks").alias("n_words"),
        F.array_join(F.sort_array("toks"), " ").alias("words_sorted"),
        F.element_at("toks", 1).alias("first_word"),
        F.element_at("toks", F.size("toks")).alias("last_word"),
        F.array_join(F.sort_array(F.array_distinct("toks")), " ").alias("words_distinct"),
        F.size(F.filter("toks", lambda w: F.length(w) > 5)).alias("n_long_words"),
        F.concat_ws("-", F.reverse(F.sort_array("toks"))).alias("joined_desc"),
        F.array_contains("toks", "green").alias("has_green"),
    )


@register(
    "window_first_last_nth",
    oracle="""
SELECT user_id, event_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER w AS last_type,
       nth_value(event_type, 2) OVER w AS second_type
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    description=(
        "[EXT] first_value/last_value/nth_value over per-user event "
        "history with an explicit unbounded frame (the default frame "
        "truncates last_value at the current row) and a deterministic "
        "(ts, event_id) order. One window shuffle."
    ),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@register(
    "agg_mode_value",
    oracle="""
SELECT user_id, event_type AS mode_type, n
FROM (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
         row_number() OVER (
           PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type)
WHERE rn = 1
""",
    description=(
        "[EXT] grouped mode (most frequent value) with a deterministic "
        "lexicographic tie-break — count + window argmax, never a "
        "collect; map-side combine keeps the shuffle at "
        "|users x types| rows."
    ),
)
def agg_mode_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


@register(
    "fn_map_surface",
    oracle="""
WITH m AS (
  SELECT o_orderkey,
         MAP {'status': o_orderstatus, 'priority': o_orderpriority} AS meta
  FROM orders
)
SELECT o_orderkey,
       meta['status'][1] AS status_val,
       meta['priority'][1] AS priority_val,
       CAST(cardinality(meta) AS INTEGER) AS n_entries,
       array_to_string(map_keys(meta), ',') AS keys_joined,
       list_contains(map_keys(meta), 'status') AS has_status
FROM m
""",
    description=(
        "[EXT] map-function surface (SURVEY §2.8): map construction "
        "from columns, value lookup, cardinality, key enumeration and "
        "membership — scalar outputs only, because map column "
        "renderings differ across engines while lookups pin the same "
        "semantics. All codegen expressions."
    ),
)
def fn_map_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    meta = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    m = orders.select("o_orderkey", meta.alias("meta"))
    return m.select(
        "o_orderkey",
        F.element_at("meta", "status").alias("status_val"),
        F.element_at("meta", "priority").alias("priority_val"),
        F.size("meta").alias("n_entries"),
        F.concat_ws(",", F.map_keys("meta")).alias("keys_joined"),
        F.array_contains(F.map_keys("meta"), "status").alias("has_status"),
    )


@register(
    "fn_datetime_surface",
    oracle="""
SELECT event_id,
       CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_start,
       CAST(EXTRACT(year FROM ts) AS INTEGER) AS y,
       CAST(EXTRACT(month FROM ts) AS INTEGER) AS m,
       CAST(EXTRACT(dow FROM ts) AS INTEGER) AS dow_sunday0,
       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS h,
       CAST(CAST(ts AS DATE) + INTERVAL 7 DAY AS DATE)::VARCHAR AS next_week,
       date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS days_since_95,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS formatted
FROM events
""",
    description=(
        "[EXT] temporal-builtin surface (SURVEY §2.8): truncation, "
        "field extraction (incl. day-of-week normalized to Sunday=0 — "
        "Spark's dayofweek is 1-based), date arithmetic, day diffs and "
        "formatting, emitted as strings/ints so both engines hash "
        "identically. Narrow map over the normalized ts (the "
        "TIMESTAMP_NTZ chokepoint is upstream in catalog.load_table)."
    ),
)
def fn_datetime_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_start"
        ),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        (F.dayofweek("ts") - 1).alias("dow_sunday0"),
        F.hour("ts").alias("h"),
        F.date_format(F.date_add(F.to_date("ts"), 7), "yyyy-MM-dd").alias(
            "next_week"
        ),
        F.datediff(F.to_date("ts"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("formatted"),
    )


HLL_SPLIT = "2024-01-16 00:00:00"
HLL_MERGE_REL_TOL = 0.05  # lgConfigK=12 gives ~1.6% standard error


def _hll_merge_floor_audit(spark: SparkSession, sf_dir: str):
    """Plan-audit hook: the three corpus passes behind the eager
    mergeability floor — per-half sketch build + union-merge estimate,
    direct one-pass sketch estimate, and the exact distinct count."""
    ev = load_table(spark, sf_dir, "events")
    halves = ev.withColumn(
        "half",
        (F.col("ts") < F.lit(HLL_SPLIT).cast("timestamp")).cast("int"),
    )
    merged = (
        halves.groupBy("half")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    exact = ev.agg(F.count_distinct("user_id").alias("n"))
    return {"union_merge": merged, "direct": direct, "exact": exact}


@register(
    "agg_hll_merge_floor",
    oracle="""
SELECT 'union_merge_within_tol' AS check_name, TRUE AS guarantee_ok
UNION ALL
SELECT 'direct_within_tol' AS check_name, TRUE AS guarantee_ok
""",
    description=(
        "[EXT] mergeability floor for the HLL distinct-count sketch "
        "(DataSketches HllSketch via hll_sketch_agg/hll_union_agg/"
        "hll_sketch_estimate): sketching each half of the event stream "
        "separately and UNIONING the two sketches must land within 5%% "
        "of the exact distinct count (a union that dropped a partial "
        "would read ~50%% low), and so must the direct one-pass sketch "
        "— THE property that lets a 100 TB pipeline pre-aggregate "
        "per-partition/per-day sketches and fold them into any rollup "
        "later without rescanning. The two estimates are deliberately "
        "NOT pinned equal: DataSketches uses the HIP estimator for a "
        "directly-built sketch and a union discards HIP state for the "
        "composite estimator (Dasgupta et al., the published "
        "DataSketches HLL design), so direct=1499 vs merged=1488 vs "
        "exact=1500 at sf0.1 is correct behavior, both well inside "
        "the 5%% floor (lgK=12 standard error is ~1.6%%). Both "
        "booleans are computed in-engine and pinned TRUE by the "
        "oracle; a sketch/union regression hash-mismatches. "
        "Complements agg_approx_distinct_floor, which checks accuracy "
        "only, not re-aggregation."
    ),
    audit_frames=_hll_merge_floor_audit,
)
def agg_hll_merge_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    halves = ev.withColumn(
        "half",
        (F.col("ts") < F.lit(HLL_SPLIT).cast("timestamp")).cast("int"),
    )
    per_half = halves.groupBy("half").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_half.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).head()["est"]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).head()["est"]
    exact = ev.agg(F.count_distinct("user_id").alias("n")).head()["n"]
    merge_ok = bool(abs(merged - exact) <= HLL_MERGE_REL_TOL * exact)
    direct_ok = bool(abs(direct - exact) <= HLL_MERGE_REL_TOL * exact)
    return spark.createDataFrame(
        [("union_merge_within_tol", merge_ok), ("direct_within_tol", direct_ok)],
        "check_name string, guarantee_ok boolean",
    )


# -- Count-Min sketch, exact-oracle (r9) ---------------------------------

CMS_WIDTH = 256
CMS_DEPTH = 3
CMS_PRIME = 4294967291
CMS_A = (2654435761, 2246822519, 3266489917)
CMS_B = (40503, 104729, 12582917)


def _cms_sql_bucket(i: int) -> str:
    return (
        f"((o_custkey * {CMS_A[i]} + {CMS_B[i]}) % {CMS_PRIME}) % {CMS_WIDTH}"
    )


@register(
    "agg_count_min_sketch",
    oracle=f"""
WITH t AS (
  SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM orders GROUP BY 1
),
h AS (
  SELECT o_custkey, i.i AS i,
         CASE i.i WHEN 0 THEN {_cms_sql_bucket(0)}
                  WHEN 1 THEN {_cms_sql_bucket(1)}
                  ELSE {_cms_sql_bucket(2)} END AS b
  FROM orders, unnest([0, 1, 2]) AS i(i)
),
cms AS (SELECT i, b, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY 1, 2),
probe AS (SELECT DISTINCT o_custkey AS custkey, i, b FROM h),
est AS (
  SELECT probe.custkey, MIN(cms.c) AS est_n
  FROM probe JOIN cms ON cms.i = probe.i AND cms.b = probe.b
  GROUP BY 1
)
SELECT t.custkey, t.true_n, est.est_n,
       est.est_n - t.true_n AS overestimate
FROM t JOIN est ON est.custkey = t.custkey
""",
    description=(
        "[EXT] Count-Min sketch with the one-sided guarantee made "
        "driver-visible PER KEY: a depth-3 x width-256 counter table "
        "from fixed multiplicative hashes (engine-portable integer "
        "arithmetic — no engine hash functions), point estimates = min "
        "over rows, emitted next to the exact count so overestimate "
        ">= 0 holds in the DATA for every key, not just as a claim. "
        "Completes the sketch shelf (HLL distinct, KLL quantiles, "
        "freq-items) with the mergeable frequency sketch: counters are "
        "pure sums, so shard sketches union by addition at 100 TB "
        "(depth x width int64 cells regardless of corpus size), and "
        "the estimate join touches the 768-cell table, never the "
        "stream. Build = one explode x depth + one partial-agg "
        "shuffle on (row, bucket)."
    ),
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def bucket(i: int):
        return (
            (F.col("o_custkey") * CMS_A[i] + CMS_B[i]) % CMS_PRIME
        ) % CMS_WIDTH

    hashed = orders.select(
        "o_custkey",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), bucket(i).cast("long").alias("b")
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("s"),
    ).select("o_custkey", F.col("s.i").alias("i"), F.col("s.b").alias("b"))
    cms = hashed.groupBy("i", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    probe = hashed.select(
        F.col("o_custkey").alias("custkey"), "i", "b"
    ).distinct()
    est = (
        probe.join(F.broadcast(cms), ["i", "b"])
        .groupBy("custkey")
        .agg(F.min("c").alias("est_n"))
    )
    true_n = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    return true_n.join(est, "custkey").select(
        "custkey",
        "true_n",
        "est_n",
        (F.col("est_n") - F.col("true_n")).alias("overestimate"),
    )


# -- Luhn check-digit surface (r9) ---------------------------------------

def _luhn_sql(payload: str) -> str:
    """Luhn sum of a 10-digit integer payload (digit i counted from the
    right, doubling even positions for check-digit computation)."""
    terms = []
    for i in range(10):
        d = f"(({payload}) // {10**i}) % 10"
        if i % 2 == 0:
            terms.append(
                f"(CASE WHEN 2 * ({d}) > 9 THEN 2 * ({d}) - 9 ELSE 2 * ({d}) END)"
            )
        else:
            terms.append(f"({d})")
    return " + ".join(terms)


@register(
    "fn_luhn_check_digit",
    oracle=f"""
WITH acct AS (
  SELECT c_custkey,
         (c_custkey * 1009 + 7) % 10000000000 AS payload
  FROM customer
),
s AS (SELECT c_custkey, payload, {_luhn_sql('payload')} AS luhn_sum FROM acct)
SELECT c_custkey, payload,
       (10 - luhn_sum % 10) % 10 AS check_digit,
       payload * 10 + (10 - luhn_sum % 10) % 10 AS account_number
FROM s
""",
    description=(
        "[EXT] Luhn (mod-10) check-digit computation — the checksum "
        "that validates card/account identifiers, the exactness rung "
        "text_scrub_entities' regex tier lacks (a digit string that "
        "LOOKS like a card number but fails Luhn is a false positive "
        "a PII scrubber should not redact). Payloads derive "
        "deterministically from c_custkey; the digit arithmetic is "
        "pure integer div/mod expression trees — ten unrolled terms "
        "inside whole-stage codegen, bit-identical in both engines, "
        "no string ops at all. Narrow per-row transform, zero "
        "shuffles."
    ),
)
def fn_luhn_check_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    payload = (F.col("c_custkey") * 1009 + 7) % F.lit(10_000_000_000)

    def luhn_sum(p):
        total = F.lit(0)
        for i in range(10):
            d = F.expr(f"(__p div {10**i}) % 10")
            total = total + (
                F.when(2 * d > 9, 2 * d - 9).otherwise(2 * d)
                if i % 2 == 0
                else d
            )
        return total

    s = cust.select(
        "c_custkey", payload.alias("__p")
    ).withColumn("luhn_sum", luhn_sum(None))
    check = (10 - F.col("luhn_sum") % 10) % 10
    return s.select(
        "c_custkey",
        F.col("__p").alias("payload"),
        check.alias("check_digit"),
        (F.col("__p") * 10 + check).alias("account_number"),
    )


@register(
    "stream_count_min_twin",
    oracle=f"""
WITH h AS (
  SELECT i.i AS i,
         ((user_id * CASE i.i WHEN 0 THEN {CMS_A[0]}
                              WHEN 1 THEN {CMS_A[1]}
                              ELSE {CMS_A[2]} END
           + CASE i.i WHEN 0 THEN {CMS_B[0]}
                      WHEN 1 THEN {CMS_B[1]}
                      ELSE {CMS_B[2]} END) % {CMS_PRIME}) % {CMS_WIDTH} AS b
  FROM events, unnest([0, 1, 2]) AS i(i)
)
SELECT i, b, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY 1, 2
""",
    description=(
        "[EXT] batch twin of the STREAMING Count-Min counter table "
        "(streaming/windows.count_min_counters over events.user_id): "
        "the sketch maintained as a plain streaming aggregation whose "
        "state is the depth x width cells — constant memory on an "
        "unbounded stream, counters mergeable with batch shards by "
        "addition because both sides use the same multiplicative "
        "hashes. This twin runs the streaming operator's own function "
        "on the batch frame so the oracle pins its hash/count "
        "arithmetic; streaming execution and stream==batch counter "
        "equality are pinned by tests/test_streaming.py."
    ),
)
def stream_count_min_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import count_min_counters

    ev = load_table(spark, sf_dir, "events")
    return count_min_counters(
        ev, "user_id", CMS_A, CMS_B, CMS_PRIME, CMS_WIDTH
    )


_PNG_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


@register(
    "udf_multimodal_png",
    oracle="""
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST(1 + doc_id % 9 AS BIGINT) AS width,
         CAST(1 + doc_id % 6 AS BIGINT) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height, x.x AS x, y.y AS y
  FROM dims,
       unnest(generate_series(0, width - 1)) AS x(x),
       unnest(generate_series(0, height - 1)) AS y(y)
)
SELECT media_id, width, height,
       CAST(SUM((media_id + 5 * x + 2 * y) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((3 * media_id + x + 4 * y) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((2 * media_id + 6 * x + y) % 256) AS BIGINT) AS sum_b,
       CAST(SUM((media_id + 5 * x + 2 * y) % 256) AS DOUBLE)
         / (width * height) AS mean_r,
       CAST(SUM((3 * media_id + x + 4 * y) % 256) AS DOUBLE)
         / (width * height) AS mean_g,
       CAST(SUM((2 * media_id + 6 * x + y) % 256) AS DOUBLE)
         / (width * height) AS mean_b
FROM px GROUP BY 1, 2, 3
""",
    description=(
        "[EXT] REAL PNG decode path, oracle-pinned (the second de-gated "
        "codec rung, r9 verdict next-round #4): per document a "
        "deterministic raster (width 1+id%9, height 1+id%6, channels "
        "closed-form in (id, x, y)) is ENCODED as an 8-bit truecolor "
        "PNG with the scanline filter VARYING per row ((id + y) % 5, "
        "so every de-filter path — None/Sub/Up/Average/Paeth — is on "
        "the hot path) and decoded back by the stdlib-zlib decode_png "
        "inside mapInPandas. The oracle never sees PNG bytes: it "
        "recomputes the channel sums straight from the pixel rule, so "
        "any inflate/de-filter/carry bug breaks the hash. Narrow "
        "per-row transform, no shuffle."
    ),
)
def udf_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    # single-file corpus -> one scan partition would serialize this
    # CPU-bound codec fixture on one core; cheap 8-byte-id rebalance
    docs = spread_for_compute(docs, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import decode_png, encode_png

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 1 + mid % 9, 1 + mid % 6
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = np.stack(
                    [
                        (mid + 5 * x + 2 * y) % 256,
                        (3 * mid + x + 4 * y) % 256,
                        (2 * mid + 6 * x + y) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                blob = encode_png(
                    px, row_filters=[(mid + yy) % 5 for yy in range(h)]
                )
                dec = decode_png(blob)  # the REAL decode under test
                sums = dec.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n = dec.shape[0] * dec.shape[1]
                rows.append(
                    (
                        mid, dec.shape[1], dec.shape[0],
                        int(sums[0]), int(sums[1]), int(sums[2]),
                        float(int(sums[0])) / n,
                        float(int(sums[1])) / n,
                        float(int(sums[2])) / n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "sum_r", "sum_g", "sum_b",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return docs.mapInPandas(run, schema=_PNG_FEATURES_SCHEMA)


_PHASH_SCHEMA = (
    "media_id long, width long, height long, phash long, bits_set long"
)


@register(
    "udf_multimodal_phash",
    oracle="""
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST(8 + doc_id % 5 AS BIGINT) AS width,
         CAST(8 + doc_id % 3 AS BIGINT) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height, x.x AS x, y.y AS y,
         (((media_id + 3 * x.x + 7 * y.y) % 256)
          + ((2 * media_id + 5 * x.x + y.y) % 256)
          + ((3 * media_id + x.x + 4 * y.y) % 256)) // 3 AS gray
  FROM dims,
       unnest(generate_series(0, width - 1)) AS x(x),
       unnest(generate_series(0, height - 1)) AS y(y)
),
blocks AS (
  SELECT media_id, width, height,
         (y * 4) // height AS by, (x * 4) // width AS bx,
         SUM(gray) AS bs, COUNT(*) AS bn
  FROM px GROUP BY 1, 2, 3, 4, 5
),
tot AS (
  SELECT media_id, SUM(bs) AS ts, SUM(bn) AS tn FROM blocks GROUP BY 1
),
bits AS (
  SELECT b.media_id, b.width, b.height,
         CASE WHEN b.bs * t.tn > t.ts * b.bn
              THEN CAST(1 AS BIGINT) << CAST(4 * b.by + b.bx AS INTEGER)
              ELSE 0 END AS bitval,
         CASE WHEN b.bs * t.tn > t.ts * b.bn THEN 1 ELSE 0 END AS one
  FROM blocks b JOIN tot t USING (media_id)
)
SELECT media_id, width, height,
       CAST(SUM(bitval) AS BIGINT) AS phash,
       CAST(SUM(one) AS BIGINT) AS bits_set
FROM bits GROUP BY 1, 2, 3
""",
    description=(
        "[EXT] perceptual average-hash over the REAL PNG codec: per "
        "document a deterministic raster (>= 8x8) round-trips through "
        "encode_png/decode_png (filter (id+y)%5 varies per scanline, "
        "all five de-filter paths hot), then aHash: integer grayscale "
        "(r+g+b)//3, 4x4 variable-size blocks by index mapping "
        "(x*4)//w, each bit = block mean > global mean decided by "
        "EXACT integer cross-multiplication (bs*tn > ts*bn — no "
        "float), packed into a 16-bit hash. The oracle recomputes the "
        "hash from the pixel rule alone, so any codec OR pooling bug "
        "breaks it. The dedup-for-images rung: at 100 TB the hash is "
        "16 bits per image, Hamming-joinable like simhash64."
    ),
)
def udf_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    # single-file corpus -> one scan partition would serialize this
    # CPU-bound codec fixture on one core; cheap 8-byte-id rebalance
    docs = spread_for_compute(docs, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import decode_png, encode_png

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 8 + mid % 5, 8 + mid % 3
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = np.stack(
                    [
                        (mid + 3 * x + 7 * y) % 256,
                        (2 * mid + 5 * x + y) % 256,
                        (3 * mid + x + 4 * y) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                filters = [(mid + yy) % 5 for yy in range(h)]
                dec = decode_png(encode_png(px, row_filters=filters))
                gray = dec.astype(np.int64).sum(axis=2) // 3
                bx = (np.arange(w, dtype=np.int64) * 4) // w
                by = (np.arange(h, dtype=np.int64) * 4) // h
                phash = 0
                ones = 0
                ts = int(gray.sum())
                tn = w * h
                for b_y in range(4):
                    for b_x in range(4):
                        m = gray[by == b_y][:, bx == b_x]
                        bs, bn = int(m.sum()), int(m.size)
                        if bs * tn > ts * bn:
                            phash |= 1 << (4 * b_y + b_x)
                            ones += 1
                rows.append((mid, w, h, phash, ones))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "phash", "bits_set"],
            )

    return docs.mapInPandas(run, schema=_PHASH_SCHEMA)


@register(
    "stream_dedup_twin",
    oracle="""
SELECT user_id, event_type,
       CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_arrivals,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_suppressed
FROM events
GROUP BY 1, 2, 3
HAVING COUNT(*) > 1
""",
    description=(
        "[EXT] batch twin of streaming dedup (streaming/windows."
        "stream_dedup -> dropDuplicatesWithinWatermark): the dedup "
        "state table holds exactly one entry per key inside the "
        "watermark horizon, so the batch twin reports, per colliding "
        "key (user, type, minute bucket), the arrival count and how "
        "many redeliveries an at-least-once source would have "
        "suppressed. Keys that never collide carry no state cost "
        "beyond eviction — HAVING > 1 keeps the report duplicate-"
        "focused. Streaming execution of the same key arithmetic is "
        "pinned by tests/test_streaming.py::"
        "test_stream_dedup_twin_matches_batch."
    ),
)
def stream_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            "event_type",
            F.date_trunc("minute", "ts").alias("minute_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_arrivals"))
        .filter(F.col("n_arrivals") > 1)
        .select(
            "user_id",
            "event_type",
            "minute_bucket",
            "n_arrivals",
            (F.col("n_arrivals") - 1).cast("long").alias("n_suppressed"),
        )
    )


_RESIZE_SCHEMA = (
    "media_id long, out_w long, out_h long, sum_r long, sum_g long, sum_b long"
)


@register(
    "udf_multimodal_resize",
    oracle="""
WITH dims AS (
  SELECT doc_id AS media_id,
         CAST(5 + doc_id % 8 AS BIGINT) AS w,
         CAST(5 + doc_id % 6 AS BIGINT) AS h
  FROM documents
),
op AS (
  SELECT media_id, w, h, xo.xo AS xo, yo.yo AS yo,
         (xo.xo * w) // 4 AS sx, (yo.yo * h) // 3 AS sy
  FROM dims,
       unnest(generate_series(0, 3)) AS xo(xo),
       unnest(generate_series(0, 2)) AS yo(yo)
)
SELECT media_id, CAST(4 AS BIGINT) AS out_w, CAST(3 AS BIGINT) AS out_h,
       CAST(SUM((media_id + 4 * sx + 9 * sy) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((5 * media_id + 2 * sx + 3 * sy) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((7 * media_id + 6 * sx + sy) % 256) AS BIGINT) AS sum_b
FROM op GROUP BY 1
""",
    description=(
        "[EXT] REAL image resize over the REAL BMP codec: deterministic "
        "rasters round-trip encode_bmp/decode_bmp, then nearest-"
        "neighbor resample to 4x3 via the pure-integer index map "
        "(x*W)//out_w (operators/multimodal.resize_nearest — the "
        "de-gated rung of resize_stub). The oracle recomputes the "
        "sampled-pixel channel sums from the pixel rule and the SAME "
        "index map, so a codec bug OR an off-by-one in the resample "
        "grid breaks the hash. Narrow per-row transform; at 100 TB "
        "media bytes never shuffle, only the resized features leave "
        "the executor."
    ),
)
def udf_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    # single-file corpus -> one scan partition would serialize this
    # CPU-bound codec fixture on one core; cheap 8-byte-id rebalance
    docs = spread_for_compute(docs, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import decode_bmp, encode_bmp, resize_nearest

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 5 + mid % 8, 5 + mid % 6
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = np.stack(
                    [
                        (mid + 4 * x + 9 * y) % 256,
                        (5 * mid + 2 * x + 3 * y) % 256,
                        (7 * mid + 6 * x + y) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                dec = decode_bmp(encode_bmp(px))
                rs = resize_nearest(dec, 4, 3)
                sums = rs.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows.append((mid, 4, 3, int(sums[0]), int(sums[1]), int(sums[2])))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "out_w", "out_h", "sum_r", "sum_g", "sum_b"],
            )

    return docs.mapInPandas(run, schema=_RESIZE_SCHEMA)


_FRAMES_OUT_SCHEMA = (
    "media_id long, frame_index long, n_frames long, "
    "sum_r long, sum_g long, sum_b long"
)


@register(
    "udf_multimodal_frames",
    oracle="""
WITH vids AS (
  SELECT doc_id AS media_id,
         CAST(2 + doc_id % 4 AS BIGINT) AS n_frames,
         CAST(3 + doc_id % 4 AS BIGINT) AS w,
         CAST(2 + doc_id % 3 AS BIGINT) AS h
  FROM documents
),
sampled AS (
  SELECT media_id, n_frames, w, h, f.f AS frame_index
  FROM vids, unnest(generate_series(0, n_frames - 1)) AS f(f)
  WHERE f.f % 2 = 0
),
px AS (
  SELECT media_id, n_frames, frame_index, x.x AS x, y.y AS y
  FROM sampled,
       unnest(generate_series(0, w - 1)) AS x(x),
       unnest(generate_series(0, h - 1)) AS y(y)
)
SELECT media_id, frame_index, n_frames,
       CAST(SUM((media_id + 11 * frame_index + 2 * x + 3 * y) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((2 * media_id + 7 * frame_index + x + 5 * y) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((3 * media_id + 13 * frame_index + 4 * x + y) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY 1, 2, 3
""",
    description=(
        "[EXT] REAL frame sampling: per document a multi-frame FRMS "
        "container (documented length-prefixed toy container — the "
        "ffmpeg seam) holding 2-5 real BMP-encoded frames is PARSED, "
        "every 2nd frame is selected, and each sampled frame is "
        "decoded by the real decode_bmp — container parse + per-frame "
        "codec both on the hot path (de-gating frame_sample_stub). "
        "The oracle recomputes sampled-frame channel sums from the "
        "(id, frame, x, y) pixel rule, so a container offset bug, a "
        "wrong sample stride, or a codec bug all break the hash. One "
        "output row per SAMPLED frame; media bytes never shuffle."
    ),
)
def udf_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    # single-file corpus -> one scan partition would serialize this
    # CPU-bound codec fixture on one core; cheap 8-byte-id rebalance
    docs = spread_for_compute(docs, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..operators.multimodal import (
            decode_bmp,
            decode_frames,
            encode_bmp,
            encode_frames,
        )

        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                nf, w, h = 2 + mid % 4, 3 + mid % 4, 2 + mid % 3
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                payloads = []
                for fi in range(nf):
                    px = np.stack(
                        [
                            (mid + 11 * fi + 2 * x + 3 * y) % 256,
                            (2 * mid + 7 * fi + x + 5 * y) % 256,
                            (3 * mid + 13 * fi + 4 * x + y) % 256,
                        ],
                        axis=2,
                    ).astype(np.uint8)
                    payloads.append(encode_bmp(px))
                container = encode_frames(payloads)
                # the REAL parse + sample + decode under test
                frames = decode_frames(container)
                for fi in range(0, len(frames), 2):
                    dec = decode_bmp(frames[fi])
                    sums = dec.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                    rows.append(
                        (mid, fi, nf, int(sums[0]), int(sums[1]), int(sums[2]))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_index", "n_frames",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return docs.mapInPandas(run, schema=_FRAMES_OUT_SCHEMA)


_PHASH_CTE = """
dims AS (
  SELECT doc_id AS media_id,
         CAST(8 + doc_id % 5 AS BIGINT) AS width,
         CAST(8 + doc_id % 3 AS BIGINT) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height, x.x AS x, y.y AS y,
         (((media_id + 3 * x.x + 7 * y.y) % 256)
          + ((2 * media_id + 5 * x.x + y.y) % 256)
          + ((3 * media_id + x.x + 4 * y.y) % 256)) // 3 AS gray
  FROM dims,
       unnest(generate_series(0, width - 1)) AS x(x),
       unnest(generate_series(0, height - 1)) AS y(y)
),
blocks AS (
  SELECT media_id, (y * 4) // height AS by, (x * 4) // width AS bx,
         SUM(gray) AS bs, COUNT(*) AS bn
  FROM px GROUP BY 1, 2, 3
),
tot AS (SELECT media_id, SUM(bs) AS ts, SUM(bn) AS tn FROM blocks GROUP BY 1),
ph AS (
  SELECT b.media_id,
         CAST(SUM(CASE WHEN b.bs * t.tn > t.ts * b.bn
                  THEN CAST(1 AS BIGINT) << CAST(4 * b.by + b.bx AS INTEGER)
                  ELSE 0 END) AS BIGINT) AS phash
  FROM blocks b JOIN tot t USING (media_id)
  GROUP BY 1
)
"""


@register(
    "dedup_phash_pairs",
    oracle=f"""
WITH {_PHASH_CTE}
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM ph a JOIN ph b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= 2
""",
    description=(
        "[EXT] image near-dup pairs by Hamming distance <= 2 over the "
        "codec-backed perceptual hash — the image rung of the dedup "
        "ladder. The Spark side NEVER does the all-pairs join: the "
        "16-bit hash splits into 3 bit-slice bands (6+5+5), and by "
        "pigeonhole any pair within Hamming 2 agrees exactly on at "
        "least one band, so candidates come from a hash-equi join on "
        "(band_idx, band_value) buckets — lossless, same shape as "
        "simhash banding, linear in bucket occupancy at 100 TB. The "
        "oracle computes the textbook quadratic join from the pixel "
        "rule; equality proves both the banding's losslessness and "
        "the codec-decoded hash."
    ),
)
def dedup_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pin: the codec-decoding pandas UDF feeds BOTH sides of the band
    # self-join — unpinned, Spark re-runs the decode subtree twice per
    # action (measured 11.2s -> pinned 7.0s at sf0.1)
    ph = (
        udf_multimodal_phash(spark, sf_dir)
        .select("media_id", "phash")
        .localCheckpoint(eager=True)
    )
    bands = ph.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("bi"), (F.col("phash") % 64).alias("bv")),
                F.struct(
                    F.lit(1).alias("bi"),
                    ((F.col("phash") / 64).cast("long") % 32).alias("bv"),
                ),
                F.struct(
                    F.lit(2).alias("bi"),
                    ((F.col("phash") / 2048).cast("long") % 32).alias("bv"),
                ),
            )
        ).alias("band"),
    ).select("media_id", "phash", F.col("band.bi").alias("bi"), F.col("band.bv").alias("bv"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("a.phash").alias("pa"),
            F.col("b.phash").alias("pb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("long")
        )
        .filter(F.col("hamming") <= 2)
        .select("media_a", "media_b", "hamming")
    )


AVRO_SCAN_N = 2000
_AVRO_SCAN_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "source", "type": "string"},
        {"name": "n_chars", "type": "long"},
        {"name": "note", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
    ],
}


_AVRO_UNION_SCHEMA = {
    "type": "record",
    "name": "UDoc",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "u", "type": ["null", "long", "string", "double"]},
    ],
}


@register(
    "source_avro_union_scan",
    oracle=f"""
WITH r AS (SELECT CAST(i AS BIGINT) AS i FROM range(0, {AVRO_SCAN_N}) t(i)),
rows AS (
  SELECT i % 5 AS grp,
         CASE WHEN i % 4 = 1 THEN i * 7 END AS m0,
         CASE WHEN i % 4 = 2 THEN 's' || CAST(i AS VARCHAR) END AS m1,
         CASE WHEN i % 4 = 3 THEN i * 0.5e0 END AS m2,
         CASE WHEN i % 4 = 0 THEN 1 ELSE 0 END AS is_null
  FROM r
)
SELECT grp,
       CAST(SUM(is_null) AS BIGINT) AS n_null,
       CAST(COUNT(m0) AS BIGINT) AS n_long,
       CAST(SUM(m0) AS BIGINT) AS sum_long,
       CAST(COUNT(m1) AS BIGINT) AS n_str,
       MAX(m1) AS max_str,
       CAST(COUNT(m2) AS BIGINT) AS n_dbl,
       SUM(m2) AS sum_dbl
FROM rows GROUP BY grp
""",
    description=(
        "[EXT] General (non-nullable multi-branch) Avro unions "
        "de-gated (r16, r15 verdict next-round #5): a four-file "
        "container whose u column is the 3-branch union "
        "null|long|string|double is decoded through read_avro's "
        "distributed path into the spark-avro struct-of-members "
        "convention (struct<member0: bigint, member1: string, "
        "member2: double>, whole struct NULL for the null branch), "
        "then aggregated per k%5 group: null-branch count, per-branch "
        "counts, exact long sum, lexicographic max string, and the "
        "double-branch sum (i*0.5 terms are dyadic, so the sum is "
        "exact and order-independent). The oracle recomputes every "
        "branch statistic from the i%4 closed form via range(), so a "
        "branch-index, member-mapping, or framing regression "
        "hash-mismatches. Branch encoding is interop-pinned both "
        "directions vs the org.apache.avro reference jars in the "
        "suite."
    ),
)
def source_avro_union_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..sources.avro_py import encode_container
    from ..sources.readers import read_avro

    rows = []
    for i in range(AVRO_SCAN_N):
        if i % 4 == 0:
            u = None
        elif i % 4 == 1:
            u = {"member0": i * 7, "member1": None, "member2": None}
        elif i % 4 == 2:
            u = {"member0": None, "member1": f"s{i}", "member2": None}
        else:
            u = {"member0": None, "member1": None, "member2": i * 0.5}
        rows.append({"k": i, "u": u})
    d = tempfile.mkdtemp(prefix="avro_union_")
    for part in range(4):
        with open(os.path.join(d, f"part-{part}.avro"), "wb") as f:
            f.write(
                encode_container(
                    rows[part::4], _AVRO_UNION_SCHEMA, codec="deflate"
                )
            )
    return (
        read_avro(spark, d)
        .select(
            (F.col("k") % 5).alias("grp"),
            F.col("u.member0").alias("m0"),
            F.col("u.member1").alias("m1"),
            F.col("u.member2").alias("m2"),
            F.col("u").isNull().cast("int").alias("is_null"),
        )
        .groupBy("grp")
        .agg(
            F.sum("is_null").cast("long").alias("n_null"),
            F.count("m0").cast("long").alias("n_long"),
            F.sum("m0").cast("long").alias("sum_long"),
            F.count("m1").cast("long").alias("n_str"),
            F.max("m1").alias("max_str"),
            F.count("m2").cast("long").alias("n_dbl"),
            F.sum("m2").alias("sum_dbl"),
        )
    )


@register(
    "sink_avro_roundtrip",
    oracle=f"""
WITH r AS (SELECT CAST(i AS BIGINT) AS i FROM range(0, {AVRO_SCAN_N}) t(i)),
rows AS (
  SELECT i % 4 AS grp,
         CASE WHEN i % 7 = 0 THEN NULL ELSE i * 3 END AS v,
         LENGTH('row-' || CAST(i AS VARCHAR)) AS slen,
         i % 3 AS n_arr
  FROM r
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_v,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(SUM(slen) AS BIGINT) AS sum_slen,
       CAST(SUM(n_arr) AS BIGINT) AS sum_arr
FROM rows GROUP BY grp
""",
    description=(
        "[EXT] Avro WRITE path (r16, r15 verdict next-round #6): a "
        "closed-form Spark frame (nullable long, string, array "
        "columns over range(N) in 4 partitions) is exported by "
        "writers.write_avro — which falls back to the pure-python "
        "distributed writer: per-partition Arrow batches encoded "
        "executor-side into one container file each (mapInArrow, so "
        "nullable longs never degrade through pandas float64) — then "
        "read back through read_avro's distributed decoder and "
        "aggregated per k%4 group. The oracle recomputes from the "
        "same closed form via range(), so a writer regression "
        "(schema derivation, nullable-union encoding, array framing, "
        "deflate blocks) hash-mismatches. The written files are also "
        "read by the org.apache.avro reference jars in the suite."
    ),
)
def sink_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.readers import read_avro
    from ..sources.writers import write_avro

    df = spark.range(0, AVRO_SCAN_N, 1, 4).selectExpr(
        "id AS k",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE id * 3 END AS v",
        "concat('row-', id) AS s",
        # NB not sequence(1, id % 3): Spark's sequence DESCENDS when
        # stop < start, so id % 3 = 0 would yield [1, 0], not []
        "slice(array(id, id * 2), 1, id % 3) AS arr",
    )
    d = tempfile.mkdtemp(prefix="avro_sink_")
    write_avro(df, d, codec="deflate", mode="overwrite")
    back = read_avro(spark, d)
    return (
        back.groupBy((F.col("k") % 4).alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("v").isNull().cast("int")).cast("long")
            .alias("n_null_v"),
            F.sum("v").cast("long").alias("sum_v"),
            F.sum(F.length("s")).cast("long").alias("sum_slen"),
            F.sum(F.size("arr")).cast("long").alias("sum_arr"),
        )
    )


@register(
    "sink_avro_timestamps",
    oracle=f"""
WITH r AS (SELECT CAST(i AS BIGINT) AS i FROM range(0, {AVRO_SCAN_N}) t(i)),
rows AS (
  SELECT i % 5 AS grp,
         TIMESTAMP '2024-01-01 00:00:00'
           + i * 37 * INTERVAL 1 SECOND AS ts,
         CASE WHEN i % 9 = 0 THEN NULL
              ELSE DATE '2024-01-01' + CAST(i % 400 AS INT) END AS d
  FROM r
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(ts) AS max_ts,
       MIN(ts) AS min_ts,
       CAST(COUNT(d) AS BIGINT) AS n_d,
       CAST(MAX(d) AS VARCHAR) AS max_d
FROM rows GROUP BY grp
""",
    description=(
        "[EXT] Avro logical types end-to-end (r16): a closed-form "
        "Spark frame with timestamp and nullable date columns rides "
        "write_avro -> long/timestamp-micros + int/date annotations "
        "(the spark-avro conventions) -> read_avro back to proper "
        "timestamp/date Spark columns, then per-group temporal "
        "aggregates. The oracle recomputes max/min timestamps and "
        "date counts from the same closed form via range(), so an "
        "epoch-conversion, tz, or annotation regression "
        "hash-mismatches. The reference org.apache.avro jars parse "
        "the written annotation in the suite."
    ),
)
def sink_avro_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.readers import read_avro
    from ..sources.writers import write_avro

    df = spark.range(0, AVRO_SCAN_N, 1, 4).selectExpr(
        "id AS k",
        "timestamp'2024-01-01 00:00:00'"
        " + make_interval(0,0,0,0,0,0, id*37) AS ts",
        "CASE WHEN id % 9 = 0 THEN NULL"
        " ELSE date'2024-01-01' + CAST(id % 400 AS INT) END AS d",
    )
    d = tempfile.mkdtemp(prefix="avro_ts_")
    write_avro(df, d, mode="overwrite")
    back = read_avro(spark, d)
    return (
        back.groupBy((F.col("k") % 5).alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("ts").alias("max_ts"),
            F.min("ts").alias("min_ts"),
            F.count("d").cast("long").alias("n_d"),
            # ISO string on BOTH engines: DuckDB's pandas fetch
            # renders DATE as midnight timestamps, Spark as dates
            F.max("d").cast("string").alias("max_d"),
        )
    )


@register(
    "source_avro_scan",
    oracle=f"""
WITH r AS (SELECT CAST(i AS BIGINT) AS i FROM range(0, {AVRO_SCAN_N}) t(i)),
rows AS (
  SELECT i AS doc_id,
         'src' || CAST(i % 5 AS VARCHAR) AS source,
         (i * i) % 997 AS n_chars,
         CASE WHEN i % 11 = 0 THEN NULL
              ELSE 'n' || CAST(i AS VARCHAR) END AS note,
         i % 3 AS n_tags
  FROM r
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(CASE WHEN note IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_notes,
       CAST(SUM(n_tags) AS BIGINT) AS sum_tags
FROM rows
GROUP BY source
""",
    description=(
        "[EXT] REAL Avro scan path WITHOUT the spark-avro connector "
        "(r15 — the env gate the Avro row carried since r1, closed "
        "for reads): a four-file Avro object container of closed-form "
        "rows (deflate codec, nullable union column, array column) is "
        "written by the spec-conformant pure-python encoder and read "
        "back through sources.read_avro, which falls back to the "
        "binaryFile + mapInPandas distributed decoder "
        "(sources/avro_py.py) — schema derived from one driver-side "
        "header read, blocks decoded executor-side, file-granular "
        "parallelism. The oracle recomputes the per-source aggregate "
        "from the same closed-form row rules via range(), so a decode "
        "regression (zigzag, union branch, block framing, codec) "
        "hash-mismatches. Codec interop is pinned both directions "
        "against the in-container org.apache.avro reference jars in "
        "the suite."
    ),
)
def source_avro_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..sources.avro_py import encode_container
    from ..sources.readers import read_avro

    rows = [
        {
            "doc_id": i,
            "source": f"src{i % 5}",
            "n_chars": (i * i) % 997,
            "note": None if i % 11 == 0 else f"n{i}",
            "tags": [f"t{j}" for j in range(i % 3)],
        }
        for i in range(AVRO_SCAN_N)
    ]
    d = tempfile.mkdtemp(prefix="avro_scan_")
    for part in range(4):
        with open(os.path.join(d, f"part-{part}.avro"), "wb") as f:
            f.write(
                encode_container(
                    rows[part::4], _AVRO_SCAN_SCHEMA, codec="deflate"
                )
            )
    return (
        read_avro(spark, d)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.when(F.col("note").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_notes"),
            F.sum(F.size("tags")).cast("long").alias("sum_tags"),
        )
    )
