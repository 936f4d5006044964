"""Multimodal column support (SURVEY.md §2.10 [EXT]).

Images/audio/video are opaque `binary` columns with a typed metadata
struct; all Spark-side plumbing — schema, partition-preserving
mapInPandas, Arrow batch shapes — is real and tested. The codec layer
has one REAL path with zero dependencies: uncompressed 24-bit BMP
(`encode_bmp`/`decode_bmp`, pure numpy + struct — header parse, row
padding, both row orders), which `decode_media` dispatches on the BM
magic. Compressed formats (JPEG/PNG/audio/video) still need
PIL/libsndfile/ffmpeg, absent in this container: for those,
`decode_media(..., strict=True)` raises NotImplementedError at the
exact hook point, and strict=False falls back to a clearly-marked
deterministic fake.

At 100 TB: media bytes never shuffle — mapInPandas is a narrow
transform over the scan, and derived features (small fixed-size
vectors) are what downstream joins/aggregations carry.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature_vec", T.ArrayType(T.FloatType())),
    ]
)


def fake_decode_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: byte-histogram moments
    folded into `dim` floats. Stable across runs/partitions, so tests
    can assert exact values. NOT a real embedding."""
    if not content:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(content):
        acc[i % dim] = (acc[i % dim] + b) % 100_000
    n = len(content)
    return [round(a / n, 6) for a in acc]


def encode_bmp(pixels) -> bytes:
    """Minimal 24-bit uncompressed (BI_RGB) bottom-up BMP writer from an
    (H, W, 3) uint8 RGB array — fixture generator for the real decode
    path and a usable sink for small rasters. Pure numpy + struct; the
    format is public (Windows BITMAPFILEHEADER/BITMAPINFOHEADER)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects an (H, W, 3) RGB array")
    h, w = px.shape[:2]
    row_size = (3 * w + 3) // 4 * 4  # rows pad to 4-byte multiples
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 0, 0, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    return header + rows.tobytes()


def decode_bmp(content: bytes):
    """Real pure-numpy BMP decoder for the uncompressed 24-bit (BI_RGB)
    format: parses the file + info headers, honors the pixel-data
    offset, row padding, and both row orders (positive height =
    bottom-up, negative = top-down). Returns an (H, W, 3) uint8 RGB
    array. Raises ValueError on non-BMP bytes and NotImplementedError
    on compressed/other-depth BMPs — the gate that remains for formats
    needing a real codec library."""
    import struct

    import numpy as np

    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP stream")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", content, 14)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if hdr_size < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP depth {bpp} / compression {compression} needs a real "
            "codec library; only uncompressed 24-bit BI_RGB decodes here"
        )
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError("degenerate BMP dimensions")
    row_size = (3 * w + 3) // 4 * 4
    need = data_offset + row_size * h
    if len(content) < need:
        raise ValueError(f"truncated BMP: {len(content)} < {need} bytes")
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)
    px = rows[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:  # bottom-up: last stored row is the top
        px = px[::-1]
    return px.copy()


def decode_media(content: bytes, kind: str, strict: bool = False) -> list[float]:
    """The codec hook. Uncompressed 24-bit BMP images decode FOR REAL
    (pure-numpy `decode_bmp`): the feature vector is [width, height,
    mean_r, mean_g, mean_b] with exact int sums and one division each.
    Everything else still needs PIL/libsndfile/ffmpeg, absent in this
    container: strict=True raises for those formats; strict=False falls
    back to the deterministic fake."""
    if kind == "image" and content and content[:2] == b"BM" and len(content) >= 54:
        px = decode_bmp(content)
        h, w = px.shape[:2]
        sums = px.reshape(-1, 3).sum(axis=0, dtype="int64")
        n = h * w
        return [float(w), float(h)] + [float(int(s)) / n for s in sums]
    if strict:
        raise NotImplementedError(
            "real media decoding beyond uncompressed BMP requires "
            "PIL/libsndfile/ffmpeg, not present in this environment; "
            "wire the codec here"
        )
    return fake_decode_features(content)


def extract_media_features(df: DataFrame, batch_limit: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, narrow (no
    shuffle), media bytes dropped from the output so only compact
    features flow downstream."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # bound per-batch memory: media rows are large
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                out = pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "kind": chunk["kind"],
                        "n_bytes": chunk["content"].map(
                            lambda c: 0 if c is None else len(c)
                        ),
                        "content_hash": chunk["content"].map(
                            lambda c: hashlib.md5(c or b"").hexdigest()
                        ),
                        "feature_vec": chunk.apply(
                            lambda r: decode_media(r["content"], r["kind"]), axis=1
                        ),
                    }
                )
                yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    at `every_ms` intervals of `meta.duration_ms` — the real 1:N
    fan-out shape (mapInPandas as a UDTF), still narrow/no-shuffle.
    The frame payload is a deterministic byte slice standing in for an
    ffmpeg-decoded frame; wire the codec in decode_media."""

    cols = ["media_id", "frame_index", "frame_ms", "frame_bytes"]

    def _dur(meta) -> int:
        if meta is None:
            return 0
        d = meta.get("duration_ms") if isinstance(meta, dict) else meta["duration_ms"]
        return int(d or 0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            # the offset math is vectorized over the whole Arrow batch
            # (r2 review: iterrows over binary blobs was the slow shape);
            # only the frame slice — the codec boundary — touches Python
            # objects, one call per OUTPUT frame, same as a real decoder.
            contents = [c or b"" for c in pdf["content"]]
            clen = np.fromiter(map(len, contents), dtype=np.int64, count=len(contents))
            dur = np.fromiter(map(_dur, pdf["meta"]), dtype=np.int64, count=len(pdf))
            n_frames = np.maximum(1, dur // every_ms)
            row_idx = np.repeat(np.arange(len(pdf)), n_frames)
            starts = np.concatenate(([0], np.cumsum(n_frames)[:-1]))
            fidx = np.arange(len(row_idx)) - np.repeat(starts, n_frames)
            nf, cl = n_frames[row_idx], clen[row_idx]
            lo, hi = (fidx * cl) // nf, ((fidx + 1) * cl) // nf
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[row_idx],
                    "frame_index": fidx.astype(np.int32),
                    "frame_ms": fidx * every_ms,
                    "frame_bytes": [
                        contents[r][a:b] for r, a, b in zip(row_idx, lo, hi)
                    ],
                },
                columns=cols,
            )

    return df.filter(F.col("kind") == "video").mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes bytes through the same narrow
    mapInPandas shape a real resize would use; records the requested
    geometry in meta. Codec intentionally absent (see module docstring)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["meta"] = pdf["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield pdf

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)
