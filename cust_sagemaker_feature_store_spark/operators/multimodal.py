"""Multimodal column support (SURVEY.md §2.10 [EXT]).

Images/audio/video are opaque `binary` columns with a typed metadata
struct; all Spark-side plumbing — schema, partition-preserving
mapInPandas, Arrow batch shapes — is real and tested. The codec layer
has three REAL paths with zero dependencies: uncompressed 24-bit BMP
(`encode_bmp`/`decode_bmp`, pure numpy + struct — header parse, row
padding, both row orders), 8-bit truecolor PNG
(`encode_png`/`decode_png`, stdlib zlib + all five RFC 2083 scanline
filters), and 16-bit PCM RIFF/WAVE audio (`encode_wav`/`decode_wav`,
r13 — chunk walk with odd-length padding, zero-copy PCM
reinterpret); `decode_media` dispatches on the BM / \\x89PNG / RIFF
magics. Remaining compressed formats (JPEG, compressed audio, video)
still need PIL/libsndfile/ffmpeg, absent in this container: for those,
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


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels, row_filters=None) -> bytes:
    """Minimal truecolor 8-bit PNG writer from an (H, W, 3) or
    (H, W, 4) uint8 array — pure stdlib zlib + struct + numpy; the
    format is public (RFC 2083). `row_filters` optionally assigns a
    PNG filter type (0=None 1=Sub 2=Up 3=Average 4=Paeth) to each
    scanline so fixtures can exercise every de-filter path; default is
    filter 0 everywhere."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] not in (3, 4):
        raise ValueError("encode_png expects an (H, W, 3|4) uint8 array")
    h, w, ch = px.shape
    if row_filters is None:
        row_filters = [0] * h
    if len(row_filters) != h:
        raise ValueError("row_filters must have one entry per scanline")

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    raw = px.astype(np.int16)
    prev = np.zeros((w, ch), dtype=np.int16)
    scanlines = bytearray()
    for y in range(h):
        row = raw[y]
        f = int(row_filters[y])
        left = np.vstack([np.zeros((1, ch), np.int16), row[:-1]])
        if f == 0:
            filt = row
        elif f == 1:  # Sub
            filt = row - left
        elif f == 2:  # Up
            filt = row - prev
        elif f == 3:  # Average
            filt = row - (left + prev) // 2
        elif f == 4:  # Paeth
            ul = np.vstack([np.zeros((1, ch), np.int16), prev[:-1]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = row - pred
        else:
            raise ValueError(f"unknown PNG filter {f}")
        scanlines.append(f)
        scanlines.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if ch == 3 else 6, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scanlines)))
        + chunk(b"IEND", b"")
    )


def decode_png(content: bytes):
    """Real pure-stdlib PNG decoder for truecolor 8-bit images (color
    type 2 = RGB, 6 = RGBA), non-interlaced: chunk walk, zlib inflate,
    and all five scanline de-filters (None/Sub/Up/Average/Paeth, RFC
    2083 §6) reconstructed row-by-row in numpy with the sequential
    Sub/Average/Paeth carry done per pixel. Returns an (H, W, 3|4)
    uint8 array. Raises ValueError on non-PNG/corrupt bytes and
    NotImplementedError on palette/gray/16-bit/interlaced PNGs — the
    gate that remains for formats needing a real codec library."""
    import struct
    import zlib

    import numpy as np

    if len(content) < 8 or content[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG stream")
    pos, ihdr, idat, seen_end = 8, None, bytearray(), False
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4 : pos + 8]
        payload = content[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            seen_end = True
            break
        pos += 12 + length  # length + tag + payload + crc
    if ihdr is None or not seen_end or not idat:
        raise ValueError("missing IHDR/IDAT/IEND")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if depth != 8 or color not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"PNG depth {depth} / color type {color} / interlace "
            f"{interlace} needs a real codec library; only 8-bit "
            "truecolor (2, 6) non-interlaced decodes here"
        )
    ch = 3 if color == 2 else 4
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, w, ch), dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        f = raw[y * (1 + stride)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).reshape(w, ch).astype(np.int32)
        if f == 0:
            rec = row
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f in (1, 3, 4):  # Sub/Average/Paeth carry left-to-right
            rec = np.zeros((w, ch), dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                up = prev[x]
                ul = prev[x - 1] if x > 0 else np.zeros(ch, np.int32)
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = (
                        np.abs(p - left), np.abs(p - up), np.abs(p - ul),
                    )
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, up, ul),
                    )
                left = (row[x] + pred) % 256
                rec[x] = left
        else:
            raise ValueError(f"invalid PNG filter byte {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE writer for 16-bit integer PCM: an (N,) mono
    or (N, C) interleavable int16 array becomes the canonical
    fmt+data layout. Pure numpy + struct; the format is public
    (Microsoft RIFF WAVE, fmt tag 1 = PCM)."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("encode_wav expects an (N,) or (N, C) array")
    ch = s.shape[1]
    data = s.astype("<i2").tobytes()  # row-major = interleaved frames
    block = 2 * ch
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(content: bytes):
    """Real pure-stdlib RIFF/WAVE decoder for 16-bit integer PCM
    (format tag 1): chunk walk honoring RIFF's odd-length padding
    byte and skipping unknown chunks (LIST, fact, ...), then one
    zero-copy reinterpret of the data payload. Returns
    (samples as (N, C) int16 numpy, sample_rate). Raises ValueError
    on non-WAV/corrupt bytes and NotImplementedError on non-PCM
    encodings (IEEE float, ADPCM, mu-law) or bit depths != 16 — the
    gate that remains for formats needing a real codec library."""
    import struct

    import numpy as np

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        (length,) = struct.unpack_from("<I", content, pos + 4)
        payload = content[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            fmt = payload
        elif tag == b"data":
            data = payload
        pos += 8 + length + (length & 1)  # odd chunks pad one byte
    if fmt is None or data is None:
        raise ValueError("missing fmt /data chunk")
    if len(fmt) < 16:
        raise ValueError("fmt chunk too short")
    fmt_tag, ch, rate, _, block, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if fmt_tag != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format tag {fmt_tag} / {bits}-bit needs a real codec "
            "library; only 16-bit integer PCM decodes here"
        )
    if ch < 1 or block != 2 * ch or len(data) % block:
        raise ValueError("inconsistent WAV block alignment")
    return np.frombuffer(data, dtype="<i2").reshape(-1, ch), int(rate)


def decode_media(content: bytes, kind: str, strict: bool = False) -> list[float]:
    """The codec hook. Uncompressed 24-bit BMP and 8-bit truecolor PNG
    images decode FOR REAL (pure-numpy `decode_bmp` / stdlib-zlib
    `decode_png`): the feature vector is [width, height, mean_r,
    mean_g, mean_b] with exact int sums and one division each (PNG
    alpha, when present, is ignored for the shared 5-float shape).
    16-bit PCM RIFF/WAVE audio decodes FOR REAL too (`decode_wav`,
    r13): [sample_rate, n_channels, n_frames, mean_abs,
    zero_crossings] — exact int64 |sample| sum with ONE division, and
    strict sign-change crossings on channel 0. Everything else still
    needs PIL/libsndfile/ffmpeg, absent in this container:
    strict=True raises for those formats; strict=False falls back to
    the deterministic fake."""
    px = None
    if kind == "image" and content:
        if content[:2] == b"BM" and len(content) >= 54:
            px = decode_bmp(content)
        elif content[:8] == PNG_SIGNATURE:
            px = decode_png(content)
    if px is not None:
        h, w = px.shape[:2]
        sums = px[:, :, :3].reshape(-1, 3).sum(axis=0, dtype="int64")
        n = h * w
        return [float(w), float(h)] + [float(int(s)) / n for s in sums]
    if kind == "audio" and content[:4] == b"RIFF":
        import numpy as np

        s, rate = decode_wav(content)
        n, ch = s.shape
        mean_abs = float(int(np.abs(s.astype(np.int64)).sum())) / (n * ch)
        c0 = s[:, 0].astype(np.int64)
        zc = int(((c0[:-1] * c0[1:]) < 0).sum()) if n > 1 else 0
        return [float(rate), float(ch), float(n), mean_abs, float(zc)]
    if strict:
        raise NotImplementedError(
            "real media decoding beyond uncompressed BMP, 8-bit "
            "truecolor PNG, and 16-bit PCM WAV requires "
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


def resize_nearest(pixels, out_w: int, out_h: int):
    """REAL nearest-neighbor resize of an (H, W, C) uint8 array: output
    pixel (x, y) samples source pixel ((x*W)//out_w, (y*H)//out_h) —
    pure integer index mapping, so the result is bit-exact and
    oracle-expressible (the de-gated rung of resize_stub; a real
    pipeline would swap in an area/bilinear kernel behind the same
    signature)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]
    sx = (np.arange(out_w, dtype=np.int64) * w) // out_w
    sy = (np.arange(out_h, dtype=np.int64) * h) // out_h
    return px[sy][:, sx]


# Toy frame container: b"FRMS" + u32 frame count + per frame
# (u32 payload length + payload). Stands in for a real media container
# so the frame-sampling path exercises REAL parse + per-frame codec
# decode end-to-end; swapping in ffmpeg means replacing exactly these
# two functions behind the same signatures.
_FRAMES_MAGIC = b"FRMS"


def encode_frames(frames) -> bytes:
    """Pack a list of encoded frame payloads (e.g. BMP bytes) into the
    length-prefixed FRMS container."""
    import struct

    out = [_FRAMES_MAGIC, struct.pack("<I", len(frames))]
    for payload in frames:
        out.append(struct.pack("<I", len(payload)))
        out.append(payload)
    return b"".join(out)


def decode_frames(content: bytes) -> list[bytes]:
    """Parse the FRMS container back into its frame payloads; strict
    bounds checks so truncated containers fail loudly, not silently."""
    import struct

    if content[:4] != _FRAMES_MAGIC:
        raise ValueError("not a FRMS container")
    (n,) = struct.unpack_from("<I", content, 4)
    off = 8
    frames = []
    for _ in range(n):
        if off + 4 > len(content):
            raise ValueError("truncated FRMS header")
        (ln,) = struct.unpack_from("<I", content, off)
        off += 4
        if off + ln > len(content):
            raise ValueError("truncated FRMS payload")
        frames.append(content[off : off + ln])
        off += ln
    if off != len(content):
        raise ValueError("trailing bytes after FRMS frames")
    return frames
