"""Pure-python Apache Avro object-container codec + a DISTRIBUTED
Spark reader that needs no spark-avro connector jar.

The environment gate this closes (README, re-probed every round since
r7): pyspark here bundles avro-core but not the spark-avro datasource,
so ``spark.read.format("avro")`` fails and the Avro row in COVERAGE.md
sat as an env-gated partial. The format itself is public and simple
(Avro 1.11 spec, "Object Container Files"): a header with the writer
schema as JSON and a 16-byte sync marker, then blocks of
``(count, byte-length, serialized objects)`` separated by sync
markers, each object encoded with zigzag-varint longs, little-endian
IEEE floats, and length-prefixed bytes/strings.

Scale design (the part that must survive 100 TB): the reader is
``spark.read.format("binaryFile")`` over the file listing +
``mapInPandas`` decoding each file's blocks executor-side — the driver
only ever reads ONE header (to learn the writer schema and derive the
Spark schema before planning). Parallelism is file-granular: lake Avro
files are conventionally 64-512 MB, so a 100 TB dataset is ~1M files
and the listing itself fans out. What this deliberately does NOT do is
split WITHIN a file (spark-avro uses sync markers to split; a custom
DataSourceV2 could too) — with normal file sizing that costs nothing,
and one pathological multi-GB file degrades to one task, not a
failure. Codecs: null, deflate (raw DEFLATE per spec), and snappy
(block CRC32 suffix per spec) through pyarrow's bundled Codec.

r16 additions: general (non-nullable multi-branch) unions decode to
the spark-avro struct-of-members convention (struct<member0..>, one
per non-null branch, whole value null for the null branch) instead of
gating; and a WRITE path (write_avro_distributed) — per-partition
container files encoded executor-side from Arrow batches (mapInArrow,
so nullable ints never degrade through pandas float64), with the Avro
schema derived from the Spark schema (nullable -> null|T unions).

Verification: the encoder/decoder pair round-trips, and BOTH
directions interop with the in-container reference implementation —
the org.apache.avro jars that ship with Spark read our containers and
write containers we read (tests/test_ml_and_sources.py) — the same
independent-codec evidence standard as the r15 TIFF-LZW/JDK work.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Callable, Iterator

AVRO_MAGIC = b"Obj\x01"
SYNC_SIZE = 16


# -- varint / zigzag primitives (Avro spec "Binary encoding") ------------

def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise ValueError("Avro varint truncated")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("Avro varint too long")
    return (acc >> 1) ^ -(acc & 1)  # zigzag


def _write_long(out: bytearray, n: int) -> None:
    u = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)
    # python ints are unbounded; the line above matches 64-bit zigzag
    # for the int64 range this engine emits
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    if n < 0:
        raise ValueError("negative Avro byte length")
    data = buf.read(n)
    if len(data) != n:
        raise ValueError("Avro bytes truncated")
    return data


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_long(out, len(data))
    out.extend(data)


# -- schema -> decoder / encoder / Spark type -----------------------------

_PRIMITIVE_SPARK = {
    "null": "void",
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def _normalize(schema: Any) -> Any:
    """Strings name primitives or named-type references; dicts carry
    full definitions. Logical types decode as their base type (the
    documented subset — timestamps arrive as long micros)."""
    if isinstance(schema, str):
        return {"type": schema}
    if isinstance(schema, list):
        return schema
    return schema


def _union_shape(schema: list) -> tuple[list[str], list[int]]:
    """-> (branch type names, indices of the non-null branches)."""
    types = []
    for s in schema:
        n = _normalize(s)
        types.append(n["type"] if isinstance(n, dict) else "union")
    return types, [i for i, t in enumerate(types) if t != "null"]


def _decoder_for(schema: Any) -> Callable[[io.BytesIO], Any]:
    schema = _normalize(schema)
    if isinstance(schema, list):  # union
        branches = [_decoder_for(s) for s in schema]
        types, non_null = _union_shape(schema)
        if len(non_null) <= 1:
            # the lake-standard nullable column: value decodes bare

            def dec_union(buf, _b=branches, _t=types):
                i = _read_long(buf)
                if not 0 <= i < len(_b):
                    raise ValueError(f"Avro union branch {i} out of range")
                return _b[i](buf)

            return dec_union

        # general union (de-gated r16): decode to the spark-avro
        # convention — a struct of nullable fields member0..memberN-1,
        # one per NON-NULL branch, exactly one set (or None for the
        # null branch when present)
        member_of = {b: k for k, b in enumerate(non_null)}
        template = {f"member{k}": None for k in range(len(non_null))}

        def dec_union_general(
            buf, _b=branches, _t=types, _m=member_of, _tpl=template
        ):
            i = _read_long(buf)
            if not 0 <= i < len(_b):
                raise ValueError(f"Avro union branch {i} out of range")
            if _t[i] == "null":
                return None
            out = dict(_tpl)
            out[f"member{_m[i]}"] = _b[i](buf)
            return out

        return dec_union_general
    t = schema["type"]
    if t == "null":
        return lambda buf: None
    if t == "boolean":
        return lambda buf: buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long
    if t == "float":
        return lambda buf: struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return lambda buf: struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes
    if t == "string":
        return lambda buf: _read_bytes(buf).decode("utf-8")
    if t == "record":
        fields = [(f["name"], _decoder_for(f["type"])) for f in schema["fields"]]

        def dec_record(buf, _f=fields):
            return {name: d(buf) for name, d in _f}

        return dec_record
    if t == "array":
        item = _decoder_for(schema["items"])

        def dec_array(buf, _i=item):
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block form: count, byte size, items
                    n = -n
                    _read_long(buf)
                out.extend(_i(buf) for _ in range(n))

        return dec_array
    if t == "map":
        val = _decoder_for(schema["values"])

        def dec_map(buf, _v=val):
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    # key MUST be read before the value — assignment
                    # evaluates its right side first, so a one-liner
                    # subscript would consume the stream out of order
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _v(buf)

        return dec_map
    if t == "enum":
        symbols = schema["symbols"]

        def dec_enum(buf, _s=symbols):
            i = _read_long(buf)
            if not 0 <= i < len(_s):
                raise ValueError("Avro enum index out of range")
            return _s[i]

        return dec_enum
    if t == "fixed":
        size = schema["size"]
        return lambda buf, _n=size: buf.read(_n)
    raise NotImplementedError(f"Avro type {t!r} is outside the decoded subset")


def _encoder_for(schema: Any) -> Callable[[bytearray, Any], None]:
    schema = _normalize(schema)
    if isinstance(schema, list):  # union
        branches = [(_normalize(s), _encoder_for(s)) for s in schema]
        types, non_null = _union_shape(schema)
        if len(non_null) <= 1:
            # nullable column: pick the first matching branch

            def enc_union(out, v, _b=branches):
                for i, (bs, enc) in enumerate(_b):
                    t = bs["type"] if isinstance(bs, dict) else None
                    if v is None and t == "null":
                        _write_long(out, i)
                        return
                    if v is not None and t != "null":
                        _write_long(out, i)
                        enc(out, v)
                        return
                raise ValueError("no Avro union branch for value")

            return enc_union

        # general union: value is the member0..memberN-1 struct dict
        # (exactly one non-None member), or None for the null branch
        null_idx = next(
            (i for i, t in enumerate(types) if t == "null"), None
        )

        def enc_union_general(
            out, v, _b=branches, _nn=non_null, _null=null_idx
        ):
            if v is None:
                if _null is None:
                    raise ValueError("no null branch in Avro union")
                _write_long(out, _null)
                return
            set_members = [
                k for k in range(len(_nn))
                if v.get(f"member{k}") is not None
            ]
            if len(set_members) != 1:
                raise ValueError(
                    "general Avro union value must set exactly one "
                    f"memberK field, got {len(set_members)}"
                )
            k = set_members[0]
            _write_long(out, _nn[k])
            _b[_nn[k]][1](out, v[f"member{k}"])

        return enc_union_general
    t = schema["type"]
    if t == "null":
        return lambda out, v: None
    if t == "boolean":
        return lambda out, v: out.append(1 if v else 0)
    if t in ("int", "long"):
        kind = _logical_kind(schema)
        if kind in ("ts-us", "ts-ms"):
            import datetime as _dt

            epoch = _dt.datetime(1970, 1, 1)
            unit = _dt.timedelta(
                microseconds=1 if kind == "ts-us" else 1000
            )

            def enc_ts(out, v, _e=epoch, _u=unit):
                if not isinstance(v, int):
                    if getattr(v, "tzinfo", None) is not None:
                        # Arrow hands tz-aware datetimes for
                        # timestamp[us, tz=UTC] columns
                        v = v.astimezone(_dt.timezone.utc).replace(
                            tzinfo=None
                        )
                    v = (v - _e) // _u  # datetime/pd.Timestamp -> count
                _write_long(out, int(v))

            return enc_ts
        if kind == "date":
            import datetime as _dt

            epoch_d = _dt.date(1970, 1, 1)

            def enc_date(out, v, _e=epoch_d):
                if not isinstance(v, int):
                    v = (v - _e).days
                _write_long(out, int(v))

            return enc_date
        return lambda out, v: _write_long(out, int(v))
    if t == "float":
        return lambda out, v: out.extend(struct.pack("<f", float(v)))
    if t == "double":
        return lambda out, v: out.extend(struct.pack("<d", float(v)))
    if t == "bytes":
        return lambda out, v: _write_bytes(out, bytes(v))
    if t == "string":
        return lambda out, v: _write_bytes(out, str(v).encode("utf-8"))
    if t == "record":
        fields = [(f["name"], _encoder_for(f["type"])) for f in schema["fields"]]

        def enc_record(out, v, _f=fields):
            for name, enc in _f:
                enc(out, v[name])

        return enc_record
    if t == "array":
        item = _encoder_for(schema["items"])

        def enc_array(out, v, _i=item):
            if v:
                _write_long(out, len(v))
                for x in v:
                    _i(out, x)
            _write_long(out, 0)

        return enc_array
    if t == "map":
        val = _encoder_for(schema["values"])

        def enc_map(out, v, _v=val):
            if v is not None and not hasattr(v, "items"):
                v = dict(v)  # Arrow hands maps over as [(k, v), ...]
            if v:
                _write_long(out, len(v))
                for k, x in v.items():
                    _write_bytes(out, str(k).encode("utf-8"))
                    _v(out, x)
            _write_long(out, 0)

        return enc_map
    if t == "enum":
        symbols = {s: i for i, s in enumerate(schema["symbols"])}
        return lambda out, v, _s=symbols: _write_long(out, _s[v])
    if t == "fixed":
        size = schema["size"]

        def enc_fixed(out, v, _n=size):
            if len(v) != _n:
                raise ValueError("Avro fixed size mismatch")
            out.extend(v)

        return enc_fixed
    raise NotImplementedError(f"Avro type {t!r} is outside the encoded subset")


_LOGICAL_SPARK = {
    # Avro logical annotations -> Spark types (r16; the binary wire
    # encoding is the unchanged base type, so codec interop is free —
    # this layer is the spark-avro-convention TYPE mapping)
    ("long", "timestamp-micros"): "timestamp",
    ("long", "timestamp-millis"): "timestamp",
    ("long", "local-timestamp-micros"): "timestamp_ntz",
    ("long", "local-timestamp-millis"): "timestamp_ntz",
    ("int", "date"): "date",
}


def _logical_kind(schema: Any):
    """-> 'ts-us' | 'ts-ms' | 'date' | None for a (possibly nullable-
    union) field schema — the value-conversion tag the distributed
    reader/writer use on top of the base-type codec."""
    schema = _normalize(schema)
    if isinstance(schema, list):
        non_null = [s for s in schema if _normalize(s)["type"] != "null"]
        return _logical_kind(non_null[0]) if len(non_null) == 1 else None
    lt = schema.get("logicalType")
    t = schema.get("type")
    if t == "long" and lt in ("timestamp-micros", "local-timestamp-micros"):
        return "ts-us"
    if t == "long" and lt in ("timestamp-millis", "local-timestamp-millis"):
        return "ts-ms"
    if t == "int" and lt == "date":
        return "date"
    return None


def avro_schema_to_spark_ddl(schema: Any) -> str:
    """Writer record schema -> Spark DDL string for createDataFrame/
    mapInPandas. Unions must be null|X (the lake-standard nullable
    column); richer unions need a real connector and raise."""
    schema = _normalize(schema)
    if isinstance(schema, dict):
        mapped = _LOGICAL_SPARK.get(
            (schema.get("type"), schema.get("logicalType"))
        )
        if mapped:
            return mapped
    if isinstance(schema, list):
        non_null = [s for s in schema if _normalize(s)["type"] != "null"]
        if len(non_null) == 0:
            raise NotImplementedError("bare null union column")
        if len(non_null) == 1:
            return avro_schema_to_spark_ddl(non_null[0])
        # general union (de-gated r16): the spark-avro convention —
        # struct<member0: T0, ...> over the non-null branches, the
        # struct itself null for a null-branch value
        inner = ", ".join(
            f"member{k}: {avro_schema_to_spark_ddl(s)}"
            for k, s in enumerate(non_null)
        )
        return f"struct<{inner}>"
    t = schema["type"]
    if t in _PRIMITIVE_SPARK:
        if t == "null":
            raise NotImplementedError("bare null column")
        return _PRIMITIVE_SPARK[t]
    if t == "record":
        inner = ", ".join(
            f"{f['name']}: {avro_schema_to_spark_ddl(f['type'])}"
            for f in schema["fields"]
        )
        return f"struct<{inner}>"
    if t == "array":
        return f"array<{avro_schema_to_spark_ddl(schema['items'])}>"
    if t == "map":
        return f"map<string, {avro_schema_to_spark_ddl(schema['values'])}>"
    if t == "enum":
        return "string"
    if t == "fixed":
        return "binary"
    raise NotImplementedError(f"Avro type {t!r} has no Spark mapping here")


def record_ddl(schema: Any) -> str:
    """Top-level record schema -> 'name type, ...' mapInPandas DDL."""
    schema = _normalize(schema)
    if schema.get("type") != "record":
        raise ValueError("Avro container root must be a record")
    return ", ".join(
        f"{f['name']} {avro_schema_to_spark_ddl(f['type'])}"
        for f in schema["fields"]
    )


# -- container files ------------------------------------------------------

def _decompress(codec: str, block: bytes) -> bytes:
    if codec in ("", "null"):
        return block
    if codec == "deflate":  # raw DEFLATE, no zlib wrapper (spec)
        return zlib.decompress(block, -15)
    if codec == "snappy":  # 4-byte big-endian CRC32 of the plaintext
        import pyarrow as pa

        # raw snappy leads with its plaintext length as an LE varint;
        # pyarrow's Codec insists on being told the size, so read it
        if len(block) < 5:  # at least 1 varint byte + 4-byte CRC
            raise ValueError("corrupt Avro snappy block")
        body, size, shift, i = block[:-4], 0, 0, 0
        while True:
            if i >= len(body):
                raise ValueError("corrupt Avro snappy block")
            size |= (body[i] & 0x7F) << shift
            if not body[i] & 0x80:
                break
            i += 1
            shift += 7
        plain = pa.Codec("snappy").decompress(body, decompressed_size=size)
        plain = plain.to_pybytes() if hasattr(plain, "to_pybytes") else plain
        if struct.pack(">I", zlib.crc32(plain) & 0xFFFFFFFF) != block[-4:]:
            raise ValueError("Avro snappy block CRC mismatch")
        return plain
    raise NotImplementedError(f"Avro codec {codec!r} needs a real library")


def _compress(codec: str, block: bytes) -> bytes:
    if codec in ("", "null"):
        return block
    if codec == "deflate":
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        return c.compress(block) + c.flush()
    if codec == "snappy":
        import pyarrow as pa

        comp = pa.Codec("snappy").compress(block)
        comp = comp.to_pybytes() if hasattr(comp, "to_pybytes") else comp
        return comp + struct.pack(">I", zlib.crc32(block) & 0xFFFFFFFF)
    raise NotImplementedError(f"Avro codec {codec!r} needs a real library")


def parse_container_header(content: bytes):
    """-> (schema dict, codec str, sync bytes, header byte length)."""
    buf = io.BytesIO(content)
    if buf.read(4) != AVRO_MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)  # block byte size, unused
        for _ in range(n):
            key = _read_bytes(buf).decode("utf-8")
            meta[key] = _read_bytes(buf)
    sync = buf.read(SYNC_SIZE)
    if len(sync) != SYNC_SIZE:
        raise ValueError("Avro header truncated before sync marker")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync, buf.tell()


def decode_container(content: bytes) -> Iterator[dict]:
    """Yield every record of an Avro object container as a dict."""
    schema, codec, sync, pos = parse_container_header(content)
    dec = _decoder_for(schema)
    buf = io.BytesIO(content)
    buf.seek(pos)
    while buf.tell() < len(content):
        n_obj = _read_long(buf)
        n_bytes = _read_long(buf)
        block = buf.read(n_bytes)
        if len(block) != n_bytes:
            raise ValueError("Avro block truncated")
        if buf.read(SYNC_SIZE) != sync:
            raise ValueError("Avro sync marker mismatch")
        bbuf = io.BytesIO(_decompress(codec, block))
        for _ in range(n_obj):
            yield dec(bbuf)


def encode_container(
    records: list[dict],
    schema: dict,
    codec: str = "null",
    records_per_block: int = 1000,
    sync: bytes = b"\x07" * SYNC_SIZE,
) -> bytes:
    """Spec-conformant writer (fixture generator + export sink; the
    deterministic sync marker keeps fixtures byte-reproducible)."""
    enc = _encoder_for(schema)
    out = bytearray()
    out.extend(AVRO_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.extend(sync)
    for i in range(0, len(records), records_per_block):
        chunk = records[i : i + records_per_block]
        body = bytearray()
        for r in chunk:
            enc(body, r)
        block = _compress(codec, bytes(body))
        _write_long(out, len(chunk))
        _write_long(out, len(block))
        out.extend(block)
        out.extend(sync)
    return bytes(out)


# -- the distributed reader ------------------------------------------------

def read_avro_distributed(spark, path: str):
    """Avro scan WITHOUT the spark-avro connector: one driver-side
    header read derives the schema, then ``binaryFile`` + mapInPandas
    decodes every file's blocks executor-side (file-granular
    parallelism — see the module docstring for the 100 TB story).
    Column pruning happens after decode (a connector could push it
    into the datum reader); predicate pushdown is Catalyst's on the
    decoded frame."""
    import pandas as pd  # noqa: F401 (executor-side import below)

    files = spark.read.format("binaryFile").load(path)
    first = files.select("path", "content").head()  # header parse only
    if first is None:
        raise ValueError(f"no Avro files under {path}")
    schema, _, _, _ = parse_container_header(bytes(first["content"]))
    ddl = record_ddl(schema)
    field_names = [f["name"] for f in schema["fields"]]
    # logical-type columns (r16): the wire codec yields base ints;
    # the reader converts to the spark-avro-convention value types
    kinds = {f["name"]: _logical_kind(f["type"]) for f in schema["fields"]}

    def run(batches):
        import pandas as pd

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                content = bytes(content)
                # mixed-schema directories fail loudly, naming the
                # file, instead of a KeyError / misdecoded columns
                # (the driver derived the schema from ONE file)
                fschema, _, _, _ = parse_container_header(content)
                fnames = [f["name"] for f in fschema["fields"]]
                if fnames != field_names:
                    raise ValueError(
                        f"Avro schema mismatch in {fpath}: fields "
                        f"{fnames} != driver-derived {field_names}"
                    )
                rows = list(decode_container(content))
                out = pd.DataFrame(
                    {n: [r[n] for r in rows] for n in field_names}
                )
                for n, kind in kinds.items():
                    if kind == "ts-us":
                        out[n] = pd.to_datetime(out[n], unit="us")
                    elif kind == "ts-ms":
                        out[n] = pd.to_datetime(out[n], unit="ms")
                    elif kind == "date":
                        out[n] = pd.to_datetime(out[n], unit="D").dt.date
                yield out

    return files.select("path", "content").mapInPandas(run, schema=ddl)


# -- the distributed writer (r16) ------------------------------------------

def spark_schema_to_avro(schema, name: str = "spark_export") -> dict:
    """Spark StructType -> Avro record schema (the write-side twin of
    avro_schema_to_spark_ddl): nullable fields become ["null", T]
    unions, arrays/maps/structs nest, nested records get path-derived
    names (Avro requires unique names). Timestamps map to
    long/timestamp-micros, TimestampNTZ to local-timestamp-micros and
    dates to int/date (r16 — the spark-avro conventions); decimal
    keeps a NotImplementedError gate (export as string or unscaled
    long upstream)."""
    from pyspark.sql import types as T

    def conv(dt, path):
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.TimestampNTZType):
            return {"type": "long", "logicalType": "local-timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            return "int"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.ArrayType):
            item = conv(dt.elementType, path + "_item")
            if dt.containsNull:
                item = ["null", item]
            return {"type": "array", "items": item}
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise NotImplementedError(
                    "Avro maps require string keys"
                )
            val = conv(dt.valueType, path + "_value")
            if dt.valueContainsNull:
                val = ["null", val]
            return {"type": "map", "values": val}
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": path,
                "fields": [
                    {
                        "name": f.name,
                        "type": (
                            ["null", conv(f.dataType, f"{path}_{f.name}")]
                            if f.nullable
                            else conv(f.dataType, f"{path}_{f.name}")
                        ),
                    }
                    for f in dt.fields
                ],
            }
        raise NotImplementedError(
            f"Spark type {dt.simpleString()} has no Avro container "
            "mapping here (decimal: export as string/unscaled-long "
            "upstream; timestamps and dates map since r16)"
        )

    return conv(schema, name)


def write_avro_distributed(
    df, path: str, codec: str = "deflate", mode: str = "error"
):
    """Avro sink WITHOUT the spark-avro connector: one container file
    per partition, encoded executor-side from Arrow batches (mapInArrow
    keeps nullable ints as ints — a pandas round trip would degrade
    them to float64). Returns the per-file (path, n_rows) manifest the
    write action produced. Same placement caveat as any direct-write
    sink: executors write to `path` on THEIR filesystem — on a real
    cluster that must be shared storage (NFS/FUSE-mounted object
    store); single-node local[*] (this container) it is just the local
    directory."""
    import os
    import shutil

    if os.path.exists(path):
        if mode == "error":
            raise ValueError(f"path exists: {path} (mode='error')")
        if mode != "overwrite":
            raise ValueError(f"unsupported mode {mode!r}")
        shutil.rmtree(path)
    os.makedirs(path)
    schema = spark_schema_to_avro(df.schema)

    def run(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        rows = []
        for batch in batches:
            rows.extend(batch.to_pylist())
        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        with open(fname, "wb") as f:
            f.write(encode_container(rows, schema, codec=codec))
        yield pa.RecordBatch.from_pydict(
            {"path": [fname], "n_rows": [len(rows)]},
            schema=pa.schema(
                [("path", pa.string()), ("n_rows", pa.int64())]
            ),
        )

    manifest = df.mapInArrow(run, schema="path string, n_rows long").collect()
    return [(r["path"], r["n_rows"]) for r in manifest]
