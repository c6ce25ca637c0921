"""Avro binary + OCF codec — dependency-free implementation of the public
Apache Avro 1.11 specification (binary encoding + object container files).

Reference surface: the `avro` scanner turns an OCF stream into one message
per record (/root/reference/internal/impl/avro/scanner.go:46, goavro OCF
reader; `avro_raw_json: true` = goavro's "standard JSON" mode where union
values are unwrapped), and the avro processor converts binary <-> JSON
(internal/impl/avro/processor.go:21). No avro wheel or spark-avro jar
ships in this sandbox, so — like the msgpack codec
(operators/msgpack_codec.py) — the wire format is implemented directly
from the published spec, which also un-gates the YAML surface that was
previously jar-gated.

Supported schema: null, boolean, int, long (zigzag varints), float,
double, bytes, string, record, enum, fixed, array, map, and 2-branch
nullable unions (["null", T] either order). Wider unions raise — the
DataFrame output type must be static. Logical types decode as their base.

DataFrame surface (mapInPandas, Arrow batches; per-row Python is inherent
to a per-message binary codec — parity path, not the 100 TB hot path):
- avro_record_encode: selected columns -> one single-record binary blob
  per row (schema given as Avro JSON).
- avro_record_decode: blob -> typed struct-per-field columns (output DDL
  derived FROM the Avro schema, so the two stay consistent by
  construction).
- avro_ocf_scan: a binary column holding whole OCF files -> one row per
  contained record, content rendered as standard JSON (schema comes from
  each file's own header — the "schema-carrying files" property).
- ocf_encode / ocf_decode: python-level container read/write (null and
  deflate codecs), used by the scanner, tests, and fixtures.
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame

OCF_MAGIC = b"Obj\x01"

# --------------------------------------------------------------------------
# schema handling
# --------------------------------------------------------------------------


def parse_schema(schema_json: str | dict | list):
    """Parse an Avro JSON schema (string form accepted); resolves the
    shorthand 'string' / {'type': 'string'} equivalence lazily in the
    codec."""
    if isinstance(schema_json, str):
        s = schema_json.strip()
        if s.startswith(("{", "[", '"')):
            return json.loads(s)
        return s  # bare primitive name
    return schema_json


_PRIMS = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _stype(schema) -> str:
    """The schema's type tag ('record', 'array', 'union', primitive...)."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    t = schema["type"]
    # {'type': 'array', ...} vs {'type': {'type': 'array'...}} nesting
    return t if isinstance(t, str) else _stype(t)


def _nullable_branch(schema: list):
    """For a 2-branch union with 'null', the non-null branch; else None."""
    if len(schema) == 2:
        tags = [_stype(b) for b in schema]
        if "null" in tags:
            return schema[1] if tags[0] == "null" else schema[0]
    return None


def avro_to_ddl(schema) -> str:
    """Spark DDL type for an Avro schema (records -> struct, enum ->
    string, fixed -> binary, nullable unions -> inner type)."""
    schema = parse_schema(schema)
    t = _stype(schema)
    if t == "union":
        inner = _nullable_branch(schema)
        if inner is None:
            raise ValueError(
                f"unsupported Avro union {schema!r}: only 2-branch nullable "
                "unions map to a static column type"
            )
        return avro_to_ddl(inner)
    if t in _PRIMS:
        return {
            "null": "string",  # always-NULL column; string is the neutral carrier
            "boolean": "boolean",
            "int": "int",
            "long": "bigint",
            "float": "float",
            "double": "double",
            "bytes": "binary",
            "string": "string",
        }[t]
    if t == "enum":
        return "string"
    if t == "fixed":
        return "binary"
    if t == "array":
        return f"array<{avro_to_ddl(schema['items'])}>"
    if t == "map":
        return f"map<string,{avro_to_ddl(schema['values'])}>"
    if t == "record":
        inner = ",".join(
            f"{f['name']}:{avro_to_ddl(f['type'])}" for f in schema["fields"]
        )
        return f"struct<{inner}>"
    raise ValueError(f"unsupported Avro type {t!r}")


# --------------------------------------------------------------------------
# binary encoding (Avro spec "Binary Encoding")
# --------------------------------------------------------------------------


def _zigzag_enc(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_dec(b, i: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        byte = b[i]
        i += 1
        u |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")
    return (u >> 1) ^ -(u & 1), i


def _enc(value, schema, out: bytearray) -> None:
    t = _stype(schema)
    if t == "union":
        branches = schema if isinstance(schema, list) else schema["type"]
        inner = _nullable_branch(branches)
        if inner is None:
            raise ValueError(f"unsupported Avro union {branches!r}")
        null_first = _stype(branches[0]) == "null"
        if value is None:
            out += _zigzag_enc(0 if null_first else 1)
        else:
            out += _zigzag_enc(1 if null_first else 0)
            _enc(value, inner, out)
        return
    if value is None and t != "null":
        raise ValueError(f"avro: None for non-nullable {t} (wrap in a union)")
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        v = int(value)
        if t == "int" and not -(2**31) <= v < 2**31:
            raise ValueError(f"avro int out of range: {v}")
        out += _zigzag_enc(v)
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "bytes":
        b = bytes(value)
        out += _zigzag_enc(len(b)) + b
    elif t == "string":
        b = str(value).encode("utf-8")
        out += _zigzag_enc(len(b)) + b
    elif t == "enum":
        syms = schema["symbols"]
        try:
            out += _zigzag_enc(syms.index(value))
        except ValueError:
            raise ValueError(f"avro enum value {value!r} not in {syms}") from None
    elif t == "fixed":
        b = bytes(value)
        if len(b) != int(schema["size"]):
            raise ValueError(f"avro fixed size {len(b)} != {schema['size']}")
        out += b
    elif t == "array":
        items = list(value)
        if items:
            out += _zigzag_enc(len(items))
            for x in items:
                _enc(x, schema["items"], out)
        out += _zigzag_enc(0)
    elif t == "map":
        entries = dict(value)
        if entries:
            out += _zigzag_enc(len(entries))
            for k, v in entries.items():
                kb = str(k).encode("utf-8")
                out += _zigzag_enc(len(kb)) + kb
                _enc(v, schema["values"], out)
        out += _zigzag_enc(0)
    elif t == "record":
        for f in schema["fields"]:
            _enc(value.get(f["name"]) if isinstance(value, dict) else getattr(value, f["name"]),
                 f["type"], out)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _dec(b, i: int, schema):
    t = _stype(schema)
    if t == "union":
        branches = schema if isinstance(schema, list) else schema["type"]
        idx, i = _zigzag_dec(b, i)
        if not 0 <= idx < len(branches):
            raise ValueError(f"avro union index {idx} out of range")
        return _dec(b, i, branches[idx])
    if t == "null":
        return None, i
    if t == "boolean":
        return b[i] != 0, i + 1
    if t in ("int", "long"):
        return _zigzag_dec(b, i)
    if t == "float":
        return struct.unpack_from("<f", b, i)[0], i + 4
    if t == "double":
        return struct.unpack_from("<d", b, i)[0], i + 8
    if t == "bytes":
        n, i = _zigzag_dec(b, i)
        return bytes(b[i : i + n]), i + n
    if t == "string":
        n, i = _zigzag_dec(b, i)
        return str(b[i : i + n], "utf-8"), i + n
    if t == "enum":
        idx, i = _zigzag_dec(b, i)
        return schema["symbols"][idx], i
    if t == "fixed":
        n = int(schema["size"])
        return bytes(b[i : i + n]), i + n
    if t == "array":
        out = []
        while True:
            n, i = _zigzag_dec(b, i)
            if n == 0:
                return out, i
            if n < 0:  # block with byte-size prefix (spec: skip support)
                n = -n
                _, i = _zigzag_dec(b, i)
            for _ in range(n):
                v, i = _dec(b, i, schema["items"])
                out.append(v)
    if t == "map":
        out = {}
        while True:
            n, i = _zigzag_dec(b, i)
            if n == 0:
                return out, i
            if n < 0:
                n = -n
                _, i = _zigzag_dec(b, i)
            for _ in range(n):
                kn, i = _zigzag_dec(b, i)
                k = str(b[i : i + kn], "utf-8")
                i += kn
                out[k], i = _dec(b, i, schema["values"])
    if t == "record":
        out = {}
        for f in schema["fields"]:
            out[f["name"]], i = _dec(b, i, f["type"])
        return out, i
    raise ValueError(f"unsupported Avro type {t!r}")


def avro_encode_value(value, schema) -> bytes:
    """Encode one value against a parsed/JSON schema (single-record binary,
    no container framing — Kafka-style payloads)."""
    out = bytearray()
    _enc(value, parse_schema(schema), out)
    return bytes(out)


def avro_decode_value(buf: bytes, schema):
    """Decode one single-record binary payload; raises on trailing bytes."""
    v, off = _dec(memoryview(buf), 0, parse_schema(schema))
    if off != len(buf):
        raise ValueError(f"avro: {len(buf) - off} trailing bytes")
    return v


# --------------------------------------------------------------------------
# object container files (Avro spec "Object Container Files")
# --------------------------------------------------------------------------

_META_SCHEMA = {"type": "map", "values": "bytes"}


def ocf_encode(records: Sequence, schema, codec: str = "null",
               sync: bytes = b"\x00" * 16, block_records: int = 1000) -> bytes:
    """Write an OCF byte stream (header with embedded schema + sync-marked
    blocks). `codec`: null | deflate. `sync` is pinned by default — no
    randomness in any data path (repo invariant: replay identity)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported OCF codec {codec!r} (null|deflate)")
    if len(sync) != 16:
        raise ValueError("OCF sync marker must be 16 bytes")
    schema = parse_schema(schema)
    out = bytearray(OCF_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    _enc(meta, _META_SCHEMA, out)
    out += sync
    recs = list(records)
    for start in range(0, len(recs), block_records):
        chunk = recs[start : start + block_records]
        body = bytearray()
        for r in chunk:
            _enc(r, schema, body)
        data = zlib.compress(bytes(body), 6)[2:-4] if codec == "deflate" else bytes(body)
        out += _zigzag_enc(len(chunk)) + _zigzag_enc(len(data)) + data + sync
    return bytes(out)


def ocf_decode(buf: bytes):
    """-> (schema, records list). Validates magic, codec, and per-block
    sync markers."""
    b = memoryview(buf)
    if bytes(b[:4]) != OCF_MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta, i = _dec(b, 4, _META_SCHEMA)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported OCF codec {codec!r}")
    sync = bytes(b[i : i + 16])
    i += 16
    records = []
    while i < len(b):
        n, i = _zigzag_dec(b, i)
        size, i = _zigzag_dec(b, i)
        data = bytes(b[i : i + size])
        i += size
        if bytes(b[i : i + 16]) != sync:
            raise ValueError("OCF block sync marker mismatch (corrupt file)")
        i += 16
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        dm, j = memoryview(data), 0
        for _ in range(n):
            v, j = _dec(dm, j, schema)
            records.append(v)
        if j != len(data):
            raise ValueError("OCF block has trailing bytes")
    return schema, records


# --------------------------------------------------------------------------
# JSON rendering (goavro "standard JSON" mode — unions unwrapped)
# --------------------------------------------------------------------------


def _jsonable(v):
    if isinstance(v, bytes):
        # Avro's JSON encoding maps bytes through ISO-8859-1 code points
        return v.decode("latin-1")
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


def to_standard_json(value) -> str:
    return json.dumps(_jsonable(value), separators=(",", ":"), sort_keys=False)


# --------------------------------------------------------------------------
# DataFrame surface
# --------------------------------------------------------------------------


def _py(v):
    """numpy/pandas -> plain python (same contract as msgpack_codec._py)."""
    if v is None or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, dict):
        return {k: _py(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)) or (hasattr(v, "tolist") and getattr(v, "ndim", 0)):
        return [_py(x) for x in v]
    if hasattr(v, "item"):
        return v.item()
    return v


def avro_record_encode(df: DataFrame, cols: Sequence[str], schema_json: str,
                       out_col: str = "avro_blob") -> DataFrame:
    """Each row's `cols` become one single-record Avro binary blob against
    `schema_json` (a record schema whose field order defines the wire
    order; fields absent from `cols` raise at encode time)."""
    schema = parse_schema(schema_json)
    if _stype(schema) != "record":
        raise ValueError("avro_record_encode needs a record schema")
    cols = list(cols)
    passthrough = [c for c in df.columns if c not in cols]
    if out_col in passthrough:
        raise ValueError(f"avro_record_encode: out_col {out_col!r} collides with an input column")
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join([f"{c} {fields[c]}" for c in passthrough] + [f"{out_col} binary"])

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.operators.avro_codec import avro_encode_value

        for pdf in batches:
            blobs = [
                avro_encode_value({c: _py(pdf[c].iloc[r]) for c in cols}, schema)
                for r in range(len(pdf))
            ]
            out = pdf[passthrough].copy()
            out[out_col] = blobs
            yield out

    return df.mapInPandas(enc, schema=out_schema)


def avro_record_decode(df: DataFrame, blob_col: str, schema_json: str,
                       keep_cols: Sequence[str] = ()) -> DataFrame:
    """Decode single-record blobs into one typed column per record field —
    the output DDL is DERIVED from the Avro schema (avro_to_ddl), so the
    declared Arrow schema can't drift from the decoder."""
    schema = parse_schema(schema_json)
    if _stype(schema) != "record":
        raise ValueError("avro_record_decode needs a record schema")
    keep_cols = list(keep_cols)
    names = [f["name"] for f in schema["fields"]]
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    decoded = ", ".join(f"{f['name']} {avro_to_ddl(f['type'])}" for f in schema["fields"])
    keep = ", ".join(f"{c} {fields[c]}" for c in keep_cols)
    out_schema = f"{keep}, {decoded}" if keep else decoded

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.operators.avro_codec import avro_decode_value

        for pdf in batches:
            rows = []
            for r in range(len(pdf)):
                blob = pdf[blob_col].iloc[r]
                m = avro_decode_value(bytes(blob), schema) if blob is not None else {}
                row = {c: pdf[c].iloc[r] for c in keep_cols}
                row.update({n: m.get(n) for n in names})
                rows.append(row)
            yield pd.DataFrame(rows, columns=keep_cols + names)

    return df.mapInPandas(dec, schema=out_schema)


def avro_ocf_scan(df: DataFrame, col: str = "content", keep_cols: Sequence[str] = (),
                  out_col: str = "record_json") -> DataFrame:
    """The `avro` scanner (scanner.go:46): each binary value is a WHOLE
    object container file; emit one row per contained record with the
    content as standard JSON (schema read from each file's own header —
    different files may carry different schemas)."""
    keep_cols = list(keep_cols)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if out_col in keep_cols:
        raise ValueError(f"avro_ocf_scan: out_col {out_col!r} collides with keep_cols")
    keep = ", ".join(f"{c} {fields[c]}" for c in keep_cols)
    out_schema = f"{keep}, {out_col} string" if keep else f"{out_col} string"

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.operators.avro_codec import ocf_decode, to_standard_json

        for pdf in batches:
            rows = []
            for r in range(len(pdf)):
                blob = pdf[col].iloc[r]
                if blob is None:
                    continue
                _, records = ocf_decode(bytes(blob))
                base = {c: pdf[c].iloc[r] for c in keep_cols}
                for rec in records:
                    rows.append({**base, out_col: to_standard_json(rec)})
            yield pd.DataFrame(rows, columns=keep_cols + [out_col])

    return df.mapInPandas(scan, schema=out_schema)

