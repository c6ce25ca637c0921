"""msgpack encode/decode — dependency-free implementation of the public
MessagePack spec (msgpack.org format spec; reference processor:
/root/reference/internal/impl/msgpack/processor.go to_json/from_json).

No msgpack wheel ships in this environment, so the wire format is
implemented directly (the subset Bento round-trips: nil, bool, int, float64,
str, bin, array, map). Encoding is canonical-minimal (smallest
representation; map keys in the given column order) so equal rows produce
byte-identical blobs — the determinism the exactly-once replay tests and
fixture oracles rely on everywhere else in this repo.

DataFrame surface mirrors the parquet blob codecs: one row's selected
columns become ONE msgpack map blob and back, via mapInPandas (Arrow
batches; per-row Python is inherent to a per-message binary codec — this is
explicitly the slow path, for parity, not the 100 TB path)."""

from __future__ import annotations

import struct
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def mp_encode(obj) -> bytes:
    """Encode one value (canonical-minimal MessagePack)."""
    out = bytearray()
    _enc(obj, out)
    return bytes(out)


def _enc(o, out: bytearray) -> None:
    if o is None:
        out.append(0xC0)
    elif o is True:
        out.append(0xC3)
    elif o is False:
        out.append(0xC2)
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            out.append(o)
        elif -32 <= o < 0:
            out.append(0x100 + o)
        elif 0 <= o <= 0xFF:
            out += struct.pack(">BB", 0xCC, o)
        elif 0 <= o <= 0xFFFF:
            out += struct.pack(">BH", 0xCD, o)
        elif 0 <= o <= 0xFFFFFFFF:
            out += struct.pack(">BI", 0xCE, o)
        elif 0 <= o <= 0xFFFFFFFFFFFFFFFF:
            out += struct.pack(">BQ", 0xCF, o)
        elif -0x80 <= o < 0:
            out += struct.pack(">Bb", 0xD0, o)
        elif -0x8000 <= o < 0:
            out += struct.pack(">Bh", 0xD1, o)
        elif -0x80000000 <= o < 0:
            out += struct.pack(">Bi", 0xD2, o)
        elif -0x8000000000000000 <= o < 0:
            out += struct.pack(">Bq", 0xD3, o)
        else:
            raise ValueError(f"int out of msgpack range: {o}")
    elif isinstance(o, float):
        out += struct.pack(">Bd", 0xCB, o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += struct.pack(">BB", 0xD9, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n <= 0xFF:
            out += struct.pack(">BB", 0xC4, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += bytes(o)
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for x in o:
            _enc(x, out)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, v in o.items():
            _enc(k, out)
            _enc(v, out)
    else:
        raise TypeError(f"msgpack: unsupported type {type(o).__name__}")


def mp_decode(buf: bytes):
    """Decode one value; raises on trailing bytes."""
    val, off = _dec(memoryview(buf), 0)
    if off != len(buf):
        raise ValueError(f"msgpack: {len(buf) - off} trailing bytes")
    return val


def _dec(b: memoryview, i: int):
    t = b[i]
    i += 1
    if t <= 0x7F:
        return t, i
    if t >= 0xE0:
        return t - 0x100, i
    if 0x80 <= t <= 0x8F:
        return _dec_map(b, i, t & 0x0F)
    if 0x90 <= t <= 0x9F:
        return _dec_arr(b, i, t & 0x0F)
    if 0xA0 <= t <= 0xBF:
        n = t & 0x1F
        return str(b[i : i + n], "utf-8"), i + n
    if t == 0xC0:
        return None, i
    if t == 0xC2:
        return False, i
    if t == 0xC3:
        return True, i
    if t in (0xC4, 0xC5, 0xC6):
        w = {0xC4: 1, 0xC5: 2, 0xC6: 4}[t]
        n = int.from_bytes(b[i : i + w], "big")
        i += w
        return bytes(b[i : i + n]), i + n
    if t == 0xCA:
        return struct.unpack_from(">f", b, i)[0], i + 4
    if t == 0xCB:
        return struct.unpack_from(">d", b, i)[0], i + 8
    if t in (0xCC, 0xCD, 0xCE, 0xCF):
        w = 1 << (t - 0xCC)
        return int.from_bytes(b[i : i + w], "big"), i + w
    if t in (0xD0, 0xD1, 0xD2, 0xD3):
        w = 1 << (t - 0xD0)
        return int.from_bytes(b[i : i + w], "big", signed=True), i + w
    if t in (0xD9, 0xDA, 0xDB):
        w = {0xD9: 1, 0xDA: 2, 0xDB: 4}[t]
        n = int.from_bytes(b[i : i + w], "big")
        i += w
        return str(b[i : i + n], "utf-8"), i + n
    if t in (0xDC, 0xDD):
        w = 2 if t == 0xDC else 4
        n = int.from_bytes(b[i : i + w], "big")
        return _dec_arr(b, i + w, n)
    if t in (0xDE, 0xDF):
        w = 2 if t == 0xDE else 4
        n = int.from_bytes(b[i : i + w], "big")
        return _dec_map(b, i + w, n)
    raise ValueError(f"msgpack: unsupported type byte 0x{t:02x}")


def _dec_arr(b: memoryview, i: int, n: int):
    out = []
    for _ in range(n):
        v, i = _dec(b, i)
        out.append(v)
    return out, i


def _dec_map(b: memoryview, i: int, n: int):
    out = {}
    for _ in range(n):
        k, i = _dec(b, i)
        v, i = _dec(b, i)
        out[k] = v
    return out, i


def _py(v):
    """numpy/pandas values -> plain python for the encoder. Arrays become
    lists element-wise (ndarray.item() only works for size-1 arrays), dicts
    recurse; scalars unwrap via .item()."""
    if v is None or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, dict):
        return {k: _py(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)) or (hasattr(v, "tolist") and getattr(v, "ndim", 0)):
        return [_py(x) for x in v]
    if hasattr(v, "item"):
        return v.item()
    return v


def msgpack_encode(df: DataFrame, cols: Sequence[str], out_col: str = "msgpack_blob") -> DataFrame:
    """Each row's `cols` become one msgpack map blob (keys in column order)."""
    cols = list(cols)
    passthrough = [c for c in df.columns if c not in cols]
    if out_col in passthrough:
        # a duplicate name would desync the declared Arrow schema (out_schema
        # lists it twice) from the yielded frame (which has it once)
        raise ValueError(f"msgpack_encode: out_col {out_col!r} collides with an input column")
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"{c} {fields[c]}" for c in passthrough] + [f"{out_col} binary"]
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [
                mp_encode({c: _py(pdf[c].iloc[r]) for c in cols}) for r in range(len(pdf))
            ]
            out = pdf[passthrough].copy()
            out[out_col] = blobs
            yield out

    return df.mapInPandas(enc, schema=out_schema)


def msgpack_decode(df: DataFrame, blob_col: str, schema: str, keep_cols: Sequence[str] = ()) -> DataFrame:
    """Decode msgpack map blobs back into typed columns (`schema` = DDL of
    the encoded fields); keep_cols pass through."""
    keep_cols = list(keep_cols)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    keep = ", ".join(f"{c} {fields[c]}" for c in keep_cols)
    out_schema = f"{keep}, {schema}" if keep else schema
    # parse the DDL properly — a naive comma split breaks on nested types
    # (map<string,int>, struct<a:int,b:int>) and desyncs frame columns from
    # the Arrow output schema
    from pyspark.sql.types import StructType

    names = [f.name for f in StructType.fromDDL(schema).fields]

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in range(len(pdf)):
                blob = pdf[blob_col].iloc[r]
                m = mp_decode(bytes(blob)) if blob is not None else {}
                row = {c: pdf[c].iloc[r] for c in keep_cols}
                row.update({n: m.get(n) for n in names})
                rows.append(row)
            yield pd.DataFrame(rows, columns=keep_cols + names)

    return df.mapInPandas(dec, schema=out_schema)
