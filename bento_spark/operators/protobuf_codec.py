"""Protobuf codec — dependency-free implementation of the public
Protocol Buffers wire format (proto3) plus a subset .proto SOURCE parser.

Reference surface: the protobuf processor converts binary <-> JSON against
message definitions parsed from .proto source files at runtime
(/root/reference/internal/impl/protobuf/processor_protobuf.go:21-66,
operator to_json/from_json, `message` fully-qualified name,
`import_paths` of .proto sources). No protobuf wheel or spark-protobuf
jar ships in this sandbox, so — like the Avro codec
(operators/avro_codec.py) — both the wire format and the schema language
are implemented directly from the published spec, un-gating the YAML
surface that was previously descriptor-file + jar gated.

Supported .proto subset (proto3): `package`, nested `message`, `enum`,
scalar fields (double float int32 int64 uint32 uint64 sint32 sint64
fixed32 fixed64 sfixed32 sfixed64 bool string bytes), `repeated`
(packed-by-default for numeric scalars, both packed and expanded accepted
on decode), `optional`, `map<K,V>`, `oneof` (flattened: wire-identical,
each branch becomes a nullable field), comments, and the well-known
`google.protobuf.Timestamp` (registered as an ordinary message).
`import` statements are accepted and skipped — pass all needed sources in
one string / import path list, exactly how the reference resolves them.

Wire rules implemented from the spec: base-128 varints (two's-complement
64-bit for negative int32/int64/enum), zigzag for sint*, little-endian
fixed32/fixed64, length-delimited strings/bytes/messages/packed-arrays,
map fields as repeated {1: key, 2: value} entries, unknown fields skipped
on decode, proto3 default-value skipping on encode / default filling on
decode.

DataFrame surface (mapInPandas, Arrow batches; per-row Python is inherent
to a per-message binary codec — parity path, not the 100 TB hot path):
- protobuf_record_encode: selected columns -> one message blob per row.
- protobuf_record_decode: blob -> typed column per field (output DDL
  DERIVED from the .proto schema, so decoder and declared Arrow schema
  cannot drift).
"""

from __future__ import annotations

import re
import struct
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame

SCALARS = {
    "double", "float", "int32", "int64", "uint32", "uint64", "sint32",
    "sint64", "fixed32", "fixed64", "sfixed32", "sfixed64", "bool",
    "string", "bytes",
}
_VARINT_T = {"int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool"}
_FIXED64_T = {"fixed64", "sfixed64", "double"}
_FIXED32_T = {"fixed32", "sfixed32", "float"}

#: the one well-known type the reference test schemas use; an ordinary
#: message once registered (encoding of Timestamp IS {1: seconds varint,
#: 2: nanos varint} per the spec).
_WELL_KNOWN = """
package google.protobuf;
message Timestamp { int64 seconds = 1; int32 nanos = 2; }
"""


class Field:
    __slots__ = ("name", "num", "type", "repeated", "map_kv", "oneof")

    def __init__(self, name, num, type_, repeated=False, map_kv=None,
                 oneof=False):
        self.name, self.num, self.type = name, num, type_
        self.repeated, self.map_kv, self.oneof = repeated, map_kv, oneof


# --------------------------------------------------------------------------
# .proto source parser
# --------------------------------------------------------------------------

_TOKEN = re.compile(r'"(?:[^"\\]|\\.)*"|[A-Za-z_][\w.]*|-?\d+|[{}=;<>,]')


def _tokens(src: str) -> list[str]:
    src = re.sub(r"//[^\n]*", " ", src)
    src = re.sub(r"/\*.*?\*/", " ", src, flags=re.S)
    return _TOKEN.findall(src)


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks, self.i = toks, 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ValueError("proto parse: unexpected end of input")
        self.i += 1
        return t

    def expect(self, want: str) -> str:
        t = self.next()
        if t != want:
            raise ValueError(f"proto parse: expected {want!r}, got {t!r}")
        return t

    def skip_statement(self):
        """Consume to the next ';' (or a balanced '{...}' block option)."""
        while True:
            t = self.next()
            if t == ";":
                return
            if t == "{":
                depth = 1
                while depth:
                    t = self.next()
                    depth += t == "{"
                    depth -= t == "}"
                return


def parse_proto(src: str, registry: dict | None = None) -> dict:
    """Parse .proto source into a registry {fully.qualified.Name: spec}.
    Message spec: {"kind": "message", "fields": [Field...]}, enum spec:
    {"kind": "enum", "names": {name: num}, "nums": {num: name}}. The
    well-known Timestamp is always pre-registered. Pass an existing
    registry to accumulate several files (the import_paths model)."""
    reg = registry if registry is not None else {}
    if "google.protobuf.Timestamp" not in reg:
        _parse_into(_WELL_KNOWN, reg)
    _parse_into(src, reg)
    return reg


def _parse_into(src: str, reg: dict) -> None:
    p = _Parser(_tokens(src))
    package = ""
    while p.peek() is not None:
        t = p.next()
        if t in ("syntax", "option", "import"):
            p.skip_statement()
        elif t == "package":
            package = p.next()
            p.expect(";")
        elif t == "message":
            _parse_message(p, package, reg)
        elif t == "enum":
            _parse_enum(p, package, reg)
        elif t == ";":
            pass
        else:
            raise ValueError(f"proto parse: unexpected top-level token {t!r}")


def _parse_enum(p: _Parser, scope: str, reg: dict) -> str:
    name = p.next()
    fq = f"{scope}.{name}" if scope else name
    names, nums = {}, {}
    p.expect("{")
    while p.peek() != "}":
        t = p.next()
        if t in ("option", "reserved"):
            p.skip_statement()
            continue
        p.expect("=")
        num = int(p.next())
        p.expect(";")
        names[t] = num
        nums.setdefault(num, t)  # first name wins under allow_alias
    p.expect("}")
    reg[fq] = {"kind": "enum", "names": names, "nums": nums}
    return fq


def _parse_message(p: _Parser, scope: str, reg: dict) -> str:
    name = p.next()
    fq = f"{scope}.{name}" if scope else name
    fields: list[Field] = []
    reg[fq] = {"kind": "message", "fields": fields, "scope": scope}
    p.expect("{")
    while p.peek() != "}":
        t = p.next()
        if t == "message":
            _parse_message(p, fq, reg)
        elif t == "enum":
            _parse_enum(p, fq, reg)
        elif t in ("option", "reserved"):
            p.skip_statement()
        elif t == "oneof":
            p.next()  # oneof group name — flattened, but branches keep
            p.expect("{")  # EXPLICIT presence (proto3 oneof semantics)
            while p.peek() != "}":
                f = _parse_field(p, p.next(), repeated=False)
                f.oneof = True
                fields.append(f)
            p.expect("}")
        elif t == "map":
            p.expect("<")
            kt = p.next()
            p.expect(",")
            vt = p.next()
            p.expect(">")
            fname = p.next()
            p.expect("=")
            num = int(p.next())
            _finish_field(p)
            if kt not in SCALARS or kt in ("double", "float", "bytes"):
                raise ValueError(f"proto parse: invalid map key type {kt!r}")
            fields.append(Field(fname, num, "map", map_kv=(kt, vt)))
        elif t in ("repeated", "optional"):
            fields.append(_parse_field(p, p.next(), repeated=(t == "repeated")))
        elif t == ";":
            pass
        else:
            fields.append(_parse_field(p, t, repeated=False))
    p.expect("}")
    return fq


def _parse_field(p: _Parser, type_tok: str, repeated: bool) -> Field:
    fname = p.next()
    p.expect("=")
    num = int(p.next())
    _finish_field(p)
    return Field(fname, num, type_tok, repeated=repeated)


def _finish_field(p: _Parser) -> None:
    """Consume optional [field options] up to the closing ';'."""
    t = p.next()
    if t == ";":
        return
    # '[' isn't tokenized; options land as stray tokens — skip to ';'
    while t != ";":
        t = p.next()


def resolve_type(tname: str, scope: str, reg: dict) -> str:
    """Protobuf name resolution: innermost scope outward, then absolute."""
    if tname in SCALARS:
        return tname
    probe = scope
    while True:
        cand = f"{probe}.{tname}" if probe else tname
        if cand in reg:
            return cand
        if not probe:
            break
        probe = probe.rsplit(".", 1)[0] if "." in probe else ""
    if tname in reg:
        return tname
    raise ValueError(f"proto: unresolved type {tname!r} (scope {scope!r})")


# --------------------------------------------------------------------------
# wire format
# --------------------------------------------------------------------------


def _uvarint_enc(n: int, out: bytearray) -> None:
    if n < 0:
        n &= (1 << 64) - 1  # two's-complement 64-bit, per spec
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _uvarint_dec(buf, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        if i >= len(buf):
            raise ValueError("protobuf: truncated varint")
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7
        if shift > 63:
            raise ValueError("protobuf: varint too long")


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _wire_type(t: str, reg: dict | None = None) -> int:
    if t in _VARINT_T:
        return 0
    if t in _FIXED64_T:
        return 1
    if t in _FIXED32_T:
        return 5
    if reg is not None and t in reg and reg[t]["kind"] == "enum":
        return 0  # enums are varints on the wire
    return 2  # string/bytes/message/map/packed


def _tag(num: int, wt: int, out: bytearray) -> None:
    _uvarint_enc((num << 3) | wt, out)


def _enc_scalar(v, t: str, out: bytearray, reg: dict) -> None:
    if t in ("int32", "int64", "uint32", "uint64"):
        _uvarint_enc(int(v), out)
    elif t in ("sint32", "sint64"):
        _uvarint_enc(_zigzag(int(v)), out)
    elif t == "bool":
        out.append(1 if v else 0)
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "fixed64":
        out += struct.pack("<Q", int(v))
    elif t == "sfixed64":
        out += struct.pack("<q", int(v))
    elif t == "fixed32":
        out += struct.pack("<I", int(v))
    elif t == "sfixed32":
        out += struct.pack("<i", int(v))
    elif t == "string":
        b = str(v).encode("utf-8")
        _uvarint_enc(len(b), out)
        out += b
    elif t == "bytes":
        b = bytes(v)
        _uvarint_enc(len(b), out)
        out += b
    else:
        spec = reg[t]
        if spec["kind"] == "enum":
            n = spec["names"].get(v) if isinstance(v, str) else int(v)
            if n is None:
                raise ValueError(f"protobuf: unknown enum name {v!r} for {t}")
            _uvarint_enc(n, out)
        else:
            body = encode_message(v, t, reg)
            _uvarint_enc(len(body), out)
            out += body


def _is_default(v, t: str, reg: dict) -> bool:
    if v is None:
        return True
    if t in ("string",):
        return v == ""
    if t == "bytes":
        return len(v) == 0
    if t == "bool":
        return not v
    if t in SCALARS:
        return v == 0
    spec = reg.get(t)
    if spec and spec["kind"] == "enum":
        return (v == 0) or (isinstance(v, str) and spec["names"].get(v) == 0)
    return False  # messages: presence == not-None


def encode_message(value: dict, message: str, reg: dict) -> bytes:
    """Encode a python dict against a registered message (proto3
    semantics: default-valued scalar fields are omitted)."""
    spec = reg[message]
    if spec["kind"] != "message":
        raise ValueError(f"protobuf: {message} is not a message")
    out = bytearray()
    for f in spec["fields"]:
        v = value.get(f.name)
        if f.map_kv is not None:
            if not v:
                continue
            kt = f.map_kv[0]
            vt = resolve_type(f.map_kv[1], message, reg)
            for mk, mv in v.items():
                entry = bytearray()
                _tag(1, _wire_type(kt, reg), entry)
                _enc_scalar(mk, kt, entry, reg)
                _tag(2, _wire_type(vt, reg), entry)
                _enc_scalar(mv, vt, entry, reg)
                _tag(f.num, 2, out)
                _uvarint_enc(len(entry), out)
                out += entry
            continue
        t = resolve_type(f.type, message, reg)
        if f.repeated:
            if not v:
                continue
            wt = _wire_type(t, reg)
            if wt in (0, 1, 5):  # packed by default in proto3
                body = bytearray()
                for item in v:
                    _enc_scalar(item, t, body, reg)
                _tag(f.num, 2, out)
                _uvarint_enc(len(body), out)
                out += body
            else:
                for item in v:
                    _tag(f.num, wt, out)
                    _enc_scalar(item, t, out, reg)
            continue
        if f.oneof:
            # oneof branches have explicit presence: a key present in the
            # input (even zero-valued) is SET and goes on the wire;
            # None/absent means unset
            if f.name not in value or v is None:
                continue
        elif _is_default(v, t, reg):
            continue
        _tag(f.num, _wire_type(t, reg), out)
        _enc_scalar(v, t, out, reg)
    return bytes(out)


def _dec_scalar(buf, i: int, t: str, reg: dict):
    if t in ("int32", "int64"):
        n, i = _uvarint_dec(buf, i)
        if n >= 1 << 63:
            n -= 1 << 64
        return n, i
    if t in ("uint32", "uint64"):
        return _uvarint_dec(buf, i)
    if t in ("sint32", "sint64"):
        n, i = _uvarint_dec(buf, i)
        return _unzigzag(n), i
    if t == "bool":
        n, i = _uvarint_dec(buf, i)
        return bool(n), i
    if t == "double":
        return struct.unpack_from("<d", buf, i)[0], i + 8
    if t == "float":
        return struct.unpack_from("<f", buf, i)[0], i + 4
    if t == "fixed64":
        return struct.unpack_from("<Q", buf, i)[0], i + 8
    if t == "sfixed64":
        return struct.unpack_from("<q", buf, i)[0], i + 8
    if t == "fixed32":
        return struct.unpack_from("<I", buf, i)[0], i + 4
    if t == "sfixed32":
        return struct.unpack_from("<i", buf, i)[0], i + 4
    if t in ("string", "bytes"):
        ln, i = _uvarint_dec(buf, i)
        raw = bytes(buf[i:i + ln])
        if len(raw) != ln:
            raise ValueError("protobuf: truncated length-delimited field")
        return (raw.decode("utf-8") if t == "string" else raw), i + ln
    spec = reg[t]
    if spec["kind"] == "enum":
        n, i = _uvarint_dec(buf, i)
        return spec["nums"].get(n, n), i  # JSON rule: unknown number as int
    ln, i = _uvarint_dec(buf, i)
    return decode_message(buf[i:i + ln], t, reg), i + ln


def _skip(buf, i: int, wt: int) -> int:
    if wt == 0:
        _, i = _uvarint_dec(buf, i)
        return i
    if wt == 1:
        return i + 8
    if wt == 5:
        return i + 4
    if wt == 2:
        ln, i = _uvarint_dec(buf, i)
        return i + ln
    raise ValueError(f"protobuf: unsupported wire type {wt}")


def decode_message(buf: bytes, message: str, reg: dict) -> dict:
    """Decode one message; unknown field numbers are skipped per spec;
    absent proto3 fields land as their defaults (None for sub-messages,
    [] / {} for repeated / map)."""
    spec = reg[message]
    if spec["kind"] != "message":
        raise ValueError(f"protobuf: {message} is not a message")
    by_num = {f.num: f for f in spec["fields"]}
    out: dict = {}
    for f in spec["fields"]:
        if f.oneof:
            continue  # explicit presence: only set when seen on the wire
        if f.map_kv is not None:
            out[f.name] = {}
        elif f.repeated:
            out[f.name] = []
        else:
            t = resolve_type(f.type, message, reg)
            if t in SCALARS:
                out[f.name] = {"string": "", "bytes": b"", "bool": False,
                               "double": 0.0, "float": 0.0}.get(t, 0)
            elif reg[t]["kind"] == "enum":
                out[f.name] = reg[t]["nums"].get(0, 0)
            else:
                out[f.name] = None
    i = 0
    while i < len(buf):
        key, i = _uvarint_dec(buf, i)
        num, wt = key >> 3, key & 7
        f = by_num.get(num)
        if f is None:
            i = _skip(buf, i, wt)
            continue
        if f.map_kv is not None:
            kt = f.map_kv[0]
            vt = resolve_type(f.map_kv[1], message, reg)
            ln, i = _uvarint_dec(buf, i)
            entry, j = buf[i:i + ln], 0
            i += ln
            mk = {"string": "", "bytes": b"", "bool": False}.get(kt, 0)
            mv = None
            while j < len(entry):
                ekey, j = _uvarint_dec(entry, j)
                if ekey >> 3 == 1:
                    mk, j = _dec_scalar(entry, j, kt, reg)
                elif ekey >> 3 == 2:
                    mv, j = _dec_scalar(entry, j, vt, reg)
                else:
                    j = _skip(entry, j, ekey & 7)
            out[f.name][mk] = mv
            continue
        t = resolve_type(f.type, message, reg)
        if f.repeated:
            native_wt = _wire_type(t, reg)
            if wt == 2 and native_wt in (0, 1, 5):  # packed block
                ln, i = _uvarint_dec(buf, i)
                end = i + ln
                while i < end:
                    v, i = _dec_scalar(buf, i, t, reg)
                    out[f.name].append(v)
            else:
                v, i = _dec_scalar(buf, i, t, reg)
                out[f.name].append(v)
            continue
        out[f.name], i = _dec_scalar(buf, i, t, reg)
    return out


# --------------------------------------------------------------------------
# Spark DDL derivation + DataFrame stages
# --------------------------------------------------------------------------

_DDL = {
    "double": "double", "float": "float", "bool": "boolean",
    "string": "string", "bytes": "binary",
    "int32": "int", "sint32": "int", "sfixed32": "int",
    "uint32": "bigint", "fixed32": "bigint",
    "int64": "bigint", "sint64": "bigint", "sfixed64": "bigint",
    # unsigned 64-bit maps onto bigint: values >= 2^63 would wrap — out of
    # range for a Spark-native type either way
    "uint64": "bigint", "fixed64": "bigint",
}


def proto_to_ddl(message: str, reg: dict) -> str:
    spec = reg[message]
    parts = []
    for f in spec["fields"]:
        if f.map_kv is not None:
            kt = _DDL[f.map_kv[0]]
            vt = _one_ddl(resolve_type(f.map_kv[1], message, reg), reg)
            parts.append(f"{f.name} map<{kt},{vt}>")
        else:
            t = _one_ddl(resolve_type(f.type, message, reg), reg)
            parts.append(f"{f.name} array<{t}>" if f.repeated else f"{f.name} {t}")
    return ", ".join(parts)


def _one_ddl(t: str, reg: dict) -> str:
    if t in _DDL:
        return _DDL[t]
    spec = reg[t]
    if spec["kind"] == "enum":
        return "string"
    return f"struct<{proto_to_ddl(t, reg)}>"


def _py(v):
    """numpy/pandas scalar -> plain python (shared contract with the
    avro/msgpack codecs)."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float) and pd.isna(v):
        return None
    if isinstance(v, (list, tuple)):
        return [_py(x) for x in v]
    if isinstance(v, dict):
        return {k: _py(x) for k, x in v.items()}
    if isinstance(v, bytearray):
        return bytes(v)
    # numpy arrays (possibly size-1) BEFORE scalar .item() unwrapping
    if hasattr(v, "tolist") and not isinstance(v, (bytes, str)) and getattr(v, "ndim", 0):
        return [_py(x) for x in v.tolist()]
    if hasattr(v, "item"):
        return v.item()
    return v


def _row_value(row):
    """Spark Row / dict / struct-as-dict -> plain dict for encode."""
    if row is None:
        return None
    if hasattr(row, "asDict"):
        return {k: _py(v) for k, v in row.asDict(recursive=True).items()}
    if isinstance(row, dict):
        return {k: _py(v) for k, v in row.items()}
    return _py(row)


def protobuf_record_encode(df: DataFrame, cols: Sequence[str], proto_src: str,
                           message: str, out_col: str = "proto_blob") -> DataFrame:
    """Each row's `cols` become one `message` blob against the .proto
    source (column name == proto field name; missing message fields encode
    as absent, i.e. proto3 defaults)."""
    reg = parse_proto(proto_src)
    if message not in reg:
        raise ValueError(f"protobuf: message {message!r} not found; defined: "
                         f"{sorted(k for k, v in reg.items() if v['kind'] == 'message')}")
    cols = list(cols)
    passthrough = [c for c in df.columns if c not in cols]
    if out_col in passthrough:
        raise ValueError(f"protobuf_record_encode: out_col {out_col!r} collides with an input column")
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join([f"{c} {fields[c]}" for c in passthrough] + [f"{out_col} binary"])

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.operators.protobuf_codec import encode_message

        for pdf in batches:
            blobs = [
                encode_message({c: _py(pdf[c].iloc[r]) for c in cols}, message, reg)
                for r in range(len(pdf))
            ]
            out = pdf[passthrough].copy()
            out[out_col] = blobs
            yield out

    return df.mapInPandas(enc, schema=out_schema)


def protobuf_record_decode(df: DataFrame, blob_col: str, proto_src: str,
                           message: str, keep_cols: Sequence[str] = ()) -> DataFrame:
    """Decode message blobs into one typed column per field — output DDL
    DERIVED from the .proto source (proto_to_ddl)."""
    reg = parse_proto(proto_src)
    if message not in reg:
        raise ValueError(f"protobuf: message {message!r} not found; defined: "
                         f"{sorted(k for k, v in reg.items() if v['kind'] == 'message')}")
    keep_cols = list(keep_cols)
    names = [f.name for f in reg[message]["fields"]]
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    decoded = proto_to_ddl(message, reg)
    keep = ", ".join(f"{c} {fields[c]}" for c in keep_cols)
    out_schema = f"{keep}, {decoded}" if keep else decoded

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.operators.protobuf_codec import decode_message

        for pdf in batches:
            rows = []
            for r in range(len(pdf)):
                blob = pdf[blob_col].iloc[r]
                m = decode_message(bytes(blob), message, reg) if blob is not None else {}
                row = {c: pdf[c].iloc[r] for c in keep_cols}
                row.update({n: m.get(n) for n in names})
                rows.append(row)
            yield pd.DataFrame(rows, columns=keep_cols + names)

    return df.mapInPandas(dec, schema=out_schema)
