"""Scanner wave: tar / zip / chunker / re_match / skip_bom.

Reference scanners consume a raw byte stream and emit message batches
(/root/reference/internal/impl/pure/scanner_tar.go:28, scanner_chunker.go,
scanner_regexp.go, scanner_skip_bom.go; archive/unarchive tar+zip formats
in processor_archive.go / processor_unarchive.go:336-354).

Spark-first mapping: a "byte stream" is a binary column (usually from the
`binaryFile` datasource — one row per file, content as binary). Scanners
become explodes:
- chunker / re_match / skip_bom are pure Catalyst (sequence+substr, split,
  regexp_replace) — codegen, no Python.
- tar/zip need the stdlib format parsers, so they run as mapInPandas over
  Arrow batches; the blob column is consumed (never echoed back through
  Arrow — the repo invariant for large binaries).

tar_encode is the archive twin (deterministic: sorted members, zeroed
mtime/uid/gid) so tar handling gets a DuckDB-oracle-able roundtrip query
instead of a rows-only check.
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keep_schema(df: DataFrame, keep_cols: Sequence[str]) -> str:
    fields = {f.name: f for f in df.schema.fields}
    return ", ".join(f"{c} {fields[c].dataType.simpleString()}" for c in keep_cols)


# --- fast ustar fast-path -------------------------------------------------
# tarfile.addfile/getmembers cost ~30-50us per member in object churn; a
# corpus tar holds tens of thousands of tiny members, so encode/decode
# build/parse plain POSIX ustar headers directly (the only shape this
# engine ever writes: ASCII name <= 100 bytes, size < 8 GiB, zeroed
# metadata). Anything outside that shape falls back to the stdlib module —
# same bytes semantics, just slower.

_USTAR_MAGIC = b"ustar\x0000"


def _ustar_header(name_b: bytes, size: int) -> bytes:
    """512-byte POSIX ustar header: mode 0644, uid/gid 0, mtime 0,
    typeflag '0' — field-for-field what tarfile emits for the TarInfo
    defaults tar_encode uses."""
    h = bytearray(512)
    h[0 : len(name_b)] = name_b
    h[100:108] = b"0000644\x00"
    h[108:116] = b"0000000\x00"  # uid
    h[116:124] = b"0000000\x00"  # gid
    h[124:136] = b"%011o\x00" % size
    h[136:148] = b"00000000000\x00"  # mtime 0
    h[148:156] = b"        "  # checksum placeholder = spaces
    h[156] = 0x30  # typeflag '0' (regular file)
    h[257:265] = _USTAR_MAGIC
    chksum = sum(h)
    h[148:156] = b"%06o\x00 " % chksum
    return bytes(h)


def _fast_tar_members(blob: bytes) -> list[tuple[str, bytes]] | None:
    """Parse a plain ustar archive; return None when any record needs the
    stdlib parser (pax/gnu extensions, prefix field, non-ASCII...)."""
    members: list[tuple[str, bytes]] = []
    off, n = 0, len(blob)
    while off + 512 <= n:
        hdr = blob[off : off + 512]
        if hdr[0] == 0:  # end-of-archive zero block
            break
        typeflag = hdr[156]
        size_f = hdr[124:136].split(b"\x00", 1)[0].strip()
        try:
            size = int(size_f, 8)
        except ValueError:
            return None  # base-256 / malformed size -> stdlib
        if typeflag not in (0x30, 0x00, 0x35):  # not regular file or dir
            return None  # pax ('x'/'g') or gnu ('L'/'K') records -> stdlib
        if hdr[345] != 0:  # prefix field in use -> stdlib (name joining)
            return None
        if sum(hdr) - sum(hdr[148:156]) + 8 * 0x20 != int(hdr[148:155].split(b"\x00", 1)[0].strip() or b"0", 8):
            return None  # checksum mismatch -> let the stdlib raise properly
        data_off = off + 512
        if typeflag in (0x30, 0x00):
            name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "surrogateescape")
            members.append((name, blob[data_off : data_off + size]))
        off = data_off + ((size + 511) // 512) * 512
    return members


def tar_encode(
    df: DataFrame,
    group_cols: Sequence[str],
    name_col: str,
    payload_col: str,
    out_col: str = "tar_blob",
) -> DataFrame:
    """archive format=tar (processor_archive.go formats): each group's rows
    become ONE uncompressed tar blob, member per row. Deterministic bytes:
    members sorted by name, mtime/uid/gid zeroed."""
    group_cols = list(group_cols)
    out_schema = f"{_keep_schema(df, group_cols)}, {out_col} binary, n_members bigint"

    def encode(key, pdf):  # untyped: applyInPandas infers GROUPED_MAP from arity
        # sort by NAME ONLY: a tuple sort falls through to comparing
        # payloads on name ties, which raises for bytes-vs-None and
        # would make tie order content-dependent
        pairs = sorted(zip(pdf[name_col], pdf[payload_col]), key=lambda t: str(t[0]))
        parts: list[bytes] = []
        fast = True
        for name, payload in pairs:
            if payload is None:
                data = b""  # a NULL payload is an empty member, not b'None'
            else:
                data = bytes(payload) if isinstance(payload, (bytes, bytearray)) else str(payload).encode()
            name_b = str(name).encode()
            if len(name_b) > 100 or len(data) >= 0o77777777777:
                fast = False  # member outside the ustar fast path
                break
            parts.append(_ustar_header(name_b, len(data)))
            parts.append(data)
            pad = -len(data) % 512
            if pad:
                parts.append(b"\x00" * pad)
        if not fast:
            # fallback: stdlib writer handles long/odd names (GNU/PAX)
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tf:
                for name, payload in pairs:
                    if payload is None:
                        data = b""
                    else:
                        data = payload if isinstance(payload, (bytes, bytearray)) else str(payload).encode()
                    info = tarfile.TarInfo(name=str(name))
                    info.size = len(data)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(bytes(data)))
            blob = buf.getvalue()
        else:
            parts.append(b"\x00" * 1024)  # end-of-archive marker
            blob = b"".join(parts)
            pad = -len(blob) % 10240  # RECORDSIZE padding, as tarfile does
            if pad:
                blob += b"\x00" * pad
        row = dict(zip(group_cols, key))
        row[out_col] = blob
        row["n_members"] = len(pdf)
        return pd.DataFrame([row])

    return df.select(*group_cols, name_col, payload_col).groupBy(*group_cols).applyInPandas(
        encode, schema=out_schema
    )


def unarchive_tar(
    df: DataFrame,
    blob_col: str,
    keep_cols: Sequence[str] = (),
    fmt: str = "tar",
) -> DataFrame:
    """tar/zip scanner (scanner_tar.go:28; unarchive zip
    processor_unarchive.go): one blob row -> one row per archive member
    (member_name string, member_bytes binary). keep_cols replicate onto
    every member row; the blob itself is consumed."""
    if fmt not in ("tar", "zip"):
        raise ValueError(f"unsupported archive format: {fmt} (tar or zip)")
    keep_cols = list(keep_cols)
    keep = _keep_schema(df, keep_cols)
    out_schema = (f"{keep}, " if keep else "") + "member_name string, member_bytes binary"
    cols = keep_cols + [blob_col]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    continue
                bio = io.BytesIO(bytes(blob))
                members: list[tuple[str, bytes]] = []
                if fmt == "tar":
                    fast = _fast_tar_members(bytes(blob))
                    if fast is not None:
                        members = fast
                    else:
                        with tarfile.open(fileobj=bio) as tf:
                            for m in tf.getmembers():
                                if m.isfile():
                                    f = tf.extractfile(m)
                                    members.append((m.name, f.read() if f else b""))
                else:
                    with zipfile.ZipFile(bio) as zf:
                        for nm in zf.namelist():
                            if not nm.endswith("/"):
                                members.append((nm, zf.read(nm)))
                base = {c: row[c] for c in keep_cols}
                rows.extend({**base, "member_name": n, "member_bytes": b} for n, b in members)
            if rows:
                yield pd.DataFrame(rows, columns=keep_cols + ["member_name", "member_bytes"])

    return df.select(*cols).mapInPandas(decode, schema=out_schema)


def chunker(df: DataFrame, col: str, size: int, out_col: str = "chunk") -> DataFrame:
    """Fixed-size chunk scanner (scanner_chunker.go): split a string/binary
    payload into ceil(len/size) pieces. Pure Catalyst: posexplode over a
    sequence + substr — codegen, works on binary and string alike. Empty
    payloads produce zero rows (reference drops empty chunks)."""
    if size <= 0:
        raise ValueError("chunker size must be positive")
    n = F.ceil(F.length(F.col(col)) / F.lit(size)).cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(F.array().cast("array<int>"))
    return (
        df.withColumn("chunk_index", F.explode(idx))
        .withColumn(out_col, F.col(col).substr(F.col("chunk_index") * size + 1, F.lit(size)))
        .drop(col)
    )


def re_split(df: DataFrame, col: str, pattern: str, out_col: str = "part") -> DataFrame:
    """re_match boundary scanner (scanner_regexp.go): explode the payload on
    a regex delimiter. Pure Catalyst split+explode."""
    return df.withColumn(out_col, F.explode(F.split(F.col(col), pattern))).drop(col)


def skip_bom(df: DataFrame, col: str) -> DataFrame:
    """Strip a UTF-8 BOM prefix (scanner_skip_bom.go)."""
    return df.withColumn(col, F.regexp_replace(F.col(col), "^\ufeff", ""))


def scanner_switch(
    df: DataFrame,
    cases: Sequence[tuple[str | None, "Callable[[DataFrame], DataFrame]"]],
    path_col: str = "path",
) -> DataFrame:
    """scanner `switch` (scanner_switch.go:20): pick the child scanner per
    SOURCE by filename pattern — first matching re_pattern wins, a None
    pattern is the catch-all, unmatched sources are errored (the reference
    rejects them).

    Spark-first: the slice for each case is a filter on the path column
    (binaryFile/file sources carry `path`), the child transform runs on its
    slice, results union back — Catalyst prunes each branch's scan to the
    matching files when the pattern is a prefix/glob-friendly predicate."""
    from bento_spark.operators.errors import set_error_when

    parts = []
    remaining = df
    for pattern, transform in cases:
        if pattern is None:
            parts.append(transform(remaining))
            remaining = remaining.filter(F.lit(False))
        else:
            # coalesce: a NULL path makes both the filter and its negation
            # NULL, silently dropping the row from every branch — NULL-path
            # sources must fall through to the errored remainder
            hit = F.coalesce(F.regexp_like(F.col(path_col), F.lit(pattern)), F.lit(False))
            parts.append(transform(remaining.filter(hit)))
            remaining = remaining.filter(~hit)
    # unmatched sources -> errored rows (reference: error + reject)
    parts.append(set_error_when(remaining, F.lit(True), "scanner_switch: no candidate matched"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
