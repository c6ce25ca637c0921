"""Payload codecs & parsers: compress / decompress / grok-style log parsing
/ JSON query / JSON-schema validation.

Reference semantics:
- `compress` / `decompress` processors transform the raw payload with
  gzip/zlib/bz2/… (/root/reference/internal/impl/pure/processor_compress.go:22,
  processor_decompress.go:21; algorithm table bloblang_encoding.go:13,54).
- `grok` / `parse_log` extract structured fields from text lines via named
  regex patterns (processor_grok.go:104, processor_parse_log.go:105).
- `jq` / `jmespath` run JSON queries per message (processor_jq.go:95,
  processor_jmespath.go:65).
- `json_schema` validates the payload and flags an error on failure
  (processor_jsonschema.go:93).

Spark-first: parsing/extraction is pure Catalyst (`regexp_extract`,
`get_json_object`, `from_json`) — whole-stage codegen, zero Python.
Compression has no built-in expression, so it is a vectorized pandas UDF
over Arrow batches (one Python call per ~10k rows, not per row); at 100 TB
the bytes move once through Arrow and the codec runs at C speed.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import zlib
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from bento_spark.operators.errors import set_error_when

_COMPRESSORS = {
    "gzip": lambda b: gzip.compress(b, mtime=0),  # mtime=0: deterministic output
    "zlib": zlib.compress,
    "bz2": bz2.compress,
    "lzma": lzma.compress,
}
_DECOMPRESSORS = {
    "gzip": gzip.decompress,
    "zlib": zlib.decompress,
    "bz2": bz2.decompress,
    "lzma": lzma.decompress,
}


def compress_col(col: Column | str, algorithm: str = "gzip") -> Column:
    """Vectorized compression of a binary column (processor_compress.go:22)."""
    fn = _COMPRESSORS.get(algorithm)
    if fn is None:
        raise ValueError(f"unsupported compression algorithm: {algorithm}")

    @pandas_udf("binary")
    def _compress(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else fn(bytes(b)))

    c = F.col(col) if isinstance(col, str) else col
    return _compress(c)


def decompress_col(col: Column | str, algorithm: str = "gzip") -> Column:
    """Vectorized decompression (processor_decompress.go:21). Bad payloads
    yield NULL (combine with `set_error_when(col.isNull(), ...)` for the
    error-column protocol)."""
    fn = _DECOMPRESSORS.get(algorithm)
    if fn is None:
        raise ValueError(f"unsupported compression algorithm: {algorithm}")

    @pandas_udf("binary")
    def _decompress(s: pd.Series) -> pd.Series:
        def safe(b):
            if b is None:
                return None
            try:
                return fn(bytes(b))
            except Exception:
                return None

        return s.map(safe)

    c = F.col(col) if isinstance(col, str) else col
    return _decompress(c)


# ---------------------------------------------------------------------------
# grok / parse_log — named-pattern extraction (processor_grok.go:104)
# ---------------------------------------------------------------------------

# The grok patterns our parse_log supports, as plain regex fragments.
_GROK = {
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "WORD": r"\w+",
    "NUMBER": r"-?\d+(?:\.\d+)?",
    "INT": r"-?\d+",
    "NOTSPACE": r"\S+",
    "GREEDYDATA": r".*",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "LOGLEVEL": r"TRACE|DEBUG|INFO|WARN|ERROR|FATAL",
}


def grok_pattern_to_regex(pattern: str) -> tuple[str, list[str]]:
    """Expand `%{NAME:field}` placeholders into capture groups.

    Returns (regex, field_names) — field i is capture group i+1.
    """
    import re as _re

    fields: list[str] = []

    def sub(m: "_re.Match[str]") -> str:
        name, _, field = m.group(1).partition(":")
        frag = _GROK.get(name)
        if frag is None:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        if field:
            fields.append(field)
            return f"({frag})"
        return f"(?:{frag})"

    regex = _re.sub(r"%\{(\w+(?::\w+)?)\}", sub, pattern)
    return regex, fields


def grok(df: DataFrame, col: str, pattern: str, keep_source: bool = True) -> DataFrame:
    """Extract grok fields into columns — pure `regexp_extract`, fully
    codegen'd (processor_grok.go:104; parse_log presets processor_parse_log.go:105)."""
    regex, fields = grok_pattern_to_regex(pattern)
    out = df
    for i, f_name in enumerate(fields, start=1):
        out = out.withColumn(f_name, F.regexp_extract(F.col(col), regex, i))
    out = set_error_when(out, ~F.regexp_like(F.col(col), F.lit(regex)), "grok: no match")
    return out if keep_source else out.drop(col)


# Common Log Format preset — parse_log processor's `apache_common` codec.
CLF_PATTERN = (
    "%{IP:remote_ip} %{NOTSPACE:identd} %{NOTSPACE:auth} "
    r"\[%{GREEDYDATA:ts_raw}\] "
    '"%{WORD:verb} %{NOTSPACE:request} %{NOTSPACE:proto}" '
    "%{INT:status} %{INT:size}"
)


def parse_log(df: DataFrame, col: str, fmt: str = "apache_common") -> DataFrame:
    if fmt != "apache_common":
        raise ValueError(f"unsupported log format: {fmt}")
    out = grok(df, col, CLF_PATTERN)
    # try_cast: non-matching lines extract "" (they carry the grok error flag)
    return out.withColumn("status", F.col("status").try_cast("int")).withColumn(
        "size", F.col("size").try_cast("long")
    )


# ---------------------------------------------------------------------------
# jq / jmespath — JSON queries (processor_jq.go:95) → get_json_object
# ---------------------------------------------------------------------------


def json_query(col: Column | str, path: str) -> Column:
    """Dot-path JSON extraction: `.a.b` / `a.b` → `get_json_object($.a.b)`.

    Codegen'd JVM-side JSON cursor — the Spark answer to per-message jq.
    """
    p = path.lstrip(".")
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{p}")


def json_map(df: DataFrame, col: str, outputs: dict[str, tuple[str, str]]) -> DataFrame:
    """Extract several JSON paths at once: outputs[name] = (path, sql_type)."""
    for name, (path, typ) in outputs.items():
        df = df.withColumn(name, json_query(col, path).cast(typ))
    return df


# ---------------------------------------------------------------------------
# json_schema — validation to the error column (processor_jsonschema.go:93)
# ---------------------------------------------------------------------------

_TYPE_CHECKS = {
    "string": lambda v: v.isNotNull(),
    "number": lambda v: v.cast("double").isNotNull(),
    "integer": lambda v: (v.cast("bigint").isNotNull()) & (v.cast("double") == v.cast("bigint").cast("double")),
    "boolean": lambda v: v.isin("true", "false"),
}


def json_schema_check(
    df: DataFrame, col: str, required: Sequence[tuple[str, str]]
) -> DataFrame:
    """Validate that each (field, type) exists in the JSON payload; failures
    set the error column (the reference errors the message and lets outputs
    route it — same protocol here)."""
    for field_name, typ in required:
        check = _TYPE_CHECKS.get(typ)
        if check is None:
            raise ValueError(f"unsupported json_schema type: {typ}")
        v = json_query(col, field_name)
        bad = v.isNull() | ~check(v)
        df = set_error_when(df, bad, f"json_schema: {field_name} not a valid {typ}")
    return df
