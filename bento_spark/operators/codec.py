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
    # backtrack-free "data up to ]": GREEDYDATA's `.*` before a literal \]
    # backtracks from end-of-line per row — a negated class is linear
    # (measured on 100k CLF rows, BENCH/ROUND3_NOTES.md)
    "NOTRBRACKET": r"[^\]]*",
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


def grok(df: DataFrame, col: str, pattern: str, keep_source: bool = True,
         anchored: bool = False) -> DataFrame:
    """Extract grok fields into columns, fully codegen'd
    (processor_grok.go:104; parse_log presets processor_parse_log.go:105).

    ONE regex pass per row: the anchored pattern packs every capture group
    into a \\x01-separated string via regexp_replace, split once; match
    detection is DERIVED from that same pass — regexp_replace returns the
    input unchanged on non-match, and a matching replacement always
    differs (the \\x01 separator can't occur in a text line; a zero-field
    pattern falls back to regexp_like). N regexp_extract calls would
    re-run the same Java regex N+1 times per row, and a separate
    regexp_like match flag re-ran it once more — the reference matches
    once too.

    `anchored=True` requires the pattern to match at the START of the
    value: the default find-anywhere form carries a lazy `[\\s\\S]*?`
    prefix that re-tries the pattern at every offset — on non-trivial
    patterns (CLF's IPORHOST alternation) that is the dominant cost
    (~2x measured on 100k CLF rows, BENCH/ROUND3_NOTES.md). Formats that
    define the whole line (parse_log presets) should anchor."""
    regex, fields = grok_pattern_to_regex(pattern)
    sep = "\x01"
    if anchored:
        full = r"\A(?:" + regex + r")[\s\S]*\Z"
        match_re = r"\A(?:" + regex + ")"
    else:
        full = r"\A[\s\S]*?(?:" + regex + r")[\s\S]*\Z"
        match_re = regex
    repl = sep.join(f"${i}" for i in range(1, len(fields) + 1))
    # The regex pass and the split are materialized as intermediate COLUMNS
    # in their own projections so each runs exactly once per row. Inlining
    # them into every field expression (the previous form) textually
    # duplicates the subtree per field; codegen subexpression elimination
    # does not reliably dedupe expressions living only inside conditional
    # `when` branches, and the measured cost was ~5 regex evaluations per
    # row (bench_extra: one replace pass 1.36s vs 7.9s in the full query at
    # sf1). CollapseProject will not re-inline them: it refuses to
    # duplicate non-cheap expressions (regexp_replace/split) that are
    # referenced more than once downstream.
    _ps, _arr, _m = "_grok_packed_str", "_grok_arr", "_grok_matched"
    if not fields:
        # zero-field pattern: pure match check, no extraction pass at all
        out = df.withColumn(_m, F.regexp_like(F.col(col), F.lit(match_re)))
        out = set_error_when(out, ~F.col(_m), "grok: no match").drop(_m)
        return out if keep_source else out.drop(col)
    packed_str = F.regexp_replace(F.col(col), full, repl)
    out = df.withColumn(_ps, packed_str)
    # a match rewrites the line to \x01-joined captures, which cannot
    # equal the original (it contains \x01 unless there is exactly one
    # field covering the whole line — then the "rewrite" is identity
    # ONLY if the pattern matched anyway, so equality still implies
    # we can treat single-field identity as a match via regexp_like)
    if len(fields) == 1:
        matched = F.regexp_like(F.col(col), F.lit(match_re))
    else:
        matched = F.col(_ps) != F.col(col)
    out = out.withColumn(_arr, F.split(F.col(_ps), sep)).withColumn(_m, matched)
    for i, f_name in enumerate(fields, start=1):
        out = out.withColumn(
            f_name,
            F.when(F.col(_m), F.try_element_at(F.col(_arr), F.lit(i))).otherwise(F.lit("")),
        )
    out = set_error_when(out, ~F.col(_m), "grok: no match")
    out = out.drop(_ps, _arr, _m)
    return out if keep_source else out.drop(col)


# Common Log Format preset — parse_log processor's `apache_common` codec.
# NOTRBRACKET (not GREEDYDATA) for the timestamp: same extraction on CLF
# lines, no per-row backtracking.
CLF_PATTERN = (
    "%{IP:remote_ip} %{NOTSPACE:identd} %{NOTSPACE:auth} "
    r"\[%{NOTRBRACKET:ts_raw}\] "
    '"%{WORD:verb} %{NOTSPACE:request} %{NOTSPACE:proto}" '
    "%{INT:status} %{INT:size}"
)


def parse_log(df: DataFrame, col: str, fmt: str = "apache_common") -> DataFrame:
    if fmt != "apache_common":
        raise ValueError(f"unsupported log format: {fmt}")
    # CLF defines the line from column 0: anchored match skips the
    # find-anywhere scan (measured ~2x on 100k rows)
    out = grok(df, col, CLF_PATTERN, anchored=True)
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


def jmespath_map(df: DataFrame, col: str, query: str, out_col: str | None = None) -> DataFrame:
    """Full JMESPath over a JSON string column
    (/root/reference/internal/impl/pure/processor_jmespath.go:65 — the
    reference replaces the message with the query result; here the result
    JSON replaces `col` or lands in `out_col`).

    Uses the public `jmespath` package (same spec as the reference's
    go-jmespath: projections `[*]`/`[]`, filters `[?...]`, pipes, and the
    builtin function library), import-gated with a clear error. This is
    deliberately the interpreted slow path — the reference's own docs
    steer users to `mapping` for performance, and so do ours (simple
    dot-paths stay on the codegen json_query). Unparsable documents follow
    the error-column protocol (row errored, content unchanged), matching
    the reference's no-passthrough-mutation behavior on bad JSON."""
    try:
        import jmespath as _jp
    except ImportError as e:  # pragma: no cover - present in this env
        raise RuntimeError(
            "jmespath processor needs the `jmespath` package (pip install jmespath)"
        ) from e
    _jp.compile(query)  # surface query syntax errors at PLAN time
    out_col = out_col or col
    from bento_spark.operators.errors import ERROR_COL, ensure_error_col

    df = ensure_error_col(df)
    in_cols = list(df.columns)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if out_col != col and out_col in in_cols:
        raise ValueError(f"jmespath: out_col {out_col!r} collides with an input column")
    out_cols = in_cols if out_col == col else in_cols + [out_col]
    out_schema = ", ".join(
        f"{c} {fields.get(c, 'string')}" if c != out_col else f"{out_col} string"
        for c in out_cols
    )

    def run(batches):
        import json as _json

        import jmespath as jp

        compiled = jp.compile(query)
        for pdf in batches:
            outs, errs = [], []
            for i in range(len(pdf)):
                prior = pdf[ERROR_COL].iloc[i]
                raw = pdf[col].iloc[i]
                if isinstance(prior, str) or raw is None:
                    outs.append(raw if out_col == col else None)
                    errs.append(prior if isinstance(prior, str) else None)
                    continue
                try:
                    doc = _json.loads(raw)
                except ValueError as e:
                    outs.append(raw if out_col == col else None)
                    errs.append(f"jmespath: invalid JSON: {e}")
                    continue
                try:
                    res = compiled.search(doc)
                except Exception as e:  # noqa: BLE001 — runtime type errors per row
                    outs.append(raw if out_col == col else None)
                    errs.append(f"jmespath: {e}")
                    continue
                outs.append(_json.dumps(res, separators=(",", ":")))
                errs.append(None)
            out = pdf[[c for c in in_cols if c != out_col]].copy()
            out[out_col] = outs
            out[ERROR_COL] = errs
            yield out[out_cols]

    return df.mapInPandas(run, schema=out_schema)


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


# ---------------------------------------------------------------------------
# xml — extraction via built-in xpath expressions (reference: internal/impl/
# xml/processor.go to_json operator; Spark 4 also ships a native `xml`
# datasource used by the compiler's xml input)
# ---------------------------------------------------------------------------

_XPATH_FNS = {
    "string": F.xpath_string,
    "int": F.xpath_int,
    "long": F.xpath_long,
    "double": F.xpath_double,
    "boolean": F.xpath_boolean,
}


def xml_extract(df: DataFrame, col: str, fields: dict[str, tuple[str, str]]) -> DataFrame:
    """Extract typed fields from an XML string column: fields[name] =
    (xpath, type). Pure Catalyst xpath expressions — JVM-side, no Python."""
    for name, (path, typ) in fields.items():
        fn = _XPATH_FNS.get(typ)
        if fn is None:
            raise ValueError(f"unsupported xml_extract type: {typ} (one of {sorted(_XPATH_FNS)})")
        df = df.withColumn(name, fn(F.col(col), F.lit(path)))
    return df


# ---------------------------------------------------------------------------
# parquet_encode / parquet_decode — batch <-> parquet-blob codecs
# (reference: internal/impl/parquet/processor_encode.go:160,
# processor_decode.go:66 — a message batch becomes ONE parquet file payload
# and back). Spark-first: the group is a partition of rows; pyarrow writes
# the blob inside an Arrow batch, so the codec runs at C speed and the blob
# rows stay distributed.
# ---------------------------------------------------------------------------


def parquet_encode(df: DataFrame, group_cols: Sequence[str], out_col: str = "parquet_blob") -> DataFrame:
    """Encode each group's rows as one parquet file blob:
    (group_cols..., out_col binary, n_rows bigint). Deterministic output:
    rows are sorted by all columns before encoding."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    group_cols = list(group_cols)
    data_cols = [c for c in df.columns if c not in group_cols]
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in group_cols
    )
    out_schema = f"{key_schema}, {out_col} binary, n_rows bigint"

    def encode(key, pdf):  # untyped: applyInPandas infers GROUPED_MAP from arity
        body = pdf[data_cols].sort_values(by=data_cols, kind="mergesort").reset_index(drop=True)
        buf = io.BytesIO()
        pq.write_table(pa.Table.from_pandas(body, preserve_index=False), buf, compression="snappy")
        row = dict(zip(group_cols, key))
        row[out_col] = buf.getvalue()
        row["n_rows"] = len(pdf)
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(encode, schema=out_schema)


def parquet_decode(df: DataFrame, blob_col: str, schema: str, keep_cols: Sequence[str] = ()) -> DataFrame:
    """Decode parquet blobs back into rows (one blob -> many rows). `schema`
    is the DDL of the encoded payload; keep_cols are passthrough columns
    replicated onto every decoded row."""
    import io

    import pyarrow.parquet as pq

    keep_cols = list(keep_cols)
    src_fields = {f.name: f for f in df.schema.fields}
    keep_schema = ", ".join(f"{c} {src_fields[c].dataType.simpleString()}" for c in keep_cols)
    out_schema = f"{keep_schema}, {schema}" if keep_schema else schema

    def decode(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    continue
                body = pq.read_table(io.BytesIO(bytes(blob))).to_pandas()
                for c in keep_cols:
                    body[c] = row[c]
                outs.append(body[keep_cols + [c for c in body.columns if c not in keep_cols]])
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return df.mapInPandas(decode, schema=out_schema)


# ---------------------------------------------------------------------------
# avro / protobuf — availability-gated wrappers over Spark's built-in
# from_avro/to_avro and from_protobuf/to_protobuf (the jars are optional
# --packages; reference: internal/impl/avro/processor.go:21,
# internal/impl/protobuf/processor.go). In environments without the jars
# these raise a clear error naming the package to load.
# ---------------------------------------------------------------------------


_AVRO_PKG = "org.apache.spark:spark-avro_2.13:<spark-version>"
_AVRO_CLASS = "org.apache.spark.sql.avro.AvroDataToCatalyst"


def avro_available(spark) -> bool:
    """True when the spark-avro module is on the classpath (the pyspark
    functions exist regardless; analysis fails without the jar). Routed
    through the shared gating registry like every other classpath gate."""
    from bento_spark.gating import classpath_available

    return classpath_available(spark, _AVRO_CLASS)


def avro_decode(df: DataFrame, col: str, avro_schema: str, out_col: str = "record") -> DataFrame:
    """from_avro the binary column into a struct column (scanner_avro /
    avro processor to_json parity)."""
    from pyspark.sql.avro.functions import from_avro

    from bento_spark.gating import require_classpath

    require_classpath(df.sparkSession, _AVRO_CLASS, _AVRO_PKG, "avro_decode")
    return df.withColumn(out_col, from_avro(F.col(col), avro_schema))


def avro_encode(df: DataFrame, cols: Sequence[str], avro_schema: str, out_col: str = "avro_bytes") -> DataFrame:
    from pyspark.sql.avro.functions import to_avro

    from bento_spark.gating import require_classpath

    require_classpath(df.sparkSession, _AVRO_CLASS, _AVRO_PKG, "avro_encode")
    return df.withColumn(out_col, to_avro(F.struct(*[F.col(c) for c in cols]), avro_schema))


_PROTOBUF_PKG = "org.apache.spark:spark-protobuf_2.13:<spark-version>"
_PROTOBUF_CLASS = "org.apache.spark.sql.protobuf.utils.SchemaConverters"


def protobuf_available(spark) -> bool:
    from bento_spark.gating import classpath_available

    return classpath_available(spark, _PROTOBUF_CLASS)


def protobuf_decode(df: DataFrame, col: str, message_name: str, desc_file: str, out_col: str = "record") -> DataFrame:
    """from_protobuf with a descriptor-set file (protoc --descriptor_set_out),
    matching the reference protobuf processor's file_path schema source."""
    from pyspark.sql.protobuf.functions import from_protobuf

    from bento_spark.gating import require_classpath

    require_classpath(df.sparkSession, _PROTOBUF_CLASS, _PROTOBUF_PKG, "protobuf_decode")
    return df.withColumn(out_col, from_protobuf(F.col(col), message_name, descFilePath=desc_file))


def protobuf_encode(df: DataFrame, cols: Sequence[str], message_name: str, desc_file: str,
                    out_col: str = "proto_bytes") -> DataFrame:
    from pyspark.sql.protobuf.functions import to_protobuf

    from bento_spark.gating import require_classpath

    require_classpath(df.sparkSession, _PROTOBUF_CLASS, _PROTOBUF_PKG, "protobuf_encode")
    return df.withColumn(out_col, to_protobuf(F.struct(*[F.col(c) for c in cols]), message_name,
                                              descFilePath=desc_file))
