"""Property-based tests (hypothesis) for the pure-Python kernels — the
places where hand-picked vectors miss edge cases: msgpack wire format,
ISO-8601 duration parsing, grok regex assembly, splitmix/shingle purity.
Spark-free, so hundreds of cases run in milliseconds."""

from __future__ import annotations

import hashlib
import hmac as py_hmac

from hypothesis import given, settings
from hypothesis import strategies as st

from bento_spark.operators.msgpack_codec import mp_decode, mp_encode
from bento_spark.streaming.cep import duration_ms

# recursive msgpack value space (ints bounded to the spec's 64-bit range)
_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=80),
    st.binary(max_size=80),
)
_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=8),
        st.dictionaries(st.text(max_size=12), children, max_size=8),
    ),
    max_leaves=24,
)


@given(_value)
@settings(max_examples=300, deadline=None)
def test_msgpack_roundtrip_property(v):
    assert mp_decode(mp_encode(v)) == v


def _typed_eq(a, b) -> bool:
    """Type-aware equality: Python says False == 0 and True == 1, but
    msgpack (correctly) encodes bool and int differently — the canonical
    property only holds for TYPE-identical values."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_typed_eq(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_typed_eq(x, y) for x, y in zip(a, b))
    return type(a) is type(b) and a == b


@given(_value, _value)
@settings(max_examples=100, deadline=None)
def test_msgpack_canonical_determinism(a, b):
    ea, eb = mp_encode(a), mp_encode(b)
    assert ea == mp_encode(a)  # same value -> identical bytes, always
    if _typed_eq(a, b):
        assert ea == eb


@given(st.integers(min_value=0, max_value=10**6),
       st.sampled_from(["ms", "s", "seconds", "m", "minutes", "h", "hours"]))
@settings(max_examples=100, deadline=None)
def test_duration_parser_property(n, unit):
    mult = {"ms": 1, "s": 1000, "seconds": 1000, "m": 60_000,
            "minutes": 60_000, "h": 3_600_000, "hours": 3_600_000}[unit]
    assert duration_ms(f"{n} {unit}") == n * mult
    assert duration_ms(f"{n}{unit}") == n * mult  # whitespace optional


def test_hmac_expression_matches_stdlib(spark):
    """Drive the REAL pure-expression HMAC through Spark across the key-
    length regimes (short, exactly-block, longer-than-block -> hashed) and
    both algorithms, against stdlib hmac as truth."""
    from bento_spark.functions.bloblang import compile_expr

    msgs = ["", "m", "the quick brown fox", "x" * 300]
    keys = ["k", "a" * 64, "b" * 65, "long-key-" * 20]
    df = spark.createDataFrame([(m,) for m in msgs], "m string")
    for alg, mod in (("sha256", hashlib.sha256), ("sha512", hashlib.sha512)):
        exprs = [
            compile_expr(f'this.m.hmac("{alg}", "{k}")').alias(f"h{i}")
            for i, k in enumerate(keys)
        ]
        for r in df.select("m", *exprs).collect():
            for i, k in enumerate(keys):
                expect = py_hmac.new(k.encode(), r.m.encode(), mod).hexdigest()
                assert r[f"h{i}"] == expect, (alg, k[:12], r.m[:12])


def test_chunker_column_matches_python(spark):
    """Drive the REAL scanners.chunker through Spark over a grid and compare
    to Python slicing (reassembly + full-chunk laws)."""
    from pyspark.sql import functions as F

    from bento_spark.operators.scanners import chunker

    texts = ["", "x", "hello world!", "a" * 65, "0123456789" * 7]
    for size in (1, 3, 10, 64):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i int, payload string"
        )
        out = chunker(df, "payload", size)
        got: dict[int, list[str]] = {}
        for r in out.orderBy("i", "chunk_index").collect():
            got.setdefault(r.i, []).append(r.chunk)
        for i, t in enumerate(texts):
            n = -(-len(t) // size)
            expect = [t[j * size : (j + 1) * size] for j in range(n)]
            assert got.get(i, []) == expect, (t, size, got.get(i))


def test_html_escape_roundtrip_real_expressions(spark):
    """escape_html -> unescape_html through the REAL compiled Column
    expressions is the identity (entity-replacement ordering is the part
    that's easy to get wrong — '&amp;lt;' double-escape class)."""
    from bento_spark.functions.bloblang import compile_expr

    tricky = [
        "", "plain", "<b>&amp;</b>", "a&b<c>d\"e'f", "&lt;already&gt;",
        "&&&", "'';\"\"", "mixed & <tags> with \"quotes\"",
    ]
    df = spark.createDataFrame([(s,) for s in tricky], "s string")
    out = df.select(
        "s",
        compile_expr("this.s.escape_html()").alias("esc"),
        compile_expr("this.s.escape_html().unescape_html()").alias("back"),
    ).collect()
    for r in out:
        assert r.back == r.s, (r.s, r.esc, r.back)
        # escaped form never contains raw specials (Go html.EscapeString set)
        core = r.esc.replace("&amp;", "").replace("&lt;", "").replace("&gt;", "").replace("&#34;", "").replace("&#39;", "")
        assert not any(ch in core for ch in "<>\"'"), r.esc


@given(
    st.binary(max_size=500),
    st.sampled_from(["lines", "length_prefixed_uint32_be", "netstring"]),
)
@settings(max_examples=200, deadline=None)
def test_subprocess_framing_roundtrip(payload, codec):
    """frame_payload -> read_framed is the identity for every codec (the
    lockstep pipe protocol depends on exact framing)."""
    import io

    from bento_spark.operators.subprocess_proc import frame_payload, read_framed

    if codec == "lines" and b"\n" in payload:
        return  # lines framing cannot carry embedded newlines by design
    framed = frame_payload(payload, codec)
    buf = io.BytesIO(framed + b"trailing-noise")
    assert read_framed(buf, codec) == payload
    # stream position is exactly past the frame (lockstep invariant)
    assert buf.tell() == len(framed)


def test_slice_column_matches_python(spark):
    """Drive the REAL _slice Column expression through Spark over a grid of
    (lo, hi) pairs and compare to Python slicing (ASCII strings; Spark
    substring is code-point based so multibyte agrees too)."""
    from pyspark.sql import functions as F

    from bento_spark.functions.bloblang import _slice

    strings = ["", "a", "hello world", "0123456789"]
    pairs = [(0, None), (3, None), (-3, None), (-99, None), (2, 5), (5, 2),
             (0, 0), (-5, -2), (-2, -5), (1, -1), (-4, 3), (0, 99), (-99, 99)]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    exprs = [
        _slice(F.col("s"), lo, hi).alias(f"c{i}") for i, (lo, hi) in enumerate(pairs)
    ]
    rows = df.select("s", *exprs).collect()
    for r in rows:
        n = len(r.s)
        for i, (lo, hi) in enumerate(pairs):
            lo_i = lo if lo >= 0 else max(n + lo, 0)
            hi_i = n if hi is None else (min(hi, n) if hi >= 0 else n + hi)
            expect = r.s[lo_i:hi_i] if hi_i > lo_i else ""
            assert r[f"c{i}"] == expect, (r.s, lo, hi, r[f"c{i}"], expect)
