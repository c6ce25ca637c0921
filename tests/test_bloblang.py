"""Bloblang-subset compiler tests — golden outputs mirroring reference
Bloblang semantics (arithmetic.go operator set, methods_strings.go,
mapping executor delete-as-filter)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bento_spark.functions.bloblang import BloblangError, compile_expr, compile_mapping


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "Hello World", 2.5, "a,b,c"), (2, "spark", -3.0, "x,y"), (3, None, 10.0, "")],
        "id int, s string, x double, csv string",
    )


def _one(df, expr_src, **filters):
    out = df.select(compile_expr(expr_src).alias("v"))
    return [r.v for r in out.collect()]


def test_arithmetic_and_comparison(df):
    assert _one(df, "1 + 2 * 3") == [7, 7, 7]
    assert _one(df, "this.x * 2") == [5.0, -6.0, 20.0]
    assert _one(df, "this.id >= 2") == [False, True, True]
    assert _one(df, "this.id % 2 == 1") == [True, False, True]


def test_pipe_coalesce(df):
    # `|` is coalesce (reference arithmetic.go:455)
    assert _one(df, 'this.s | "fallback"') == ["Hello World", "spark", "fallback"]


def test_boolean_ops(df):
    assert _one(df, "this.id == 1 || this.id == 3") == [True, False, True]
    assert _one(df, "!(this.x > 0)") == [False, True, False]


def test_if_else(df):
    assert _one(df, 'if this.x > 0 { "pos" } else { "neg" }') == ["pos", "neg", "pos"]


def test_string_methods(df):
    assert _one(df, "this.s.uppercase()") == ["HELLO WORLD", "SPARK", None]
    assert _one(df, "this.s.length()") == [11, 5, None]
    assert _one(df, 'this.s.contains("World")') == [True, False, None]
    assert _one(df, 'this.s.replace_all("l", "L")') == ["HeLLo WorLd", "spark", None]
    assert _one(df, 'this.csv.split(",").length()') == [3, 2, 1]


def test_number_methods(df):
    assert _one(df, "this.x.abs()") == [2.5, 3.0, 10.0]
    assert _one(df, "this.x.floor()") == [2, -3, 10]


def test_array_literal_and_methods(df):
    assert _one(df, "[1, 2, 3].sum()") == [6.0, 6.0, 6.0]
    assert _one(df, "[3, 1, 2].sort().first()") == [1, 1, 1]


def test_hash_encode(df):
    vals = _one(df, 'this.s.hash("md5")')
    assert vals[0] == "b10a8db164e0754105b7a99be72e3fe5"  # md5("Hello World")
    b64 = _one(df, 'this.s.encode("base64")')
    assert b64[0] == "SGVsbG8gV29ybGQ="


def test_type_coercion(df):
    assert _one(df, "this.id.string()") == ["1", "2", "3"]
    assert _one(df, 'this.s.catch("dflt")') == ["Hello World", "spark", "dflt"]


def test_mapping_assign_and_filter(df):
    m = compile_mapping(
        """
        # computed columns + delete-as-filter (mapping executor semantics)
        root.double_x = this.x * 2
        root.tag = if this.x > 0 { "pos" } else { "neg" }
        root = deleted() if this.id == 2
        """
    )
    out = m.apply(df).select("id", "double_x", "tag").orderBy("id").collect()
    assert [r.id for r in out] == [1, 3]
    assert [r.double_x for r in out] == [5.0, 20.0]
    assert [r.tag for r in out] == ["pos", "pos"]


def test_mapping_meta(df):
    m = compile_mapping('meta src = "unit"\nroot.y = this.id + 1')
    row = m.apply(df).filter(F.col("id") == 1).select("y", "meta").first()
    assert row.y == 2
    assert row.meta == {"src": "unit"}


def test_unsupported_raises():
    with pytest.raises(BloblangError):
        compile_expr("this.s.explode_into_chaos()")
    with pytest.raises(BloblangError):
        compile_mapping("emit.x = 1")  # unknown statement form


def test_encode_schemes(df):
    # RFC 4648 url-safe variants + ascii85 (methods_strings.go encode:93).
    # Vector with '+'/'/' in standard base64: bytes 0xfb 0xef 0xbe
    import base64

    bdf = df.sparkSession.createDataFrame([(bytearray(b"\xfb\xef\xbe"),)], "b binary")
    out = bdf.select(
        compile_expr('this.b.encode("base64")').alias("std"),
        compile_expr('this.b.encode("base64url")').alias("url"),
        compile_expr('this.b.encode("base64rawurl")').alias("raw"),
    ).first()
    assert out.std == base64.b64encode(b"\xfb\xef\xbe").decode()
    assert out.url == base64.urlsafe_b64encode(b"\xfb\xef\xbe").decode()
    assert out.raw == base64.urlsafe_b64encode(b"\xfb\xef\xbe").decode().rstrip("=")
    # roundtrips
    rt = bdf.select(
        compile_expr('this.b.encode("base64url").decode("base64url")').alias("u"),
        compile_expr('this.b.encode("base64rawurl").decode("base64rawurl")').alias("r"),
        compile_expr('this.b.encode("ascii85").decode("ascii85")').alias("a"),
    ).first()
    assert bytes(rt.u) == b"\xfb\xef\xbe" and bytes(rt.r) == b"\xfb\xef\xbe"
    assert bytes(rt.a) == b"\xfb\xef\xbe"
    # ascii85 known vector (same as Go encoding/ascii85 for this input)
    a85 = _one(df, 'this.s.encode("ascii85")')
    assert a85[0] == base64.a85encode(b"Hello World").decode()


def test_parse_format_yaml(df):
    ydf = df.sparkSession.createDataFrame(
        [("a: 1\nb: [x, y]\n",), (None,)], "y string"
    )
    out = ydf.select(
        compile_expr('this.y.parse_yaml("a int, b array<string>")').alias("v")
    ).collect()
    assert out[0].v.a == 1 and list(out[0].v.b) == ["x", "y"]
    assert out[1].v is None
    rt = ydf.select(
        compile_expr(
            'this.y.parse_yaml("a int, b array<string>").format_yaml()'
        ).alias("t")
    ).first()
    assert "a: 1" in rt.t and "- x" in rt.t


def test_jwt_hs_sign_and_parse(df):
    """Sign with the pure-expression HMAC, verify against Python's hmac
    (the library truth for the HS-family), and round-trip claims."""
    import base64
    import hashlib
    import hmac as pyhmac
    import json

    spark = df.sparkSession
    claims = '{"sub":"u1","n":7}'
    jdf = spark.createDataFrame([(claims,)], "claims string")
    tok = jdf.select(
        compile_expr('this.claims.sign_jwt_hs256("topsecret")').alias("t")
    ).first().t
    h, p, s = tok.split(".")
    # header is the canonical compact form
    assert json.loads(base64.urlsafe_b64decode(h + "==")) == {"alg": "HS256", "typ": "JWT"}
    expect = base64.urlsafe_b64encode(
        pyhmac.new(b"topsecret", f"{h}.{p}".encode(), hashlib.sha256).digest()
    ).rstrip(b"=").decode()
    assert s == expect
    # verified parse returns typed claims
    tdf = spark.createDataFrame([(tok,), (tok[:-2] + "xx",)], "tok string")
    out = tdf.select(
        compile_expr('this.tok.parse_jwt_hs256("topsecret", "sub string, n int")').alias("c")
    ).collect()
    assert out[0].c.sub == "u1" and out[0].c.n == 7
    assert out[1].c is None  # tampered signature -> NULL
    # wrong secret -> NULL; wrong alg family -> NULL
    bad = tdf.select(
        compile_expr('this.tok.parse_jwt_hs256("other", "sub string, n int")').alias("c")
    ).first()
    assert bad.c is None
    wrong_alg = tdf.select(
        compile_expr('this.tok.parse_jwt_hs512("topsecret", "sub string, n int")').alias("c")
    ).first()
    assert wrong_alg.c is None
    # hs512 round-trips too
    tok512 = jdf.select(
        compile_expr('this.claims.sign_jwt_hs512("k2")').alias("t")
    ).first().t
    ok512 = spark.createDataFrame([(tok512,)], "tok string").select(
        compile_expr('this.tok.parse_jwt_hs512("k2", "sub string, n int")').alias("c")
    ).first()
    assert ok512.c.n == 7


def test_json_path_method(df):
    jdf = df.sparkSession.createDataFrame(
        [('{"a":{"b":[10,20,30]},"name":"x"}',)], "doc string"
    )
    out = jdf.select(
        compile_expr('this.doc.json_path("$.a.b[1]")').alias("v"),
        compile_expr('this.doc.json_path("$.name")').alias("n"),
        compile_expr('this.doc.json_path("$.missing")').alias("m"),
    ).first()
    assert out.v == "20" and out.n == "x" and out.m is None


def test_jwt_large_claims_and_garbage_tokens(df):
    """>57-byte claims cross base64's MIME-chunk threshold (CRLF corruption
    found in review); garbage tokens must NULL, not abort, under ANSI."""
    import base64
    import hashlib
    import hmac as pyhmac
    import json

    spark = df.sparkSession
    claims = json.dumps({"sub": "user-" + "x" * 80, "scope": ["a", "b", "c"], "n": 123})
    assert len(claims) > 57
    jdf = spark.createDataFrame([(claims,)], "claims string")
    tok = jdf.select(
        compile_expr('this.claims.sign_jwt_hs256("k")').alias("t")
    ).first().t
    assert "\r" not in tok and "\n" not in tok
    h, p, s = tok.split(".")
    expect = base64.urlsafe_b64encode(
        pyhmac.new(b"k", f"{h}.{p}".encode(), hashlib.sha256).digest()
    ).rstrip(b"=").decode()
    assert s == expect  # external verifiers accept the token
    # hs512 signatures are 88 b64 chars (> 76): externally-minted token parses
    ext_sig = base64.urlsafe_b64encode(
        pyhmac.new(b"k2", f"{h}.{p}".encode(), hashlib.sha512).digest()
    ).rstrip(b"=").decode()
    hdr512 = base64.urlsafe_b64encode(b'{"alg":"HS512","typ":"JWT"}').rstrip(b"=").decode()
    ext_sig512 = base64.urlsafe_b64encode(
        pyhmac.new(b"k2", f"{hdr512}.{p}".encode(), hashlib.sha512).digest()
    ).rstrip(b"=").decode()
    ext_tok = f"{hdr512}.{p}.{ext_sig512}"
    got = spark.createDataFrame([(ext_tok,)], "tok string").select(
        compile_expr('this.tok.parse_jwt_hs512("k2", "sub string, n int")').alias("c")
    ).first()
    assert got.c is not None and got.c.n == 123
    # garbage tokens: NULL per row, job survives (ANSI-safe decode)
    bad = spark.createDataFrame(
        [("!!!not base64###",), ("a.b",), ("",), (None,)], "tok string"
    )
    out = bad.select(
        compile_expr('this.tok.parse_jwt_hs256("k", "sub string, n int")').alias("c")
    ).collect()
    assert all(r.c is None for r in out)


def test_encode_large_payload_and_bad_decode(df):
    """base64 family must be single-line RFC 4648 for payloads past the
    76-char MIME threshold; decode of malformed input NULLs the row."""
    import base64

    payload = bytes(range(200))
    bdf = df.sparkSession.createDataFrame([(bytearray(payload),)], "b binary")
    out = bdf.select(
        compile_expr('this.b.encode("base64")').alias("std"),
        compile_expr('this.b.encode("base64rawurl")').alias("raw"),
    ).first()
    assert out.std == base64.b64encode(payload).decode()
    assert out.raw == base64.urlsafe_b64encode(payload).decode().rstrip("=")
    bad = df.sparkSession.createDataFrame(
        [("%%%not-b64%%%",), ("zz",)], "t string"
    )
    got = bad.select(
        compile_expr('this.t.decode("base64")').alias("b"),
        compile_expr('this.t.decode("hex")').alias("h"),
        compile_expr('this.t.decode("ascii85")').alias("a"),
    ).collect()
    assert got[0].b is None and got[0].h is None and got[0].a is None


def test_remap_preserves_error_and_meta(df):
    """root = {...} must not drop the error/meta columns — the reference
    keeps the error flag outside the document, so a root reassignment never
    unflags an errored message (DLQ bypass otherwise)."""
    from pyspark.sql import functions as F

    src = df.sparkSession.createDataFrame(
        [(1, "a", None), (2, "b", "boom")], "id int, s string, error string"
    ).withColumn("meta", F.create_map(F.lit("k"), F.lit("v")))
    m = compile_mapping('root = {"out": this.s}')
    got = m.apply(src).orderBy(F.col("error").asc_nulls_first()).collect()
    assert [r.out for r in got] == ["a", "b"]
    assert [r.error for r in got] == [None, "boom"]
    assert got[0].meta == {"k": "v"}
    # an explicit remap of error wins over the carry-through
    m2 = compile_mapping('root = {"out": this.s, "error": "reset"}')
    got2 = m2.apply(src).collect()
    assert all(r.error == "reset" for r in got2)


def test_parse_url_port_with_userinfo(df):
    udf_ = df.sparkSession.createDataFrame(
        [
            ("https://user:pw@api.example.com:8443/x?q=1",),
            ("http://plain.example.com/path",),
        ],
        "u string",
    )
    out = udf_.select(compile_expr("this.u.parse_url()").alias("p")).collect()
    assert out[0].p.port == 8443 and out[0].p.host == "api.example.com"
    assert out[1].p.port is None


def test_element_access_null_safe_and_fixed_methods(df):
    """Empty/no-match element access NULLs the row (ANSI would abort);
    index_of, ts_unix_milli, range, enumerated, slice fixed semantics."""
    from datetime import datetime, timezone

    spark = df.sparkSession
    adf = spark.createDataFrame([([1, 2, 3],), ([],)], "arr array<int>")
    out = adf.select(
        compile_expr("this.arr.find(x -> x > 99)").alias("f"),
        compile_expr("this.arr.first()").alias("fi"),
        compile_expr("this.arr.last()").alias("la"),
        compile_expr("this.arr[9]").alias("oob"),
        compile_expr("this.arr.enumerated()").alias("en"),
    ).collect()
    assert out[0].f is None and out[0].oob is None
    assert out[0].fi == 1 and out[0].la == 3
    assert [tuple(e) for e in out[0].en] == [(0, 1), (1, 2), (2, 3)]
    assert out[1].fi is None and out[1].la is None and list(out[1].en) == []
    # index_of: 0-based, -1 when absent (F.locate takes a python substr)
    assert _one(df, 'this.s.index_of("World")') == [6, -1, None]
    # ts_unix_milli preserves sub-second precision
    ts = datetime(2024, 1, 1, 0, 0, 0, 123000, tzinfo=timezone.utc)
    tdf = spark.createDataFrame([(ts,)], "t timestamp")
    assert tdf.select(compile_expr("this.t.ts_unix_milli()").alias("m")).first().m == 1704067200123
    # range: exclusive stop, empty when b <= a, negative step excludes stop
    assert _one(df, "range(2, 5)")[0] == [2, 3, 4]
    assert _one(df, "range(5, 5)")[0] == []
    assert _one(df, "range(10, 0, 0 - 2)")[0] == [10, 8, 6, 4, 2]
    # slice: negative indices count from the end
    assert _one(df, "this.s.slice(0 - 5)") == ["World", "spark", None]
    assert _one(df, "this.s.slice(1, 0 - 1)") == ["ello Worl", "par", None]
    # non-ASCII literals survive unquoting
    assert _one(df, '"café"')[0] == "café"


def test_string_plus_concatenation(df):
    """+ with a string literal on either side concatenates (arithmetic.go
    Add on strings); numeric + stays numeric."""
    assert _one(df, '"id-" + this.id') == ["id-1", "id-2", "id-3"]
    assert _one(df, 'this.id + "-tail"') == ["1-tail", "2-tail", "3-tail"]
    assert _one(df, '"a" + "b" + "c"') == ["abc", "abc", "abc"]
    assert _one(df, "this.id + 1") == [2, 3, 4]


def test_string_plus_null_renders_null_literal(df):
    """NULL operands render 'null' (compile_interpolated precedent) — a
    bare concat would silently blank the whole field."""
    assert _one(df, '"v: " + this.s') == ["v: Hello World", "v: spark", "v: null"]


def test_msgpack_bloblang_methods(spark):
    """parse_msgpack/format_msgpack (impl/msgpack/bloblang.go): roundtrip
    through the spec-level codec with a typed schema."""
    from bento_spark.operators.msgpack_codec import mp_decode, mp_encode

    blob = mp_encode({"a": 7, "b": "xy", "f": 1.5})
    df = spark.createDataFrame([(blob,)], "m binary")
    row = df.select(
        compile_expr('this.m.parse_msgpack("a int, b string, f double")').alias("p")
    ).collect()[0]
    assert row.p.a == 7 and row.p.b == "xy" and row.p.f == 1.5

    # format_msgpack: struct -> canonical blob, decodable by the codec
    out = df.select(
        compile_expr('this.m.parse_msgpack("a int, b string, f double").format_msgpack()').alias("blob")
    ).collect()[0]
    assert mp_decode(bytes(out.blob)) == {"a": 7, "b": "xy", "f": 1.5}

    # malformed blob NULLs the row (catch protocol), never throws
    bad = spark.createDataFrame([(b"\xc1\x00",)], "m binary")
    assert bad.select(
        compile_expr('this.m.parse_msgpack("a int")').alias("p")
    ).collect()[0].p is None


def test_file_function_reads_at_compile_time(spark, tmp_path):
    (tmp_path / "tmpl.txt").write_text("prefix-%s")
    df = spark.createDataFrame([("x",)], "s string")
    out = df.select(
        compile_expr(f'file("{tmp_path}/tmpl.txt").format(this.s)').alias("v")
    ).collect()[0]
    assert out.v == "prefix-x"


def test_counter_function(spark):
    # impl/pure/bloblang_general.go: yields min first, increments, wraps
    # past max back to min; dev-grade single-partition window (doc'd)
    df = spark.range(7).select(F.col("id").alias("i"))
    out = df.select(
        compile_expr("counter()").alias("c"),
        compile_expr("counter(10, 12)").alias("w"),
    ).orderBy("c").collect()
    assert [r.c for r in out] == [1, 2, 3, 4, 5, 6, 7]
    assert [r.w for r in out] == [10, 11, 12, 10, 11, 12, 10]
    with pytest.raises(BloblangError, match="set"):
        compile_expr("counter(1, 5, 0)")


def test_snowflake_id_function(spark):
    # impl/lang/bloblang.go:99 — bwmarrin layout: ms-since-epoch<<22 |
    # node<<12 | seq; explicit node_id pins the node bits; default node
    # is the partition id (documented deviation) so ids stay unique
    # across executors
    df = spark.range(3000).repartition(4)
    rows = df.select(
        compile_expr("snowflake_id()").alias("sid"),
        compile_expr("snowflake_id(7)").alias("sid7"),
    ).collect()
    vals = [int(r.sid) for r in rows]
    assert len(set(vals)) == len(vals)
    v7 = int(rows[0].sid7)
    assert (v7 >> 12) & 1023 == 7
    # 41-bit ms field is after the 2010-11-04 custom epoch and before 2039
    assert 0 < (v7 >> 22) < (1 << 41)
    assert isinstance(rows[0].sid, str)
