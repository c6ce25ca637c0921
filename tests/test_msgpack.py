"""msgpack codec: spec wire-format vectors, roundtrip, DataFrame surface."""

from __future__ import annotations

import pytest

from bento_spark.operators.msgpack_codec import mp_decode, mp_encode, msgpack_decode, msgpack_encode
from bento_spark.plans.compiler import compile_yaml


def test_wire_format_vectors():
    # canonical encodings from the msgpack spec
    assert mp_encode(None) == b"\xc0"
    assert mp_encode(True) == b"\xc3"
    assert mp_encode(7) == b"\x07"
    assert mp_encode(-1) == b"\xff"
    assert mp_encode(200) == b"\xcc\xc8"
    assert mp_encode(70000) == b"\xce\x00\x01\x11\x70"
    assert mp_encode(-200) == b"\xd1\xff\x38"
    assert mp_encode(1.5) == b"\xcb\x3f\xf8\x00\x00\x00\x00\x00\x00"
    assert mp_encode("hi") == b"\xa2hi"
    assert mp_encode(b"\x01\x02") == b"\xc4\x02\x01\x02"
    assert mp_encode([1, "a"]) == b"\x92\x01\xa1a"
    assert mp_encode({"k": 1}) == b"\x81\xa1k\x01"


def test_roundtrip_values():
    cases = [
        None, True, False, 0, 127, 128, -32, -33, 2**40, -(2**40), 3.25,
        "", "x" * 40, "x" * 70000, b"", b"\x00" * 300,
        list(range(20)), {"a": [1, {"b": None}], "c": b"\xff"},
    ]
    for v in cases:
        assert mp_decode(mp_encode(v)) == v
    with pytest.raises(ValueError, match="trailing"):
        mp_decode(mp_encode(1) + b"\x00")
    with pytest.raises(TypeError, match="unsupported type"):
        mp_encode(object())


def test_dataframe_roundtrip_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, None), (2, "b", -0.25, "x")],
        "id bigint, s string, v double, opt string",
    )
    enc = msgpack_encode(df, ["id", "s", "v", "opt"], out_col="blob")
    back = msgpack_decode(enc, "blob", "id bigint, s string, v double, opt string")
    rows = sorted((r.id, r.s, r.v, r.opt) for r in back.collect())
    assert rows == [(1, "a", 1.5, None), (2, "b", -0.25, "x")]
    b1 = sorted(bytes(r.blob) for r in enc.collect())
    b2 = sorted(bytes(r.blob) for r in msgpack_encode(df, ["id", "s", "v", "opt"], out_col="blob").collect())
    assert b1 == b2  # canonical encoding -> byte-identical blobs


def test_yaml_msgpack_and_stdin_gate(spark, tmp_path):
    src = tmp_path / "src"
    spark.createDataFrame([(5, "z")], "n bigint, s string").write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - msgpack_encode: {{columns: [n, s], out: blob}}
    - msgpack_decode: {{column: blob, schema: "n bigint, s string"}}
""")
    assert [(r.n, r.s) for r in p.build_batch(spark).collect()] == [(5, "z")]
    with pytest.raises(ValueError, match="batch-only"):
        compile_yaml("input:\n  stdin: {}\n").build_stream(spark)


def test_msgpack_decode_nested_type_schema(spark):
    """DDL schemas with commas inside nested types must parse correctly
    (previously a naive comma split desynced the output columns)."""
    from bento_spark.operators.msgpack_codec import msgpack_decode, msgpack_encode

    df = spark.createDataFrame(
        [(1, ["a", "b"], {"x": "1"})],
        "id int, tags array<string>, attrs map<string,string>",
    )
    enc = msgpack_encode(df, ["tags", "attrs"])
    dec = msgpack_decode(
        enc, "msgpack_blob", "tags array<string>, attrs map<string,string>", keep_cols=["id"]
    ).collect()
    assert dec[0].id == 1 and list(dec[0].tags) == ["a", "b"]
    assert dict(dec[0].attrs) == {"x": "1"}
