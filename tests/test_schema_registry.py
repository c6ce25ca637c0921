"""Confluent Schema Registry processors (reference internal/impl/confluent/
processor_schema_registry_{encode,decode}.go, client.go) — wire-format
header, REST client, mixed-schema-id batches, YAML round-trip — against
the in-process MiniSchemaRegistry."""

from __future__ import annotations

import json
import struct

import pytest

from bento_spark.operators.schema_registry import (
    MiniSchemaRegistry,
    SchemaRegistryClient,
    frame_header,
    schema_registry_decode,
    schema_registry_encode,
)

_SCHEMA_V1 = json.dumps({
    "type": "record", "name": "User",
    "fields": [{"name": "id", "type": "long"}, {"name": "name", "type": "string"}],
})
_SCHEMA_OTHER = json.dumps({
    "type": "record", "name": "Click",
    "fields": [{"name": "url", "type": "string"}],
})


@pytest.fixture()
def registry():
    r = MiniSchemaRegistry().start()
    yield r
    r.stop()


def test_client_register_latest_by_id(registry):
    c = SchemaRegistryClient(registry.url)
    sid = c.register("users-value", _SCHEMA_V1)
    assert sid == 1
    # idempotent register: same canonical schema -> same id
    assert c.register("users-value", _SCHEMA_V1) == 1
    assert c.register("clicks-value", _SCHEMA_OTHER) == 2
    got_id, got_schema = c.latest("users-value")
    assert got_id == 1 and json.loads(got_schema) == json.loads(_SCHEMA_V1)
    assert json.loads(c.schema_by_id(2)) == json.loads(_SCHEMA_OTHER)
    with pytest.raises(ConnectionError, match="404"):
        c.schema_by_id(99)
    with pytest.raises(ConnectionError, match="404"):
        c.latest("missing-subject")


def test_frame_header():
    assert frame_header(7) == b"\x00\x00\x00\x00\x07"
    assert struct.unpack(">bI", frame_header(1 << 20)) == (0, 1 << 20)


def test_encode_decode_roundtrip(spark, registry):
    SchemaRegistryClient(registry.url).register("users-value", _SCHEMA_V1)
    df = spark.createDataFrame([(1, "ada"), (2, "alan")], "id long, name string")
    enc = schema_registry_encode(df, registry.url, "users-value",
                                 ["id", "name"], out_col="blob")
    blobs = [bytes(r.blob) for r in enc.collect()]
    assert all(b[:5] == frame_header(1) for b in blobs)
    dec = schema_registry_decode(enc, registry.url, blob_col="blob",
                                 out_col="rec", keep_cols=[])
    rows = sorted(json.loads(r.rec)["name"] for r in dec.collect())
    assert rows == ["ada", "alan"]


def test_decode_mixed_ids_and_garbage(spark, registry):
    c = SchemaRegistryClient(registry.url)
    c.register("users-value", _SCHEMA_V1)
    c.register("clicks-value", _SCHEMA_OTHER)
    from bento_spark.operators.avro_codec import avro_encode_value, parse_schema

    b1 = frame_header(1) + avro_encode_value(
        {"id": 5, "name": "grace"}, parse_schema(_SCHEMA_V1))
    b2 = frame_header(2) + avro_encode_value(
        {"url": "/x"}, parse_schema(_SCHEMA_OTHER))
    df = spark.createDataFrame(
        [(1, b1), (2, b2), (3, b"\x01garbage"), (4, b"\x00\x00")],
        "n int, blob binary",
    )
    out = schema_registry_decode(df, registry.url, blob_col="blob",
                                 out_col="rec", keep_cols=["n"])
    rows = {r.n: r.rec for r in out.collect()}
    assert json.loads(rows[1]) == {"id": 5, "name": "grace"}
    assert json.loads(rows[2]) == {"url": "/x"}
    # bad magic / truncated header NULL the row, never abort
    assert rows[3] is None and rows[4] is None


def test_yaml_schema_registry_roundtrip(spark, registry, tmp_path):
    from bento_spark.plans.compiler import compile_yaml

    SchemaRegistryClient(registry.url).register("nations", json.dumps({
        "type": "record", "name": "N",
        "fields": [{"name": "word", "type": "string"},
                   {"name": "n", "type": "long"}],
    }))
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("aa\nbbb")
    out = compile_yaml(f"""
input:
  lines:
    path: {src}
pipeline:
  processors:
    - mapping: |
        root.word = this.line
        root.n = this.line.length()
    - schema_registry_encode: {{url: {registry.url}, subject: nations,
                                columns: [word, n], out: blob}}
    - schema_registry_decode: {{url: {registry.url}, column: blob, out: rec}}
    - mapping: 'root.back = this.rec.parse_json("word string, n bigint").word'
""").build_batch(spark)
    assert sorted(r.back for r in out.collect()) == ["aa", "bbb"]


def test_lint_knows_schema_registry():
    from bento_spark.plans.lint import known_processors

    assert "schema_registry_encode" in known_processors()
    assert "schema_registry_decode" in known_processors()
