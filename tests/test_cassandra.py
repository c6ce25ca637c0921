"""Cassandra connector (reference internal/impl/cassandra/
{output,input}.go): CQL v4 client (STARTUP/QUERY/PREPARE/EXECUTE),
typed binds, YAML round-trip — against the in-process MiniCassandraServer."""

from __future__ import annotations

import pytest

from bento_spark.plans.compiler import _split_args_array, compile_yaml
from bento_spark.streaming.cassandra import (
    CassandraClient,
    MiniCassandraServer,
    cassandra_read,
    decode_value,
    encode_value,
)


@pytest.fixture()
def server():
    s = MiniCassandraServer().start()
    s.create_table("ks.events", {"id": "bigint", "name": "varchar",
                                 "score": "double", "ok": "boolean",
                                 "small": "int"})
    yield s
    s.stop()


def test_value_codec_roundtrip():
    for v, t in [(7, 0x09), (1 << 40, 0x02), (2.5, 0x07), (True, 0x04),
                 (False, 0x04), ("héllo", 0x0D)]:
        assert decode_value(encode_value(v, t), t) == v
    assert encode_value(None, 0x09) is None and decode_value(None, 0x09) is None


def test_prepare_execute_query_roundtrip(server):
    c = CassandraClient(server.host, server.port)
    try:
        stmt, cols = c.prepare(
            "INSERT INTO ks.events (id, name, score, ok, small) VALUES (?, ?, ?, ?, ?)")
        assert [t for _n, t in cols] == [0x02, 0x0D, 0x07, 0x04, 0x09]
        c.execute(stmt, [encode_value(v, t) for v, (_n, t) in
                         zip([1, "ada", 0.5, True, 7], cols)])
        c.execute(stmt, [encode_value(v, t) for v, (_n, t) in
                         zip([2, "alan", None, False, -1], cols)])
        rows = c.query("SELECT * FROM ks.events")
        assert rows == [
            {"id": 1, "name": "ada", "score": 0.5, "ok": True, "small": 7},
            {"id": 2, "name": "alan", "score": None, "ok": False, "small": -1},
        ]
        # unknown table errors with the server's message
        with pytest.raises(ConnectionError, match="unknown table"):
            c.query("SELECT * FROM ks.missing")
    finally:
        c.close()


def test_split_args_array():
    assert _split_args_array('root = [ this.id, this.name ]') == [
        "this.id", "this.name"]
    assert _split_args_array(
        'root = [this.a.format("x,y"), [1,2].sum(), this.b]') == [
        'this.a.format("x,y")', "[1,2].sum()", "this.b"]
    with pytest.raises(ValueError, match="root = "):
        _split_args_array("this.a")


def test_yaml_cassandra_output_and_input(spark, server, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("ada\nalan\ngrace")
    p = compile_yaml(f"""
input:
  lines:
    path: {src}
pipeline:
  processors:
    - mapping: |
        root.name = this.line
        root.id = this.line.length()
output:
  cassandra:
    addresses: ["{server.address}"]
    query: 'INSERT INTO ks.people (id, name) VALUES (?, ?)'
    args_mapping: 'root = [ this.id, this.name ]'
""")
    server.create_table("ks.people", {"id": "bigint", "name": "varchar"})
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(90)
    rows = sorted((r["id"], r["name"]) for r in server.table_rows("ks.people"))
    assert rows == [(3, "ada"), (4, "alan"), (5, "grace")]

    # input.cassandra reads the table back, typed
    back = compile_yaml(f"""
input:
  cassandra:
    addresses: ["{server.address}"]
    query: 'SELECT * FROM ks.people'
pipeline:
  processors:
    - mapping: 'root.label = this.name.uppercase()'
""").build_batch(spark)
    got = sorted((r.id, r.label) for r in back.collect())
    assert got == [(3, "ADA"), (4, "ALAN"), (5, "GRACE")]
    assert dict(back.dtypes)["id"] == "bigint"


def test_writer_arity_mismatch_raises(spark, server):
    from bento_spark.functions.bloblang import compile_expr
    from bento_spark.streaming.cassandra import cassandra_writer

    df = spark.createDataFrame([(1, "x")], "id long, name string")
    w = cassandra_writer(server.address,
                         "INSERT INTO ks.events (id, name) VALUES (?, ?)",
                         [compile_expr("this.id")])
    with pytest.raises(Exception, match="bind variables"):
        w(df, 0)


def test_lint_knows_cassandra():
    from bento_spark.plans.lint import known_inputs

    assert "cassandra" in known_inputs()


def test_read_all_null_column_keeps_type(spark, server):
    """Schema comes from Rows metadata, never value inference — an
    all-NULL optional column must not kill the read."""
    c = CassandraClient(server.host, server.port)
    stmt, cols = c.prepare(
        "INSERT INTO ks.events (id, name, score, ok, small) VALUES (?, ?, ?, ?, ?)")
    c.execute(stmt, [encode_value(v, t) for v, (_n, t) in
                     zip([1, "x", None, None, None], cols)])
    c.close()
    df = cassandra_read(spark, server.address, "SELECT * FROM ks.events")
    types = dict(df.dtypes)
    assert types == {"id": "bigint", "name": "string", "score": "double",
                     "ok": "boolean", "small": "int"}
    row = df.collect()[0]
    assert row.score is None and row.ok is None and row.small is None


def test_split_args_array_escaped_backslash():
    # a string literal ENDING in an escaped backslash must still close
    assert _split_args_array('root = [ "\\\\", this.b ]') == ['"\\\\"', "this.b"]
    assert _split_args_array('root = [ "a\\"b,c", this.b ]') == ['"a\\"b,c"', "this.b"]
