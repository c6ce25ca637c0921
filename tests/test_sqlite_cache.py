"""`sql` cache backend over stdlib sqlite3 (cache_sql.go:84): one row per
key/value pair, upsert set, insert-or-fail add, no TTL — declared as a
named `sqlite:` resource under `cache_resources:`. Same restart-survival
contract as the file backend, plus real SQL-table interop."""

from __future__ import annotations

import sqlite3

import pytest

from bento_spark.operators.cache import SqliteCache
from bento_spark.plans.compiler import compile_yaml
from bento_spark.plans.lint import lint_yaml


def _kv(spark, *pairs):
    return spark.createDataFrame(list(pairs), "key string, value string")


def test_set_get_roundtrip(spark, tmp_path):
    db = str(tmp_path / "c.db")
    c = SqliteCache(spark, db)
    c.set(_kv(spark, ("a", "1"), ("b", "2")))
    got = {r.key: r.value for r in c.snapshot().collect()}
    assert got == {"a": "1", "b": "2"}
    # the table is the storage format — external SQL interop
    with sqlite3.connect(db) as con:
        assert con.execute("SELECT v FROM bento_cache WHERE k='a'").fetchone() == ("1",)
    # set upserts (ON CONFLICT DO UPDATE — cache_sql.go upsertBuilder)
    c.set(_kv(spark, ("a", "9")))
    assert {r.key: r.value for r in c.snapshot().collect()} == {"a": "9", "b": "2"}


def test_get_joins_only_needed_keys(spark, tmp_path):
    c = SqliteCache(spark, str(tmp_path / "c2.db"))
    c.set(_kv(spark, ("a", "1"), ("b", "2")))
    enriched = c.get(spark.createDataFrame([("a",), ("miss",)], "key string"))
    assert {r.key: r.value for r in enriched.collect()} == {"a": "1", "miss": None}


def test_add_rejects_existing(spark, tmp_path):
    c = SqliteCache(spark, str(tmp_path / "c3.db"))
    c.set(_kv(spark, ("a", "1")))
    rejected = c.add(_kv(spark, ("a", "x"), ("b", "2")))
    assert [r.key for r in rejected.collect()] == ["a"]
    assert {r.key: r.value for r in c.snapshot().collect()} == {"a": "1", "b": "2"}


def test_delete(spark, tmp_path):
    c = SqliteCache(spark, str(tmp_path / "c4.db"))
    c.set(_kv(spark, ("a", "1"), ("b", "2")))
    c.delete(spark.createDataFrame([("a",)], "key string"))
    assert {r.key for r in c.snapshot().collect()} == {"b"}


def test_table_name_must_be_identifier(spark, tmp_path):
    with pytest.raises(ValueError, match="identifier"):
        SqliteCache(spark, str(tmp_path / "c5.db"), table="x; DROP TABLE y")


def test_yaml_sqlite_cache_survives_pipeline_restart(spark, tmp_path):
    src = tmp_path / "in"
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id int, name string"
    ).write.parquet(str(src))
    resources = f"""
cache_resources:
  - label: names
    sqlite: {{path: {tmp_path}/names.db, table: names}}
"""
    compile_yaml(f"""
input:
  parquet: {{path: {src}}}
{resources}
pipeline:
  processors:
    - mapping: 'root.k = this.id.string()'
    - cache: {{resource: names, operator: set, key: k, columns: [name]}}
""").build_batch(spark)
    rows = {
        r.id: r.value
        for r in compile_yaml(f"""
input:
  parquet: {{path: {src}}}
{resources}
pipeline:
  processors:
    - mapping: 'root.k = this.id.string()'
    - cache: {{resource: names, operator: get, key: k}}
""").build_batch(spark).collect()
    }
    assert rows == {1: "alpha", 2: "beta"}


def test_lint_sqlite_resource():
    assert lint_yaml("""
cache_resources:
  - label: a
    sqlite: {path: /tmp/x.db}
""") == []
    issues = lint_yaml("""
cache_resources:
  - label: a
    sqlite: {table: t}
""")
    assert any("(sqlite): missing 'path'" in s for s in issues)
