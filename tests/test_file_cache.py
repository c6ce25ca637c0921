"""`file` cache backend (cache_file.go:27): one file per key, content is
the value, declared as a named resource under `cache_resources:`. The
property the parquet KeyValueCache already had — state surviving a driver
restart — here extends to interop: any external process can read/write
the entries."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from bento_spark.operators.cache import FileCache
from bento_spark.plans.compiler import compile_yaml
from bento_spark.plans.lint import lint_yaml


def test_set_get_roundtrip(spark, tmp_path):
    c = FileCache(spark, str(tmp_path / "fc"))
    c.set(spark.createDataFrame([("a", "1"), ("b", "2")], "key string, value string"))
    got = {r.key: r.value for r in c.snapshot().collect()}
    assert got == {"a": "1", "b": "2"}
    # files are the storage format — external interop
    assert (tmp_path / "fc" / "a").read_text() == "1"
    # set overwrites (atomic rename)
    c.set(spark.createDataFrame([("a", "9")], "key string, value string"))
    assert {r.key: r.value for r in c.snapshot().collect()} == {"a": "9", "b": "2"}


def test_nested_keys_and_traversal_guard(spark, tmp_path):
    c = FileCache(spark, str(tmp_path / "fc2"))
    c.set(spark.createDataFrame([("sub/dir/k", "v")], "key string, value string"))
    assert {r.key: r.value for r in c.snapshot().collect()} == {"sub/dir/k": "v"}
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Py4JJavaError, match="escapes the directory"):
        c.set(spark.createDataFrame([("../evil", "v")], "key string, value string"))


def test_add_rejects_existing(spark, tmp_path):
    c = FileCache(spark, str(tmp_path / "fc3"))
    c.set(spark.createDataFrame([("a", "1")], "key string, value string"))
    rejected = c.add(
        spark.createDataFrame([("a", "x"), ("b", "2")], "key string, value string")
    )
    assert [r.key for r in rejected.collect()] == ["a"]
    got = {r.key: r.value for r in c.snapshot().collect()}
    assert got == {"a": "1", "b": "2"}  # existing value untouched


def test_delete(spark, tmp_path):
    c = FileCache(spark, str(tmp_path / "fc4"))
    c.set(spark.createDataFrame([("a", "1"), ("b", "2")], "key string, value string"))
    c.delete(spark.createDataFrame([("a",)], "key string"))
    assert {r.key for r in c.snapshot().collect()} == {"b"}


def test_mtime_ttl_expiry(spark, tmp_path):
    c = FileCache(spark, str(tmp_path / "fc5"), ttl="10 seconds")
    c.set(spark.createDataFrame([("old", "1"), ("new", "2")], "key string, value string"))
    # age one entry past the TTL by rewinding its mtime
    past = time.time() - 3600
    os.utime(str(tmp_path / "fc5" / "old"), (past, past))
    assert {r.key for r in c.snapshot().collect()} == {"new"}
    # an expired key counts as absent for add (file atomically replaced)
    rejected = c.add(spark.createDataFrame([("old", "9")], "key string, value string"))
    assert rejected.count() == 0
    assert {r.key: r.value for r in c.snapshot().collect()} == {"old": "9", "new": "2"}


def test_yaml_file_cache_survives_pipeline_restart(spark, tmp_path):
    """Two independent compile_yaml invocations (the in-process analogue of
    two `bento run` executions) share state through the directory."""
    src = tmp_path / "in"
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id int, name string"
    ).write.parquet(str(src))
    resources = f"""
cache_resources:
  - label: names
    file: {{directory: {tmp_path}/namecache}}
"""
    setter = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
{resources}
pipeline:
  processors:
    - mapping: 'root.k = this.id.string()'
    - cache: {{resource: names, operator: set, key: k, columns: [name]}}
""")
    setter.build_batch(spark)
    getter = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
{resources}
pipeline:
  processors:
    - mapping: 'root.k = this.id.string()'
    - cache: {{resource: names, operator: get, key: k}}
""")
    rows = {r.id: r.value for r in getter.build_batch(spark).collect()}
    assert rows == {1: "alpha", 2: "beta", 3: "gamma"}


def test_yaml_file_cache_multi_column_set_raises(spark, tmp_path):
    src = tmp_path / "in2"
    spark.createDataFrame([(1, "a", "b")], "id int, x string, y string").write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
cache_resources:
  - label: c
    file: {{directory: {tmp_path}/c}}
pipeline:
  processors:
    - mapping: 'root.k = this.id.string()'
    - cache: {{resource: c, operator: set, key: k}}
""")
    with pytest.raises(ValueError, match="single value column"):
        p.build_batch(spark)


def test_cached_rejects_file_backend(spark, tmp_path):
    src = tmp_path / "in3"
    spark.createDataFrame([(1,)], "id int").write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
cache_resources:
  - label: c
    file: {{directory: {tmp_path}/c3}}
pipeline:
  processors:
    - cached:
        resource: c
        key_cols: [id]
        processors:
          - mapping: 'root.out = this.id + 1'
""")
    with pytest.raises(ValueError, match="parquet-backed"):
        p.build_batch(spark)


def test_lint_cache_resources():
    assert lint_yaml("""
cache_resources:
  - label: a
    file: {directory: /tmp/x, ttl: 5m}
  - label: b
    parquet: {path: /tmp/y}
""") == []
    issues = lint_yaml("""
cache_resources:
  - file: {directory: /tmp/x}
  - label: b
    file: {}
  - label: c
  - label: d
    file: {directory: /tmp/z, ttl: nope}
""")
    assert any("needs a 'label'" in s for s in issues)
    assert any("missing 'directory'" in s for s in issues)
    assert any("needs a backend" in s for s in issues)
    assert any("bad duration" in s for s in issues)
