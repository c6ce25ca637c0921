"""Compiler wave 3: YAML parity sections (switch/group_by/try/catch/while/
select_parts/insert_part/cache/cached/lookup), `${! expr }` interpolation,
and the bloblang method gap-fill (parse_*/escape_html/encrypt_aes/hmac/
squash/key_values/map_each_key). The oracle twins in __spark_entry__ verify
values; these tests cover semantics the oracles can't (error routing,
memoization, loop bounds, config errors)."""

from __future__ import annotations

import hashlib
import hmac as py_hmac

import pytest
from pyspark.sql import functions as F

from bento_spark.functions.bloblang import BloblangError, compile_expr, compile_interpolated
from bento_spark.plans.compiler import compile_yaml


# ---------------------------------------------------------------- bloblang


def test_bloblang_parse_methods(spark):
    df = spark.createDataFrame(
        [("x,7", '{"a": 3}', "https://u@example.com:8080/p?q=1#f", "PT1H30M5.5S", "-P1DT1S", "junk")],
        ["csv", "js", "url", "d1", "d2", "bad"],
    )
    r = df.select(
        compile_expr('this.csv.parse_csv("s string, n int").n').alias("n"),
        compile_expr('this.js.parse_json("a int").a').alias("a"),
        compile_expr("this.url.parse_url().host").alias("host"),
        compile_expr("this.url.parse_url().port").alias("port"),
        compile_expr("this.url.parse_url().scheme").alias("scheme"),
        compile_expr("this.d1.parse_duration_iso8601()").alias("ns1"),
        compile_expr("this.d2.parse_duration_iso8601()").alias("ns2"),
        compile_expr("this.bad.parse_duration_iso8601()").alias("ns3"),
    ).collect()[0]
    assert (r.n, r.a, r.host, r.port, r.scheme) == (7, 3, "example.com", 8080, "https")
    assert r.ns1 == int(5405.5 * 1e9)
    assert r.ns2 == -int(86401 * 1e9)
    assert r.ns3 is None


def test_bloblang_html_crypto(spark):
    df = spark.createDataFrame([("<a & 'b'>", "payload")], ["h", "m"])
    r = df.select(
        compile_expr("this.h.escape_html()").alias("esc"),
        compile_expr("this.h.escape_html().unescape_html()").alias("rt"),
        compile_expr('this.m.hmac("sha256", "k1")').alias("mac"),
        compile_expr('this.m.hmac("sha512", "k1")').alias("mac512"),
        compile_expr(
            'this.m.encrypt_aes("cbc", "0123456789abcdef", "abcdef9876543210")'
            '.decrypt_aes("cbc", "0123456789abcdef").string()'
        ).alias("aes_rt"),
    ).collect()[0]
    assert r.esc == "&lt;a &amp; &#39;b&#39;&gt;"
    assert r.rt == "<a & 'b'>"
    assert r.mac == py_hmac.new(b"k1", b"payload", hashlib.sha256).hexdigest()
    assert r.mac512 == py_hmac.new(b"k1", b"payload", hashlib.sha512).hexdigest()
    assert r.aes_rt == "payload"
    with pytest.raises(BloblangError, match="hmac algorithm"):
        compile_expr('this.m.hmac("md5", "k")')
    with pytest.raises(BloblangError, match="AES mode"):
        compile_expr('this.m.encrypt_aes("ofb", "k", "iv")')


def test_bloblang_structured_methods(spark):
    df = spark.sql("SELECT array(map('a','1'), map('b','2')) AS ms, map('a',1,'b',2) AS m")
    r = df.select(
        compile_expr("this.ms.squash()").alias("sq"),
        compile_expr("this.m.key_values()").alias("kv"),
        compile_expr("this.m.map_each_key(k -> k.uppercase())").alias("mk"),
        compile_expr('this.m.with("a")').alias("w"),
    ).collect()[0]
    assert r.sq == {"a": "1", "b": "2"}
    assert [(e.key, e.value) for e in r.kv] == [("a", 1), ("b", 2)]
    assert r.mk == {"A": 1, "B": 2}
    assert r.w == {"a": 1}


def test_interpolation(spark):
    df = spark.createDataFrame([("clip1", 5)], ["cid", "n"])
    static, mixed, only = df.select(
        compile_interpolated("just text").alias("a"),
        compile_interpolated("id=${! this.cid.uppercase() }/n=${! this.n * 2 }").alias("b"),
        compile_interpolated("${! this.cid }").alias("c"),
    ).collect()[0]
    assert static == "just text"
    assert mixed == "id=CLIP1/n=10"
    assert only == "clip1"


# ------------------------------------------------------------ yaml sections


def _events(spark, tmp_path):
    path = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [(i, f"u{i % 3}", float(i * 10)) for i in range(1, 7)], ["eid", "uid", "v"]
    ).write.mode("overwrite").parquet(path)
    return path


def test_yaml_cache_add_rejects_dups(spark, tmp_path):
    src = _events(spark, tmp_path)
    cache_dir = str(tmp_path / "cache")
    seed = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - select_parts: {{key: uid, order_by: eid, indexes: [0]}}
    - cache: {{resource: {cache_dir}, operator: add, key: uid, key_col: uid, columns: [eid]}}
""")
    first = seed.build_batch(spark)
    assert first.filter(F.col("error").isNotNull()).count() == 0
    again = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - cache: {{resource: {cache_dir}, operator: add, key: uid, key_col: uid, columns: [eid]}}
""").build_batch(spark)
    # every uid is already present -> every row errored (reference add
    # operator failure semantics, processor_cache.go)
    assert again.filter(F.col("error").isNotNull()).count() == 6
    with pytest.raises(ValueError, match="unsupported cache operator"):
        compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - cache: {{resource: {cache_dir}, operator: incr, key: uid}}
""").build_batch(spark)


def test_yaml_cached_memoizes(spark, tmp_path):
    src = _events(spark, tmp_path)
    cache_dir = str(tmp_path / "memo")
    conf = f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - cached:
        resource: {cache_dir}
        key_cols: [uid]
        processors:
          - mapping: root.expensive = this.v * 100
"""
    out1 = compile_yaml(conf).build_batch(spark)
    first = {r.uid: r.expensive for r in out1.select("uid", "expensive").distinct().collect()}
    assert out1.count() == 6
    # second run: all keys hit the cache; VALUES identical per key (a
    # recompute-every-time or corrupted-cache regression must fail here)
    out2 = compile_yaml(conf).build_batch(spark)
    got = {r.uid: r.expensive for r in out2.select("uid", "expensive").distinct().collect()}
    assert got == first and set(got) == {"u0", "u1", "u2"}
    assert all(v is not None for v in got.values())


def test_yaml_while_bounded_by_max_loops(spark, tmp_path):
    src = _events(spark, tmp_path)
    out = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - while:
        check: this.v >= 0
        max_loops: 3
        processors:
          - mapping: root.v = this.v + 1
""").build_batch(spark)
    # check never turns false -> exactly max_loops iterations
    assert {r.v - r.eid * 10 for r in out.collect()} == {3.0}


def test_yaml_while_streaming_raises(spark, tmp_path):
    src = _events(spark, tmp_path)
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}, schema: "eid bigint, uid string, v double"}}
pipeline:
  processors:
    - while: {{check: this.v > 0, processors: [{{mapping: root.v = this.v - 1}}]}}
""")
    with pytest.raises(ValueError, match="batch-only"):
        p.build_stream(spark)


def test_yaml_group_by_per_group_processors(spark, tmp_path):
    src = _events(spark, tmp_path)
    out = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - group_by:
        checks:
          - name: low
            check: this.v < 30
            processors:
              - mapping: root.v = this.v * -1
          - name: high
            check: this.v >= 30
        default: rest
""").build_batch(spark)
    rows = {r.eid: (r._group, r.v) for r in out.collect()}
    assert rows[1] == ("low", -10.0) and rows[2] == ("low", -20.0)
    assert rows[3] == ("high", 30.0) and rows[6] == ("high", 60.0)


def test_yaml_lookup_missing_keys_raises(spark, tmp_path):
    src = _events(spark, tmp_path)
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - lookup:
        right: {{parquet: {{path: {src}}}}}
""")
    with pytest.raises(ValueError, match="keys"):
        p.build_batch(spark)


def test_env_interpolation_escape():
    from bento_spark.plans.compiler import interpolate_env

    out = interpolate_env(
        "a: ${NAME}\nb: $${NAME}\nc: $${OTHER:dflt}", env={"NAME": "v"}
    )
    assert out == "a: v\nb: ${NAME}\nc: ${OTHER:dflt}"


def test_rate_limit_interval_normalized_for_trigger(spark, tmp_path):
    """rate_limit.interval accepts the pipeline's duration syntax ('1s',
    '500 ms'); it must be normalized before reaching Spark's trigger parser
    (which rejects those forms) — the query must START, not die at
    .trigger()."""
    src = _events(spark, tmp_path)
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - rate_limit: {{interval: 1s}}
output:
  path: {tmp_path}/out
""")
    q = p.run_stream(spark, checkpoint=str(tmp_path / "rl_ck"), available_now=False)
    try:
        assert q.isActive
    finally:
        q.stop()
        q.awaitTermination(30)
