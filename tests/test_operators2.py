"""Tests for wave-2 operators: codecs, grok/parse_log, json query/schema,
branch/workflow, cache, as-of join, Bloblang match/lambdas."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from bento_spark.functions.bloblang import compile_expr
from bento_spark.operators import codec
from bento_spark.operators.branch import Branch, apply_branch, apply_branch_inline, workflow
from bento_spark.operators.cache import KeyValueCache, cached
from bento_spark.operators.enrich import asof_join


# ---------------------------------------------------------------- codecs
def test_compress_roundtrip(spark):
    df = spark.createDataFrame(
        [(i, f"payload-{i}".encode() * 20) for i in range(50)], ["id", "body"]
    )
    out = (
        df.withColumn("gz", codec.compress_col("body", "gzip"))
        .withColumn("back", codec.decompress_col("gz", "gzip"))
        .withColumn("ok", F.col("back") == F.col("body"))
        .withColumn("smaller", F.length("gz") < F.length("body"))
    )
    rows = out.collect()
    assert all(r.ok and r.smaller for r in rows)
    # deterministic compression (mtime=0): required for exactly-once identity
    gz0 = out.filter(F.col("id") == 7).collect()[0].gz
    assert bytes(gz0) == gzip.compress(b"payload-7" * 20, mtime=0)


def test_decompress_bad_payload_yields_null(spark):
    df = spark.createDataFrame([(1, b"not gzip")], ["id", "body"])
    row = df.withColumn("out", codec.decompress_col("body", "gzip")).collect()[0]
    assert row.out is None


def test_zlib_bz2_lzma(spark):
    df = spark.createDataFrame([(1, b"hello world" * 10)], ["id", "body"])
    for alg in ("zlib", "bz2", "lzma"):
        row = (
            df.withColumn("c", codec.compress_col("body", alg))
            .withColumn("d", codec.decompress_col("c", alg))
            .collect()[0]
        )
        assert bytes(row.d) == b"hello world" * 10


# ---------------------------------------------------------------- grok
def test_parse_log_clf(spark):
    lines = [
        '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326',
        '10.2.3.4 - - [11/Oct/2000:14:00:01 -0700] "POST /submit HTTP/1.1" 404 512',
        "this line does not match at all",
    ]
    df = spark.createDataFrame([(l,) for l in lines], ["line"])
    out = codec.parse_log(df, "line").collect()
    ok = [r for r in out if r.error is None]
    bad = [r for r in out if r.error is not None]
    assert len(ok) == 2 and len(bad) == 1
    first = next(r for r in ok if r.remote_ip == "127.0.0.1")
    assert (first.verb, first.request, first.status, first.size) == ("GET", "/apache_pb.gif", 200, 2326)


def test_grok_custom_pattern(spark):
    df = spark.createDataFrame([("level=INFO msg=started",)], ["line"])
    out = codec.grok(df, "line", "level=%{LOGLEVEL:lvl} msg=%{WORD:msg}").collect()[0]
    assert out.lvl == "INFO" and out.msg == "started"


# ---------------------------------------------------------------- json
def test_json_query_and_schema(spark):
    df = spark.createDataFrame(
        [
            (1, '{"user": {"name": "ada", "age": 36}, "ok": true}'),
            (2, '{"user": {"name": "bob"}, "ok": false}'),
        ],
        ["id", "body"],
    )
    out = codec.json_map(df, "body", {"name": ("user.name", "string"), "age": ("user.age", "int")})
    rows = {r.id: r for r in out.collect()}
    assert rows[1].name == "ada" and rows[1].age == 36
    assert rows[2].age is None

    checked = codec.json_schema_check(df, "body", [("user.name", "string"), ("user.age", "integer")])
    errs = {r.id: r.error for r in checked.collect()}
    assert errs[1] is None
    assert errs[2] is not None and "user.age" in errs[2]


# ---------------------------------------------------------------- branch/workflow
def test_branch_inline_and_join_paths_agree(spark):
    df = spark.createDataFrame([(i, i * 1.0) for i in range(20)], ["id", "v"])
    br = Branch(
        name="double",
        request_map={"req": F.col("v") * 2},
        processors=lambda d: d,
        result_map={"doubled": F.col("req")},
        skip_when=F.col("v") > 15,
    )
    inline = apply_branch_inline(df, br)
    joined = apply_branch(df, br)
    a = {r.id: r.doubled for r in inline.collect()}
    b = {r.id: r.doubled for r in joined.select("id", "doubled").collect()}
    assert a == b
    assert a[3] == 6.0 and a[16] is None  # skipped rows keep NULL


def test_workflow_dag_order_and_cycle(spark):
    df = spark.createDataFrame([(2,)], ["x"])
    bs = [
        Branch("c", None, lambda d: d, {"z": F.col("y") + 1}, depends_on=["b"]),
        Branch("a", None, lambda d: d, {"w": F.col("x") * 10}),
        Branch("b", None, lambda d: d, {"y": F.col("w") + F.col("x")}, depends_on=["a"]),
    ]
    row = workflow(df, bs).collect()[0]
    assert (row.w, row.y, row.z) == (20, 22, 23)

    import graphlib

    cyc = [
        Branch("a", None, lambda d: d, {"p": F.lit(1)}, depends_on=["b"]),
        Branch("b", None, lambda d: d, {"q": F.lit(2)}, depends_on=["a"]),
    ]
    with pytest.raises(graphlib.CycleError):
        workflow(df, cyc)


# ---------------------------------------------------------------- cache
def test_cache_set_get_add_delete(spark, tmp_path):
    c = KeyValueCache(spark, str(tmp_path / "kv"), key_col="k")
    c.set(spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"]))
    got = {r.k: r.v for r in c.snapshot().collect()}
    assert got == {"a": 1, "b": 2}

    rejected = c.add(spark.createDataFrame([("b", 99), ("c", 3)], ["k", "v"]))
    assert [r.k for r in rejected.collect()] == ["b"]  # b already present
    got = {r.k: r.v for r in c.snapshot().collect()}
    assert got == {"a": 1, "b": 2, "c": 3}

    c.set(spark.createDataFrame([("a", 10)], ["k", "v"]))  # upsert
    assert {r.k: r.v for r in c.snapshot().collect()}["a"] == 10

    c.delete(spark.createDataFrame([("b",)], ["k"]))
    assert sorted(r.k for r in c.snapshot().collect()) == ["a", "c"]

    df = spark.createDataFrame([("a",), ("zz",)], ["k"])
    enriched = {r.k: r.v for r in c.get(df).collect()}
    assert enriched["a"] == 10 and enriched["zz"] is None

    c.compact()
    assert sorted(r.k for r in c.snapshot().collect()) == ["a", "c"]


def test_cache_get_on_empty_cache_raises(spark, tmp_path):
    """get() before any set/add must fail loudly — the enriched schema
    depends on the cached value columns, so a state-dependent fallback
    schema would break downstream plans unpredictably."""
    import pytest

    c = KeyValueCache(spark, str(tmp_path / "empty_kv"), key_col="k")
    with pytest.raises(RuntimeError, match="no contents"):
        c.get(spark.createDataFrame([("a",)], ["k"]))


def test_cached_memoization(spark, tmp_path):
    c = KeyValueCache(spark, str(tmp_path / "memo"), key_col="key")
    calls = []

    def compute(d):
        calls.append(1)
        return d.withColumn("out", F.col("n") * 100)

    fn = cached(c, ["n"], compute)
    df = spark.createDataFrame([(1,), (2,)], ["n"])
    first = {r.n: r.out for r in fn(df).collect()}
    assert first == {1: 100, 2: 200}
    # second run: all keys cached — compute still invoked (lazy plan) but on
    # an empty miss-set; results must be identical and come from the cache
    second = {r.n: r.out for r in fn(spark.createDataFrame([(1,), (2,), (3,)], ["n"])).collect()}
    assert second == {1: 100, 2: 200, 3: 300}


def test_cache_ttl_expiry_on_read_and_compact_sweep(spark, tmp_path):
    """TTL semantics (processor_cache.go:125-150): expired entries are
    absent on read, an expired newest write hides older values, add treats
    expired keys as absent, and compact sweeps expired rows while
    preserving surviving TTLs."""
    T0 = 1_000_000  # pinned clock (ms) — no wall time in the data path
    c = KeyValueCache(spark, str(tmp_path / "ttl_kv"), key_col="k")
    c.set(spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"]), ttl=60, now_ms=T0)
    c.set(spark.createDataFrame([("p", 9)], ["k", "v"]))  # no ttl: immortal

    # inside the ttl window: all present
    assert {r.k: r.v for r in c.snapshot(now_ms=T0 + 59_000).collect()} == {"a": 1, "b": 2, "p": 9}
    # past it: ttl'd entries expired on read
    assert {r.k: r.v for r in c.snapshot(now_ms=T0 + 61_000).collect()} == {"p": 9}

    # an expired NEWEST write hides the older unexpired value (set replaces
    # value AND ttl; expiry = absent, not resurrect-predecessor)
    c.set(spark.createDataFrame([("p", 10)], ["k", "v"]), ttl="30s", now_ms=T0)
    assert {r.k: r.v for r in c.snapshot(now_ms=T0 + 10_000).collect()}["p"] == 10
    assert "p" not in {r.k for r in c.snapshot(now_ms=T0 + 31_000).collect()}

    # add: an expired key counts as absent (no rejection)
    rejected = c.add(spark.createDataFrame([("a", 100)], ["k", "v"]), now_ms=T0 + 61_000)
    assert rejected.count() == 0
    assert {r.k: r.v for r in c.snapshot(now_ms=T0 + 61_000).collect()} == {"a": 100}
    # ...but an unexpired key still rejects
    rejected = c.add(spark.createDataFrame([("b", 200)], ["k", "v"]), now_ms=T0 + 30_000)
    assert [r.k for r in rejected.collect()] == ["b"]

    # compact sweeps expired rows and PRESERVES surviving expiries
    c2 = KeyValueCache(spark, str(tmp_path / "ttl_kv2"), key_col="k")
    c2.set(spark.createDataFrame([("x", 1)], ["k", "v"]), ttl=60, now_ms=T0)
    c2.set(spark.createDataFrame([("y", 2)], ["k", "v"]), ttl=10, now_ms=T0)
    c2.compact(now_ms=T0 + 11_000)  # y expired at compact time
    assert len(c2._versions()) == 1
    assert {r.k for r in c2.snapshot(now_ms=T0 + 12_000).collect()} == {"x"}
    # x's original expiry survives the rewrite: gone after T0+60s
    assert {r.k for r in c2.snapshot(now_ms=T0 + 61_000).collect()} == set()


def test_cached_ttl_recomputes_expired(spark, tmp_path):
    """cached() with ttl: an expired memo key recomputes (and re-caches)."""
    T0 = 5_000_000
    c = KeyValueCache(spark, str(tmp_path / "memo_ttl"), key_col="key")

    def compute_v1(d):
        return d.withColumn("out", F.col("n") * 100)

    def compute_v2(d):
        return d.withColumn("out", F.col("n") * 1000)

    df = spark.createDataFrame([(1,), (2,)], ["n"])
    first = {r.n: r.out for r in cached(c, ["n"], compute_v1, ttl=60, now_ms=T0)(df).collect()}
    assert first == {1: 100, 2: 200}
    # inside ttl: memoized v1 results served even though compute changed
    warm = {r.n: r.out for r in cached(c, ["n"], compute_v2, ttl=60, now_ms=T0 + 30_000)(df).collect()}
    assert warm == {1: 100, 2: 200}
    # past ttl: recomputed with v2
    cold = {r.n: r.out for r in cached(c, ["n"], compute_v2, ttl=60, now_ms=T0 + 61_000)(df).collect()}
    assert cold == {1: 1000, 2: 2000}


# ---------------------------------------------------------------- as-of join
def test_asof_join_backward_forward(spark):
    quotes = spark.createDataFrame(
        [("k1", 10, 1.0), ("k1", 20, 2.0), ("k1", 30, 3.0), ("k2", 15, 9.0)],
        ["key", "q_ts", "px"],
    )
    trades = spark.createDataFrame(
        [("k1", 5), ("k1", 20), ("k1", 25), ("k2", 100)], ["key", "t_ts"]
    )
    back = asof_join(trades, quotes, key="key", left_ts="t_ts", right_ts="q_ts")
    got = {(r.key, r.t_ts): r.px for r in back.collect()}
    assert got == {("k1", 5): None, ("k1", 20): 2.0, ("k1", 25): 2.0, ("k2", 100): 9.0}

    fwd = asof_join(trades, quotes, key="key", left_ts="t_ts", right_ts="q_ts", direction="forward")
    got_f = {(r.key, r.t_ts): r.px for r in fwd.collect()}
    assert got_f == {("k1", 5): 1.0, ("k1", 20): 2.0, ("k1", 25): 3.0, ("k2", 100): None}

    # the left timestamp must be referencable by name downstream (exactly
    # one column named t_ts — a duplicate would raise AMBIGUOUS_REFERENCE)
    assert back.columns.count("t_ts") == 1
    assert back.filter(F.col("t_ts") >= 20).groupBy("t_ts").count().count() == 3


# ---------------------------------------------------------------- bloblang wave 2
def test_bloblang_match_and_lambdas(spark):
    df = spark.createDataFrame([(3, "abc", [1, 2, 3])], ["n", "s", "arr"])
    got = df.select(
        compile_expr('match this.n { 1 => "one", 3 => "three", _ => "other" }').alias("m"),
        compile_expr("this.arr.filter(x -> x >= 2).length()").alias("f"),
        compile_expr("this.arr.map_each(x -> x * x).sum()").alias("sq"),
        compile_expr('this.arr.fold(100, (acc, x) -> acc + x)').alias("fold"),
        compile_expr('"%s/%d".format(this.s, this.n)').alias("fmt"),
        compile_expr('this.s.pad_left(5, "_")').alias("pad"),
        compile_expr('this.arr.any(x -> x == 2)').alias("has2"),
        compile_expr('this.arr.all(x -> x > 0)').alias("allpos"),
    ).collect()[0]
    assert got.m == "three"
    assert got.f == 2
    assert got.sq == 14.0
    assert got.fold == 106
    assert got.fmt == "abc/3"
    assert got.pad == "__abc"
    assert got.has2 is True and got.allpos is True


def test_ivf_topk_matches_brute_force_mostly(spark, tables):
    """IVF with enough probes should recover most exact neighbors."""
    from bento_spark.operators.similarity import brute_force_topk, ivf_topk, kmeans_centroids

    emb = tables["embeddings"]
    cents = kmeans_centroids(emb, n_clusters=4, n_iter=2)
    assert cents.shape[0] >= 2
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(emb, queries, k=3)
    approx = ivf_topk(emb, queries, cents, k=3, n_probe=4)  # probe all clusters = exact
    e = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
    a = {(r.query_id, r.rank): r.neighbor_id for r in approx.collect()}
    overlap = sum(1 for k_ in e if a.get(k_) == e[k_])
    assert overlap >= int(0.8 * len(e))  # all-probe IVF ≈ exact
    # determinism: same centroids on a second run
    cents2 = kmeans_centroids(emb, n_clusters=4, n_iter=2)
    import numpy as np

    assert np.allclose(cents, cents2)


def test_spread_by_cost_balances_partitions(spark):
    """Skew salting (north rule): long clips scatter instead of pinning one
    partition."""
    from bento_spark.audio.generate import clips_df
    from bento_spark.operators.skew import spread_by_cost

    clips = clips_df(spark, 256, partitions=2)
    spread = spread_by_cost(clips, cost_col="dur_ms", num_partitions=8)
    sizes = spread.groupBy(F.spark_partition_id().alias("p")).agg(
        F.sum("dur_ms").alias("cost")
    ).collect()
    costs = sorted(r.cost for r in sizes)
    assert len(costs) == 8
    # no partition carries more than ~3x the mean cost after salting
    mean = sum(costs) / len(costs)
    assert costs[-1] <= 3 * mean


def test_salted_agg_matches_plain_agg(spark, tables):
    from bento_spark.operators.skew import salted_agg

    ev = tables["events"]
    plain = {
        (r.event_type,): (r.n, round(r.total, 4))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    salted = {
        (r.event_type,): (r.n, round(r.total, 4))
        for r in salted_agg(ev, ["event_type"], {"n": ("count", "value"), "total": ("sum", "value")}).collect()
    }
    assert plain == salted


def test_connected_components_basic(spark):
    from bento_spark.operators.dedupe_fuzzy import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (10, 11), (11, 12), (12, 1)], ["id_a", "id_b"]
    )
    cc = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    # {1,2,3,10,11,12} form one component (bridged via 12-1), {7,8} another
    assert cc[1] == cc[2] == cc[3] == cc[10] == cc[11] == cc[12] == 1
    assert cc[7] == cc[8] == 7


def test_connected_components_star_matches_label(spark):
    """large/small-star must produce the same partition as min-label
    propagation on random graphs (including isolated pairs and merges)."""
    import random

    from bento_spark.operators.dedupe_fuzzy import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(160)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    label = {r.node: r.cluster_id for r in connected_components(pairs, max_iters=60).collect()}
    star = {r.node: r.cluster_id for r in connected_components_star(pairs).collect()}
    assert set(label) == set(star)
    assert label == star  # both label with the component minimum


def test_connected_components_star_long_chain(spark):
    """A 400-node path has diameter 399: min-label propagation cannot close
    it within a 25-round cap, large/small-star converges in O(log^2 n)."""
    from bento_spark.operators.dedupe_fuzzy import connected_components_star

    chain = [(i, i + 1) for i in range(399)]
    pairs = spark.createDataFrame(chain, ["id_a", "id_b"])
    star = connected_components_star(pairs).collect()
    assert len(star) == 400
    assert {r.cluster_id for r in star} == {0}


def test_dedupe_clusters_star_equals_label(spark, sf_dir):
    from bento_spark.operators.dedupe_fuzzy import dedupe_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = lambda rows: sorted(
        (r.cluster_id, r.n_members, r.member_min, r.member_max) for r in rows
    )
    label = key(dedupe_clusters(docs, threshold=0.6, algo="label").collect())
    star = key(dedupe_clusters(docs, threshold=0.6, algo="star").collect())
    assert label == star and len(label) > 0


def test_simhash_band_straddle_rejected(spark):
    """band widths that straddle 64-bit signature words are rejected up
    front (a 48-bit band would silently truncate to 16 effective bits and
    re-enter the quadratic-collision regime)."""
    import pytest

    from bento_spark.operators.dedupe_fuzzy import simhash_near_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="divide 64"):
        simhash_near_pairs(df, bits=192, n_bands=4)


def test_per_group_null_label_goes_to_default(spark):
    from bento_spark.operators.grouping import GROUP_COL, group_by_value, per_group

    df = group_by_value(
        spark.createDataFrame([(1, "us"), (2, None), (3, "de")], "id int, country string"),
        "country",
    )
    out = per_group(df, {"us": lambda d: d.withColumn("id", F.col("id") * 100)})
    got = {r.id for r in out.collect()}
    # NULL-label row must survive into the default slice, not vanish
    assert got == {100, 2, 3}


def test_unarchive_null_and_malformed_payloads_survive(spark):
    from bento_spark.operators import batching

    df = spark.createDataFrame(
        [(1, "a,b"), (2, None)], "id int, payload string"
    )
    out = batching.unarchive(df, "payload", fmt="csv_row").collect()
    ids = sorted(r.id for r in out)
    assert ids == [1, 1, 2]  # NULL payload keeps its row (NULL part)
    bad = spark.createDataFrame(
        [(1, '["x","y"]'), (2, "not json")], "id int, payload string"
    )
    out2 = batching.unarchive(bad, "payload", fmt="json_array").collect()
    errs = {r.id: r.error for r in out2}
    assert errs[1] is None and "not a JSON array" in errs[2]
    assert sorted(r.id for r in out2) == [1, 1, 2]


def test_insert_part_positions_and_validation(spark):
    from bento_spark.operators import batching

    df = spark.createDataFrame(
        [("b1", 10, "x"), ("b1", 20, "y")], "k string, ord int, v string"
    )
    pre = batching.insert_part(df, "k", "ord", 0, {"v": F.lit("first")})
    rows = batching.with_batch_index(pre, "k", "ord").orderBy("_batch_index").collect()
    assert [r.v for r in rows] == ["first", "x", "y"]  # strictly before the min
    app = batching.insert_part(df, "k", "ord", -1, {"v": F.lit("last")})
    rows2 = batching.with_batch_index(app, "k", "ord").orderBy("_batch_index").collect()
    assert [r.v for r in rows2] == ["x", "y", "last"]
    import pytest

    with pytest.raises(ValueError, match="index 0 .* or -1"):
        batching.insert_part(df, "k", "ord", 2, {"v": F.lit("mid")})


def test_select_parts_empty_indexes(spark):
    from bento_spark.operators import batching

    df = spark.createDataFrame([("b", 1, "x")], "k string, ord int, v string")
    assert batching.select_parts(df, "k", "ord", []).count() == 0


def test_split_honors_chunk_size(spark):
    from bento_spark.operators import batching

    df = spark.range(1000)
    assert batching.split(df, rows_per_partition_hint=100).rdd.getNumPartitions() == 10
    assert batching.split(df, rows_per_partition_hint=10**9).rdd.getNumPartitions() == 1


def test_asof_join_shared_column_names(spark):
    left = spark.createDataFrame(
        [("k", 100, "lv")], "key string, ts bigint, value string"
    )
    right = spark.createDataFrame(
        [("k", 90, "rv")], "key string, p_ts bigint, value string"
    )
    out = asof_join(left, right, key="key", left_ts="ts", right_ts="p_ts")
    assert out.columns.count("value") == 1  # left keeps the bare name
    row = out.collect()[0]
    assert row.value == "lv" and row.value_right == "rv" and row.p_ts == 90


def test_cached_null_and_delimiter_keys_do_not_collide(spark, tmp_path):
    c = KeyValueCache(spark, str(tmp_path / "collide"), key_col="key")

    def compute(d):
        return d.withColumn("out", F.concat_ws("+", F.coalesce("a", F.lit("NA")), F.coalesce("b", F.lit("NA"))))

    fn = cached(c, ["a", "b"], compute)
    df = spark.createDataFrame(
        [(None, "x"), ("x", None), ("a|b", "c"), ("a", "b|c")], "a string, b string"
    )
    out = sorted(r.out for r in fn(df).collect())
    # all four distinct key tuples computed independently (no collisions)
    assert out == sorted(["NA+x", "x+NA", "a|b+c", "a+b|c"])
    # replay from cache returns identical results per tuple
    out2 = sorted(r.out for r in fn(df).collect())
    assert out2 == out


def test_branch_result_map_overwrites_existing_column(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id int, price double")
    br = Branch(
        name="adjust",
        request_map=None,
        processors=lambda d: d,
        result_map={"price": F.col("price") * 2},
        skip_when=F.col("id") == 2,
    )
    inline = {r.id: r.price for r in apply_branch_inline(df, br).collect()}
    joined_df = apply_branch(df, br)
    assert joined_df.columns.count("price") == 1  # no ambiguous duplicate
    assert "_row_id" not in joined_df.columns
    joined = {r.id: r.price for r in joined_df.collect()}
    # skipped row keeps its ORIGINAL value (reference: untouched message)
    assert inline == joined == {1: 20.0, 2: 20.0}


def test_spread_by_cost_uniform_costs_still_spread(spark):
    from bento_spark.operators.skew import spread_by_cost

    df = spark.range(1000).withColumn("dur_ms", F.lit(1000))
    parts = (
        spread_by_cost(df, "dur_ms", num_partitions=8)
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    # uniform cost must NOT collapse into one partition
    assert len(parts) >= 6 and max(r["count"] for r in parts) < 400


def test_tar_encode_null_payload_empty_member(spark):
    import io
    import tarfile

    from bento_spark.operators.scanners import tar_encode

    df = spark.createDataFrame(
        [("g", "a.txt", bytearray(b"data")), ("g", "b.txt", None)],
        "grp string, name string, payload binary",
    )
    blob = tar_encode(df, ["grp"], "name", "payload").collect()[0].tar_blob
    with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
        members = {m.name: tf.extractfile(m).read() for m in tf.getmembers()}
    assert members == {"a.txt": b"data", "b.txt": b""}


def test_gram_rows_matches_window_lead_formulation(spark):
    """The shuffle-free arrays_zip/slice shingle formulation must emit the
    exact multiset of (id, gram) rows the window-lead formulation did —
    including the short-doc whole-text shingle, empty text, extra
    whitespace, and n-1/n/n+1 token boundaries."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from bento_spark.operators.dedupe_fuzzy import _gram_rows
    from bento_spark.operators.text import normalize_text

    rows = [
        (0, ""),
        (1, "one"),
        (2, "two tokens"),
        (3, "three word gram"),
        (4, "four words in line"),
        (5, "  padded   with \t odd   whitespace  "),
        (6, "repeat repeat repeat repeat"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def gram_rows_window(d, n=3):
        toks = F.split(normalize_text("text"), " ")
        tok = d.select(F.col("doc_id").alias("id"), F.posexplode(toks).alias("pos", "t"))
        w = Window.partitionBy("id").orderBy("pos")
        leads = [F.lead("t", k).over(w) for k in range(1, n)]
        gram = F.concat_ws(" ", F.col("t"), *leads)
        full = tok.select("id", "pos", gram.alias("g"), leads[-1].alias("_last"))
        keep = F.col("_last").isNotNull() | (F.col("pos") == 0)
        return full.filter(keep).select("id", "g")

    for n in (2, 3, 4):
        new = _gram_rows(df, "doc_id", "text", n)
        old = gram_rows_window(df, n)
        assert new.exceptAll(old).count() == 0
        assert old.exceptAll(new).count() == 0
