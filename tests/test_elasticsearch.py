"""`elasticsearch` output — bulk indexing with per-message interpolated
index/action/id (reference internal/impl/elasticsearch/output.go). Driven
end-to-end against the in-process MiniEsServer; both NDJSON bulk lines are
built JVM-side (build_bulk_lines) and the writer's per-item 429 retry and
permanent-rejection paths are exercised with fault injection."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.elasticsearch import (
    MiniEsServer,
    build_bulk_lines,
    es_bulk_writer,
)


@pytest.fixture()
def es():
    srv = MiniEsServer().start()
    yield srv
    srv.stop()


def _meta_df(spark, rows, action="index"):
    """rows: list of (index, id, payload-dict)."""
    data = [(i, a if isinstance(a, str) else action, d, json.dumps(p))
            for (i, d, p) in rows for a in [action]]
    df = spark.createDataFrame(
        [(i, act, d, p) for i, act, d, p in data],
        "_es_index string, _es_action string, _es_id string, payload string",
    )
    return df.withColumn("_es_routing", F.lit("")).withColumn("_es_pipeline", F.lit(""))


# ----------------------------------------------------------- line building


def test_build_bulk_lines_shapes(spark):
    df = _meta_df(spark, [("idx", "1", {"v": 1})])
    r = build_bulk_lines(df).collect()[0]
    head = json.loads(r.action_line)
    assert list(head) == ["index"] and head["index"] == {"_index": "idx", "_id": "1"}
    assert json.loads(r.source_line)["payload"] == '{"v": 1}'


def test_build_bulk_lines_update_upsert_delete(spark):
    for action, want_doc, want_type in (
        ("update", True, "update"),
        ("upsert", True, "update"),
        ("delete", False, "delete"),
    ):
        df = _meta_df(spark, [("idx", "1", {"v": 1})], action=action)
        r = build_bulk_lines(df).collect()[0]
        assert list(json.loads(r.action_line)) == [want_type]
        if not want_doc:
            assert r.source_line is None
        else:
            body = json.loads(r.source_line)
            assert "doc" in body
            assert body.get("doc_as_upsert", False) == (action == "upsert")


def test_blank_id_and_routing_omitted(spark):
    df = _meta_df(spark, [("idx", "", {"v": 1})])
    head = json.loads(build_bulk_lines(df).collect()[0].action_line)
    assert "_id" not in head["index"] and "routing" not in head["index"]


# ------------------------------------------------------- mini-server semantics


def test_mini_es_item_semantics(es):
    def bulk(*lines):
        return es.handle_bulk("\n".join(json.dumps(x) for x in lines).encode())

    r = bulk({"create": {"_index": "i", "_id": "a"}}, {"v": 1})
    assert r["items"][0]["create"]["status"] == 201
    r = bulk({"create": {"_index": "i", "_id": "a"}}, {"v": 2})
    assert r["items"][0]["create"]["status"] == 409 and r["errors"]
    r = bulk({"update": {"_index": "i", "_id": "missing"}}, {"doc": {"v": 3}})
    assert r["items"][0]["update"]["status"] == 404
    r = bulk({"update": {"_index": "i", "_id": "a"}}, {"doc": {"w": 9}})
    assert r["items"][0]["update"]["status"] == 200
    assert es.get_doc("i", "a") == {"v": 1, "w": 9}
    r = bulk({"delete": {"_index": "i", "_id": "a"}})
    assert r["items"][0]["delete"]["status"] == 200
    assert es.get_doc("i", "a") is None


# -------------------------------------------------------------- writer paths


def test_writer_indexes_batch(spark, es):
    df = _meta_df(spark, [("logs", "a", {"n": 1}), ("logs", "b", {"n": 2})])
    es_bulk_writer(es.url)(df, 0)
    assert json.loads(es.get_doc("logs", "a")["payload"]) == {"n": 1}
    assert json.loads(es.get_doc("logs", "b")["payload"]) == {"n": 2}


def test_writer_retries_transient_items(spark, es):
    es.fail_next(1, status=429)
    df = _meta_df(spark, [("logs", "a", {"n": 1})]).repartition(1)
    es_bulk_writer(es.url, backoff_s=0.01)(df, 0)
    assert es.get_doc("logs", "a") is not None
    assert es.bulk_requests == 2  # original POST + one item-retry POST


def test_writer_raises_on_permanent_rejection(spark, es):
    es.fail_next(1, status=400)
    df = _meta_df(spark, [("logs", "a", {"n": 1})]).repartition(1)
    with pytest.raises(Exception, match="permanently rejected"):
        es_bulk_writer(es.url, backoff_s=0.01)(df, 0)


def test_writer_replay_overwrites_same_ids(spark, es):
    """index action + deterministic ids = idempotent replay (the at-least-
    once contract the module docstring sells)."""
    df = _meta_df(spark, [("logs", "a", {"n": 1})])
    w = es_bulk_writer(es.url)
    w(df, 0)
    w(df, 0)  # replayed micro-batch
    assert len(es.indices["logs"]) == 1


# ----------------------------------------------------------------- YAML e2e


def test_yaml_elasticsearch_output_end_to_end(spark, es, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("alpha\nbeta\ngamma")
    p = compile_yaml(f"""
input:
  lines:
    path: {src}
pipeline:
  processors:
    - mapping: |
        root.word = this.line.uppercase()
        root.k = this.line
output:
  elasticsearch:
    urls: [{es.url}]
    index: "words-${{! this.line.length() }}"
    id: "${{! this.k }}"
""")
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt"))
    assert q.awaitTermination(300), "availableNow query did not finish in 300s"
    # interpolated index routed by word length: alpha/gamma → words-5, beta → words-4
    assert set(es.indices["words-5"]) == {"alpha", "gamma"}
    assert set(es.indices["words-4"]) == {"beta"}
    assert es.get_doc("words-4", "beta")["word"] == "BETA"


def test_yaml_bad_action_rejected_at_compile(spark, tmp_path, es):
    src = tmp_path / "src2"
    src.mkdir()
    (src / "a.txt").write_text("x")
    p = compile_yaml(f"""
input:
  lines:
    path: {src}
output:
  elasticsearch:
    urls: [{es.url}]
    index: words
    action: obliterate
""")
    with pytest.raises(ValueError, match="not allowed"):
        p.run_stream(spark, checkpoint=str(tmp_path / "ckpt2"))


def test_yaml_elasticsearch_v2_alias(spark, es, tmp_path):
    """elasticsearch_v2 (elasticsearch/output_v2.go) registers the same
    _bulk shape — the section aliases onto the shared writer, accepting
    v2's `auth:` object spelling."""
    src = tmp_path / "src_v2"
    src.mkdir()
    (src / "a.txt").write_text("one\ntwo")
    p = compile_yaml(f"""
input:
  lines:
    path: {src}
pipeline:
  processors:
    - mapping: |
        root.word = this.line
        root.k = this.line
output:
  elasticsearch_v2:
    urls: [{es.url}]
    index: v2words
    id: "${{! this.k }}"
    auth: {{enabled: false}}
""")
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt_v2"))
    assert q.awaitTermination(300)
    assert set(es.indices["v2words"]) == {"one", "two"}
