"""AWS SNS + Kinesis Firehose outputs (reference internal/impl/aws/
output_sns.go, output_kinesis_firehose.go): Query/JSON protocol clients
over SigV4, batch chunking, per-record failure retry, YAML wiring —
against signature-verifying mini services."""

from __future__ import annotations

import json

import pytest

from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.firehose import FirehoseClient, MiniFirehoseServer
from bento_spark.streaming.sns import MiniSnsServer, SnsClient


# --------------------------------------------------------------------------
# SNS
# --------------------------------------------------------------------------


@pytest.fixture()
def sns():
    s = MiniSnsServer().start()
    yield s
    s.stop()


def test_sns_publish_and_batch(sns):
    c = SnsClient(sns.endpoint, sns.access_key, sns.secret_key)
    mid = c.publish("arn:aws:sns:us-east-1:0:t", "hello", group_id="g1")
    assert mid.startswith("sns-")
    c.publish_batch("arn:aws:sns:us-east-1:0:t",
                    [(f"m{i}", None, f"d{i}") for i in range(23)])  # 3 chunks
    msgs = sns.messages("arn:aws:sns:us-east-1:0:t")
    assert len(msgs) == 24
    assert msgs[0] == ("hello", "g1", None)
    assert msgs[1] == ("m0", None, "d0")


def test_sns_bad_signature_rejected(sns):
    bad = SnsClient(sns.endpoint, sns.access_key, "wrong")
    with pytest.raises(ConnectionError, match="403"):
        bad.publish("arn:t", "x")


def test_yaml_sns_output_stream(sns, spark, tmp_path):
    src = tmp_path / "words"
    src.mkdir()
    (src / "w.txt").write_text("dog\nemu")
    p = compile_yaml(f"""
input:
  lines:
    path: {src}
pipeline:
  processors:
    - mapping: |
        root.word = this.line
        root.n = this.line.length()
output:
  aws_sns:
    endpoint: {sns.endpoint}
    topic_arn: arn:aws:sns:us-east-1:0:words
    access_key: {sns.access_key}
    secret_key: {sns.secret_key}
    message_group_id: 'grp-${{! this.word }}'
""")
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(90)
    msgs = sorted(sns.messages("arn:aws:sns:us-east-1:0:words"))
    assert [json.loads(m)["word"] for m, _g, _d in msgs] == ["dog", "emu"]
    assert [g for _m, g, _d in msgs] == ["grp-dog", "grp-emu"]


# --------------------------------------------------------------------------
# Firehose
# --------------------------------------------------------------------------


def test_firehose_batch_and_partial_retry():
    srv = MiniFirehoseServer(fail_first=1).start()
    try:
        c = FirehoseClient(srv.endpoint, srv.access_key, srv.secret_key)
        assert c.describe("d")["DeliveryStreamDescription"][
            "DeliveryStreamStatus"] == "ACTIVE"
        recs = [f"r{i}".encode() for i in range(6)]
        c.put_record_batch("d", recs)
        # first call failed odd-index records; the retry re-sent ONLY them
        assert srv.batch_calls == 2
        assert sorted(srv.data("d")) == sorted(recs)
    finally:
        srv.stop()


def test_firehose_bad_signature_rejected():
    srv = MiniFirehoseServer().start()
    try:
        bad = FirehoseClient(srv.endpoint, srv.access_key, "wrong")
        with pytest.raises(ConnectionError, match="403"):
            bad.describe("d")
    finally:
        srv.stop()


def test_yaml_firehose_output_stream(spark, tmp_path):
    srv = MiniFirehoseServer().start()
    try:
        src = tmp_path / "words"
        src.mkdir()
        (src / "w.txt").write_text("ant\nbee\ncat")
        p = compile_yaml(f"""
input:
  lines:
    path: {src}
pipeline:
  processors:
    - mapping: |
        root.word = this.line
output:
  aws_kinesis_firehose:
    endpoint: {srv.endpoint}
    stream: deliveries
    access_key: {srv.access_key}
    secret_key: {srv.secret_key}
""")
        q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt"))
        q.awaitTermination(90)
        # newline-terminated JSON records (the Firehose-to-S3 convention)
        got = sorted(json.loads(r.decode())["word"]
                     for r in srv.data("deliveries"))
        assert got == ["ant", "bee", "cat"]
        assert all(r.endswith(b"\n") for r in srv.data("deliveries"))
    finally:
        srv.stop()
