"""Codec wave 2: xml xpath extraction, parquet blob encode/decode,
availability-gated avro/protobuf/kafka (the jars are optional --packages
and absent in this sandbox — the gates must raise errors naming them)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bento_spark.operators.codec import (
    avro_available,
    avro_decode,
    parquet_decode,
    parquet_encode,
    protobuf_available,
    protobuf_decode,
    xml_extract,
)
from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.kafka import kafka_available, kafka_sink, read_kafka_stream


def test_xml_extract_typed_fields(spark):
    df = spark.createDataFrame(
        [('<e><n>7</n><s>hi there</s><ok>true</ok><f>2.5</f></e>',)], ["xml"]
    )
    out = xml_extract(
        df,
        "xml",
        {
            "n": ("/e/n", "long"),
            "s": ("/e/s", "string"),
            "ok": ("/e/ok", "boolean"),
            "f": ("/e/f", "double"),
        },
    ).collect()[0]
    assert (out.n, out.s, out.ok, out.f) == (7, "hi there", True, 2.5)
    with pytest.raises(ValueError, match="unsupported xml_extract type"):
        xml_extract(df, "xml", {"n": ("/e/n", "decimal")})


def test_xml_input_via_yaml(spark, tmp_path):
    src = tmp_path / "xmlsrc"
    src.mkdir()
    (src / "a.xml").write_text(
        "<rows><row><id>1</id><name>a</name></row>"
        "<row><id>2</id><name>b</name></row></rows>"
    )
    p = compile_yaml(
        f"""
input:
  xml: {{path: {src}, row_tag: row}}
pipeline:
  processors:
    - mapping: |
        root.id2 = this.id * 10
"""
    )
    rows = {r.id: r.id2 for r in p.build_batch(spark).collect()}
    assert rows == {1: 10, 2: 20}


def test_parquet_blob_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 3, "z")], ["grp", "i", "s"]
    )
    blobs = parquet_encode(df, ["grp"], out_col="blob")
    got = {r.grp: r.n_rows for r in blobs.collect()}
    assert got == {"a": 2, "b": 1}
    back = parquet_decode(blobs, "blob", "i bigint, s string", keep_cols=["grp"])
    rows = sorted((r.grp, r.i, r.s) for r in back.collect())
    assert rows == [("a", 1, "x"), ("a", 2, "y"), ("b", 3, "z")]
    # determinism: same input -> byte-identical blobs
    b1 = {r.grp: bytes(r.blob) for r in blobs.collect()}
    b2 = {r.grp: bytes(r.blob) for r in parquet_encode(df, ["grp"], out_col="blob").collect()}
    assert b1 == b2


def test_avro_protobuf_kafka_gated(spark):
    """The sandbox has none of the optional jars: every gated entrypoint
    must raise a RuntimeError naming the --packages coordinate, never fail
    deep inside Spark analysis."""
    df = spark.createDataFrame([(b"x",)], ["value"])
    assert not avro_available(spark)
    with pytest.raises(RuntimeError, match="spark-avro"):
        avro_decode(df, "value", '{"type":"record","name":"r","fields":[]}')
    assert not protobuf_available(spark)
    with pytest.raises(RuntimeError, match="spark-protobuf"):
        protobuf_decode(df, "value", "M", "/tmp/none.desc")
    assert not kafka_available(spark)
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_kafka_stream(spark, ["localhost:9092"], ["t"])
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_sink(spark, ["localhost:9092"], "t")


def test_kafka_yaml_config_gated(spark):
    p = compile_yaml(
        """
input:
  kafka:
    addresses: [localhost:9092]
    topics: [clips]
    checkpoint_limit: 1024
    value_schema: "clip_id string, dur_ms int"
"""
    )
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        p.build_stream(spark)
    # batch mode is a config error, reported before the availability gate
    with pytest.raises(ValueError, match="streaming-only"):
        p.build_batch(spark)
