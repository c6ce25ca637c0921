"""AWS processors: `aws_lambda` (Invoke API), `aws_dynamodb_partiql`
(BatchExecuteStatement), `aws_s3` (GetObject per message) — all against
signature-verifying in-process servers (reference
internal/impl/aws/processor_lambda.go, processor_dynamodb_partiql.go,
processor_s3.go)."""

from __future__ import annotations

import json

import pytest

from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.dynamodb import (
    MiniDynamoServer,
    attr_to_obj,
    attr_value,
    dynamodb_partiql,
)
from bento_spark.streaming.lambda_proc import LambdaClient, MiniLambdaServer, lambda_map
from bento_spark.streaming.s3 import MiniS3Server, S3Client, s3_get_map


@pytest.fixture()
def lam():
    s = MiniLambdaServer().start()
    s.functions["upper"] = lambda b: b.upper()
    s.functions["boom"] = lambda b: (_ for _ in ()).throw(RuntimeError("nope"))
    yield s
    s.stop()


@pytest.fixture()
def dyn():
    s = MiniDynamoServer().start()
    yield s
    s.stop()


@pytest.fixture()
def s3srv():
    s = MiniS3Server().start()
    yield s
    s.stop()


# ------------------------------------------------------------- aws_lambda


def test_lambda_result_replaces_payload(spark, lam):
    df = spark.createDataFrame([("hello",), ("world",)], "value string")
    rows = lambda_map(df, lam.endpoint, lam.access_key, lam.secret_key,
                      "upper").collect()
    assert sorted(r.value for r in rows) == ["HELLO", "WORLD"]
    assert all(r.error is None and r.lambda_function_error is None for r in rows)


def test_lambda_function_error_flags_metadata_not_error(spark, lam):
    df = spark.createDataFrame([("x",)], "value string")
    row = lambda_map(df, lam.endpoint, lam.access_key, lam.secret_key,
                     "boom").collect()[0]
    # reference :29: content becomes the failure JSON, metadata field set,
    # but the message is NOT flagged errored
    assert row.error is None
    assert row.lambda_function_error == "Unhandled"
    doc = json.loads(row.value)
    assert doc["errorMessage"] == "nope" and doc["errorType"] == "RuntimeError"


def test_lambda_transport_retry_then_success(lam):
    lam.fail_next = 2
    c = LambdaClient(lam.endpoint, lam.access_key, lam.secret_key)
    data, func_err = c.invoke("upper", b"ok", retries=3, backoff_s=0.01)
    assert data == b"OK" and func_err is None


def test_lambda_unknown_function_follows_error_protocol(spark, lam):
    df = spark.createDataFrame([("keepme",)], "value string")
    row = lambda_map(df, lam.endpoint, lam.access_key, lam.secret_key,
                     "missing", retries=0).collect()[0]
    assert row.value == "keepme"  # unchanged (:27)
    assert row.error and "aws_lambda" in row.error


def test_lambda_bad_signature_rejected(lam):
    bad = LambdaClient(lam.endpoint, lam.access_key, "wrongsecret")
    with pytest.raises(ConnectionError, match="403"):
        bad.invoke("upper", b"x", retries=0)


def test_yaml_lambda_processor(spark, lam, tmp_path):
    src = tmp_path / "in"
    spark.createDataFrame([("abc",)], "value string").write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - aws_lambda:
        function: upper
        endpoint: {lam.endpoint}
        access_key: {lam.access_key}
        secret_key: {lam.secret_key}
""")
    rows = p.build_batch(spark).collect()
    assert rows[0].value == "ABC"


# --------------------------------------------------- aws_dynamodb_partiql


def _seed(dyn, table="users", n=3):
    for i in range(n):
        dyn._tables.setdefault(table, {})[f"u{i}"] = {
            "uid": {"S": f"u{i}"},
            "score": {"N": str(10 * i)},
            "tags": {"L": [{"S": "a"}, {"N": "1"}]},
        }


def test_partiql_point_select_enriches(spark, dyn):
    _seed(dyn)
    df = spark.createDataFrame([("u0",), ("u2",), ("u9",)], "uid string")
    from pyspark.sql import functions as F

    d = df.withColumn("_args", F.array(F.col("uid")))
    rows = dynamodb_partiql(
        d, dyn.endpoint, dyn.access_key, dyn.secret_key,
        'SELECT * FROM "users" WHERE uid = ?', args_col="_args",
    ).collect()
    got = {r.uid: r.partiql for r in rows}
    assert json.loads(got["u0"]) == {"uid": "u0", "score": 0, "tags": ["a", 1]}
    assert json.loads(got["u2"])["score"] == 20
    assert got["u9"] is None  # miss -> NULL, not an error
    assert all(r.error is None for r in rows)


def test_partiql_statement_error_flags_row(spark, dyn):
    df = spark.createDataFrame([("u0",)], "uid string")
    from pyspark.sql import functions as F

    d = df.withColumn("_args", F.array(F.col("uid")))
    row = dynamodb_partiql(
        d, dyn.endpoint, dyn.access_key, dyn.secret_key,
        'SELECT * FROM "absent" WHERE uid = ?', args_col="_args",
    ).collect()[0]
    assert row.partiql is None
    assert "ResourceNotFoundException" in row.error


def test_attr_value_roundtrip():
    v = {"a": [1, 2.5, "x", None, True], "m": {"k": "v"}}
    assert attr_to_obj(attr_value(v)) == v


def test_yaml_partiql_processor(spark, dyn, tmp_path):
    _seed(dyn)
    src = tmp_path / "in"
    spark.createDataFrame([("u1",)], "uid string").write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - aws_dynamodb_partiql:
        query: 'SELECT * FROM "users" WHERE uid = ?'
        args_mapping: '[ this.uid ]'
        endpoint: {dyn.endpoint}
        access_key: {dyn.access_key}
        secret_key: {dyn.secret_key}
""")
    rows = p.build_batch(spark).collect()
    assert json.loads(rows[0].partiql)["score"] == 10
    assert "_pq_args" not in rows[0].asDict()


# ----------------------------------------------------------- aws_s3 (proc)


def test_s3_get_per_row_and_delete(spark, s3srv):
    c = S3Client(s3srv.endpoint, s3srv.access_key, s3srv.secret_key)
    c.put_object("bkt", "docs/1.txt", b"one")
    c.put_object("bkt", "docs/2.txt", b"two")
    df = spark.createDataFrame([("docs/1.txt",), ("docs/2.txt",), ("docs/9.txt",)],
                               "key string")
    from pyspark.sql import functions as F

    d = df.withColumn("_b", F.lit("bkt"))
    rows = s3_get_map(d, s3srv.endpoint, s3srv.access_key, s3srv.secret_key,
                      "_b", "key", delete_objects=True).collect()
    got = {r.key: (bytes(r.s3_object) if r.s3_object is not None else None,
                   r.error) for r in rows}
    assert got["docs/1.txt"][0] == b"one" and got["docs/1.txt"][1] is None
    assert got["docs/2.txt"][0] == b"two"
    # the miss is flagged, content column untouched, object NOT deleted
    assert got["docs/9.txt"][0] is None and "aws_s3" in got["docs/9.txt"][1]
    # delete_objects removed only the successfully fetched keys
    assert s3srv.keys("bkt") == []


def test_yaml_s3_processor_interpolated_key(spark, s3srv, tmp_path):
    c = S3Client(s3srv.endpoint, s3srv.access_key, s3srv.secret_key)
    c.put_object("data", "obj-7", b"payload-7")
    src = tmp_path / "in"
    spark.createDataFrame([(7,)], "id long").write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - aws_s3:
        bucket: data
        key: obj-${{! this.id }}
        endpoint: {s3srv.endpoint}
        access_key: {s3srv.access_key}
        secret_key: {s3srv.secret_key}
""")
    rows = p.build_batch(spark).collect()
    assert bytes(rows[0].s3_object) == b"payload-7"
    assert "_s3_bucket" not in rows[0].asDict()


def test_lint_knows_aws_processors():
    from bento_spark.plans.lint import known_processors

    ks = known_processors()
    assert {"aws_lambda", "aws_dynamodb_partiql", "aws_s3"} <= ks
