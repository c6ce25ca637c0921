"""snowflake_put output: key-pair JWT recipe (fingerprint-qualified
issuer, RS256), stage-file rendering with the compression matrix, and the
Snowpipe insertFiles/insertReport REST calls — against MiniSnowflakeServer,
which verifies every JWT with the registered public key."""

from __future__ import annotations

import gzip
import json
import shutil
import subprocess
import time
import zlib

import pytest

from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.snowflake import (
    MiniSnowflakeServer,
    SnowflakeClient,
    compress_payload,
    public_key_fingerprint,
    rsa_spki_der,
    snowflake_jwt,
)

_OPENSSL = shutil.which("openssl")


@pytest.fixture(scope="module")
def keys(tmp_path_factory):
    if _OPENSSL is None:
        pytest.skip("openssl binary unavailable")
    d = tmp_path_factory.mktemp("sfkeys")
    subprocess.run([_OPENSSL, "genrsa", "-out", "rsa.pem", "2048"],
                   capture_output=True, cwd=d, check=True)
    subprocess.run([_OPENSSL, "rsa", "-in", "rsa.pem", "-pubout",
                    "-out", "rsa_pub.pem"], capture_output=True, cwd=d,
                   check=True)
    return ((d / "rsa.pem").read_text(), (d / "rsa_pub.pem").read_text())


@pytest.fixture()
def server(keys):
    _priv, pub = keys
    s = MiniSnowflakeServer("myacct", "loader", pub).start()
    yield s
    s.stop()


# ---------------------------------------------------------------------------
# JWT + fingerprint
# ---------------------------------------------------------------------------


def test_spki_der_matches_openssl(keys):
    """Our SPKI DER (the fingerprint input) must byte-match the DER
    openssl exports for the same key."""
    from bento_spark.functions.crypto_prims import parse_rsa_public

    _priv, pub = keys
    key = parse_rsa_public(pub)
    import base64

    pem_body = "".join(line for line in pub.splitlines()
                       if not line.startswith("-"))
    assert rsa_spki_der(key["n"], key["e"]) == base64.b64decode(pem_body)


def test_jwt_issuer_carries_fingerprint(keys):
    priv, pub = keys
    from bento_spark.functions.crypto_prims import parse_rsa_public

    key = parse_rsa_public(pub)
    fp = public_key_fingerprint(key["n"], key["e"])
    assert fp.startswith("SHA256:")
    tok = snowflake_jwt("myAcct", "Loader", priv, 1700000000)
    import base64 as b64

    payload = tok.split(".")[1]
    claims = json.loads(b64.urlsafe_b64decode(payload + "=" * (-len(payload) % 4)))
    assert claims["iss"] == f"MYACCT.LOADER.{fp}"
    assert claims["sub"] == "MYACCT.LOADER"
    assert claims["exp"] == claims["iat"] + 3600


def test_compression_matrix():
    body = b'{"a": 1}\n' * 10
    assert compress_payload(body, "NONE") == (body, "")
    gz, sfx = compress_payload(body, "GZIP")
    assert sfx == ".gz" and gzip.decompress(gz) == body
    auto, sfx = compress_payload(body, "AUTO")
    assert sfx == ".gz" and gzip.decompress(auto) == body
    df, sfx = compress_payload(body, "DEFLATE")
    assert sfx == ".deflate" and zlib.decompress(df) == body
    raw, sfx = compress_payload(body, "RAW_DEFLATE")
    assert sfx == ".raw_deflate"
    assert zlib.decompress(raw, wbits=-zlib.MAX_WBITS) == body
    with pytest.raises(ValueError, match="compression"):
        compress_payload(body, "ZSTD")


# ---------------------------------------------------------------------------
# client <-> service
# ---------------------------------------------------------------------------


def test_wrong_key_rejected(server, tmp_path):
    if _OPENSSL is None:
        pytest.skip("openssl binary unavailable")
    subprocess.run([_OPENSSL, "genrsa", "-out", "other.pem", "2048"],
                   capture_output=True, cwd=tmp_path, check=True)
    bad = SnowflakeClient(server.endpoint, "myacct", "loader",
                          (tmp_path / "other.pem").read_text())
    with pytest.raises(ConnectionError, match="401"):
        bad.put_stage_file("@mystage", "f.json", b"{}")


def test_wrong_user_rejected(server, keys):
    priv, _pub = keys
    bad = SnowflakeClient(server.endpoint, "myacct", "other_user", priv)
    with pytest.raises(ConnectionError, match="401"):
        bad.put_stage_file("@mystage", "f.json", b"{}")


def test_put_and_insert_files(server, keys):
    priv, _pub = keys
    c = SnowflakeClient(server.endpoint, "myacct", "loader", priv)
    rel = c.put_stage_file("@mystage", "load/part0.json.gz",
                           gzip.compress(b'{"x":1}\n'))
    assert rel == "load/part0.json.gz"
    assert gzip.decompress(server.staged["mystage/load/part0.json.gz"]) == \
        b'{"x":1}\n'
    resp = c.insert_files("db.schema.BENTO_PIPE", [rel])
    assert resp["responseCode"] == "SUCCESS"
    report = c.insert_report("db.schema.BENTO_PIPE")
    assert [f["path"] for f in report["files"]] == [rel]


# ---------------------------------------------------------------------------
# Spark e2e
# ---------------------------------------------------------------------------


def test_yaml_snowflake_put_end_to_end(spark, server, keys, tmp_path):
    priv, _pub = keys
    key_file = tmp_path / "rsa.pem"
    key_file.write_text(priv)
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"table": "orders", "amount": 10}\n'
        '{"table": "orders", "amount": 20}\n'
        '{"table": "refunds", "amount": 5}\n')
    p = compile_yaml(f"""
input:
  json:
    path: {src}
    schema: "table STRING, amount BIGINT"
output:
  snowflake_put:
    endpoint: {server.endpoint}
    account: myacct
    user: loader
    private_key_file: {key_file}
    stage: "@mystage"
    path: landing/${{! this.table }}
    snowpipe: db.schema.BENTO_PIPE
    compression: GZIP
""")
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(90)
    deadline = time.monotonic() + 10
    while len(server.pipe_files.get("db.schema.BENTO_PIPE", [])) < 2:
        assert time.monotonic() < deadline
        time.sleep(0.05)
    files = server.pipe_files["db.schema.BENTO_PIPE"]
    # one file per interpolated path, announced to the pipe
    assert sorted(f.split("/")[1] for f in files) == ["orders", "refunds"]
    rows = []
    for rel in files:
        body = gzip.decompress(server.staged[f"mystage/{rel}"])
        rows += [json.loads(line) for line in body.decode().splitlines()]
    assert sorted(r["amount"] for r in rows) == [5, 10, 20]
    # replay-stable names: (epoch, partition, seq) + .json.gz
    assert all(f.endswith(".json.gz") for f in files)


def test_yaml_missing_key_is_plan_time_error(spark, tmp_path):
    src = tmp_path / "s"
    src.mkdir()
    (src / "a.txt").write_text("x\n")
    p = compile_yaml(f"""
input:
  lines:
    path: {src}
output:
  snowflake_put:
    account: a
    user: u
    stage: "@s"
""")
    with pytest.raises(ValueError, match="private_key"):
        p.run_stream(spark, checkpoint=str(tmp_path / "ckpt"))
