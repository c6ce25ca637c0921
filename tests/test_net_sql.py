"""socket input (live TCP end-to-end) and gated JDBC sql_select/sql_insert."""

from __future__ import annotations

import socket
import threading
import time

import pytest

from bento_spark.operators.sql_connector import jdbc_available, sql_insert_writer, sql_select
from bento_spark.plans.compiler import compile_yaml


def test_socket_input_stream(spark, tmp_path):
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    lines = [b"alpha\n", b"beta\n", b"gamma\n"]

    def serve():
        conn, _ = srv.accept()
        with conn:
            for ln in lines:
                conn.sendall(ln)
            time.sleep(8)  # keep the socket open while micro-batches drain

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    p = compile_yaml(f"""
input:
  socket: {{host: 127.0.0.1, port: {port}}}
pipeline:
  processors:
    - mapping: root.upper = this.line.uppercase()
""")
    got: list[str] = []
    q = (
        p.build_stream(spark)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(lambda df, eid: got.extend(r.upper for r in df.collect()))
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 30
    while time.time() < deadline and len(got) < 3:
        time.sleep(0.5)
    q.stop()
    srv.close()
    assert sorted(got) == ["ALPHA", "BETA", "GAMMA"]
    with pytest.raises(ValueError, match="streaming-only"):
        p.build_batch(spark)


def test_jdbc_gated(spark):
    url = "jdbc:postgresql://localhost:5432/db"
    assert not jdbc_available(spark, url)
    with pytest.raises(RuntimeError, match="org.postgresql.Driver"):
        sql_select(spark, url, table="t")
    with pytest.raises(RuntimeError, match="JDBC driver"):
        sql_insert_writer(spark, url, "t")
    with pytest.raises(ValueError, match="unsupported jdbc scheme"):
        sql_select(spark, "jdbc:oracle:thin:@x", table="t")
    with pytest.raises(RuntimeError, match="driver"):
        sql_select(spark, url, table="t", query="SELECT 1")  # gate fires before arg check
