"""Confluent Schema Registry processors — schema_registry_encode /
schema_registry_decode over the public registry REST API
(GET /schemas/ids/{id}, GET|POST /subjects/{subject}/versions[/latest])
and the public wire format: magic byte 0x00 + 4-byte big-endian schema id
+ Avro binary. Plus an in-process registry for e2e tests.

Reference: internal/impl/confluent/processor_schema_registry_encode.go:273
(header write), processor_schema_registry_decode.go:231 (id read),
client.go:80,108 (endpoints). The reference supports avro/json/protobuf
serdes; this implementation covers the Avro serde over the repo's
dependency-free codec (operators/avro_codec.py) — the dominant registry
use — and raises clearly for the others.

Spark-first mapping:
- encode: the subject's LATEST schema resolves ONCE driver-side at plan
  time (the reference caches with refresh_period and re-resolves per
  period; a Spark plan is compiled per batch/stream start, so plan time
  IS the refresh point). Rows encode in the existing Arrow mapInPandas
  avro stage; the 5-byte header is a JVM-side concat of a literal.
- decode: messages may carry DIFFERENT schema ids in one batch, so the
  id is read per row inside the Arrow stage and schemas fetch lazily
  through a per-executor memo (one GET per distinct id per executor,
  never per row). Output is the decoded record as standard JSON (the
  reference emits the message re-serialized; schema-less JSON keeps a
  mixed-id batch relational) — parse downstream with parse_json/from_json.
"""

from __future__ import annotations

import json
import threading
from collections.abc import Iterator, Sequence

import http.server
import struct

_MAGIC = 0


class SchemaRegistryClient:
    """Minimal registry REST client (client.go): schema by id, latest by
    subject, register (used by producers and the tests)."""

    def __init__(self, url: str, timeout: float = 10.0):
        import urllib.parse

        u = urllib.parse.urlsplit(url)
        self._https = u.scheme == "https"
        self.host, self.port = u.hostname, u.port or (443 if self._https else 80)
        self.base = u.path.rstrip("/")
        self.timeout = timeout

    def _request(self, method: str, path: str, body: dict | None = None) -> dict:
        import http.client as hc

        cls = hc.HTTPSConnection if self._https else hc.HTTPConnection
        conn = cls(self.host, self.port, timeout=self.timeout)
        try:
            payload = None if body is None else json.dumps(body).encode()
            headers = {"Accept": "application/vnd.schemaregistry.v1+json"}
            if payload is not None:
                headers["Content-Type"] = "application/vnd.schemaregistry.v1+json"
            conn.request(method, self.base + path, body=payload, headers=headers)
            resp = conn.getresponse()
            data = resp.read()
            if resp.status // 100 != 2:
                raise ConnectionError(
                    f"schema_registry: {method} {path} -> {resp.status} {data[:120]!r}")
            return json.loads(data)
        finally:
            conn.close()

    def schema_by_id(self, schema_id: int) -> str:
        return self._request("GET", f"/schemas/ids/{schema_id}")["schema"]

    def latest(self, subject: str) -> tuple[int, str]:
        import urllib.parse

        d = self._request(
            "GET", f"/subjects/{urllib.parse.quote(subject, safe='')}/versions/latest")
        return int(d["id"]), d["schema"]

    def register(self, subject: str, schema_json: str) -> int:
        import urllib.parse

        d = self._request(
            "POST", f"/subjects/{urllib.parse.quote(subject, safe='')}/versions",
            {"schema": schema_json})
        return int(d["id"])


def frame_header(schema_id: int) -> bytes:
    return struct.pack(">bI", _MAGIC, schema_id)


def schema_registry_encode(df, url: str, subject: str,
                           columns: Sequence[str], out_col: str = "sr_blob"):
    """Encode `columns` against the subject's latest Avro schema and
    prepend the wire-format header (encode.go:273)."""
    from pyspark.sql import functions as F

    from bento_spark.operators.avro_codec import avro_record_encode

    schema_id, schema_json = SchemaRegistryClient(url).latest(subject)
    out = avro_record_encode(df, list(columns), schema_json, out_col="_sr_body")
    return out.withColumn(
        out_col, F.concat(F.lit(frame_header(schema_id)), F.col("_sr_body"))
    ).drop("_sr_body")


# per-executor schema memo: one registry GET per distinct id per worker
_schema_memo: dict[tuple[str, int], dict] = {}
_memo_lock = threading.Lock()


def _schema_for(url: str, schema_id: int) -> dict:
    from bento_spark.operators.avro_codec import parse_schema

    key = (url, schema_id)
    with _memo_lock:
        if key in _schema_memo:
            return _schema_memo[key]
    schema = parse_schema(SchemaRegistryClient(url).schema_by_id(schema_id))
    with _memo_lock:
        _schema_memo[key] = schema
    return schema


def schema_registry_decode(df, url: str, blob_col: str = "sr_blob",
                           out_col: str = "decoded",
                           keep_cols: Sequence[str] = ()):
    """Decode wire-format messages (decode.go:231): per-row schema id,
    lazily-fetched schemas, record emitted as standard JSON in `out_col`
    (NULL for a malformed header/body — the catch protocol)."""
    import pandas as pd

    keep_cols = list(keep_cols)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    keep = ", ".join(f"{c} {fields[c]}" for c in keep_cols)
    out_schema = f"{keep}, {out_col} string" if keep else f"{out_col} string"

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.operators.avro_codec import avro_decode_value, to_standard_json
        from bento_spark.operators.schema_registry import _schema_for

        for pdf in batches:
            vals = []
            for blob in pdf[blob_col]:
                try:
                    b = bytes(blob)
                    if len(b) < 5 or b[0] != _MAGIC:
                        vals.append(None)
                        continue
                    schema_id = struct.unpack(">I", b[1:5])[0]
                    schema = _schema_for(url, schema_id)
                    vals.append(to_standard_json(avro_decode_value(b[5:], schema)))
                except (ValueError, ConnectionError, IndexError, TypeError):
                    vals.append(None)
            out = pdf[keep_cols].copy()
            out[out_col] = vals
            yield out

    return df.select(*keep_cols, blob_col).mapInPandas(dec, schema=out_schema)


# --------------------------------------------------------------------------
# in-process registry (test-grade)
# --------------------------------------------------------------------------


class MiniSchemaRegistry:
    """Registry REST subset for e2e tests: register (dedup by canonical
    schema text per subject), latest-version lookup, schema-by-id. Not a
    production registry — the deliverable is the CLIENT/processors."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host, self.port = host, port
        self._by_id: dict[int, str] = {}
        self._subjects: dict[str, list[int]] = {}
        self._lock = threading.Lock()
        self._srv: http.server.ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> "MiniSchemaRegistry":
        reg = self

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def _reply(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type",
                                 "application/vnd.schemaregistry.v1+json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                import urllib.parse

                parts = [urllib.parse.unquote(p) for p in self.path.split("/") if p]
                with reg._lock:
                    if len(parts) == 3 and parts[:2] == ["schemas", "ids"]:
                        schema = reg._by_id.get(int(parts[2]))
                        if schema is None:
                            return self._reply(404, {"error_code": 40403,
                                                     "message": "Schema not found"})
                        return self._reply(200, {"schema": schema})
                    if (len(parts) == 4 and parts[0] == "subjects"
                            and parts[2] == "versions"):
                        ids = reg._subjects.get(parts[1], [])
                        if not ids:
                            return self._reply(404, {"error_code": 40401,
                                                     "message": "Subject not found"})
                        sid = ids[-1] if parts[3] == "latest" else ids[int(parts[3]) - 1]
                        return self._reply(200, {
                            "subject": parts[1], "version": len(ids), "id": sid,
                            "schema": reg._by_id[sid]})
                return self._reply(404, {"error_code": 404, "message": "unknown path"})

            def do_POST(self):  # noqa: N802
                import urllib.parse

                parts = [urllib.parse.unquote(p) for p in self.path.split("/") if p]
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n))
                if len(parts) == 3 and parts[0] == "subjects" and parts[2] == "versions":
                    canonical = json.dumps(json.loads(body["schema"]), sort_keys=True)
                    with reg._lock:
                        for sid in reg._subjects.get(parts[1], []):
                            if json.dumps(json.loads(reg._by_id[sid]),
                                          sort_keys=True) == canonical:
                                return self._reply(200, {"id": sid})
                        sid = len(reg._by_id) + 1
                        reg._by_id[sid] = body["schema"]
                        reg._subjects.setdefault(parts[1], []).append(sid)
                    return self._reply(200, {"id": sid})
                return self._reply(404, {"error_code": 404, "message": "unknown path"})

            def log_message(self, *a):
                pass

        self._srv = http.server.ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()
        return self

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def stop(self) -> None:
        if self._srv is not None:
            self._srv.shutdown()
            self._srv = None
