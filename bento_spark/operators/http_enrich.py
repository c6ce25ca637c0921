"""HTTP enrichment processor.

Reference: the `http` processor sends each message to a URL and replaces
(or branches) the payload with the response
(/root/reference/internal/impl/io/processor_http.go:16; request opts in
internal/httpclient). The most-used enrichment pattern after caches.

Spark-first mapping:
- the URL is an interpolated `${! expr }` field compiled to a Column
  (JVM-side concat — bento_spark.functions.bloblang.compile_interpolated),
  so per-row URL construction never touches Python;
- requests run inside mapInPandas: one Arrow batch in, sequential requests
  over a per-(host,port) keep-alive connection pool local to the partition
  — the distributed analogue of the reference's parallel:-wrapped http
  workers (total concurrency = #partitions);
- failures follow the error-column protocol (message errored, body kept
  NULL) instead of raising, matching the reference's errored-message
  routing.

At scale: rate limiting belongs at the partition count (`repartition` to
the concurrency budget the upstream service allows); a retry budget per row
bounds stragglers. For bulk enrichment prefer the cache/lookup join path —
this operator exists for genuinely-remote lookups.
"""

from __future__ import annotations

import time
import urllib.parse
from collections.abc import Iterator, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bento_spark.operators.errors import ERROR_COL, ensure_error_col

_URL_COL = "_http_url"
_BODY_COL = "_http_body"


def http_enrich(
    df: DataFrame,
    url: Column | str,
    out_col: str = "http_response",
    method: str = "GET",
    headers: Mapping[str, str] | None = None,
    body: Column | str | None = None,
    timeout: float = 5.0,
    retries: int = 1,
    backoff_s: float = 0.2,
    rate_limit: tuple[float, float] | None = None,
) -> DataFrame:
    """Enrich each row with an HTTP response body (string). `url` (and the
    optional `body` for POST/PUT) are Columns — typically from
    compile_interpolated — evaluated JVM-side before the Python stage.

    `rate_limit` is a per-partition (rate_per_s, burst) share of a named
    rate_limit resource (processor_http.go:18 `rate_limit` field; see
    operators/rate_limit.py for the aggregate-cap argument) — every
    request ATTEMPT (including retries) first takes a token."""
    method = method.upper()
    hdrs = dict(headers or {})
    df = ensure_error_col(df)
    df = df.withColumn(_URL_COL, url if isinstance(url, Column) else F.lit(url))
    if body is not None:
        df = df.withColumn(_BODY_COL, body if isinstance(body, Column) else F.lit(body))
    in_cols = [c for c in df.columns if c not in (_URL_COL, _BODY_COL)]
    if out_col in in_cols:
        # a duplicate name would desync the declared Arrow schema (out_schema
        # lists it twice) from the yielded frame (which has it once)
        raise ValueError(f"http_enrich: out_col {out_col!r} collides with an input column")
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join([f"{c} {fields[c]}" for c in in_cols] + [f"{out_col} string"])

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # imported here: the cloudpickled closure must re-resolve the
        # submodule on the worker (a captured `http.client` unpickles as the
        # bare `http` package)
        import http.client

        from bento_spark.operators.rate_limit import make_limiter

        bucket = make_limiter(rate_limit)
        conns: dict[tuple[str, str, int], http.client.HTTPConnection] = {}

        def request(raw_url, payload: str | None) -> tuple[str | None, str | None]:
            # URL parsing stays inside the error protocol: a NULL or
            # malformed per-row URL errors THAT row, never the job
            try:
                if not isinstance(raw_url, str):
                    raise ValueError(f"url is {type(raw_url).__name__}, not str")
                u = urllib.parse.urlsplit(raw_url)
                key = (u.scheme, u.hostname or "", u.port or (443 if u.scheme == "https" else 80))
            except ValueError as e:
                return None, f"http request failed: bad url: {e}"
            last = "no attempt"
            for attempt in range(retries + 1):
                if bucket is not None:
                    bucket.acquire()
                try:
                    conn = conns.get(key)
                    if conn is None:
                        cls = http.client.HTTPSConnection if u.scheme == "https" else http.client.HTTPConnection
                        conn = cls(key[1], key[2], timeout=timeout)
                        conns[key] = conn
                    path = u.path + (f"?{u.query}" if u.query else "")
                    conn.request(method, path or "/", body=payload, headers=hdrs)
                    resp = conn.getresponse()
                    data = resp.read().decode("utf-8", errors="replace")
                    if 200 <= resp.status < 300:
                        return data, None
                    last = f"http status {resp.status}"
                except Exception as e:  # noqa: BLE001 — network faults become errored rows
                    last = f"{type(e).__name__}: {e}"
                    conns.pop(key, None)  # drop the broken keep-alive conn
                if attempt < retries:
                    time.sleep(backoff_s * (2**attempt))
            return None, f"http request failed: {last}"

        for pdf in batches:
            if len(pdf) == 0:
                continue
            outs, errs = [], []
            for i in range(len(pdf)):
                prior = pdf[ERROR_COL].iloc[i]
                if isinstance(prior, str):  # arrow nulls land as None/NaN — only real strings are errors
                    outs.append(None)  # already-errored rows short-circuit (try semantics)
                    errs.append(prior)
                    continue
                payload = pdf[_BODY_COL].iloc[i] if _BODY_COL in pdf.columns else None
                data, err = request(pdf[_URL_COL].iloc[i], payload)
                outs.append(data)
                errs.append(err)
            out = pdf[in_cols].copy()
            out[out_col] = outs
            out[ERROR_COL] = errs
            yield out

        for conn in conns.values():
            try:
                conn.close()
            except Exception:  # noqa: BLE001
                pass

    return df.mapInPandas(fetch, schema=out_schema)
