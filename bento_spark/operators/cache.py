"""cache / cached — keyed state as tables (enrichment & memoization).

Reference semantics:
- `cache` processor: per-message get/set/add/delete against a named cache
  resource (/root/reference/internal/impl/pure/processor_cache.go:150,
  operators :125,:267-273); 16 cache backends (memory, lru, ttlru, redis,
  …) registered under internal/impl/*/cache_*.go.
- `cached`: memoize a child processor's result by key + TTL
  (processor_cached.go).
- The cache-hydration stream-join cookbook
  (config/examples/joining_streams.yaml:32-56) builds a stream-stream join
  from cache get/set — in Spark that is a native stateful join
  (bento_spark.streaming.joins); this module covers the LOOKUP/state-table
  uses.

Spark-first: a cache is a keyed DataFrame/table. Per-row get = left join
(broadcast when small — Catalyst picks BHJ under the threshold); set/add =
MERGE-style upsert (last-writer-wins / insert-if-absent), implemented over
parquet here and `MERGE INTO` on Iceberg clusters. There is no per-row
Python and no driver round-trip: a batch of N getss is ONE join, matching
how the reference amortizes multi-gets (processor_cache.go batch path).
"""

from __future__ import annotations

import os
import re
import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_EXPIRES = "_expires_ms"


def _ttl_ms(ttl: int | float | str) -> int:
    """TTL in ms from seconds (number) or the pipeline's duration syntax
    ('60s', '5 minutes') — processor_cache.go:150's `ttl` field."""
    if isinstance(ttl, (int, float)) and not isinstance(ttl, bool):
        return int(ttl * 1000)
    from bento_spark.streaming.cep import duration_ms

    return duration_ms(str(ttl))


def _now_ms(now_ms: int | None) -> int:
    # wall clock enters a data path ONLY here, and only for TTL'd writes /
    # reads that did not pin `now_ms` — oracle queries and tests pin it
    return int(time.time() * 1000) if now_ms is None else int(now_ms)


class KeyValueCache:
    """A named keyed state table with Bento cache-operator semantics.

    Backing store: a parquet dir of versioned snapshots (atomic swap via
    commit marker), standing in for an Iceberg table. `_v` is the writer
    version — resolution is last-writer-wins per key, the same contract as
    `MERGE INTO cache USING batch ON key WHEN MATCHED UPDATE ...`.
    """

    def __init__(self, spark: SparkSession, path: str, key_col: str = "key"):
        self.spark = spark
        self.path = path.rstrip("/")
        self.key_col = key_col
        os.makedirs(self.path, exist_ok=True)

    # -- storage ------------------------------------------------------------
    def _versions(self) -> list[int]:
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith("_v=") and os.path.exists(f"{self.path}/{d}/_SUCCESS")
        )

    def _snapshot_full(self, now_ms: int | None = None) -> DataFrame | None:
        """Latest live write per key INCLUDING the expiry column (compact
        must preserve surviving TTLs)."""
        vs = self._versions()
        if not vs:
            return None
        df = self.spark.read.option("basePath", self.path).parquet(
            *[f"{self.path}/_v={v}" for v in vs]
        )
        w = Window.partitionBy(self.key_col).orderBy(F.desc("_v"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .filter(~F.col("_deleted"))
            # expiry-on-read AFTER last-writer-wins: an expired NEWEST write
            # hides any older value for the key (the reference's set
            # replaces value AND ttl — expiry makes the key absent, it does
            # not resurrect a predecessor)
            .filter(F.col(_EXPIRES).isNull() | (F.col(_EXPIRES) > F.lit(_now_ms(now_ms))))
            .drop("_rn", "_v", "_deleted")
        )

    def snapshot(self, now_ms: int | None = None) -> DataFrame | None:
        """Current cache contents (latest unexpired write per key)."""
        full = self._snapshot_full(now_ms)
        return None if full is None else full.drop(_EXPIRES)

    def _write(self, df: DataFrame, deleted: bool) -> None:
        if _EXPIRES not in df.columns:
            df = df.withColumn(_EXPIRES, F.lit(None).cast("bigint"))
        v = (self._versions()[-1] + 1) if self._versions() else 0
        df.withColumn("_deleted", F.lit(deleted)).write.mode("overwrite").parquet(
            f"{self.path}/_v={v}"
        )

    # -- operators (processor_cache.go:125) ----------------------------------
    def set(self, df: DataFrame, ttl: int | float | str | None = None,
            now_ms: int | None = None) -> None:
        """Upsert all rows (last write wins per key). `ttl` (seconds or
        duration string) bounds each entry's life — processor_cache.go:150;
        half the reference's 16 backends are TTL-defined (cache_ttlru.go,
        cache_memory.go's 5m default)."""
        fresh = df.dropDuplicates([self.key_col])
        if ttl is not None:
            fresh = fresh.withColumn(
                _EXPIRES, F.lit(_now_ms(now_ms) + _ttl_ms(ttl)).cast("bigint")
            )
        self._write(fresh, deleted=False)

    def add(self, df: DataFrame, ttl: int | float | str | None = None,
            now_ms: int | None = None) -> DataFrame:
        """Insert-if-absent. Returns the rows that were REJECTED (key already
        present) — the reference errors those messages; callers route them
        with the error-column protocol. An EXPIRED key counts as absent."""
        cur = self.snapshot(now_ms)
        fresh = df.dropDuplicates([self.key_col])
        if ttl is not None:
            fresh = fresh.withColumn(
                _EXPIRES, F.lit(_now_ms(now_ms) + _ttl_ms(ttl)).cast("bigint")
            )
        if cur is None:
            self._write(fresh, deleted=False)
            return fresh.limit(0).drop(_EXPIRES)
        rejected = fresh.join(cur.select(self.key_col), self.key_col, "left_semi")
        accepted = fresh.join(cur.select(self.key_col), self.key_col, "left_anti")
        self._write(accepted, deleted=False)
        return rejected.drop(_EXPIRES)

    def delete(self, keys: DataFrame) -> None:
        cur = self.snapshot()
        if cur is None:
            return
        tomb = cur.join(keys.select(self.key_col), self.key_col, "left_semi")
        self._write(tomb, deleted=True)

    def get(self, df: DataFrame, on: str | None = None, broadcast: bool = True,
            now_ms: int | None = None) -> DataFrame:
        """Enrich df with cache values by key (left join; misses = NULL,
        matching the reference where a miss errors the message — follow with
        set_error_when(value.isNull()) if that routing is wanted).

        Raises on a never-written cache: the value columns (and therefore the
        output schema) are unknowable before the first set/add, and a schema
        that silently depends on cache state is worse than an error."""
        cur = self.snapshot(now_ms)
        key = on or self.key_col
        if cur is None:
            raise RuntimeError(
                f"cache at {self.path} has no contents yet: call set()/add() "
                "before get() (the enriched schema depends on the cached value columns)"
            )
        side = cur.withColumnRenamed(self.key_col, key) if key != self.key_col else cur
        if broadcast:
            side = F.broadcast(side)
        return df.join(side, key, "left")

    def compact(self, now_ms: int | None = None) -> None:
        """Fold all versions into one (Iceberg's rewrite_data_files
        analogue); expired entries are swept, surviving TTLs preserved.
        Write-new-THEN-delete-old: persist() is not durable — a
        lost cache block between deleting the source files and the rewrite
        action would force recomputation from parquet paths that no longer
        exist, losing the whole cache."""
        old = self._versions()
        if not old:
            return
        cur = self._snapshot_full(now_ms)
        self._write(cur, deleted=False)  # materializes while sources exist
        import shutil

        for v in old:
            shutil.rmtree(f"{self.path}/_v={v}")


class FileCache:
    """`file` cache backend (/root/reference/internal/impl/io/cache_file.go:27):
    one file per key under `directory` — the item id IS the relative path,
    the file content IS the value. Interoperable with anything that can
    read a directory (the reference positions it for development/debugging;
    it is also the simplest cache that survives a driver restart).

    Spark-first mapping: reads are ONE distributed `binaryFile` scan of the
    directory joined to the batch (never a per-row driver round-trip);
    writes run executor-side in foreachPartition — `set` is tmp-file +
    atomic os.replace, `add` is O_EXCL create (cache_file.go:71), both
    correct on a shared/posix filesystem.

    TTL: the reference's file cache ignores per-entry TTLs (Set's duration
    parameter is discarded, and the docs call out "no form of item
    expiry"). We keep that contract for set()'s ttl argument but add an
    optional RESOURCE-level `ttl`: entries whose file mtime is older than
    `ttl` before `now_ms` read as absent — mtime-based expiry with zero
    metadata files."""

    single_value = True

    def __init__(self, spark: SparkSession, directory: str, key_col: str = "key",
                 value_col: str = "value", ttl: int | float | str | None = None):
        self.spark = spark
        self.dir = directory.rstrip("/")
        self.key_col = key_col
        self.value_col = value_col
        self.ttl_ms = None if ttl is None else _ttl_ms(ttl)
        os.makedirs(self.dir, exist_ok=True)

    # -- storage ------------------------------------------------------------
    def snapshot(self, now_ms: int | None = None) -> DataFrame | None:
        """Current contents as (key, value) — one binaryFile scan; keys are
        paths relative to the directory, values decoded UTF-8."""
        if not any(
            not f.startswith(".") and not f.endswith(".tmp")
            for _, _, fs in os.walk(self.dir)
            for f in fs
        ):
            return None
        df = (
            self.spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
            .load(self.dir)
        )
        # Hadoop renders local paths as file:/abs or file:///abs depending on
        # the FS impl — normalize the scheme away, then strip the directory
        # prefix to recover the relative-path key
        abs_path = F.regexp_replace(F.col("path"), r"^[a-zA-Z0-9]+:/+", "/")
        out = df.select(
            F.regexp_replace(abs_path, "^" + re.escape(self.dir + "/"), "")
            .alias(self.key_col),
            F.col("content").cast("string").alias(self.value_col),
            F.unix_millis(F.col("modificationTime")).alias("_mtime_ms"),
        )
        # crashed set() writers can leave `<key>.<32hex>.tmp` behind —
        # never surface them as entries
        out = out.filter(~F.col(self.key_col).rlike(r"\.[0-9a-f]{32}\.tmp$"))
        if self.ttl_ms is not None:
            out = out.filter(F.col("_mtime_ms") > F.lit(_now_ms(now_ms) - self.ttl_ms))
        return out.drop("_mtime_ms")

    def _write_files(self, df: DataFrame, exclusive: bool) -> None:
        """Executor-side file writes. `exclusive` = O_EXCL (add); else
        atomic tmp+rename (set). Keys may contain '/' (relative paths)."""
        base, key_col, value_col = self.dir, self.key_col, self.value_col
        rows = df.select(key_col, value_col)

        def write(part) -> None:
            import os as _os
            import uuid as _uuid

            for r in part:
                key, val = r[key_col], r[value_col]
                if key is None:
                    continue
                key = str(key)
                if key.startswith("/") or ".." in key.split("/"):
                    raise ValueError(f"file cache key escapes the directory: {key!r}")
                path = _os.path.join(base, key)
                _os.makedirs(_os.path.dirname(path), exist_ok=True)
                data = ("" if val is None else str(val)).encode("utf-8")
                if exclusive:
                    try:
                        fd = _os.open(path, _os.O_WRONLY | _os.O_CREAT | _os.O_EXCL, 0o644)
                    except FileExistsError:
                        continue  # rejection handled by the caller's anti-join
                    with _os.fdopen(fd, "wb") as f:
                        f.write(data)
                else:
                    tmp = f"{path}.{_uuid.uuid4().hex}.tmp"
                    with open(tmp, "wb") as f:
                        f.write(data)
                    _os.replace(tmp, path)

        rows.foreachPartition(write)

    # -- operators (cache_file.go:61-91) -------------------------------------
    def set(self, df: DataFrame, ttl: int | float | str | None = None,
            now_ms: int | None = None) -> None:
        """Upsert (atomic rename per key). Per-entry `ttl` is IGNORED —
        cache_file.go:68 discards it too; use the resource-level ttl."""
        self._write_files(df.dropDuplicates([self.key_col]), exclusive=False)

    def add(self, df: DataFrame, ttl: int | float | str | None = None,
            now_ms: int | None = None) -> DataFrame:
        """Insert-if-absent via O_EXCL. Returns rejected rows (key already
        present and unexpired) for the error-column routing. An expired
        entry counts as absent: its file is atomically replaced."""
        fresh = df.dropDuplicates([self.key_col])
        cur = self.snapshot(now_ms)
        if cur is None:
            self._write_files(fresh, exclusive=True)
            return fresh.limit(0)
        live_keys = cur.select(self.key_col)
        # materialize BOTH splits before writing: the write changes the very
        # files the lazy plans would re-scan, so an unpinned `rejected`
        # evaluated after the write would see the just-written keys as live
        rejected = fresh.join(live_keys, self.key_col, "left_semi").localCheckpoint(eager=True)
        accepted = fresh.join(live_keys, self.key_col, "left_anti").localCheckpoint(eager=True)
        # expired-but-present files must be REPLACED (O_EXCL would reject):
        # atomic rename for those, O_EXCL for brand-new keys is subsumed
        self._write_files(accepted, exclusive=False)
        return rejected

    def delete(self, keys: DataFrame) -> None:
        base, key_col = self.dir, self.key_col

        def rm(part) -> None:
            import os as _os

            for r in part:
                if r[key_col] is None:
                    continue
                key = str(r[key_col])
                if key.startswith("/") or ".." in key.split("/"):
                    continue
                try:
                    _os.remove(_os.path.join(base, key))
                except OSError:
                    pass

        keys.select(key_col).foreachPartition(rm)

    def get(self, df: DataFrame, on: str | None = None, broadcast: bool = True,
            now_ms: int | None = None) -> DataFrame:
        """Enrich df with the cached value by key (left join; miss = NULL
        `value` column, same contract as KeyValueCache.get)."""
        key = on or self.key_col
        cur = self.snapshot(now_ms)
        if cur is None:
            raise RuntimeError(
                f"file cache at {self.dir} is empty: set()/add() before get()"
            )
        side = cur.withColumnRenamed(self.key_col, key) if key != self.key_col else cur
        if broadcast:
            side = F.broadcast(side)
        return df.join(side, key, "left")


class SqliteCache:
    """`sql` cache backend over a SQLite file
    (/root/reference/internal/impl/sql/cache_sql.go:84 — one row per
    key/value pair in a named table; `set` is an upsert, `add` a plain
    insert that errors on conflict, no TTL support: cache_sql.go's Set
    discards the duration, matching `init_statement`-style plain tables).
    The reference reaches any database/sql driver; the repo's JDBC path
    (operators/sql_connector.py) is jar-gated, so this stdlib-sqlite3
    backend is the sandbox-testable instance — same single-shared-file
    deployment model as FileCache (a posix/shared filesystem).

    Spark-first mapping: `get` SELECTs only the batch's DISTINCT keys,
    one `IN (...)` query per partition executor-side, broadcast-joined
    back — never a per-row round-trip (the reference amortizes multi-gets
    the same way). Writes run executor-side per partition in one
    transaction each; WAL journal + busy_timeout serialize concurrent
    partition writers safely. `add`'s accepted/rejected split is
    localCheckpoint-ed eagerly — re-evaluating a lazy plan would re-run
    the inserts against state the first run created (the FileCache.add
    trap)."""

    single_value = True

    def __init__(self, spark: SparkSession, path: str, table: str = "bento_cache",
                 key_col: str = "key", value_col: str = "value"):
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
            raise ValueError(f"sqlite cache table must be an identifier, got {table!r}")
        self.spark = spark
        self.path = path
        self.table = table
        self.key_col, self.value_col = key_col, value_col
        import sqlite3

        with sqlite3.connect(path) as con:
            con.execute("PRAGMA journal_mode=WAL")
            con.execute(
                f"CREATE TABLE IF NOT EXISTS {table} (k TEXT PRIMARY KEY, v TEXT)"
            )

    # executor-side connection helper (pickled by value into closures)
    @staticmethod
    def _connect(path: str):
        import sqlite3

        con = sqlite3.connect(path, timeout=30.0)
        con.execute("PRAGMA busy_timeout=30000")
        return con

    def set(self, df: DataFrame, ttl=None, now_ms=None) -> None:
        """Upsert (INSERT .. ON CONFLICT DO UPDATE — cache_sql.go:144's
        upsertBuilder). `ttl` is ignored, like the reference."""
        path, table = self.path, self.table
        rows = df.dropDuplicates([self.key_col]).select(
            F.col(self.key_col).cast("string").alias("k"),
            F.col(self.value_col).cast("string").alias("v"),
        )

        def write(part) -> None:
            from bento_spark.operators.cache import SqliteCache as _S

            con = _S._connect(path)
            try:
                con.executemany(
                    f"INSERT INTO {table}(k, v) VALUES(?, ?) "
                    "ON CONFLICT(k) DO UPDATE SET v=excluded.v",
                    [(r.k, r.v) for r in part],
                )
                con.commit()
            finally:
                con.close()

        rows.foreachPartition(write)

    def add(self, df: DataFrame, ttl=None, now_ms=None) -> DataFrame:
        """Insert-if-absent (INSERT OR IGNORE; an ignored row = the
        reference's constraint-violation error). Returns rejected rows."""
        path, table = self.path, self.table
        key_col, value_col = self.key_col, self.value_col
        fresh = df.dropDuplicates([key_col])

        def attempt(iter_pdf):
            import pandas as pd

            from bento_spark.operators.cache import SqliteCache as _S

            con = _S._connect(path)
            try:
                for pdf in iter_pdf:
                    accepted = []
                    for k, v in zip(pdf[key_col], pdf[value_col]):
                        cur = con.execute(
                            f"INSERT OR IGNORE INTO {table}(k, v) VALUES(?, ?)",
                            (str(k), None if v is None else str(v)),
                        )
                        accepted.append(cur.rowcount == 1)
                    con.commit()
                    yield pd.DataFrame({
                        key_col: [str(k) for k in pdf[key_col]],
                        "_accepted": accepted,
                    })
            finally:
                con.close()

        verdicts = (
            fresh.select(F.col(key_col).cast("string").alias(key_col), value_col)
            .mapInPandas(attempt, f"{key_col} string, _accepted boolean")
            .localCheckpoint(eager=True)  # exactly-once insert attempt
        )
        rejected_keys = verdicts.filter(~F.col("_accepted")).select(key_col)
        return fresh.join(F.broadcast(rejected_keys), key_col, "left_semi")

    def delete(self, keys: DataFrame) -> None:
        path, table = self.path, self.table

        def rm(part) -> None:
            from bento_spark.operators.cache import SqliteCache as _S

            con = _S._connect(path)
            try:
                con.executemany(
                    f"DELETE FROM {table} WHERE k = ?",
                    [(str(r[0]),) for r in part],
                )
                con.commit()
            finally:
                con.close()

        keys.select(F.col(self.key_col).cast("string")).foreachPartition(rm)

    def get(self, df: DataFrame, on: str | None = None, broadcast: bool = True,
            now_ms=None) -> DataFrame:
        """Enrich df with the cached value by key (miss = NULL value,
        same contract as the other backends)."""
        key = on or self.key_col
        path, table = self.path, self.table
        key_col, value_col = self.key_col, self.value_col
        distinct = df.select(F.col(key).cast("string").alias(key_col)).distinct()

        def fetch(iter_pdf):
            import pandas as pd

            from bento_spark.operators.cache import SqliteCache as _S

            con = _S._connect(path)
            try:
                for pdf in iter_pdf:
                    ks = [str(k) for k in pdf[key_col]]
                    found: dict[str, str] = {}
                    # SQLite caps bound parameters (999 pre-3.32) — chunk
                    for i in range(0, len(ks), 500):
                        chunk = ks[i:i + 500]
                        marks = ",".join("?" * len(chunk))
                        found.update(con.execute(
                            f"SELECT k, v FROM {table} WHERE k IN ({marks})", chunk
                        ).fetchall())
                    yield pd.DataFrame({
                        key_col: ks,
                        value_col: [found.get(k) for k in ks],
                    })
            finally:
                con.close()

        side = distinct.mapInPandas(fetch, f"{key_col} string, {value_col} string")
        side = side.filter(F.col(value_col).isNotNull())
        if key != key_col:
            side = side.withColumnRenamed(key_col, key)
        if broadcast:
            side = F.broadcast(side)
        return df.join(side, key, "left")

    def snapshot(self, now_ms=None) -> DataFrame | None:
        """Full table as (key, value) — debug/compat surface; data paths
        use get()'s keyed fetch (one driver-side read here is fine: the
        backend's deployment model is dimension-scale shared-file state)."""
        con = self._connect(self.path)
        try:
            rows = con.execute(f"SELECT k, v FROM {self.table}").fetchall()
        finally:
            con.close()
        if not rows:
            return None
        return self.spark.createDataFrame(
            rows, f"{self.key_col} string, {self.value_col} string"
        )


def cached(
    cache: KeyValueCache,
    key_cols: Sequence[str],
    compute: Callable[[DataFrame], DataFrame],
    ttl: int | float | str | None = None,
    now_ms: int | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Memoize a per-key computation (processor_cached.go): rows whose key
    is already in the cache take the cached result; the rest run `compute`
    once per distinct key and are written back. One anti-join + one compute
    over misses — batch-amortized, never per-row. `ttl` bounds each
    memoized entry's life (processor_cached.go's ttl field): an expired key
    recomputes and re-caches."""

    def run(df: DataFrame) -> DataFrame:
        key = cache.key_col
        # unambiguous composite key: each component base64-wrapped (no '|'
        # can appear) with a distinct NULL sentinel — concat_ws alone skips
        # NULLs and doesn't escape the delimiter, so (NULL,'x')/('x',NULL)
        # and ('a|b','c')/('a','b|c') would collide and serve each other's
        # memoized results
        parts = [
            F.coalesce(
                F.base64(F.col(c).cast("string").cast("binary")), F.lit("~null~")
            )
            for c in key_cols
        ]
        keyed = df.withColumn(key, F.concat_ws("|", *parts))
        cur = cache.snapshot(now_ms)
        if cur is not None:
            hits = keyed.join(F.broadcast(cur), key, "inner")
            misses = keyed.join(cur.select(key), key, "left_anti")
        else:
            hits, misses = None, keyed
        computed = compute(misses)
        new_entries = computed.select(key, *[c for c in computed.columns if c not in keyed.columns]).dropDuplicates([key])
        cache.set(new_entries, ttl=ttl, now_ms=now_ms)
        # every miss row takes its key's CANONICAL cached value (the one
        # dropDuplicates selected), not its own per-row compute — otherwise
        # rows of one key disagree within the first run and flip to the
        # cached value on replay (the reference serves one cached result
        # per key, always)
        canonical = misses.join(F.broadcast(new_entries), key, "left")
        out = canonical if hits is None else hits.unionByName(canonical, allowMissingColumns=True)
        return out.drop(key)

    return run


class NoopCache:
    """`noop` backend (/root/reference/internal/impl/pure/cache_noop.go):
    every get misses, writes vanish, `add` accepts everything — the
    reference ships it for benchmarking pipelines with cache interactions
    stubbed out; same purpose here."""

    single_value = True

    def __init__(self, spark: SparkSession, key_col: str = "key",
                 value_col: str = "value"):
        self.spark = spark
        self.key_col, self.value_col = key_col, value_col

    def set(self, df: DataFrame, ttl=None, now_ms=None) -> None:
        pass

    def add(self, df: DataFrame, ttl=None, now_ms=None) -> DataFrame:
        # reference Add returns nil — nothing is ever rejected
        return df.limit(0).select(F.col(self.key_col))

    def delete(self, keys: DataFrame) -> None:
        pass

    def get(self, df: DataFrame, on: str | None = None, broadcast: bool = True,
            now_ms: int | None = None) -> DataFrame:
        return df.withColumn(self.value_col, F.lit(None).cast("string"))

    def snapshot(self, now_ms: int | None = None) -> DataFrame | None:
        return None


class MemoryCache:
    """In-process driver-side cache covering the reference's `memory`,
    `lru` and `ttlru` kinds (cache_memory.go, cache_lru.go:31,
    cache_ttlru.go:15): `cap` entries max, optional `default_ttl`
    (ttlru's 5m default), `init_values` pre-population. Like the
    reference these live and die with the process — restart-survival is
    what the file/sqlite/redis backends are for.

    Scale note: this is CONTROL-PLANE state (≤ cap entries, cap defaults
    to ~1k). `get` broadcasts the snapshot into a left join, so the data
    side never collects; `set`/`add`/`delete` DO collect their input —
    callers feed them key batches, not the data stream (the same
    single-process contract as the reference's in-memory kinds).

    Batch-semantics delta vs the reference, documented: recency for LRU
    eviction advances on WRITES (set/add), not on get — a batch get is
    one join and deliberately never collects the probe side's keys, so
    per-key access order is unobservable. Eviction order is therefore
    least-recently-WRITTEN. The reference's `algorithm` variants
    (arc/two_queues) collapse onto this same write-order policy."""

    single_value = True

    def __init__(self, spark: SparkSession, cap: int | None = None,
                 default_ttl: int | float | str | None = None,
                 init_values: dict | None = None,
                 key_col: str = "key", value_col: str = "value"):
        from collections import OrderedDict

        self.spark = spark
        self.cap = int(cap) if cap else None
        self.default_ttl = default_ttl
        self.key_col, self.value_col = key_col, value_col
        self._d: "OrderedDict[str, tuple[str, int | None]]" = OrderedDict()
        for k, v in (init_values or {}).items():
            self._put(str(k), str(v), None)

    # -- driver-side store ---------------------------------------------------
    def _put(self, k: str, v: str, expires: int | None) -> None:
        self._d[k] = (v, expires)
        self._d.move_to_end(k)
        while self.cap is not None and len(self._d) > self.cap:
            self._d.popitem(last=False)

    def _sweep(self, now: int) -> None:
        dead = [k for k, (_, exp) in self._d.items() if exp is not None and exp <= now]
        for k in dead:
            del self._d[k]

    def _expires(self, ttl, now: int) -> int | None:
        ttl = self.default_ttl if ttl is None else ttl
        return None if ttl is None else now + _ttl_ms(ttl)

    # -- DataFrame contract --------------------------------------------------
    def set(self, df: DataFrame, ttl=None, now_ms=None) -> None:
        now = _now_ms(now_ms)
        self._sweep(now)
        exp = self._expires(ttl, now)
        for r in df.dropDuplicates([self.key_col]).select(
            F.col(self.key_col).cast("string").alias("k"),
            F.col(self.value_col).cast("string").alias("v"),
        ).collect():
            self._put(r.k, r.v, exp)

    def add(self, df: DataFrame, ttl=None, now_ms=None) -> DataFrame:
        now = _now_ms(now_ms)
        self._sweep(now)
        exp = self._expires(ttl, now)
        rejected = []
        for r in df.dropDuplicates([self.key_col]).select(
            F.col(self.key_col).cast("string").alias("k"),
            F.col(self.value_col).cast("string").alias("v"),
        ).collect():
            if r.k in self._d:
                rejected.append((r.k,))
            else:
                self._put(r.k, r.v, exp)
        return self.spark.createDataFrame(rejected, f"{self.key_col} string")

    def delete(self, keys: DataFrame) -> None:
        for r in keys.select(F.col(self.key_col).cast("string").alias("k")).collect():
            self._d.pop(r.k, None)

    def snapshot(self, now_ms: int | None = None) -> DataFrame | None:
        self._sweep(_now_ms(now_ms))
        if not self._d:
            return None
        return self.spark.createDataFrame(
            [(k, v) for k, (v, _) in self._d.items()],
            f"{self.key_col} string, {self.value_col} string",
        )

    def get(self, df: DataFrame, on: str | None = None, broadcast: bool = True,
            now_ms: int | None = None) -> DataFrame:
        cur = self.snapshot(now_ms)
        key = on or self.key_col
        if cur is None:
            return df.withColumn(self.value_col, F.lit(None).cast("string"))
        side = cur.withColumnRenamed(self.key_col, key) if key != self.key_col else cur
        return df.join(F.broadcast(side) if broadcast else side, key, "left")


class MultilevelCache:
    """`multilevel` backend (cache_multilevel.go:108-198): an ordered
    list of child caches. Get resolves shallowest-first and passively
    populates the levels above the hit; Set/Delete write through every
    level; Add rejects a key present at ANY level, otherwise inserts
    everywhere (the reference adds deepest-first then climbs — same
    net outcome, computed set-wise here).

    Batch-semantics delta, documented: the reference promotes only the
    single key each Get touched; a batch get is one broadcast join that
    never observes which probe keys hit, so promotion copies every entry
    a shallower level is missing. Capped in-memory upper levels evict
    their overflow, so the promotion stays bounded by each level's cap."""

    single_value = True

    def __init__(self, levels: Sequence, key_col: str = "key",
                 value_col: str = "value", promote_on_get: bool = True):
        if len(levels) < 2:
            raise ValueError("multilevel cache needs at least two child caches")
        self.levels = list(levels)
        self.spark = self.levels[0].spark
        self.key_col, self.value_col = key_col, value_col
        self.promote = promote_on_get

    def _level_snap(self, i: int, now_ms: int | None) -> DataFrame | None:
        c = self.levels[i]
        s = c.snapshot(now_ms)
        if s is None:
            return None
        return s.select(
            F.col(c.key_col).cast("string").alias(self.key_col),
            F.col(c.value_col).cast("string").alias(self.value_col),
            F.lit(i).alias("_lvl"),
        )

    def _merged(self, now_ms: int | None) -> DataFrame | None:
        """One row per key, shallowest level wins (Get's first-hit order)."""
        snaps = [s for s in (self._level_snap(i, now_ms) for i in range(len(self.levels)))
                 if s is not None]
        if not snaps:
            return None
        allrows = snaps[0]
        for s in snaps[1:]:
            allrows = allrows.unionByName(s)
        w = Window.partitionBy(self.key_col).orderBy(F.asc("_lvl"))
        return (
            allrows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def snapshot(self, now_ms: int | None = None) -> DataFrame | None:
        m = self._merged(now_ms)
        return None if m is None else m.drop("_lvl")

    def get(self, df: DataFrame, on: str | None = None, broadcast: bool = True,
            now_ms: int | None = None) -> DataFrame:
        m = self._merged(now_ms)
        key = on or self.key_col
        if m is None:
            return df.withColumn(self.value_col, F.lit(None).cast("string"))
        m = m.localCheckpoint(eager=True)  # promotion writes below must not re-scan children
        for i in range(len(self.levels) - 1):
            deeper = m.filter(F.col("_lvl") > i).drop("_lvl")
            if self.promote and deeper.limit(1).count():
                self._child_write(i, deeper, "set", None, now_ms)
        side = m.drop("_lvl")
        side = side.withColumnRenamed(self.key_col, key) if key != self.key_col else side
        return df.join(F.broadcast(side) if broadcast else side, key, "left")

    def _child_write(self, i: int, rows: DataFrame, op: str, ttl, now_ms) -> None:
        c = self.levels[i]
        sel = rows.select(
            F.col(self.key_col).alias(c.key_col),
            F.col(self.value_col).alias(c.value_col),
        )
        if op == "set":
            c.set(sel, ttl=ttl, now_ms=now_ms)

    def set(self, df: DataFrame, ttl=None, now_ms=None) -> None:
        sel = df.dropDuplicates([self.key_col]).select(
            F.col(self.key_col).cast("string"), F.col(self.value_col).cast("string")
        ).localCheckpoint(eager=True)  # write-through must not re-evaluate per level
        for i in range(len(self.levels)):
            self._child_write(i, sel, "set", ttl, now_ms)

    def add(self, df: DataFrame, ttl=None, now_ms=None) -> DataFrame:
        fresh = df.dropDuplicates([self.key_col]).select(
            F.col(self.key_col).cast("string"), F.col(self.value_col).cast("string")
        ).localCheckpoint(eager=True)
        cur = self.snapshot(now_ms)
        if cur is None:
            rejected = fresh.limit(0).select(self.key_col)
            accepted = fresh
        else:
            present = cur.select(self.key_col)
            rejected = fresh.join(present, self.key_col, "left_semi").select(self.key_col)
            accepted = fresh.join(present, self.key_col, "left_anti")
            rejected = rejected.localCheckpoint(eager=True)
            accepted = accepted.localCheckpoint(eager=True)
        for i in range(len(self.levels) - 1, -1, -1):  # deepest-first, like the reference
            self._child_write(i, accepted, "set", ttl, now_ms)
        return rejected

    def delete(self, keys: DataFrame) -> None:
        ks = keys.select(F.col(self.key_col).cast("string")).localCheckpoint(eager=True)
        for c in self.levels:
            c.delete(ks.withColumnRenamed(self.key_col, c.key_col))
