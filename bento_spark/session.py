"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB design target, then overridable:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  replaces the reference's static `pipeline.threads` worker pool
  (/root/reference/internal/pipeline/pool.go:32-49) with adaptive
  parallelism.
- Arrow on for all pandas UDF exchange; `maxRecordsPerBatch` sized for
  binary audio payloads (a 30 s 44.1 kHz stereo clip is ~5 MB — batches of
  thousands of such rows would blow executor memory, so we cap low and let
  Arrow chunk).
- shuffle partitions default to 2x cores locally; on a real cluster set
  `spark.sql.shuffle.partitions` ~= 2-3x total executor cores or rely on
  AQE coalescing from a high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size for audio-payload UDF stages: keep per-batch memory
# bounded when rows carry multi-MB binary clips.
AUDIO_ARROW_BATCH = 256


def get_spark(
    app_name: str = "bento-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    cores = _parse_local_cores(master)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8) if cores else 200

    # Large binary rows (multi-MB audio clips) allocate multi-MB byte[]s at
    # a very high rate. Two measured pathologies at >=24 concurrent tasks:
    # (a) G1's humongous-object path (region commit/uncommit churn) showed
    #     ~4x wall-time inflation on binary-column scans — ParallelGC with a
    #     fixed pre-touched heap removed it (9.4s -> 2.6s scan at local[32]);
    # (b) glibc routes >128 KiB mallocs straight to mmap/munmap, serializing
    #     all JVM/Python threads on the process mmap lock — raising the
    #     malloc mmap threshold keeps the churn in userspace arenas.
    # Both only matter for high-core single-host runs (our two-parallelism
    # evidence); on a real cluster each executor JVM is small and per-node
    # concurrency is modest, but the settings are safe there too.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "134217728")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "134217728")
    # Arrow's bundled jemalloc madvises aggressively (MADV_FREE/THP hints);
    # under this VM's kernel that showed up as khugepaged/page-reclaim system
    # time during Arrow-heavy stages. The plain system allocator measured
    # equal-or-faster with far lower variance.
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    driver_mem = (extra_conf or {}).get(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    )
    gc_opts = f"-XX:+UseParallelGC -Xms{driver_mem}"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(max(cores or 8, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(AUDIO_ARROW_BATCH))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Constraint propagation is O(width^2)-ish on wide plans: the
        # 64-aggregate minhash/simhash signature plans spent 3-7s PER QUERY
        # in driver-side planning on it (measured: minhash sig subplan
        # 0.61s -> 0.05s to plan; full simhash construct 10.1s -> 3.0s).
        # Planning cost is driver-side and identical on a real cluster —
        # and streaming micro-batches re-plan every batch, so it compounds.
        # Constraints never change results, only inferred filters; the
        # full oracle suite + bench A/B showed no execution regression.
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.extraJavaOptions", gc_opts)
        .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL", "system")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        # Streaming state store: RocksDB scales state beyond heap (the
        # clip<->transcript join at 10^12-clip scale holds watermark-bounded
        # state far larger than executor memory).
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
        # The idempotent sink intentionally SKIPS re-executing a micro-batch
        # whose commit marker exists (replay after a crash between marker and
        # Spark's commit log): state for that batch was fully committed by
        # the first attempt, so skipping is state-consistent. Spark 4.1's
        # per-batch commit-count validation can't see that and would kill the
        # query on the (correct) skip.
        .config("spark.sql.streaming.stateStore.commitValidation.enabled", "false")
        # base64() otherwise MIME-chunks at 76 chars with CRLF (RFC 2045
        # legacy) — corrupts JWTs/base64url past 57 input bytes. Codec
        # helpers in bloblang also strip CRLF defensively for sessions not
        # built here.
        .config("spark.sql.chunkBase64String.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _parse_local_cores(master: str) -> int | None:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return None
    return None


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
