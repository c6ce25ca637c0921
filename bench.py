"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": ..., "clips_per_sec": ...}

The audio pipeline benchmark (generate -> decode/features -> window) scales
its clip count with SPARK_GRAFT_BENCH_CLIPS (default 8000); clips/sec from
that stage is the north-rule throughput metric. Two-parallelism scaling
evidence is produced by tools/scaling_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from bento_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "lookup_join",
    "multi_join",
    "tumbling_window",
    "sliding_window",
    "session_window",
    "text_stats",
    "dedupe_exact",
    "minhash_lsh",
    "simhash",
    "ann_cosine",
    "embedding_norms",
    "parse_log",
    "asof_join",
    "rollup_agg",
    "workflow_dag",
    "mapping_pipeline",
    "cep_funnel",
    "tar_roundtrip",
    "chunker_scan",
    "audio_features_window",
    "clip_transcript_join",
]


def _force(df) -> int:
    """Execute the full plan without collecting results to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_clips = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", "8000"))
    entrymod._AUDIO_N = n_clips  # scale the audio benchmark stage

    spark = get_spark(app_name="bento-spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the JVM (codegen, AQE, parquet reader) AND the Python workers
    # (daemon fork + numpy/pandas import) so per-query numbers measure the
    # engine, not first-call compilation — embedding_norms is the cheapest
    # Arrow/pandas-UDF query, multi_join/text_stats cover the JVM paths
    _force(qs["multi_join"](spark, sf_dir))
    _force(qs["text_stats"](spark, sf_dir))
    _force(qs["embedding_norms"](spark, sf_dir))

    timings: dict[str, float] = {}
    audio_secs = 0.0
    for name in HEADLINE:
        fn = qs[name]
        # best-of-2: this host's kernel-path stalls come in multi-minute
        # phases (BENCH/ROUND3_NOTES.md) — a single timed pass can be 2x
        # off; min-of-2 is the same estimator the scaling bench declares
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            dt = min(dt, time.perf_counter() - t0)
        timings[name] = round(dt, 3)
        if name in ("audio_features_window", "clip_transcript_join"):
            audio_secs += dt

    total = round(sum(timings.values()), 3)
    clips_per_sec = round(2 * n_clips / audio_secs, 1) if audio_secs else None
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline query suite wall time (audio decode+window+join, windows, dedupe, ANN, TPC-H-ish relational)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "clips_per_sec": clips_per_sec,
                "bench_clips": n_clips,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
