"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": ..., "clips_per_sec": ...,
   "reliability": "ok"|"degraded", ...}

The audio pipeline benchmark (generate -> decode/features -> window) scales
its clip count with SPARK_GRAFT_BENCH_CLIPS (default 8000); clips/sec from
that stage is the north-rule throughput metric. Two-parallelism scaling
evidence is produced by tools/scaling_bench.py -> BENCH/BASELINE.md.

SELF-ADJUDICATION (VERDICT r04 'What's wrong' #1): this host's kernel-path
stalls come in multi-minute phases that made past driver readings swing
2-9x on identical code, requiring forensic dossiers to adjudicate. The
harness now defends itself:
- records 1/5/15-min loadavg at start/end, and waits (<=60s) for load to
  drop below 3 before starting;
- runs a ~100ms single-threaded numpy-FFT microprobe around every timed
  pass; a probe >3x the session's best marks that pass DEGRADED;
- each query is best-of-3 (was 2), with a 5s spacing retry after any
  degraded pass so a stall phase can clear;
- a query whose passes were ALL degraded lands in `unreliable_queries`,
  and the headline carries `reliability: degraded` when any did — the
  artifact adjudicates itself.
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

_PROBE_DEGRADED_FACTOR = 3.0
_LOAD_GATE = 3.0


def _force(df) -> int:
    """Execute the full plan without collecting results to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _microprobe() -> float:
    """~100ms single-threaded CPU probe (numpy rfft, fixed input): its
    wall time tracks the host's kernel-path stall phases independently of
    Spark. Returns milliseconds."""
    import numpy as np

    x = np.linspace(0.0, 1.0, 1 << 17)  # deterministic input
    t0 = time.perf_counter()
    for _ in range(30):
        np.fft.rfft(x)
    return (time.perf_counter() - t0) * 1000.0


def _loadavg() -> list[float]:
    try:
        return [round(v, 2) for v in os.getloadavg()]
    except OSError:  # platform without getloadavg
        return []


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_clips = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", "8000"))
    entrymod._AUDIO_N = n_clips  # scale the audio benchmark stage

    # don't start into a visibly-busy host: wait (bounded) for other
    # work's loadavg to decay below the gate, then record what we saw
    load_start = _loadavg()
    waited_s = 0.0
    while load_start and load_start[0] > _LOAD_GATE and waited_s < 60:
        time.sleep(5)
        waited_s += 5
        load_start = _loadavg()

    best_probe = _microprobe()
    best_probe = min(best_probe, _microprobe())

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
    unreliable: list[str] = []
    audio_secs = 0.0
    for name in HEADLINE:
        fn = qs[name]
        dt = float("inf")
        degraded_passes = 0
        for i in range(3):
            p0 = _microprobe()
            best_probe = min(best_probe, p0)
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            run = time.perf_counter() - t0
            p1 = _microprobe()
            best_probe = min(best_probe, p1)
            degraded = min(p0, p1) > _PROBE_DEGRADED_FACTOR * best_probe
            if not degraded:
                dt = min(dt, run)
            else:
                degraded_passes += 1
                if i < 2:
                    time.sleep(5)  # let the stall phase clear
        if dt == float("inf"):
            # every pass ran under a degraded probe: report the best
            # reading anyway, flagged — the artifact self-adjudicates
            dt = run
            unreliable.append(name)
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
                "reliability": "degraded" if unreliable else "ok",
                "unreliable_queries": unreliable,
                "load_start": load_start,
                "load_end": _loadavg(),
                "load_wait_s": waited_s,
                "probe_best_ms": round(best_probe, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
