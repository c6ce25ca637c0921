"""Two-parallelism scaling evidence for the north rule (N vs 4N executors,
efficiency >= 0.8), sandbox proxy: the same flagship pipeline at local[8]
and local[32] on identical input.

Pipeline measured: deterministic clips generation -> vectorized decode +
feature extraction (Arrow batches) -> tumbling window aggregation keyed by
codec -> (stream-stream join of clip & transcript sides). Throughput =
clips/sec. Each parallelism level runs in a fresh subprocess (a JVM cannot
change master), results land in BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [n_clips]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bento_spark.session import get_spark
from bento_spark.audio.generate import clips_df
from bento_spark.audio.udfs import with_audio_features
from bento_spark.streaming.windows import tumbling_windowed
from bento_spark.streaming.joins import stream_stream_join

cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]")
spark.sparkContext.setLogLevel("ERROR")

# warm the JVM/Arrow paths so we time steady-state throughput
clips_df(spark, 256, partitions=cores).write.format("noop").mode("overwrite").save()

t0 = time.perf_counter()
clips = clips_df(spark, n, partitions=4 * cores)
feats = with_audio_features(clips)
agg = tumbling_windowed(
    feats, "event_ts", "10 seconds", ["codec"],
    {{"n": F.count(F.lit(1)), "avg_rms": F.avg("rms"), "total_samples": F.sum("n_samples")}},
)
agg.write.format("noop").mode("overwrite").save()
dt = time.perf_counter() - t0
print(json.dumps({{"cores": cores, "n_clips": n, "sec": round(dt, 3),
                   "clips_per_sec": round(n / dt, 1)}}))
spark.stop()
"""


def run_level(cores: int, n_clips: int) -> dict:
    code = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_clips)],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(f"child failed (cores={cores}):\n{out.stderr[-3000:]}")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    lo = run_level(8, n_clips)
    hi = run_level(32, n_clips)
    eff = (hi["clips_per_sec"] / lo["clips_per_sec"]) / 4
    report = {
        "n_clips": n_clips,
        "local8": lo,
        "local32": hi,
        "speedup_8_to_32": round(hi["clips_per_sec"] / lo["clips_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "pass_ge_0.8": eff >= 0.8,
    }
    print(json.dumps(report))
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — two-parallelism scaling evidence

North rule: throughput scaling efficiency >= 0.8 between cluster sizes N
and 4N. Sandbox proxy (no real cluster available): the same job — clip
generation -> vectorized audio decode + features (Arrow batches) ->
tumbling window agg keyed by codec — on identical input (n_clips =
{n_clips}, deterministic seed 42) at local[8] vs local[32].

| parallelism | wall sec | clips/sec |
|---|---|---|
| local[8]  (N)  | {lo['sec']} | {lo['clips_per_sec']} |
| local[32] (4N) | {hi['sec']} | {hi['clips_per_sec']} |

- speedup 8->32 cores: **{report['speedup_8_to_32']}x** (ideal 4x)
- scaling efficiency: **{report['scaling_efficiency']}** (threshold 0.8) -> {"PASS" if report['pass_ge_0.8'] else "FAIL"}

Measured {datetime.now(timezone.utc).isoformat(timespec='seconds')} on local mode,
{os.cpu_count()} host cores. Partitions = 4x cores at each level so both
levels have identical work granularity; AQE on; decode stage is
numpy-over-Arrow with no per-row Python.
"""
        )
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
