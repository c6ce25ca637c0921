"""Diagnose which stage fails to scale 8 -> 32 cores.

Stages measured separately on identical input:
  gen    : clips_df(mapInPandas synthesis) -> noop
  write  : clips_df -> parquet (materialize input once per level dir)
  decode : read parquet -> with_audio_features -> noop
  window : read parquet -> features -> tumbling window agg -> noop
"""

from __future__ import annotations

import json
import subprocess
import sys

REPO = "/root/repo"

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from bento_spark.session import get_spark
from bento_spark.audio.generate import clips_df, CLIP_SCHEMA
from bento_spark.audio.udfs import with_audio_features
from bento_spark.streaming.windows import tumbling_windowed

cores = int(sys.argv[1]); n = int(sys.argv[2]); src = sys.argv[3]
spark = get_spark(app_name=f"probe-{cores}", master=f"local[{cores}]",
                  extra_conf={"spark.driver.memory": "48g"})
spark.sparkContext.setLogLevel("ERROR")
clips_df(spark, 256, partitions=cores).write.format("noop").mode("overwrite").save()
res = {"cores": cores}

t0 = time.perf_counter()
clips_df(spark, n, partitions=4 * cores).write.format("noop").mode("overwrite").save()
res["gen"] = round(time.perf_counter() - t0, 2)

t0 = time.perf_counter()
clips_df(spark, n, partitions=4 * cores).write.mode("overwrite").parquet(src)
res["write"] = round(time.perf_counter() - t0, 2)

t0 = time.perf_counter()
with_audio_features(spark.read.parquet(src)).write.format("noop").mode("overwrite").save()
res["decode"] = round(time.perf_counter() - t0, 2)

t0 = time.perf_counter()
feats = with_audio_features(spark.read.parquet(src))
agg = tumbling_windowed(feats, "event_ts", "10 seconds", ["codec"],
    {"n": F.count(F.lit(1)), "avg_rms": F.avg("rms"), "total_samples": F.sum("n_samples")})
agg.write.format("noop").mode("overwrite").save()
res["window"] = round(time.perf_counter() - t0, 2)
print(json.dumps(res))
spark.stop()
"""


def run(cores: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(n), f"/tmp/probe_src_{cores}"],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-3000:])
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    lo = run(8, n)
    hi = run(32, n)
    print(json.dumps({"local8": lo, "local32": hi}))
    for k in ("gen", "write", "decode", "window"):
        print(f"{k:8s} 8c={lo[k]:7.2f}s 32c={hi[k]:7.2f}s speedup={lo[k]/hi[k]:.2f}x eff={(lo[k]/hi[k])/4:.2f}")
