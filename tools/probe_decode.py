"""Tune the decode stage: variants x parallelism on ONE shared input."""

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
from bento_spark.audio.udfs import with_audio_features
from bento_spark.streaming.windows import tumbling_windowed

cores = int(sys.argv[1]); src = sys.argv[2]; arrow = int(sys.argv[3]); mem = sys.argv[4]
spark = get_spark(app_name=f"probe-{cores}", master=f"local[{cores}]",
                  extra_conf={
                      "spark.driver.memory": mem,
                      "spark.sql.execution.arrow.maxRecordsPerBatch": str(arrow),
                      "spark.executorEnv.OMP_NUM_THREADS": "1",
                      "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
                      "spark.executorEnv.MKL_NUM_THREADS": "1",
                  })
spark.sparkContext.setLogLevel("ERROR")
# warm python workers
with_audio_features(spark.read.parquet(src).limit(256)).write.format("noop").mode("overwrite").save()

t0 = time.perf_counter()
feats = with_audio_features(spark.read.parquet(src))
agg = tumbling_windowed(feats, "event_ts", "10 seconds", ["codec"],
    {"n": F.count(F.lit(1)), "avg_rms": F.avg("rms"), "total_samples": F.sum("n_samples")})
agg.write.format("noop").mode("overwrite").save()
print(json.dumps({"sec": round(time.perf_counter() - t0, 2)}))
spark.stop()
"""

GEN = r"""
import sys
sys.path.insert(0, "/root/repo")
from bento_spark.session import get_spark
from bento_spark.audio.generate import clips_df
spark = get_spark(app_name="gen", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
clips_df(spark, int(sys.argv[2]), partitions=64).write.mode("overwrite").parquet(sys.argv[1])
spark.stop()
"""


def run(args: list[str], code: str) -> str:
    out = subprocess.run([sys.executable, "-c", code] + args,
                         capture_output=True, text=True, timeout=1800, cwd=REPO)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-3000:])
    return out.stdout


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    src = "/tmp/probe_shared_src"
    import os
    if not os.path.exists(src + "/_SUCCESS"):
        run([src, str(n)], GEN)
        print("input materialized")
    for arrow, mem in [(256, "8g"), (1024, "32g")]:
        for cores in (8, 32):
            o = run([str(cores), src, str(arrow), mem], CHILD)
            sec = json.loads([l for l in o.splitlines() if l.startswith("{")][-1])["sec"]
            print(f"cores={cores:2d} arrow={arrow:5d} mem={mem}: {sec:7.2f}s  {n/sec:8.1f} clips/s")
