#!/usr/bin/env bash
# spark-submit wrapper for single-host runs.
#
# get_spark() sets spark.driver.extraJavaOptions, but under spark-submit the
# driver JVM is ALREADY RUNNING when that conf is read, so the GC fixes
# silently don't apply — and the default G1 + transparent-huge-page churn on
# multi-MB audio byte[] rows has produced GC-thread segfaults
# (StubRoutines arraycopy, SIGSEGV) on this host. Pass the flags at launch.
set -euo pipefail
MASTER="${SPARK_GRAFT_MASTER:-local[${SPARK_GRAFT_CPUS:-8}]}"
MEM="${SPARK_GRAFT_DRIVER_MEM:-24g}"
export MALLOC_MMAP_THRESHOLD_=134217728 MALLOC_TRIM_THRESHOLD_=134217728
export ARROW_DEFAULT_MEMORY_POOL=system
cd "$(dirname "$0")/.."
python tools/build_pyfiles.py >/dev/null
exec spark-submit \
  --master "$MASTER" \
  --driver-memory "$MEM" \
  --driver-java-options "-XX:+UseParallelGC -Xms${MEM}" \
  --py-files dist/bento_spark.zip \
  jobs/run_pipeline.py "$@"
