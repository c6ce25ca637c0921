"""YAML pipeline compiler tests: batch-vs-stream plan equivalence and the
end-to-end flagship pipeline (generate -> decode features -> window ->
exactly-once sink), mirroring the reference's declarative `bento test`
golden-case style (/root/reference/internal/cli/test/case.go)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bento_spark.plans.compiler import Pipeline, compile_yaml

FLAGSHIP = """
input:
  generate_clips: {count: 256, event_step_ms: 100}
pipeline:
  processors:
    - mapping: |
        root.key = this.codec
    - audio_features: {}
    - bounds_check: {column: bytes, min: 1}
window:
  type: tumbling
  size: 5 seconds
  keys: [key]
  lateness: 2 seconds
  aggs: {n: "count()", total_samples: "sum(n_samples)", avg_rms: "avg(rms)"}
"""


def test_flagship_batch(spark):
    p = compile_yaml(FLAGSHIP)
    out = p.build_batch(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert sum(r.n for r in rows) == 256
    assert all(r.total_samples > 0 for r in rows)
    assert set(out.columns) == {"window_start", "window_end", "key", "n", "total_samples", "avg_rms"}


def test_mapping_filter_processor(spark):
    p = compile_yaml(
        """
input:
  generate_clips: {count: 64}
pipeline:
  processors:
    - mapping: |
        root.is_long = this.dur_ms >= 8000
        root = deleted() if this.codec == "wav"
"""
    )
    out = p.build_batch(spark)
    rows = out.collect()
    assert all(r.codec != "wav" for r in rows)
    assert any(r.is_long for r in rows)  # the skew fixture guarantees one long clip


def test_error_catch_processor(spark):
    p = compile_yaml(
        """
input:
  generate_clips: {count: 30}
pipeline:
  processors:
    - set_error: {when: "this.sr_hz == 8000", message: "low sr"}
    - catch: {set: {sr_hz: "16000"}}
"""
    )
    out = p.build_batch(spark)
    assert out.filter(F.col("error").isNotNull()).count() == 0
    assert out.filter(F.col("sr_hz") == 8000).count() == 0
    assert out.count() == 30


def test_stream_pipeline_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    Pipeline.stage_clips(spark, src, count=128)
    p = compile_yaml(
        f"""
input:
  parquet: {{path: "{src}", max_files_per_trigger: 2}}
pipeline:
  processors:
    - mapping: |
        root.key = this.codec
window:
  type: tumbling
  size: 5 seconds
  keys: [key]
  lateness: 1 second
  aggs: {{n: "count()", total_ms: "sum(dur_ms)"}}
output:
  path: "{tmp_path}/out"
  keys: [window_start, key]
"""
    )
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = p.sink.read(spark)
    batch_golden = compile_yaml(
        """
input:
  generate_clips: {count: 128}
pipeline:
  processors:
    - mapping: |
        root.key = this.codec
window:
  type: tumbling
  size: 5 seconds
  keys: [key]
  aggs: {n: "count()", total_ms: "sum(dur_ms)"}
"""
    ).build_batch(spark)
    # Append-mode emits only watermark-closed windows, and rows arriving
    # behind the watermark (files are discovered in arbitrary event-time
    # order) are dropped as late — so emitted counts are <= batch golden,
    # and every emitted window must exist in the golden set.
    g = {(r.window_start, r.key): (r.n, r.total_ms) for r in batch_golden.collect()}
    emitted = got.collect()
    assert len(emitted) > 0
    for r in emitted:
        gn, gtot = g[(r.window_start, r.key)]
        assert r.n <= gn and r.total_ms <= gtot


def test_session_window_yaml(spark):
    p = compile_yaml(
        """
input:
  generate_clips: {count: 100, event_step_ms: 400}
window:
  type: session
  gap: 1 second
  keys: [codec]
  aggs: {n: "count()"}
"""
    )
    rows = p.build_batch(spark).collect()
    # codecs cycle i%3 -> within a codec, events are 1.2s apart -> every
    # event is its own session (gap 1s)
    assert sum(r.n for r in rows) == 100
    assert all(r.n == 1 for r in rows)
