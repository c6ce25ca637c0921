"""applyInPandasWithState operators: running counter & batch policy, plus
the STFT spectral feature stage."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bento_spark.audio.generate import clips_df
from bento_spark.audio.udfs import with_normalized_clip, with_spectrogram_features
from bento_spark.streaming.sink import IdempotentParquetSink
from bento_spark.streaming.stateful import batch_policy, running_counter


@pytest.fixture()
def kv_stream_dir(spark, tmp_path):
    """Two parquet files of keyed rows, streamed one file per trigger so the
    stateful op sees two micro-batches."""
    d = str(tmp_path / "src")
    rows1 = [(f"k{i % 3}", f"v{i}") for i in range(9)]
    rows2 = [(f"k{i % 3}", f"w{i}") for i in range(6)]
    spark.createDataFrame(rows1, ["key", "payload"]).coalesce(1).write.parquet(d + "/p1")
    spark.createDataFrame(rows2, ["key", "payload"]).coalesce(1).write.parquet(d + "/p2")
    return d


def _run_stream(spark, df, sink_path, ckpt):
    sink = IdempotentParquetSink(sink_path)
    q = (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink.foreach_batch())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sink


def test_running_counter_persists_across_batches(spark, kv_stream_dir, tmp_path):
    s = (
        spark.readStream.schema("key string, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(kv_stream_dir + "/p*")
    )
    counted = running_counter(s, "key")
    sink = _run_stream(spark, counted, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    rows = sink.read(spark).collect()
    # per key: two emissions (one per micro-batch) with a monotone counter
    per_key = {}
    for r in rows:
        per_key.setdefault(r.key, []).append((r.counter_start, r.counter_end, r.n_rows))
    assert set(per_key) == {"k0", "k1", "k2"}
    for key, ems in per_key.items():
        ems.sort()
        total = ems[-1][1]
        assert total == 5  # 3 rows in batch 1 + 2 in batch 2
        # counter continuity: next start == previous end
        for (s0, e0, _), (s1, e1, _) in zip(ems, ems[1:]):
            assert s1 == e0


def test_batch_policy_count_flush(spark, kv_stream_dir, tmp_path):
    s = (
        spark.readStream.schema("key string, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(kv_stream_dir + "/p*")
    )
    batched = batch_policy(s, "key", "payload", max_count=2)
    sink = _run_stream(spark, batched, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    rows = sink.read(spark).collect()
    # 5 rows/key with max_count=2 -> 2 full flushes per key (5th row pends)
    per_key = {}
    for r in rows:
        per_key.setdefault(r.key, []).append(r)
    for key, batches in per_key.items():
        assert len(batches) == 2
        assert all(b.n_parts == 2 for b in batches)
        seqs = sorted(b.batch_seq for b in batches)
        assert seqs == [0, 1]
        for b in batches:
            assert len(b.payload.split("\n")) == 2


def test_batch_policy_check_trigger(spark, tmp_path):
    """Bloblang `check` content trigger (policy.go Add's check query,
    trigger order count -> bytes -> check -> period): a row satisfying the
    predicate flushes the accumulating batch mid-interval, regardless of
    the count threshold."""
    d = str(tmp_path / "src")
    # one key, 7 rows; rows v2 and v5 carry the flush marker
    rows = [("k", f"v{i}" + ("!END" if i in (2, 5) else "")) for i in range(7)]
    spark.createDataFrame(rows, ["key", "payload"]).coalesce(1).write.parquet(d + "/p1")
    s = spark.readStream.schema("key string, payload string").parquet(d + "/p*")
    batched = batch_policy(
        s, "key", "payload", max_count=100,
        check='this.payload.contains("!END")',
    )
    sink = _run_stream(spark, batched, str(tmp_path / "out_c"), str(tmp_path / "ckpt_c"))
    got = sorted(sink.read(spark).collect(), key=lambda r: r.batch_seq)
    # flushes at v2!END (3 parts) and v5!END (3 parts); v6 stays pending
    assert [(r.batch_seq, r.n_parts) for r in got] == [(0, 3), (1, 3)]
    assert got[0].payload.split("\n") == ["v0", "v1", "v2!END"]
    assert got[1].payload.split("\n") == ["v3", "v4", "v5!END"]


def test_batch_policy_check_trigger_order(spark, tmp_path):
    """check composes with count (reference cascade): max_count=2 flushes
    (v0,v1) before the marker row arrives, so the marker then flushes a
    batch of its own — both triggers active in one policy."""
    d = str(tmp_path / "src2")
    rows = [("k", "v0"), ("k", "v1"), ("k", "v2!END"), ("k", "v3")]
    spark.createDataFrame(rows, ["key", "payload"]).coalesce(1).write.parquet(d + "/p1")
    s = spark.readStream.schema("key string, payload string").parquet(d + "/p*")
    batched = batch_policy(
        s, "key", "payload", max_count=2, check='this.payload.contains("!END")'
    )
    sink = _run_stream(spark, batched, str(tmp_path / "out_o"), str(tmp_path / "ckpt_o"))
    got = sorted(sink.read(spark).collect(), key=lambda r: r.batch_seq)
    # batch 0: count flush (v0,v1); batch 1: check flush (v2!END alone)
    assert [(r.batch_seq, r.payload) for r in got] == [(0, "v0\nv1"), (1, "v2!END")]


def test_spectrogram_features_deterministic(spark):
    clips = clips_df(spark, 48, partitions=2)
    out = with_spectrogram_features(clips).select(
        "clip_id", "n_samples", "rms", "n_frames", "band_mean", "band_std"
    )
    rows = {r.clip_id: r for r in out.collect()}
    assert len(rows) == 48
    r0 = rows["clip-000000000000"]
    assert r0.n_frames >= 1 and len(r0.band_mean) == 16 and len(r0.band_std) == 16
    assert all(np.isfinite(v) for v in r0.band_mean)
    # deterministic across runs (exactly-once identity depends on this)
    rows2 = {r.clip_id: r for r in out.collect()}
    assert np.allclose(rows["clip-000000000007"].band_mean, rows2["clip-000000000007"].band_mean)
    # energy concentrated in low bands for sinusoidal content (<3.5 kHz)
    assert float(np.argmax(r0.band_mean)) <= 4


def test_normalized_clip_emit_features(spark):
    clips = clips_df(spark, 24, partitions=2)
    out = with_normalized_clip(clips, target_sr=16000, keep_payload=False, emit_features=True)
    rows = out.collect()
    assert len(rows) == 24
    assert "bytes" not in out.columns
    for r in rows:
        assert r.norm_sr_hz == 16000 and r.norm_codec == "pcm_s16le"
        # peak-normalized to 0.95 (int16 quantized)
        assert 0.90 <= r.peak <= 0.96
        # resample preserves duration: n_samples ~= dur_ms * 16
        assert abs(r.n_samples - r.dur_ms * 16) <= 16 + r.dur_ms * 16 * 0.01


def test_streaming_dedupe_within_watermark(spark, tmp_path):
    """dedupe processor in streaming mode (dropDuplicatesWithinWatermark —
    the scalable analogue of the reference's TTL'd cache dedupe,
    processor_dedupe.go:81)."""
    from bento_spark.operators.grouping import dedupe

    src = str(tmp_path / "src")
    base = clips_df(spark, 40, partitions=1).select("clip_id", "dur_ms", "event_ts")
    dup = base.limit(15)  # re-deliver the first 15 (at-least-once replay)
    base.coalesce(1).write.parquet(src + "/p1")
    dup.coalesce(1).write.parquet(src + "/p2")

    s = (
        spark.readStream.schema("clip_id string, dur_ms int, event_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/p*")
    )
    out = dedupe(s, ["clip_id"], watermark=("event_ts", "10 minutes"))
    sink = IdempotentParquetSink(str(tmp_path / "out"))
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink.foreach_batch())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sink.read(spark)
    assert got.count() == 40  # duplicates dropped across micro-batches
    assert got.select("clip_id").distinct().count() == 40
