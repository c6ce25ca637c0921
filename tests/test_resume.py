"""North-rule resume semantics: a windowed aggregation stopped mid-stream
and resumed from its checkpoint emits EXACTLY the rows an uninterrupted
run emits (no duplicates, no loss, identical values), and a streaming
session window closes on watermark."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bento_spark.audio.generate import clips_df
from bento_spark.streaming.sink import IdempotentParquetSink
from bento_spark.streaming.windows import session_windowed, tumbling_windowed

SCHEMA = "clip_id string, dur_ms int, codec string, event_ts timestamp"


def _agg(stream):
    return tumbling_windowed(
        stream,
        "event_ts",
        "5 seconds",
        ["codec"],
        {"n": F.count(F.lit(1)), "total_ms": F.sum("dur_ms")},
        allowed_lateness="1 second",
    )


def _drain(spark, src, ckpt, sink):
    s = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        _agg(s)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink.foreach_batch())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_window_agg_resume_identical_to_single_run(spark, tmp_path):
    base = clips_df(spark, 200, partitions=1).select("clip_id", "dur_ms", "codec", "event_ts")
    part1 = base.filter(F.col("clip_id") < "clip-000000000120")
    part2 = base.filter(F.col("clip_id") >= "clip-000000000120")

    # interrupted run: drain part1, "crash", add part2, resume same checkpoint
    src_a = str(tmp_path / "a")
    os.makedirs(src_a)
    part1.coalesce(2).write.parquet(src_a + "/p1")
    sink_a = IdempotentParquetSink(str(tmp_path / "out_a"), key_cols=["window_start", "codec"])
    _drain(spark, src_a, str(tmp_path / "ckpt_a"), sink_a)
    part2.coalesce(2).write.parquet(src_a + "/p2")
    _drain(spark, src_a, str(tmp_path / "ckpt_a"), sink_a)

    # uninterrupted run over the full input
    src_b = str(tmp_path / "b")
    os.makedirs(src_b)
    base.coalesce(2).write.parquet(src_b + "/p1")
    sink_b = IdempotentParquetSink(str(tmp_path / "out_b"), key_cols=["window_start", "codec"])
    _drain(spark, src_b, str(tmp_path / "ckpt_b"), sink_b)

    a = {(r.window_start, r.codec): (r.n, r.total_ms) for r in sink_a.read(spark).collect()}
    b = {(r.window_start, r.codec): (r.n, r.total_ms) for r in sink_b.read(spark).collect()}
    assert len(a) > 0
    assert a == b  # identical output rows under exactly-once (north rule)


def test_session_window_streaming_closes_on_watermark(spark, tmp_path):
    # two bursts 100ms apart within each, separated by a 60s gap: two sessions
    base = clips_df(spark, 80, partitions=1).select("clip_id", "dur_ms", "codec", "event_ts")
    burst2 = base.filter(F.col("clip_id") >= "clip-000000000040").withColumn(
        "event_ts", F.col("event_ts") + F.expr("INTERVAL 60 SECONDS")
    )
    burst1 = base.filter(F.col("clip_id") < "clip-000000000040")
    src = str(tmp_path / "src")
    os.makedirs(src)
    burst1.coalesce(1).write.parquet(src + "/p1")
    burst2.coalesce(1).write.parquet(src + "/p2")

    s = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    # streaming session windows require a grouping key (Spark rejects global
    # session aggregation on streams) — key by codec
    sess = session_windowed(
        s, "event_ts", "10 seconds", ["codec"], {"n": F.count(F.lit(1))}, allowed_lateness="1 second"
    )
    sink = IdempotentParquetSink(str(tmp_path / "out"))
    q = (
        sess.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink.foreach_batch())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sink.read(spark).collect()
    # append mode emits only watermark-closed sessions: the first burst's
    # per-codec sessions (closed by the 60s jump); the second burst stays open
    assert len(rows) == 3  # one session per codec
    assert sum(r.n for r in rows) == 40
