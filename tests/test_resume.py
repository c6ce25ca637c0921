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


def test_stream_stream_left_outer_join_emits_nulls(spark, tmp_path):
    """leftOuter stream-stream join: unmatched left rows emit with NULL
    right side once the watermark passes (reference never had outer joins —
    the cache-hydration pattern silently drops misses; we exceed it)."""
    from bento_spark.streaming.joins import stream_stream_join

    base = clips_df(spark, 60, partitions=1)
    clipside = base.select("clip_id", "dur_ms", "event_ts")
    # transcripts only for clip ids NOT divisible by 3
    tsside = base.filter(F.substring("clip_id", -2, 2).cast("int") % 3 != 0).select(
        "clip_id",
        "transcript",
        (F.col("event_ts") + F.expr("INTERVAL 1 SECOND")).alias("t_event_ts"),
    )
    cdir, tdir = str(tmp_path / "c"), str(tmp_path / "t")
    clipside.coalesce(1).write.parquet(cdir + "/p1")
    tsside.coalesce(1).write.parquet(tdir + "/p1")
    # sentinel rows 10 min later in a SECOND micro-batch: outer-join NULLs
    # are emitted only once the (min-of-both-sides) watermark passes the
    # join bound, which needs later event time on both inputs
    far = F.col("event_ts") + F.expr("INTERVAL 600 SECONDS")
    base.limit(1).select(F.lit("sentinel-c").alias("clip_id"), "dur_ms", far.alias("event_ts")).coalesce(1).write.parquet(cdir + "/p2")
    base.limit(1).select(F.lit("sentinel-t").alias("clip_id"), "transcript", far.alias("t_event_ts")).coalesce(1).write.parquet(tdir + "/p2")
    cs = (
        spark.readStream.schema("clip_id string, dur_ms int, event_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(cdir + "/p*")
    )
    ts = (
        spark.readStream.schema("clip_id string, transcript string, t_event_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(tdir + "/p*")
    )
    joined = stream_stream_join(cs, ts, watermark="2 seconds", max_lag="5 seconds", how="leftOuter")
    sink = IdempotentParquetSink(str(tmp_path / "out"))
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink.foreach_batch())
        .trigger(availableNow=True)
        .start()
    )
    # assert the availableNow run actually finished — a bare awaitTermination
    # that times out on a cold/contended JVM falls through to an empty sink
    # and reports a false failure
    assert q.awaitTermination(300), "availableNow query did not finish in 300s"
    rows = {
        r.clip_id: r.transcript
        for r in sink.read(spark).collect()
        if not r.clip_id.startswith("sentinel")
    }
    matched = [c for c, t in rows.items() if t is not None]
    unmatched = [c for c, t in rows.items() if t is None]
    assert len(matched) > 0 and len(unmatched) > 0
    # every unmatched id is one of the withheld (divisible-by-3) clips
    for c in unmatched:
        assert int(c[-2:]) % 3 == 0


def test_tumbling_window_offset_alignment(spark):
    """window `offset` (reference buffer_system_window.go offset field) maps
    to F.window startTime: boundaries shift by the offset."""
    df = clips_df(spark, 100, partitions=1)
    plain = tumbling_windowed(df, "event_ts", "10 seconds", [], {"n": F.count(F.lit(1))})
    shifted = tumbling_windowed(df, "event_ts", "10 seconds", [], {"n": F.count(F.lit(1))}, offset="3 seconds")
    p0 = sorted(r.window_start for r in plain.collect())[0]
    s0 = sorted(r.window_start for r in shifted.collect())[0]
    assert (s0.second - p0.second) % 10 == 3
    assert sum(r.n for r in shifted.collect()) == 100


def test_parquet_sink_append_crash_window_replay(spark, tmp_path):
    """The append-crash window: a crash AFTER the data write but BEFORE the
    commit marker must not duplicate rows on replay (the replayed epoch
    overwrites its own _bid dir), and the uncommitted epoch must stay
    invisible to read() until its marker lands."""
    sink = IdempotentParquetSink(str(tmp_path / "crashy"))  # append mode, no keys
    batch = spark.createDataFrame([(i, f"r{i}") for i in range(10)], ["i", "s"])

    sink.write_batch(batch, 0)
    sink.write_batch(batch, 1)
    # simulate the crash window for epoch 1: data written, marker lost
    os.remove(sink._marker(1))
    assert sink.committed_ids() == [0]
    assert sink.read(spark).count() == 10  # uncommitted epoch invisible

    sink.write_batch(batch, 1)  # checkpoint replays the same epoch id
    assert sink.committed_ids() == [0, 1]
    assert sink.read(spark).count() == 20  # exactly one copy of each epoch
    assert sink.output_sent() == 20


def test_stale_marker_different_incarnation_overwritten(spark, tmp_path):
    """A commit marker left by an EARLIER pipeline incarnation (different
    checkpoint => different query id) must not swallow the new run's
    epoch-0 batch; within the SAME incarnation the marker still skips."""
    import json

    from bento_spark.audio.generate import clips_df
    from bento_spark.streaming.sink import IdempotentParquetSink

    out = str(tmp_path / "out")
    ck = tmp_path / "ck"
    ck.mkdir()
    (ck / "metadata").write_text(json.dumps({"id": "new-incarnation"}))
    # simulate the old incarnation's epoch-0 marker
    stale = IdempotentParquetSink(out)
    (tmp_path / "out" / "commits" / "0").write_text(
        json.dumps({"epoch": 0, "rows": 999, "qid": "old-incarnation"})
    )
    # ...including HIGHER epochs the new (shorter) run never reaches: they
    # must be purged, not mixed into read()
    (tmp_path / "out" / "commits" / "7").write_text(
        json.dumps({"epoch": 7, "rows": 5, "qid": "old-incarnation"})
    )
    sink = IdempotentParquetSink(out, checkpoint=str(ck))
    df = clips_df(spark, 10, partitions=1)
    sink.write_batch(df, 0)
    assert sink.read(spark).count() == 10  # overwrote the stale epoch
    assert sink._marker_qid(0) == "new-incarnation"
    assert sink.committed_ids() == [0]  # foreign epoch 7 swept
    # same incarnation replay: skipped (marker untouched, rows unchanged)
    sink.write_batch(df.limit(3), 0)
    assert sink.read(spark).count() == 10
