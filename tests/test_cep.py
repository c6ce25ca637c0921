"""CEP sequence matching: batch semantics (first-match, within-from-start,
boundaries) and the streaming twin's equivalence across micro-batches."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from bento_spark.plans.compiler import compile_yaml
from bento_spark.streaming.cep import duration_ms, match_sequence, match_sequence_stream


def _ts(s: float):
    return datetime.utcfromtimestamp(1_700_000_000 + s)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(s), t) for u, s, t in rows], ["user_id", "ts", "event_type"]
    )


def STEPS():  # built lazily: F.col needs an active session in classic mode
    return [F.col("event_type") == t for t in ("A", "B", "C")]


NAMES = ["a", "b", "c"]


def test_duration_parser():
    assert duration_ms("500 ms") == 500
    assert duration_ms("60 seconds") == 60_000
    assert duration_ms("2 minutes") == 120_000
    assert duration_ms("72 hours") == 259_200_000
    with pytest.raises(ValueError, match="bad duration"):
        duration_ms("fortnight")


def test_batch_first_match_and_boundaries(spark):
    df = _events(spark, [
        ("u1", 0, "A"), ("u1", 1, "B"), ("u1", 2, "B"), ("u1", 3, "C"),   # full match, first B wins
        ("u2", 0, "A"), ("u2", 10, "B"), ("u2", 30, "C"),                  # C at exactly start+30s: inclusive
        ("u3", 0, "A"), ("u3", 0, "B"),                                    # same-ts B: strictly-later required
        ("u4", 0, "A"), ("u4", 5, "B"), ("u4", 31, "C"),                   # C past the window: no match
        ("u5", 0, "B"), ("u5", 1, "C"),                                    # no opening A
    ])
    out = {r.user_id: (r.a_ms, r.b_ms, r.c_ms, r.duration_ms)
           for r in match_sequence(df, "user_id", "ts", STEPS(), "30 seconds", NAMES).collect()}
    base = 1_700_000_000_000
    assert out == {
        "u1": (base, base + 1000, base + 3000, 3000),
        "u2": (base, base + 10_000, base + 30_000, 30_000),
    }


def test_batch_multiple_instances_per_key(spark):
    df = _events(spark, [
        ("u1", 0, "A"), ("u1", 1, "B"), ("u1", 2, "C"),
        ("u1", 100, "A"), ("u1", 101, "B"), ("u1", 102, "C"),
    ])
    out = match_sequence(df, "user_id", "ts", STEPS(), "30 seconds", NAMES).collect()
    assert sorted(r.duration_ms for r in out) == [2000, 2000]
    assert len({r.a_ms for r in out}) == 2


def test_batch_plan_no_cartesian(spark):
    df = _events(spark, [("u1", 0, "A"), ("u1", 1, "B"), ("u1", 2, "C")])
    plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
        match_sequence(df, "user_id", "ts", STEPS(), "30 seconds", NAMES)._jdf.queryExecution(),
        "formatted",
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_stream_matches_batch_across_microbatches(spark, tmp_path):
    rows = [
        ("u1", 0, "A"), ("u1", 5, "B"),                # prefix opens in file 1...
        ("u2", 0, "A"), ("u2", 40, "B"),               # B out of window: dead prefix
        ("u1", 12, "C"),                               # ...completes in file 2 (state carry-over)
        ("u2", 50, "A"), ("u2", 51, "B"), ("u2", 55, "C"),
    ]
    # file stream sources list FILES in the dir (not nested write dirs):
    # stage each micro-batch's rows as one flat parquet file
    import shutil

    src = tmp_path / "stream_src"
    src.mkdir()
    for i, chunk in enumerate([rows[:4], rows[4:]]):
        stage = tmp_path / f"stage{i}"
        _events(spark, chunk).coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        shutil.move(str(part), str(src / f"f{i}.parquet"))
    batch_df = _events(spark, rows)
    expected = {tuple(r) for r in
                match_sequence(batch_df, "user_id", "ts", STEPS(), "30 seconds", NAMES).collect()}

    stream = (
        spark.readStream.schema("user_id string, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    matched = match_sequence_stream(stream, "user_id", "ts", STEPS(), "30 seconds",
                                    watermark="1 minute", step_names=NAMES)
    got: list[tuple] = []
    q = (
        matched.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(lambda df, eid: got.extend(tuple(r) for r in df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert set(got) == expected and len(expected) == 2


def test_cep_yaml_batch_and_stream_paths(spark, tmp_path):
    src = tmp_path / "ev"
    _events(spark, [("u1", 0, "A"), ("u1", 1, "B"), ("u1", 2, "C")]).write.parquet(str(src))
    conf = f"""
input:
  parquet: {{path: {src}, schema: "user_id string, ts timestamp, event_type string"}}
pipeline:
  processors:
    - match_sequence:
        key: user_id
        ts: ts
        within: 30 seconds
        steps: ['this.event_type == "A"', 'this.event_type == "B"', 'this.event_type == "C"']
        names: [a, b, c]
"""
    p = compile_yaml(conf)
    assert p.build_batch(spark).count() == 1
    assert p.build_stream(spark).isStreaming  # stateful path compiles


def test_stream_duplicate_start_does_not_reopen(spark, tmp_path):
    """A start event duplicated in a later micro-batch must not re-open an
    instance that was already extended (would double-emit vs batch)."""
    import shutil

    f1 = [("u1", 0, "A"), ("u1", 5, "B")]
    f2 = [("u1", 0, "A"), ("u1", 12, "C")]  # duplicate of the f1 start + the finisher
    src = tmp_path / "dups"
    src.mkdir()
    for i, chunk in enumerate([f1, f2]):
        stage = tmp_path / f"dstage{i}"
        _events(spark, chunk).coalesce(1).write.parquet(str(stage))
        shutil.move(str(next(stage.glob("part-*.parquet"))), str(src / f"f{i}.parquet"))
    stream = (
        spark.readStream.schema("user_id string, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    matched = match_sequence_stream(stream, "user_id", "ts", STEPS(), "30 seconds",
                                    watermark="1 minute", step_names=NAMES)
    got: list[tuple] = []
    q = (
        matched.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dck"))
        .foreachBatch(lambda df, eid: got.extend(tuple(r) for r in df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(got) == 1  # exactly one match despite the duplicated start


def test_batch_overlapping_predicates_use_earliest_step(spark):
    """An event matching several step predicates classifies as the EARLIEST
    step in BOTH batch and streaming (previously batch entered it into every
    matching frame, diverging from the streaming twin)."""
    from pyspark.sql import functions as F

    from bento_spark.streaming.cep import match_sequence

    df = spark.createDataFrame(
        [("u", "view", 0, 1000), ("u", "view", 5, 2000)],
        "user_id string, event_type string, value int, ms bigint",
    ).withColumn("ts", F.timestamp_millis(F.col("ms")))
    out = match_sequence(
        df,
        "user_id",
        "ts",
        [F.col("event_type") == "view", F.col("value") > 0],
        within="10 seconds",
    ).collect()
    # the t=2000 event matches BOTH predicates -> earliest step (0) wins,
    # so it only opens an instance and the pattern never completes
    assert out == []


def _run_stream(spark, src, ck, **kw):
    stream = (
        spark.readStream.schema("user_id string, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    matched = match_sequence_stream(stream, "user_id", "ts", STEPS(), "30 seconds",
                                    step_names=NAMES, **kw)
    got: list[tuple] = []
    q = (
        matched.writeStream.outputMode("append")
        .option("checkpointLocation", str(ck))
        .foreachBatch(lambda df, eid: got.extend(tuple(r) for r in df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return got


def _stage_files(spark, tmp_path, name, chunks):
    import shutil

    src = tmp_path / name
    src.mkdir()
    for i, chunk in enumerate(chunks):
        stage = tmp_path / f"{name}_stage{i}"
        _events(spark, chunk).coalesce(1).write.parquet(str(stage))
        shutil.move(str(next(stage.glob("part-*.parquet"))), str(src / f"f{i}.parquet"))
    return src


def test_stream_buffer_policy_displaces_late_min(spark, tmp_path):
    """late_policy='buffer': a permitted-late B@6 arriving AFTER B@10 was
    seen must still win the step-1 minimum, exactly as the batch twin
    computes it (the eager policy's documented divergence). The trailing
    A@50/A@60 rows open instances that never complete — they exist to drag
    the watermark forward (non-step rows can't: Catalyst pushes the step
    filter below the EventTimeWatermark node, so only step-matching events
    feed event-time stats); the final match is released by the event-time
    timeout once the watermark passes C@12."""
    f1 = [("u1", 0, "A"), ("u1", 10, "B")]   # wm after: 10s - 5s = 5s
    f2 = [("u1", 6, "B"), ("u1", 12, "C")]   # both late-but-permitted; buffered
    f3 = [("u1", 50, "A")]                   # wm -> 45s after this batch
    f4 = [("u1", 60, "A")]                   # runs AT wm 45s: timeout releases 6/10/12
    rows = f1 + f2 + f3 + f4
    src = _stage_files(spark, tmp_path, "buf_src", [f1, f2, f3, f4])
    batch_expected = {tuple(r) for r in match_sequence(
        _events(spark, rows), "user_id", "ts", STEPS(), "30 seconds", NAMES
    ).collect()}
    base = 1_700_000_000_000
    assert batch_expected == {("u1", base, base + 6000, base + 12_000, 12_000)}

    got = _run_stream(spark, src, tmp_path / "buf_ck",
                      watermark="5 seconds", late_policy="buffer")
    assert set(got) == batch_expected

    # eager on the same stream emits the in-order answer (b=10): the exact
    # divergence the buffer policy exists to close
    got_eager = _run_stream(spark, src, tmp_path / "eager_ck",
                            watermark="5 seconds", late_policy="eager")
    assert set(got_eager) == {("u1", base, base + 10_000, base + 12_000, 12_000)}


def test_stream_late_event_within_watermark_completes(spark, tmp_path):
    """An instance must survive until the WATERMARK passes its window — not
    until the batch's max event time does. A later batch may deliver a
    permitted-late event that completes it (the old max_ts tightening
    expired the instance and missed the match)."""
    import shutil

    # u1: A@0 opens; A@300s in the same batch drags max event time forward;
    # B@5s and C@8s arrive in the NEXT batch (late but within the 10-minute
    # watermark budget) and must still complete the (0,5,8) instance
    f1 = [("u1", 0, "A"), ("u1", 300, "A")]
    f2 = [("u1", 5, "B"), ("u1", 8, "C")]
    src = tmp_path / "late_src"
    src.mkdir()
    for i, chunk in enumerate([f1, f2]):
        stage = tmp_path / f"late_stage{i}"
        _events(spark, chunk).coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        shutil.move(str(part), str(src / f"f{i}.parquet"))

    stream = (
        spark.readStream.schema("user_id string, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    matched = match_sequence_stream(
        stream, "user_id", "ts", STEPS(), "30 seconds",
        watermark="10 minutes", step_names=NAMES,
    )
    got: list[tuple] = []
    q = (
        matched.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "late_ck"))
        .foreachBatch(lambda df, eid: got.extend(tuple(r) for r in df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch_expected = {tuple(r) for r in match_sequence(
        _events(spark, f1 + f2), "user_id", "ts", STEPS(), "30 seconds", NAMES
    ).collect()}
    assert set(got) == batch_expected and len(batch_expected) == 1
