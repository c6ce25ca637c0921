"""subprocess processor tests: lockstep protocol, codecs, stderr errors,
child restart — golden behavior mirroring processor_subprocess.go."""

from __future__ import annotations

import io
import sys

from pyspark.sql import functions as F

from bento_spark.operators.subprocess_proc import (
    frame_payload,
    read_framed,
    subprocess_map,
)

PY = sys.executable

UPPER = "import sys\nfor line in sys.stdin:\n    sys.stdout.write(line.upper()); sys.stdout.flush()\n"

# errors lines containing 'bad' to stderr, echoes the rest
SPLIT = (
    "import sys\n"
    "for line in sys.stdin:\n"
    "    if 'bad' in line:\n"
    "        sys.stderr.write('rejected: ' + line); sys.stderr.flush()\n"
    "    else:\n"
    "        sys.stdout.write(line); sys.stdout.flush()\n"
)

# answers two requests then exits (forces a mid-stream restart)
QUITTER = (
    "import sys\n"
    "for i, line in enumerate(sys.stdin):\n"
    "    sys.stdout.write(line); sys.stdout.flush()\n"
    "    if i == 1:\n"
    "        sys.exit(0)\n"
)


def test_frame_codecs_roundtrip():
    for codec in ("lines", "length_prefixed_uint32_be", "netstring"):
        payload = b"hello world" if codec != "lines" else b"hello world"
        framed = frame_payload(payload, codec)
        assert read_framed(io.BytesIO(framed), codec) == payload
    # netstring wire format is the public spec's
    assert frame_payload(b"abc", "netstring") == b"3:abc,"
    assert frame_payload(b"", "netstring") == b"0:,"
    assert frame_payload(b"xy", "length_prefixed_uint32_be") == b"\x00\x00\x00\x02xy"
    # EOF / malformed -> None (child death signal)
    assert read_framed(io.BytesIO(b""), "lines") is None
    assert read_framed(io.BytesIO(b"\x00\x00"), "length_prefixed_uint32_be") is None
    assert read_framed(io.BytesIO(b"9z:x,"), "netstring") is None


def test_subprocess_stdout_replaces_content(spark):
    df = spark.createDataFrame([(1, "alpha"), (2, "beta"), (3, None)], "id int, text string")
    out = subprocess_map(df.repartition(2), PY, ["-u", "-c", UPPER]).orderBy("id").collect()
    assert [r.text for r in out] == ["ALPHA", "BETA", None]
    assert all(r.error is None for r in out)


def test_subprocess_stderr_errors_row(spark):
    df = spark.createDataFrame(
        [(1, "ok-1"), (2, "bad-2"), (3, "ok-3")], "id int, text string"
    )
    out = subprocess_map(df.coalesce(1), PY, ["-u", "-c", SPLIT]).orderBy("id").collect()
    # stderr rows keep their content and carry the error in-band
    assert [r.text for r in out] == ["ok-1", "bad-2", "ok-3"]
    assert out[0].error is None and out[2].error is None
    assert "rejected: bad-2" in out[1].error


# writes BOTH a stdout response and a stderr line for 'noisy' rows — the
# leftover entry must not be dequeued by the NEXT row (lockstep desync)
BOTH = (
    "import sys\n"
    "for line in sys.stdin:\n"
    "    if 'noisy' in line:\n"
    "        sys.stderr.write('warned: ' + line); sys.stderr.flush()\n"
    "    sys.stdout.write(line); sys.stdout.flush()\n"
)


def test_subprocess_both_streams_no_desync(spark):
    """A stdout+stderr double response for one message must not shift the
    stderr verdict onto a later clean row."""
    df = spark.createDataFrame(
        [(1, "noisy-1"), (2, "ok-2"), (3, "ok-3"), (4, "noisy-4"), (5, "ok-5")],
        "id int, text string",
    )
    out = subprocess_map(df.coalesce(1), PY, ["-u", "-c", BOTH]).orderBy("id").collect()
    # clean rows MUST stay clean whatever the noisy rows resolved to
    for r in out:
        if "ok" in r.text:
            assert r.error is None, f"stderr leaked onto clean row {r.id}: {r.error}"
    assert [r.text for r in out] == ["noisy-1", "ok-2", "ok-3", "noisy-4", "ok-5"]


def test_subprocess_restarts_dead_child(spark):
    df = spark.createDataFrame([(i, f"m{i}") for i in range(5)], "id int, text string")
    out = subprocess_map(df.coalesce(1), PY, ["-u", "-c", QUITTER]).orderBy("id").collect()
    # child exits after every 2 responses; all 5 rows still answered
    assert [r.text for r in out] == [f"m{i}" for i in range(5)]
    assert all(r.error is None for r in out)


def test_subprocess_yaml_and_error_shortcircuit(spark, tmp_path):
    from bento_spark.plans.compiler import compile_yaml

    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "id int, text string"
    ).write.mode("overwrite").parquet(str(src))
    cfg = f"""
input:
  parquet:
    path: {src}
pipeline:
  processors:
    - set_error:
        when: "this.id == 2"
        message: "pre-errored"
    - subprocess:
        name: {PY}
        args: ["-u", "-c", "{UPPER.replace(chr(10), chr(92) + 'n')}"]
"""
    plan = compile_yaml(cfg)
    out = plan.build_batch(spark).orderBy("id").collect()
    # pre-errored rows short-circuit the child entirely (try semantics)
    assert out[0].text == "X" and out[0].error is None
    assert out[1].text == "y" and out[1].error == "pre-errored"


def test_command_per_message_exec(spark):
    from bento_spark.operators.subprocess_proc import command_map

    df = spark.createDataFrame(
        [(1, "abc"), (2, "boom"), (3, "xyz")], "id int, text string"
    )
    # zero exit + stdout for normal rows; 'boom' exits 3 with stderr;
    # 'xyz' succeeds but also writes a warning to stderr
    script = (
        "import sys\n"
        "data = sys.stdin.read()\n"
        "if 'boom' in data:\n"
        "    sys.stderr.write('exploded'); sys.exit(3)\n"
        "if 'xyz' in data:\n"
        "    sys.stderr.write('careful')\n"
        "sys.stdout.write(data[::-1])\n"
    )
    out = (
        command_map(df.coalesce(1), PY, ["-c", script])
        .orderBy("id")
        .collect()
    )
    assert out[0].text == "cba" and out[0].error is None and out[0].command_stderr is None
    # non-zero exit: content unchanged, stderr becomes the error
    assert out[1].text == "boom" and out[1].error == "exploded"
    # zero exit with stderr: replaced content + command_stderr populated
    assert out[2].text == "zyx" and out[2].error is None and out[2].command_stderr == "careful"


def test_command_args_mapping_yaml(spark, tmp_path):
    from bento_spark.plans.compiler import compile_yaml

    src = tmp_path / "cmd_in"
    spark.createDataFrame(
        [(1, "hello", "2"), (2, "world", "3")], "id int, text string, times string"
    ).write.mode("overwrite").parquet(str(src))
    # args resolved per row from a Bloblang array expression
    script = "import sys; n=int(sys.argv[1]); sys.stdout.write(sys.stdin.read() * n)"
    cfg = f"""
input:
  parquet:
    path: {src}
pipeline:
  processors:
    - command:
        name: {PY}
        args_mapping: '["-c", "{script}", this.times]'
"""
    out = compile_yaml(cfg).build_batch(spark).orderBy("id").collect()
    assert out[0].text == "hellohello"
    assert out[1].text == "worldworldworld"
