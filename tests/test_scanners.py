"""Scanner wave: tar/zip member explode, binaryFile input, chunker on
string+binary, re_split, skip_bom — the reference's scanner_*.go family.
Value-level verification for tar/chunker lives in the oracle queries
(tar_roundtrip, chunker_scan); these cover format/edge semantics."""

from __future__ import annotations

import io
import tarfile
import zipfile

import pytest
from pyspark.sql import functions as F

from bento_spark.operators.scanners import chunker, re_split, skip_bom, tar_encode, unarchive_tar
from bento_spark.plans.compiler import compile_yaml


def _tar_bytes(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_tar_encode_deterministic_and_roundtrip(spark):
    df = spark.createDataFrame(
        [("g1", "b.txt", "beta"), ("g1", "a.txt", "alpha"), ("g2", "c.txt", "gamma")],
        ["grp", "fname", "text"],
    )
    blobs = tar_encode(df, ["grp"], "fname", "text", out_col="blob")
    assert {r.grp: r.n_members for r in blobs.collect()} == {"g1": 2, "g2": 1}
    b1 = {r.grp: bytes(r.blob) for r in blobs.collect()}
    b2 = {r.grp: bytes(r.blob) for r in tar_encode(df, ["grp"], "fname", "text", out_col="blob").collect()}
    assert b1 == b2  # deterministic bytes (sorted members, zeroed metadata)
    back = unarchive_tar(blobs, "blob", keep_cols=["grp"])
    rows = sorted((r.grp, r.member_name, bytes(r.member_bytes).decode()) for r in back.collect())
    assert rows == [("g1", "a.txt", "alpha"), ("g1", "b.txt", "beta"), ("g2", "c.txt", "gamma")]


def test_unarchive_zip(spark):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("x/one.txt", b"11")
        zf.writestr("two.txt", b"222")
    df = spark.createDataFrame([("z1", buf.getvalue())], ["src", "blob"])
    out = unarchive_tar(df, "blob", keep_cols=["src"], fmt="zip")
    rows = sorted((r.src, r.member_name, len(r.member_bytes)) for r in out.collect())
    assert rows == [("z1", "two.txt", 3), ("z1", "x/one.txt", 2)]
    with pytest.raises(ValueError, match="unsupported archive format"):
        unarchive_tar(df, "blob", fmt="7z")


def test_binary_file_input_tar_scan_yaml(spark, tmp_path):
    src = tmp_path / "tars"
    src.mkdir()
    (src / "a.tar").write_bytes(_tar_bytes({"m1.txt": b"hello", "m2.txt": b"world!"}))
    (src / "b.tar").write_bytes(_tar_bytes({"m3.txt": b"xyz"}))
    p = compile_yaml(f"""
input:
  binary_file: {{path: {src}, glob: "*.tar"}}
pipeline:
  processors:
    - unarchive_tar: {{column: content, keep: [path]}}
    - mapping: root.n = this.member_bytes.string().length()
""")
    out = p.build_batch(spark)
    got = {r.member_name: r.n for r in out.collect()}
    assert got == {"m1.txt": 5, "m2.txt": 6, "m3.txt": 3}
    assert all(r.path for r in out.collect())  # binaryFile metadata kept


def test_chunker_string_and_binary(spark):
    df = spark.createDataFrame([("d1", "abcdefgh", b"0123456789"), ("d2", "", b"")],
                               ["id", "s", "b"])
    cs = chunker(df.select("id", "s"), "s", 3, out_col="c")
    rows = sorted((r.id, r.chunk_index, r.c) for r in cs.collect())
    assert rows == [("d1", 0, "abc"), ("d1", 1, "def"), ("d1", 2, "gh")]  # empty payload -> 0 rows
    cb = chunker(df.select("id", "b"), "b", 4, out_col="c")
    rows_b = sorted((r.id, r.chunk_index, bytes(r.c)) for r in cb.collect())
    assert rows_b == [("d1", 0, b"0123"), ("d1", 1, b"4567"), ("d1", 2, b"89")]
    with pytest.raises(ValueError, match="positive"):
        chunker(df, "s", 0)


def test_re_split_and_skip_bom(spark):
    df = spark.createDataFrame([("﻿rec1;rec2|rec3",)], ["line"])
    out = skip_bom(df, "line")
    parts = [r.part for r in re_split(out, "line", "[;|]").collect()]
    assert parts == ["rec1", "rec2", "rec3"]


def test_scanner_switch_routes_by_filename(spark):
    from bento_spark.operators.scanners import scanner_switch

    df = spark.createDataFrame(
        [("/d/a.csv", "1,2"), ("/d/b.jsonl", '{"x":1}'), ("/d/c.bin", "??")],
        "path string, content string",
    )
    out = scanner_switch(
        df,
        [
            (r"\.csv$", lambda d: d.withColumn("kind", F.lit("csv"))),
            (r"\.jsonl$", lambda d: d.withColumn("kind", F.lit("json"))),
        ],
    ).collect()
    kinds = {r.path.split("/")[-1]: r.kind for r in out}
    assert kinds["a.csv"] == "csv" and kinds["b.jsonl"] == "json"
    errs = {r.path.split("/")[-1]: r.error for r in out}
    assert errs["c.bin"] and "no candidate matched" in errs["c.bin"]
    assert errs["a.csv"] is None


def test_scanner_switch_catch_all(spark):
    from bento_spark.operators.scanners import scanner_switch

    df = spark.createDataFrame(
        [("/d/a.csv", "1"), ("/d/z.other", "2")], "path string, content string"
    )
    out = scanner_switch(
        df,
        [
            (r"\.csv$", lambda d: d.withColumn("kind", F.lit("csv"))),
            (None, lambda d: d.withColumn("kind", F.lit("raw"))),
        ],
    ).collect()
    kinds = {r.path.split("/")[-1]: r.kind for r in out}
    assert kinds == {"a.csv": "csv", "z.other": "raw"}
    assert "error" in out[0].__fields__  # protocol column must exist
    assert all(r.error is None for r in out)


def test_lines_whole_reads_file_as_one_message(spark, tmp_path):
    from bento_spark.plans.compiler import compile_yaml

    p = tmp_path / "whole.txt"
    p.write_text("line1\nline2\nline3\n")
    df = compile_yaml(
        f"input:\n  lines: {{path: {tmp_path}, whole: true, column: body}}\n"
    ).build_batch(spark)
    rows = df.collect()
    assert len(rows) == 1 and rows[0].body == "line1\nline2\nline3\n"


def test_scanner_switch_null_path_errored_not_dropped(spark):
    from bento_spark.operators.scanners import scanner_switch

    df = spark.createDataFrame(
        [("/d/a.csv", "1"), (None, "2")], "path string, content string"
    )
    out = scanner_switch(
        df, [(r"\.csv$", lambda d: d.withColumn("kind", F.lit("csv")))]
    ).collect()
    assert len(out) == 2  # NULL-path row survives...
    null_row = next(r for r in out if r.path is None)
    assert "no candidate matched" in null_row.error  # ...as an errored row
