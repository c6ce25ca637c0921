"""Config surface (env interpolation + -s overrides) and bloblang wave-3
methods (merge/sort_by/unquote/parse_form/ts_add_iso8601); unarchive
json_map format."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bento_spark.functions.bloblang import compile_expr
from bento_spark.operators.batching import unarchive
from bento_spark.plans.compiler import apply_overrides, compile_yaml, interpolate_env


def test_env_interpolation_and_overrides(spark, tmp_path):
    src = tmp_path / "ev"
    spark.createDataFrame([(1.0,), (250.0,)], ["v"]).write.parquet(str(src))
    conf = """
input:
  parquet: {path: ${DATA_DIR}/ev}
pipeline:
  processors:
    - filter: this.v < ${MAX_V:100}
"""
    p = compile_yaml(conf, env={"DATA_DIR": str(tmp_path)})
    assert [r.v for r in p.build_batch(spark).collect()] == [1.0]
    # default applies when the var is unset; unset without default raises
    with pytest.raises(ValueError, match="DATA_DIR"):
        compile_yaml(conf, env={})
    # ${! expr } row interpolation is untouched by env interpolation
    assert interpolate_env("a ${! this.x } b", env={}) == "a ${! this.x } b"
    # -s style override: threshold loosened, value parsed as YAML scalar
    p2 = compile_yaml(conf, env={"DATA_DIR": str(tmp_path)},
                      overrides={"pipeline.processors": [{"filter": "this.v < 1000"}]})
    assert len(p2.build_batch(spark).collect()) == 2
    assert apply_overrides({}, {"a.b.c": "7"}) == {"a": {"b": {"c": 7}}}


def test_bloblang_wave3_methods(spark):
    df = spark.sql(
        "SELECT map('a',1,'b',2) AS m1, map('b',9,'c',3) AS m2, "
        "array(3,1,2) AS arr, '\"quoted\"' AS q, 'x=a%20b&y=2' AS form, "
        "timestamp'2024-01-01 00:00:00' AS t"
    )
    r = df.select(
        compile_expr("this.m1.merge(this.m2)").alias("mg"),
        compile_expr("this.arr.sort_by(x -> 0 - x)").alias("sb"),
        compile_expr("this.q.unquote()").alias("uq"),
        compile_expr("this.form.parse_form_url_encoded()").alias("pf"),
        compile_expr('this.t.ts_add_iso8601("PT1H30M")').alias("plus"),
        compile_expr('this.t.ts_sub_iso8601("P1D")').alias("minus"),
    ).collect()[0]
    assert r.mg == {"a": 1, "b": 9, "c": 3}  # right wins on clash
    assert r.sb == [3, 2, 1]
    assert r.uq == "quoted"
    assert r.pf == {"x": "a b", "y": "2"}
    assert str(r.plus) == "2024-01-01 01:30:00"
    assert str(r.minus) == "2023-12-31 00:00:00"


def test_unarchive_json_map(spark):
    df = spark.createDataFrame([(1, '{"a": "x", "b": "y"}')], ["id", "payload"])
    out = unarchive(df, "payload", fmt="json_map", out_col="val")
    rows = sorted((r.id, r.val_key, r.val) for r in out.collect())
    assert rows == [(1, "a", "x"), (1, "b", "y")]


def test_mapping_full_remap_and_nested_targets(spark):
    from bento_spark.functions.bloblang import compile_mapping

    df = spark.sql(
        "SELECT 7 AS a, 'Hi' AS s, named_struct('x', 1, 'y', named_struct('z', 2)) AS st"
    )
    # root = {...} full remap: the object IS the new row (projection)
    remap = compile_mapping('''
root = {
  "doubled": this.a * 2,
  "lower": this.s.lowercase(),
}
''').apply(df)
    assert remap.columns == ["doubled", "lower"]
    assert remap.collect()[0].asDict() == {"doubled": 14, "lower": "hi"}
    # nested assignment target -> struct field update, deep path included
    nested = compile_mapping("""
root.st.x = this.a + 1
root.st.y.z = 99
""").apply(df)
    row = nested.collect()[0]
    assert row.st.x == 8 and row.st.y.z == 99 and row.a == 7


def test_read_until_stops_after_trigger_batch(spark, tmp_path):
    import shutil
    import time

    src = tmp_path / "ru_src"
    src.mkdir()
    for i in range(3):  # file i carries value i*10; file 1 triggers the stop
        stage = tmp_path / f"ru_stage{i}"
        spark.createDataFrame([(i * 10,)], ["v"]).coalesce(1).write.parquet(str(stage))
        shutil.move(str(next(stage.glob("part-*.parquet"))), str(src / f"f{i}.parquet"))
    p = compile_yaml(f"""
input:
  read_until:
    input: {{parquet: {{path: {src}, schema: "v bigint", max_files_per_trigger: 1}}}}
    check: this.v >= 10
output:
  path: {tmp_path}/ru_out
""")
    q = p.run_stream(spark, checkpoint=str(tmp_path / "ru_ck"), available_now=False)
    deadline = time.time() + 60
    while q.isActive and time.time() < deadline:
        time.sleep(0.3)
    assert not q.isActive  # the predicate stopped the query by itself
    got = sorted(r.v for r in p.sink.read(spark).collect())
    # triggering batch delivered; the post-trigger file never lands
    assert got == [0, 10]


# ------------------------------------------------------- object-store paths
def test_object_store_paths_gated(spark, tmp_path):
    """s3a/gs/abfss paths on file inputs gate on the Hadoop connector jar
    (absent in this sandbox) with an error naming the package — the
    Spark-native shape of the reference's aws_s3 / gcp_cloud_storage
    connectors (internal/impl/aws/, gcp/). Local paths pass untouched;
    s3:// normalizes to s3a:// (the maintained connector)."""
    import pytest

    from bento_spark.gating import require_object_store
    from bento_spark.plans.compiler import compile_yaml

    assert require_object_store(spark, "/tmp/x") == "/tmp/x"
    assert require_object_store(spark, "file:///tmp/x") == "file:///tmp/x"
    for url, pkg in [
        ("s3a://bucket/k.parquet", "hadoop-aws"),
        ("s3://bucket/k.parquet", "hadoop-aws"),
        ("gs://bucket/k.parquet", "gcs-connector"),
        ("abfss://c@acct.dfs.core.windows.net/k", "hadoop-azure"),
    ]:
        with pytest.raises(RuntimeError, match=pkg):
            require_object_store(spark, url)
    # the gate fires at compile-the-input time, not deep inside a scan
    p = compile_yaml("""
input:
  parquet: {path: "s3a://bucket/clips/"}
""")
    with pytest.raises(RuntimeError, match="hadoop-aws"):
        p.build_batch(spark)
