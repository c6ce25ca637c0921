"""`awk` processor over the system awk binary (mawk/gawk) with Bento's
custom function set (reference internal/impl/awk/processor.go +
processor_test.go's case table). One fork per message, same slow-path
family as `command`."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bento_spark.operators.awk_proc import awk_map
from bento_spark.plans.compiler import compile_yaml


def _run_one(spark, program, content, codec="text", meta=None, **kw):
    """Apply the program to a single-row frame; return (content, meta, error)."""
    meta = meta or {}
    cols = "text string" + "".join(f", {k} string" for k in meta)
    df = spark.createDataFrame([(content, *meta.values())], cols)
    out = awk_map(df, program, codec=codec, col="text",
                  meta_cols=list(meta) or None, **kw).collect()[0]
    return out.text, {k: out[k] for k in meta}, out.error


# ---------------------------------------------------------- codec behaviors


def test_text_codec_processes_lines(spark):
    text, _, err = _run_one(spark, "{ print toupper($0) }", "hello\nworld")
    assert err is None and text == "HELLO\nWORLD"


def test_empty_output_leaves_content_unchanged(spark):
    # docs: "If the result is empty ... original message contents remain"
    text, _, err = _run_one(spark, "{ }", "hello world", codec="none")
    assert err is None and text == "hello world"


def test_json_codec_flattened_variables(spark):
    # processor.go:63-85 — foo.bar.value=10 becomes foo_bar_value
    doc = json.dumps({"foo": {"bar": {"value": 10}, "created_at": "2018-12-18"}})
    text, _, err = _run_one(spark, "{ print foo_bar_value; print foo_created_at }",
                            doc, codec="json")
    assert err is None and text == "10\n2018-12-18"


def test_nr_not_polluted_by_state_preamble(spark):
    text, _, err = _run_one(spark, "{ print NR \": \" $0 }", "a\nb", codec="text")
    assert err is None and text == "1: a\n2: b"


# ------------------------------------------------------------ json functions


def test_json_get(spark):
    # processor_test.go "json get 1"/"json get 2"/array path
    doc = '{"obj":{"foo":12}}'
    text, _, err = _run_one(spark, '{ print json_get("obj.foo") }', doc, codec="none")
    assert err is None and text == "12"
    text, _, err = _run_one(spark, '{ print json_get("obj.bar") }', doc, codec="none")
    assert err is None and text == "null"
    text, _, err = _run_one(spark, '{ print json_get("obj.1.foo") }',
                            '{"obj":[{"foo":11},{"foo":12}]}', codec="none")
    assert err is None and text == "12"


def test_json_get_unparseable_errors(spark):
    # processor_test.go "json get invalid"
    text, _, err = _run_one(spark, '{ print json_get("obj.bar") }',
                            "not json content", codec="none")
    assert text == "not json content"
    assert err is not None and "failed to parse message as json" in err


def test_json_set_array_path(spark):
    # processor_test.go "json set 2": mutation without print reserializes
    text, _, err = _run_one(spark, '{ json_set("obj.1.foo", "nope") }',
                            '{"obj":[{"foo":11},{"foo":12}]}', codec="none")
    assert err is None
    assert json.loads(text) == {"obj": [{"foo": 11}, {"foo": "nope"}]}


def test_json_set_typed_and_delete(spark):
    prog = """{
  json_set_int("a", "42")
  json_set_float("b", "2.5")
  json_set_bool("c", 1)
  json_delete("old")
}"""
    text, _, err = _run_one(spark, prog, '{"old": true}', codec="none")
    assert err is None
    assert json.loads(text) == {"a": 42, "b": 2.5, "c": True}


def test_json_append_and_length_type(spark):
    prog = """{
  json_append("tags", "x")
  json_append_int("tags", 7)
  print json_length("arr"); print json_type("arr"); print json_type("nope")
}"""
    text, _, err = _run_one(spark, prog, '{"arr":[1,2,3],"tags":["a"]}', codec="none")
    assert err is None
    # stdout wins over mutations — printed lines are the new content
    assert text == "3\narray\nundefined"


def test_json_mutation_without_print_updates_doc(spark):
    text, _, err = _run_one(spark, '{ json_append("tags", "x") }',
                            '{"tags":["a"]}', codec="none")
    assert err is None and json.loads(text) == {"tags": ["a", "x"]}


# -------------------------------------------------------------- metadata


def test_metadata_get_and_variables(spark):
    text, _, err = _run_one(spark, '{ print metadata_get("topic"); print topic }',
                            "x", codec="text", meta={"topic": "t1"})
    assert err is None and text == "t1\nt1"


def test_metadata_get_missing_is_empty(spark):
    text, _, err = _run_one(spark, '{ print "[" metadata_get("nope") "]" }',
                            "x", codec="text", meta={"topic": "t1"})
    assert err is None and text == "[]"


def test_metadata_set_updates_column(spark):
    text, meta, err = _run_one(spark, '{ metadata_set("topic", "changed") }',
                               "x", codec="text", meta={"topic": "t1"})
    assert err is None and text == "x" and meta["topic"] == "changed"


def test_metadata_set_undeclared_errors(spark):
    _, _, err = _run_one(spark, '{ metadata_set("ghost", "v") }',
                         "x", codec="text", meta={"topic": "t1"})
    assert err is not None and "not a declared meta_columns" in err


# ----------------------------------------------------------- error protocol


def test_nonzero_exit_errors_message(spark):
    # processor.go:813-816 / test "exit 1"
    text, _, err = _run_one(spark, "{ exit 1 }", "hello", codec="none")
    assert text == "hello"
    assert err is not None and "non-zero exit code: 1" in err


def test_timestamp_unix_pinned(spark):
    text, _, err = _run_one(spark, "{ print timestamp_unix() }", "x",
                            codec="none", now_unix=1700000000)
    assert err is None and text == "1700000000"


def test_user_function_overrides_injected(spark):
    prog = 'function json_get(p) { return "mine" }\n{ print json_get("a") }'
    text, _, err = _run_one(spark, prog, '{"a":1}', codec="none")
    assert err is None and text == "mine"


def test_errored_rows_pass_through(spark):
    df = spark.createDataFrame([("a", None), ("b", "boom")], "text string, error string")
    rows = {r.text: (r.text, r.error) for r in
            awk_map(df, "{ print toupper($0) }", codec="text", col="text").collect()}
    assert rows["A"] == ("A", None)       # clean row processed
    assert rows["b"] == ("b", "boom")     # errored row untouched


# ------------------------------------------------------------------- YAML


def test_yaml_awk_processor(spark, tmp_path):
    src = tmp_path / "in"
    spark.createDataFrame(
        [('{"user":{"name":"ada"}}',), ('{"user":{"name":"bob"}}',)], "text string"
    ).write.parquet(str(src))
    p = compile_yaml(f"""
input:
  parquet: {{path: {src}}}
pipeline:
  processors:
    - awk:
        codec: json
        program: '{{ json_set("greeting", "hi " user_name) }}'
""")
    rows = sorted(json.loads(r.text)["greeting"] for r in p.build_batch(spark).collect())
    assert rows == ["hi ada", "hi bob"]


def test_lint_knows_awk():
    from bento_spark.plans.lint import known_processors

    assert "awk" in known_processors()
