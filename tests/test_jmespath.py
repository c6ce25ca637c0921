"""jmespath processor (processor_jmespath.go:65): full-spec queries —
projections, filters, pipes, builtin functions — over JSON columns. The
first test IS the reference's own docs example (processor_jmespath.go's
Example block); the rest mirror its unit tests (nested get, merge,
bad-JSON passthrough-without-mutation)."""

from __future__ import annotations

import json

import pytest

from bento_spark.operators.codec import jmespath_map
from bento_spark.plans.compiler import compile_yaml


def test_reference_docs_example(spark):
    doc = json.dumps({
        "locations": [
            {"name": "Seattle", "state": "WA"},
            {"name": "New York", "state": "NY"},
            {"name": "Bellevue", "state": "WA"},
            {"name": "Olympia", "state": "WA"},
        ]
    })
    df = spark.createDataFrame([(doc,)], "bytes string")
    out = jmespath_map(
        df, "bytes",
        "locations[?state == 'WA'].name | sort(@) | {Cities: join(', ', @)}",
    ).collect()
    assert json.loads(out[0].bytes) == {"Cities": "Bellevue, Olympia, Seattle"}
    assert out[0].error is None


def test_nested_get_and_merge(spark):
    df = spark.createDataFrame(
        [(json.dumps({"foo": {"bar": {"baz": 1}}}),),
         (json.dumps({"foo": {"original": {"content": "is this"}}}),)],
        "bytes string",
    )
    out = jmespath_map(df, "bytes", "foo.bar").collect()
    assert json.loads(out[0].bytes) == {"baz": 1}
    assert out[1].bytes == "null"  # missing path -> null document
    out2 = jmespath_map(df, "bytes", "{foo: merge(foo, {bar:'baz'})}").collect()
    assert json.loads(out2[1].bytes) == {
        "foo": {"original": {"content": "is this"}, "bar": "baz"}
    }


def test_bad_json_errors_without_mutation(spark):
    df = spark.createDataFrame([("this is bad json",)], "bytes string")
    out = jmespath_map(df, "bytes", "foo.bar").collect()
    # reference: "No passthrough for bad input data" mutation — content kept
    assert out[0].bytes == "this is bad json"
    assert "invalid JSON" in out[0].error


def test_out_col_and_yaml_surface(spark):
    df = spark.createDataFrame(
        [(1, json.dumps({"vals": [3, 1, 2]})), (2, json.dumps({"vals": []}))],
        "id int, doc string",
    )
    p = compile_yaml("""
input: {inline: true}
pipeline:
  processors:
    - jmespath: {column: doc, query: "{n: length(vals), total: sum(vals)}", out: stats}
""")
    out = {r.id: json.loads(r.stats) for r in p._apply_processors(df).collect()}
    assert out == {1: {"n": 3, "total": 6}, 2: {"n": 0, "total": 0}}


def test_bad_query_raises_at_plan_time(spark):
    df = spark.createDataFrame([("{}",)], "bytes string")
    with pytest.raises(Exception, match="[Ss]yntax|[Pp]arse|[Ii]ncomplete"):
        jmespath_map(df, "bytes", "locations[?state == ")
