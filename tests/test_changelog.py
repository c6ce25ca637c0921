"""changelog `.diff()` / `.patch()` (functions/changelog.py +
functions/bloblang.py) — the reference wraps r3labs/diff/v3
(internal/impl/changelog/bloblang.go); every vector below is ported
verbatim from its bloblang_test.go."""

from __future__ import annotations

import json

from bento_spark.functions.changelog import diff_values, patch_values
from bento_spark.plans.compiler import compile_yaml

# (label, before, after, expected changelog) — bloblang_test.go Test_Diff
DIFF_VECTORS = [
    ("creation", None, {"summary": "a"},
     [{"Type": "create", "Path": ["summary"], "From": None, "To": "a"}]),
    ("creation of empty array", {"summary": None}, {"summary": []},
     [{"Type": "update", "Path": ["summary"], "From": None, "To": []}]),
    ("creation of pre-filled array", {"summary": None},
     {"summary": ["a", "b"]},
     [{"Type": "update", "Path": ["summary"], "From": None,
       "To": ["a", "b"]}]),
    ("creation of empty object", {"summary": None}, {"summary": {}},
     [{"Type": "update", "Path": ["summary"], "From": None, "To": {}}]),
    ("creation of pre-filled object", {"summary": None},
     {"summary": {"a": "b"}},
     [{"Type": "update", "Path": ["summary"], "From": None,
       "To": {"a": "b"}}]),
    ("change", {"summary": "a"}, {"summary": "b"},
     [{"Type": "update", "Path": ["summary"], "From": "a", "To": "b"}]),
    ("add to array", {"summary": ["a"]}, {"summary": ["a", "b"]},
     [{"Type": "create", "Path": ["summary", "1"], "From": None,
       "To": "b"}]),
    ("remove from array", {"summary": ["a", "b"]}, {"summary": ["a"]},
     [{"Type": "delete", "Path": ["summary", "1"], "From": "b",
       "To": None}]),
    ("add to object", {"summary": {"a": "b"}},
     {"summary": {"a": "b", "c": "d"}},
     [{"Type": "create", "Path": ["summary", "c"], "From": None,
       "To": "d"}]),
    ("remove from object", {"summary": {"a": "b", "c": "d"}},
     {"summary": {"a": "b"}},
     [{"Type": "delete", "Path": ["summary", "c"], "From": "d",
       "To": None}]),
    ("removal", {"summary": "a"}, None,
     [{"Type": "delete", "Path": ["summary"], "From": "a", "To": None}]),
]

# (label, changelog, input, expected) — bloblang_test.go Test_Patch
PATCH_VECTORS = [
    ("creation",
     [{"Type": "create", "Path": ["summary"], "From": None, "To": "a"}],
     {}, {"summary": "a"}),
    ("creation of empty array",
     [{"Type": "update", "Path": ["summary"], "From": None, "To": []}],
     {"summary": None}, {"summary": []}),
    ("creation of pre-filled array",
     [{"Type": "update", "Path": ["summary"], "From": None,
       "To": ["a", "b"]}],
     {"summary": None}, {"summary": ["a", "b"]}),
    ("creation of empty object",
     [{"Type": "update", "Path": ["summary"], "From": None, "To": {}}],
     {"summary": None}, {"summary": {}}),
    ("creation of pre-filled object",
     [{"Type": "update", "Path": ["summary"], "From": None,
       "To": {"a": "b"}}],
     {"summary": None}, {"summary": {"a": "b"}}),
    ("change",
     [{"Type": "update", "Path": ["summary"], "From": "a", "To": "b"}],
     {"summary": "a"}, {"summary": "b"}),
    ("add to object",
     [{"Type": "create", "Path": ["summary", "c"], "From": None,
       "To": "d"}],
     {"summary": {"a": "b"}}, {"summary": {"a": "b", "c": "d"}}),
    ("remove from object",
     [{"Type": "delete", "Path": ["summary", "c"], "From": "d",
       "To": None}],
     {"summary": {"a": "b", "c": "d"}}, {"summary": {"a": "b"}}),
    ("removal",
     [{"Type": "delete", "Path": ["summary"], "From": "a", "To": None}],
     {"summary": "a"}, {}),
]


def test_diff_reference_vectors():
    for label, before, after, want in DIFF_VECTORS:
        assert diff_values(before, after) == want, label


def test_patch_reference_vectors():
    for label, changelog, doc, want in PATCH_VECTORS:
        assert patch_values(doc, changelog) == want, label


def test_unordered_list_match_is_no_change():
    # r3labs default SliceOrdering=false: moved elements are not changes
    assert diff_values({"s": ["a", "b", "c"]}, {"s": ["c", "b", "a"]}) == []


def test_patch_inverts_diff():
    cases = [
        ({"a": 1, "b": {"c": [1, 2, 3]}}, {"a": 2, "b": {"c": [1, 3]}}),
        ({"x": ["a", "b", "c"]}, {"x": ["b"]}),
        ({"x": []}, {"x": ["p", "q"]}),
        ({"k": None}, {"k": {"deep": {"er": 5}}}),
        ({"gone": "yes", "stay": 1}, {"stay": 1}),
        ({"s": ["a", "b"]}, {"s": ["x", "b"]}),
        ({}, {"new": {"a": [1, {"b": 2}]}}),
    ]
    for before, after in cases:
        cl = diff_values(before, after)
        assert patch_values(before, cl) == after, (before, after, cl)


def test_unknown_change_type_raises():
    import pytest

    with pytest.raises(ValueError, match="unknown change type"):
        patch_values({}, [{"Type": "mangle", "Path": ["x"], "To": 1}])


def test_bloblang_diff_patch_e2e(spark):
    from bento_spark.functions.bloblang import compile_expr

    df = spark.createDataFrame(
        [(("wav", 1, ["a"]), ("opus", 1, ["a", "b"])),
         (("opus", 2, []), ("opus", 2, []))],
        "before struct<codec:string,n:int,tags:array<string>>, "
        "after struct<codec:string,n:int,tags:array<string>>",
    )
    out = df.select(
        compile_expr("this.before.diff(this.after)").alias("cl"),
        compile_expr(
            "this.before.patch(this.before.diff(this.after))").alias("p"),
        "after",
    ).collect()
    changed, same = out
    assert json.loads(changed.cl) == [
        {"Type": "update", "Path": ["codec"], "From": "wav", "To": "opus"},
        {"Type": "create", "Path": ["tags", "1"], "From": None, "To": "b"},
    ]
    assert json.loads(same.cl) == []
    for r in out:
        assert json.loads(r.p) == r.after.asDict(recursive=True)
