"""`bento test` golden-case runner: the reference's declarative YAML unit
tests executed through compile_yaml (internal/cli/test/case.go semantics,
predicate set internal/config/test/output.go:30-38). The corpus below
ports the reference's config/test/*.yaml cases (filters, deduplicate,
unit_test_example) into the engine's Bloblang dialect, plus predicate and
failure-path coverage the reference runner exercises."""

from __future__ import annotations

import pytest

from bento_spark.plans.testing import run_config_tests

# config/test/filters.yaml, ported verbatim (same processor, same cases —
# our deleted-if form matches the reference's conditional delete)
FILTERS = """
pipeline:
  processors:
    - bloblang: 'root = deleted() if content().contains("delete me")'

tests:
  - name: delete one of one message
    input_batch:
      - content: "hello world delete me please"

  - name: delete all messages
    input_batch:
      - content: "hello world delete me please"
      - content: "hello world 2 delete me please"
      - content: "hello world 3 delete me please"
      - content: "hello world 4 delete me please"

  - name: delete some messages
    input_batch:
      - content: "hello world delete me please"
      - content: "hello world 2"
      - content: "hello world 3 delete me please"
      - content: "hello world 4"
    output_batches:
      - - content_equals: "hello world 2"
        - content_equals: "hello world 4"
"""


def test_filters_corpus(spark):
    assert run_config_tests(spark, FILTERS) == []


# config/test/deduplicate.yaml: cross-batch dedupe. The reference backs
# dedupe with a TTL'd memory cache resource; the engine's native dedupe is
# batch-scoped, so the cross-batch memory is an explicit cache resource
# (add-rejects-existing + filter, the same state the reference's cache
# holds) — semantics identical: first occurrence wins across batches.
DEDUP = """
pipeline:
  processors:
    - dedupe: {{keys: [bytes]}}
    - cache: {{resource: {cache_dir}, operator: add, key: bytes, key_col: bytes, ttl: 60, now_ms: 0}}
    - filter: "!errored()"

tests:
  - name: de-duplicate across batches
    input_batches:
      -
        - content: '1'
        - content: '2'
        - content: '3'
        - content: '4'
        - content: '3'
        - content: '3'
        - content: '3'
      -
        - content: '4'
        - content: '1'
        - content: '1'
        - content: '3'
        - content: '4'
        - content: '4'
        - content: '2'
        - content: '1'
    output_batches:
      -
        - content_equals: 1
        - content_equals: 2
        - content_equals: 3
        - content_equals: 4
"""


def test_deduplicate_corpus(spark, tmp_path):
    conf = DEDUP.format(cache_dir=tmp_path / "dedupe_cache")
    assert run_config_tests(spark, conf) == []


# config/test/unit_test_example_bento_test.yaml, ported: uppercase+suffix
# mapping with metadata pass-through and an explicit target_processors
# pointer + per-case environment
EXAMPLE = """
pipeline:
  processors:
    - mapping: 'root = content().uppercase() + "${SUFFIX:end}"'

tests:
  - name: example test
    target_processors: '/pipeline/processors'
    environment: {}
    input_batch:
      - content: 'example content'
        metadata:
          example_key: example metadata value
    output_batches:
      -
        - content_equals: EXAMPLE CONTENTend
          metadata_equals:
            example_key: example metadata value

  - name: environment override
    target_processors: '/pipeline/processors'
    environment: {SUFFIX: "!"}
    input_batch:
      - content: 'example content'
    output_batches:
      -
        - content_equals: "EXAMPLE CONTENT!"
"""


def test_unit_test_example_corpus(spark):
    assert run_config_tests(spark, EXAMPLE) == []


PREDICATES = """
pipeline:
  processors:
    - mapping: |
        root.parsed = this.bytes.parse_json("a int, b string")
        root.bytes = this.bytes
        meta checked = "yes"

tests:
  - name: json predicates
    input_batch:
      - content: '{"a": 7, "b": "x", "extra": true}'
    output_batches:
      -
        - json_equals: {"a": 7, "b": "x", "extra": true}
          json_contains: {"a": 7}
          content_matches: '"a": ?7'
          metadata_equals: {checked: "yes"}
          bloblang: 'this.parsed.a == 7 && meta("checked") == "yes"'
"""


def test_predicate_set(spark):
    assert run_config_tests(spark, PREDICATES) == []


FAILING = """
pipeline:
  processors:
    - mapping: 'root = content().uppercase()'

tests:
  - name: wrong content
    input_batch:
      - content: 'abc'
    output_batches:
      - - content_equals: "abc"

  - name: wrong count
    input_batch:
      - content: 'abc'
    output_batches:
      - - content_equals: "ABC"
        - content_equals: "DEF"
"""


def test_file_predicates(spark, tmp_path):
    """file_equals / file_json_equals / file_json_contains resolve paths
    relative to the test file's directory (output.go file conditions)."""
    (tmp_path / "want.txt").write_text("HELLO")
    (tmp_path / "want.json").write_text('{"a": 1, "b": [2, 3], "extra": "x"}')
    conf = """
pipeline:
  processors:
    - switch:
        cases:
          - check: 'content().contains("{")'
            processors: []
        default: [{mapping: 'root = content().uppercase()'}]

tests:
  - name: file checks
    input_batch:
      - content: 'hello'
      - content: '{"b": [2, 3], "a": 1, "extra": "x"}'
    output_batches:
      - - file_equals: './want.txt'
        - file_json_equals: './want.json'
          file_json_contains: './want.json'
"""
    fails = run_config_tests(spark, conf, base_dir=str(tmp_path))
    assert fails == [], [str(f) for f in fails]


def test_failures_are_reported(spark):
    fails = run_config_tests(spark, FAILING)
    reasons = "\n".join(str(f) for f in fails)
    assert "wrong content" in reasons and "content_equals" in reasons
    assert "wrong message count" in reasons
    # the passing message inside the failing case still checked clean
    assert "'ABC' != 'ABC'" not in reasons


def test_target_mapping_blobl_file(spark, tmp_path):
    (tmp_path / "upper.blobl").write_text('root = content().uppercase()\n')
    conf = """
tests:
  - name: mapping unit test
    target_mapping: './upper.blobl'
    input_batch:
      - content: 'abc'
    output_batches:
      - - content_equals: "ABC"
"""
    assert run_config_tests(spark, conf, base_dir=str(tmp_path)) == []


def test_no_tests_section_raises(spark):
    with pytest.raises(ValueError, match="no tests"):
        run_config_tests(spark, "pipeline: {processors: []}")
