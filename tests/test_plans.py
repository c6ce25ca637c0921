"""Physical-plan audits: the 100 TB design properties the queries rely on.

Checks the optimized plans (explain output) for:
- predicate pushdown into the parquet scan (PushedFilters),
- column pruning (ReadSchema carries only needed columns),
- broadcast hash joins for dimension lookups (no shuffle of the fact side),
- whole-stage codegen coverage on the hot relational path,
- partial (map-side) aggregation before the shuffle.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_filter_pushdown_and_pruning(spark):
    df = em.q_filter_revenue(spark, SF)
    p = plan_of(df)
    assert "PushedFilters: [" in p
    assert "l_discount" in p.split("PushedFilters:")[1][:300]
    # projection pruning: scan must not read all 7 lineitem columns
    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert read_schema is not None
    cols = read_schema.group(1)
    assert "l_extendedprice" in cols and "l_comment" not in cols and "l_shipdate" not in cols


def test_lookup_join_is_broadcast(spark):
    # audit the operator-API plan alone: q_lookup_join folds in the YAML
    # path + exceptAll cross-check (r05), which legitimately adds exchanges
    p = plan_of(em._lookup_join_op(spark, SF))
    assert "BroadcastHashJoin" in p
    # the big (fact) side must not be exchanged for the join: the only
    # shuffle allowed is the final groupBy agg
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1


def test_multi_join_broadcasts_dims(spark):
    p = plan_of(em.q_multi_join(spark, SF))
    assert p.count("BroadcastHashJoin") >= 2  # nation & region at minimum


def test_partial_aggregation_before_shuffle(spark):
    p = plan_of(em.q_pricing_summary(spark, SF))
    # map-side combine: a partial HashAggregate must appear below the Exchange
    assert re.search(r"partial_(sum|count|avg)", p)
    # the whole relational path compiles to generated code (no interpreter,
    # no Python): codegen-mode explain lists the generated stages
    cg = plan_of(em.q_pricing_summary(spark, SF), mode="codegen")
    assert "WholeStageCodegen" in cg


def test_semi_anti_join_shapes(spark):
    p = plan_of(em.q_semi_anti(spark, SF))
    assert "LeftSemi" in p and "LeftAnti" in p


def test_window_query_single_shuffle(spark):
    p = plan_of(em.q_tumbling_window(spark, SF))
    # one hash-partition exchange for the window/key agg, nothing else
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_asof_join_no_cartesian(spark):
    p = plan_of(em.q_asof_join(spark, SF))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_error_protocol_stays_in_codegen(spark):
    # try/catch error-column protocol is pure projection: no Python, no UDF
    p = plan_of(em.q_error_protocol(spark, SF))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_text_stats_prunes_documents(spark):
    p = plan_of(em.q_text_stats(spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and "source" not in m.group(1) and "lang" not in m.group(1)


def test_ann_plans_have_no_interpreted_hofs(spark):
    """The ANN hot paths must score in vectorized numpy (mapInPandas), not
    interpreted Column higher-order functions: zip_with/aggregate over
    per-row arrays evaluate outside whole-stage codegen (3-8x penalty).
    The only Python nodes allowed are Arrow-batched mapInPandas stages."""
    for q in ("ann_cosine", "ann_lsh", "embedding_neardup"):
        df = em.queries()[q](spark, SF)
        p = plan_of(df)
        assert "zip_with" not in p and "aggregate(" not in p, f"{q} uses interpreted HOFs"
        assert "BatchEvalPython" not in p, f"{q} uses row-at-a-time Python UDFs"
