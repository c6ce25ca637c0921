"""branch / workflow — composition processors.

Reference semantics:
- `branch`: `request_map` projects a request from each message, child
  processors run on it, `result_map` merges the result back into the
  ORIGINAL message (which is preserved untouched otherwise); a request_map
  yielding `deleted()` skips the branch for that message
  (/root/reference/internal/impl/pure/processor_branch.go:152, fields
  :25-27).
- `workflow`: a DAG of named branches executed in dependency order, with
  independent branches in parallel; order is auto-resolved topologically
  (processor_workflow.go:252; DAG resolution
  processor_workflow_branch_map.go:59-76).

Spark-first: a branch whose child is expression-only is just derived-column
composition — Catalyst fuses everything into one projection, so N branches
cost zero extra passes. A branch whose child needs a relational op (join,
agg) projects `(row_id, request)`, applies the child, and joins back on
row_id. The workflow's "parallel where possible" is free: Catalyst already
evaluates independent expression subtrees in one stage; we only guarantee
dependency ORDER.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROW_ID = "_row_id"


@dataclass
class Branch:
    """One named branch: request projection -> child -> result merge.

    request_map: dict of request-col-name -> Column (projected copy given to
    the child), or None to hand the child the full frame.
    processors:  DataFrame -> DataFrame over the request projection. If the
    child preserves row cardinality and ROW_ID, results join back 1:1.
    result_map:  dict of original-frame col-name -> Column over the child's
    output columns (prefixed available as-is).
    skip_when:   rows matching this predicate bypass the branch (their
    result columns stay NULL) — `root = deleted()` in request_map.
    """

    name: str
    request_map: dict[str, Column] | None
    processors: Callable[[DataFrame], DataFrame]
    result_map: dict[str, Column]
    skip_when: Column | None = None
    depends_on: Sequence[str] = field(default_factory=tuple)


def _with_row_id(df: DataFrame) -> DataFrame:
    if ROW_ID in df.columns:
        return df
    return df.withColumn(ROW_ID, F.monotonically_increasing_id())


def apply_branch(df: DataFrame, br: Branch) -> DataFrame:
    """Run one branch and merge its result columns into the original frame."""
    had_row_id = ROW_ID in df.columns
    df = _with_row_id(df)
    req = df
    if br.skip_when is not None:
        req = req.filter(~F.coalesce(br.skip_when, F.lit(False)))
    if br.request_map is not None:
        req = req.select(F.col(ROW_ID), *[c.alias(n) for n, c in br.request_map.items()])
    out = br.processors(req)
    if ROW_ID not in out.columns:
        raise ValueError(f"branch {br.name}: child must preserve {ROW_ID}")
    # result columns that already exist in df: stage under a temp name and
    # OVERWRITE for non-skipped rows (skipped rows keep their original
    # value, reference: branch leaves the message untouched) — a bare join
    # would emit two ambiguous same-named columns
    res = out.select(
        F.col(ROW_ID), *[c.alias(f"_res_{n}") for n, c in br.result_map.items()]
    )
    merged = df.join(res, ROW_ID, "left")
    skipped = F.coalesce(br.skip_when, F.lit(False)) if br.skip_when is not None else F.lit(False)
    for n in br.result_map:
        staged = F.col(f"_res_{n}")
        merged = merged.withColumn(
            n, staged if n not in df.columns else F.when(skipped, F.col(n)).otherwise(staged)
        ).drop(f"_res_{n}")
    return merged if had_row_id else merged.drop(ROW_ID)


def apply_branch_inline(df: DataFrame, br: Branch) -> DataFrame:
    """Fast path for expression-only branches: no join, pure projection.

    Valid when `processors` is None-equivalent (identity) — result_map
    columns are computed directly over the request columns. This is what
    most reference branches (mapping children) compile to.
    """
    env = df
    if br.request_map:
        for n, c in br.request_map.items():
            env = env.withColumn(n, c)
    for n, c in br.result_map.items():
        if br.skip_when is not None:
            # skipped rows keep their ORIGINAL value when the target column
            # exists (reference: untouched message), NULL only for new cols
            keep = F.col(n) if n in df.columns else F.lit(None)
            val = F.when(~F.coalesce(br.skip_when, F.lit(False)), c).otherwise(keep)
        else:
            val = c
        env = env.withColumn(n, val)
    drop = [n for n in (br.request_map or {}) if n not in br.result_map]
    return env.drop(*drop)


def workflow(df: DataFrame, branches: Sequence[Branch], inline: bool = True) -> DataFrame:
    """Execute a DAG of branches in topological order
    (processor_workflow.go:252). Cycles raise; independent branches are
    fused by Catalyst into the same stage (its "parallel where possible")."""
    ts: TopologicalSorter[str] = TopologicalSorter()
    by_name = {b.name: b for b in branches}
    for b in branches:
        for dep in b.depends_on:
            if dep not in by_name:
                raise ValueError(f"workflow: branch {b.name} depends on unknown {dep}")
        ts.add(b.name, *b.depends_on)
    order = list(ts.static_order())  # raises CycleError on cycles
    for name in order:
        br = by_name[name]
        df = apply_branch_inline(df, br) if inline else apply_branch(df, br)
    return df
