"""switch / branch / workflow — routing & composition.

Reference:
- `switch` processor: per-message case match, matched subset processed per
  case (/root/reference/internal/impl/pure/processor_switch.go:77,
  check/exec :104-111,181-184)
- `switch` output: route each message to the first matching output
  (output_switch.go:164)
- `branch`: request_map -> children -> result_map merged back
  (processor_branch.go:152, fields :25-27)
- `workflow`: DAG of branches in topological order
  (processor_workflow.go:252; DAG resolution
  processor_workflow_branch_map.go:59-76)

Spark-first: expression cases are a single `F.when` chain; processor cases
split/transform/union (Catalyst merges pure-projection branches); workflow
is a topo-sorted list of stage functions — Catalyst parallelizes
independent subtrees on its own.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from graphlib import TopologicalSorter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def switch_expr(cases: Sequence[tuple[Column, Column]], default: Column | None = None) -> Column:
    """Expression-level switch: first matching check wins."""
    out = None
    for cond, val in cases:
        out = F.when(cond, val) if out is None else out.when(cond, val)
    if out is None:
        raise ValueError("switch needs at least one case")
    return out.otherwise(default) if default is not None else out


def switch_transform(
    df: DataFrame,
    cases: Sequence[tuple[Column, Callable[[DataFrame], DataFrame]]],
    default: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Processor-level switch: each row is processed by the FIRST matching
    case's chain (processor_switch.go:181-184 fall-through-off semantics)."""
    remaining = df
    outs: list[DataFrame] = []
    for cond, t in cases:
        outs.append(t(remaining.filter(cond)))
        remaining = remaining.filter(~F.coalesce(cond, F.lit(False)))
    outs.append(default(remaining) if default else remaining)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o, allowMissingColumns=True)
    return res


def branch(
    df: DataFrame,
    request: Callable[[DataFrame], DataFrame],
    result_cols: Sequence[str],
    key: str,
) -> DataFrame:
    """branch: run `request` on a projected copy, join the result columns
    back by `key` (preserving all source columns). For expression-only
    requests prefer plain withColumns — this exists for child chains that
    change cardinality or need isolation (processor_branch.go:152)."""
    derived = request(df).select(key, *result_cols)
    return df.join(derived, on=key, how="left")


def workflow(
    df: DataFrame,
    stages: dict[str, tuple[Sequence[str], Callable[[DataFrame], DataFrame]]],
) -> DataFrame:
    """DAG of named stages: stages[name] = (dependencies, transform).

    Topological order via stdlib graphlib (the reference solves the same
    problem with its dependencysolver, processor_workflow_branch_map.go:59-76).
    Each transform receives the frame produced so far; Catalyst handles
    actual parallelism of independent column subtrees.
    """
    ts = TopologicalSorter({name: set(deps) for name, (deps, _) in stages.items()})
    for name in ts.static_order():
        _, t = stages[name]
        df = t(df)
    return df
