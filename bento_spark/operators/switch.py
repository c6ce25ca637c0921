"""switch — per-message routing.

Reference:
- `switch` processor: per-message case match, matched subset processed per
  case (/root/reference/internal/impl/pure/processor_switch.go:77,
  check/exec :104-111,181-184)
- `switch` output: route each message to the first matching output
  (output_switch.go:164)

Spark-first: expression cases are a single `F.when` chain; processor cases
split/transform/union (Catalyst merges pure-projection branches).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

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


# branch/workflow live in bento_spark.operators.branch (Branch dataclass,
# apply_branch, workflow with skip_when + row-id isolation + unknown-dep
# validation) — earlier duplicates here had weaker semantics and no callers.
