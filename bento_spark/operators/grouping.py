"""group_by / group_by_value / dedupe — grouping & stateful dedupe.

Reference:
- `group_by`: split batch into N groups by ordered predicate list, each
  group getting its own processors, non-matching rows to a default group
  (/root/reference/internal/impl/pure/processor_group_by.go:75, exec
  :130-185).
- `group_by_value`: group key from an interpolated value
  (processor_group_by_value.go:21).
- `dedupe`: drop message if key already seen in a cache
  (processor_dedupe.go:81).

Spark-first: the group label is a single `F.when` chain column (one
projection, no shuffle until an agg needs it); per-group processor chains
are conditional transforms over the labeled frame. Dedupe is
`dropDuplicates` (batch) / `dropDuplicatesWithinWatermark` (streaming) —
Spark's state store replaces the reference's cache resource.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GROUP_COL = "_group"


def group_by(df: DataFrame, checks: Sequence[tuple[str, Column]], default: str = "default") -> DataFrame:
    """Label rows with the first matching check (ordered), else default."""
    expr = None
    for name, cond in checks:
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(default) if expr is None else expr.otherwise(F.lit(default))
    return df.withColumn(GROUP_COL, expr)


def group_by_value(df: DataFrame, key: Column | str) -> DataFrame:
    """Label rows by a value key (processor_group_by_value.go:21)."""
    return df.withColumn(GROUP_COL, F.col(key) if isinstance(key, str) else key)


def per_group(
    df: DataFrame,
    transforms: dict[str, Callable[[DataFrame], DataFrame]],
    group_col: str = GROUP_COL,
) -> DataFrame:
    """Run each group's processor chain on its slice and union back.

    For expression-only chains Catalyst merges the branches; for UDF chains
    each branch is its own stage — same cost as the reference's per-group
    sub-pipelines, but distributed.
    """
    parts = []
    named = list(transforms.items())
    others = df
    for name, t in named:
        # eqNullSafe: a NULL group label must land in the default slice —
        # `== name` AND `!= name` are both NULL for it, so plain comparisons
        # would silently drop the row from every branch
        parts.append(t(df.filter(F.col(group_col).eqNullSafe(name))))
        others = others.filter(~F.col(group_col).eqNullSafe(name))
    parts.append(others)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def dedupe(df: DataFrame, keys: Sequence[str], watermark: tuple[str, str] | None = None) -> DataFrame:
    """Exact dedupe by key.

    Batch: dropDuplicates. Streaming: pass watermark=(event_col, delay) to
    bound state (dropDuplicatesWithinWatermark) — the scalable analogue of
    the reference's TTL'd cache (processor_dedupe.go:25-75).
    """
    if watermark is not None:
        col, delay = watermark
        wdf = df.withWatermark(col, delay)
        return wdf.dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))
