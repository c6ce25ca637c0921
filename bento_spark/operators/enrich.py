"""Enrichment joins — the reference's cache/sql_select lookup patterns.

Reference has no relational join operator; joins are stateful enrichment:
- `cache` get/set keyed by id (/root/reference/internal/impl/pure/
  processor_cache.go:150, ops :267-273) — the hydration join pattern
  (config/examples/joining_streams.yaml:32-56)
- `sql_select` processor: parameterized lookup (table/columns/where/
  args_mapping, internal/impl/sql/processor_sql_select.go:30-51)
- `cached`: memoize child results by key (processor_cached.go)

Spark-first: a lookup IS a join. Small dimension -> broadcast hash join
(explicit F.broadcast so the 100 TB fact side never shuffles); large
dimension -> sort-merge with AQE; semi/anti shapes for existence checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """cache-get / sql_select enrichment: left join fact->dim.

    broadcast_dim=True is the right default for dimension tables: the fact
    side (the stream) stays un-shuffled — at 10^12 rows a shuffle here is
    the difference between working and not.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def exists_in(fact: DataFrame, keys: DataFrame, on: Sequence[str] | str, negate: bool = False) -> DataFrame:
    """Semi/anti join: the reference expresses these via cache-add failure
    branches and dedupe-vs-seen-set (processor_dedupe.go:81)."""
    return fact.join(F.broadcast(keys), on=on, how="left_anti" if negate else "left_semi")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts (backward) or earliest with right_ts >= left_ts
    (forward) per key. Absent in the reference (SURVEY §2.7 — its nearest
    analogue is a cache holding "current value per key"); first-class for
    time-series enrichment at scale.

    Implementation is union + window (one shuffle on (key, ts), no range
    cross-product): tag sides, sort-merge within key, carry the last right
    payload forward with last(ignorenulls). This scales as a single
    repartition-by-key — the classic distributed as-of strategy — instead of
    a range-condition join that Catalyst would plan as broadcast-nested-loop.
    """
    from pyspark.sql.window import Window

    # left_ts is carried as `_ts` (re-aliased back at the end); including it
    # in the `_l_` passthrough too would emit TWO columns named left_ts and
    # make any downstream name-based reference ambiguous.
    lcols = [c for c in left.columns if c not in (key, left_ts)]
    rcols = [c for c in right.columns if c != key]
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    u = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right rows sort before left rows at equal ts => right@t matches left@t
        w = Window.partitionBy(key).orderBy(F.col("_ts").asc(), F.col("_side").asc())
    elif direction == "forward":
        w = Window.partitionBy(key).orderBy(F.col("_ts").desc(), F.col("_side").asc())
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")
    carried = [F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in rcols]
    matched_ts = F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w)
    out = (
        u.select(key, "_ts", "_side", *[f"_l_{c}" for c in lcols], *carried,
                 matched_ts.alias("_matched_ts"))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        in_tol = (
            (F.col("_ts") - F.col("_matched_ts") <= bound)
            if direction == "backward"
            else (F.col("_matched_ts") - F.col("_ts") <= bound)
        )
        out = out.select(
            key, "_ts", "_matched_ts", *[f"_l_{c}" for c in lcols],
            *[F.when(in_tol, F.col(f"_r_{c}")).alias(f"_r_{c}") for c in rcols],
        )
    # a right column sharing a left column's name (or left_ts) would emit
    # duplicate output names — suffix the right side like pandas merge_asof
    taken = set(lcols) | {key, left_ts}
    renames = (
        [F.col(key), F.col("_ts").alias(left_ts)]
        + [F.col(f"_l_{c}").alias(c) for c in lcols]
        + [F.col(f"_r_{c}").alias(c if c not in taken else f"{c}_right") for c in rcols]
    )
    return out.select(*renames)
