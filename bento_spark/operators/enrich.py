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
