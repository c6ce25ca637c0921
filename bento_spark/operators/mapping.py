"""mapping / mutation / filter: the projection+compute operator.

Reference: `mapping` runs a Bloblang mapping per message; `root = deleted()`
drops the message (= filter); a failed mapping keeps the original message
and flags the error (/root/reference/internal/impl/pure/processor_mapping.go:15,
exec :146-163). `mutation` assigns in place (processor_mutation.go:15).

Spark-first: a mapping IS a `select`/`withColumns` of Column expressions —
Catalyst codegen executes it; there is no interpreter. `deleted()` becomes
a `filter`; the error branch becomes the error-column protocol
(operators.errors). The Bloblang-subset compiler in
bento_spark.functions.bloblang produces the Columns used here.
"""

from __future__ import annotations

from collections.abc import Mapping as _Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bento_spark.operators.errors import ensure_error_col


def mapping(df: DataFrame, columns: _Mapping[str, Column], keep: bool = False) -> DataFrame:
    """Full re-map: output has exactly `columns` (plus error col). keep=True
    behaves like mutation (withColumns)."""
    if keep:
        return mutation(df, columns)
    df = ensure_error_col(df)
    return df.select(*[c.alias(n) for n, c in columns.items()], F.col("error"))


def mutation(df: DataFrame, columns: _Mapping[str, Column]) -> DataFrame:
    """In-place assignment semantics (processor_mutation.go:15)."""
    return df.withColumns(dict(columns))


def filter_(df: DataFrame, predicate: Column) -> DataFrame:
    """`root = deleted() if <pred>` — rows matching are dropped when the
    predicate marks deletion; here predicate selects rows to KEEP."""
    return df.filter(predicate)


def bounds_check(
    df: DataFrame,
    col: str = "bytes",
    min_len: int = 0,
    max_len: int | None = None,
) -> DataFrame:
    """Drop rows whose payload length is outside [min_len, max_len].

    Reference: processor_bounds_check.go:46 (drops parts/batches outside
    size limits)."""
    cond = F.length(F.col(col)) >= F.lit(min_len)
    if max_len is not None:
        cond = cond & (F.length(F.col(col)) <= F.lit(max_len))
    return df.filter(cond)
