"""Error-column protocol: the Spark equivalent of per-message error flags.

Reference: a message carries an attached error
(/root/reference/internal/message/part.go:69-78); `try` runs children until
the first error (/root/reference/internal/impl/pure/processor_try.go:15),
`catch` runs only on errored messages then clears the flag
(processor_catch.go:13); outputs route on it (`reject_errored`
output_reject_errored.go:19, `fallback` output_fallback.go:18).

Here errored rows stay in-band as a nullable `error string` column:
- `try_` applies a transform only to rows with error IS NULL,
- `catch_` applies only to errored rows, then clears the error,
- `split_errors` routes rows to (main, dlq) — the DLQ write path.
All of it is `F.when` expression composition — Catalyst folds it into the
same projection, so the protocol costs nothing at scale (no extra shuffle,
no UDF).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERROR_COL = "error"


def ensure_error_col(df: DataFrame) -> DataFrame:
    if ERROR_COL not in df.columns:
        df = df.withColumn(ERROR_COL, F.lit(None).cast("string"))
    return df


def set_error_when(df: DataFrame, cond: Column, message: Column | str) -> DataFrame:
    """Flag rows matching cond with an error (first error wins, as in the
    reference where an already-errored part short-circuits try chains)."""
    df = ensure_error_col(df)
    msg = F.lit(message) if isinstance(message, str) else message
    return df.withColumn(
        ERROR_COL, F.when(F.col(ERROR_COL).isNotNull(), F.col(ERROR_COL)).when(cond, msg)
    )


def try_(df: DataFrame, *transforms: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """Apply transforms, but leave rows that already carry an error
    untouched by columns the transform modifies.

    Column-level transforms must express their own error capture via
    `set_error_when`; `try_` guarantees already-errored rows short-circuit:
    implemented by splitting on the error flag, transforming the clean part,
    and unioning back. For pure projections Catalyst collapses the union
    branches into one stage.
    """
    df = ensure_error_col(df)
    clean = df.filter(F.col(ERROR_COL).isNull())
    errored = df.filter(F.col(ERROR_COL).isNotNull())
    for t in transforms:
        clean = ensure_error_col(t(clean))
    return clean.unionByName(errored, allowMissingColumns=True)


def catch_(df: DataFrame, *transforms: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """Apply transforms only to errored rows, then clear the error flag."""
    df = ensure_error_col(df)
    clean = df.filter(F.col(ERROR_COL).isNull())
    errored = df.filter(F.col(ERROR_COL).isNotNull())
    for t in transforms:
        errored = ensure_error_col(t(errored))
    errored = errored.withColumn(ERROR_COL, F.lit(None).cast("string"))
    return clean.unionByName(errored, allowMissingColumns=True)


def split_errors(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(main, dlq): reject_errored semantics — errored rows go to the DLQ
    sink, the rest continue. (Spark cannot nack to the source; a DLQ table
    is the idiomatic exactly-once equivalent.)"""
    df = ensure_error_col(df)
    return df.filter(F.col(ERROR_COL).isNull()), df.filter(F.col(ERROR_COL).isNotNull())
