"""Event-time windowing: tumbling / sliding / session.

Reference: ALL windowing lives in the `system_window` buffer —
tumbling & sliding over processing or event time with size/slide/offset/
allowed_lateness, flushing when the wall clock passes window end + lateness
(/root/reference/internal/impl/pure/buffer_system_window.go:16-120, window
math :234-266, late-drop :296-353). Session windows don't exist in the
reference; the north rule requires them.

Spark mapping (strictly stronger semantics):
- size/slide  -> F.window(event_col, size, slide)
- offset      -> F.window(..., startTime=offset)
- allowed_lateness -> withWatermark(event_col, lateness): Spark's
  event-time watermark drops rows older than (max event time - lateness) —
  per-stream event-time, vs the reference's wall-clock flush. For the same
  input and watermark the emitted (window, key) rows match.
- window_end_timestamp metadata (buffer_system_window.go:355-401 stamps it
  at flush) -> the `window.end` struct field, selected as a column.

The aggregation dict maps output-column name -> Column aggregate, so
callers control exact output naming (the oracle-parity requirement).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _windowed(
    df: DataFrame,
    window_col: Column,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
    watermark: tuple[str, str] | None,
) -> DataFrame:
    if watermark is not None:
        df = df.withWatermark(*watermark)
    grouped = df.groupBy(window_col.alias("win"), *[F.col(k) for k in keys])
    out = grouped.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def tumbling_windowed(
    df: DataFrame,
    event_col: str,
    size: str,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
    offset: str | None = None,
    allowed_lateness: str | None = None,
) -> DataFrame:
    win = F.window(F.col(event_col), size, startTime=offset) if offset else F.window(F.col(event_col), size)
    wm = (event_col, allowed_lateness) if allowed_lateness else None
    return _windowed(df, win, keys, aggs, wm)


def sliding_windowed(
    df: DataFrame,
    event_col: str,
    size: str,
    slide: str,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
    offset: str | None = None,
    allowed_lateness: str | None = None,
) -> DataFrame:
    win = (
        F.window(F.col(event_col), size, slide, startTime=offset)
        if offset
        else F.window(F.col(event_col), size, slide)
    )
    wm = (event_col, allowed_lateness) if allowed_lateness else None
    return _windowed(df, win, keys, aggs, wm)


def session_windowed(
    df: DataFrame,
    event_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
    allowed_lateness: str | None = None,
) -> DataFrame:
    win = F.session_window(F.col(event_col), gap)
    wm = (event_col, allowed_lateness) if allowed_lateness else None
    if wm is not None:
        df = df.withWatermark(*wm)
    grouped = df.groupBy(win, *[F.col(k) for k in keys])
    out = grouped.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("session_window.start").alias("window_start"),
        F.col("session_window.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )
