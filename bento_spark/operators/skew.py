"""Skew handling: salted repartition for heavy-payload stages and skewed keys.

The reference never shuffles (single process, goroutine pipeline —
/root/reference/internal/pipeline/pool.go:32-49 round-robins batches over
threads), so skew is a new, Spark-specific obligation (north rule:
"salted repartitioning to defeat clip-duration skew").

Two tools:
- `spread_by_cost`: repartition rows by a hash of (key, salt) where salt
  cardinality is derived from a per-row cost column (e.g. dur_ms). Long
  clips scatter across many partitions instead of pinning one executor.
- `salted_agg`: two-phase aggregation for skewed group keys — partial agg
  on (key, salt) then final agg on key. Classic map-side-combine shape;
  Spark already partial-aggregates, so this is only for pathological keys
  where a single reducer would still drown; AQE skew-join handles the join
  case (enabled in session.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_by_cost(
    df: DataFrame,
    cost_col: str = "dur_ms",
    num_partitions: int | None = None,
    unit_cost: int = 1000,
) -> DataFrame:
    """Repartition so heavy rows spread: partition key = xxhash64(row-key,
    salt) where salt range grows with row cost. A 30 s clip gets ~30 salts
    to land on; a 300 ms clip keeps locality.
    """
    salt_range = F.greatest(F.lit(1), (F.col(cost_col) / unit_cost).cast("int"))
    row_hash = F.xxhash64(*[F.col(c) for c in df.columns if c != "bytes"])
    salt = F.pmod(row_hash, salt_range)
    # the partition key MUST carry the row hash: a key of (salt, cost) alone
    # has only sum(salt_range) distinct values, so low-cardinality cost
    # columns (fixed-length clips -> salt_range 1) would pin the whole
    # dataset into a handful of partitions — the exact skew this exists to
    # prevent
    key = F.xxhash64(row_hash, salt)
    if num_partitions:
        return df.repartition(num_partitions, key)
    return df.repartition(key)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase agg for skewed keys.

    aggs: out_name -> (fn, col) with fn in {sum,count,min,max}.
    count/sum recombine with sum; min/max with themselves. (avg must be
    expressed as sum+count by the caller.)
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).alias("_salt")
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(out))
            final_exprs.append(F.min(out).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(out))
            final_exprs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"unsupported salted agg fn: {fn}")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
