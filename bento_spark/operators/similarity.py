"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against the (huge) corpus, dot products as JVM higher-order functions
(zip_with + aggregate), top-k as a window rank. No Python in the hot path.

Scale path: LSH bucketing via random-hyperplane sign bits (deterministic
hyperplanes from a seeded hash, computed vectorized in numpy over Arrow
batches, broadcast-free) — candidates only within matching buckets, then
exact cosine re-rank. An IVF variant would precompute centroids with
k-means; LSH avoids the training pass and suits streaming ingest.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. queries is broadcast (small); corpus
    never shuffles until the per-query top-k (rank over query partitions).
    Returns (query_id, neighbor_id, rank, cos_sim)."""
    q = F.broadcast(queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec")))
    joined = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)).crossJoin(q)
    sim = cosine(F.col(vec_col), F.col("_qvec"))
    scored = joined.select(
        F.col(query_id_col), F.col("neighbor_id"), F.round(sim, 6).alias("cos_sim")
    ).filter(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos_sim")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float32)


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_bits: int = 12,
    seed: int = 42,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (int) — vectorized sign-bit packing
    over Arrow batches; hyperplanes regenerated per executor from the seed
    (cheap, avoids a broadcast)."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += f", {out_col} bigint"

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        weights = (1 << np.arange(n_bits, dtype=np.int64))
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{out_col: pd.Series([], dtype="int64")})
                continue
            mat = np.stack([np.asarray(v, dtype=np.float32) for v in pdf[vec_col]])
            if planes is None:
                planes = _hyperplanes(mat.shape[1], n_bits, seed)
            signs = (mat @ planes.T) > 0
            buckets = (signs.astype(np.int64) * weights).sum(axis=1)
            out = pdf.copy()
            out[out_col] = buckets
            yield out

    return df.mapInPandas(bucketize, schema=out_schema)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; exact
    cosine re-rank within bucket. The bucket equi-join replaces the cross
    join — at 10^12 vectors that's the difference between a broadcast-NL
    explosion and a hash join on a 2^n_bits-ary key."""
    cb = with_lsh_bucket(corpus.select(F.col(id_col).alias("neighbor_id"), vec_col), vec_col, n_bits, seed)
    qb = with_lsh_bucket(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec")),
        "_qvec",
        n_bits,
        seed,
    )
    joined = cb.join(F.broadcast(qb), on="lsh_bucket").filter(F.col(query_id_col) != F.col("neighbor_id"))
    sim = cosine(F.col(vec_col), F.col("_qvec"))
    scored = joined.select(F.col(query_id_col), F.col("neighbor_id"), F.round(sim, 6).alias("cos_sim"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos_sim")
    )
