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


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_iter: int = 3,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Distributed Lloyd's k-means for IVF coarse quantization.

    Deterministic init (seeded hyperplane projection picks spread-out seed
    rows); each iteration is ONE groupBy over the corpus: assign (vectorized
    numpy over Arrow batches) -> partial sums per cluster (map-side combine)
    -> new centroids on the driver (n_clusters x dim floats — tiny). At
    10^12 vectors run it on a sample_fraction; assignment quality degrades
    gracefully.
    """
    src = df.select(vec_col)
    if sample_fraction:
        src = src.sample(fraction=sample_fraction, seed=seed)
    # deterministic init: per LSH bucket take the hash-minimal vector
    # (min over (hash, vec) structs — stable regardless of partition order),
    # then the n_clusters lowest buckets
    bucketed = with_lsh_bucket(src, vec_col, n_bits=max(4, int(np.ceil(np.log2(n_clusters))) + 1), seed=seed)
    pick = F.min(
        F.struct(F.xxhash64(F.col(vec_col).cast("string")).alias("h"), F.col(vec_col).alias("v"))
    )["v"].alias(vec_col)
    seeds = (
        bucketed.groupBy("lsh_bucket")
        .agg(pick)
        .orderBy("lsh_bucket")
        .limit(n_clusters)
        .collect()
    )
    cents = np.stack([np.asarray(r[vec_col], dtype=np.float32) for r in seeds])
    if cents.shape[0] < n_clusters:
        n_clusters = cents.shape[0]

    for _ in range(n_iter):
        c = cents  # capture

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # emit PARTIAL SUMS per Arrow batch (cluster, vsum, n): the
            # shuffle then moves at most n_clusters rows per batch, never
            # the vectors themselves — the map-side combine k-means needs
            # at 10^12 rows
            cn = c / (np.linalg.norm(c, axis=1, keepdims=True) + 1e-9)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack([np.asarray(v, dtype=np.float32) for v in pdf[vec_col]])
                mn = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-9)
                cluster = (mn @ cn.T).argmax(axis=1)
                rows = []
                for cid in np.unique(cluster):
                    sel = mat[cluster == cid]
                    rows.append((int(cid), sel.sum(axis=0).astype(float).tolist(), int(sel.shape[0])))
                yield pd.DataFrame(rows, columns=["cluster", "vsum", "n"])

        partials = src.mapInPandas(assign, schema="cluster int, vsum array<double>, n long")
        sums = (
            partials.groupBy("cluster")
            .agg(
                F.aggregate(
                    F.collect_list("vsum"),  # ≤ one tiny row per (batch, cluster)
                    F.array([F.lit(0.0)] * cents.shape[1]),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("vsum"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        new = cents.copy()
        for r in sums:
            if r.n > 0:
                new[r.cluster] = np.asarray(r.vsum, dtype=np.float32) / r.n
        cents = new
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: corpus rows are assigned to their nearest
    centroid (inverted list); each query probes its n_probe nearest lists
    and exact-reranks only those candidates. The join is an equi-join on
    the cluster id — the IVF analogue of the LSH bucket join.
    """
    c = centroids
    cn = c / (np.linalg.norm(c, axis=1, keepdims=True) + 1e-9)

    def assign_factory(col: str, out: str, top_n: int):
        schema_extra = f"{out} int" if top_n == 1 else f"{out} array<int>"

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack([np.asarray(v, dtype=np.float32) for v in pdf[col]])
                mn = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-9)
                sims = mn @ cn.T
                out_df = pdf.copy()
                if top_n == 1:
                    out_df[out] = sims.argmax(axis=1).astype(np.int32)
                else:
                    idx = np.argsort(-sims, axis=1)[:, :top_n].astype(np.int32)
                    out_df[out] = list(idx)
                yield out_df

        return assign, schema_extra

    cass, cextra = assign_factory(vec_col, "cluster", 1)
    corpus_schema = f"neighbor_id bigint, {vec_col} array<float>, {cextra}"
    corpus_a = corpus.select(F.col(id_col).cast("bigint").alias("neighbor_id"), vec_col).mapInPandas(
        cass, schema=corpus_schema
    )
    qass, qextra = assign_factory("_qvec", "probes", n_probe)
    q_schema = f"{query_id_col} bigint, _qvec array<float>, {qextra}"
    queries_a = (
        queries.select(F.col(query_id_col).cast("bigint"), F.col(vec_col).alias("_qvec"))
        .mapInPandas(qass, schema=q_schema)
        .withColumn("cluster", F.explode("probes"))
        .drop("probes")
    )
    joined = corpus_a.join(F.broadcast(queries_a), on="cluster").filter(
        F.col(query_id_col) != F.col("neighbor_id")
    )
    sim = cosine(F.col(vec_col), F.col("_qvec"))
    scored = joined.select(F.col(query_id_col), F.col("neighbor_id"), F.round(sim, 6).alias("cos_sim"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos_sim")
    )
