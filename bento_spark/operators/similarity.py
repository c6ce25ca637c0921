"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k. Scale paths: LSH (random-hyperplane
sign buckets) and IVF (k-means coarse quantizer + n_probe lists).

Execution model (the 100 TB design): every scoring pass is ONE
mapInPandas over the (huge, never-shuffled) corpus with the (small) query
set captured driver-side — the broadcast-join pattern without the join.
Per Arrow batch the scores are a single float64 matmul, and only the
per-batch top-k rows per query leave Python, so the shuffle feeding the
global top-k carries at most k x n_queries x n_partitions tiny rows.
The global top-k is a window rank over those candidates (exact: the global
top-k is a subset of the union of per-batch top-ks under the same
ordering).

Why not Column-level cosine: Spark evaluates higher-order functions
(F.aggregate / F.zip_with) INTERPRETED — no whole-stage codegen — a
measured 3-8x penalty per row on 64-float arrays (see
dedupe_fuzzy.py docstring). The Column helpers below remain for small
expressions, but no hot path uses them.

Determinism: scores are rounded to 6 dp BEFORE ranking and ties break on
ascending neighbor id, in both the per-batch and global selections — the
same ordering the DuckDB oracles use, and independent of partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOPK_SCHEMA = "query_id bigint, neighbor_id bigint, cos_sim double"


def dot(a: Column, b: Column) -> Column:
    """Column-level dot product (interpreted HOF — composition only, not
    for hot loops; see module docstring)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_matrix(series: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-300)


def _collect_queries(queries: DataFrame, query_id_col: str, vec_col: str):
    """Driver-side capture of the query set (the 'broadcast' side). Queries
    are the small side by contract — same scale assumption as broadcasting
    a dimension table."""
    rows = queries.select(query_id_col, vec_col).collect()
    qids = np.array([int(r[0]) for r in rows], dtype=np.int64)
    qmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    return qids, qmat


def _batch_topk(qids_sel: np.ndarray, nids: np.ndarray, sims: np.ndarray, k: int) -> pd.DataFrame:
    """Per-batch top-k per query from a (n_rows x n_sel_queries) rounded
    score matrix. Ordering: cos desc, neighbor_id asc (oracle ordering)."""
    out_q, out_n, out_s = [], [], []
    for j, qid in enumerate(qids_sel):
        col = sims[:, j]
        mask = nids != qid
        cand_n, cand_s = nids[mask], col[mask]
        if cand_n.size == 0:
            continue
        take = min(k, cand_n.size)
        # lexsort: last key primary -> sort by (-score, neighbor_id)
        order = np.lexsort((cand_n, -cand_s))[:take]
        out_q.extend([qid] * take)
        out_n.extend(cand_n[order])
        out_s.extend(cand_s[order])
    return pd.DataFrame({"query_id": pd.array(out_q, dtype="int64"),
                         "neighbor_id": pd.array(out_n, dtype="int64"),
                         "cos_sim": pd.array(out_s, dtype="float64")})


def _global_topk(cands: DataFrame, k: int, query_id_col: str) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("query_id").alias(query_id_col), "neighbor_id", "rank", "cos_sim")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: one vectorized pass over the corpus
    (numpy matmul per Arrow batch), per-batch top-k, global window rank.
    Returns (query_id, neighbor_id, rank, cos_sim)."""
    qids, qmat = _collect_queries(queries, query_id_col, vec_col)
    qn = _normalize(qmat)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize(_as_matrix(pdf[vec_col]))
            nids = pdf["_nid"].to_numpy(dtype=np.int64)
            sims = np.round(mat @ qn.T, 6)
            yield _batch_topk(qids, nids, sims, k)

    src = corpus.select(F.col(id_col).cast("bigint").alias("_nid"), vec_col)
    cands = src.mapInPandas(score, schema=TOPK_SCHEMA)
    return _global_topk(cands, k, query_id_col)


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float64)


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (mat @ planes.T) > 0
    weights = 1 << np.arange(planes.shape[0], dtype=np.int64)
    return (signs.astype(np.int64) * weights).sum(axis=1)


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
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{out_col: pd.Series([], dtype="int64")})
                continue
            mat = _as_matrix(pdf[vec_col])
            if planes is None:
                planes = _hyperplanes(mat.shape[1], n_bits, seed)
            out = pdf.copy()
            out[out_col] = _bucket_of(mat, planes)
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
    """Approximate top-k: candidates share the query's LSH bucket. One pass
    over the corpus — bucket assignment, scoring against the (captured)
    queries of that bucket, and per-batch top-k all happen inside the same
    Arrow batch; no candidate join materializes. At 10^12 vectors the
    corpus is read once and only k-row candidate sets shuffle."""
    qids, qmat = _collect_queries(queries, query_id_col, vec_col)
    dim = qmat.shape[1]
    planes = _hyperplanes(dim, n_bits, seed)
    qbuckets = _bucket_of(qmat, planes)
    qn = _normalize(qmat)
    # bucket -> query row indices (driver-side; tiny)
    by_bucket: dict[int, np.ndarray] = {
        int(b): np.where(qbuckets == b)[0] for b in np.unique(qbuckets)
    }

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize(_as_matrix(pdf[vec_col]))
            nids = pdf["_nid"].to_numpy(dtype=np.int64)
            # bucket from the already-stacked matrix: sign(v . plane) is
            # invariant under the positive per-row scaling _normalize applies,
            # and _as_matrix is the dominant Python-side cost per batch
            buckets = _bucket_of(mat, planes)
            outs = []
            for b in np.unique(buckets):
                qsel = by_bucket.get(int(b))
                if qsel is None or qsel.size == 0:
                    continue
                rows = buckets == b
                sims = np.round(mat[rows] @ qn[qsel].T, 6)
                outs.append(_batch_topk(qids[qsel], nids[rows], sims, k))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    src = corpus.select(F.col(id_col).cast("bigint").alias("_nid"), vec_col)
    cands = src.mapInPandas(score, schema=TOPK_SCHEMA)
    return _global_topk(cands, k, query_id_col)


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
    cents = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seeds])
    if cents.shape[0] < n_clusters:
        n_clusters = cents.shape[0]

    for _ in range(n_iter):
        c = cents  # capture

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # emit PARTIAL SUMS per Arrow batch (cluster, vsum, n): the
            # shuffle then moves at most n_clusters rows per batch, never
            # the vectors themselves — the map-side combine k-means needs
            # at 10^12 rows
            cn = _normalize(c)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = _as_matrix(pdf[vec_col])
                mn = _normalize(mat)
                cluster = (mn @ cn.T).argmax(axis=1)
                rows = []
                for cid in np.unique(cluster):
                    sel = mat[cluster == cid]
                    rows.append((int(cid), sel.sum(axis=0).astype(float).tolist(), int(sel.shape[0])))
                yield pd.DataFrame(rows, columns=["cluster", "vsum", "n"])

        partials = src.mapInPandas(assign, schema="cluster int, vsum array<double>, n long")
        # array_sort the collected partials so the fold order (and therefore
        # the float sum) is deterministic regardless of partition arrival
        sums = (
            partials.groupBy("cluster")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list("vsum")),  # ≤ one tiny row per (batch, cluster)
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
                new[r.cluster] = np.asarray(r.vsum, dtype=np.float64) / r.n
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
    """IVF approximate top-k: each query probes its n_probe nearest
    centroid lists; corpus rows are scored only against the queries probing
    their cluster. Like lsh_topk this is ONE pass over the corpus — the
    inverted-list 'join' is a driver-side cluster->queries dict, so no
    candidate rows materialize and only per-batch top-ks shuffle."""
    cn = _normalize(np.asarray(centroids, dtype=np.float64))
    qids, qmat = _collect_queries(queries, query_id_col, vec_col)
    qn = _normalize(qmat)
    qsims = qn @ cn.T
    # stable probe selection: sort by (-sim, cluster_id)
    probes = np.argsort(-qsims, axis=1, kind="stable")[:, :n_probe]
    by_cluster: dict[int, list[int]] = {}
    for qi in range(qids.size):
        for c in probes[qi]:
            by_cluster.setdefault(int(c), []).append(qi)
    by_cluster_np = {c: np.array(v, dtype=np.int64) for c, v in by_cluster.items()}

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize(_as_matrix(pdf[vec_col]))
            nids = pdf["_nid"].to_numpy(dtype=np.int64)
            cluster = (mat @ cn.T).argmax(axis=1)
            outs = []
            for c in np.unique(cluster):
                qsel = by_cluster_np.get(int(c))
                if qsel is None or qsel.size == 0:
                    continue
                rows = cluster == c
                sims = np.round(mat[rows] @ qn[qsel].T, 6)
                outs.append(_batch_topk(qids[qsel], nids[rows], sims, k))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    src = corpus.select(F.col(id_col).cast("bigint").alias("_nid"), vec_col)
    cands = src.mapInPandas(score, schema=TOPK_SCHEMA)
    return _global_topk(cands, k, query_id_col)


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 100_000,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b,
    cos_sim >= threshold) — the VERIFICATION-GRADE twin of the LSH/IVF
    paths, O(n^2) by design and explicitly sf-bounded: the corpus matrix is
    captured driver-side and the pass refuses corpora above max_rows so a
    scale bump fails loudly instead of exploding. Production near-dup at
    10^12 rows goes through lsh_topk / minhash (bucketed, not all-pairs).

    Scoring is distributed: one mapInPandas pass over the corpus computes
    each partition's rows against the captured matrix (numpy matmul), so
    the n^2 flops still spread across executors.
    """
    n = corpus.count()
    if n > max_rows:
        raise ValueError(
            f"cosine_neardup_pairs is the exact O(n^2) verification twin and is "
            f"capped at {max_rows} rows (corpus has {n}); use the LSH/MinHash path at scale"
        )
    rows = corpus.select(id_col, vec_col).collect()
    all_ids = np.array([int(r[0]) for r in rows], dtype=np.int64)
    all_mat = _normalize(np.stack([np.asarray(r[1], dtype=np.float64) for r in rows]))

    def pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize(_as_matrix(pdf[vec_col]))
            ids = pdf["_nid"].to_numpy(dtype=np.int64)
            sims = np.round(mat @ all_mat.T, 6)
            keep = (sims >= threshold) & (ids[:, None] < all_ids[None, :])
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame({
                "id_a": pd.array(ids[ai], dtype="int64"),
                "id_b": pd.array(all_ids[bj], dtype="int64"),
                "cos_sim": pd.array(sims[ai, bj], dtype="float64"),
            })

    src = corpus.select(F.col(id_col).cast("bigint").alias("_nid"), vec_col)
    return src.mapInPandas(pairs, schema="id_a bigint, id_b bigint, cos_sim double")
