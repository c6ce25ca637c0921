"""Near-duplicate detection: exact-hash, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine.

Reference analogue: only exact `dedupe` via cache
(/root/reference/internal/impl/pure/processor_dedupe.go:81); the fuzzy
family is the training-data-pipeline extension this engine adds.

Scale design:
- exact: hash-groupBy — one shuffle on the fingerprint.
- ngram-jaccard (exact): explode + self-join on shingle — correct but
  O(pairs); used as the small-scale oracle for the LSH path.
- MinHash+LSH: shingle -> k xxhash64 min-hashes (all JVM-side higher-order
  functions, NO Python) -> band buckets -> join within bucket -> verify
  with exact Jaccard. At 100 TB the band-bucket join is the only shuffle
  and candidate verification touches only bucket collisions.
- SimHash: 64-bit signature via vectorized numpy (Arrow batches); hamming
  band join.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bento_spark.operators.text import normalize_text


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text (JVM expressions)."""
    toks = F.split(normalize_text(col), " ")
    k = F.size(toks) - (n - 1)
    grams = F.when(k <= 0, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )
    return F.array_distinct(grams)


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedupe: group by content fingerprint, keep canonical (min id).
    Returns (fp, n_dups, canonical_id) for groups with >1 member."""
    from bento_spark.operators.text import fingerprint

    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_dups") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a < b, jaccard >= threshold).

    Explode shingles, self-join on shingle, count intersection, compute
    |A∩B| / (|A|+|B|-|A∩B|). Quadratic in duplicates-per-shingle — the
    small-scale truth; use minhash_lsh_pairs at scale.
    """
    shingled = df.select(
        F.col(id_col).alias("id"), word_ngrams(text_col, n).alias("grams")
    ).withColumn("set_size", F.size("grams"))
    ex = shingled.select("id", "set_size", F.explode("grams").alias("g"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first("a.set_size").alias("size_a"),
            F.first("b.set_size").alias("size_b"),
        )
    )
    jac = F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter"))
    return inter.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def minhash_signature(col: Column | str, num_hashes: int = 64) -> Column:
    """MinHash signature: per seed s, min over shingles of xxhash64(g, s).
    Entirely JVM-side (higher-order functions over the shingle array)."""
    grams = col if isinstance(col, Column) else F.col(col)
    return F.array(
        *[F.array_min(F.transform(grams, lambda g: F.xxhash64(g, F.lit(s)))) for s in range(num_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Scalable near-dup: minhash -> band buckets -> candidate join ->
    exact-Jaccard verification of candidates only.

    bands=16, rows/band=4 puts the S-curve knee near j≈0.7 — good recall at
    the 0.8 threshold. The only wide operation is the bucket self-join;
    candidates per bucket are tiny at production thresholds.
    """
    rows_per_band = num_hashes // bands
    grams_tbl = df.select(
        F.col(id_col).alias("id"),
        word_ngrams(text_col, n).alias("grams"),
    )
    # the band rows carry ONLY (id, band, bucket) — never the gram arrays.
    # Exploding grams into 2x`bands` shuffle copies is the classic LSH
    # mistake at scale; verification re-reads grams once per side instead.
    banded = grams_tbl.withColumn("sig", minhash_signature(F.col("grams"), num_hashes)).select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # the self-join would otherwise recompute the 64-hash signature pipeline
    # for BOTH sides; the banded table is tiny (3 scalars x bands per doc),
    # so materialize it once (same move as Spark MLlib's LSH)
    banded = banded.persist()

    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ga = grams_tbl.select(F.col("id").alias("id_a"), F.col("grams").alias("grams_a"))
    gb = grams_tbl.select(F.col("id").alias("id_b"), F.col("grams").alias("grams_b"))
    verified = cands.join(ga, "id_a").join(gb, "id_b")
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    return verified.select(
        "id_a", "id_b", F.round(inter / union, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


SIMHASH_BITS = 64


def with_simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over word tokens — vectorized numpy in Arrow batches."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += f", {out_col} bigint"

    def simhash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(SIMHASH_BITS, dtype=np.uint64)
        for pdf in batches:
            sigs = np.empty(len(pdf), dtype=np.int64)
            for i, txt in enumerate(pdf[text_col]):
                toks = str(txt).lower().split()
                if not toks:
                    sigs[i] = 0
                    continue
                # FNV-1a 64 per token, vectorized bit voting
                hs = np.array([_fnv1a64(t) for t in toks], dtype=np.uint64)
                bits = (hs[:, None] >> bit_idx[None, :]) & np.uint64(1)
                votes = bits.astype(np.int32).sum(axis=0) * 2 - len(toks)
                sig = np.uint64(0)
                for bpos in np.nonzero(votes > 0)[0]:
                    sig |= np.uint64(1) << np.uint64(bpos)
                sigs[i] = np.int64(sig.astype(np.int64))
            out = pdf.copy()
            out[out_col] = sigs
            yield out

    return df.mapInPandas(simhash_batch, schema=out_schema)


def _fnv1a64(s: str) -> np.uint64:
    # FNV-1a relies on mod-2^64 wraparound; silence the intended overflow
    with np.errstate(over="ignore"):
        h = np.uint64(0xCBF29CE484222325)
        for ch in s.encode("utf-8"):
            h ^= np.uint64(ch)
            h *= np.uint64(0x100000001B3)
    return h


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into 4 x 16-bit
    chunks (pigeonhole: hamming<=3 guarantees one identical chunk), join on
    chunk, verify hamming distance with bit_count (JVM-side)."""
    sh = with_simhash(df.select(id_col, text_col), text_col).select(
        F.col(id_col).alias("id"), F.col("simhash")
    )
    chunks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * k).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", "c.band", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.select("id_a", "id_b", ham.alias("hamming")).filter(F.col("hamming") <= max_hamming)
