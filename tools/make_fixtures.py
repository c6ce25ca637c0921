"""Generate the deterministic oracle fixtures under fixtures/.

The driver's correctness gate compares each Spark query against an ANSI-SQL
oracle run by DuckDB. Four query families depend on values DuckDB cannot
recompute (Spark xxhash64 min-hashes, seeded hyperplanes, k-means centroids,
audio decode kernels). For those, this script pins the NON-SQL-expressible
inputs into parquet fixtures that the oracle SQL reads — everything
downstream of the pinned input (banding, candidate joins, verification
math, window aggregation, top-k ranking) is recomputed independently by
DuckDB over the raw tables:

- clip_meta.parquet     — per-clip deterministic scalars (transcript,
                          event time, decoded sample count, rms) computed
                          DRIVER-SIDE with the same pure (i, seed) kernels,
                          single-threaded and Spark-free: the oracle then
                          checks the distributed pipeline (mapInPandas
                          batching, window grouping, join) against the spec.
- minhash_sigs.parquet  — (id, 64 min-hash signature) per documents table.
- simhash_sigs.parquet  — (id, 64-bit simhash) per documents table.
- lsh_hyperplanes.parquet — the seeded random hyperplanes (n_bits=6).
- ivf_centroids.parquet — k-means centroids (n_clusters=8, n_iter=2) per
                          embeddings table.

Table-dependent fixtures carry (sf_name, dkey/ekey) columns: sf_name keys
the Spark side (which knows its sf_dir), and dkey/ekey are content-derived
integer keys the STATIC oracle SQL can recompute from its bound views —
  dkey = sum(doc_id * length(text))
  ekey = sum(vec_id * floor(embedding[1] * 1000))
so the oracle always selects the slice matching whatever sf the driver
bound, with no path plumbing.

Everything is a pure function of (table content, seed) — regeneration is
idempotent. Rerun after changing shingle/minhash/simhash/k-means/audio
kernels: `python tools/make_fixtures.py`.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bento_spark.audio.codecs import decode_clip, encode_clip  # noqa: E402
from bento_spark.audio.generate import BASE_TS, clip_params, synth_pcm  # noqa: E402
from bento_spark.operators.dedupe_fuzzy import shingle_table, simhash_table  # noqa: E402
from bento_spark.operators.similarity import _hyperplanes, kmeans_centroids  # noqa: E402
from bento_spark.session import get_spark  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

DKEY_SQL = "CAST(sum(doc_id * length(text)) AS BIGINT)"
EKEY_SQL = "CAST(sum(vec_id * CAST(floor(embedding[1] * 1000) AS BIGINT)) AS BIGINT)"

CLIP_FIXTURE_N = 512  # must EQUAL __spark_entry__._AUDIO_N: the audio
# oracles aggregate ALL clip_meta rows (no LIMIT), so a larger fixture
# would mismatch counts/sums and fail the gate


def content_keys(sf_dir: str) -> tuple[int, int]:
    con = duckdb.connect()
    dkey = con.execute(
        f"SELECT {DKEY_SQL} FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    ekey = con.execute(
        f"SELECT {EKEY_SQL} FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()[0]
    return int(dkey), int(ekey)


def make_clip_meta() -> pd.DataFrame:
    base_ms = int(pd.Timestamp(BASE_TS).value // 1_000_000)
    rows = []
    for i in range(CLIP_FIXTURE_N):
        p = clip_params(i, seed=42)
        raw = encode_clip(synth_pcm(i, p["sr_hz"], p["dur_ms"], seed=42), p["sr_hz"], p["codec"])
        pcm = decode_clip(raw, p["codec"], p["sr_hz"])
        rows.append(
            (
                p["clip_id"],
                p["codec"],
                p["transcript"],
                base_ms + i * 100,  # event_step_ms=100 default
                int(pcm.size),
                float(np.sqrt(np.mean(pcm**2))) if pcm.size else 0.0,
            )
        )
    return pd.DataFrame(
        rows, columns=["clip_id", "codec", "transcript", "event_ts_ms", "n_samples", "rms"]
    )


IMAGE_FIXTURE_N = 300


def make_image_meta() -> pd.DataFrame:
    """Per-image truth for the images table (images/generate.py, n=300,
    seed=42): metadata + decoded feature scalars, computed DRIVER-SIDE
    with the same pure kernels — the oracle then checks the distributed
    generate+decode pipeline against this single-threaded spec."""
    from bento_spark.images.codecs import png_encode
    from bento_spark.images.generate import image_params, synth_rgb
    from bento_spark.images.udfs import image_feature_row

    rows = []
    for i in range(IMAGE_FIXTURE_N):
        p = image_params(i, seed=42)
        feat = image_feature_row(png_encode(synth_rgb(i, seed=42)))
        rows.append((
            p["image_id"], p["label"], feat["width_px"], feat["height_px"],
            feat["n_pixels"], feat["mean_r"], feat["mean_g"], feat["mean_b"],
            feat["mean_luma"],
        ))
    return pd.DataFrame(rows, columns=[
        "image_id", "label", "width_px", "height_px", "n_pixels",
        "mean_r", "mean_g", "mean_b", "mean_luma",
    ])


VIDEO_FIXTURE_N = 200  # must EQUAL __spark_entry__._VIDEO_N (same contract
# as CLIP_FIXTURE_N: the video oracles aggregate ALL video_meta rows)


def make_video_meta() -> pd.DataFrame:
    """Per-video truth for the videos table (video/generate.py, n=200,
    seed=42): metadata + decoded feature scalars (mean luma, motion proxy)
    computed DRIVER-SIDE with the same pure kernels — the oracle then
    checks the distributed generate+decode pipeline against this
    single-threaded spec."""
    from bento_spark.video.generate import synth_video, video_params
    from bento_spark.video.udfs import video_feature_row

    rows = []
    for i in range(VIDEO_FIXTURE_N):
        p = video_params(i, seed=42)
        feat = video_feature_row(synth_video(i, seed=42))
        rows.append((
            p["video_id"], p["label"], feat["width_px"], feat["height_px"],
            feat["fps_dec"], feat["n_frames_dec"], feat["duration_ms"],
            feat["mean_luma"], feat["motion"],
        ))
    return pd.DataFrame(rows, columns=[
        "video_id", "label", "width_px", "height_px", "fps", "n_frames",
        "duration_ms", "mean_luma", "motion",
    ])


def main() -> None:
    # optional argv name filter: `python tools/make_fixtures.py video_meta`
    # regenerates only the named fixtures (all of them when no args).
    only = set(sys.argv[1:])

    def want(name: str) -> bool:
        return not only or name in only

    os.makedirs(FIXDIR, exist_ok=True)

    if want("clip_meta"):
        print("clip_meta ...")
        make_clip_meta().to_parquet(f"{FIXDIR}/clip_meta.parquet", index=False)

    if want("image_meta"):
        print("image_meta ...")
        make_image_meta().to_parquet(f"{FIXDIR}/image_meta.parquet", index=False)

    if want("video_meta"):
        print("video_meta ...")
        make_video_meta().to_parquet(f"{FIXDIR}/video_meta.parquet", index=False)

    if want("lsh_hyperplanes"):
        print("lsh_hyperplanes ...")
        planes = _hyperplanes(64, n_bits=6, seed=42)
        pd.DataFrame(
            {"bit": np.arange(planes.shape[0], dtype=np.int32), "plane": list(planes.astype(np.float64))}
        ).to_parquet(f"{FIXDIR}/lsh_hyperplanes.parquet", index=False)

    spark_fixtures = {"minhash_sigs", "simhash_sigs", "ivf_centroids"}
    if only and not (only & spark_fixtures):
        for f in sorted(os.listdir(FIXDIR)):
            print(f, os.path.getsize(os.path.join(FIXDIR, f)))
        return

    spark = get_spark(app_name="make-fixtures", master="local[8]", shuffle_partitions=8)
    mh_slices, sh_slices, cent_slices = [], [], []
    for sf_dir in SF_DIRS:
        sf_name = os.path.basename(sf_dir.rstrip("/"))
        dkey, ekey = content_keys(sf_dir)
        print(f"{sf_name}: dkey={dkey} ekey={ekey}")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

        # minhash signatures — the exact computation minhash_lsh_pairs runs
        sh = shingle_table(docs, "doc_id", "text", 3)
        sigs = sh.groupBy("id").agg(
            F.array(*[F.min(F.xxhash64("g", F.lit(s))) for s in range(64)]).alias("sig")
        )
        pdf = sigs.toPandas()
        pdf["sf_name"], pdf["dkey"] = sf_name, dkey
        mh_slices.append(pdf)

        # simhash signatures — the exact computation simhash_near_pairs runs
        pdf = simhash_table(docs.select("doc_id", "text"), "doc_id", "text").toPandas()
        pdf["sf_name"], pdf["dkey"] = sf_name, dkey
        sh_slices.append(pdf)

        # IVF centroids (deterministic k-means; same params as q_ann_ivf)
        cents = kmeans_centroids(emb, n_clusters=8, n_iter=2)
        pdf = pd.DataFrame(
            {"cluster": np.arange(cents.shape[0], dtype=np.int32), "centroid": list(cents.astype(np.float64))}
        )
        pdf["sf_name"], pdf["ekey"] = sf_name, ekey
        cent_slices.append(pdf)

    pd.concat(mh_slices, ignore_index=True).to_parquet(f"{FIXDIR}/minhash_sigs.parquet", index=False)
    pd.concat(sh_slices, ignore_index=True).to_parquet(f"{FIXDIR}/simhash_sigs.parquet", index=False)
    pd.concat(cent_slices, ignore_index=True).to_parquet(f"{FIXDIR}/ivf_centroids.parquet", index=False)
    for f in sorted(os.listdir(FIXDIR)):
        print(f, os.path.getsize(os.path.join(FIXDIR, f)))


if __name__ == "__main__":
    main()
