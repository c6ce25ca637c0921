"""Deterministic distributed generator for the synthetic clips table.

Schema per the driver's input_hint (/root/repo/BASELINE.json:15):
``(clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
transcript string)`` plus a derived ``event_ts timestamp`` for windowing.

Reference analogue: the `generate` input, which synthesizes messages from a
mapping at an interval with optional count
(/root/reference/internal/impl/pure/input_generate.go:88). Ours is
Spark-first: ``spark.range(n)`` -> ``mapInPandas`` so generation is itself
distributed and scales with the cluster — no driver-side loop, no collect.
Every value is a pure function of the row index (splitmix64 hashing), so
the same (i, seed) always yields identical bytes: the exactly-once
row-identity tests depend on this.

Skew is intentional (north rule): most clips are 250–1250 ms, every 64th
row is a "long clip" of 8–30 s — downstream decode stages must salt/spread
these (see bento_spark.operators.skew).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone

import numpy as np
import pandas as pd

from bento_spark.audio.codecs import encode_clip

CLIP_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string, event_ts timestamp"
)

BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)
SR_CYCLE = (8000, 16000, 22050, 44100)
CODEC_CYCLE = ("pcm_s16le", "wav", "pcm_f32le")  # flac needs soundfile; see codecs.py

_WORDS = [
    f"w{j:03d}" for j in range(224)
] + "the a of to and in clip audio stream spark window join state batch merge sink source watermark event time key value hash shuffle partition skew salt codec sample rate frame token".split()
_WORDS = _WORDS[:256]
assert len(_WORDS) == 256

_GOLDEN = 0x9E3779B97F4A7C15


def _mix64(x: np.ndarray | int) -> np.ndarray | int:
    """splitmix64 finalizer — deterministic integer hash (public algorithm)."""
    with np.errstate(over="ignore"):
        x = (np.uint64(x) if isinstance(x, int) else x.astype(np.uint64)) * np.uint64(_GOLDEN)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def clip_params(i: int, seed: int = 42) -> dict:
    """Pure per-row parameters (no audio synthesis) for index i."""
    h = int(_mix64(i * 2 + seed))
    sr_hz = SR_CYCLE[i % 4]
    if i % 64 == 63:
        dur_ms = 8000 + (h % 22001)  # long-clip skew: 8–30 s
    else:
        dur_ms = 250 + ((i * 2654435761) % 997)
    codec = CODEC_CYCLE[i % 3]
    n_words = 3 + i % 12
    words = [_WORDS[int(_mix64(i * 131 + k + seed)) % 256] for k in range(n_words)]
    return {
        "clip_id": f"clip-{i:012d}",
        "sr_hz": sr_hz,
        "dur_ms": dur_ms,
        "codec": codec,
        "transcript": " ".join(words),
        "hash": h,
    }


def synth_pcm(i: int, sr_hz: int, dur_ms: int, seed: int = 42) -> np.ndarray:
    """Deterministic PCM for row i: 3 sinusoids + seeded noise at ~36 dB SNR.

    Keeping synthesis SNR well above the 30 dB test bound leaves headroom
    for int16 quantization (~45 dB worst case on this signal mix).
    """
    n = max(1, int(sr_hz * dur_ms / 1000))
    t = np.arange(n, dtype=np.float64) / sr_hz
    h = int(_mix64(i * 7 + seed))
    pcm = np.zeros(n, dtype=np.float64)
    for k in range(3):
        hk = int(_mix64(h + k))
        freq = 80.0 + (hk % 3400)  # below 8 kHz Nyquist/2 for the lowest sr
        phase = (hk >> 16 & 0xFFFF) / 0xFFFF * 2 * np.pi
        amp = 0.18 + 0.10 * ((hk >> 32 & 0xFF) / 255.0)
        pcm += amp * np.sin(2 * np.pi * freq * t + phase)
    rng = np.random.default_rng(h & 0xFFFFFFFF)
    noise = rng.standard_normal(n) * 0.004
    pcm += noise
    peak = np.abs(pcm).max()
    if peak > 0.98:
        pcm *= 0.98 / peak
    return pcm.astype(np.float32)


def clip_row_pandas(indices: np.ndarray, seed: int = 42, event_step_ms: int = 100) -> pd.DataFrame:
    """Generate a pandas frame of clip rows for the given row indices."""
    rows = []
    base_ns = pd.Timestamp(BASE_TS).value
    for i in indices:
        i = int(i)
        p = clip_params(i, seed)
        pcm = synth_pcm(i, p["sr_hz"], p["dur_ms"], seed)
        raw = encode_clip(pcm, p["sr_hz"], p["codec"])
        rows.append(
            (
                p["clip_id"],
                raw,
                p["sr_hz"],
                p["dur_ms"],
                p["codec"],
                p["transcript"],
                pd.Timestamp(base_ns + i * event_step_ms * 1_000_000, unit="ns", tz="UTC"),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript", "event_ts"],
    )


def clips_df(spark, n_rows: int, seed: int = 42, event_step_ms: int = 100, partitions: int | None = None):
    """Distributed deterministic clips table: spark.range -> mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield clip_row_pandas(pdf["id"].values, seed=seed, event_step_ms=event_step_ms)

    rng = spark.range(n_rows, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=CLIP_SCHEMA)


def clips_features_df(spark, n_rows: int, seed: int = 42, event_step_ms: int = 100,
                      partitions: int | None = None):
    """Fused generate -> decode -> features in ONE Arrow stage.

    `clips_df(...)` then `with_audio_features(...)` is two mapInPandas
    stages: Spark does not fuse adjacent Python stages, so the multi-MB
    payload crosses the Arrow pipe FOUR legs (Python->JVM after synthesis,
    JVM->Python for decode) instead of zero. For generate-input pipelines
    that reduce to scalar features (the bench/flagship shape, reference
    `generate` -> processors), this fusion keeps `bytes` inside one Python
    worker invocation — identical output to the unfused pair (same
    synth/decode/feature kernels, same row identity)."""
    from bento_spark.audio.udfs import AUDIO_FEATURE_COLS, audio_feature_frame

    out_schema = (
        "clip_id string, sr_hz int, dur_ms int, codec string, "
        "transcript string, event_ts timestamp, " + AUDIO_FEATURE_COLS
    )

    def gen_feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = clip_row_pandas(pdf["id"].values, seed=seed, event_step_ms=event_step_ms)
            yield audio_feature_frame(rows, keep_cols=[c for c in rows.columns if c != "bytes"])

    rng = spark.range(n_rows, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen_feats, schema=out_schema)


def clips_meta_df(spark, n_rows: int, seed: int = 42, event_step_ms: int = 100,
                  partitions: int | None = None):
    """Metadata-only clips table — clip_params WITHOUT audio synthesis,
    byte-identical metadata columns to clips_df (same params, same
    timestamps). For pipelines that never touch `bytes` (the
    clip⋈transcript join stages only id/transcript/event_ts), synthesizing
    and then dropping the payload is pure waste — at 8k clips the synth
    dominated that query's staging cost."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base_ns = pd.Timestamp(BASE_TS).value
        for pdf in batches:
            rows = []
            for i in pdf["id"].values:
                i = int(i)
                p = clip_params(i, seed)
                rows.append(
                    (p["clip_id"], p["sr_hz"], p["dur_ms"], p["codec"], p["transcript"],
                     pd.Timestamp(base_ns + i * event_step_ms * 1_000_000, unit="ns", tz="UTC"))
                )
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "sr_hz", "dur_ms", "codec", "transcript", "event_ts"],
            )

    rng = spark.range(n_rows, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(
        gen,
        schema="clip_id string, sr_hz int, dur_ms int, codec string, "
               "transcript string, event_ts timestamp",
    )
