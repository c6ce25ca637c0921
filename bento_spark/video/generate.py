"""Deterministic distributed generator for the synthetic videos table —
the video twin of audio/generate.clips_df and images/generate.images_df.

Schema: ``(video_id string, bytes binary, width int, height int, fps int,
n_frames int, codec string, label string, event_ts timestamp)`` — the
multimodal-column contract: opaque binary payload + typed metadata.

Every frame is a pure function of (row index, frame index, seed): frame t
is the row's base pattern (images/generate.synth_rgb kernel family)
rolled by t x (vx, vy) pixels — deterministic "motion" whose magnitude
the feature stage can recompute exactly anywhere. Same (i, seed) ->
identical container bytes (exactly-once row identity + fixture oracles).

Spark-first: ``spark.range(n)`` -> ``mapInPandas``; generation is
distributed, no driver loop.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime

import numpy as np
import pandas as pd

from bento_spark.audio.generate import BASE_TS as _BASE_TS
from bento_spark.images.generate import _mix64

VIDEO_SCHEMA = (
    "video_id string, bytes binary, width int, height int, fps int, "
    "n_frames int, codec string, label string, event_ts timestamp"
)

BASE_TS: datetime = _BASE_TS  # shared epoch with clips/images (joins)

SIZE_CYCLE = ((16, 16), (24, 16), (32, 24))
FPS_CYCLE = (10, 20, 25)
NFRAMES_CYCLE = (4, 6, 8, 10)
LABELS = ("pan", "strobe", "static")


def video_params(i: int, seed: int = 42) -> dict:
    """Pure (i, seed) -> metadata + motion/pattern coefficients."""
    h0 = _mix64(i * 3 + seed * 1_000_003)
    h1 = _mix64(i * 3 + 1 + seed * 1_000_003)
    w, h = SIZE_CYCLE[h0 % len(SIZE_CYCLE)]
    return {
        "video_id": f"vid-{i:012d}",
        "width": w,
        "height": h,
        "fps": FPS_CYCLE[(h0 >> 8) % len(FPS_CYCLE)],
        "n_frames": NFRAMES_CYCLE[(h0 >> 16) % len(NFRAMES_CYCLE)],
        "label": LABELS[(h0 >> 24) % len(LABELS)],
        "a": 1 + (h1 & 0x0F),
        "b": 1 + ((h1 >> 8) & 0x0F),
        "c": (h1 >> 16) & 0xFF,
        "vx": 1 + ((h1 >> 24) & 0x03),
        "vy": (h1 >> 28) & 0x03,
        "event_ms": i * 100,
    }


def synth_frame(i: int, t: int, seed: int = 42) -> np.ndarray:
    """Deterministic frame t of video i (uint8 HxWx3)."""
    p = video_params(i, seed)
    h, w, a, b, c = p["height"], p["width"], p["a"], p["b"], p["c"]
    y, x = np.mgrid[0:h, 0:w]
    base = (a * x + b * y + c).astype(np.int64)
    if p["label"] == "pan":  # camera pan: roll the base pattern by t*(vx,vy)
        r, g, bl = base, base + 85, base + 170
        frame = np.stack([r % 256, g % 256, bl % 256], axis=-1).astype(np.uint8)
        return np.roll(frame, shift=(t * p["vy"], t * p["vx"]), axis=(0, 1))
    if p["label"] == "strobe":  # global brightness flicker
        lvl = 64 if t % 2 == 0 else 192
        r, g, bl = base + lvl, lvl + np.zeros_like(base), base
        return np.stack([r % 256, g % 256, bl % 256], axis=-1).astype(np.uint8)
    # static: every frame identical (zero-motion truth case)
    ck = np.where(((x // 4) + (y // 4)) % 2 == 0, 32, 224)
    return np.stack([ck % 256, base % 256, (ck + base) % 256], axis=-1).astype(np.uint8)


def synth_video(i: int, seed: int = 42) -> bytes:
    """Pure (i, seed) -> complete BVC container bytes."""
    from bento_spark.video.container import bvc_encode

    p = video_params(i, seed)
    return bvc_encode([synth_frame(i, t, seed) for t in range(p["n_frames"])], p["fps"])


def videos_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic videos table (see module docstring)."""
    rng = spark.range(n, numPartitions=partitions) if partitions else spark.range(n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.video.generate import synth_video as _sv, video_params as _p

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                p = _p(i, seed)
                rows.append({
                    "video_id": p["video_id"],
                    "bytes": _sv(i, seed),
                    "width": p["width"],
                    "height": p["height"],
                    "fps": p["fps"],
                    "n_frames": p["n_frames"],
                    "codec": "bvc-png",
                    "label": p["label"],
                    "event_ts": BASE_TS + pd.Timedelta(milliseconds=p["event_ms"]),
                })
            yield pd.DataFrame(rows, columns=[
                "video_id", "bytes", "width", "height", "fps",
                "n_frames", "codec", "label", "event_ts",
            ])

    return rng.mapInPandas(gen, schema=VIDEO_SCHEMA)
