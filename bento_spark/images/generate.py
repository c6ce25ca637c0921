"""Deterministic distributed generator for the synthetic images table —
the image twin of audio/generate.clips_df.

Schema: ``(image_id string, bytes binary, width int, height int,
fmt string, label string, event_ts timestamp)`` — an opaque binary
payload column plus typed metadata, the multimodal-column contract.

Spark-first: ``spark.range(n)`` -> ``mapInPandas`` so generation is
distributed (no driver loop, no collect). Every pixel is a pure function
of (row index, seed) via splitmix64 — same (i, seed) -> identical PNG
bytes, the property exactly-once row identity and the fixture oracles
depend on. ``image_params``/``synth_rgb`` are importable standalone so
tools/make_fixtures.py can recompute per-image truth driver-side,
Spark-free.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime

import numpy as np
import pandas as pd

from bento_spark.audio.generate import BASE_TS as _BASE_TS

IMAGE_SCHEMA = (
    "image_id string, bytes binary, width int, height int, "
    "fmt string, label string, event_ts timestamp"
)

BASE_TS: datetime = _BASE_TS  # shared epoch with the clips table (joins)

WIDTH_CYCLE = (16, 24, 32, 48)
HEIGHT_CYCLE = (16, 24, 32)
LABELS = ("gradient", "stripes", "checker", "noise")

_GOLDEN = 0x9E3779B97F4A7C15


def _mix64(x: int) -> int:
    """splitmix64 finalizer (public algorithm; same kernel family as the
    clips generator)."""
    x = (x * _GOLDEN) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    return x


def image_params(i: int, seed: int = 42) -> dict:
    """Pure (i, seed) -> metadata + pattern coefficients."""
    h0 = _mix64(i * 2 + seed * 1_000_003)
    h1 = _mix64(i * 2 + 1 + seed * 1_000_003)
    return {
        "image_id": f"img-{i:012d}",
        "width": WIDTH_CYCLE[h0 % len(WIDTH_CYCLE)],
        "height": HEIGHT_CYCLE[(h0 >> 8) % len(HEIGHT_CYCLE)],
        "label": LABELS[(h0 >> 16) % len(LABELS)],
        "a": 1 + (h1 & 0x0F),
        "b": 1 + ((h1 >> 8) & 0x0F),
        "c": (h1 >> 16) & 0xFF,
        "event_ms": i * 100,
    }


def synth_rgb(i: int, seed: int = 42) -> np.ndarray:
    """Deterministic RGB pattern for row i (uint8 HxWx3): affine mixes of
    the pixel grid plus a per-label modulation — cheap, exactly
    recomputable anywhere, visually distinct per label."""
    p = image_params(i, seed)
    h, w, a, b, c = p["height"], p["width"], p["a"], p["b"], p["c"]
    y, x = np.mgrid[0:h, 0:w]
    base = (a * x + b * y + c).astype(np.int64)
    if p["label"] == "gradient":
        r, g, bl = base, base + 85, base + 170
    elif p["label"] == "stripes":
        s = np.where((x // 4) % 2 == 0, 0, 128)
        r, g, bl = base + s, s, base
    elif p["label"] == "checker":
        ck = np.where(((x // 4) + (y // 4)) % 2 == 0, 32, 224)
        r, g, bl = ck, base, ck + base
    else:  # noise: splitmix per pixel (vectorized via the affine index)
        idx = (y * w + x + i * 131_071).astype(np.uint64)
        with np.errstate(over="ignore"):
            z = idx * np.uint64(_GOLDEN)
            z ^= z >> np.uint64(30)
            z *= np.uint64(0xBF58476D1CE4E5B9)
            z ^= z >> np.uint64(27)
        r, g, bl = (z & np.uint64(0xFF)).astype(np.int64), ((z >> np.uint64(8)) & np.uint64(0xFF)).astype(np.int64), ((z >> np.uint64(16)) & np.uint64(0xFF)).astype(np.int64)
    return np.stack([(r % 256), (g % 256), (bl % 256)], axis=-1).astype(np.uint8)


def images_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic images table (see module docstring)."""
    rng = spark.range(n, numPartitions=partitions) if partitions else spark.range(n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.images.codecs import png_encode as _enc
        from bento_spark.images.generate import image_params as _p, synth_rgb as _s

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                p = _p(i, seed)
                rows.append({
                    "image_id": p["image_id"],
                    "bytes": _enc(_s(i, seed)),
                    "width": p["width"],
                    "height": p["height"],
                    "fmt": "png",
                    "label": p["label"],
                    "event_ts": BASE_TS + pd.Timedelta(milliseconds=p["event_ms"]),
                })
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "width", "height", "fmt", "label", "event_ts",
            ])

    return rng.mapInPandas(gen, schema=IMAGE_SCHEMA)

