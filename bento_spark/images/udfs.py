"""Image decode/feature stages — Arrow-batched pandas over mapInPandas,
mirroring the audio UDF contract (audio/udfs.py): binary payload in,
typed feature columns out, `keep_payload` decides whether the (large)
binary column is echoed back through Arrow.

Reference analogue: none (Bento has no image processors) — this family
exists for the training-data-pipeline brief: multimodal columns are
opaque binaries with typed metadata; decode and feature-extract run
vectorized, never per-row Python UDFs at the row level (one numpy pass
per image inside the Arrow batch).

Scale notes: features are O(pixels) per image with no shuffle — the
stage is embarrassingly parallel and skew follows image byte size; for
mixed thumbnail/panorama corpora salt by size class exactly like the
audio path salts clip duration (operators/skew.spread_skew with
cost=width*height).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# Rec.601 luma weights — the standard definition, shared with the fixture
# generator so driver-side truth and executor decode agree bit-for-bit
LUMA = (0.299, 0.587, 0.114)


def image_feature_row(png_bytes: bytes) -> dict:
    """Decode one PNG and compute its feature scalars (pure function —
    tools/make_fixtures.py calls this driver-side for the oracle truth)."""
    import numpy as np

    from bento_spark.images.codecs import png_decode

    arr = png_decode(png_bytes)
    if arr.ndim == 2:  # greyscale: replicate to the RGB contract
        arr = np.stack([arr, arr, arr], axis=-1)
    h, w = arr.shape[:2]
    f = arr.astype(np.float64)
    mean_r = float(f[:, :, 0].mean())
    mean_g = float(f[:, :, 1].mean())
    mean_b = float(f[:, :, 2].mean())
    return {
        "width_px": int(w),
        "height_px": int(h),
        "n_pixels": int(w * h),
        "mean_r": mean_r,
        "mean_g": mean_g,
        "mean_b": mean_b,
        "mean_luma": LUMA[0] * mean_r + LUMA[1] * mean_g + LUMA[2] * mean_b,
    }


FEATURE_COLS = ("width_px", "height_px", "n_pixels", "mean_r", "mean_g", "mean_b", "mean_luma")
_FEATURE_DDL = (
    "width_px int, height_px int, n_pixels bigint, "
    "mean_r double, mean_g double, mean_b double, mean_luma double"
)


def with_image_features(df: DataFrame, col: str = "bytes", keep_payload: bool = True) -> DataFrame:
    """Decode the PNG payload column and append feature columns. A payload
    that fails to decode follows the error-column protocol (row errored,
    features NULL) rather than failing the task."""
    from bento_spark.operators.errors import ERROR_COL, ensure_error_col

    df = ensure_error_col(df)
    keep = [c for c in df.columns if keep_payload or c != col]
    clash = set(FEATURE_COLS) & set(keep)
    if clash:
        raise ValueError(f"with_image_features: output columns collide with input: {sorted(clash)}")
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join([f"{c} {fields[c]}" for c in keep] + [_FEATURE_DDL])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.images.udfs import image_feature_row as _feat

        for pdf in batches:
            feats = {c: [] for c in FEATURE_COLS}
            errs = []
            for i in range(len(pdf)):
                prior = pdf[ERROR_COL].iloc[i]
                blob = pdf[col].iloc[i]
                if isinstance(prior, str) or blob is None:
                    for c in FEATURE_COLS:
                        feats[c].append(None)
                    errs.append(prior if isinstance(prior, str) else "image decode: NULL payload")
                    continue
                try:
                    row = _feat(bytes(blob))
                except ValueError as e:
                    for c in FEATURE_COLS:
                        feats[c].append(None)
                    errs.append(f"image decode failed: {e}")
                    continue
                for c in FEATURE_COLS:
                    feats[c].append(row[c])
                errs.append(None)
            out = pdf[keep].copy()
            for c in FEATURE_COLS:
                out[c] = feats[c]
            out[ERROR_COL] = errs
            yield out

    return df.mapInPandas(run, schema=out_schema)
