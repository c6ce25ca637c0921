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


def resize_rgb(arr, out_w: int, out_h: int):
    """Deterministic resize of an HxWx3 uint8 array (pure numpy, no image
    libs in this env): integer-factor downscale = box average (antialiased
    for the common thumbnail case), everything else = nearest neighbor.
    Pure function — the fixture/oracle side recomputes it bit-for-bit."""
    import numpy as np

    h, w = arr.shape[:2]
    if (out_w, out_h) == (w, h):
        return arr.copy()
    if w % out_w == 0 and h % out_h == 0:
        fx, fy = w // out_w, h // out_h
        boxed = arr.reshape(out_h, fy, out_w, fx, 3).astype(np.uint32)
        return (boxed.sum(axis=(1, 3)) // (fx * fy)).astype(np.uint8)
    xs = (np.arange(out_w) * w) // out_w
    ys = (np.arange(out_h) * h) // out_h
    return arr[np.ix_(ys, xs)]


def with_image_resize(df: DataFrame, out_w: int, out_h: int, col: str = "bytes",
                      out_col: str | None = None) -> DataFrame:
    """Resize the PNG payload column to (out_w, out_h) — decode, resize
    (box-average / nearest), re-encode — one Arrow pass per batch. The
    training-data-pipeline thumbnail stage: output PNGs are deterministic
    (filter-0 encode), so resized tables keep exactly-once row identity.
    Replaces `col` in place unless `out_col` is given; width/height
    metadata columns (if present) are updated to the new dimensions when
    resizing in place."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"with_image_resize: bad target size {out_w}x{out_h}")
    from bento_spark.operators.errors import ERROR_COL, ensure_error_col

    df = ensure_error_col(df)
    target = out_col or col
    in_cols = list(df.columns)
    if out_col is not None and out_col in in_cols:
        raise ValueError(f"with_image_resize: out_col {out_col!r} collides with an input column")
    out_cols = in_cols if out_col is None else in_cols + [out_col]
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        f"{c} {fields.get(c, 'binary')}" if c != target else f"{target} binary"
        for c in out_cols
    )
    in_place = out_col is None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.images.codecs import png_decode, png_encode
        from bento_spark.images.udfs import resize_rgb as _rs

        for pdf in batches:
            blobs, errs = [], []
            for i in range(len(pdf)):
                prior = pdf[ERROR_COL].iloc[i]
                blob = pdf[col].iloc[i]
                if isinstance(prior, str) or blob is None:
                    blobs.append(blob if in_place else None)
                    errs.append(prior if isinstance(prior, str) else None)
                    continue
                try:
                    arr = png_decode(bytes(blob))
                    if arr.ndim == 2:
                        import numpy as _np

                        arr = _np.stack([arr, arr, arr], axis=-1)
                    blobs.append(png_encode(_rs(arr, out_w, out_h)))
                    errs.append(None)
                except ValueError as e:
                    blobs.append(blob if in_place else None)
                    errs.append(f"image resize failed: {e}")
            out = pdf[[c for c in in_cols if c != target]].copy()
            out[target] = blobs
            out[ERROR_COL] = errs
            if in_place:
                for meta, val in (("width", out_w), ("height", out_h)):
                    if meta in out.columns:
                        out[meta] = [
                            val if e is None else out[meta].iloc[j]
                            for j, e in enumerate(errs)
                        ]
            yield out[out_cols]

    return df.mapInPandas(run, schema=out_schema)


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
