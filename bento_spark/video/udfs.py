"""Video stages — Arrow-batched pandas over mapInPandas, same contract as
the audio (audio/udfs.py) and image (images/udfs.py) families: binary
payload in, typed columns out, `keep_payload` decides whether the large
binary echoes back through Arrow.

Reference analogue: none (Bento has no video processors) — this family
exists for the training-data-pipeline brief: video as an opaque binary
column with typed metadata, decode STUBBED for real codecs (no
ffmpeg/pyav in this environment; see video/container.py) while the
deterministic BVC fixture codec keeps the whole pipeline testable.

Scale notes:
- ``with_video_meta`` parses a 16-byte header per row — O(1) per video,
  no frame decode, no shuffle.
- ``with_frame_sample`` explodes one row per sampled frame by SLICING
  still-encoded PNG blobs out of the container (no pixel decode); cost is
  O(sampled bytes). Downstream image stages (image_features,
  image_resize) consume the exploded frames unchanged — the families
  compose.
- ``with_video_features`` is the only stage that decodes pixels; it is
  embarrassingly parallel and skew follows n_frames x pixels, so a mixed
  corpus salts by that product (operators/skew.spread_skew) exactly like
  audio salts clip duration.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from bento_spark.images.udfs import LUMA

META_COLS = ("meta_codec", "meta_width", "meta_height", "meta_fps", "meta_n_frames", "meta_duration_ms")
_META_DDL = (
    "meta_codec int, meta_width int, meta_height int, "
    "meta_fps int, meta_n_frames int, meta_duration_ms bigint"
)

FEATURE_COLS = (
    "width_px", "height_px", "n_frames_dec", "fps_dec",
    "duration_ms", "mean_luma", "motion",
)
_FEATURE_DDL = (
    "width_px int, height_px int, n_frames_dec int, fps_dec int, "
    "duration_ms bigint, mean_luma double, motion double"
)


def video_feature_row(blob: bytes) -> dict:
    """Decode one BVC container and compute its feature scalars (pure
    function — tools/make_fixtures.py calls this driver-side for the
    oracle truth). ``motion`` is the mean over consecutive frame pairs of
    the mean absolute per-pixel luma difference — 0.0 for a static clip,
    the standard cheap motion-magnitude proxy."""
    import numpy as np

    from bento_spark.video.container import bvc_decode, bvc_probe

    meta = bvc_probe(blob)
    frames, fps = bvc_decode(blob)
    lumas = [
        LUMA[0] * f[:, :, 0].astype(np.float64)
        + LUMA[1] * f[:, :, 1].astype(np.float64)
        + LUMA[2] * f[:, :, 2].astype(np.float64)
        for f in frames
    ]
    mean_luma = float(np.mean([lm.mean() for lm in lumas]))
    if len(lumas) > 1:
        motion = float(np.mean([
            np.abs(lumas[t] - lumas[t - 1]).mean() for t in range(1, len(lumas))
        ]))
    else:
        motion = 0.0
    h, w = frames[0].shape[:2]
    return {
        "width_px": int(w),
        "height_px": int(h),
        "n_frames_dec": len(frames),
        "fps_dec": int(fps),
        "duration_ms": int(meta["duration_ms"]),
        "mean_luma": mean_luma,
        "motion": motion,
    }


def _schema_of(df: DataFrame, keep: list[str], extra_ddl: str) -> str:
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ", ".join([f"{c} {fields[c]}" for c in keep] + [extra_ddl])


def with_video_meta(df: DataFrame, col: str = "bytes") -> DataFrame:
    """Append container-header metadata columns — O(1) per row (16-byte
    header parse, frames untouched). A non-BVC payload follows the error
    protocol with the stub message naming the external decoder it needs."""
    from bento_spark.operators.errors import ERROR_COL, ensure_error_col

    df = ensure_error_col(df)
    clash = set(META_COLS) & set(df.columns)
    if clash:
        raise ValueError(f"with_video_meta: output columns collide with input: {sorted(clash)}")
    out_schema = _schema_of(df, list(df.columns), _META_DDL)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.video.container import bvc_probe

        for pdf in batches:
            metas = {c: [] for c in META_COLS}
            errs = []
            for i in range(len(pdf)):
                prior = pdf[ERROR_COL].iloc[i]
                blob = pdf[col].iloc[i]
                if isinstance(prior, str) or blob is None:
                    for c in META_COLS:
                        metas[c].append(None)
                    errs.append(prior if isinstance(prior, str) else "video probe: NULL payload")
                    continue
                try:
                    m = bvc_probe(bytes(blob))
                except ValueError as e:
                    for c in META_COLS:
                        metas[c].append(None)
                    errs.append(f"video probe failed: {e}")
                    continue
                for c, k in zip(META_COLS, ("codec", "width", "height", "fps", "n_frames", "duration_ms")):
                    metas[c].append(m[k])
                errs.append(None)
            out = pdf.copy()
            for c in META_COLS:
                out[c] = metas[c]
            out[ERROR_COL] = errs
            yield out

    return df.mapInPandas(run, schema=out_schema)


def with_frame_sample(df: DataFrame, every: int, col: str = "bytes",
                      max_frames: int | None = None,
                      keep_payload: bool = False) -> DataFrame:
    """Explode each video into one row per sampled frame (indices 0,
    every, 2*every, ... capped at `max_frames`). The sampled frame lands
    in a `frame` binary column as a complete PNG blob SLICED from the
    container without pixel decode, plus `frame_idx` and `frame_ts_ms`
    (frame_idx * 1000 / fps). Errored/NULL rows pass through as a single
    row with frame NULL so the error protocol keeps row identity."""
    if every < 1:
        raise ValueError(f"with_frame_sample: every must be >= 1, got {every}")
    from bento_spark.operators.errors import ERROR_COL, ensure_error_col

    df = ensure_error_col(df)
    keep = [c for c in df.columns if keep_payload or c != col]
    clash = {"frame", "frame_idx", "frame_ts_ms"} & set(keep)
    if clash:
        raise ValueError(f"with_frame_sample: output columns collide with input: {sorted(clash)}")
    out_schema = _schema_of(df, keep, "frame_idx int, frame_ts_ms bigint, frame binary")
    out_cols = keep + ["frame_idx", "frame_ts_ms", "frame"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.video.container import bvc_frame_blobs, bvc_probe

        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                prior = pdf[ERROR_COL].iloc[i]
                blob = pdf[col].iloc[i]
                base = {c: pdf[c].iloc[i] for c in keep}
                if isinstance(prior, str) or blob is None:
                    base.update(frame_idx=None, frame_ts_ms=None, frame=None)
                    base[ERROR_COL] = prior if isinstance(prior, str) else "frame sample: NULL payload"
                    rows.append(base)
                    continue
                try:
                    blob = bytes(blob)
                    meta = bvc_probe(blob)
                    idxs = list(range(0, meta["n_frames"], every))
                    if max_frames is not None:
                        idxs = idxs[:max_frames]
                    blobs = bvc_frame_blobs(blob, idxs)
                except ValueError as e:
                    base.update(frame_idx=None, frame_ts_ms=None, frame=None)
                    base[ERROR_COL] = f"frame sample failed: {e}"
                    rows.append(base)
                    continue
                for fi, fb in zip(idxs, blobs):
                    r = dict(base)
                    r["frame_idx"] = fi
                    r["frame_ts_ms"] = fi * 1000 // meta["fps"] if meta["fps"] else 0
                    r["frame"] = fb
                    r[ERROR_COL] = None
                    rows.append(r)
            yield pd.DataFrame(rows, columns=out_cols)

    return df.mapInPandas(run, schema=out_schema)


def with_video_features(df: DataFrame, col: str = "bytes", keep_payload: bool = True) -> DataFrame:
    """Decode the BVC payload column and append feature columns (see
    video_feature_row). A payload that fails to decode — including any
    real-codec video, whose decode is stubbed in this environment —
    follows the error protocol (row errored, features NULL)."""
    from bento_spark.operators.errors import ERROR_COL, ensure_error_col

    df = ensure_error_col(df)
    keep = [c for c in df.columns if keep_payload or c != col]
    clash = set(FEATURE_COLS) & set(keep)
    if clash:
        raise ValueError(f"with_video_features: output columns collide with input: {sorted(clash)}")
    out_schema = _schema_of(df, keep, _FEATURE_DDL)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bento_spark.video.udfs import video_feature_row as _feat

        for pdf in batches:
            feats = {c: [] for c in FEATURE_COLS}
            errs = []
            for i in range(len(pdf)):
                prior = pdf[ERROR_COL].iloc[i]
                blob = pdf[col].iloc[i]
                if isinstance(prior, str) or blob is None:
                    for c in FEATURE_COLS:
                        feats[c].append(None)
                    errs.append(prior if isinstance(prior, str) else "video decode: NULL payload")
                    continue
                try:
                    row = _feat(bytes(blob))
                except ValueError as e:
                    for c in FEATURE_COLS:
                        feats[c].append(None)
                    errs.append(f"video decode failed: {e}")
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
