"""Vectorized (Arrow-batched) audio UDF stages.

Reference analogue: per-message payload transforms run by `mapping`
(/root/reference/internal/impl/pure/processor_mapping.go:146-163) — here
the payload kernels are numpy-over-Arrow-batches, registered as pandas
UDFs. No row-at-a-time Python UDFs anywhere (north-rule requirement);
per-clip numpy calls inside a batch are vectorized over the sample axis.

Scale notes (100 TB):
- decode output (`pcm array<float>`) multiplies row width ~2-4x; prefer
  `with_audio_features` (decode + reduce inside one Arrow batch, never
  materializing pcm as a Spark column) when downstream only needs scalars.
- long-clip skew: salt-repartition before these stages
  (bento_spark.operators.skew.spread_by_cost) so one executor doesn't get
  all 30 s clips.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from bento_spark.audio.codecs import decode_clip, encode_clip, resample_linear


def _decode_series(raw: pd.Series, codec: pd.Series, sr: pd.Series) -> list[np.ndarray]:
    return [
        decode_clip(r, c, _sr_int(s)) if r is not None else np.zeros(0, dtype=np.float32)
        for r, c, s in zip(raw, codec, sr)
    ]


@F.pandas_udf(ArrayType(FloatType()))
def _decode_udf(raw: pd.Series, codec: pd.Series, sr: pd.Series) -> pd.Series:
    return pd.Series(_decode_series(raw, codec, sr))


def with_decoded_pcm(df: DataFrame, out_col: str = "pcm") -> DataFrame:
    """Add `pcm array<float>` decoded from (bytes, codec, sr_hz)."""
    return df.withColumn(out_col, _decode_udf(F.col("bytes"), F.col("codec"), F.col("sr_hz")))


def _sr_int(sr) -> int:
    """NULL/NaN sample rate -> 0: a NULL row (outer-join miss) must not
    kill the task via int(NaN); 0 skips resampling and yields 0 duration."""
    try:
        if sr is None or sr != sr:
            return 0
        return int(sr)
    except (TypeError, ValueError):
        return 0


def with_resampled_pcm(df: DataFrame, target_sr: int, out_col: str = "pcm_rs") -> DataFrame:
    """Resample decoded pcm to a fixed target sample rate (array<float>)."""

    @F.pandas_udf(ArrayType(FloatType()))
    def rs(pcm: pd.Series, sr: pd.Series) -> pd.Series:
        out = []
        for p, s in zip(pcm, sr):
            si = _sr_int(s)
            if p is None or si == 0:
                out.append(np.zeros(0, dtype=np.float32))
            else:
                out.append(resample_linear(np.asarray(p, dtype=np.float32), si, target_sr))
        return pd.Series(out)

    return df.withColumn(out_col, rs(F.col("pcm"), F.col("sr_hz")))


def with_normalized_clip(
    df: DataFrame,
    target_sr: int = 16000,
    target_codec: str = "pcm_s16le",
    keep_payload: bool = True,
    emit_features: bool = False,
) -> DataFrame:
    """Codec-normalize: decode -> resample to target_sr -> peak-normalize ->
    re-encode as target_codec. One mapInPandas pass; pcm never becomes a
    Spark column.

    keep_payload=False drops the ORIGINAL `bytes` from the output (the
    normalized payload `norm_bytes` is the one downstream wants; echoing the
    source payload back doubles Arrow return traffic).
    emit_features=True also computes the scalar features on the NORMALIZED
    pcm in the same pass — one decode, no second UDF stage.
    """
    passthrough = [f for f in df.schema.fields if keep_payload or f.name != "bytes"]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in passthrough)
    out_schema += ", norm_bytes binary, norm_sr_hz int, norm_codec string"
    if emit_features:
        out_schema += ", " + AUDIO_FEATURE_COLS
    keep_cols = [f.name for f in passthrough]

    def norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            n_s, rms, peak_l, zcr, dur = [], [], [], [], []
            for raw, codec, sr in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"]):
                sr_i = _sr_int(sr)
                pcm = decode_clip(raw, codec, sr_i)
                pcm = resample_linear(pcm, sr_i, target_sr) if sr_i else pcm
                peak = float(np.abs(pcm).max()) if pcm.size else 0.0
                if peak > 0:
                    pcm = (pcm / peak * 0.95).astype(np.float32)
                outs.append(encode_clip(pcm, target_sr, target_codec))
                if emit_features:
                    n = pcm.size
                    n_s.append(n)
                    rms.append(float(np.sqrt(np.mean(pcm**2))) if n else 0.0)
                    peak_l.append(float(np.abs(pcm).max()) if n else 0.0)
                    zcr.append(float(np.mean(np.abs(np.diff(np.signbit(pcm)).astype(np.float32)))) if n > 1 else 0.0)
                    dur.append(n / target_sr)
            out = pdf[keep_cols].copy()
            out["norm_bytes"] = outs
            out["norm_sr_hz"] = np.int32(target_sr)
            out["norm_codec"] = target_codec
            if emit_features:
                out["n_samples"] = pd.array(n_s, dtype="int64")
                out["rms"] = rms
                out["peak"] = peak_l
                out["zcr"] = zcr
                out["clip_s"] = dur
            yield out

    return df.mapInPandas(norm, schema=out_schema)


AUDIO_FEATURE_COLS = "n_samples bigint, rms double, peak double, zcr double, clip_s double"


def with_audio_features(df: DataFrame, keep_payload: bool = False) -> DataFrame:
    """Decode + reduce to scalar features in one Arrow pass (no pcm column).

    Features: sample count, RMS, peak, zero-crossing rate, duration seconds.

    keep_payload=False (default) drops `bytes` from the OUTPUT: the raw
    payload still streams JVM->Python for decoding, but never travels the
    return pipe. At 100 TB the payload dominates row width ~50:1 over the
    features — echoing it back through Arrow doubles UDF-stage IO for
    nothing. Measured locally this alone is ~2x stage throughput.
    """
    passthrough = [f for f in df.schema.fields if keep_payload or f.name != "bytes"]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in passthrough)
    out_schema += ", " + AUDIO_FEATURE_COLS
    keep_cols = [f.name for f in passthrough]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield audio_feature_frame(pdf, keep_cols)

    return df.mapInPandas(feats, schema=out_schema)


def audio_feature_frame(pdf: pd.DataFrame, keep_cols: list[str]) -> pd.DataFrame:
    """pandas-level decode+features kernel — shared by the standalone
    with_audio_features stage and the fused generate.clips_features_df."""
    n_s, rms, peak, zcr, dur = [], [], [], [], []
    for raw, codec, sr in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"]):
        sr_i = _sr_int(sr)
        pcm = decode_clip(raw, codec, sr_i)
        n = pcm.size
        n_s.append(n)
        rms.append(float(np.sqrt(np.mean(pcm**2))) if n else 0.0)
        peak.append(float(np.abs(pcm).max()) if n else 0.0)
        zcr.append(float(np.mean(np.abs(np.diff(np.signbit(pcm)).astype(np.float32)))) if n > 1 else 0.0)
        dur.append(n / sr_i if sr_i else 0.0)
    out = pdf[keep_cols].copy()
    out["n_samples"] = pd.array(n_s, dtype="int64")
    out["rms"] = rms
    out["peak"] = peak
    out["zcr"] = zcr
    out["clip_s"] = dur
    return out


SPECTRAL_FEATURE_COLS = (
    "n_samples bigint, rms double, n_frames int, "
    "band_mean array<float>, band_std array<float>"
)


_WIN_CACHE: dict[int, np.ndarray] = {}

# frames per FFT chunk: numpy's rfft upcasts to float64/complex128, so a
# whole 10 s clip's frames generate ~25 MB of temporaries — at 16
# concurrent workers that saturates DRAM bandwidth (measured: per-clip
# kernel cost inflates 1.45 -> 1.99 ms from 4 to 16 procs, the dominant
# anti-scaling term in BENCH/BASELINE.md). 128-frame chunks keep each
# worker's temporaries ~2 MB (L2/L3-resident); per-frame FFTs are
# independent and the log-band rows are concatenated in order, so the
# output is BIT-IDENTICAL to the unchunked form (equivalence-tested).
_STFT_CHUNK = 128


def _stft_band_energies(pcm: np.ndarray, n_fft: int = 512, hop: int = 160, n_bands: int = 16):
    """Log band energies over STFT frames (the standard ASR front-end shape:
    framed windowed FFT -> banded power -> log). Pure numpy, O(n log n),
    chunked to stay cache-resident under many concurrent workers."""
    if pcm.size < n_fft:
        pcm = np.pad(pcm, (0, n_fft - pcm.size))
    n_frames = 1 + (pcm.size - n_fft) // hop
    frames = np.lib.stride_tricks.as_strided(
        pcm, shape=(n_frames, n_fft), strides=(pcm.strides[0] * hop, pcm.strides[0])
    )
    win = _WIN_CACHE.get(n_fft)
    if win is None:
        win = _WIN_CACHE[n_fft] = np.hanning(n_fft).astype(np.float32)
    half = n_fft // 2
    chunks = []
    for s in range(0, n_frames, _STFT_CHUNK):
        part = frames[s : s + _STFT_CHUNK]
        spec = np.abs(np.fft.rfft(part * win, axis=1)) ** 2
        bands = spec[:, :half].reshape(len(part), n_bands, -1).sum(axis=2)
        chunks.append(np.log1p(bands))
    logb = chunks[0] if len(chunks) == 1 else np.concatenate(chunks, axis=0)
    return n_frames, logb.mean(axis=0).astype(np.float32), logb.std(axis=0).astype(np.float32)


def with_spectrogram_features(
    df: DataFrame,
    target_sr: int = 16000,
    n_fft: int = 512,
    hop: int = 160,
    n_bands: int = 16,
    keep_payload: bool = False,
) -> DataFrame:
    """Full ASR-style front-end in ONE Arrow pass: decode -> resample to
    target_sr -> peak-normalize -> STFT log-band energies + rms.

    Output adds SPECTRAL_FEATURE_COLS; the raw payload is dropped by
    default (features are what flows into the window agg)."""
    passthrough = [f for f in df.schema.fields if keep_payload or f.name != "bytes"]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in passthrough)
    out_schema += ", " + SPECTRAL_FEATURE_COLS
    keep_cols = [f.name for f in passthrough]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_s, rms, nfr, bm, bs = [], [], [], [], []
            for raw, codec, sr in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"]):
                sr_i = _sr_int(sr)
                pcm = decode_clip(raw, codec, sr_i)
                pcm = resample_linear(pcm, sr_i, target_sr) if sr_i else pcm
                peak = float(np.abs(pcm).max()) if pcm.size else 0.0
                if peak > 0:
                    pcm = (pcm / peak * 0.95).astype(np.float32)
                n = pcm.size
                n_s.append(n)
                rms.append(float(np.sqrt(np.mean(pcm**2))) if n else 0.0)
                k, m, s = _stft_band_energies(pcm, n_fft=n_fft, hop=hop, n_bands=n_bands)
                nfr.append(k)
                bm.append(m)
                bs.append(s)
            out = pdf[keep_cols].copy()
            out["n_samples"] = pd.array(n_s, dtype="int64")
            out["rms"] = rms
            out["n_frames"] = pd.array(nfr, dtype="int32")
            out["band_mean"] = bm
            out["band_std"] = bs
            yield out

    return df.mapInPandas(feats, schema=out_schema)
