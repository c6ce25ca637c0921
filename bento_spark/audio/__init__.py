"""Audio payload kernels: codecs, deterministic clip generation, UDF stages.

The reference engine has no audio operators — its analogue is generic
payload transforms (mapping/compress,
/root/reference/internal/impl/pure/processor_mapping.go:15). The north rule
adds decode / resample / codec-normalize as first-class vectorized stages;
everything here is numpy-over-Arrow-batches with no per-row Python UDF
registration.
"""

from bento_spark.audio.codecs import decode_clip, encode_clip, snr_db
from bento_spark.audio.generate import clips_df, clip_row_pandas
from bento_spark.audio.udfs import (
    with_decoded_pcm,
    with_audio_features,
    with_resampled_pcm,
    with_normalized_clip,
)

__all__ = [
    "decode_clip",
    "encode_clip",
    "snr_db",
    "clips_df",
    "clip_row_pandas",
    "with_decoded_pcm",
    "with_audio_features",
    "with_resampled_pcm",
    "with_normalized_clip",
]
