"""Audio kernel tests: codec round-trips, SNR invariant, generator
determinism, vectorized UDF vs single-clip oracle decode.

Per-row invariant from BASELINE.json input_hint: decoded-PCM allclose at
SNR >= 30 dB + exact transcript equality.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bento_spark.audio.codecs import decode_clip, encode_clip, resample_linear, snr_db
from bento_spark.audio.generate import clip_params, clip_row_pandas, clips_df, synth_pcm
from bento_spark.audio.udfs import with_audio_features, with_decoded_pcm, with_normalized_clip


def test_pcm16_roundtrip_snr():
    pcm = synth_pcm(7, 16000, 500)
    raw = encode_clip(pcm, 16000, "pcm_s16le")
    out = decode_clip(raw, "pcm_s16le", 16000)
    assert out.shape == pcm.shape
    assert snr_db(pcm, out) >= 30.0


def test_wav_roundtrip_snr():
    pcm = synth_pcm(11, 22050, 700)
    raw = encode_clip(pcm, 22050, "wav")
    out = decode_clip(raw, "wav", 22050)
    assert snr_db(pcm, out) >= 30.0


def test_f32_roundtrip_exact():
    pcm = synth_pcm(3, 8000, 300)
    out = decode_clip(encode_clip(pcm, 8000, "pcm_f32le"), "pcm_f32le", 8000)
    np.testing.assert_array_equal(pcm, out)


def test_flac_stub_raises():
    from bento_spark.audio import codecs as _codecs

    if _codecs._soundfile is None:
        # sandbox: the gate must raise the documented stub error, not an
        # arbitrary exception from a broken dispatch upstream of it
        with pytest.raises(NotImplementedError, match="soundfile"):
            decode_clip(b"fLaC....", "flac", 16000)
    else:
        with pytest.raises(Exception):  # soundfile present: garbage bytes fail decode
            decode_clip(b"fLaC....", "flac", 16000)


def test_resample_preserves_tone():
    sr_from, sr_to = 44100, 16000
    t = np.arange(int(sr_from * 0.5)) / sr_from
    pcm = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    rs = resample_linear(pcm, sr_from, sr_to)
    assert abs(rs.size - int(pcm.size * sr_to / sr_from)) <= 1
    t2 = np.arange(rs.size) / sr_to
    ref = np.sin(2 * np.pi * 440 * t2).astype(np.float32)
    assert snr_db(ref, rs) >= 30.0


def test_generator_deterministic():
    a = clip_row_pandas(np.array([0, 1, 63, 64]))
    b = clip_row_pandas(np.array([0, 1, 63, 64]))
    assert (a["bytes"] == b["bytes"]).all()
    assert (a["transcript"] == b["transcript"]).all()
    # every 64th row is a long clip (skew fixture)
    assert a.loc[2, "dur_ms"] >= 8000
    assert a.loc[0, "dur_ms"] < 2000


def test_clips_df_distributed_matches_local(spark):
    df = clips_df(spark, 20, partitions=4).orderBy("clip_id")
    rows = df.collect()
    assert len(rows) == 20
    local = clip_row_pandas(np.arange(20))
    for i, r in enumerate(rows):
        assert r.clip_id == local.loc[i, "clip_id"]
        assert r.transcript == local.loc[i, "transcript"]
        assert bytes(r.bytes) == bytes(local.loc[i, "bytes"])


def test_decode_udf_snr_vs_oracle(spark):
    df = clips_df(spark, 12, partitions=2)
    dec = with_decoded_pcm(df).select("clip_id", "codec", "sr_hz", "dur_ms", "pcm").collect()
    assert len(dec) == 12
    for r in dec:
        i = int(r.clip_id.split("-")[1])
        ref = synth_pcm(i, r.sr_hz, r.dur_ms)
        got = np.asarray(r.pcm, dtype=np.float32)
        assert got.size == ref.size
        assert snr_db(ref, got) >= 30.0, f"SNR too low for {r.clip_id} ({r.codec})"


def test_audio_features(spark):
    df = clips_df(spark, 8, partitions=2)
    feats = with_audio_features(df).select("clip_id", "n_samples", "rms", "peak", "clip_s").collect()
    assert len(feats) == 8
    for r in feats:
        assert r.n_samples > 0
        assert 0.0 < r.rms < 1.0
        assert 0.0 < r.peak <= 1.0


def test_codec_normalize(spark):
    df = clips_df(spark, 6, partitions=2)
    norm = with_normalized_clip(df, target_sr=16000).collect()
    for r in norm:
        pcm = decode_clip(bytes(r.norm_bytes), "pcm_s16le", 16000)
        assert r.norm_sr_hz == 16000
        expected = int(round(r.dur_ms / 1000 * 16000))
        assert abs(pcm.size - expected) <= 2
        assert 0.90 <= np.abs(pcm).max() <= 1.0


def test_audio_features_null_bytes_row_survives(spark):
    """A NULL payload row (outer-join miss / error-branch union) must yield
    zero features, not kill the task."""
    from bento_spark.audio.udfs import with_audio_features

    df = spark.createDataFrame(
        [("c1", None, 16000, 0, "pcm_s16le")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    row = with_audio_features(df).collect()[0]
    assert row.n_samples == 0 and row.rms == 0.0 and row.clip_s == 0.0


def test_snr_db_length_mismatch_penalized():
    import numpy as np

    from bento_spark.audio.codecs import snr_db

    ref = np.ones(1000, dtype=np.float32)
    assert snr_db(ref, ref.copy()) == float("inf")
    assert snr_db(ref, ref[:500]) == float("-inf")  # dropped samples != perfect
    assert snr_db(ref, np.zeros(0, dtype=np.float32)) == float("-inf")
    assert snr_db(ref, ref[:999]) > 100  # 1-sample resample rounding tolerated


def test_audio_udfs_null_sample_rate_survives(spark):
    """Outer-join misses NULL sr_hz too: int(NaN) must not kill the task."""
    from bento_spark.audio.udfs import with_audio_features, with_normalized_clip

    df = spark.createDataFrame(
        [("c1", None, None, None, None)],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    row = with_audio_features(df).collect()[0]
    assert row.n_samples == 0 and row.clip_s == 0.0
    row2 = with_normalized_clip(df).collect()[0]
    assert row2.clip_id == "c1"
    assert row2.bytes is None or len(bytes(row2.bytes)) == 0  # no payload fabricated


def test_fused_generate_features_equals_unfused(spark):
    """clips_features_df (one Arrow pass) must produce EXACTLY the rows of
    clips_df |> with_audio_features (two passes) — the fusion is an IO
    optimization, never a semantic change."""
    from bento_spark.audio.generate import clips_df, clips_features_df
    from bento_spark.audio.udfs import with_audio_features

    fused = clips_features_df(spark, 64).orderBy("clip_id").collect()
    unfused = with_audio_features(clips_df(spark, 64)).orderBy("clip_id").collect()
    assert len(fused) == len(unfused) == 64
    for f, u in zip(fused, unfused):
        assert f.asDict() == u.asDict()


def test_stft_chunking_bit_identical():
    """The cache-resident chunked STFT (see _STFT_CHUNK rationale) must be
    BIT-identical to the unchunked formulation — per-frame FFTs are
    independent and the log-band rows concatenate in order. Pure numpy, no
    session."""
    import numpy as np

    from bento_spark.audio.udfs import _stft_band_energies

    def unchunked(pcm, n_fft=512, hop=160, n_bands=16):
        if pcm.size < n_fft:
            pcm = np.pad(pcm, (0, n_fft - pcm.size))
        n_frames = 1 + (pcm.size - n_fft) // hop
        frames = np.lib.stride_tricks.as_strided(
            pcm, shape=(n_frames, n_fft), strides=(pcm.strides[0] * hop, pcm.strides[0])
        )
        win = np.hanning(n_fft).astype(np.float32)
        spec = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2
        bands = spec[:, : (n_fft // 2)].reshape(n_frames, n_bands, -1).sum(axis=2)
        logb = np.log1p(bands)
        return n_frames, logb.mean(axis=0).astype(np.float32), logb.std(axis=0).astype(np.float32)

    rng = np.random.RandomState(1)
    for n in (100, 512, 5000, 160001):  # sub-frame, exact, chunk-boundary, odd
        pcm = rng.randn(n).astype(np.float32)
        for hop in (80, 160):
            a = _stft_band_energies(pcm, 512, hop, 16)
            b = unchunked(pcm, 512, hop, 16)
            assert a[0] == b[0]
            assert np.array_equal(a[1], b[1]) and np.array_equal(a[2], b[2])


def test_clips_meta_df_matches_clips_df_metadata(spark):
    """clips_meta_df must carry byte-identical metadata to clips_df (same
    clip_params, same timestamps) — it only skips audio synthesis."""
    from bento_spark.audio.generate import clips_df, clips_meta_df

    meta = clips_meta_df(spark, 48).orderBy("clip_id").collect()
    full = clips_df(spark, 48).drop("bytes").orderBy("clip_id").collect()
    assert len(meta) == len(full) == 48
    for m, f in zip(meta, full):
        assert m.asDict() == f.asDict()
