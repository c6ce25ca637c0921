"""Pure-numpy audio codecs for the sandbox: pcm_s16le, pcm_f32le, wav.

`flac` (and any other container needing a native codec library) is gated
behind an import-try of ``soundfile``; absent that library the decode raises
``NotImplementedError`` with a clear message. The Spark-side plumbing
(schema, Arrow batching, UDF signatures) is identical for every codec, so
swapping in a real decoder on a cluster is a one-function change.

These are reference-quality implementations used both by the engine's
vectorized decode stage and by the *oracle* decode path in tests — the
per-row invariant (decoded-PCM allclose at SNR>=30 dB) is checked between
the engine's Arrow-batched UDF output and a plain single-clip decode here.
"""

from __future__ import annotations

import struct

import numpy as np

try:  # optional native decoder for flac/ogg/etc.
    import soundfile as _soundfile  # type: ignore
except Exception:  # pragma: no cover - not installed in sandbox
    _soundfile = None

SUPPORTED_CODECS = ("pcm_s16le", "pcm_f32le", "wav")


def encode_clip(pcm: np.ndarray, sr_hz: int, codec: str) -> bytes:
    """Encode float32 mono PCM in [-1, 1] into `codec` bytes."""
    pcm = np.asarray(pcm, dtype=np.float32)
    if codec == "pcm_s16le":
        return _to_i16(pcm).tobytes()
    if codec == "pcm_f32le":
        return pcm.astype("<f4").tobytes()
    if codec == "wav":
        return _encode_wav_pcm16(pcm, sr_hz)
    if codec == "flac":
        raise NotImplementedError(
            "flac encode requires the 'soundfile' native library (not in this sandbox); "
            "use pcm_s16le/pcm_f32le/wav here"
        )
    raise ValueError(f"unknown codec: {codec!r}")


def decode_clip(raw: bytes, codec: str, sr_hz: int) -> np.ndarray:
    """Decode `codec` bytes to float32 mono PCM in [-1, 1]. A NULL payload
    decodes to an empty clip — one NULL row must not kill the whole task
    (rows arrive NULL after outer-join misses / error-branch unions; the
    feature UDFs emit zeros for empty clips)."""
    if raw is None:
        return np.zeros(0, dtype=np.float32)
    if codec == "pcm_s16le":
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if codec == "pcm_f32le":
        return np.frombuffer(raw, dtype="<f4").astype(np.float32)
    if codec == "wav":
        return _decode_wav(raw)
    if codec == "flac":
        if _soundfile is None:
            raise NotImplementedError(
                "flac decode requires the 'soundfile' native library (not in this sandbox)"
            )
        import io

        data, _sr = _soundfile.read(io.BytesIO(raw), dtype="float32")
        return np.ascontiguousarray(data if data.ndim == 1 else data.mean(axis=1), dtype=np.float32)
    raise ValueError(f"unknown codec: {codec!r}")


def _to_i16(pcm: np.ndarray) -> np.ndarray:
    return np.clip(np.round(pcm * 32767.0), -32768, 32767).astype("<i2")


def _encode_wav_pcm16(pcm: np.ndarray, sr_hz: int) -> bytes:
    data = _to_i16(pcm).tobytes()
    n = len(data)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + n,
        b"WAVE",
        b"fmt ",
        16,  # PCM fmt chunk size
        1,  # audio format = PCM
        1,  # mono
        sr_hz,
        sr_hz * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
        b"data",
        n,
    )
    return hdr + data


def _decode_wav(raw: bytes) -> np.ndarray:
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_code, channels, bits = 1, 1, 16
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", raw, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            fmt_code, channels, _sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", raw, body)
        elif cid == b"data":
            data = raw[body : body + csize]
            if fmt_code == 1 and bits == 16:
                pcm = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
            elif fmt_code == 3 and bits == 32:
                pcm = np.frombuffer(data, dtype="<f4").astype(np.float32)
            else:
                raise ValueError(f"unsupported wav format code={fmt_code} bits={bits}")
            if channels > 1:
                pcm = pcm.reshape(-1, channels).mean(axis=1)
            return pcm
        pos = body + csize + (csize & 1)
    raise ValueError("wav stream has no data chunk")


def resample_linear(pcm: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Deterministic vectorized linear-interpolation resampler.

    (A polyphase FIR is the production choice; scipy isn't in this sandbox,
    and linear interp is deterministic + fully vectorized, which is what the
    exactly-once row-identity tests require.)
    """
    if sr_from == sr_to or pcm.size == 0:
        return pcm.astype(np.float32, copy=False)
    n_out = max(1, int(round(pcm.size * (sr_to / sr_from))))
    x_out = np.arange(n_out, dtype=np.float64) * (sr_from / sr_to)
    return np.interp(x_out, np.arange(pcm.size, dtype=np.float64), pcm).astype(np.float32)


def snr_db(reference: np.ndarray, candidate: np.ndarray) -> float:
    """Signal-to-noise ratio of candidate vs reference, in dB. A length
    mismatch beyond 1 sample (resampling rounding) scores -inf — silently
    truncating to the shorter signal would let a decoder that drops samples
    (or returns nothing) pass the SNR gate as 'perfect'."""
    reference = np.asarray(reference, dtype=np.float64)
    candidate = np.asarray(candidate, dtype=np.float64)
    if abs(int(reference.size) - int(candidate.size)) > 1:
        return float("-inf")
    n = min(reference.size, candidate.size)
    if n == 0:
        # both (near-)empty: identical; reference-with-content vs empty
        # candidate is caught by the length check above
        return float("inf")
    ref, cand = reference[:n], candidate[:n]
    noise = float(np.sum((ref - cand) ** 2))
    sig = float(np.sum(ref**2))
    if noise == 0.0:
        return float("inf")
    if sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(sig / noise)
