"""BVC — a deterministic fixture video container for the video column
family.

No real video codec library (ffmpeg/pyav/opencv) ships in this
container, so — per the multimodal brief — the DECODE of real codecs is
stubbed behind a clearly-marked error, while the Spark-side plumbing
(schema, partitioning, Arrow batch shape, frame-sample row explosion) is
real and tested against this deterministic fake. BVC is intentionally
trivial and fully specified here:

    header (16 bytes, big-endian):
        magic   4s   b"BVC1"
        version u8   1
        codec   u8   1 = PNG-framed (each frame is one complete PNG blob,
                     encoded/decoded by images/codecs.py)
        width   u16  frame width in px
        height  u16  frame height in px
        fps     u16  frames per second (integer)
        n_frames u16 frame count
        reserved u16 0
    body: n_frames x ( u32 byte-length | frame blob )

Two properties matter for scale and are load-bearing in the stages:

- ``bvc_probe`` parses ONLY the 16-byte header — video metadata never
  costs a frame decode (O(1) per row regardless of payload size).
- ``bvc_frame_blobs`` slices frame blobs out of the container WITHOUT
  decoding pixels — frame sampling is O(sampled bytes), not O(pixels),
  because the frames are already self-contained PNGs.

Encoding is deterministic (filter-0 PNG frames): same frames -> identical
container bytes, the property exactly-once row identity depends on.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"BVC1"
CODEC_PNG = 1
_HDR = struct.Struct(">4sBBHHHHH")
HEADER_SIZE = _HDR.size  # 16

#: codecs a real deployment would carry; decode for these is STUBBED —
#: naming them keeps the error actionable and the metadata path honest.
EXTERNAL_CODECS = ("h264", "h265", "vp9", "av1")


def bvc_encode(frames: list[np.ndarray], fps: int) -> bytes:
    """Encode HxWx3 uint8 frames into one BVC blob (PNG-framed)."""
    from bento_spark.images.codecs import png_encode

    if not frames:
        raise ValueError("bvc_encode: at least one frame required")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("bvc_encode: all frames must share one size")
    if not (0 < fps <= 0xFFFF and len(frames) <= 0xFFFF):
        raise ValueError("bvc_encode: fps/n_frames out of u16 range")
    parts = [_HDR.pack(MAGIC, 1, CODEC_PNG, w, h, fps, len(frames), 0)]
    for f in frames:
        blob = png_encode(f)
        parts.append(struct.pack(">I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


def bvc_probe(blob: bytes) -> dict:
    """Header-only metadata parse — O(1), never touches frame bytes."""
    if len(blob) < HEADER_SIZE:
        raise ValueError(f"bvc: blob too short for a header ({len(blob)} bytes)")
    magic, version, codec, w, h, fps, n_frames, _ = _HDR.unpack_from(blob)
    if magic != MAGIC:
        raise ValueError(
            "bvc: bad magic — not a BVC container; real video codecs "
            f"({'/'.join(EXTERNAL_CODECS)}) need an external decoder "
            "(ffmpeg/pyav), which is not available in this environment"
        )
    if version != 1:
        raise ValueError(f"bvc: unsupported version {version}")
    return {
        "codec": codec,
        "width": int(w),
        "height": int(h),
        "fps": int(fps),
        "n_frames": int(n_frames),
        "duration_ms": int(n_frames) * 1000 // int(fps) if fps else 0,
    }


def bvc_frame_blobs(blob: bytes, indices: list[int] | None = None) -> list[bytes]:
    """Slice out frame blobs (still-encoded PNGs) by index, decode-free.
    ``indices=None`` returns all frames in order; indices must be sorted
    ascending (single forward scan over the length prefixes)."""
    meta = bvc_probe(blob)
    want = list(range(meta["n_frames"])) if indices is None else list(indices)
    if any(i < 0 or i >= meta["n_frames"] for i in want):
        raise ValueError(f"bvc: frame index out of range 0..{meta['n_frames'] - 1}")
    out, pos, wi = [], HEADER_SIZE, 0
    for fi in range(meta["n_frames"]):
        if wi >= len(want):
            break
        if pos + 4 > len(blob):
            raise ValueError("bvc: truncated container (length prefix)")
        (ln,) = struct.unpack_from(">I", blob, pos)
        pos += 4
        if pos + ln > len(blob):
            raise ValueError("bvc: truncated container (frame body)")
        if fi == want[wi]:
            out.append(blob[pos:pos + ln])
            wi += 1
        pos += ln
    return out


def bvc_decode(blob: bytes) -> tuple[list[np.ndarray], int]:
    """Decode every frame to HxWx3 uint8 arrays. Lossless roundtrip:
    decode(encode(frames)) is bit-identical (PNG is lossless)."""
    from bento_spark.images.codecs import png_decode

    meta = bvc_probe(blob)
    if meta["codec"] != CODEC_PNG:
        raise ValueError(
            f"bvc: codec id {meta['codec']} requires an external decoder "
            "(ffmpeg/pyav), not available in this environment; only the "
            "PNG-framed fixture codec decodes here"
        )
    frames = []
    for fb in bvc_frame_blobs(blob):
        arr = png_decode(fb)
        if arr.ndim == 2:
            arr = np.stack([arr, arr, arr], axis=-1)
        frames.append(arr)
    return frames, meta["fps"]
