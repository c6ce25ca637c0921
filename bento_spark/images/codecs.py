"""Dependency-free PNG codec (public W3C PNG spec / RFC 2083).

No PIL/imageio ships in this container, so — like the audio package's
WAV/PCM codecs and the msgpack/avro wire codecs — the format is
implemented directly from the published spec: chunk framing with CRC32,
zlib-compressed scanlines, filter types 0-4 (None/Sub/Up/Average/Paeth),
8-bit greyscale (color type 0) and RGB (color type 2), no interlace.
PNG is lossless: decode(encode(x)) is BIT-IDENTICAL to x, the image twin
of the audio SNR invariant.

Encoding defaults to filter 0 (None) — deterministic bytes for the
exactly-once row-identity tests; `filter_type` forces 1-4 so the decoder's
filter reconstruction is testable against our own encoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _filter_line(ftype: int, raw: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Apply filter `ftype` to one raw scanline (uint8 vector)."""
    raw16 = raw.astype(np.int16)
    left = np.concatenate([np.zeros(bpp, np.int16), raw16[:-bpp]])
    up = prev.astype(np.int16)
    upleft = np.concatenate([np.zeros(bpp, np.int16), up[:-bpp]])
    if ftype == 0:
        return raw
    if ftype == 1:
        return ((raw16 - left) % 256).astype(np.uint8)
    if ftype == 2:
        return ((raw16 - up) % 256).astype(np.uint8)
    if ftype == 3:
        return ((raw16 - (left + up) // 2) % 256).astype(np.uint8)
    if ftype == 4:
        pred = _paeth(left, up, upleft)
        return ((raw16 - pred) % 256).astype(np.uint8)
    raise ValueError(f"png: unsupported filter type {ftype}")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def png_encode(arr: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 array HxW (grey) or HxWx3 (RGB) -> PNG bytes."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError(f"png_encode needs uint8, got {arr.dtype}")
    if arr.ndim == 2:
        color_type, channels = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = arr.shape[:2]
    else:
        raise ValueError(f"png_encode needs HxW or HxWx3, got shape {arr.shape}")
    bpp = channels
    flat = arr.reshape(h, w * channels)
    body = bytearray()
    prev = np.zeros(w * channels, np.uint8)
    for y in range(h):
        body.append(filter_type)
        body += _filter_line(filter_type, flat[y], prev, bpp).tobytes()
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body), level))
        + _chunk(b"IEND", b"")
    )


def _unfilter_line(ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct one scanline in place-order (spec §6: reconstruction is
    sequential — Sub/Paeth depend on already-reconstructed left pixels)."""
    if ftype == 0:
        return line.copy()
    if ftype == 2:
        return ((line.astype(np.int16) + prev) % 256).astype(np.uint8)
    out = np.zeros_like(line)
    n = len(line)
    li, pv = line.astype(np.int32), prev.astype(np.int32)
    if ftype == 1:
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (li[i] + left) % 256
        return out
    if ftype == 3:
        for i in range(n):
            left = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (li[i] + (left + pv[i]) // 2) % 256
        return out
    if ftype == 4:
        for i in range(n):
            a = int(out[i - bpp]) if i >= bpp else 0
            b = int(pv[i])
            c = int(pv[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (li[i] + pred) % 256
        return out
    raise ValueError(f"png: unsupported filter type {ftype}")


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array HxW (grey) or HxWx3 (RGB)."""
    if data[:8] != PNG_SIG:
        raise ValueError("png: bad signature")
    i, ihdr, idat = 8, None, bytearray()
    while i < len(data):
        (length,) = struct.unpack_from(">I", data, i)
        tag = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        (crc,) = struct.unpack_from(">I", data, i + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {tag!r} chunk")
        i += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("png: missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError(f"png: unsupported IHDR (depth={depth}, comp={comp}, filt={filt})")
    if interlace != 0:
        raise ValueError("png: interlaced images unsupported")
    channels = {0: 1, 2: 3}.get(color_type)
    if channels is None:
        raise ValueError(f"png: unsupported color type {color_type} (grey/RGB only)")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("png: IDAT size mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1)
        out[y] = _unfilter_line(ftype, line, prev, channels)
        prev = out[y]
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, 3)
