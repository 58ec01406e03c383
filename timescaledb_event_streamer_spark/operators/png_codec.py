"""Pure-Python PNG codec for the multimodal `decoder="real"` seam.

The container has no PIL/ffmpeg, but PNG needs neither: the format is
zlib (stdlib) + per-scanline prediction filters, so decode, nearest-
neighbor resize and re-encode run on numpy alone. This closes the G2
"real decode" gap for the PNG branch of the media zoo; JPEG/video/
audio codecs remain environment-gated (their entropy coders genuinely
need a codec library).

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced, all five scanline filters.
Interlaced (Adam7) and 1/2/4/16-bit depths raise ValueError — a real
corpus routes those to the stub/DLQ path rather than silently
mis-decoding.

Used from Arrow-batched mapInPandas (operators/multimodal.py), so the
per-image Python cost is bounded by batch size and runs partition-
parallel — the same executor-side layout the PIL path would have.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per color type (8-bit only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = len(PNG_SIGNATURE)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline prediction filters. Returns
    (height, width*bpp) uint8."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = line + prev  # uint8 wraps mod 256, per spec
        elif ftype == 1:  # Sub — sequential in x, vectorized over bytes/px
            cur = out[y]
            cur[:bpp] = line[:bpp]
            for x in range(bpp, stride):
                cur[x] = (int(line[x]) + int(cur[x - bpp])) & 0xFF
        elif ftype == 3:  # Average
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG payload")
    width = height = None
    color_type = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace:
                raise ValueError("interlaced (Adam7) PNG unsupported")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("PNG missing IHDR")
    bpp = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expected = height * (1 + width * bpp)
    if len(raw) != expected:
        raise ValueError(f"PNG pixel data length {len(raw)} != {expected}")
    flat = _unfilter(raw, width, height, bpp)
    img = flat.reshape(height, width, bpp)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, channels) uint8 -> PNG bytes (filter 0 rows,
    deterministic zlib)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = img.astype(np.uint8).reshape(h, w * ch)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pixel-center mapping —
    the same grid PIL's NEAREST uses)."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(target_h) + 0.5) * h / target_h).astype(int), h - 1)
    xs = np.minimum(((np.arange(target_w) + 0.5) * w / target_w).astype(int), w - 1)
    return img[ys][:, xs]
