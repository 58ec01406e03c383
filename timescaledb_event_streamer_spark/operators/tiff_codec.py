"""Pure-stdlib TIFF codec — the fifth real image container behind the
G1 decode seam (PNG r6, JPEG r7/r8, GIF r7, BMP r8), and the pixel
side of the same TIFF structure the EXIF probe (G10) walks as
metadata.

Implements the uncompressed baseline-TIFF subset from the public
TIFF 6.0 specification: both byte orders (II/MM), 8-bit grayscale
and RGB, strip-based pixel layout (single or multiple strips,
RowsPerStrip), required baseline tags only. Anything compressed,
tiled, planar, or deeper than 8 bits raises loudly.
"""

from __future__ import annotations

import struct

import numpy as np

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

_T_WIDTH, _T_HEIGHT = 256, 257
_T_BITS, _T_COMPRESSION, _T_PHOTOMETRIC = 258, 259, 262
_T_STRIP_OFFSETS, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_COUNTS = 273, 277, 278, 279

_TYPE_SHORT, _TYPE_LONG = 3, 4


def tiff_encode(img: np.ndarray, *, little_endian: bool = True,
                rows_per_strip: int | None = None) -> bytes:
    """(h, w[, 1|3]) uint8 -> baseline uncompressed TIFF bytes in the
    requested byte order, split into strips of `rows_per_strip`
    (default: one strip)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in (1, 3):
        raise ValueError(f"unsupported channel count {ch}")
    e = "<" if little_endian else ">"
    rps = rows_per_strip or h
    strips = [
        img[y : y + rps].astype(np.uint8).tobytes() for y in range(0, h, rps)
    ]
    n = len(strips)

    def entry(tag: int, etype: int, count: int, value: int) -> bytes:
        if etype == _TYPE_SHORT and count == 1:
            return struct.pack(e + "HHIHxx", tag, etype, count, value)
        return struct.pack(e + "HHII", tag, etype, count, value)

    # layout: header(8) + count(2) + 10 entries(120) + next(4) = 134,
    # then [bits array for RGB][strip offsets/counts arrays][pixels]
    n_entries = 10
    ifd_off = 8
    after_ifd = ifd_off + 2 + n_entries * 12 + 4
    extra = b""
    if ch == 3:
        bits_off = after_ifd + len(extra)
        extra += struct.pack(e + "HHH", 8, 8, 8)
        bits_value, bits_count = bits_off, 3
    else:
        bits_value, bits_count = 8, 1
    if n > 1:
        offsets_off = after_ifd + len(extra)
        extra += b"\x00" * (4 * n)  # patched below
        counts_off = after_ifd + len(extra)
        extra += b"".join(struct.pack(e + "I", len(s)) for s in strips)
    pixel_base = after_ifd + len(extra)
    offsets = []
    pos = pixel_base
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    if n > 1:
        extra = bytearray(extra)
        for i, off in enumerate(offsets):
            struct.pack_into(e + "I", extra, offsets_off - after_ifd + 4 * i, off)
        extra = bytes(extra)

    entries = b"".join(
        [
            entry(_T_WIDTH, _TYPE_LONG, 1, w),
            entry(_T_HEIGHT, _TYPE_LONG, 1, h),
            entry(_T_BITS, _TYPE_SHORT, bits_count, bits_value),
            entry(_T_COMPRESSION, _TYPE_SHORT, 1, 1),
            entry(_T_PHOTOMETRIC, _TYPE_SHORT, 1, 1 if ch == 1 else 2),
            entry(
                _T_STRIP_OFFSETS, _TYPE_LONG, n,
                offsets[0] if n == 1 else offsets_off,
            ),
            entry(_T_SPP, _TYPE_SHORT, 1, ch),
            entry(_T_ROWS_PER_STRIP, _TYPE_LONG, 1, rps),
            entry(
                _T_STRIP_COUNTS, _TYPE_LONG, n,
                len(strips[0]) if n == 1 else counts_off,
            ),
            # next-IFD pointer tag is not a tag — pad with an ignored
            # baseline tag (Software=0 offsets are fine for readers);
            # use Orientation=1 to keep readers honest
            entry(274, _TYPE_SHORT, 1, 1),
        ]
    )
    header = struct.pack(e + "2sHI", b"II" if little_endian else b"MM", 42, ifd_off)
    ifd = struct.pack(e + "H", n_entries) + entries + struct.pack(e + "I", 0)
    return header + ifd + extra + b"".join(strips)


def tiff_decode(data: bytes) -> np.ndarray:
    """Baseline uncompressed TIFF bytes -> (h, w, channels) uint8."""
    if not data.startswith(TIFF_MAGICS):
        raise ValueError("not a TIFF payload")
    e = "<" if data[:2] == b"II" else ">"
    if len(data) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack_from(e + "I", data, 4)
    if len(data) < ifd_off + 2:
        raise ValueError("truncated TIFF IFD")
    (count,) = struct.unpack_from(e + "H", data, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(count):
        off = ifd_off + 2 + 12 * i
        if len(data) < off + 12:
            raise ValueError("truncated TIFF IFD entry")
        tag, etype, cnt, raw = struct.unpack_from(e + "HHII", data, off)
        if etype == _TYPE_SHORT and cnt == 1:
            (raw,) = struct.unpack_from(e + "H", data, off + 8)
        tags[tag] = (etype, cnt, raw)

    def val(tag: int, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return tags[tag][2]

    def arr(tag: int, etype_size: int):
        if tag not in tags:
            raise ValueError(f"TIFF missing required tag {tag}")
        etype, cnt, raw = tags[tag]
        if cnt == 1:
            return [raw]
        # bound cnt against the payload BEFORE building the struct
        # format string: an untrusted 32-bit count of 0xFFFFFFFF
        # would otherwise allocate a multi-GB format string.
        size = 2 if etype == _TYPE_SHORT else 4
        if cnt > len(data) or raw + cnt * size > len(data):
            raise ValueError(f"truncated TIFF value array for tag {tag}")
        fmt = e + ("H" if etype == _TYPE_SHORT else "I") * cnt
        return list(struct.unpack_from(fmt, data, raw))

    w, h = val(_T_WIDTH), val(_T_HEIGHT)
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError(f"bad TIFF dimensions {w}x{h}")
    if val(_T_COMPRESSION, 1) != 1:
        raise ValueError("compressed TIFF unsupported")
    ch = val(_T_SPP, 1)
    if ch not in (1, 3):
        raise ValueError(f"unsupported SamplesPerPixel {ch}")
    bits = arr(_T_BITS, 2) if _T_BITS in tags else [8]
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported BitsPerSample {bits}")
    rps = val(_T_ROWS_PER_STRIP, h)
    offsets = arr(_T_STRIP_OFFSETS, 4)
    counts = arr(_T_STRIP_COUNTS, 4)
    if len(offsets) != len(counts):
        raise ValueError("strip offset/count mismatch")
    body = bytearray()
    for off, cnt in zip(offsets, counts):
        if len(data) < off + cnt:
            raise ValueError("truncated TIFF strip")
        body += data[off : off + cnt]
    expected = h * w * ch
    if len(body) != expected:
        raise ValueError(f"TIFF pixel bytes {len(body)} != {expected}")
    del rps  # layout already absorbed by concatenating strips in order
    return np.frombuffer(bytes(body), dtype=np.uint8).reshape(h, w, ch)
