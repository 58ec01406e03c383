"""Pure-stdlib BMP (Windows DIB) codec — the fourth real image
container behind the G1 decode seam (PNG r6, baseline+progressive
JPEG r7/r8, GIF r7).

Implements the uncompressed BI_RGB subset from the public format
layout (BITMAPFILEHEADER + BITMAPINFOHEADER, MSDN/Wikipedia BMP file
format): 8-bit paletted (the grayscale storage form), 24-bit BGR and
32-bit BGRA pixel arrays, 4-byte-aligned rows, bottom-up and top-down
(negative height) orientations. Decoded channel order is RGB(A) to
match png_codec's convention — the hash/feature pipeline downstream
(multimodal._gray_grid) is container-blind.

BMP matters to the media pipeline precisely because it is the
UNCOMPRESSED interchange container: a BMP of the same pixels as a
PNG/JPEG golden pins the codec chain end-to-end (no entropy coder on
one side of the comparison).
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res, res, px offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)
_BI_RGB = 0


def bmp_encode(img: np.ndarray) -> bytes:
    """(h, w[, channels]) uint8 -> BMP bytes.

    Grayscale (2-D or single-channel) stores as 8-bit paletted with
    the identity gray palette; 3-channel RGB as 24-bit BGR; 4-channel
    RGBA as 32-bit BGRA. Rows are written bottom-up, padded to 4
    bytes — the canonical layout every reader accepts.
    """
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    px = img.astype(np.uint8)
    if ch == 1:
        bits = 8
        palette = b"".join(bytes((g, g, g, 0)) for g in range(256))
        rows = px[:, :, 0]
    elif ch == 3:
        bits = 24
        palette = b""
        rows = px[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    elif ch == 4:
        bits = 32
        palette = b""
        rows = np.concatenate(
            [px[:, :, 2:3], px[:, :, 1:2], px[:, :, 0:1], px[:, :, 3:4]],
            axis=2,
        ).reshape(h, w * 4)  # RGBA -> BGRA
    else:
        raise ValueError(f"unsupported channel count {ch}")
    stride = (w * bits // 8 + 3) & ~3
    pad = b"\x00" * (stride - w * bits // 8)
    body = b"".join(rows[y].tobytes() + pad for y in range(h - 1, -1, -1))
    offset = _FILE_HEADER.size + _INFO_HEADER.size + len(palette)
    info = _INFO_HEADER.pack(
        _INFO_HEADER.size, w, h, 1, bits, _BI_RGB, len(body), 2835, 2835,
        256 if bits == 8 else 0, 0,
    )
    head = _FILE_HEADER.pack(BMP_MAGIC, offset + len(body), 0, 0, offset)
    return head + info + palette + body


def bmp_decode(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, channels) uint8 array, RGB(A) order.

    Supports the BI_RGB subset bmp_encode writes plus top-down
    orientation (negative height) and <=8-bit palettes with
    arbitrary colors; anything compressed (RLE, bitfields) raises.
    """
    if not data.startswith(BMP_MAGIC):
        raise ValueError("not a BMP payload")
    if len(data) < _FILE_HEADER.size + _INFO_HEADER.size:
        raise ValueError("truncated BMP header")
    magic, _fsize, _r1, _r2, offset = _FILE_HEADER.unpack_from(data, 0)
    (
        hdr_size, w, h_signed, planes, bits, compression,
        _img_size, _xppm, _yppm, clr_used, _clr_important,
    ) = _INFO_HEADER.unpack_from(data, _FILE_HEADER.size)
    if hdr_size < _INFO_HEADER.size:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if planes != 1:
        raise ValueError(f"bad plane count {planes}")
    if compression != _BI_RGB:
        raise ValueError(f"unsupported BMP compression {compression}")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError(f"bad dimensions {w}x{h_signed}")
    if bits == 8:
        n_colors = clr_used or 256
        pal_off = _FILE_HEADER.size + hdr_size
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        ch_out = 3
    elif bits in (24, 32):
        pal = None
        ch_out = bits // 8
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    stride = (w * bits // 8 + 3) & ~3
    if len(data) < offset + stride * h:
        raise ValueError("truncated BMP pixel array")
    raw = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)
    if not top_down:
        raw = raw[::-1]
    if bits == 8:
        idx = raw[:, :w]
        img = pal[idx]
        # collapse the identity gray palette back to one channel so a
        # gray roundtrip is shape-stable (h, w, 1)
        if (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all():
            img = img[:, :, :1]
        return img
    px = raw[:, : w * ch_out].reshape(h, w, ch_out)
    if ch_out == 3:
        return px[:, :, ::-1].copy()  # BGR -> RGB
    return np.concatenate(
        [px[:, :, 2:3], px[:, :, 1:2], px[:, :, 0:1], px[:, :, 3:4]], axis=2
    )
