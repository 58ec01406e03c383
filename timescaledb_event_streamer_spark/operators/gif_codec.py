"""Pure-Python GIF decoder for the multimodal `decoder="real"` seam.

GIF needs no codec library either: the entropy coder is the original
variable-width LZW (3-12 bit codes, LSB-first packing, clear/EOI
codes) over palette indices — implementable on stdlib + numpy like
png_codec (r6) and jpeg_codec (r7). From the public GIF87a/89a
specification, verified against golden files authored independently
(tools/make_golden_gif.py carries its OWN greedy LZW encoder and
struct-packed blocks — never this decoder's helpers).

Supported: GIF87a/GIF89a, global and local color tables, interlaced
and non-interlaced frames, extension blocks skipped (graphic
control/comment/application), first image frame decoded (animated
GIFs return frame 1 — the admission-pipeline read). Malformed
streams raise ValueError, the DLQ posture of the sibling codecs.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    table = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos)
    return table.reshape(n, 3).copy(), pos + 3 * n


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-blocks ran past end of payload")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n


def _lzw_decode(code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """The GIF variant of LZW: LSB-first bit stream, clear code
    2^size, EOI 2^size + 1, width grows after the table fills a
    width, capped at 12 bits until the next clear."""
    clear = 1 << code_size
    eoi = clear + 1

    def fresh_table() -> dict[int, tuple[int, ...]]:
        return {i: (i,) for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None

    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream exhausted before EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = fresh_table()
            next_code = eoi + 1
            width = code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError(f"GIF LZW first code {code} not a literal")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"GIF LZW code {code} out of sequence")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(
            f"GIF frame short: {len(out)} of {n_pixels} pixels decoded"
        )
    return out[:n_pixels]


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def gif_decode(data: bytes) -> np.ndarray:
    """GIF bytes -> (height, width, 3) uint8 RGB (first frame)."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(data, pos, 2 << (flags & 0x07))
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            _, pos = _sub_blocks(data, pos)
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, iflags = struct.unpack(
                "<HHHHB", data[pos : pos + 9]
            )
            pos += 9
            palette = gct
            if iflags & 0x80:
                palette, pos = _color_table(data, pos, 2 << (iflags & 0x07))
            if palette is None:
                raise ValueError("GIF frame has no color table")
            code_size = data[pos]
            pos += 1
            lzw, pos = _sub_blocks(data, pos)
            idx = np.array(
                _lzw_decode(code_size, lzw, w * h), dtype=np.int64
            ).reshape(h, w)
            if idx.max() >= len(palette):
                raise ValueError("GIF pixel index outside the color table")
            rows = palette[idx]
            if iflags & 0x40:
                rows = _deinterlace(rows)
            return rows
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    raise ValueError("GIF has no image frame")
