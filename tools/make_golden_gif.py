"""Author the golden GIF byte files + expected pixel arrays.

Writes tests/golden/gif/*.gif and matching *_expected.npy. Streams
are authored INDEPENDENTLY of operators/gif_codec.py: this generator
carries its OWN greedy LZW encoder (longest-match dictionary,
LSB-first bit packing, width growth, 12-bit cap with explicit clear)
and struct-packed block layout, straight from the public GIF89a
specification — never the decoder's helpers — so a decoder bug
cannot be cancelled by a matching encoder bug.

Scenarios:
  pattern_4c      6x5, 2-bit global palette, deterministic pattern
  noise_256c      16x11, full 8-bit palette (code width growth)
  interlaced      8x13, interlace flag set (4-pass row order)
  with_extensions GIF89a graphic-control + comment blocks skipped
  long_stream     80x64 noise overflowing the 4096-code dictionary
                  (explicit clear + table rebuild mid-stream)

Run: python tools/make_golden_gif.py  (idempotent)
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parents[1] / "tests" / "golden" / "gif"


class LZWEncoder:
    """Greedy GIF-LZW: emit clear, longest dictionary matches, EOI."""

    def __init__(self, code_size: int):
        self.code_size = code_size
        self.clear = 1 << code_size
        self.eoi = self.clear + 1
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def _reset_table(self):
        self.table = {(i,): i for i in range(self.clear)}
        self.next_code = self.eoi + 1
        self.width = self.code_size + 1

    def _emit(self, code: int):
        self.acc |= code << self.nbits
        self.nbits += self.width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def encode(self, indices: list[int]) -> bytes:
        self._reset_table()
        self._emit(self.clear)
        buf: tuple[int, ...] = ()
        for px in indices:
            cand = buf + (px,)
            if cand in self.table:
                buf = cand
                continue
            self._emit(self.table[buf])
            # register the new sequence; widen AFTER registering when
            # the next code no longer fits (decoder mirrors this)
            if self.next_code < 4096:
                self.table[cand] = self.next_code
                self.next_code += 1
                if (
                    self.next_code == (1 << self.width) + 1
                    and self.width < 12
                ):
                    self.width += 1
            else:
                self._emit(self.clear)
                self._reset_table()
            buf = (px,)
        if buf:
            self._emit(self.table[buf])
        self._emit(self.eoi)
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def palette_bytes(pal: np.ndarray, bits: int) -> bytes:
    full = np.zeros((2 << (bits - 1), 3), dtype=np.uint8)
    full[: len(pal)] = pal
    return full.tobytes()


def make_gif(
    pal: np.ndarray,
    idx: np.ndarray,
    interlace: bool = False,
    extensions: bool = False,
) -> bytes:
    h, w = idx.shape
    bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    code_size = max(2, bits)
    out = bytearray(b"GIF89a" if extensions else b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += palette_bytes(pal, bits)
    if extensions:
        # graphic control (disposal none, no transparency) + comment
        out += b"\x21\xf9" + sub_blocks(struct.pack("<BHB", 0, 0, 0))
        out += b"\x21\xfe" + sub_blocks(b"golden gif")
    iflags = 0x40 if interlace else 0x00
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    rows = idx
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        rows = idx[order]
    out.append(code_size)
    out += sub_blocks(
        LZWEncoder(code_size).encode([int(v) for v in rows.reshape(-1)])
    )
    out += b"\x3b"
    return bytes(out)


def write_case(name: str, stream: bytes, expected: np.ndarray) -> None:
    (OUT / f"{name}.gif").write_bytes(stream)
    np.save(OUT / f"{name}_expected.npy", expected)
    print(f"{name}.gif: {len(stream)} bytes, expected {expected.shape}")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    pal4 = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    yy, xx = np.mgrid[0:5, 0:6]
    idx4 = ((yy + 2 * xx) % 4).astype(np.int64)
    write_case("pattern_4c", make_gif(pal4, idx4), pal4[idx4])

    rng = np.random.RandomState(13)
    pal256 = rng.randint(0, 256, size=(256, 3)).astype(np.uint8)
    idx256 = rng.randint(0, 256, size=(11, 16)).astype(np.int64)
    write_case("noise_256c", make_gif(pal256, idx256), pal256[idx256])

    idx_i = ((np.mgrid[0:13, 0:8][0] * 3 + np.mgrid[0:13, 0:8][1]) % 4).astype(
        np.int64
    )
    write_case(
        "interlaced", make_gif(pal4, idx_i, interlace=True), pal4[idx_i]
    )

    write_case(
        "with_extensions",
        make_gif(pal4, idx4, extensions=True),
        pal4[idx4],
    )

    idx_l = rng.randint(0, 256, size=(64, 80)).astype(np.int64)
    write_case("long_stream", make_gif(pal256, idx_l), pal256[idx_l])


if __name__ == "__main__":
    main()
