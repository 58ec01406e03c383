"""Pure-Python baseline JPEG decoder for the multimodal
`decoder="real"` seam (VERDICT r6 item 4).

The container has no PIL/libjpeg, but BASELINE sequential JPEG (SOF0,
8-bit, Huffman) needs neither: the entropy coder is canonical Huffman
over (run, size) symbols, the transform is the 8x8 DCT-II — both
implementable on stdlib + numpy. This closes the JPEG branch of the
G1/G2 real-decode gap the same way operators/png_codec.py closed PNG:
from the public ITU-T T.81 spec, verified against independently-
authored golden files (tools/make_golden_jpeg.py writes the streams
with its own struct-packed segments, forward DCT and bit-writer —
never this decoder's tables or helpers).

Supported: SOF0 baseline, 8-bit precision, grayscale and 3-component
YCbCr (any h/v sampling factors <= 2, so 4:4:4 / 4:2:2 / 4:2:0),
restart intervals (DRI + RSTn), APPn/COM skip, 8-bit DQT tables,
16-bit DQT tables, multiple tables per DQT/DHT segment. Progressive
(SOF2), arithmetic coding, 12-bit precision and hierarchical modes
raise ValueError — a real corpus routes those to the stub/DLQ path
rather than silently mis-decoding (same posture as png_codec's
Adam7 gate).

Used from Arrow-batched mapInPandas (operators/multimodal.py), so
per-image Python cost is bounded by batch size and runs partition-
parallel — the executor-side layout a libjpeg path would have.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SOI = b"\xff\xd8"

#: zigzag scan order: scan index -> flat (row*8 + col) position
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_basis() -> np.ndarray:
    """8x8 DCT-II basis matrix A with A[u, x] = alpha(u) *
    cos((2x+1) * u * pi / 16); spatial = A.T @ coeff @ A."""
    a = np.zeros((8, 8))
    for u in range(8):
        alpha = np.sqrt(0.125) if u == 0 else np.sqrt(0.25)
        for x in range(8):
            a[u, x] = alpha * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _dct_basis()


def idct_8x8(coeff: np.ndarray) -> np.ndarray:
    """Inverse 8x8 DCT-II (float64, separable matrix form)."""
    return _A.T @ coeff @ _A


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing and RSTn detection (T.81 B.1.1.5 / E.1.2)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                raise ValueError("JPEG scan data exhausted")
            b = d[self.pos]
            self.pos += 1
            if b != 0xFF:
                return b
            nxt = d[self.pos] if self.pos < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 1
                return 0xFF
            # a real marker inside the scan: the entropy decoder must
            # not consume it — signal via padding bits (EOB-adjacent
            # streams pad with 1-bits; reaching here mid-symbol is a
            # corrupt stream and will surface as a Huffman miss)
            raise ValueError(
                f"unexpected marker FF{nxt:02X} inside entropy data"
            )

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.acc = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self, expected_rst: int) -> None:
        """Byte-align and consume the RSTn marker (T.81 E.1.4)."""
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
            d[self.pos] == 0xFF and d[self.pos + 1] != 0x00
        ):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("expected restart marker, hit end of scan")
        marker = d[self.pos + 1]
        if marker != 0xD0 + (expected_rst & 7):
            raise ValueError(
                f"expected RST{expected_rst & 7}, got FF{marker:02X}"
            )
        self.pos += 2


def _build_huffman(bits: list[int], values: list[int]) -> dict:
    """Canonical Huffman: {(length, code): value} (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude (T.81 F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(
    reader: _BitReader, dc_tab: dict, ac_tab: dict, pred: int
) -> tuple[np.ndarray, int]:
    """One 8x8 block of quantized coefficients in zigzag order ->
    natural order, plus the updated DC predictor."""
    zz = np.zeros(64, dtype=np.int32)
    t = _huff_decode(reader, dc_tab)
    diff = _extend(reader.receive(t), t)
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        zz[k] = _extend(reader.receive(s), s)
        k += 1
    out = np.zeros(64, dtype=np.int32)
    out[ZIGZAG] = zz
    return out.reshape(8, 8), pred


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (height, width, channels) uint8
    (channels = 1 for grayscale, 3 for YCbCr->RGB)."""
    if not data.startswith(JPEG_SOI):
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT: one or more tables
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    tab = np.frombuffer(
                        body[p : p + 64], dtype=np.uint8
                    ).astype(np.int32)
                    p += 64
                else:
                    tab = np.frombuffer(
                        body[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = tab
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT: one or more tables
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                values = list(body[p + 17 : p + 17 + n])
                table = _build_huffman(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid = body[6 + 3 * i]
                hv = body[7 + 3 * i]
                comps.append(
                    {
                        "id": cid,
                        "h": hv >> 4,
                        "v": hv & 0x0F,
                        "tq": body[8 + 3 * i],
                    }
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type FF{marker:02X} "
                "(baseline SOF0 only; progressive stays gated)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS: scan header then entropy data
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs = body[1 + 2 * i]
                tables = body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0x0F))
            return _decode_scan(
                data, pos, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / everything else: skip
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan: list,
    qt: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))

    planes = [
        np.zeros((mcu_rows * c["v"] * 8, mcu_cols * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    preds = [0] * len(comps)
    reader = _BitReader(data, pos)
    rst = 0
    mcus_done = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcus_done and mcus_done % restart_interval == 0:
                reader.align_restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            for ci, (comp, td, ta) in enumerate(scan):
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        block, preds[ci] = _decode_block(
                            reader, huff_dc[td], huff_ac[ta], preds[ci]
                        )
                        spatial = idct_8x8(block * q)
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcus_done += 1

    # upsample subsampled planes (sample replication), crop to frame
    full = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w] + 128.0)

    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
