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

Supported: SOF0 baseline AND SOF2 progressive (r8 — spectral
selection + successive approximation, T.81 G.2: DC first/refine,
AC first/refine with EOB runs, interleaved DC scans and
non-interleaved AC scans, multi-scan coefficient accumulation),
8-bit precision, grayscale and 3-component YCbCr (any h/v sampling
factors <= 2, so 4:4:4 / 4:2:2 / 4:2:0), restart intervals
(DRI + RSTn), APPn/COM skip, 8-bit DQT tables, 16-bit DQT tables,
multiple tables per DQT/DHT segment. Arithmetic coding, 12-bit
precision and hierarchical modes raise ValueError — a real corpus
routes those to the stub/DLQ path rather than silently mis-decoding
(same posture as png_codec's Adam7 gate). Progressive goldens are
authored by tools/make_golden_jpeg.py's own scan encoders (G.1
side), never this decoder's helpers.

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
    coeffs: dict[int, np.ndarray] | None = None
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
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
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
            if marker == 0xC2:
                # per-component coefficient accumulators, zigzag
                # order, full interleaved-MCU grid (padding blocks
                # are only ever touched by interleaved scans and
                # cropped at reconstruction)
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcu_cols = -(-w // (8 * hmax))
                mcu_rows = -(-h // (8 * vmax))
                frame["mcu_cols"], frame["mcu_rows"] = mcu_cols, mcu_rows
                coeffs = {
                    c["id"]: np.zeros(
                        (mcu_rows * c["v"], mcu_cols * c["h"], 64),
                        dtype=np.int32,
                    )
                    for c in comps
                }
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type FF{marker:02X} "
                "(baseline SOF0 and progressive SOF2 only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS: scan header then entropy data
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs = body[1 + 2 * i]
                tables = body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0x0F))
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not frame["progressive"]:
                return _decode_scan(
                    data, pos, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            pos = _decode_progressive_scan(
                data, pos, frame, scan, coeffs, huff_dc, huff_ac,
                restart_interval, ss, se, ah, al,
            )
            nscans = frame["nscans"] = frame.get("nscans", 0) + 1
        # APPn / COM / everything else: skip
    if frame is not None and frame.get("progressive") and frame.get("nscans"):
        return _reconstruct_progressive(frame, coeffs, qt)
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


# ---------------------------------------------------------------------------
# progressive mode (SOF2, T.81 G.2): scans accumulate into per-
# component zigzag coefficient buffers; reconstruction happens once
# at end of stream. Four scan procedures: DC first / DC refine
# (spectral band 0..0, possibly interleaved) and AC first / AC refine
# (band Ss..Se, single component, EOB-run coded).


def _scan_block_list(
    frame: dict, scan: list, interleaved: bool
) -> list[tuple[int, int, int]]:
    """The (comp_index, block_y, block_x) visit order of one scan.
    Interleaved: MCU raster, v*h blocks per component per MCU (the
    baseline order). Non-interleaved: raster over the COMPONENT's own
    block grid (ceil(comp_samples / 8), T.81 A.2.2) — the padding
    blocks of the interleaved grid are not coded."""
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    order: list[tuple[int, int, int]] = []
    if interleaved:
        for my in range(frame["mcu_rows"]):
            for mx in range(frame["mcu_cols"]):
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            order.append(
                                (ci, my * c["v"] + by, mx * c["h"] + bx)
                            )
        return order
    c = comps[0]
    comp_w = -(-frame["w"] * c["h"] // hmax)
    comp_h = -(-frame["h"] * c["v"] // vmax)
    bw = -(-comp_w // 8)
    bh = -(-comp_h // 8)
    for by in range(bh):
        for bx in range(bw):
            order.append((0, by, bx))
    return order


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan: list,
    coeffs: dict[int, np.ndarray],
    huff_dc: dict[int, dict],
    huff_ac: dict[int, dict],
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """Decode one progressive scan's entropy data into the coefficient
    buffers; returns the stream position of the next marker."""
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        if ah != 0 and ah != al + 1:
            raise ValueError("successive approximation must step by 1 bit")

    interleaved = len(scan) > 1
    order = _scan_block_list(frame, scan, interleaved)
    reader = _BitReader(data, pos)
    preds = [0] * len(scan)
    eobrun = 0
    rst = 0
    done = 0
    # restart cadence: interleaved scans restart every Ri MCUs (each
    # MCU = sum(v*h) blocks here), non-interleaved every Ri blocks
    blocks_per_unit = (
        sum(c["v"] * c["h"] for c, _, _ in scan) if interleaved else 1
    )
    for ci, by, bx in order:
        if (
            restart_interval
            and done
            and done % (restart_interval * blocks_per_unit) == 0
        ):
            reader.align_restart(rst)
            rst = (rst + 1) & 7
            preds = [0] * len(scan)
            eobrun = 0
        comp, td, ta = scan[ci]
        block = coeffs[comp["id"]][by, bx]
        if ss == 0:
            if ah == 0:  # DC first: point transform is >> al (G.1.2.1)
                t = _huff_decode(reader, huff_dc[td])
                preds[ci] += _extend(reader.receive(t), t)
                block[0] = preds[ci] << al
            else:  # DC refine: one bit per block
                if reader.read_bit():
                    block[0] |= 1 << al
        elif ah == 0:
            eobrun = _ac_first_block(
                reader, huff_ac[ta], block, ss, se, al, eobrun
            )
        else:
            eobrun = _ac_refine_block(
                reader, huff_ac[ta], block, ss, se, al, eobrun
            )
        done += 1
    # discard pad bits, then locate the next marker
    p = reader.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] not in (0x00,)
    ):
        p += 1
    return p


def _ac_first_block(
    reader: _BitReader,
    ac_tab: dict,
    block: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """AC first scan, one block (T.81 G.2.1): band values arrive
    point-transformed (divided by 2^al, truncated toward zero) and are
    stored re-shifted; an EOB symbol starts a run of blocks whose band
    is entirely zero."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.receive(r)
                return eobrun - 1  # this block is part of the run
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("progressive AC run past band end")
        block[k] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _ac_refine_block(
    reader: _BitReader,
    ac_tab: dict,
    block: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """AC refinement scan, one block (T.81 G.2.2): newly-significant
    coefficients arrive as magnitude-1 symbols; every coefficient with
    NONZERO history costs one correction bit as the decoder advances
    over it — including inside ZRL runs and EOB runs."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break  # tail of this block handled below
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "progressive refinement magnitude must be 1"
                    )
                val = p1 if reader.read_bit() else m1
            while k <= se:
                c = int(block[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        block[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("refinement placement past band end")
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(block[k])
            if c != 0 and reader.read_bit() and (c & p1) == 0:
                block[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(
    frame: dict, coeffs: dict[int, np.ndarray], qt: dict[int, np.ndarray]
) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficient buffers — the
    same reconstruction math as the baseline path, factored over the
    multi-scan buffers."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        buf = coeffs[c["id"]]
        q = qt[c["tq"]]
        bh, bw = buf.shape[0], buf.shape[1]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = buf[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = idct_8x8(
                    nat.reshape(8, 8) * q
                )
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
