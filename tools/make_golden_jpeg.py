"""Author the golden baseline-JPEG byte files + expected pixel arrays.

Writes tests/golden/jpeg/*.jpg and matching *_expected.npy. The
streams are authored INDEPENDENTLY of operators/jpeg_codec.py: this
generator carries its OWN forward DCT (direct double-loop formula),
its OWN canonical-Huffman construction, its OWN zigzag list, bit
writer, byte stuffing and restart logic, all straight from the public
ITU-T T.81 spec — never the decoder's tables or helpers — so a
decoder bug cannot be cancelled by a matching encoder bug.

The expected arrays are computed from the EXACT quantized
coefficients this generator emitted (dequantize -> its own inverse
DCT -> upsample -> color convert -> clip), i.e. what ANY correct
baseline decoder must reconstruct (float round-off aside; the pytest
allows max|diff| <= 1).

Scenarios:
  gray_8x8        one block, the arithmetic in isolation
  gray_20x13      non-multiple-of-8 frame (edge-block cropping)
  gray_restart    DRI=2 with RST0..n interleaved, DC predictor resets
  color_444       3-component YCbCr, no subsampling
  color_420       4:2:0 subsampling, odd frame size (17x18)
  progressive.jpg SOF2 header only — pins the ValueError gate

Run: python tools/make_golden_jpeg.py  (idempotent)
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parents[1] / "tests" / "golden" / "jpeg"

# generator's own zigzag: walk the anti-diagonals explicitly
def _zigzag_order() -> list[int]:
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        if s % 2 == 0:
            diag.reverse()
        order.extend(y * 8 + x for y, x in diag)
    return order


ZZ = _zigzag_order()

# formula-based quantization tables (legal 1..255, deterministic)
Q_LUMA = np.array([[8 + u + v for v in range(8)] for u in range(8)], dtype=np.int32)
Q_CHROMA = np.array(
    [[12 + 2 * (u + v) for v in range(8)] for u in range(8)], dtype=np.int32
)


def fdct(block: np.ndarray) -> np.ndarray:
    """Forward 8x8 DCT-II, direct formula (T.81 A.3.3)."""
    out = np.zeros((8, 8))
    for u in range(8):
        cu = np.sqrt(0.125) if u == 0 else 0.5
        for v in range(8):
            cv = np.sqrt(0.125) if v == 0 else 0.5
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[u, v] = cu * cv * s
    return out


def idct_direct(coeff: np.ndarray) -> np.ndarray:
    """Inverse DCT, direct formula — the generator's own."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = np.sqrt(0.125) if u == 0 else 0.5
                for v in range(8):
                    cv = np.sqrt(0.125) if v == 0 else 0.5
                    s += (
                        cu * cv * coeff[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s
    return out


# -- canonical Huffman from used symbols: every symbol at length 8 ----


def huff_spec(symbols: set[int]) -> tuple[list[int], list[int]]:
    vals = sorted(symbols)
    assert len(vals) <= 255
    bits = [0] * 16
    bits[7] = len(vals)  # all codes length 8
    return bits, vals


def huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def pad(self) -> None:
        while self.n:
            self.put(1, 1)

    def raw_marker(self, b: int) -> None:
        self.pad()
        self.out += bytes([0xFF, b])


def magnitude(v: int) -> tuple[int, int]:
    """(size, appended bits) per T.81 F.1.2.1.2 / F.1.2.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return (s, v if v > 0 else v + (1 << s) - 1)


def block_symbols(zzvals: np.ndarray, pred: int) -> tuple[list, int]:
    """(kind, symbol, extra_bits_value, extra_bits_n) list for one
    block; kind 'dc'/'ac'."""
    syms = []
    dc = int(zzvals[0])
    s, bitsv = magnitude(dc - pred)
    syms.append(("dc", s, bitsv, s))
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zzvals[k]:
            last_nz = k
    k = 1
    while k <= last_nz:
        v = int(zzvals[k])
        if v == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            syms.append(("ac", 0xF0, 0, 0))  # ZRL
            run -= 16
        s, bitsv = magnitude(v)
        syms.append(("ac", (run << 4) | s, bitsv, s))
        run = 0
        k += 1
    if last_nz < 63:
        syms.append(("ac", 0x00, 0, 0))  # EOB
    return syms, dc


# -- segment writers ---------------------------------------------------


def seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def dqt_segment(tables: list[tuple[int, np.ndarray]]) -> bytes:
    body = b""
    for tq, q in tables:
        body += bytes([tq]) + bytes(int(q.reshape(64)[ZZ[i]]) for i in range(64))
    return seg(0xDB, body)


def dht_segment(tables: list[tuple[int, int, list[int], list[int]]]) -> bytes:
    body = b""
    for tc, th, bits, vals in tables:
        body += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return seg(0xC4, body)


def sof0_segment(h: int, w: int, comps: list[tuple[int, int, int, int]]) -> bytes:
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        body += bytes([cid, (hs << 4) | vs, tq])
    return seg(0xC0, body)


def sos_segment(comps: list[tuple[int, int, int]]) -> bytes:
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([0, 63, 0])
    return seg(0xDA, body)


APP0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
COM = seg(0xFE, b"golden baseline jpeg")


# -- encoding pipeline -------------------------------------------------


def plane_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad a component plane to 8-multiples by edge replication and
    return quantizable 8x8 blocks in raster order with shape
    (rows, cols, 8, 8)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    rows, cols = ph // 8, pw // 8
    out = np.zeros((rows, cols, 8, 8))
    for r in range(rows):
        for c in range(cols):
            out[r, c] = padded[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8]
    return out


def quantize_plane(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """-> (rows, cols, 64) quantized zigzag coefficient vectors."""
    blocks = plane_blocks(plane)
    rows, cols = blocks.shape[:2]
    out = np.zeros((rows, cols, 64), dtype=np.int32)
    for r in range(rows):
        for c in range(cols):
            coeff = np.round(fdct(blocks[r, c] - 128.0) / q).astype(np.int32)
            out[r, c] = coeff.reshape(64)[ZZ]
    return out


def rgb_to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = img[:, :, 0].astype(float), img[:, :, 1].astype(float), img[:, :, 2].astype(float)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def subsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Box-average subsample by (fy, fx), edge-padding odd sizes."""
    h, w = plane.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def expected_from_coeffs(
    comp_coeffs: list[np.ndarray],
    comp_q: list[np.ndarray],
    samp: list[tuple[int, int]],
    h: int,
    w: int,
    color: bool,
) -> np.ndarray:
    """What a correct decoder reconstructs from the emitted
    coefficients — generator-side inverse path (own IDCT)."""
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    planes = []
    for coeffs, q, (hs, vs) in zip(comp_coeffs, comp_q, samp):
        rows, cols = coeffs.shape[:2]
        plane = np.zeros((rows * 8, cols * 8))
        for r in range(rows):
            for c in range(cols):
                nat = np.zeros(64)
                nat[ZZ] = coeffs[r, c]
                plane[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = idct_direct(
                    nat.reshape(8, 8) * q
                )
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w] + 128.0)
    if not color:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def encode(
    name: str,
    comp_coeffs: list[np.ndarray],
    comp_q: list[tuple[int, np.ndarray]],
    samp: list[tuple[int, int]],
    h: int,
    w: int,
    restart_interval: int = 0,
) -> bytes:
    """Assemble the full interchange stream from quantized zigzag
    coefficients (interleaved MCU scan, T.81 A.2.3)."""
    ncomp = len(comp_coeffs)
    color = ncomp == 3

    # collect used symbols per table class (luma = comp 0, chroma = 1+)
    dc_syms: dict[int, set] = {0: set(), 1: set()}
    ac_syms: dict[int, set] = {0: set(), 1: set()}

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))

    def mcu_stream():
        preds = [0] * ncomp
        mcu_idx = 0
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                    yield ("rst", mcu_idx // restart_interval - 1)
                    preds = [0] * ncomp
                for ci in range(ncomp):
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            r = my * vs + by
                            c = mx * hs + bx
                            syms, preds[ci] = block_symbols(
                                comp_coeffs[ci][r, c], preds[ci]
                            )
                            yield ("blk", ci, syms)
                mcu_idx += 1

    # pass 1: symbol census
    for item in mcu_stream():
        if item[0] != "blk":
            continue
        _, ci, syms = item
        cls = 0 if ci == 0 else 1
        for kind, sym, _, _ in syms:
            (dc_syms if kind == "dc" else ac_syms)[cls].add(sym)

    classes = [0] if ncomp == 1 else [0, 1]
    dc_spec = {cls: huff_spec(dc_syms[cls]) for cls in classes}
    ac_spec = {cls: huff_spec(ac_syms[cls]) for cls in classes}
    dc_codes = {cls: huff_codes(*dc_spec[cls]) for cls in classes}
    ac_codes = {cls: huff_codes(*ac_spec[cls]) for cls in classes}

    # pass 2: entropy-coded data
    bw = BitWriter()
    for item in mcu_stream():
        if item[0] == "rst":
            bw.raw_marker(0xD0 + (item[1] & 7))
            continue
        _, ci, syms = item
        cls = 0 if ci == 0 else 1
        for kind, sym, bitsv, nbits in syms:
            code, length = (dc_codes if kind == "dc" else ac_codes)[cls][sym]
            bw.put(code, length)
            if nbits:
                bw.put(bitsv, nbits)
    bw.pad()

    out = bytearray(b"\xff\xd8")
    out += APP0 + COM
    out += dqt_segment(comp_q if color else comp_q[:1])
    comps_sof = [
        (i + 1, samp[i][0], samp[i][1], comp_q[min(i, len(comp_q) - 1)][0])
        for i in range(ncomp)
    ]
    out += sof0_segment(h, w, comps_sof)
    dht_tables = []
    for cls in classes:
        dht_tables.append((0, cls, *dc_spec[cls]))
        dht_tables.append((1, cls, *ac_spec[cls]))
    out += dht_segment(dht_tables)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += sos_segment([(i + 1, 0 if i == 0 else 1, 0 if i == 0 else 1) for i in range(ncomp)])
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def gray_image(h: int, w: int, seed: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 7 + xx * 11 + (yy * xx + seed) % 37 * 5) % 256).astype(float)


def color_image(h: int, w: int, seed: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (yy * 9 + xx * 3 + seed) % 256
    g = (yy * 2 + xx * 13 + seed * 7) % 256
    b = (yy * 5 + xx * 5 + (yy + xx + seed) % 29 * 8) % 256
    return np.stack([r, g, b], axis=2).astype(float)


def write_case(name: str, stream: bytes, expected: np.ndarray) -> None:
    (OUT / f"{name}.jpg").write_bytes(stream)
    np.save(OUT / f"{name}_expected.npy", expected)
    print(f"{name}.jpg: {len(stream)} bytes, expected {expected.shape}")


def make_gray(name: str, h: int, w: int, seed: int, restart: int = 0) -> None:
    img = gray_image(h, w, seed)
    coeffs = quantize_plane(img, Q_LUMA)
    stream = encode(name, [coeffs], [(0, Q_LUMA)], [(1, 1)], h, w, restart)
    expected = expected_from_coeffs([coeffs], [Q_LUMA], [(1, 1)], h, w, False)
    write_case(name, stream, expected)


def make_color(name: str, h: int, w: int, seed: int, samp: list) -> None:
    img = color_image(h, w, seed)
    y, cb, cr = rgb_to_ycbcr(img)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    planes = []
    # pad each FULL-RES plane to MCU multiples first, then subsample:
    # block grids then line up exactly with the interleaved MCU scan
    mh, mw = -(-h // (8 * vmax)) * 8 * vmax, -(-w // (8 * hmax)) * 8 * hmax
    for plane, (hs, vs) in zip((y, cb, cr), samp):
        p = np.pad(plane, ((0, mh - h), (0, mw - w)), mode="edge")
        planes.append(subsample(p, vmax // vs, hmax // hs))
    qs = [Q_LUMA, Q_CHROMA, Q_CHROMA]
    coeffs = [quantize_plane(p, q) for p, q in zip(planes, qs)]
    stream = encode(
        name, coeffs, [(0, Q_LUMA), (1, Q_CHROMA)], samp, h, w
    )
    expected = expected_from_coeffs(coeffs, qs, samp, h, w, True)
    write_case(name, stream, expected)


def make_progressive_stub() -> None:
    body = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    stream = b"\xff\xd8" + APP0 + seg(0xC2, body) + b"\xff\xd9"
    (OUT / "progressive.jpg").write_bytes(stream)
    print(f"progressive.jpg: {len(stream)} bytes (gate case)")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    make_gray("gray_8x8", 8, 8, seed=3)
    make_gray("gray_20x13", 13, 20, seed=11)
    make_gray("gray_restart", 16, 24, seed=5, restart=2)
    make_color("color_444", 16, 16, seed=7, samp=[(1, 1), (1, 1), (1, 1)])
    make_color("color_420", 17, 18, seed=9, samp=[(2, 2), (1, 1), (1, 1)])
    make_progressive_stub()
    make_progressive_gray("prog_gray_8x8", 8, 8, seed=3)
    make_progressive_gray("prog_gray_20x13", 13, 20, seed=11)
    make_progressive_gray("prog_gray_sparse", 24, 16, seed=29)
    make_progressive_color(
        "prog_color_444", 16, 16, seed=7, samp=[(1, 1), (1, 1), (1, 1)]
    )
    make_progressive_color(
        "prog_color_420", 17, 18, seed=9, samp=[(2, 2), (1, 1), (1, 1)]
    )




# -- progressive encoding (r8): SOF2 scan-script emitter -----------------
# T.81 G.1 side, independently authored (never the decoder's helpers):
# DC first / DC refine (interleaved), AC first / AC refine with EOB
# runs and buffered correction bits (the libjpeg-documented emission
# order, re-derived from G.1.2.2-G.1.2.3).


def sof2_segment(h: int, w: int, comps: list[tuple[int, int, int, int]]) -> bytes:
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        body += bytes([cid, (hs << 4) | vs, tq])
    return seg(0xC2, body)


def sos_prog_segment(
    comps: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int
) -> bytes:
    body = bytes([len(comps)])
    for cid, td, ta in comps:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return seg(0xDA, body)


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform: v / 2^al truncated toward ZERO (G.1.2.2) —
    NOT an arithmetic shift for negatives."""
    a = abs(int(v)) >> al
    return -a if v < 0 else a


def _dc_first_events(comp_coeffs, samp, mcu_rows, mcu_cols, al):
    """Interleaved DC-first scan events: ('sym', size, bits, n)."""
    events = []
    preds = [0] * len(comp_coeffs)
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci, (hs, vs) in enumerate(samp):
                for by in range(vs):
                    for bx in range(hs):
                        # DC point transform IS an arithmetic shift
                        dc = int(comp_coeffs[ci][my * vs + by, mx * hs + bx, 0]) >> al
                        s, bitsv = magnitude(dc - preds[ci])
                        preds[ci] = dc
                        events.append(("sym", s, bitsv, s))
    return events


def _dc_refine_events(comp_coeffs, samp, mcu_rows, mcu_cols, al):
    events = []
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci, (hs, vs) in enumerate(samp):
                for by in range(vs):
                    for bx in range(hs):
                        dc = int(comp_coeffs[ci][my * vs + by, mx * hs + bx, 0])
                        events.append(("bit", (dc >> al) & 1, None, 1))
    return events


def _ac_first_events(blocks, ss, se, al):
    """Non-interleaved AC-first scan events over raster blocks."""
    events = []
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            events.append(("sym", r << 4, eobrun - (1 << r), r))
            eobrun = 0

    for block in blocks:
        band = [_trunc_shift(block[k], al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(band) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for i in range(nz[-1] + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                events.append(("sym", 0xF0, 0, 0))  # ZRL
                run -= 16
            s, bitsv = magnitude(v)
            events.append(("sym", (run << 4) | s, bitsv, s))
            run = 0
        if nz[-1] < se - ss:
            eobrun += 1
    flush_eob()
    return events


def _ac_refine_events(blocks, ss, se, al):
    """Non-interleaved AC-refinement scan events (G.1.2.3): newly-
    significant coefficients as magnitude-1 symbols + sign bit;
    correction bits for already-nonzero coefficients buffered and
    emitted after the symbol that carries the decoder past them."""
    events = []
    eobrun = 0
    pending: list[int] = []  # BE: correction bits owed to the EOB run

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            events.append(("sym", r << 4, eobrun - (1 << r), r))
            events.extend(("bit", b, None, 1) for b in pending)
            pending = []
            eobrun = 0

    for block in blocks:
        absval = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
        eobpos = -1  # last NEWLY significant index (absval == 1)
        for i, a in enumerate(absval):
            if a == 1:
                eobpos = i
        r = 0
        local: list[int] = []  # BR: corrections since the last symbol
        for i, a in enumerate(absval):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                flush_eob()
                events.append(("sym", 0xF0, 0, 0))
                events.extend(("bit", b, None, 1) for b in local)
                local = []
                r -= 16
            if a > 1:
                # history coefficient: this pass's bit, run not reset
                local.append(a & 1)
                continue
            flush_eob()
            events.append(("sym", (r << 4) | 1, 0, 0))
            events.append(("bit", 1 if block[ss + i] >= 0 else 0, None, 1))
            events.extend(("bit", b, None, 1) for b in local)
            local = []
            r = 0
        if r > 0 or local:
            eobrun += 1
            pending.extend(local)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return events


def _comp_blocks_raster(coeffs, samp_i, samp, h, w):
    """Raster block list for a NON-interleaved scan of one component
    (the component's own ceil(samples/8) grid, T.81 A.2.2)."""
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    hs, vs = samp_i
    comp_w = -(-w * hs // hmax)
    comp_h = -(-h * vs // vmax)
    bw = -(-comp_w // 8)
    bh = -(-comp_h // 8)
    return [coeffs[by, bx] for by in range(bh) for bx in range(bw)]


def _emit_scan(out: bytearray, events, sos: bytes, table_class: int) -> None:
    """Census the scan's Huffman symbols, write DHT (table id 0 of the
    scan's class) + SOS + entropy bytes."""
    syms = {e[1] for e in events if e[0] == "sym"}
    codes = None
    if syms:
        bits, vals = huff_spec(syms)
        codes = huff_codes(bits, vals)
        out += dht_segment([(table_class, 0, bits, vals)])
    out += sos
    bw = BitWriter()
    for kind, a, b, n in events:
        if kind == "sym":
            code, length = codes[a]
            bw.put(code, length)
            if n:
                bw.put(b, n)
        else:  # raw bit
            bw.put(a, 1)
    bw.pad()
    out += bw.out


def encode_progressive(
    comp_coeffs: list[np.ndarray],
    comp_q: list[tuple[int, np.ndarray]],
    samp: list[tuple[int, int]],
    h: int,
    w: int,
) -> bytes:
    """Full SOF2 interchange stream: DC first (Al=1) -> per-component
    AC first in TWO spectral bands (1-5, 6-63) at Al=1 -> DC refine ->
    per-component AC refine over the joined band (1-63) to Al=0 —
    exercises all four scan procedures, EOB runs, ZRL-in-refinement
    and band stitching."""
    ncomp = len(comp_coeffs)
    color = ncomp == 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")
    out += APP0 + seg(0xFE, b"golden progressive jpeg")
    out += dqt_segment(comp_q if color else comp_q[:1])
    comps_sof = [
        (i + 1, samp[i][0], samp[i][1], comp_q[min(i, len(comp_q) - 1)][0])
        for i in range(ncomp)
    ]
    out += sof2_segment(h, w, comps_sof)

    all_ids = [(i + 1, 0, 0) for i in range(ncomp)]
    # scan 1: DC first, Al=1, interleaved
    _emit_scan(
        out,
        _dc_first_events(comp_coeffs, samp, mcu_rows, mcu_cols, 1),
        sos_prog_segment(all_ids, 0, 0, 0, 1),
        0,
    )
    # scans 2..: AC first per component, two spectral bands at Al=1
    for ci in range(ncomp):
        blocks = _comp_blocks_raster(comp_coeffs[ci], samp[ci], samp, h, w)
        for ss, se in ((1, 5), (6, 63)):
            _emit_scan(
                out,
                _ac_first_events(blocks, ss, se, 1),
                sos_prog_segment([(ci + 1, 0, 0)], ss, se, 0, 1),
                1,
            )
    # DC refine to Al=0 (raw bits, interleaved, no DHT needed)
    _emit_scan(
        out,
        _dc_refine_events(comp_coeffs, samp, mcu_rows, mcu_cols, 0),
        sos_prog_segment(all_ids, 0, 0, 1, 0),
        0,
    )
    # AC refine per component over the JOINED band to Al=0
    for ci in range(ncomp):
        blocks = _comp_blocks_raster(comp_coeffs[ci], samp[ci], samp, h, w)
        _emit_scan(
            out,
            _ac_refine_events(blocks, 1, 63, 0),
            sos_prog_segment([(ci + 1, 0, 0)], 1, 63, 1, 0),
            1,
        )
    out += b"\xff\xd9"
    return bytes(out)


def make_progressive_gray(name: str, h: int, w: int, seed: int) -> None:
    img = gray_image(h, w, seed)
    coeffs = quantize_plane(img, Q_LUMA)
    stream = encode_progressive([coeffs], [(0, Q_LUMA)], [(1, 1)], h, w)
    expected = expected_from_coeffs([coeffs], [Q_LUMA], [(1, 1)], h, w, False)
    write_case(name, stream, expected)


def make_progressive_color(name: str, h: int, w: int, seed: int, samp: list) -> None:
    img = color_image(h, w, seed)
    y, cb, cr = rgb_to_ycbcr(img)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    planes = []
    mh, mw = -(-h // (8 * vmax)) * 8 * vmax, -(-w // (8 * hmax)) * 8 * hmax
    for plane, (hs, vs) in zip((y, cb, cr), samp):
        p = np.pad(plane, ((0, mh - h), (0, mw - w)), mode="edge")
        planes.append(subsample(p, vmax // vs, hmax // hs))
    qs = [Q_LUMA, Q_CHROMA, Q_CHROMA]
    coeffs = [quantize_plane(p, q) for p, q in zip(planes, qs)]
    stream = encode_progressive(
        coeffs, [(0, Q_LUMA), (1, Q_CHROMA)], samp, h, w
    )
    expected = expected_from_coeffs(coeffs, qs, samp, h, w, True)
    write_case(name, stream, expected)


if __name__ == "__main__":
    main()
