"""Pure-stdlib FLAC codec (G14) — the first ENTROPY-CODED audio
container behind the decode seam, narrowing the multimodal gate
(multimodal.py's ffmpeg NotImplementedError) to lossy codecs only.

Implements the public FLAC format specification (RFC 9639) subset a
lossless 16-bit PCM stream actually uses:

- fLaC magic + STREAMINFO metadata block (sample rate / channels /
  bits / total samples / MD5 of the raw PCM)
- frames with fixed blocking strategy: 14-bit sync, UTF-8-coded
  frame number, CRC-8 header check, CRC-16 frame check
- subframes: CONSTANT, VERBATIM, FIXED predictors (orders 0-4) and
  LPC (quantized coefficients + shift), wasted-bits support on
  decode
- residuals: Rice coding (method 0, 4-bit params) with partition
  orders, including the escape-to-raw form
- stereo decorrelation: independent, left/side, right/side and
  mid/side channel assignments

The encoder emits fixed-blocking frames with a per-subframe choice
of constant / fixed-predictor / verbatim (whichever is smallest,
the real encoder's greedy baseline) or, on request, LPC / mid-side
forms so every decoder path is exercised by roundtrips. Decode
verifies sync, CRCs and the STREAMINFO MD5 and raises ValueError on
any corruption — the contract the fuzz battery asserts.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# -- CRCs (public FLAC polynomials) ----------------------------------

def _make_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for n in range(256):
        c = n << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) & mask if c & top else (c << 1) & mask
        table.append(c)
    return table


_CRC8_TABLE = _make_table(0x07, 8)
_CRC16_TABLE = _make_table(0x8005, 16)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def crc16_flac(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TABLE[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# -- bit IO ----------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self._bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        # same flush as write_big (r11): whole bytes leave through
        # int.to_bytes instead of a per-byte Python loop
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        nbytes, rem = divmod(self._nbits, 8)
        if nbytes:
            self._bytes += (self._acc >> rem).to_bytes(nbytes, "big")
            self._acc &= (1 << rem) - 1
            self._nbits = rem

    def write_big(self, value: int, nbits: int) -> None:
        """Append an arbitrarily long pre-packed bit run in one call.

        Same bit semantics as write() — the run's MSB lands first —
        but whole bytes flush through int.to_bytes (C speed) instead
        of the per-byte Python loop, which is what makes the batched
        rice writer below pay off (r11)."""
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        nbytes, rem = divmod(self._nbits, 8)
        if nbytes:
            self._bytes += (self._acc >> rem).to_bytes(nbytes, "big")
            self._acc &= (1 << rem) - 1
            self._nbits = rem

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_signed_run(self, xs, nbits: int) -> None:
        """The bit-identical batch form of `for x in xs:
        write_signed(x, nbits)` — 64 fields pack into one bigint per
        write_big call (r11)."""
        if nbits == 0:
            return
        mask = (1 << nbits) - 1
        acc, nb, i = 0, 0, 0
        for x in xs:
            acc = (acc << nbits) | (x & mask)
            nb += nbits
            i += 1
            if i == 64:
                self.write_big(acc, nb)
                acc, nb, i = 0, 0, 0
        if nb:
            self.write_big(acc, nb)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def write_bytes(self, bs: bytes) -> None:
        """Append whole bytes; only legal on a byte boundary (r11 —
        lets the byte-aligned frame header skip the bit machinery)."""
        assert self._nbits == 0, "write_bytes on unaligned writer"
        self._bytes += bs

    def getvalue(self) -> bytes:
        assert self._nbits == 0, "unaligned"
        return bytes(self._bytes)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._data = data
        self._bitpos = pos * 8

    @property
    def byte_pos(self) -> int:
        return self._bitpos // 8

    def read(self, nbits: int) -> int:
        # one int.from_bytes over the covering byte span (r11): the
        # old per-byte loop paid a min() + shift dance per byte
        if nbits == 0:
            return 0
        pos = self._bitpos
        end = pos + nbits
        if end > len(self._data) * 8:
            raise ValueError("FLAC bitstream truncated")
        b1 = (end + 7) >> 3
        chunk = int.from_bytes(self._data[pos >> 3 : b1], "big")
        self._bitpos = end
        return (chunk >> ((b1 << 3) - end)) & ((1 << nbits) - 1)

    def read_signed_run(self, count: int, nbits: int) -> list[int]:
        """`count` two's-complement fields of `nbits` each, in stream
        order — the same values `count` read_signed calls return, but
        each 64-field chunk costs ONE bounds check + from_bytes (r11;
        chunking keeps the split shifts on small ints)."""
        if nbits == 0:
            return [0] * count
        out: list[int] = []
        half, full = 1 << (nbits - 1), 1 << nbits
        mask = full - 1
        for start in range(0, count, 64):
            k = min(64, count - start)
            big = self.read(k * nbits)
            vals = [(big >> ((k - 1 - i) * nbits)) & mask for i in range(k)]
            out.extend(v - full if v >= half else v for v in vals)
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        # byte-at-a-time scan (r11): counts leading zeros through
        # bit_length instead of one read(1) call per bit — same
        # result, same truncation/runaway errors
        q = 0
        pos = self._bitpos
        data = self._data
        nbytes = len(data)
        while True:
            if pos >= nbytes * 8:
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - (pos & 7)
            chunk = data[pos >> 3] & ((1 << avail) - 1)
            if chunk == 0:
                pos += avail
                q += avail
                if q > 1 << 20:
                    raise ValueError("FLAC runaway unary code")
                continue
            lead = avail - chunk.bit_length()
            self._bitpos = pos + lead + 1
            return q + lead

    def align(self) -> None:
        self._bitpos = (self._bitpos + 7) // 8 * 8


# -- rice residuals --------------------------------------------------

def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else ((-r) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if not u & 1 else -((u + 1) >> 1)


def _best_rice_param_from_sum(total: int, count: int) -> int:
    """Rice parameter from the zigzag sum + count — the same fit
    _best_rice_param_zz computes, callable from the vectorized
    search without materializing a Python list (r11)."""
    if not count:
        return 0
    mean = total / count
    m = 0
    while (1 << (m + 1)) < mean + 1 and m < 14:
        m += 1
    return m


def _best_rice_param_zz(zz: list[int]) -> int:
    """Rice parameter from the already-zigzagged residuals (one
    zigzag pass shared with the bit-cost computation, r11)."""
    return _best_rice_param_from_sum(sum(zz), len(zz))


def _best_rice_param(res: list[int]) -> int:
    return _best_rice_param_zz([_zigzag(r) for r in res])


def _write_residuals(
    w: _BitWriter, res: list[int], zz: list[int] | None = None
) -> None:
    """Method 0 (4-bit rice), partition order 0; escapes to raw
    two's-complement when the rice form would be pathological.

    The rice run is packed into a Python bigint and flushed through
    write_big in bounded chunks (r11): identical bits to the old
    per-residual write_unary/write pair, at a fraction of the call
    count. Chunking every 64 residuals keeps the accumulator a few
    hundred machine words even for 4096-sample blocks, so the bigint
    shifts stay cheap. `zz` lets the subframe search hand over its
    already-computed zigzag pass."""
    w.write(0, 2)  # coding method 0
    w.write(0, 4)  # partition order 0
    if isinstance(zz, np.ndarray):
        # vectorized form (r11): the rice bitstream is laid out as a
        # numpy bit array (separator scatter + remainder gather),
        # packed, and flushed through ONE write_big — the same bits
        # the per-residual loop below produces, by construction
        n = len(zz)
        m = _best_rice_param_from_sum(int(zz.sum()), n)
        rice_bits = int((zz >> m).sum()) + (1 + m) * n
        if rice_bits > 31 * n:  # escape: fixed 31-bit raw
            w.write(0xF, 4)
            w.write(31, 5)
            w.write_signed_run(
                res.tolist() if isinstance(res, np.ndarray) else res, 31
            )
            return
        w.write(m, 4)
        q = zz >> m
        ends = np.cumsum(q + (1 + m))
        total_bits = int(ends[-1])
        sep = ends - (1 + m)  # each code: q zeros, a 1, m low bits
        arr = np.zeros(total_bits, np.uint8)
        arr[sep] = 1
        if m:
            rem_idx = sep[:, None] + 1 + np.arange(m, dtype=np.int64)
            rem_bits = (zz[:, None] >> np.arange(m - 1, -1, -1)) & 1
            arr[rem_idx] = rem_bits.astype(np.uint8)
        packed = np.packbits(arr)  # zero-pads at the end
        val = int.from_bytes(packed.tobytes(), "big") >> (
            len(packed) * 8 - total_bits
        )
        w.write_big(val, total_bits)
        return
    if zz is None:
        zz = [_zigzag(r) for r in res]
    m = _best_rice_param_zz(zz)
    rice_bits = sum((u >> m) + 1 + m for u in zz)
    if rice_bits > 31 * len(res):  # escape: fixed 31-bit raw
        w.write(0xF, 4)
        w.write(31, 5)
        w.write_signed_run(res, 31)
        return
    w.write(m, 4)
    mask = (1 << m) - 1
    acc, nb, i = 0, 0, 0
    for u in zz:
        q = u >> m
        acc = (acc << (q + 1 + m)) | (1 << m) | (u & mask)
        nb += q + 1 + m
        i += 1
        if i == 64:
            w.write_big(acc, nb)
            acc, nb, i = 0, 0, 0
    if nb:
        w.write_big(acc, nb)


def _read_rice_run(r: _BitReader, n: int, m: int) -> list[int]:
    """Decode `n` rice(m) codes — the batched form of the
    read_unary/read/unzigzag loop (r11). Bit-for-bit the same
    consumption: unpack the covering byte window once, locate the
    unary separators by walking the 1-bit index (skipping 1s that
    fall inside remainder fields), then gather every m-bit remainder
    in one vectorized pass. Truncated streams and runaway unary
    codes raise ValueError exactly like the scalar loop."""
    data = r._data
    pos_abs = r._bitpos
    base_byte = pos_abs >> 3
    avail_bytes = len(data) - base_byte
    # window sizing: the common case is q ~ 1, so n*(m+4) bits covers
    # it; double until every code fits or the window hits EOF
    need_bits = n * (m + 4) + 64
    while True:
        win_bytes = min(avail_bytes, (need_bits + 7) // 8 + 1)
        bits = np.unpackbits(
            np.frombuffer(data, np.uint8, count=win_bytes, offset=base_byte)
        )
        win_bits = win_bytes * 8
        onesl = np.flatnonzero(bits).tolist()
        L = len(onesl)
        pos = pos_abs - (base_byte << 3)
        seps: list[int] = []
        k = 0
        complete = True
        for _ in range(n):
            while k < L and onesl[k] < pos:
                k += 1
            if k >= L:
                complete = False
                break
            s = onesl[k]
            if s - pos > 1 << 20:
                raise ValueError("FLAC runaway unary code")
            seps.append(s)
            pos = s + 1 + m
            k += 1
        if complete and pos <= win_bits:
            break
        if win_bytes == avail_bytes:
            if not complete and win_bits - pos > 1 << 20:
                raise ValueError("FLAC runaway unary code")
            raise ValueError("FLAC bitstream truncated")
        need_bits *= 2
    seps_a = np.asarray(seps, dtype=np.int64)
    starts = np.empty(n, np.int64)
    starts[0] = pos_abs - (base_byte << 3)
    starts[1:] = seps_a[:-1] + 1 + m
    q = seps_a - starts
    if m:
        idx = seps_a[:, None] + 1 + np.arange(m, dtype=np.int64)[None, :]
        weights = 1 << np.arange(m - 1, -1, -1, dtype=np.int64)
        rem = (bits[idx].astype(np.int64) * weights).sum(axis=1)
        u = (q << m) | rem
    else:
        u = q
    res = (u >> 1) ^ -(u & 1)  # vectorized _unzigzag, exact in int64
    r._bitpos = (base_byte << 3) + pos
    return res.tolist()


def _read_residuals(
    r: _BitReader, block_size: int, pred_order: int
) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    order = r.read(4)
    n_parts = 1 << order
    if block_size % n_parts:
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for p in range(n_parts):
        n = block_size // n_parts - (pred_order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds partition")
        m = r.read(plen)
        if m == escape:
            bits = r.read(5)
            if bits:
                out.extend(r.read_signed_run(n, bits))
            else:
                out.extend([0] * n)
        elif n >= 16:
            out.extend(_read_rice_run(r, n, m))
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << m) | r.read(m)
                out.append(_unzigzag(u))
    return out


# -- UTF-8-style frame numbers ---------------------------------------

def _utf8_number_bytes(n: int) -> bytes:
    """The FLAC UTF-8-style frame number as bytes (always whole
    bytes, so the byte-aligned header builder can concatenate it)."""
    if n < 0x80:
        return bytes([n])
    # FLAC's UTF-8 extension: up to 36 bits
    for nbytes in range(2, 8):
        if n < 1 << (nbytes * 5 + 1 if nbytes < 7 else 36):
            break
    marks = {2: 0xC0, 3: 0xE0, 4: 0xF0, 5: 0xF8, 6: 0xFC, 7: 0xFE}
    shift = 6 * (nbytes - 1)
    out = bytearray([marks[nbytes] | (n >> shift)])
    for _ in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _write_utf8_number(w: _BitWriter, n: int) -> None:
    for b in _utf8_number_bytes(n):
        w.write(b, 8)


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    if b0 & 0xE0 == 0xC0:
        n_follow, val = 1, b0 & 0x1F
    elif b0 & 0xF0 == 0xE0:
        n_follow, val = 2, b0 & 0x0F
    elif b0 & 0xF8 == 0xF0:
        n_follow, val = 3, b0 & 0x07
    elif b0 & 0xFC == 0xF8:
        n_follow, val = 4, b0 & 0x03
    elif b0 & 0xFE == 0xFC:
        n_follow, val = 5, b0 & 0x01
    elif b0 == 0xFE:
        n_follow, val = 6, 0
    else:
        raise ValueError("bad FLAC UTF-8 frame number")
    for _ in range(n_follow):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation")
        val = (val << 6) | (b & 0x3F)
    return val


# -- subframe encode -------------------------------------------------

def _encode_subframe(
    w: _BitWriter, xs, bits: int, force: str | None = None,
    lpc_order: int = 2,
) -> None:
    arr = None
    if isinstance(xs, np.ndarray):
        # int64 keeps every residual/zigzag step exact; tolist()
        # yields Python ints so the bit packers below never see
        # (overflow-prone) numpy scalars (r11)
        arr = xs.astype(np.int64, copy=False)
        xs = arr.tolist()
    n = len(xs)
    if force == "lpc" and n > lpc_order:
        # deterministic quantized coefficients: a trivial but genuine
        # LPC — predictor = average of the last `order` samples,
        # coefficients 1/order at precision 12, shift chosen to fit
        precision, shift = 12, 10
        coef = [(1 << shift) // lpc_order] * lpc_order
        w.write(0, 1)
        w.write(0x20 | (lpc_order - 1), 6)
        w.write(0, 1)  # no wasted bits
        w.write_signed_run(xs[:lpc_order], bits)
        w.write(precision - 1, 4)
        w.write(shift, 5)
        for c in coef:
            w.write_signed(c, precision)
        res = []
        for i in range(lpc_order, n):
            pred = sum(coef[j] * xs[i - 1 - j] for j in range(lpc_order)) >> shift
            res.append(xs[i] - pred)
        _write_residuals(w, res)
        return
    if force != "verbatim":
        is_const = (
            n > 0
            and (
                bool((arr == arr[0]).all())
                if arr is not None
                else all(x == xs[0] for x in xs)
            )
        )
        if is_const:
            w.write(0, 1)
            w.write(0, 6)  # CONSTANT
            w.write(0, 1)  # no wasted bits
            w.write_signed(xs[0], bits)
            return
        if force != "constant":
            # pick the cheapest fixed order 0..2 by residual energy;
            # zigzag once per order and share it between the rice
            # parameter fit and the bit-cost sum (r11). For larger
            # blocks the search runs vectorized (np.diff residuals,
            # shift-based zigzag, vector bit-cost) — exact int64
            # arithmetic, so order choice, cost and residuals are
            # identical to the list path (parity-pinned in pytest).
            best_order, best_cost = None, None
            best_res, best_zz = None, None
            if arr is not None and n >= 64:
                for order in range(0, 3):
                    if n <= order:
                        continue
                    res_a = np.diff(arr, n=order) if order else arr
                    zz_a = (res_a << 1) ^ (res_a >> 63)
                    m = _best_rice_param_from_sum(int(zz_a.sum()), n - order)
                    cost = int((zz_a >> m).sum()) + (1 + m) * (n - order)
                    if best_cost is None or cost < best_cost:
                        best_order, best_cost = order, cost
                        best_res, best_zz = res_a, zz_a
            else:
                for order in range(0, 3):
                    if n <= order:
                        continue
                    res = _fixed_residuals(xs, order)
                    zz = [_zigzag(x) for x in res]
                    m = _best_rice_param_zz(zz)
                    cost = sum((u >> m) + 1 + m for u in zz)
                    if best_cost is None or cost < best_cost:
                        best_order, best_cost = order, cost
                        best_res, best_zz = res, zz
            if best_order is not None and best_cost < n * bits:
                w.write(0, 1)
                w.write(0x08 | best_order, 6)  # FIXED
                w.write(0, 1)  # no wasted bits
                w.write_signed_run(xs[:best_order], bits)
                _write_residuals(w, best_res, best_zz)
                return
    w.write(0, 1)
    w.write(1, 6)  # VERBATIM
    w.write(0, 1)  # no wasted bits
    w.write_signed_run(xs, bits)


def _fixed_residuals(xs: list[int], order: int) -> list[int]:
    res = list(xs)
    for _ in range(order):
        res = [res[i] - res[i - 1] for i in range(1, len(res))]
    return res


def _restore_fixed(warm: list[int], res: list[int], order: int) -> list[int]:
    # vectorized cumsum form for the common low orders on honest
    # streams (r11): the order-k residual is the k-th difference, so
    # restore = warm-start + k cumulative sums. Exact in int64 under
    # the guard bounds (|values| <= 2^24, n <= 2^15 keeps the double
    # cumsum under 2^55); anything bigger — only reachable through
    # corrupt streams — falls through to the arbitrary-precision
    # Python loop so hostile inputs keep their exact behavior.
    n = len(res)
    if 0 < order <= 2 and n >= 32 and len(warm) >= order:
        res_a = np.asarray(res, dtype=np.int64)
        if (
            n <= 1 << 15
            and int(np.abs(res_a).max()) <= 1 << 24
            and all(-(1 << 24) <= x <= 1 << 24 for x in warm)
        ):
            if order == 1:
                out_a = warm[-1] + np.cumsum(res_a)
            else:
                d1 = (warm[-1] - warm[-2]) + np.cumsum(res_a)
                out_a = warm[-1] + np.cumsum(d1)
            return list(warm) + out_a.tolist()
    out = list(warm)
    # direct arithmetic for the common low orders (r11): same exact
    # integer recurrences as the coefficient fold below, without a
    # generator + sum() allocation per sample
    if order == 0:
        out.extend(res)
        return out
    if order == 1:
        p = out[-1]
        for r in res:
            p += r
            out.append(p)
        return out
    if order == 2:
        a, b = out[-2], out[-1]
        for r in res:
            a, b = b, r + 2 * b - a
            out.append(b)
        return out
    coefs = _FIXED_COEFFS[order]
    for r in res:
        pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
        out.append(r + pred)
    return out


# -- public encode ---------------------------------------------------

def flac_encode(
    samples: np.ndarray,
    rate: int,
    *,
    block_size: int = 4096,
    force: str | None = None,
    mid_side: bool = False,
    lpc_order: int = 2,
) -> bytes:
    """(n,) or (n, channels) int16 -> FLAC bytes. `force` pins every
    subframe to 'verbatim'/'constant'/'lpc' (tests use this to walk
    each decoder path); default picks constant/fixed/verbatim
    greedily. `mid_side` uses the mid/side stereo decorrelation
    (stereo input only)."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if ch > 8:
        raise ValueError(f"FLAC supports at most 8 channels, got {ch}")
    if mid_side and ch != 2:
        raise ValueError("mid_side needs stereo input")
    md5 = hashlib.md5(
        samples.astype("<i2").tobytes()
    ).digest()

    # STREAMINFO: block sizes, frame sizes (0 = unknown), rate(20),
    # ch-1(3), bits-1(5), total(36), md5. The layout is fixed and
    # byte-aligned, so it packs directly (r11) — same bytes the old
    # _BitWriter sequence produced, field masks included.
    si_tail = (
        ((rate & 0xFFFFF) << 44)
        | (((ch - 1) & 0x7) << 41)
        | (15 << 36)  # 16 bps
        | (n & 0xFFFFFFFFF)
    )
    body = (
        struct.pack(">HH", block_size & 0xFFFF, block_size & 0xFFFF)
        + b"\x00" * 6
        + si_tail.to_bytes(8, "big")
        + md5
    )
    out = bytearray(FLAC_MAGIC)
    out += bytes([0x80]) + len(body).to_bytes(3, "big")  # last-block STREAMINFO
    out += body

    for frame_no, start in enumerate(range(0, n, block_size)):
        blk = samples[start : start + block_size]
        bs = len(blk)
        # frame header: sync(14) + reserved(1) + fixed-blocking(1) +
        # bs-code 0b0111(4) + sr-code 0(4) + channel(4) + 0b100(3) +
        # reserved(1) is exactly 32 bits, then the UTF-8 frame number
        # and the 16-bit block size are whole bytes — build it as
        # bytes directly (r11), identical to the old bit sequence
        chan_code = 0b1010 if mid_side else ch - 1
        header = (
            bytes([0xFF, 0xF8, 0x70, ((chan_code & 0xF) << 4) | 0b1000])
            + _utf8_number_bytes(frame_no)
            + struct.pack(">H", (bs - 1) & 0xFFFF)
        )
        w2 = _BitWriter()
        w2.write_bytes(header)
        w2.write(crc8(header), 8)
        if mid_side:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            mid = (left + right) >> 1
            side = left - right
            _encode_subframe(w2, mid, 16, force, lpc_order)
            _encode_subframe(w2, side, 17, force, lpc_order)
        else:
            for c in range(ch):
                _encode_subframe(w2, blk[:, c], 16, force, lpc_order)
        w2.align()
        frame = w2.getvalue()
        out += frame + struct.pack(">H", crc16_flac(frame))
    return bytes(out)


# -- public decode ---------------------------------------------------

def _read_subframe(r: _BitReader, bs: int, bits: int) -> list[int]:
    # pad(1) + type(6) + wasted-flag(1) in one 8-bit read (r11)
    head = r.read(8)
    if head >> 7:
        raise ValueError("FLAC subframe padding bit set")
    t = (head >> 1) & 0x3F
    wasted = 0
    if head & 1:
        wasted = 1 + r.read_unary()
    bits -= wasted
    if t == 0:  # CONSTANT
        xs = [r.read_signed(bits)] * bs
    elif t == 1:  # VERBATIM
        xs = r.read_signed_run(bs, bits)
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = r.read_signed_run(order, bits)
        res = _read_residuals(r, bs, order)
        xs = _restore_fixed(warm, res, order)
    elif t >= 32:  # LPC
        order = (t & 0x1F) + 1
        warm = r.read_signed_run(order, bits)
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coef = [r.read_signed(precision) for _ in range(order)]
        res = _read_residuals(r, bs, order)
        xs = list(warm)
        for e in res:
            pred = sum(coef[j] * xs[-1 - j] for j in range(order)) >> shift
            xs.append(e + pred)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    if wasted:
        xs = [x << wasted for x in xs]
    return xs


_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def flac_decode(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n, channels) int16 array, sample rate).
    Verifies magic, CRC-8 headers, CRC-16 frames and the STREAMINFO
    MD5; any corruption raises ValueError."""
    if not data.startswith(FLAC_MAGIC):
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        head = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        block = data[pos + 4 : pos + 4 + length]
        if len(block) < length:
            raise ValueError("truncated FLAC metadata block")
        if head & 0x7F == 0:
            if length != 34:
                raise ValueError("bad STREAMINFO length")
            streaminfo = block
        pos += 4 + length
        if head & 0x80:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    # fixed byte-aligned layout: skip the two block sizes + two frame
    # sizes (10 bytes), then rate(20)+ch(3)+bps(5)+total(36) pack the
    # next 8 bytes — parse them with one from_bytes (r11)
    si_tail = int.from_bytes(streaminfo[10:18], "big")
    rate = si_tail >> 44
    ch = ((si_tail >> 41) & 0x7) + 1
    bps = ((si_tail >> 36) & 0x1F) + 1
    total = si_tail & 0xFFFFFFFFF
    md5 = streaminfo[18:34]
    if rate == 0:
        raise ValueError("bad FLAC sample rate 0")
    if bps != 16:
        raise ValueError(f"unsupported FLAC bits-per-sample {bps}")

    chans: list[list[int]] = [[] for _ in range(ch)]
    while pos < len(data):
        r = _BitReader(data, pos)
        # sync(14)+res(1)+blocking(1)+bs(4)+sr(4)+chan(4)+ss(3)+res(1)
        # = one 32-bit read, shift-split (r11) — same bit consumption
        h32 = r.read(32)
        if h32 >> 18 != 0b11111111111110:
            raise ValueError("bad FLAC frame sync")
        bs_code = (h32 >> 12) & 0xF
        sr_code = (h32 >> 8) & 0xF
        chan_mode = (h32 >> 4) & 0xF
        ss_code = (h32 >> 1) & 0x7
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        r.align()
        header_len = r.byte_pos - pos
        if crc8(data[pos : pos + header_len]) != r.read(8):
            raise ValueError("FLAC frame header CRC mismatch")
        if ss_code == 3:
            raise ValueError("reserved FLAC sample size code")
        bits = _SAMPLE_SIZES[ss_code] if ss_code else bps
        if chan_mode < 8:
            n_sub = chan_mode + 1
            if n_sub != ch:
                raise ValueError("FLAC channel count mismatch")
            subs = [_read_subframe(r, bs, bits) for _ in range(n_sub)]
        elif chan_mode in (8, 9, 10):
            if ch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            # the SIDE channel carries one extra bit: it is channel 1
            # for left/side (8) and mid/side (10), channel 0 for
            # side/right (9)
            extra = [0, 1] if chan_mode in (8, 10) else [1, 0]
            a = _read_subframe(r, bs, bits + extra[0])
            b = _read_subframe(r, bs, bits + extra[1])
            if chan_mode == 8:  # left/side: L, S=L-R
                subs = [a, [l - s for l, s in zip(a, b)]]
            elif chan_mode == 9:  # right/side: S=L-R, R
                subs = [[s + rr for s, rr in zip(a, b)], b]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError(f"reserved FLAC channel mode {chan_mode}")
        r.align()
        frame_len = r.byte_pos - pos
        if pos + frame_len + 2 > len(data):
            raise ValueError("truncated FLAC frame CRC")
        (want_crc,) = struct.unpack_from(">H", data, pos + frame_len)
        if crc16_flac(data[pos : pos + frame_len]) != want_crc:
            raise ValueError("FLAC frame CRC mismatch")
        for c in range(ch):
            chans[c].extend(subs[c])
        pos += frame_len + 2

    n = len(chans[0])
    if total and n != total:
        raise ValueError(f"FLAC sample count {n} != STREAMINFO {total}")
    arr = np.empty((n, ch), dtype=np.int64)
    for c in range(ch):
        arr[:, c] = chans[c]
    if arr.size and (arr.max() > 32767 or arr.min() < -32768):
        raise ValueError("FLAC decoded samples exceed 16-bit range")
    arr16 = arr.astype(np.int16)
    if md5 != b"\x00" * 16:
        got = hashlib.md5(arr16.astype("<i2").tobytes()).digest()
        if got != md5:
            raise ValueError("FLAC MD5 mismatch")
    return arr16, rate
