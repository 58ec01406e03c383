"""IMA-ADPCM inside WAV (G17, r10) — the first genuinely LOSSY
compressed audio path that is honest in pure stdlib: the IMA/DVI
4-bit ADPCM coder (IMA Digital Audio Technical Working Group, 1992;
the same table-driven algorithm RFC 3551 §4.5.1 describes for DVI4),
carried in the standard WAVE container with format tag 0x0011.

The reference gates lossy media decode on ffmpeg
(operators/multimodal.py:147 documents that honesty); IMA-ADPCM needs
no DCT and no entropy tables beyond the two public constant tables
below, so the *compressed-lossy* decode contract — quantized
residuals, per-block predictor state, container framing — runs for
real here and joins the codec fuzz battery.

Container layout (mono, the synthesis shape; stereo validates but is
rejected by the stats path):

- RIFF/WAVE, fmt chunk of size 20: wFormatTag=0x11, nChannels,
  nSamplesPerSec, nAvgBytesPerSec, nBlockAlign, wBitsPerSample=4,
  cbSize=2, wSamplesPerBlock
- fact chunk: dwSampleLength = exact decoded sample count (the spec
  REQUIRES fact for compressed formats — truncated final blocks are
  resolved by it)
- data chunk: blocks of nBlockAlign bytes; each mono block = 4-byte
  header (predictor int16 LE = the block's first output sample, step
  index u8, reserved u8) + nibble stream, LOW nibble first, two
  samples per byte

Corruption raises ValueError (the codec-battery contract): bad
magics, non-0x11 format, step index > 88, reserved byte != 0,
blocks shorter than their header, fact count exceeding what the
nibbles can carry.

Scale posture: decode is per-payload linear, embarrassingly parallel
behind the Arrow seam like every codec here; encode state is 2 ints
per channel, so blocks stream with O(1) memory.
"""

from __future__ import annotations

import struct

# public IMA tables (spec appendix; identical in RFC 3551's DVI4)
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]

WAVE_FORMAT_IMA_ADPCM = 0x0011
DEFAULT_BLOCK_ALIGN = 256  # mono: 505 samples per full block


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _clamp_index(i: int) -> int:
    return 0 if i < 0 else (88 if i > 88 else i)


def _step_nibble(predictor: int, index: int, nibble: int) -> tuple[int, int]:
    """One decoder step: (predictor, index) x nibble -> new state.
    The reconstruction sum (step>>3 + conditional step terms) is the
    spec's integer form — encode uses the SAME update so encoder and
    decoder predictors never drift."""
    step = STEP_TABLE[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    predictor = _clamp16(predictor - diff if nibble & 8 else predictor + diff)
    index = _clamp_index(index + INDEX_TABLE[nibble & 7])
    return predictor, index


def _encode_nibble(sample: int, predictor: int, index: int) -> int:
    step = STEP_TABLE[index]
    diff = sample - predictor
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    return nibble


def adpcm_encode(samples, rate: int, block_align: int = DEFAULT_BLOCK_ALIGN) -> bytes:
    """Mono int16 samples -> a complete RIFF/WAVE IMA-ADPCM payload.
    Deterministic: block-initial predictor = the first sample of the
    block (emitted verbatim via the header, so block boundaries are
    exact even in a lossy stream); step index carries across blocks.
    """
    samples = [int(s) for s in samples]
    if not samples:
        raise ValueError("IMA-ADPCM encode needs at least one sample")
    if block_align < 8 or block_align % 4:
        raise ValueError(f"bad block align {block_align}")
    spb = (block_align - 4) * 2 + 1  # samples per full mono block
    index = 0
    data = bytearray()
    pos = 0
    while pos < len(samples):
        block = samples[pos : pos + spb]
        pos += spb
        predictor = _clamp16(block[0])
        data += struct.pack("<hBB", predictor, index, 0)
        nibbles = []
        for s in block[1:]:
            nib = _encode_nibble(_clamp16(s), predictor, index)
            predictor, index = _step_nibble(predictor, index, nib)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)  # pad nibble; fact chunk holds the truth
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            data += bytes((lo | (hi << 4),))
    n = len(samples)
    avg_bps = max(1, rate * block_align // spb)
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM, 1, rate, avg_bps, block_align, 4, 2, spb,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def adpcm_decode(payload: bytes) -> tuple[list[int], int]:
    """RIFF/WAVE IMA-ADPCM payload -> (mono int16 samples, rate).
    Every structural deviation raises ValueError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    fact_n = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 20:
                raise ValueError("IMA-ADPCM fmt chunk must carry cbSize+spb")
            fmt = struct.unpack_from("<HHIIHHHH", body, 0)
        elif cid == b"fact":
            if size < 4:
                raise ValueError("short fact chunk")
            (fact_n,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF word padding
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    tag, channels, rate, _avg, block_align, bits, cb, spb = fmt
    if tag != WAVE_FORMAT_IMA_ADPCM:
        raise ValueError(f"not IMA-ADPCM (format tag 0x{tag:04x})")
    if channels != 1:
        raise ValueError("only mono IMA-ADPCM is decoded here")
    if bits != 4 or cb < 2:
        raise ValueError("IMA-ADPCM requires 4-bit samples and cbSize>=2")
    if rate <= 0:
        raise ValueError("non-positive sample rate")
    if block_align < 8:
        raise ValueError(f"bad block align {block_align}")
    if spb != (block_align - 4) * 2 + 1:
        raise ValueError(
            f"samples-per-block {spb} inconsistent with align {block_align}"
        )
    if fact_n is None:
        raise ValueError("compressed WAVE requires a fact chunk")
    if fact_n == 0:
        # encode requires >=1 sample; a zero-count fact chunk would
        # decode to an empty sample list and crash every downstream
        # stats fold (np.max of size-0) instead of a clean rejection
        raise ValueError("fact chunk declares zero samples")
    # capacity check BEFORE decoding: a hostile fact count cannot
    # force output beyond what the nibble bytes actually carry
    n_full = len(data) // block_align
    rem = len(data) % block_align
    capacity = n_full * spb
    if rem:
        if rem < 4:
            raise ValueError("final block shorter than its header")
        capacity += 1 + (rem - 4) * 2
    if fact_n > capacity:
        raise ValueError(
            f"fact count {fact_n} exceeds block capacity {capacity}"
        )
    out: list[int] = []
    pos = 0
    while pos < len(data) and len(out) < fact_n:
        block = data[pos : pos + block_align]
        pos += block_align
        predictor, index, reserved = struct.unpack_from("<hBB", block, 0)
        if index > 88:
            raise ValueError(f"step index {index} out of range")
        if reserved != 0:
            raise ValueError("non-zero reserved byte in block header")
        out.append(predictor)
        for byte in block[4:]:
            for nibble in (byte & 0x0F, byte >> 4):
                if len(out) - 0 >= fact_n:
                    break
                predictor, index = _step_nibble(predictor, index, nibble)
                out.append(predictor)
    if len(out) != fact_n:
        raise ValueError(
            f"decoded {len(out)} samples, fact chunk promised {fact_n}"
        )
    return out, rate
