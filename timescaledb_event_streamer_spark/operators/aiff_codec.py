"""Pure-stdlib AIFF codec — uncompressed big-endian PCM, the second
real AUDIO container behind the decode seam (WAV PCM decodes in pure
codegen, G6). With it, every uncompressed audio container the
reference's media pipeline would meet decodes for real; only
entropy-coded audio/video stays behind the environment gate.

Implements the public AIFF 1.3 structure: FORM/AIFF grouping, COMM
(channels, frames, bits, sample rate as an 80-bit IEEE 754 extended
float — encoded/decoded here exactly for the integral rates audio
uses), SSND with offset/block alignment. 16-bit mono/stereo only;
compressed AIFF-C raises loudly.
"""

from __future__ import annotations

import struct

import numpy as np

AIFF_MAGIC = b"FORM"


def _f80_encode(x: float) -> bytes:
    """Positive float -> 80-bit extended (sign/15-bit exp/64-bit
    mantissa with explicit integer bit)."""
    if x <= 0:
        raise ValueError(f"sample rate must be positive, got {x}")
    import math

    m, e = math.frexp(x)  # x = m * 2**e, 0.5 <= m < 1
    exponent = e + 16382
    mantissa = int(m * (1 << 64))
    return struct.pack(">HQ", exponent, mantissa)


def _f80_decode(b: bytes) -> float:
    exponent, mantissa = struct.unpack(">HQ", b)
    if exponent == 0 and mantissa == 0:
        return 0.0
    sign = -1.0 if exponent & 0x8000 else 1.0
    e = (exponent & 0x7FFF) - 16383
    return sign * (mantissa / float(1 << 63)) * (2.0 ** e)


def aiff_encode(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, channels) int16 -> AIFF bytes (16-bit BE PCM)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if ch not in (1, 2):
        raise ValueError(f"unsupported channel count {ch}")
    pcm = samples.astype(">i2").tobytes()
    comm = struct.pack(">hIh", ch, n, 16) + _f80_encode(float(rate))
    ssnd = struct.pack(">II", 0, 0) + pcm
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    return AIFF_MAGIC + struct.pack(">I", len(body)) + body


def aiff_decode(data: bytes) -> tuple[np.ndarray, int]:
    """AIFF bytes -> ((n, channels) int16 array, sample rate)."""
    if not data.startswith(AIFF_MAGIC):
        raise ValueError("not an AIFF payload")
    if len(data) < 12:
        raise ValueError("truncated AIFF header")
    (form_len,) = struct.unpack_from(">I", data, 4)
    kind = data[8:12]
    if kind == b"AIFC":
        raise ValueError("compressed AIFF-C unsupported")
    if kind != b"AIFF":
        raise ValueError(f"not an AIFF form: {kind!r}")
    pos = 12
    comm = ssnd = None
    end = min(len(data), 8 + form_len)
    while pos + 8 <= end:
        ck = data[pos : pos + 4]
        (ln,) = struct.unpack_from(">I", data, pos + 4)
        body_at = pos + 8
        if body_at + ln > len(data):
            raise ValueError(f"truncated AIFF chunk {ck!r}")
        if ck == b"COMM":
            comm = data[body_at : body_at + ln]
        elif ck == b"SSND":
            ssnd = data[body_at : body_at + ln]
        pos = body_at + ln + (ln & 1)  # chunks pad to even
    if comm is None or len(comm) < 18:
        raise ValueError("AIFF missing COMM")
    if ssnd is None:
        raise ValueError("AIFF missing SSND")
    ch, n, bits = struct.unpack_from(">hIh", comm, 0)
    rate = _f80_decode(comm[8:18])
    if bits != 16:
        raise ValueError(f"unsupported AIFF sample size {bits}")
    if ch not in (1, 2):
        raise ValueError(f"unsupported channel count {ch}")
    if rate <= 0 or rate != int(rate):
        raise ValueError(f"bad AIFF sample rate {rate}")
    offset, _block = struct.unpack_from(">II", ssnd, 0)
    pcm = ssnd[8 + offset : 8 + offset + n * ch * 2]
    if len(pcm) != n * ch * 2:
        raise ValueError("truncated AIFF sample data")
    arr = np.frombuffer(pcm, dtype=">i2").astype(np.int16).reshape(n, ch)
    return arr, int(rate)


# ---------------------------------------------------------------------------
# AU / SND (G13): the third uncompressed audio container — the
# simplest real-world PCM wrapper (Sun/NeXT .au, public format:
# 24-byte big-endian header, encoding 3 = 16-bit linear PCM).

AU_MAGIC = b".snd"
_AU_PCM16 = 3


def au_encode(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, channels) int16 -> .au bytes (16-bit BE PCM)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    pcm = samples.astype(">i2").tobytes()
    header = struct.pack(
        ">4sIIIII", AU_MAGIC, 24, len(pcm), _AU_PCM16, rate, ch
    )
    return header + pcm


def au_decode(data: bytes) -> tuple[np.ndarray, int]:
    """.au bytes -> ((n, channels) int16, sample rate)."""
    if not data.startswith(AU_MAGIC):
        raise ValueError("not an AU payload")
    if len(data) < 24:
        raise ValueError("truncated AU header")
    magic, offset, size, encoding, rate, ch = struct.unpack_from(
        ">4sIIIII", data, 0
    )
    if encoding != _AU_PCM16:
        raise ValueError(f"unsupported AU encoding {encoding}")
    if ch not in (1, 2) or rate <= 0 or offset < 24:
        raise ValueError(f"bad AU header ({ch} ch, rate {rate}, off {offset})")
    if size == 0xFFFFFFFF:  # 'unknown length' sentinel: read to EOF
        size = len(data) - offset
    if len(data) < offset + size or size % (ch * 2):
        raise ValueError("truncated AU sample data")
    pcm = data[offset : offset + size]
    arr = np.frombuffer(pcm, dtype=">i2").astype(np.int16).reshape(-1, ch)
    return arr, int(rate)
