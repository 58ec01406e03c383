"""Adversarial robustness for the pure-Python image codecs: hostile
bytes must raise a clean ValueError/NotImplementedError (never hang,
never segfault-style crash, never return garbage silently) — the
contract the mapInPandas decode seam relies on when a 100 TB media
lake contains corrupt payloads."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timescaledb_event_streamer_spark.operators.bmp_codec import (
    bmp_decode,
    bmp_encode,
)
from timescaledb_event_streamer_spark.operators.gif_codec import gif_decode
from timescaledb_event_streamer_spark.operators.jpeg_codec import jpeg_decode
from timescaledb_event_streamer_spark.operators.multimodal import (
    _real_decode_image,
)
from timescaledb_event_streamer_spark.operators.png_codec import (
    png_decode,
    png_encode,
)
from timescaledb_event_streamer_spark.operators.tiff_codec import (
    tiff_decode,
)

_DECODERS = [png_decode, jpeg_decode, gif_decode, bmp_decode, tiff_decode]
_MAGICS = [
    b"\x89PNG\r\n\x1a\n",
    b"\xff\xd8\xff\xe0",
    b"GIF89a",
    b"BM",
    b"II*\x00",
]


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=256))
def test_random_bytes_never_crash_the_router(payload):
    """Arbitrary bytes: clean ValueError / NotImplementedError only."""
    with pytest.raises((ValueError, NotImplementedError)):
        _real_decode_image(payload)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=4),
    st.binary(min_size=0, max_size=256),
)
def test_magic_plus_garbage_raises_cleanly(idx, tail):
    """A correct magic followed by garbage must fail loudly, not
    produce pixels."""
    decoder, magic = _DECODERS[idx], _MAGICS[idx]
    try:
        out = decoder(magic + tail)
    except (ValueError, NotImplementedError) + struct_error_types():
        return
    # the astronomically unlikely case hypothesis finds a VALID file:
    # the output must at least be a well-formed pixel array
    assert isinstance(out, np.ndarray) and out.dtype == np.uint8


def struct_error_types():
    import struct
    import zlib

    return (struct.error, zlib.error, IndexError, EOFError, KeyError)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_truncation_of_valid_files_raises(data):
    """Every proper prefix of a valid encode must raise, never return
    wrong pixels silently."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    full = data.draw(st.sampled_from([png_encode(img), bmp_encode(img)]))
    cut = data.draw(st.integers(min_value=2, max_value=len(full) - 1))
    try:
        out = _real_decode_image(bytes(full[:cut]))
    except (ValueError, NotImplementedError) + struct_error_types():
        return  # clean rejection (a cut magic routes to the
        #         unknown-container NotImplementedError — equally clean)
    # prefixes that still decode (e.g. PNG missing only its IEND)
    # must NOT silently produce different pixels
    if out.shape[2] == 1:
        out = out[:, :, 0][:, :, None].repeat(3, axis=2)
    np.testing.assert_array_equal(out[:, :, :3], img)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_bmp_roundtrip_property(h, w, seed):
    """Property form of the roundtrip: any size, any content."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(png_decode(png_encode(img)), img)
    np.testing.assert_array_equal(bmp_decode(bmp_encode(img)), img)


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=1),
    st.binary(min_size=0, max_size=200),
)
def test_audio_codecs_reject_hostile_bytes(idx, tail):
    """AIFF and AU: magic + garbage must raise cleanly or decode a
    well-formed sample array — never hang or crash."""
    from timescaledb_event_streamer_spark.operators.aiff_codec import (
        aiff_decode,
        au_decode,
    )

    decoder, magic = [(aiff_decode, b"FORM"), (au_decode, b".snd")][idx]
    try:
        arr, rate = decoder(magic + tail)
    except (ValueError,) + struct_error_types():
        return
    assert arr.dtype == np.int16 and rate > 0


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=260))
def test_adpcm_rejects_hostile_bytes(tail):
    """IMA-ADPCM (G17): RIFF/WAVE magic + garbage must raise a clean
    ValueError or decode a structurally valid sample list — never
    hang, never accept garbage silently (complements the dedicated
    battery in tests/test_adpcm.py)."""
    from timescaledb_event_streamer_spark.operators.adpcm_codec import (
        adpcm_decode,
    )

    payload = b"RIFF" + tail[:4] + b"WAVE" + tail[4:]
    try:
        out, rate = adpcm_decode(payload)
    except (ValueError,) + struct_error_types():
        return
    assert rate > 0 and all(-32768 <= v <= 32767 for v in out)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_audio_truncation_raises_or_roundtrips(data):
    from timescaledb_event_streamer_spark.operators.aiff_codec import (
        aiff_decode,
        aiff_encode,
        au_decode,
        au_encode,
    )

    rng = np.random.default_rng(23)
    samples = rng.integers(-32768, 32768, size=40, dtype=np.int16)
    which = data.draw(st.integers(min_value=0, max_value=1))
    enc, dec = [(aiff_encode, aiff_decode), (au_encode, au_decode)][which]
    full = enc(samples, 8000)
    cut = data.draw(st.integers(min_value=4, max_value=len(full) - 1))
    try:
        arr, rate = dec(bytes(full[:cut]))
    except (ValueError,) + struct_error_types():
        return
    # a prefix that still decodes must carry a PREFIX of the samples
    np.testing.assert_array_equal(arr[:, 0], samples[: len(arr)])


def test_tiff_hostile_ifd_count_rejected_without_allocation():
    """A crafted 32-bit IFD value count (0xFFFFFFFF) must raise a
    clean ValueError BEFORE any format string proportional to the
    count is built — the r9 fix for the memory-exhaustion hang."""
    import struct as _struct
    import time as _time

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    from timescaledb_event_streamer_spark.operators.tiff_codec import (
        tiff_encode,
    )

    data = bytearray(tiff_encode(img, rows_per_strip=2))  # 2 strips
    # entry 6 (index 5) is StripOffsets: tag at ifd_off+2+12*5 = 70,
    # its count field 4 bytes in
    assert _struct.unpack_from("<H", data, 70)[0] == 273
    _struct.pack_into("<I", data, 74, 0xFFFFFFFF)
    t0 = _time.time()
    with pytest.raises(ValueError, match="truncated TIFF value array"):
        tiff_decode(bytes(data))
    assert _time.time() - t0 < 1.0  # no multi-GB fmt-string build


def test_tiff_missing_required_strip_tags_raise_valueerror():
    """A TIFF without StripOffsets/StripByteCounts must keep the
    ValueError-only contract of the decode seam (was KeyError)."""
    import struct as _struct

    e = "<"
    entries = b"".join(
        _struct.pack(e + "HHII", tag, 4, 1, val)
        for tag, val in ((256, 3), (257, 4))  # width/height only
    )
    payload = (
        _struct.pack(e + "2sHI", b"II", 42, 8)
        + _struct.pack(e + "H", 2)
        + entries
        + _struct.pack(e + "I", 0)
    )
    with pytest.raises(ValueError, match="missing required tag"):
        tiff_decode(payload)
