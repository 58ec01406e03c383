"""FLAC codec (G14): golden roundtrips across every subframe type
and stereo mode, PCM-stats parity with the codegen WAV path, CRC /
MD5 corruption detection, magic-sniff routing, and an adversarial
hypothesis battery — the first entropy-coded audio container behind
the decode seam."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timescaledb_event_streamer_spark.operators.flac_codec import (
    crc8,
    crc16_flac,
    flac_decode,
    flac_encode,
)


def _signal(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        1200 * np.sin(t / 40) + rng.normal(0, 25, n)
    ).astype(np.int16)


# -- roundtrips across the subframe zoo ------------------------------

def test_crc_polynomials_public_vectors():
    # CRC-8 poly 0x07 and CRC-16/BUYPASS poly 0x8005 check values
    assert crc8(b"123456789") == 0xF4
    assert crc16_flac(b"123456789") == 0xFEE8


@pytest.mark.parametrize(
    "kwargs",
    [
        {},  # greedy constant/fixed/verbatim choice
        {"force": "verbatim"},
        {"force": "lpc"},
        {"force": "lpc", "lpc_order": 4},
        {"block_size": 1111},  # non-power-of-two + short last block
        {"block_size": 192},
    ],
)
def test_mono_roundtrip(kwargs):
    x = _signal()
    enc = flac_encode(x, 44100, **kwargs)
    dec, rate = flac_decode(enc)
    assert rate == 44100
    np.testing.assert_array_equal(dec[:, 0], x)


@pytest.mark.parametrize("mid_side", [False, True])
def test_stereo_roundtrip(mid_side):
    left = _signal(seed=1)
    right = (left * 0.9 + np.random.default_rng(2).normal(0, 4, len(left))).astype(
        np.int16
    )
    st2 = np.stack([left, right], axis=1)
    enc = flac_encode(st2, 8000, mid_side=mid_side)
    dec, rate = flac_decode(enc)
    assert rate == 8000
    np.testing.assert_array_equal(dec, st2)


def test_rice_actually_compresses_smooth_signals():
    """The point of the codec: fixed predictors + rice beat raw PCM
    on smooth signals, and mid-side beats independent on correlated
    stereo."""
    x = _signal()
    assert len(flac_encode(x, 8000)) < 0.55 * x.nbytes
    left = _signal(seed=3)
    right = (left + np.random.default_rng(4).normal(0, 3, len(left))).astype(
        np.int16
    )
    st2 = np.stack([left, right], axis=1)
    assert len(flac_encode(st2, 8000, mid_side=True)) < len(
        flac_encode(st2, 8000)
    )


def test_constant_and_extreme_values():
    cst = np.full(3000, -123, dtype=np.int16)
    enc = flac_encode(cst, 16000)
    np.testing.assert_array_equal(flac_decode(enc)[0][:, 0], cst)
    # a constant block encodes as CONSTANT: 2 bytes of payload, not 6000
    assert len(enc) < 200
    ext = np.array([32767, -32768, 0, 1, -1] * 100, dtype=np.int16)
    np.testing.assert_array_equal(
        flac_decode(flac_encode(ext, 8000))[0][:, 0], ext
    )


# -- corruption detection --------------------------------------------

def test_frame_crc_detects_payload_flip():
    enc = bytearray(flac_encode(_signal(), 8000))
    enc[-40] ^= 0x01  # inside the last frame's residuals
    with pytest.raises(ValueError, match="CRC|MD5|truncated|sync"):
        flac_decode(bytes(enc))


def test_md5_detects_wrong_samples():
    """Zeroing one frame's CRC16 AND its matching payload byte is
    astronomically unlikely to pass both CRCs; instead corrupt the
    STREAMINFO MD5 itself and expect the decoder to flag it."""
    enc = bytearray(flac_encode(_signal(), 8000))
    enc[8 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        flac_decode(bytes(enc))


def test_not_flac_and_truncations():
    enc = flac_encode(_signal(500), 8000)
    with pytest.raises(ValueError, match="not a FLAC"):
        flac_decode(b"RIFF" + enc[4:])
    for cut in (3, 10, 30, len(enc) - 3):
        with pytest.raises(ValueError):
            flac_decode(enc[:cut])


# -- decode-seam integration -----------------------------------------

def test_sniff_routes_flac(spark):
    import pandas as pd

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.operators.multimodal import (
        sniff_format,
    )

    payload = flac_encode(np.zeros(16, dtype=np.int16), 8000)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [payload]})
    )
    assert (
        media.select(sniff_format(F.col("payload")).alias("f")).first()["f"]
        == "flac"
    )


def test_pcm_stats_match_wav_path(spark):
    """The SAME samples through the FLAC codec and through the
    codegen WAV decode report identical peak/energy statistics —
    lossless means the feature extractors cannot tell them apart."""
    import pandas as pd

    from timescaledb_event_streamer_spark.operators.multimodal import (
        wav_pcm_stats,
    )

    rng = np.random.default_rng(9)
    samples = rng.integers(-32768, 32768, size=200, dtype=np.int16)
    data = samples.astype("<i2").tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [wav]})
    )
    row = wav_pcm_stats(media).collect()[0]
    arr, rate = flac_decode(flac_encode(samples, 8000))
    x = arr[:, 0].astype(np.int64)
    assert rate == 8000
    assert row["n_samples"] == len(x)
    assert row["peak_abs"] == int(np.abs(x).max())
    assert row["sum_samples"] == int(x.sum())


# -- adversarial battery ---------------------------------------------

@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_magic_plus_garbage_raises_cleanly(tail):
    try:
        arr, rate = flac_decode(b"fLaC" + tail)
    except ValueError:
        return
    assert arr.dtype == np.int16 and rate > 0


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_truncation_raises_never_wrong_samples(data):
    x = _signal(600, seed=11)
    enc = flac_encode(x, 8000, block_size=256)
    cut = data.draw(st.integers(min_value=4, max_value=len(enc) - 1))
    with pytest.raises(ValueError):
        flac_decode(enc[:cut])


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_single_bitflip_never_silent(data):
    """Any single flipped bit either still decodes to the SAME
    samples (flip in padding) or raises — never silently different
    audio; the CRC8/CRC16/MD5 chain is what makes this hold."""
    x = _signal(400, seed=13)
    enc = bytearray(flac_encode(x, 8000, block_size=128))
    i = data.draw(st.integers(min_value=4, max_value=len(enc) - 1))
    bit = data.draw(st.integers(min_value=0, max_value=7))
    enc[i] ^= 1 << bit
    try:
        dec, _ = flac_decode(bytes(enc))
    except ValueError:
        return
    np.testing.assert_array_equal(dec[:, 0], x)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=400),
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_roundtrip_property(n, ch, seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    dec, rate = flac_decode(flac_encode(x, 44100, block_size=64))
    assert rate == 44100
    np.testing.assert_array_equal(dec, x)


# -- r11 vectorized-path parity ---------------------------------------
# The batched rice decode (n >= 16), the vectorized fixed-order search
# + rice bitstream pack (n >= 64) and the guarded cumsum restore
# (n >= 32) must be bit/value-identical to the scalar loops they
# replaced. Straddling the thresholds exercises both routes of each.


@pytest.mark.parametrize("n", [8, 15, 16, 17, 31, 32, 63, 64, 65, 500])
def test_vectorized_paths_match_scalar_paths(n):
    from timescaledb_event_streamer_spark.operators.flac_codec import (
        _BitReader,
        _BitWriter,
        _encode_subframe,
        _read_residuals,
        _read_subframe,
        _restore_fixed,
    )

    rng = np.random.default_rng(n)
    xs = (np.cumsum(rng.integers(-80, 80, n))).astype(np.int16)

    # encode: ndarray input (vectorized search for n >= 64) must emit
    # the same bits as the list input (scalar search)
    w_vec, w_list = _BitWriter(), _BitWriter()
    _encode_subframe(w_vec, xs, 16)
    _encode_subframe(w_list, [int(x) for x in xs], 16)
    w_vec.align()
    w_list.align()
    assert w_vec.getvalue() == w_list.getvalue()

    # decode: the batched rice run must consume the same bits and
    # return the same residuals/samples as a scalar re-read
    frame = w_vec.getvalue()
    got = _read_subframe(_BitReader(frame), n, 16)
    assert got == [int(x) for x in xs]

    # restore: the cumsum path (engaged at n >= 32 under the guard
    # bounds) equals the exact recurrence for every low order
    res = rng.integers(-(1 << 20), 1 << 20, n).tolist()
    for order in (1, 2):
        warm = rng.integers(-30000, 30000, order).tolist()
        fast = _restore_fixed(warm, res, order)
        slow_out = list(warm)
        for r in res:
            pred = sum(
                c * slow_out[-1 - j]
                for j, c in enumerate(
                    {1: [1], 2: [2, -1]}[order]
                )
            )
            slow_out.append(r + pred)
        assert fast == slow_out

    # guard fallback: residuals beyond the int64-safe bound take the
    # bigint loop and still restore exactly
    big = [1 << 30] * 40
    out = _restore_fixed([0, 0], big, 2)
    assert out[2] == 1 << 30 and len(out) == 42


def test_read_residuals_batch_matches_scalar_consumption():
    from timescaledb_event_streamer_spark.operators.flac_codec import (
        _BitReader,
        _BitWriter,
        _read_residuals,
        _write_residuals,
    )

    rng = np.random.default_rng(5)
    for n in (16, 64, 4096):
        res = rng.integers(-4000, 4000, n).tolist()
        w = _BitWriter()
        _write_residuals(w, res)
        w.write(0x5A, 8)  # trailing sentinel byte
        w.align()
        r = _BitReader(w.getvalue())
        assert _read_residuals(r, n, 0) == res
        # the batch reader must leave the cursor exactly after the
        # rice run: the sentinel byte is next
        assert r.read(8) == 0x5A
