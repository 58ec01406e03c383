"""AIFF codec (G12): roundtrips, the 80-bit extended-float sample
rate, hostile rejects, and cross-container PCM-stats parity with the
codegen WAV path — the two uncompressed audio containers must report
identical signal statistics for identical samples."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from timescaledb_event_streamer_spark.operators.aiff_codec import (
    _f80_decode,
    _f80_encode,
    aiff_decode,
    aiff_encode,
)


def test_f80_roundtrip_exact_for_audio_rates():
    for rate in (8000, 11025, 22050, 44100, 48000, 96000, 192000):
        assert _f80_decode(_f80_encode(float(rate))) == rate


def test_mono_and_stereo_roundtrip():
    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32768, size=300, dtype=np.int16)
    arr, rate = aiff_decode(aiff_encode(mono, 44100))
    assert rate == 44100 and arr.shape == (300, 1)
    np.testing.assert_array_equal(arr[:, 0], mono)
    stereo = rng.integers(-32768, 32768, size=(128, 2), dtype=np.int16)
    arr2, rate2 = aiff_decode(aiff_encode(stereo, 48000))
    assert rate2 == 48000
    np.testing.assert_array_equal(arr2, stereo)


def test_rejects_hostile_and_aifc():
    good = aiff_encode(np.zeros(10, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="not an AIFF"):
        aiff_decode(b"RIFF" + good[4:])
    with pytest.raises(ValueError, match="AIFF-C"):
        aiff_decode(good[:8] + b"AIFC" + good[12:])
    with pytest.raises(ValueError, match="truncated"):
        aiff_decode(good[:-5])
    bad_bits = bytearray(good)
    # COMM body starts after FORM(12) + 'COMM'(4) + len(4); bits at +6
    struct.pack_into(">h", bad_bits, 12 + 8 + 6, 8)
    with pytest.raises(ValueError, match="sample size"):
        aiff_decode(bytes(bad_bits))


def test_pcm_stats_match_wav_path(spark):
    """The SAME samples through the AIFF codec and through the
    codegen WAV decode report identical peak/energy statistics."""
    import pandas as pd

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.operators.multimodal import (
        wav_pcm_stats,
    )

    rng = np.random.default_rng(9)
    samples = rng.integers(-32768, 32768, size=200, dtype=np.int16)
    # hand-build the canonical WAV the codegen parser reads
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
    arr, rate = aiff_decode(aiff_encode(samples, 8000))
    x = arr[:, 0].astype(np.int64)
    assert rate == 8000
    assert row["n_samples"] == len(x)
    assert row["peak_abs"] == int(np.abs(x).max())
    assert row["sum_samples"] == int(x.sum())


def test_sniff_routes_aiff(spark):
    import pandas as pd

    from pyspark.sql import functions as F

    from timescaledb_event_streamer_spark.operators.multimodal import (
        sniff_format,
    )

    payload = aiff_encode(np.zeros(4, dtype=np.int16), 8000)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [payload]})
    )
    assert (
        media.select(sniff_format(F.col("payload")).alias("f")).first()["f"]
        == "aiff"
    )


def test_au_roundtrip_and_unknown_length_sentinel():
    from timescaledb_event_streamer_spark.operators.aiff_codec import (
        au_decode,
        au_encode,
    )

    rng = np.random.default_rng(17)
    samples = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    arr, rate = au_decode(au_encode(samples, 22050))
    assert rate == 22050
    np.testing.assert_array_equal(arr, samples)
    # 0xFFFFFFFF size sentinel = read to EOF
    data = bytearray(au_encode(samples, 22050))
    struct.pack_into(">I", data, 8, 0xFFFFFFFF)
    arr2, _ = au_decode(bytes(data))
    np.testing.assert_array_equal(arr2, samples)
    with pytest.raises(ValueError, match="encoding"):
        bad = bytearray(data)
        struct.pack_into(">I", bad, 12, 1)  # mu-law
        au_decode(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        au_decode(au_encode(samples, 22050)[:-3])


def test_au_aiff_wav_sample_identity():
    """The same samples through all three uncompressed audio
    containers decode identically."""
    from timescaledb_event_streamer_spark.operators.aiff_codec import (
        au_decode,
        au_encode,
    )

    rng = np.random.default_rng(19)
    samples = rng.integers(-32768, 32768, size=150, dtype=np.int16)
    a1, r1 = aiff_decode(aiff_encode(samples, 16000))
    a2, r2 = au_decode(au_encode(samples, 16000))
    assert r1 == r2 == 16000
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(a1[:, 0], samples)
