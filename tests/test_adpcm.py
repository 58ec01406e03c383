"""IMA-ADPCM codec (G17): golden vectors pinned against the public
spec tables, roundtrip SNR/compression properties, container
validation, an adversarial hypothesis battery, and PCM-stats parity
with the G15 FLAC path — the first genuinely LOSSY compressed audio
path through the decode seam."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timescaledb_event_streamer_spark.operators.adpcm_codec import (
    DEFAULT_BLOCK_ALIGN,
    INDEX_TABLE,
    STEP_TABLE,
    adpcm_decode,
    adpcm_encode,
    _step_nibble,
)


def _signal(n=2000, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        9000 * np.sin(t / 25) + rng.normal(0, 40, n)
    ).astype(np.int16)


# -- spec pinning ------------------------------------------------------

def test_tables_are_the_public_ima_constants():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert INDEX_TABLE == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_step_nibble_golden_sequence():
    """Hand-computed decoder steps from (predictor=0, index=0):
    step=7; nibble 0b0111 -> diff = 7>>3 + 7 + 3 + 1 = 11 wait —
    spec form: diff = step>>3 (+step if b2) (+step>>1 if b1)
    (+step>>2 if b0). nibble 7 = 0b0111: 0 + 7 + 3 + 1 = 11... plus
    the base 0 -> predictor 11 + step>>3=0 -> 11? No: step>>3 = 0,
    so diff = 0+7+3+1 = 11, predictor = 11, index += 8 -> 8."""
    p, i = _step_nibble(0, 0, 0b0111)
    assert (p, i) == (11, 8)
    # sign bit subtracts the same magnitude
    p, i = _step_nibble(0, 0, 0b1111)
    assert (p, i) == (-11, 8)
    # zero nibble: diff = step>>3 = 0, index decays by 1 (clamped)
    p, i = _step_nibble(100, 0, 0)
    assert (p, i) == (100, 0)
    # clamping at both rails
    p, _ = _step_nibble(32760, 88, 0b0111)
    assert p == 32767
    p, _ = _step_nibble(-32760, 88, 0b1111)
    assert p == -32768


def test_container_layout_golden():
    payload = adpcm_encode([100, 200, 300], 8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert payload[12:16] == b"fmt "
    fmt = struct.unpack_from("<HHIIHHHH", payload, 20)
    assert fmt[0] == 0x0011  # WAVE_FORMAT_IMA_ADPCM
    assert fmt[1] == 1 and fmt[2] == 8000
    assert fmt[4] == DEFAULT_BLOCK_ALIGN and fmt[5] == 4
    assert fmt[7] == (DEFAULT_BLOCK_ALIGN - 4) * 2 + 1
    assert payload[40:44] == b"fact"
    assert struct.unpack_from("<I", payload, 48)[0] == 3
    assert payload[52:56] == b"data"
    # block header: predictor = first sample verbatim, index 0
    assert struct.unpack_from("<hBB", payload, 60) == (100, 0, 0)


# -- roundtrip properties ---------------------------------------------

def test_first_sample_of_each_block_is_exact():
    x = _signal(DEFAULT_BLOCK_ALIGN * 4)
    out, rate = adpcm_decode(adpcm_encode(x, 16000))
    spb = (DEFAULT_BLOCK_ALIGN - 4) * 2 + 1
    assert rate == 16000 and len(out) == len(x)
    for b in range(0, len(x), spb):
        assert out[b] == x[b]  # the header carries it verbatim


def test_snr_and_compression_on_smooth_signal():
    x = _signal()
    payload = adpcm_encode(x, 8000)
    out, _ = adpcm_decode(payload)
    err = float(((np.asarray(out) - x.astype(np.int64)) ** 2).sum())
    snr_db = 10 * math.log10(float((x.astype(np.int64) ** 2).sum()) / max(err, 1))
    assert snr_db > 20  # lossy, but a faithful quantizer
    assert len(payload) < len(x)  # ~4:1 vs the 2*n PCM bytes


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=1300),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_decode_length_and_rate_always_exact(n, seed):
    """Lossy VALUES, exact STRUCTURE: sample count and rate survive
    any content, any truncated-final-block shape."""
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, size=n).astype(np.int16)
    out, rate = adpcm_decode(adpcm_encode(x, 44100))
    assert rate == 44100 and len(out) == n
    assert out[0] == int(x[0])
    assert all(-32768 <= v <= 32767 for v in out)


def test_decode_is_deterministic_and_stable():
    """encode(decode(encode(x))) == encode(decode-of-that): a second
    lossy generation reproduces byte-identical output — the quantizer
    is a pure function (no hidden state)."""
    x = _signal(700)
    p1 = adpcm_encode(x, 8000)
    y1, _ = adpcm_decode(p1)
    p2 = adpcm_encode(y1, 8000)
    y2, _ = adpcm_decode(p2)
    assert adpcm_encode(y2, 8000) == adpcm_encode(y2, 8000)
    assert p2 == adpcm_encode(y1, 8000)


# -- container validation ----------------------------------------------

def _valid() -> bytes:
    return adpcm_encode(list(range(0, 1000, 10)), 16000)


def test_rejects_bad_magics_and_formats():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        adpcm_decode(b"RIFX" + _valid()[4:])
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        adpcm_decode(b"")
    pcm_like = bytearray(_valid())
    struct.pack_into("<H", pcm_like, 20, 1)  # format tag -> PCM
    with pytest.raises(ValueError, match="not IMA-ADPCM"):
        adpcm_decode(bytes(pcm_like))


def test_rejects_hostile_fact_count():
    """A fact count beyond nibble capacity must raise BEFORE any
    decode work — the TIFF hostile-count lesson (r9) applied here."""
    p = bytearray(_valid())
    struct.pack_into("<I", p, 48, 10_000_000)
    with pytest.raises(ValueError, match="exceeds block capacity"):
        adpcm_decode(bytes(p))


def test_rejects_zero_fact_count():
    """dwSampleLength=0 is structurally valid but would decode to an
    empty sample list and crash downstream stats folds (np.max of a
    size-0 array) mid-task — must be a clean ValueError rejection
    routed to is_adpcm=False, like every other hostile payload."""
    p = bytearray(_valid())
    struct.pack_into("<I", p, 48, 0)
    with pytest.raises(ValueError, match="zero samples"):
        adpcm_decode(bytes(p))


def test_rejects_corrupt_block_header():
    p = bytearray(_valid())
    data_off = p.index(b"data") + 8
    p[data_off + 2] = 99  # step index > 88
    with pytest.raises(ValueError, match="step index"):
        adpcm_decode(bytes(p))
    p = bytearray(_valid())
    p[data_off + 3] = 1  # reserved byte
    with pytest.raises(ValueError, match="reserved"):
        adpcm_decode(bytes(p))


def test_rejects_missing_fact():
    p = _valid()
    # excise the 12-byte fact chunk
    i = p.index(b"fact")
    cut = p[:i] + p[i + 12 :]
    cut = cut[:4] + struct.pack("<I", len(cut) - 8) + cut[8:]
    with pytest.raises(ValueError, match="fact"):
        adpcm_decode(cut)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_hostile_bytes_raise_cleanly(tail):
    """RIFF/WAVE magic + garbage: clean ValueError or a structurally
    valid decode — never a hang, never garbage accepted silently."""
    payload = b"RIFF" + tail[:4] + b"WAVE" + tail[4:]
    try:
        out, rate = adpcm_decode(payload)
    except (ValueError, struct.error):
        return
    assert rate > 0 and all(-32768 <= v <= 32767 for v in out)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=2, max_value=120))
def test_truncation_raises(cut_back):
    """Proper prefixes of a valid payload must raise, never return a
    silently short signal."""
    p = _valid()
    with pytest.raises((ValueError, struct.error)):
        adpcm_decode(p[: len(p) - cut_back])


# -- Spark seam + parity with the lossless sibling ---------------------

def test_stats_parity_with_wav_path(spark, sf_small):
    """The G6/G15/G17 waveform is shared; on it, the ADPCM stats must
    (a) carry EXACT n/rate per media, and (b) differ from the
    lossless WAV-path stats only within the quantizer's error bound
    (sq_error small relative to energy)."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        adpcm_pcm_stats,
        synthesize_adpcm_pcm,
        synthesize_wav_pcm,
        wav_pcm_stats,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    events = load(spark, sf_small, "events").limit(60)
    got = {
        r["media_id"]: r
        for r in adpcm_pcm_stats(synthesize_adpcm_pcm(events)).collect()
    }
    ref = {
        r["media_id"]: r
        for r in wav_pcm_stats(synthesize_wav_pcm(events)).collect()
    }
    assert set(got) == set(ref) and got
    for mid, g in got.items():
        r = ref[mid]
        assert g["is_adpcm"] and g["n_samples"] == r["n_samples"]
        assert g["sample_rate"] == r["sample_rate"]
        # bounded reconstruction vs the ORIGINAL waveform's energy
        # (the WAV-path row computes it exactly). Full-range
        # pseudo-noise is the quantizer's worst case — decoded and
        # original are near-uncorrelated — but the error is still
        # bounded by (|x| + |ref|)^2 <= ~4x the reference power;
        # measured ratios on this corpus are 0.8-1.5x. A garbage
        # decode (wrong nibbles / wrong state reaching the rails)
        # blows past the envelope.
        assert g["sq_error"] is not None
        assert g["sq_error"] < 4 * r["energy"] + 1


def test_registered_query_returns_rows(spark, sf_small):
    from timescaledb_event_streamer_spark.plans.registry import all_queries

    df = all_queries()["media_adpcm_pcm_stats"](spark, sf_small)
    rows = df.collect()
    assert rows and all(r["is_adpcm"] for r in rows)
    assert {r["media_id"] for r in rows} == {
        r["event_id"]
        for r in load_events(spark, sf_small).select("event_id").collect()
    }


def load_events(spark, sf_dir):
    from timescaledb_event_streamer_spark.sources.tables import load

    return load(spark, sf_dir, "events")
