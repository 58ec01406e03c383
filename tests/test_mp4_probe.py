"""G18 MP4/ISO-BMFF probe: golden struct.pack fixtures built
independently of the Spark-side synthesizer, plus a hostile-bytes
battery (truncation, size-field attacks, version escalation)."""

from __future__ import annotations

import struct

import pytest

from timescaledb_event_streamer_spark.operators.mp4_probe import (
    MP4_MAX_BOXES,
    parse_mp4_headers,
    synthesize_mp4_headers,
)

_UNITY = (
    struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
)


def _b(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + fourcc + body


def _mvhd(timescale: int, duration: int, version: int = 0) -> bytes:
    body = (
        struct.pack(">B3x", version)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _UNITY
        + b"\x00" * 24
        + struct.pack(">I", 3)
    )
    return _b(b"mvhd", body)


def _tkhd(track_id: int, w: int, h: int, version: int = 0) -> bytes:
    body = (
        struct.pack(">B3x", version)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", track_id, 0)
        + struct.pack(">I", 0)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0 if w else 0x0100, 0)
        + _UNITY
        + struct.pack(">II", w << 16, h << 16)
    )
    return _b(b"tkhd", body)


def _trak(track_id: int, w: int, h: int, codec: bytes) -> bytes:
    entry = struct.pack(">I", 24) + codec + b"\x00" * 16
    stsd = _b(b"stsd", struct.pack(">II", 0, 1) + entry)
    return _b(
        b"trak",
        _tkhd(track_id, w, h) + _b(b"mdia", _b(b"minf", _b(b"stbl", stsd))),
    )


def _mp4(
    brand: bytes = b"isom",
    timescale: int = 1000,
    duration: int = 5000,
    traks: bytes | None = None,
) -> bytes:
    ftyp = _b(b"ftyp", brand + struct.pack(">I", 0) + b"isom")
    if traks is None:
        traks = _trak(1, 640, 480, b"avc1")
    return ftyp + _b(b"moov", _mvhd(timescale, duration) + traks)


def _probe_one(spark, payload: bytes):
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    return parse_mp4_headers(df).collect()[0]


def test_golden_single_video_track(spark):
    r = _probe_one(spark, _mp4())
    assert r.is_mp4 and r.major_brand == "isom"
    assert (r.timescale, r.duration, r.duration_ms) == (1000, 5000, 5000)
    assert (r.n_tracks, r.width, r.height) == (1, 640, 480)
    assert r.video_codec == "avc1" and r.audio_codec is None
    assert r.n_boxes == 9  # ftyp moov mvhd trak tkhd mdia minf stbl stsd


def test_golden_video_plus_audio_and_rounding(spark):
    traks = _trak(1, 1920, 1080, b"hev1") + _trak(2, 0, 0, b"mp4a")
    r = _probe_one(spark, _mp4(b"mp42", timescale=90000, duration=123457, traks=traks))
    assert r.major_brand == "mp42"
    assert r.duration_ms == 123457 * 1000 // 90000  # floor, not round
    assert r.n_tracks == 2
    assert (r.width, r.height) == (1920, 1080)
    assert r.video_codec == "hev1" and r.audio_codec == "mp4a"


def test_non_mp4_bytes_all_null(spark):
    r = _probe_one(spark, b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    assert r.is_mp4 is False
    for f in ("major_brand", "timescale", "duration", "n_tracks", "width",
              "video_codec", "audio_codec", "n_boxes"):
        assert r[f] is None, f


def test_truncated_payload_stops_cleanly(spark):
    full = _mp4()
    r = _probe_one(spark, full[:40])  # cut inside moov header
    assert r.is_mp4 is True  # ftyp magic is intact
    assert r.timescale is None and r.width is None


def test_hostile_zero_and_largesize_stop_walk(spark):
    # size=0 (box claims zero length) and size=1 (64-bit largesize
    # escape, unsupported) must stop, not loop to MAX_BOXES
    ftyp = _b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    for bad_size in (0, 1, 7):
        evil = ftyp + struct.pack(">I", bad_size) + b"moov" + b"\x00" * 64
        r = _probe_one(spark, evil)
        assert r.is_mp4 is True
        assert r.n_boxes == 1  # ftyp counted, hostile box not entered
        assert r.timescale is None


def test_hostile_size_beyond_payload(spark):
    ftyp = _b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    evil = ftyp + struct.pack(">I", 1 << 30) + b"mdat"
    r = _probe_one(spark, evil)
    assert r.is_mp4 is True and r.timescale is None
    assert r.n_boxes == 2  # mdat skipped (cursor beyond end), then stop


def test_v1_boxes_leave_fields_null_not_misread(spark):
    # 64-bit v1 mvhd shifts every offset; reading v0 offsets would
    # produce garbage — the probe must refuse instead
    body_v1 = (
        struct.pack(">B3x", 1)
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 1000)
        + struct.pack(">Q", 5000)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _UNITY
        + b"\x00" * 24
        + struct.pack(">I", 3)
    )
    payload = _b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom") + _b(
        b"moov", _b(b"mvhd", body_v1) + _trak(1, 320, 240, b"avc1")
    )
    r = _probe_one(spark, payload)
    assert r.timescale is None and r.duration is None
    assert (r.width, r.height) == (320, 240)  # v0 tkhd still read


def test_stsd_before_any_tkhd_classified_audio_not_video(spark):
    # structural oddity: a stsd with no preceding tkhd has lw=0 and
    # must not claim the video slot
    entry = struct.pack(">I", 24) + b"mp4a" + b"\x00" * 16
    stsd = _b(b"stsd", struct.pack(">II", 0, 1) + entry)
    odd = _b(b"trak", _b(b"mdia", _b(b"minf", _b(b"stbl", stsd))))
    payload = _b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom") + _b(
        b"moov", _mvhd(600, 600) + odd
    )
    r = _probe_one(spark, payload)
    assert r.video_codec is None and r.audio_codec == "mp4a"
    assert r.width is None


def test_synthesizer_layout_matches_probe_bound(spark):
    # worst-case synthesized box count must fit the walk bound
    ev = spark.createDataFrame(
        [(i, i * 13 + 5) for i in range(64)], "event_id long, user_id long"
    )
    out = parse_mp4_headers(synthesize_mp4_headers(ev))
    mx = out.agg({"n_boxes": "max"}).collect()[0][0]
    assert mx < MP4_MAX_BOXES
    assert out.filter("is_mp4 AND video_codec IS NULL").count() == 0


def test_hostile_zero_size_trak_counted_zero_times(spark):
    # the cursor freezes on an invalid size; the frozen 'trak'
    # fourcc must be counted ZERO times, not once per remaining
    # fold iteration
    ftyp = _b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    evil = ftyp + struct.pack(">I", 0) + b"trak" + b"\x00" * 64
    r = _probe_one(spark, evil)
    assert r.is_mp4 is True
    assert r.n_tracks == 0
    assert r.n_boxes == 1


# -- hypothesis hostile battery ---------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _walk_reference(payload: bytes) -> dict:
    """Independent pure-Python reimplementation of the walk contract
    used ONLY to predict n_boxes/is_mp4 for arbitrary bytes."""
    import struct as _s

    is_mp4 = len(payload) >= 16 and payload[4:8] == b"ftyp"
    pos, nbox = 0, 0
    containers = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
    for _ in range(20):
        if pos + 8 > len(payload):
            break
        (size,) = _s.unpack_from(">I", payload, pos)
        four = payload[pos + 4 : pos + 8]
        if size < 8:
            break
        nbox += 1
        pos = pos + 8 if four in containers else pos + size
    return {"is_mp4": is_mp4, "nbox": nbox}


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_mp4_probe_random_bytes_never_crash(fuzz_spark, payload):
    """Arbitrary bytes must yield a row (never a task failure), with
    is_mp4 and the box count matching an independent reference walk."""
    r = _probe_one(fuzz_spark, payload)
    want = _walk_reference(payload)
    assert bool(r.is_mp4) == want["is_mp4"]
    if want["is_mp4"]:
        assert r.n_boxes == want["nbox"]


@pytest.fixture(scope="module")
def fuzz_spark():
    from timescaledb_event_streamer_spark.session import get_spark

    return get_spark("mp4-fuzz")


def test_mp4_roundtrip_fused_parity(spark, sf_small):
    """The fused single-seam G18 path (r11) must be byte-identical in
    its in-task synthesis and row-identical to the two-stage
    synthesize >> parse composition it replaced in the registered
    query."""
    from timescaledb_event_streamer_spark.operators.mp4_probe import (
        _synth_one,
        mp4_probe_roundtrip,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    events = load(spark, sf_small, "events").limit(64)
    jvm = {
        r["media_id"]: bytes(r["payload"])
        for r in synthesize_mp4_headers(events).collect()
    }
    for r in events.select("event_id", "user_id").collect():
        assert _synth_one(int(r["event_id"]), int(r["user_id"])) == jvm[
            r["event_id"]
        ]
    two_stage = sorted(
        map(tuple, parse_mp4_headers(synthesize_mp4_headers(events)).collect())
    )
    fused = sorted(map(tuple, mp4_probe_roundtrip(events).collect()))
    assert fused == two_stage
    assert len(fused) == 64
