"""Multimodal plumbing tests (SURVEY.md §2.G): binary payload
transport, Arrow batch shapes, deterministic stub features, the
real-decoder seam, and frame sampling."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from timescaledb_event_streamer_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_media,
    extract_features,
    frame_sample_plan,
)
from timescaledb_event_streamer_spark.sources.tables import load


@pytest.fixture(scope="module")
def media(spark, sf_small):
    return attach_media(load(spark, sf_small, "documents"))


def test_media_schema_and_payload_roundtrip(media, spark, sf_small):
    assert dict(media.dtypes)["payload"] == "binary"
    docs = load(spark, sf_small, "documents")
    row = media.filter(F.col("media_id") == 0).first()
    text = docs.filter(F.col("doc_id") == 0).first()["text"]
    assert bytes(row["payload"]).decode() == text


def test_extract_features_stub_is_deterministic(media):
    feats = extract_features(media).collect()
    assert len(feats) == media.count()
    by_id = {r["media_id"]: r for r in feats}
    r0 = by_id[0]
    assert len(r0["features"]) == FEATURE_DIM
    assert all(0.0 <= f < 1.0 for f in r0["features"])
    # sha256 matches a locally computed digest of the payload
    payload = bytes(media.filter(F.col("media_id") == 0).first()["payload"])
    assert r0["sha256"] == hashlib.sha256(payload).hexdigest()
    assert r0["n_bytes"] == len(payload)
    # rerun -> identical features (stub must be deterministic)
    again = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert again[0] == r0["features"]


def test_real_decoder_seam_raises(media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception)) as exc:
        extract_features(media, decoder="real").collect()
    assert "NotImplementedError" in str(exc.value) or "real media decode" in str(
        exc.value
    )


def test_unknown_decoder_rejected(media):
    with pytest.raises(ValueError):
        extract_features(media, decoder="wat")


def test_frame_sample_plan_counts(media):
    frames = frame_sample_plan(media, every_ms=1000)
    got = frames.groupBy("media_id").count().collect()
    meta = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert {r["media_id"] for r in got} == set(meta)
    for r in got:
        dur = meta[r["media_id"]]
        expect = max((dur - 1), 0) // 1000 + 1
        assert r["count"] == expect, (r["media_id"], dur)


def test_feature_extraction_is_arrow_batched_not_row_udf(media):
    plan = extract_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_resize_plan_preserves_aspect_and_never_upscales(media):
    from timescaledb_event_streamer_spark.operators.multimodal import resize_plan

    rows = resize_plan(media, max_side=128).collect()
    assert rows
    for r in rows:
        assert max(r["target_w"], r["target_h"]) <= 128
        assert r["target_w"] <= r["width"] and r["target_h"] <= r["height"]
        if r["width"] >= r["height"]:
            assert r["target_w"] >= r["target_h"]
        else:
            assert r["target_h"] >= r["target_w"]


def test_resize_images_stub_payload_shape(media):
    from timescaledb_event_streamer_spark.operators.multimodal import resize_images

    out = resize_images(media, max_side=128).collect()
    assert out
    for r in out[:20]:
        want = r["target_w"] * r["target_h"] // 64 + 1
        assert len(r["payload"]) == want


def test_resize_images_real_seam_raises(media):
    from py4j.protocol import Py4JJavaError

    from timescaledb_event_streamer_spark.operators.multimodal import resize_images

    with pytest.raises((Py4JJavaError, Exception)):
        resize_images(media, decoder="real").collect()


def test_sniff_format_magic_bytes(spark):
    """Container sniffing is a pure hex-prefix compare on the binary
    column — each signature resolves, unknown bytes fall through."""
    from timescaledb_event_streamer_spark.operators.multimodal import sniff_format

    payloads = [
        (1, bytes.fromhex("89504E470D0A1A0A") + b"rest"),          # png
        (2, bytes.fromhex("FFD8FFE0") + b"jfif"),                  # jpeg
        (3, bytes.fromhex("47494638") + b"89a"),                   # gif
        (4, b"RIFF" + b"\x24\x08\x00\x00" + b"WAVE"),              # riff
        (5, b"\x00\x00\x00\x20" + b"ftypisom"),                    # mp4 (offset 4)
        (6, b"ID3\x04" + b"tag"),                                  # mp3
        (7, bytes.fromhex("1A45DFA3") + b"matroska"),              # webm
        (8, b"plain text bytes"),                                  # unknown
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    got = {
        r["media_id"]: r["fmt"]
        for r in df.select("media_id", sniff_format(F.col("payload")).alias("fmt")).collect()
    }
    assert got == {1: "png", 2: "jpeg", 3: "gif", 4: "riff",
                   5: "mp4", 6: "mp3", 7: "webm", 8: "unknown"}


def test_format_inventory_groups_and_sizes(spark, sf_small):
    from timescaledb_event_streamer_spark.operators.multimodal import (
        attach_media,
        format_inventory,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    media = attach_media(load(spark, sf_small, "documents"))
    inv = format_inventory(media).collect()
    # text payloads sniff as unknown; every declared kind appears
    assert {r["kind"] for r in inv} == {"image", "audio", "video"}
    assert all(r["format"] == "unknown" for r in inv)
    assert sum(r["n_payloads"] for r in inv) == media.count()
    assert all(r["total_bytes"] > 0 for r in inv)


def test_media_header_probe_golden_bytes(spark):
    """Parse REAL container header bytes built by hand with the stdlib
    struct module — completely independent of synthesize_media_headers,
    so a matching synth/parse bug cannot cancel out (the registered
    query's oracle provides the same guarantee from the SQL side)."""
    import struct

    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_media_headers,
    )

    png = (
        b"\x89PNG\r\n\x1a\x0a"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 480)
        + bytes([8, 6, 0, 0, 0]) + b"\x00\x00\x00\x00"
    )
    data_size = 44100 * 2 * 2  # one second, stereo, 16-bit
    wav = (
        b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 4, 4, 16)
        + b"data" + struct.pack("<I", data_size)
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"

    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav)), (3, bytearray(gif))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in parse_media_headers(df).collect()}

    p = rows[1]
    assert (p["container"], p["width"], p["height"], p["bit_depth"]) == (
        "png", 640, 480, 8,
    )
    assert p["aspect_ratio"] == round(640 / 480, 6)
    assert p["n_channels"] is None and p["duration_ms"] is None

    w = rows[2]
    assert (w["container"], w["n_channels"], w["sample_rate"]) == ("wav", 2, 44100)
    assert (w["bit_depth"], w["duration_ms"]) == (16, 1000)
    assert w["width"] is None and w["megapixels"] is None

    g = rows[3]
    assert (g["container"], g["width"], g["height"]) == ("gif", 320, 200)
    assert g["megapixels"] == round(320 * 200 / 1e6, 6)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    dims=st.lists(
        st.tuples(
            st.integers(1, 2**31 - 1),   # PNG width (u32 range, signed-safe)
            st.integers(1, 2**31 - 1),   # PNG height
            st.integers(1, 65535),       # GIF width (u16)
            st.integers(1, 65535),       # GIF height
            st.integers(1, 8),           # WAV channels
            st.sampled_from([8000, 22050, 44100, 96000]),
            st.integers(1, 10**7),       # WAV sample count
        ),
        min_size=1,
        max_size=6,
    )
)
def test_media_header_parse_property(spark, dims):
    """Round-trip arbitrary dimensions through hand-built (struct.pack)
    container bytes: the fixed-offset reads must recover every field
    across the whole legal value range — including widths with the
    high bytes set, which would expose any endianness or sign slip."""
    import struct

    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_media_headers,
    )

    rows = []
    expected = {}
    mid = 0
    for pw, ph, gw, gh, ch, rate, n_samp in dims:
        png = (
            b"\x89PNG\r\n\x1a\x0a" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", pw, ph) + bytes([8, 6, 0, 0, 0]) + b"\0\0\0\0"
        )
        rows.append((mid, bytearray(png)))
        expected[mid] = ("png", pw, ph, None, None, None)
        mid += 1
        ds = n_samp * ch * 2
        wav = (
            b"RIFF" + struct.pack("<I", 36 + ds) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * ch * 2, ch * 2, 16)
            + b"data" + struct.pack("<I", ds)
        )
        rows.append((mid, bytearray(wav)))
        expected[mid] = ("wav", None, None, ch, rate, n_samp * 1000 // rate)
        mid += 1
        gif = b"GIF89a" + struct.pack("<HH", gw, gh) + b"\xf7\0\0"
        rows.append((mid, bytearray(gif)))
        expected[mid] = ("gif", gw, gh, None, None, None)
        mid += 1

    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in parse_media_headers(df).collect()}
    assert len(got) == len(expected)
    for mid, (cont, w, h, ch, rate, dur_ms) in expected.items():
        r = got[mid]
        assert (r["container"], r["width"], r["height"]) == (cont, w, h)
        assert (r["n_channels"], r["sample_rate"]) == (ch, rate)
        assert r["duration_ms"] == dur_ms


def _jpeg_media(spark, payloads):
    return spark.createDataFrame(
        [(i, bytes.fromhex(p)) for i, p in enumerate(payloads)],
        "media_id long, payload binary",
    )


def test_jpeg_walk_golden_bytes(spark):
    """Hand-built JPEG headers (independent of the synthesizer): the
    segment walk must hop variable-length APP/COM segments to SOF and
    read geometry from marker-declared offsets."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_jpeg_headers,
    )

    # JFIF APP0 (16 bytes incl. length) + COM (5) + SOF0 640x480
    jfif = (
        "FFD8"
        + "FFE0" + "0010" + "4A46494600" + "0102" + "00" + "0000" + "0000" + "0000"
        + "FFFE" + "0005" + "414243"
        + "FFC0" + "0011" + "08" + "01E0" + "0280" + "03" + "011100" + "021101" + "031101"
        + "FFD9"
    )
    # progressive SOF2, single APP segment, 8000x12 (u16 edge sizes)
    prog = (
        "FFD8"
        + "FFE1" + "0004" + "0000"
        + "FFC2" + "0011" + "08" + "1F40" + "000C" + "03" + "011100" + "021101" + "031101"
        + "FFD9"
    )
    out = {r["media_id"]: r for r in
           parse_jpeg_headers(_jpeg_media(spark, [jfif, prog])).collect()}
    g = out[0]
    assert g["is_jpeg"] and g["height"] == 480 and g["width"] == 640
    assert g["n_header_segments"] == 2 and not g["progressive"]
    assert g["precision"] == 8 and g["n_components"] == 3
    assert g["megapixels"] == round(640 * 480 / 1e6, 6)
    p = out[1]
    assert p["progressive"] and p["height"] == 8000 and p["width"] == 12
    assert p["n_header_segments"] == 1


def test_jpeg_walk_hostile_inputs(spark):
    """Non-JPEG magic, truncated chains, and SOF-less streams must
    come back null-geometry instead of misreading bytes."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_jpeg_headers,
    )

    png_magic = "89504E470D0A1A0A"
    truncated = "FFD8FFE000"          # length field cut off
    no_sof = "FFD8FFE1000400 00FFD9".replace(" ", "")
    out = {r["media_id"]: r for r in
           parse_jpeg_headers(_jpeg_media(spark, [png_magic, truncated, no_sof])).collect()}
    assert not out[0]["is_jpeg"]
    for i in range(3):
        assert out[i]["height"] is None and out[i]["width"] is None


def test_jpeg_synth_parse_plan_is_codegen(spark):
    """The walk must stay inside whole-stage codegen: no Python
    evaluation anywhere in the plan, and (r12) no interpreted
    F.aggregate higher-order fold either — the unrolled stages carry
    the cursor as plain columns."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_jpeg_headers,
        synthesize_jpeg_headers,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    df = parse_jpeg_headers(
        synthesize_jpeg_headers(load(spark, "/root/testdata/sf0.001", "events"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "aggregate(sequence(" not in plan


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    segs=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 40)), min_size=0, max_size=6
    ),
    dims=st.tuples(st.integers(1, 65535), st.integers(1, 65535)),
    progressive=st.booleans(),
)
def test_jpeg_walk_property(spark, segs, dims, progressive):
    """Random APPn/COM segment chains (any count/length within the
    walk bound) must never disturb the SOF read."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_jpeg_headers,
    )

    h, w = dims
    buf = "FFD8"
    for marker_idx, body_len in segs:
        marker = f"FFE{marker_idx:X}" if marker_idx < 10 else "FFFE"
        buf += marker + f"{body_len + 2:04X}" + "00" * body_len
    sof = "FFC2" if progressive else "FFC0"
    buf += sof + "0011" + "08" + f"{h:04X}" + f"{w:04X}" + "03" + "011100021101031101"
    buf += "FFD9"
    [row] = parse_jpeg_headers(_jpeg_media(spark, [buf])).collect()
    assert row["is_jpeg"]
    assert row["height"] == h and row["width"] == w
    assert row["progressive"] == progressive
    assert row["n_header_segments"] == len(segs)


def _wav_media(spark, hex_payloads):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(i, bytes.fromhex(h)) for i, h in enumerate(hex_payloads)],
        "media_id long, payload binary",
    ).select("media_id", F.col("payload"))


def _wav_hex(rate, samples):
    """Canonical mono 16-bit PCM WAV bytes for a planted sample list."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return (hdr + data).hex()


def test_wav_pcm_stats_golden_samples(spark):
    """G6: planted samples -> exact peak / DC sum / energy /
    zero-crossings off the real bytes."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        wav_pcm_stats,
    )

    samples = [100, -200, 300, 0, -400, 32767, -32768, 5]
    out = {r["media_id"]: r for r in wav_pcm_stats(
        _wav_media(spark, [_wav_hex(16000, samples)])).collect()}
    r = out[0]
    assert r["is_pcm_wav"] and r["n_samples"] == 8
    assert r["sample_rate"] == 16000 and r["duration_ms"] == 0
    assert r["peak_abs"] == 32768
    assert r["sum_samples"] == sum(samples)
    assert r["energy"] == sum(s * s for s in samples)
    # sign changes: 100/-200, -200/300, (-400 after 0 is NOT a strict
    # product<0 crossing from 0), -400/32767, 32767/-32768, -32768/5
    assert r["zero_crossings"] == 5


def test_wav_pcm_stats_hostile_inputs(spark):
    """Non-WAV magic, stereo/non-PCM headers, truncated data chunks,
    and a hostile oversized data_size field all yield nulls (or a
    fold capped at the bytes actually present) — never an error."""
    import struct

    from timescaledb_event_streamer_spark.operators.multimodal import (
        WAV_PCM_MAX_SAMPLES,
        wav_pcm_stats,
    )

    good = _wav_hex(8000, [10, -10])
    png = "89504E470D0A1A0A"
    stereo = good.replace("01000100", "01000200", 1)  # channels=2
    # claims 2^31 bytes of data but carries only 2 samples
    hostile = good[:80] + struct.pack("<I", 2**31).hex() + good[88:]
    truncated = good[:94]  # data chunk cut mid-sample
    out = {r["media_id"]: r for r in wav_pcm_stats(
        _wav_media(spark, [good, png, stereo, hostile, truncated])).collect()}
    assert out[0]["is_pcm_wav"] and out[0]["n_samples"] == 2
    assert not out[1]["is_pcm_wav"] and out[1]["energy"] is None
    assert not out[2]["is_pcm_wav"] and out[2]["n_samples"] is None
    # hostile size: fold bounded by actual payload bytes and the cap
    assert out[3]["is_pcm_wav"]
    assert out[3]["n_samples"] <= WAV_PCM_MAX_SAMPLES
    assert out[3]["n_samples"] == 2  # only the bytes actually there
    assert out[4]["is_pcm_wav"]  # header intact, data short
    assert out[4]["n_samples"] == 1
    # rate=0 header: corrupt, must yield nulls — not a DIVIDE_BY_ZERO
    # that kills the batch under ANSI mode
    rate0 = _wav_hex(16000, [10, -10]).replace("803e0000", "00000000")
    [r0] = wav_pcm_stats(_wav_media(spark, [rate0])).collect()
    assert not r0["is_pcm_wav"] and r0["duration_ms"] is None


def test_wav_silence_segments_golden(spark):
    """G7: planted waveform with a known silence layout. Threshold is
    8192, so |v| < 8192 is silent. Layout (S=silent, L=loud):
    S S L L S S S L S  ->  lead=2, trail=1, segments=2 (LL, L),
    longest silent run=3, silent total=6."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        wav_silence_segments,
    )

    samples = [0, 100, 9000, -20000, 50, -8191, 8000, 8192, -7]
    [r] = wav_silence_segments(
        _wav_media(spark, [_wav_hex(8000, samples)])
    ).collect()
    assert r["is_pcm_wav"] and r["n_samples"] == 9
    assert r["lead_silence"] == 2
    assert r["trail_silence"] == 1
    assert r["n_segments"] == 2
    assert r["longest_silence"] == 3
    assert r["n_silent"] == 6


def test_wav_silence_all_silent_and_all_loud(spark):
    """Degenerate payloads: all-silent -> lead == trail == n and zero
    segments; all-loud -> zero silence everywhere, one segment."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        wav_silence_segments,
    )

    out = {
        r["media_id"]: r
        for r in wav_silence_segments(
            _wav_media(
                spark,
                [
                    _wav_hex(8000, [0, 1, -5, 7]),
                    _wav_hex(8000, [9000, -9000, 30000]),
                    "89504E470D0A1A0A",  # PNG magic: not a WAV
                ],
            )
        ).collect()
    }
    allsil = out[0]
    assert allsil["lead_silence"] == 4 and allsil["trail_silence"] == 4
    assert allsil["n_segments"] == 0 and allsil["longest_silence"] == 4
    allloud = out[1]
    assert allloud["n_silent"] == 0 and allloud["n_segments"] == 1
    assert allloud["lead_silence"] == 0 and allloud["trail_silence"] == 0
    assert not out[2]["is_pcm_wav"] and out[2]["n_segments"] is None


def test_wav_silence_matches_pure_python_on_random_payloads(spark):
    """Property check: 200 seeded-random sample lists (including
    forced extremes, threshold-boundary values, and long runs) run
    through the Spark fold in ONE job and must match a trivially
    correct pure-Python simulator sample-for-sample."""
    import random

    from timescaledb_event_streamer_spark.operators.multimodal import (
        WAV_SILENCE_THRESHOLD,
        wav_silence_segments,
    )

    rng = random.Random(20260815)
    cases = []
    for i in range(200):
        n = rng.randint(1, 48)
        style = i % 4
        if style == 0:
            s = [rng.randint(-32768, 32767) for _ in range(n)]
        elif style == 1:  # hover at the threshold boundary
            s = [rng.choice([-8193, -8192, -8191, 8191, 8192, 8193, 0])
                 for _ in range(n)]
        elif style == 2:  # long runs
            s, level = [], rng.choice([0, 30000])
            while len(s) < n:
                run = rng.randint(1, 12)
                s.extend([level] * min(run, n - len(s)))
                level = 30000 if level == 0 else 0
        else:  # extremes
            s = [rng.choice([-32768, 32767, 1, -1]) for _ in range(n)]
        cases.append(s)

    def simulate(s):
        th = WAV_SILENCE_THRESHOLD
        silent = [abs(v) < th for v in s]
        lead = 0
        for x in silent:
            if not x:
                break
            lead += 1
        trail = 0
        for x in reversed(silent):
            if not x:
                break
            trail += 1
        nseg = sum(
            1 for j, x in enumerate(silent) if not x and (j == 0 or silent[j - 1])
        )
        longest = cur = 0
        for x in silent:
            cur = cur + 1 if x else 0
            longest = max(longest, cur)
        return (len(s), lead, trail, nseg, longest, sum(silent))

    out = {
        r["media_id"]: r
        for r in wav_silence_segments(
            _wav_media(spark, [_wav_hex(8000, s) for s in cases])
        ).collect()
    }
    for i, s in enumerate(cases):
        n, lead, trail, nseg, longest, nsil = simulate(s)
        r = out[i]
        got = (
            r["n_samples"], r["lead_silence"], r["trail_silence"],
            r["n_segments"], r["longest_silence"], r["n_silent"],
        )
        assert got == (n, lead, trail, nseg, longest, nsil), (i, s, got)


# ---------------------------------------------------------------------------
# pure-Python PNG codec (r6): real decode/resize on the decoder="real"
# seam. Golden PNGs below are authored INDEPENDENTLY (struct + zlib +
# spec filter arithmetic, never png_codec's encoder) so an encode bug
# cannot cancel a decode bug.

import struct
import zlib

import numpy as np


def _golden_png(pixels: "np.ndarray", row_filters: list[int]) -> bytes:
    """Spec-faithful PNG writer: applies the REQUESTED filter per
    scanline with the RFC 2083 prediction formulas."""
    h, w, ch = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    rows = pixels.reshape(h, w * ch).astype(int)
    raw = bytearray()
    for y, ft in enumerate(row_filters):
        raw.append(ft)
        prev = rows[y - 1] if y else np.zeros(w * ch, dtype=int)
        for x in range(w * ch):
            cur = rows[y][x]
            left = rows[y][x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if ft == 0:
                filt = cur
            elif ft == 1:
                filt = cur - left
            elif ft == 2:
                filt = cur - up
            elif ft == 3:
                filt = cur - ((left + up) >> 1)
            else:
                filt = cur - paeth(left, up, ul)
            raw.append(filt & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _rng_pixels(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)


def test_png_decode_every_filter_type():
    from timescaledb_event_streamer_spark.operators.png_codec import png_decode

    px = _rng_pixels(5, 4, 3, seed=7)
    got = png_decode(_golden_png(px, [0, 1, 2, 3, 4]))
    assert got.shape == (5, 4, 3)
    assert np.array_equal(got, px)


def test_png_decode_gray_rgba_gray_alpha():
    from timescaledb_event_streamer_spark.operators.png_codec import png_decode

    for ch in (1, 2, 4):
        px = _rng_pixels(6, 3, ch, seed=10 + ch)
        got = png_decode(_golden_png(px, [4, 3, 2, 1, 0, 4]))
        assert np.array_equal(got, px), ch


def test_png_decode_palette():
    from timescaledb_event_streamer_spark.operators.png_codec import png_decode

    # 2x3 palette image: indices into a 4-color palette
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = png_decode(png)
    assert np.array_equal(got, palette[idx])


def test_png_unsupported_variants_raise():
    from timescaledb_event_streamer_spark.operators.png_codec import png_decode

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    sixteen = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    adam7 = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    for ihdr, msg in ((sixteen, "bit depth"), (adam7, "interlaced")):
        with pytest.raises(ValueError, match=msg):
            png_decode(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr))
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"GIF89a....")


def test_png_encode_header_agrees_with_jvm_probe(spark):
    """Cross-check: the codec's encoder output parses through the
    INDEPENDENT JVM header probe (parse_media_headers reads width/
    height via hex offsets) — two implementations, one wire truth."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_media_headers,
    )
    from timescaledb_event_streamer_spark.operators.png_codec import (
        png_decode,
        png_encode,
    )

    px = _rng_pixels(11, 17, 3, seed=3)
    data = png_encode(px)
    assert np.array_equal(png_decode(data), px)  # roundtrip
    df = spark.createDataFrame([(1, bytearray(data))], "media_id long, payload binary")
    r = parse_media_headers(df).collect()[0]
    assert r["container"] == "png"
    assert r["width"] == 17 and r["height"] == 11 and r["bit_depth"] == 8


def test_resize_images_real_decoder_on_golden_pngs(spark):
    """The G2 seam closed: resize_images(decoder='real') decodes real
    PNG payloads, nearest-resizes to the PLANNED (target_w, target_h)
    and re-encodes — pixels verified against a numpy-computed
    expectation."""
    from timescaledb_event_streamer_spark.operators.multimodal import resize_images
    from timescaledb_event_streamer_spark.operators.png_codec import png_decode

    imgs = {
        1: _rng_pixels(64, 128, 3, seed=1),
        2: _rng_pixels(200, 100, 4, seed=2),
        3: _rng_pixels(20, 30, 1, seed=3),  # under max_side: no upscale
    }
    rows = [
        (mid, "image", bytearray(_golden_png(px, [0, 1, 2, 3, 4] * (px.shape[0] // 5)
                                              + [0] * (px.shape[0] % 5))),
         px.shape[1], px.shape[0], 0)
        for mid, px in imgs.items()
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int",
    )
    out = {r["media_id"]: r for r in resize_images(media, 64, decoder="real").collect()}
    assert set(out) == {1, 2, 3}
    for mid, px in imgs.items():
        r = out[mid]
        got = png_decode(bytes(r["payload"]))
        assert got.shape == (r["target_h"], r["target_w"], px.shape[2])
        h, w = px.shape[:2]
        ys = np.minimum(((np.arange(r["target_h"]) + 0.5) * h / r["target_h"]).astype(int), h - 1)
        xs = np.minimum(((np.arange(r["target_w"]) + 0.5) * w / r["target_w"]).astype(int), w - 1)
        assert np.array_equal(got, px[ys][:, xs]), mid
    # aspect ratio + no-upscale contracts still hold through the real path
    assert (out[1]["target_w"], out[1]["target_h"]) == (64, 32)
    assert (out[2]["target_w"], out[2]["target_h"]) == (32, 64)
    assert (out[3]["target_w"], out[3]["target_h"]) == (30, 20)


def test_extract_features_real_decoder_on_golden_pngs(spark):
    from timescaledb_event_streamer_spark.operators.multimodal import (
        extract_features,
    )

    px = _rng_pixels(16, 16, 3, seed=5)
    media = spark.createDataFrame(
        [(1, "image", bytearray(_golden_png(px, [0] * 16)), 16, 16, 0)],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int",
    )
    r = extract_features(media, decoder="real").collect()[0]
    f = r["features"]
    pxf = px.astype(np.float64)
    want = [
        16.0, 16.0, 3.0, pxf.mean(), pxf.std(), pxf.min(), pxf.max(),
        np.abs(np.diff(pxf, axis=1)).mean(),
    ]
    assert f[:3] == want[:3]
    for got_v, want_v in zip(f[3:], want[3:]):
        assert abs(got_v - want_v) < 1e-5  # features column is float32


# ---------------------------------------------------------------------------
# pure-Python baseline JPEG decoder (r7): the JPEG branch of the
# real-decode seam. Golden streams + expected arrays are authored
# INDEPENDENTLY by tools/make_golden_jpeg.py (its own forward DCT,
# zigzag, canonical-Huffman builder and bit writer — never
# jpeg_codec's helpers), so an encode bug cannot cancel a decode bug.

from pathlib import Path

GOLDEN_JPEG = Path(__file__).resolve().parent / "golden" / "jpeg"

JPEG_CASES = [
    "gray_8x8",       # single block
    "gray_20x13",     # non-multiple-of-8 frame (edge cropping)
    "gray_restart",   # DRI=2 + RSTn markers, DC predictor resets
    "color_444",      # 3-component YCbCr, no subsampling
    "color_420",      # 4:2:0 subsampling, odd 17x18 frame
]


@pytest.mark.parametrize("name", JPEG_CASES)
def test_jpeg_decode_matches_independent_expected(name):
    """Decoded pixels equal the generator's independently-computed
    expectation (dequant -> its own direct-formula IDCT -> upsample
    -> color convert). Tolerance 1 absorbs float round-off between
    the two IDCT implementations; in practice the diff is 0."""
    from timescaledb_event_streamer_spark.operators.jpeg_codec import (
        jpeg_decode,
    )

    got = jpeg_decode((GOLDEN_JPEG / f"{name}.jpg").read_bytes())
    want = np.load(GOLDEN_JPEG / f"{name}_expected.npy")
    assert got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"{name}: max pixel diff {diff.max()}"
    assert (diff == 0).mean() > 0.99


def test_jpeg_nonbaseline_and_garbage_raise():
    from timescaledb_event_streamer_spark.operators.jpeg_codec import (
        jpeg_decode,
    )

    # the r7 gate case was a SOF2 header with NO scans — progressive
    # now decodes (r8), so this malformed stream fails on the missing
    # scan, not on the frame type
    with pytest.raises(ValueError, match="no SOS scan"):
        jpeg_decode((GOLDEN_JPEG / "progressive.jpg").read_bytes())
    # arithmetic-coded SOF9 stays gated
    sof9 = bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    stream = (
        b"\xff\xd8\xff\xc9" + len(sof9).to_bytes(2, "big") + sof9 + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="frame type"):
        jpeg_decode(stream)
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"\x89PNG\r\n\x1a\nnope")
    with pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8\xff\xdb\x00\x03\x00")  # truncated DQT


@pytest.mark.parametrize(
    "name",
    [
        "prog_gray_8x8",
        "prog_gray_20x13",
        "prog_gray_sparse",
        "prog_color_444",
        "prog_color_420",
    ],
)
def test_jpeg_progressive_decodes_pixel_exact(name):
    """SOF2 progressive (r8): the golden streams — authored by the
    generator's OWN G.1-side scan encoders (DC first/refine, AC
    first/refine, EOB runs, two spectral bands stitched by a joined
    refinement band) — decode pixel-EXACT against the expected
    arrays computed directly from the coefficients (independent of
    any scan encoding)."""
    from timescaledb_event_streamer_spark.operators.jpeg_codec import (
        jpeg_decode,
    )

    data = (GOLDEN_JPEG / f"{name}.jpg").read_bytes()
    # structural: really progressive, really multi-scan
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    assert data.count(b"\xff\xda") >= 4
    got = jpeg_decode(data)
    want = np.load(GOLDEN_JPEG / f"{name}_expected.npy")
    assert got.shape == want.shape
    assert np.array_equal(got, want), (
        f"{name}: max diff "
        f"{np.abs(got.astype(int) - want.astype(int)).max()}"
    )


def test_jpeg_progressive_equals_baseline_of_same_coefficients(tmp_path):
    """The strongest cross-check: the SAME quantized coefficients
    encoded as baseline SOF0 (the long-verified path) and as SOF2
    progressive must decode to IDENTICAL pixels — any encoder/decoder
    shared misunderstanding of the scan procedures would have to be
    exactly self-inverse across two different entropy layouts to
    pass."""
    import tools.make_golden_jpeg as gen
    from timescaledb_event_streamer_spark.operators.jpeg_codec import (
        jpeg_decode,
    )

    img = gen.gray_image(21, 19, seed=41)
    coeffs = gen.quantize_plane(img, gen.Q_LUMA)
    base = gen.encode("x", [coeffs], [(0, gen.Q_LUMA)], [(1, 1)], 21, 19)
    prog = gen.encode_progressive(
        [coeffs], [(0, gen.Q_LUMA)], [(1, 1)], 21, 19
    )
    assert np.array_equal(jpeg_decode(base), jpeg_decode(prog))


def test_golden_jpeg_files_reproducible(tmp_path, monkeypatch):
    """The committed .jpg/.npy goldens are exactly what the generator
    writes — nobody hand-edited a byte."""
    import tools.make_golden_jpeg as gen

    monkeypatch.setattr(gen, "OUT", tmp_path)
    gen.main()
    for f in sorted(GOLDEN_JPEG.iterdir()):
        assert (tmp_path / f.name).read_bytes() == f.read_bytes(), f.name


def test_extract_features_real_decoder_on_golden_jpeg(spark):
    """The feature seam routes JPEG payloads by magic bytes to the
    real decoder: the 8-float contract computed from DECODED JPEG
    pixels, verified against the independent expected array."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        extract_features,
    )

    payload = (GOLDEN_JPEG / "color_444.jpg").read_bytes()
    want_px = np.load(GOLDEN_JPEG / "color_444_expected.npy").astype(
        np.float64
    )
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), 16, 16, 0)],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int",
    )
    r = extract_features(media, decoder="real").collect()[0]
    f = r["features"]
    assert f[:3] == [16.0, 16.0, 3.0]
    want = [
        want_px.mean(), want_px.std(), want_px.min(), want_px.max(),
        np.abs(np.diff(want_px, axis=1)).mean(),
    ]
    for got_v, want_v in zip(f[3:], want):
        assert abs(got_v - want_v) < 2e-2  # float32 column + <=1/px slack


def test_resize_images_real_decoder_on_golden_jpeg(spark):
    """resize_images(decoder='real') on a JPEG payload: decode ->
    nearest resize -> PNG re-encode (the lossless intermediate);
    pixels match the nearest-resample of the independent expected
    array."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        resize_images,
    )
    from timescaledb_event_streamer_spark.operators.png_codec import (
        png_decode,
    )

    payload = (GOLDEN_JPEG / "color_420.jpg").read_bytes()
    want_px = np.load(GOLDEN_JPEG / "color_420_expected.npy")
    h, w = want_px.shape[:2]  # 17 x 18
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), w, h, 0)],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int",
    )
    r = resize_images(media, max_side=9, decoder="real").collect()[0]
    got = png_decode(bytes(r["payload"]))
    tw, th = r["target_w"], r["target_h"]
    ys = np.minimum(((np.arange(th) + 0.5) * h / th).astype(int), h - 1)
    xs = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(int), w - 1)
    want = want_px[ys][:, xs]
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


# ---------------------------------------------------------------------------
# pure-Python GIF decoder (r7): the LZW branch of the real-decode
# seam. Goldens authored independently (tools/make_golden_gif.py: its
# own greedy LZW encoder + struct-packed blocks).

GOLDEN_GIF = Path(__file__).resolve().parent / "golden" / "gif"

GIF_CASES = [
    "pattern_4c",       # 2-bit palette, deterministic pattern
    "noise_256c",       # 8-bit palette, code-width growth
    "interlaced",       # 4-pass interlace row order
    "with_extensions",  # GIF89a graphic-control + comment skipped
    "long_stream",      # 4096-code dictionary overflow + mid-stream clear
]


@pytest.mark.parametrize("name", GIF_CASES)
def test_gif_decode_matches_independent_expected(name):
    from timescaledb_event_streamer_spark.operators.gif_codec import gif_decode

    got = gif_decode((GOLDEN_GIF / f"{name}.gif").read_bytes())
    want = np.load(GOLDEN_GIF / f"{name}_expected.npy")
    assert np.array_equal(got, want), name


def test_gif_malformed_raises():
    from timescaledb_event_streamer_spark.operators.gif_codec import gif_decode

    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"\x89PNG\r\n\x1a\n")
    ok = (GOLDEN_GIF / "pattern_4c.gif").read_bytes()
    with pytest.raises(ValueError):
        gif_decode(ok[:-10])  # truncated mid-stream
    with pytest.raises(ValueError, match="no image frame"):
        # header + 12-byte global color table, then straight to trailer
        gif_decode(ok[:25] + b"\x3b")


def test_golden_gif_files_reproducible(tmp_path, monkeypatch):
    import tools.make_golden_gif as gen

    monkeypatch.setattr(gen, "OUT", tmp_path)
    gen.main()
    for f in sorted(GOLDEN_GIF.iterdir()):
        assert (tmp_path / f.name).read_bytes() == f.read_bytes(), f.name


def test_extract_features_real_decoder_on_golden_gif(spark):
    """The seam routes GIF payloads to the real LZW decoder: the
    8-float contract computed from decoded palette pixels."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        extract_features,
    )

    payload = (GOLDEN_GIF / "noise_256c.gif").read_bytes()
    want_px = np.load(GOLDEN_GIF / "noise_256c_expected.npy").astype(
        np.float64
    )
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), 16, 11, 0)],
        "media_id long, kind string, payload binary, width int, height int, "
        "duration_ms int",
    )
    r = extract_features(media, decoder="real").collect()[0]
    f = r["features"]
    assert f[:3] == [16.0, 11.0, 3.0]
    want = [
        want_px.mean(), want_px.std(), want_px.min(), want_px.max(),
        np.abs(np.diff(want_px, axis=1)).mean(),
    ]
    for got_v, want_v in zip(f[3:], want):
        assert abs(got_v - want_v) < 1e-3  # float32 feature column


# ---------------------------------------------------------------------------
# codec property tests: randomized roundtrips through the INDEPENDENT
# generator-side encoders (tools/make_golden_*.py) — the goldens
# pinned specific scenarios; these sweep shapes/palettes/filters.

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 17),
    w=st.integers(1, 19),
    nbits=st.sampled_from([2, 4, 8]),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, nbits, interlace, seed):
    import tools.make_golden_gif as gen
    from timescaledb_event_streamer_spark.operators.gif_codec import (
        gif_decode,
    )

    rng = np.random.RandomState(seed)
    ncolors = 1 << nbits
    pal = rng.randint(0, 256, size=(ncolors, 3)).astype(np.uint8)
    idx = rng.randint(0, ncolors, size=(h, w)).astype(np.int64)
    got = gif_decode(gen.make_gif(pal, idx, interlace=interlace))
    assert np.array_equal(got, pal[idx])


@settings(max_examples=8, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    restart=st.sampled_from([0, 1, 3]),
)
def test_jpeg_gray_roundtrip_property(h, w, seed, restart):
    """Random grayscale frames through the generator's independent
    encoder: the decoder must reconstruct the generator's own
    inverse-path expectation within 1 (float round-off)."""
    import tools.make_golden_jpeg as gen
    from timescaledb_event_streamer_spark.operators.jpeg_codec import (
        jpeg_decode,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w)).astype(float)
    coeffs = gen.quantize_plane(img, gen.Q_LUMA)
    stream = gen.encode(
        "prop", [coeffs], [(0, gen.Q_LUMA)], [(1, 1)], h, w, restart
    )
    want = gen.expected_from_coeffs(
        [coeffs], [gen.Q_LUMA], [(1, 1)], h, w, False
    )
    got = jpeg_decode(stream)
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


@settings(max_examples=6, deadline=None)
@given(
    h=st.integers(2, 14),
    w=st.integers(2, 14),
    seed=st.integers(0, 2**31 - 1),
    samp=st.sampled_from([[(1, 1), (1, 1), (1, 1)], [(2, 2), (1, 1), (1, 1)],
                          [(2, 1), (1, 1), (1, 1)]]),
)
def test_jpeg_color_roundtrip_property(h, w, seed, samp):
    """Random color frames across 4:4:4 / 4:2:0 / 4:2:2 sampling."""
    import tools.make_golden_jpeg as gen
    from timescaledb_event_streamer_spark.operators.jpeg_codec import (
        jpeg_decode,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3)).astype(float)
    y, cb, cr = gen.rgb_to_ycbcr(img)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mh = -(-h // (8 * vmax)) * 8 * vmax
    mw = -(-w // (8 * hmax)) * 8 * hmax
    planes = []
    for plane, (hs, vs) in zip((y, cb, cr), samp):
        p = np.pad(plane, ((0, mh - h), (0, mw - w)), mode="edge")
        planes.append(gen.subsample(p, vmax // vs, hmax // hs))
    qs = [gen.Q_LUMA, gen.Q_CHROMA, gen.Q_CHROMA]
    coeffs = [gen.quantize_plane(p, q) for p, q in zip(planes, qs)]
    stream = gen.encode(
        "prop", coeffs, [(0, gen.Q_LUMA), (1, gen.Q_CHROMA)], samp, h, w
    )
    want = gen.expected_from_coeffs(coeffs, qs, samp, h, w, True)
    got = jpeg_decode(stream)
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_flac_roundtrip_stats_fused_parity(spark, sf_small):
    """The fused single-seam G15 path (r11) must be row-identical to
    the two-stage synthesize >> stats composition it replaced in the
    registered query."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        flac_pcm_roundtrip_stats,
        flac_pcm_stats,
        synthesize_flac_pcm,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    events = load(spark, sf_small, "events").limit(64)
    two_stage = sorted(
        map(tuple, flac_pcm_stats(synthesize_flac_pcm(events)).collect())
    )
    fused = sorted(map(tuple, flac_pcm_roundtrip_stats(events).collect()))
    assert fused == two_stage
    assert len(fused) == 64


def test_adpcm_roundtrip_stats_fused_parity(spark, sf_small):
    """Fused single-seam G17 path (r11) must match the two-stage
    composition row for row."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        adpcm_pcm_roundtrip_stats,
        adpcm_pcm_stats,
        synthesize_adpcm_pcm,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    events = load(spark, sf_small, "events").limit(64)
    two_stage = sorted(
        map(tuple, adpcm_pcm_stats(synthesize_adpcm_pcm(events)).collect())
    )
    fused = sorted(map(tuple, adpcm_pcm_roundtrip_stats(events).collect()))
    assert fused == two_stage
    assert len(fused) == 64


def test_adpcm_stats_empty_decode_is_rejected_not_crash():
    """A structurally valid ADPCM payload whose fact chunk declares
    zero samples must produce an is_adpcm=False row, not a task
    failure (r10 advice)."""
    import struct

    from timescaledb_event_streamer_spark.operators.adpcm_codec import (
        adpcm_encode,
    )
    from timescaledb_event_streamer_spark.operators.multimodal import (
        _adpcm_stat_row,
    )
    import numpy as np

    enc = bytearray(adpcm_encode(np.asarray([1, -2, 3], dtype=np.int16), 8000))
    i = enc.find(b"fact")
    assert i > 0
    enc[i + 8 : i + 12] = struct.pack("<I", 0)  # dwSampleLength = 0
    row = _adpcm_stat_row(7, bytes(enc))
    assert row["is_adpcm"] is False
    assert row["n_samples"] is None


def test_wav_seams_match_catalyst_twins(spark, sf_small):
    """The r11 numpy seams for wav_pcm_stats / wav_silence_segments
    must be row-identical to the retained Catalyst folds on the
    synthesized corpus AND on hostile payloads (truncations, byte
    mutations, garbage)."""
    import random

    from timescaledb_event_streamer_spark.operators.multimodal import (
        _wav_pcm_stats_catalyst,
        _wav_silence_segments_catalyst,
        synthesize_wav_pcm,
        wav_pcm_stats,
        wav_silence_segments,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    media = synthesize_wav_pcm(load(spark, sf_small, "events").limit(256))
    base = bytes(media.limit(1).collect()[0]["payload"])
    rng = random.Random(5)
    hostile = []
    for i in range(24):
        k = rng.randrange(4)
        b2 = bytearray(base)
        if k == 0:
            b2 = b2[: rng.randrange(0, len(b2))]
        elif k == 1:
            for _ in range(rng.randrange(1, 8)):
                b2[rng.randrange(len(b2))] = rng.randrange(256)
        elif k == 2:
            b2 = bytearray(b"RIFF") + bytearray(
                rng.randrange(256) for _ in range(rng.randrange(0, 80))
            )
        else:
            b2 = bytearray(rng.randrange(256) for _ in range(rng.randrange(0, 60)))
        hostile.append((i, bytes(b2)))
    hdf = spark.createDataFrame(hostile, "media_id long, payload binary")
    for new_fn, old_fn in (
        (wav_pcm_stats, _wav_pcm_stats_catalyst),
        (wav_silence_segments, _wav_silence_segments_catalyst),
    ):
        for df in (media, hdf):
            got = sorted(map(tuple, new_fn(df).collect()))
            want = sorted(map(tuple, old_fn(df).collect()))
            assert got == want


def test_jpeg_unrolled_walk_matches_catalyst_fold(spark, sf_small):
    """The r12 unrolled staged-codegen walk must be row-identical to
    the retained F.aggregate fold twin it replaces, on the full
    synthesized corpus."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        _parse_jpeg_headers_catalyst,
        parse_jpeg_headers,
        synthesize_jpeg_headers,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    media = synthesize_jpeg_headers(load(spark, sf_small, "events"))
    want = sorted(map(tuple, _parse_jpeg_headers_catalyst(media).collect()))
    assert sorted(map(tuple, parse_jpeg_headers(media).collect())) == want


def test_jpeg_unrolled_walk_differential_fuzz_vs_catalyst(spark):
    """Hostile payloads (truncations, byte mutations, random tails)
    must produce the same rows as the Catalyst fold — the unrolled
    stages apply the identical step expression, so three-valued
    logic, conv overflow and substr edge reads must all agree."""
    import random

    from timescaledb_event_streamer_spark.operators.multimodal import (
        _parse_jpeg_headers_catalyst,
        parse_jpeg_headers,
    )

    rng = random.Random(41)
    # a well-formed synthesized-shape payload as the mutation base
    base = bytes.fromhex(
        "FFD8"
        "FFE0" "0010" "4A46494600" "0102" "00" "0000" "0000" "0000"
        "FFFE" "0005" "414243"
        "FFC0" "0011" "08" "01E0" "0280" "03" "011100" "021101" "031101"
        "FFD9"
    )
    payloads = []
    for _ in range(24):
        b = bytearray(base)
        k = rng.randrange(4)
        if k == 0:
            b = b[: rng.randrange(1, len(b))]
        elif k == 1:
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif k == 2:
            b = bytearray(b"\xff\xd8") + bytearray(
                rng.randrange(256) for _ in range(rng.randrange(0, 60))
            )
        else:
            b = bytearray(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        payloads.append(bytes(b))
    df = spark.createDataFrame(
        list(enumerate(payloads)), "media_id long, payload binary"
    )
    want = sorted(map(tuple, _parse_jpeg_headers_catalyst(df).collect()))
    got = sorted(map(tuple, parse_jpeg_headers(df).collect()))
    assert got == want


def test_exif_unrolled_locator_matches_catalyst_fold(spark, sf_small):
    """The r12 unrolled APP1 locator must be row-identical to the
    retained F.aggregate fold twin on the full synthesized corpus."""
    from timescaledb_event_streamer_spark.operators.multimodal import (
        _parse_exif_headers_catalyst,
        parse_exif_headers,
        synthesize_exif_headers,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    media = synthesize_exif_headers(load(spark, sf_small, "events"))
    want = sorted(map(tuple, _parse_exif_headers_catalyst(media).collect()))
    assert sorted(map(tuple, parse_exif_headers(media).collect())) == want


def test_exif_unrolled_locator_differential_fuzz_vs_catalyst(spark):
    """Hostile payloads (truncations, byte mutations, bad TIFF
    offsets, garbage) must produce the same rows as the fold-based
    probe — including the F.least null-SKIPPING clamp and the
    coalesce fall-through on the IFD tag scan."""
    import random

    from timescaledb_event_streamer_spark.operators.multimodal import (
        _parse_exif_headers_catalyst,
        parse_exif_headers,
        synthesize_exif_headers,
    )

    rng = random.Random(43)
    bases = [
        bytes(r["payload"])
        for r in synthesize_exif_headers(
            spark.createDataFrame(
                [(6, 4), (7, 3)], "event_id long, user_id long"
            )
        ).collect()
    ]
    payloads = []
    for base in bases:
        for _ in range(14):
            b = bytearray(base)
            k = rng.randrange(4)
            if k == 0:
                b = b[: rng.randrange(1, len(b))]
            elif k == 1:
                for _ in range(rng.randrange(1, 6)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            elif k == 2:
                # valid walk to APP1, hostile TIFF block
                b = bytearray(b"\xff\xd8\xff\xe1\x00\x2a") + bytearray(
                    rng.randrange(256) for _ in range(rng.randrange(0, 50))
                )
            else:
                b = bytearray(
                    rng.randrange(256) for _ in range(rng.randrange(0, 40))
                )
            payloads.append(bytes(b))
    df = spark.createDataFrame(
        list(enumerate(payloads)), "media_id long, payload binary"
    )
    want = sorted(map(tuple, _parse_exif_headers_catalyst(df).collect()))
    got = sorted(map(tuple, parse_exif_headers(df).collect()))
    assert got == want
