"""MP4 / ISO-BMFF decoder-free probe (G18).

The video-container counterpart of the JPEG segment walk
(multimodal.py parse_jpeg_headers) and the EXIF IFD walk: route and
prune a 100 TB media lake's video column BEFORE any decode fleet
runs. ISO-BMFF (ISO/IEC 14496-12, the public MP4 container spec) is
a tree of length-prefixed boxes `[size u32 BE][fourcc][payload]`
where container boxes (moov/trak/mdia/minf/stbl) hold concatenated
child boxes — so ONE linear bounded walk covers the whole tree:
enter a container by hopping 8 bytes, skip a leaf by hopping its
declared size, record fields when the fourcc is mvhd/tkhd/stsd.

The walk runs as an Arrow-batched probe (the sanctioned media seam,
same as the FLAC/ADPCM stats): the r11 optimization round measured
the original JVM-side F.aggregate fold — an 11-field accumulator
through an interpreted Catalyst higher-order function (Spark never
codegens aggregate() lambdas) — at ~58 us/row WALL on local[32],
i.e. ~1.9 ms CPU per row, versus ~15 us CPU per row for the
identical walk over the raw bytes behind the Arrow boundary
(sf0.1 bench 6.8s -> 3.2s; the 3-field JPEG fold stays JVM-side
because its interpreted tree is small enough to win). Unlike a
decode, per-row cost is bounded by MP4_MAX_BOXES x a few slices —
actual sample data (mdat) is never touched; probing cost is header
bytes only.

Reference scope note: the reference (a Go CDC streamer) has no
media path at all; this extends the north-star multimodal gate the
same way the JPEG/EXIF/FLAC probes do. Entropy-coded decode
(H.264/HEVC payloads) stays honestly ffmpeg-gated in
multimodal.py:147 — this probe reads geometry/codec/duration at
projection cost, which is exactly what routing needs.

Box layout facts used (all from the public spec):
- ftyp: major_brand @8, minor_version @12, compatible brands @16+.
- mvhd v0 (108 B): timescale @20, duration @24.
- tkhd v0 (92 B): width @84, height @88 as 16.16 fixed-point;
  video tracks carry nonzero width/height, audio tracks zero.
- stsd: entry_count @12, first sample-entry fourcc @20 (avc1 /
  hev1 / mp4a ... — the codec identity, no decode needed).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from timescaledb_event_streamer_spark.operators.multimodal import _hbe

__all__ = [
    "MP4_MAX_BOXES",
    "synthesize_mp4_headers",
    "parse_mp4_headers",
    "mp4_probe_roundtrip",
]

#: walk iteration bound: the synthesized worst case visits 17 boxes;
#: real MP4s put moov within a handful of top-level boxes. Raise for
#: pathological box-spam files — the fold cost is linear in it.
MP4_MAX_BOXES = 20

_hx = lambda s: s.encode("ascii").hex().upper()  # noqa: E731
_FTYP, _MOOV, _MVHD, _TRAK, _TKHD = map(_hx, ("ftyp", "moov", "mvhd", "trak", "tkhd"))
_MDIA, _MDHD, _MINF, _STBL, _STSD = map(_hx, ("mdia", "mdhd", "minf", "stbl", "stsd"))
_CONTAINERS = [_MOOV, _TRAK, _MDIA, _MINF, _STBL]

#: unity transform matrix (9 x 32-bit fixed), spec default
_MATRIX = "00010000" + "00000000" * 3 + "00010000" + "00000000" * 3 + "40000000"


def _box(fourcc_hex: str, body_hex):
    """size(u32 BE) + fourcc + body, size self-inclusive in BYTES."""
    return F.concat(
        _hbe(F.length(body_hex) / 2 + 8, 4), F.lit(fourcc_hex), body_hex
    )


def synthesize_mp4_headers(events: DataFrame) -> DataFrame:
    """Deterministic ISO-BMFF header payloads with a VARIABLE box
    layout derived from the events table: ftyp with 1-2 compatible
    brands, an optional free box, moov > mvhd + 1-2 trak trees
    (trak > tkhd + mdia > mdhd + minf > stbl > stsd), track 1 video
    (avc1 or hev1, real 16.16 fixed dimensions), track 2 audio
    (mp4a) when present. Only (media_id, payload) survive — the
    parse side runs from the bytes alone."""
    n_shuffle = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    events = events.repartition(n_shuffle, "event_id")
    eid, uid = F.col("event_id"), F.col("user_id")

    major = F.element_at(
        F.array(F.lit(_hx("isom")), F.lit(_hx("mp42")), F.lit(_hx("mp41"))),
        (eid % 3 + 1).cast("int"),
    )
    compat = F.concat(
        F.lit(_hx("isom")),
        F.when(uid % 2 == 0, F.lit(_hx("avc1"))).otherwise(F.lit("")),
    )
    ftyp = _box(_FTYP, F.concat(major, F.lit("00000000"), compat))

    free_body = F.repeat(F.lit("00"), (uid % 9 + 4).cast("int"))
    free = F.when(eid % 2 == 0, _box(_hx("free"), free_body)).otherwise(F.lit(""))

    timescale = F.element_at(
        F.array(F.lit(600), F.lit(1000), F.lit(90000)), (uid % 3 + 1).cast("int")
    )
    duration = (eid % 9000 + 1) * 100
    mvhd = _box(
        _MVHD,
        F.concat(
            F.lit("00000000"),              # version 0 + flags
            F.lit("00000000" * 2),          # creation/modification
            _hbe(timescale, 4),
            _hbe(duration, 4),
            F.lit("00010000"), F.lit("0100"), F.lit("00" * 10),
            F.lit(_MATRIX), F.lit("00" * 24),
            F.lit("00000003"),              # next track id
        ),
    )

    width, height = uid % 1920 + 16, eid % 1080 + 16
    vcodec = F.when(eid % 2 == 0, F.lit(_hx("avc1"))).otherwise(F.lit(_hx("hev1")))

    def tkhd(track_id, w_fixed, h_fixed):
        return _box(
            _TKHD,
            F.concat(
                F.lit("00000007"),          # v0, flags enabled|in-movie
                F.lit("00000000" * 2),
                _hbe(track_id, 4),
                F.lit("00000000"),
                _hbe(duration, 4),
                F.lit("00" * 8), F.lit("0000" * 2),
                F.when(w_fixed == 0, F.lit("0100")).otherwise(F.lit("0000")),
                F.lit("0000"), F.lit(_MATRIX),
                _hbe(w_fixed, 4), _hbe(h_fixed, 4),
            ),
        )

    mdhd = F.concat(  # 32-byte leaf the walker must skip INSIDE mdia
        F.lit("00000020"), F.lit(_MDHD), F.lit("00000000"),
        F.lit("00000000" * 2), _hbe(timescale, 4), _hbe(duration, 4),
        F.lit("55C40000"),
    )

    def trak(track_id, w, h, entry_fourcc, entry_body_len: int):
        entry = F.concat(
            _hbe(F.lit(entry_body_len + 8), 4), entry_fourcc,
            F.repeat(F.lit("00"), entry_body_len),
        )
        stsd = _box(
            _STSD, F.concat(F.lit("00000000"), F.lit("00000001"), entry)
        )
        stbl = _box(_STBL, stsd)
        minf = _box(_MINF, stbl)
        mdia = _box(_MDIA, F.concat(mdhd, minf))
        return _box(_TRAK, F.concat(tkhd(track_id, w, h), mdia))

    video = trak(F.lit(1), width * 65536, height * 65536, vcodec, 78)
    audio = F.when(
        eid % 2 == 1, trak(F.lit(2), F.lit(0), F.lit(0), F.lit(_hx("mp4a")), 28)
    ).otherwise(F.lit(""))
    moov = _box(_MOOV, F.concat(mvhd, video, audio))

    return events.select(
        eid.alias("media_id"),
        F.unhex(F.concat(ftyp, free, moov)).alias("payload"),
    )


#: Arrow probe output: one struct per payload, field order is the
#: query's declared column order after media_id.
_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("is_mp4", T.BooleanType()),
        T.StructField("major_brand", T.StringType()),
        T.StructField("timescale", T.LongType()),
        T.StructField("duration", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_tracks", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("video_codec", T.StringType()),
        T.StructField("audio_codec", T.StringType()),
        T.StructField("n_boxes", T.LongType()),
    ]
)
_PROBE_COLS = [f.name for f in _PROBE_SCHEMA.fields]
_CONTAINERS_B = frozenset((b"moov", b"trak", b"mdia", b"minf", b"stbl"))


def _be(p: bytes, off: int, ln: int):
    """Big-endian uint of the AVAILABLE bytes in [off, off+ln), or
    None past the end — exactly F.conv(partial-hex-substr, 16, 10):
    a truncated field parses its present prefix, an absent field is
    null (conv('') is NULL). Slices stay byte-aligned because every
    cursor the walk produces is byte-aligned."""
    b = p[off : off + ln]
    return int.from_bytes(b, "big") if b else None


def _walk_one(p):
    """One payload through the exact walk contract of the original
    JVM fold (see parse_mp4_headers for the contract statement);
    returns the output tuple in _PROBE_SCHEMA order."""
    if p is None:
        return (None,) * 11
    n = len(p)
    is_mp4 = n >= 16 and p[4:8] == b"ftyp"
    bpos = 0
    ts = dur = w = ht = vc = ac = None
    ntrk = nbox = 0
    lw = lh = 0
    for _ in range(MP4_MAX_BOXES):
        if bpos + 8 > n:  # `done`: every guard is false hereafter
            break
        size_b = int.from_bytes(p[bpos : bpos + 4], "big")
        four = p[bpos + 4 : bpos + 8]
        # recorders guard on `done` only; they are idempotent
        # (mvhd/tkhd overwrite the same values) or once-only (vc/ac
        # null-guarded), so a cursor frozen by an invalid size
        # recording every remaining fold iteration is equivalent to
        # recording once here before the stop-break below
        v0 = p[bpos + 8 : bpos + 9] == b"\x00"
        if four == b"mvhd" and v0:
            ts = _be(p, bpos + 20, 4)
            dur = _be(p, bpos + 24, 4)
        elif four == b"tkhd" and v0:
            tw = _be(p, bpos + 84, 4)
            th = _be(p, bpos + 88, 4)
            # 16.16 fixed -> integer pixels; exact for u32 range
            lw = None if tw is None else tw // 65536
            lh = None if th is None else th // 65536
        elif four == b"stsd":
            # sample-entry fourcc; strict decode matches the ANSI
            # JVM decode() (invalid UTF-8 fails the row either way)
            if lw is not None and lw > 0 and vc is None:
                w, ht, vc = lw, lh, p[bpos + 20 : bpos + 24].decode("utf-8")
            elif lw is not None and lw == 0 and ac is None:
                ac = p[bpos + 20 : bpos + 24].decode("utf-8")
        if size_b < 8:  # `stop`: sizes < 8 (largesize escape incl.)
            break
        nbox += 1
        if four == b"trak":
            ntrk += 1
        bpos = bpos + 8 if four in _CONTAINERS_B else bpos + size_b
    if not is_mp4:
        return (False,) + (None,) * 10
    # exact integer ms, identical to DuckDB's integer // (the JVM
    # form used numerator-divisible double division)
    dms = None if ts is None or dur is None else (dur * 1000) // ts
    return (True, p[8:12].decode("utf-8"), ts, dur, dms, ntrk, w, ht, vc, ac, nbox)


_PROBE_OUT_SCHEMA = T.StructType(
    [T.StructField("media_id", T.LongType())] + list(_PROBE_SCHEMA.fields)
)


def parse_mp4_headers(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Walk the box tree ONCE, bounded: containers are entered
    (+8 bytes), leaves skipped by declared size, mvhd/tkhd/stsd
    recorded along the way. Sizes < 8 (including the 64-bit
    largesize escape, size==1) stop the walk defensively, so hostile
    length fields cannot loop or jump backwards. Only version-0
    mvhd/tkhd field layouts are read; a v1 box leaves its fields
    null rather than misreading shifted offsets.

    The walk itself is the Arrow-batched _walk_one (~15 us CPU/row)
    behind mapInPandas — the house media seam, same as the FLAC/BMP
    paths (the earlier pandas_udf form planned as ArrowEvalPython,
    which the plan audit reserves for nothing: MapInPandas is the one
    sanctioned Python node). The r11 measurement notes in the module
    docstring explain why the original interpreted F.aggregate fold
    (~1.9 ms CPU/row) lost."""

    def probe(batches):
        for pdf in batches:
            out = pd.DataFrame(
                [_walk_one(p) for p in pdf[payload_col]],
                columns=_PROBE_COLS,
                dtype=object,
            )
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.select("media_id", payload_col).mapInPandas(
        probe, _PROBE_OUT_SCHEMA
    )


_MATRIX_B = bytes.fromhex(_MATRIX)


def _synth_one(eid: int, uid: int) -> bytes:
    """One payload, byte-identical to synthesize_mp4_headers'
    column expression for the same (event_id, user_id) — pinned by
    the byte-parity pytest. Every field below mirrors one line of
    the JVM synth; keep them in the same order when editing."""

    def box(fourcc: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + fourcc + body

    major = (b"isom", b"mp42", b"mp41")[eid % 3]
    compat = b"isom" + (b"avc1" if uid % 2 == 0 else b"")
    ftyp = box(b"ftyp", major + b"\x00" * 4 + compat)

    free = box(b"free", b"\x00" * (uid % 9 + 4)) if eid % 2 == 0 else b""

    timescale = (600, 1000, 90000)[uid % 3]
    duration = (eid % 9000 + 1) * 100
    mvhd = box(
        b"mvhd",
        b"\x00" * 12
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + bytes.fromhex("00010000") + bytes.fromhex("0100") + b"\x00" * 10
        + _MATRIX_B + b"\x00" * 24
        + bytes.fromhex("00000003"),
    )

    width, height = uid % 1920 + 16, eid % 1080 + 16
    vcodec = b"avc1" if eid % 2 == 0 else b"hev1"

    def tkhd(track_id: int, w_fixed: int, h_fixed: int) -> bytes:
        return box(
            b"tkhd",
            bytes.fromhex("00000007")
            + b"\x00" * 8
            + track_id.to_bytes(4, "big")
            + b"\x00" * 4
            + duration.to_bytes(4, "big")
            + b"\x00" * 8 + b"\x00" * 4
            + (bytes.fromhex("0100") if w_fixed == 0 else b"\x00\x00")
            + b"\x00\x00" + _MATRIX_B
            + w_fixed.to_bytes(4, "big") + h_fixed.to_bytes(4, "big"),
        )

    mdhd = (
        bytes.fromhex("00000020") + b"mdhd" + b"\x00" * 12
        + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
        + bytes.fromhex("55C40000")
    )

    def trak(track_id, w, h, entry_fourcc: bytes, entry_body_len: int) -> bytes:
        entry = (
            (entry_body_len + 8).to_bytes(4, "big")
            + entry_fourcc + b"\x00" * entry_body_len
        )
        stsd = box(b"stsd", b"\x00" * 4 + bytes.fromhex("00000001") + entry)
        mdia = box(b"mdia", mdhd + box(b"minf", box(b"stbl", stsd)))
        return box(b"trak", tkhd(track_id, w, h) + mdia)

    video = trak(1, width * 65536, height * 65536, vcodec, 78)
    audio = trak(2, 0, 0, b"mp4a", 28) if eid % 2 == 1 else b""
    moov = box(b"moov", mvhd + video + audio)
    return ftyp + free + moov


def mp4_probe_roundtrip(events: DataFrame) -> DataFrame:
    """Fused G18 path (r11): synthesize_mp4_headers >> parse_mp4_headers
    in ONE Arrow seam — the FLAC/ADPCM roundtrip-fusion pattern applied
    to the box walk. The two-stage form builds every ~700-byte payload
    through a large JVM hex-concat expression tree (measured 0.61s of
    the 0.89s query at sf0.1 — the synth, not the walk, is the cost)
    and ships it across the Arrow boundary; fusing synthesizes the
    SAME bytes in-task (`_synth_one`, byte-parity-pinned against the
    column expression) and walks them immediately, so only the two
    generating longs cross JVM -> Python and only the 11 probe columns
    come back. Row-for-row identical to the composition by
    construction; pinned by pytest parity on bytes AND rows."""
    n_shuffle = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # hash-repartition on the unique id, not round-robin: spreads the
    # Python work identically but skips the local sort every keyless
    # repartition pays (sortBeforeRepartition, SPARK-23207) and keeps
    # the row->partition map deterministic under retries — measured
    # best-of-8 interleaved 0.83 -> 0.69s at sf0.1
    src = events.select(
        F.col("event_id").alias("media_id"), "user_id"
    ).repartition(n_shuffle, "media_id")

    def probe(batches):
        for pdf in batches:
            out = pd.DataFrame(
                [
                    _walk_one(_synth_one(int(eid), int(uid)))
                    for eid, uid in zip(pdf["media_id"], pdf["user_id"])
                ],
                columns=_PROBE_COLS,
                dtype=object,
            )
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return src.mapInPandas(probe, _PROBE_OUT_SCHEMA)
