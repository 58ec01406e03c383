"""MP4 / ISO-BMFF decoder-free probe (G18).

The video-container counterpart of the JPEG segment walk
(multimodal.py parse_jpeg_headers) and the EXIF IFD walk: route and
prune a 100 TB media lake's video column BEFORE any decode fleet
runs. ISO-BMFF (ISO/IEC 14496-12, the public MP4 container spec) is
a tree of length-prefixed boxes `[size u32 BE][fourcc][payload]`
where container boxes (moov/trak/mdia/minf/stbl) hold concatenated
child boxes — so ONE linear bounded fold walks the whole tree:
enter a container by hopping 8 bytes, skip a leaf by hopping its
declared size, record fields when the fourcc is mvhd/tkhd/stsd.
Entirely JVM-side with zero Python per row (the fold itself is an
interpreted Catalyst higher-order function — Spark does not codegen
aggregate() lambdas — so cost is iterations x expression-tree size;
~60 us/row wall on local[32] (~2 ms CPU) at MP4_MAX_BOXES=20,
linear and embarrassingly parallel);
actual sample data (mdat) is never touched — probing cost is header
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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.operators.multimodal import _hbe

__all__ = [
    "MP4_MAX_BOXES",
    "synthesize_mp4_headers",
    "parse_mp4_headers",
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
    events = events.repartition(n_shuffle)
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


def parse_mp4_headers(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Walk the box tree with ONE bounded F.aggregate: containers are
    entered (+8 bytes), leaves skipped by declared size, mvhd/tkhd/
    stsd recorded in the accumulator. Sizes < 8 (including the
    64-bit largesize escape, size==1) stop the walk defensively, so
    hostile length fields cannot loop or jump backwards. Only
    version-0 mvhd/tkhd field layouts are read; a v1 box leaves its
    fields null rather than misreading shifted offsets.

    The hex string is materialized in its own projection before the
    fold (no CSE inside an expression tree — the JPEG-probe rule)."""
    media = media.select("media_id", F.hex(F.col(payload_col)).alias("_h"))
    h = F.col("_h")

    init = F.struct(
        F.lit(1).cast("long").alias("pos"),      # 1-indexed hex cursor
        F.lit(None).cast("long").alias("ts"),    # mvhd timescale
        F.lit(None).cast("long").alias("dur"),   # mvhd duration
        F.lit(0).cast("int").alias("ntrk"),
        F.lit(0).cast("long").alias("lw"),       # last tkhd width/height
        F.lit(0).cast("long").alias("lh"),
        F.lit(None).cast("long").alias("w"),     # first video track
        F.lit(None).cast("long").alias("hh"),
        F.lit(None).cast("string").alias("vc"),  # video/audio codec fourcc
        F.lit(None).cast("string").alias("ac"),
        F.lit(0).cast("int").alias("nbox"),
    )

    def step(acc, _):
        pos = acc["pos"]
        # `done` is a cheap length predicate; `stop` additionally
        # parses the size field (conv). Field updates guard on
        # `done` only (a matching fourcc at a dead cursor reads as
        # empty substr -> no match); pos/nbox/ntrk carry the full
        # `stop`. Note the fold is a higher-order function, which
        # Spark evaluates INTERPRETED (no whole-stage codegen for
        # aggregate() lambdas) — per-row cost is iterations x tree
        # size, so keep both lean; ~60 us/row wall on local[32]
        # (~2 ms CPU) at MP4_MAX_BOXES=20 — the honest measured cost,
        # see SCALING.md's sf1 row.
        done = (pos + 15) > F.length(h)
        size_b = F.conv(h.substr(pos, F.lit(8)), 16, 10).cast("long")
        four = h.substr(pos + 8, F.lit(8))
        stop = done | (size_b < 8)
        is_container = four.isin(*_CONTAINERS)
        v0 = h.substr(pos + 16, F.lit(2)) == "00"

        is_mvhd = ~done & (four == F.lit(_MVHD)) & v0
        is_tkhd = ~done & (four == F.lit(_TKHD)) & v0
        is_stsd = ~done & (four == F.lit(_STSD))
        tw = F.floor(
            F.conv(h.substr(pos + 168, F.lit(8)), 16, 10).cast("long") / 65536
        ).cast("long")
        th = F.floor(
            F.conv(h.substr(pos + 176, F.lit(8)), 16, 10).cast("long") / 65536
        ).cast("long")
        fc = F.decode(F.unhex(h.substr(pos + 40, F.lit(8))), "UTF-8")
        video_hit = is_stsd & (acc["lw"] > 0) & acc["vc"].isNull()
        audio_hit = is_stsd & (acc["lw"] == 0) & acc["ac"].isNull()

        return F.struct(
            F.when(stop, pos)
            .when(is_container, pos + 16)
            .otherwise(pos + size_b * 2)
            .cast("long")
            .alias("pos"),
            F.when(is_mvhd, F.conv(h.substr(pos + 40, F.lit(8)), 16, 10).cast("long"))
            .otherwise(acc["ts"]).alias("ts"),
            F.when(is_mvhd, F.conv(h.substr(pos + 48, F.lit(8)), 16, 10).cast("long"))
            .otherwise(acc["dur"]).alias("dur"),
            # ntrk keeps the full `stop` guard: on an invalid-size
            # stop the cursor freezes, and a frozen 'trak' fourcc
            # must not re-count every remaining iteration (the other
            # recorders are idempotent or once-only; a counter isn't)
            (acc["ntrk"] + F.when(~stop & (four == F.lit(_TRAK)), 1).otherwise(0))
            .cast("int").alias("ntrk"),
            F.when(is_tkhd, tw).otherwise(acc["lw"]).alias("lw"),
            F.when(is_tkhd, th).otherwise(acc["lh"]).alias("lh"),
            F.when(video_hit, acc["lw"]).otherwise(acc["w"]).alias("w"),
            F.when(video_hit, acc["lh"]).otherwise(acc["hh"]).alias("hh"),
            F.when(video_hit, fc).otherwise(acc["vc"]).alias("vc"),
            F.when(audio_hit, fc).otherwise(acc["ac"]).alias("ac"),
            (acc["nbox"] + F.when(stop, 0).otherwise(1)).cast("int").alias("nbox"),
        )

    state = F.aggregate(F.sequence(F.lit(1), F.lit(MP4_MAX_BOXES)), init, step)
    media = media.select("media_id", "_h", state.alias("_s"))
    hh, s = F.col("_h"), F.col("_s")
    is_mp4 = (F.length(hh) >= 32) & (hh.substr(F.lit(9), F.lit(8)) == _FTYP)
    g = lambda c: F.when(is_mp4, c)  # noqa: E731  — field gate, JPEG rule
    ts, dur = s["ts"], s["dur"]
    return media.select(
        "media_id",
        is_mp4.alias("is_mp4"),
        g(F.decode(F.unhex(hh.substr(F.lit(17), F.lit(8))), "UTF-8")).alias("major_brand"),
        g(ts).alias("timescale"),
        g(dur).alias("duration"),
        # exact integer ms: (dur*1000 - mod) / ts is an exact IEEE
        # division (numerator divisible), engine-identical with
        # DuckDB's integer //
        g(((dur * 1000 - F.pmod(dur * 1000, ts)) / ts).cast("long")).alias(
            "duration_ms"
        ),
        g(s["ntrk"].cast("long")).alias("n_tracks"),
        g(s["w"]).alias("width"),
        g(s["hh"]).alias("height"),
        g(s["vc"]).alias("video_codec"),
        g(s["ac"]).alias("audio_codec"),
        g(s["nbox"].cast("long")).alias("n_boxes"),
    )
