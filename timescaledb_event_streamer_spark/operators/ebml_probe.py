"""WebM / Matroska (EBML) decoder-free probe (G21).

The second major video container after ISO-BMFF (mp4_probe.py).
EBML (RFC 8794, the public Matroska/WebM framing) differs from MP4's
fixed u32 sizes in one essential way: element IDs and sizes are
VARIABLE-LENGTH integers — the leading 1-bit of the first byte gives
the length (1000xxxx = 1 byte, 01xx = 2, 001x = 3, ...), and a size
vint's value is the parsed integer minus its marker bit 2^(7*len).
The walk is therefore a bounded fold like the MP4 box walk, but each
step parses two vints before classifying: master elements (EBML
header, Segment, Info, Tracks, TrackEntry, Video, Audio) are
ENTERED, leaves are skipped by their decoded size, and DocType /
TimecodeScale / TrackType / CodecID / PixelWidth / PixelHeight are
recorded. Entirely JVM-side, zero Python per row (interpreted
Catalyst HOF, the mp4_probe cost model); Cluster/Block data is never
touched — probing cost is header bytes only.

IDs used (hex, marker bit kept — the RFC compares IDs raw):
EBML 1A45DFA3, DocType 4282, EBMLVersion 4286, Segment 18538067,
Info 1549A966, TimecodeScale 2AD7B1, Tracks 1654AE6B, TrackEntry AE,
TrackType 83 (1=video 2=audio), CodecID 86, Video E0, Audio E1,
PixelWidth B0, PixelHeight BA.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.operators.multimodal import _hbe

__all__ = ["EBML_MAX_ELEMENTS", "synthesize_ebml_headers", "parse_ebml_headers"]

#: fold bound: the synthesized worst case visits 16 elements; real
#: WebM puts Info/Tracks within the first handful of Segment children
EBML_MAX_ELEMENTS = 20

_EBML, _SEGMENT, _INFO, _TRACKS = "1A45DFA3", "18538067", "1549A966", "1654AE6B"
_TRACKENTRY, _TRACKTYPE, _CODECID = "AE", "83", "86"
_VIDEO, _AUDIO, _PIXW, _PIXH = "E0", "E1", "B0", "BA"
_TIMECODESCALE, _DOCTYPE, _EBMLVER = "2AD7B1", "4282", "4286"
_MASTERS = [_EBML, _SEGMENT, _INFO, _TRACKS, _TRACKENTRY, _VIDEO, _AUDIO]

_hx = lambda s: s.encode("ascii").hex().upper()  # noqa: E731


def _v1(size_col):
    """1-byte size vint (size <= 126): 0x80 | size."""
    return _hbe(size_col + 128, 1)


def _el(id_hex: str, body_hex, vint2: bool = False):
    """id + size-vint + body; body length derived from the hex."""
    size = (F.length(body_hex) / 2).cast("long")
    size_hex = _hbe(size + 16384, 2) if vint2 else _v1(size)
    return F.concat(F.lit(id_hex), size_hex, body_hex)


def synthesize_ebml_headers(events: DataFrame) -> DataFrame:
    """Deterministic WebM/Matroska header payloads: EBML header
    (version + per-row DocType), Segment (2-BYTE size vint — the
    walk must decode multi-byte vints, not just 0x80|n) > Info
    (TimecodeScale, 3-byte uint) + Tracks with 1-2 TrackEntry trees
    (video: type/codec/Video>PixelWidth/Height; audio: type/codec).
    Only (media_id, payload) survive."""
    n_shuffle = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    events = events.repartition(n_shuffle, "event_id")
    eid, uid = F.col("event_id"), F.col("user_id")

    doc = F.when(eid % 2 == 0, F.lit(_hx("webm"))).otherwise(
        F.lit(_hx("matroska"))
    )
    header = _el(
        _EBML,
        F.concat(
            F.lit(_EBMLVER), F.lit("81"), F.lit("01"),
            _el(_DOCTYPE, doc),
        ),
    )
    tsc = F.element_at(
        F.array(F.lit(1_000_000), F.lit(500_000), F.lit(2_000_000)),
        (uid % 3 + 1).cast("int"),
    )
    info = _el(_INFO, _el(_TIMECODESCALE, _hbe(tsc, 3)))
    width, height = uid % 1920 + 16, eid % 1080 + 16
    vcodec = F.when(eid % 2 == 0, F.lit(_hx("V_VP8"))).otherwise(
        F.lit(_hx("V_VP9"))
    )
    video_entry = _el(
        _TRACKENTRY,
        F.concat(
            F.lit(_TRACKTYPE), F.lit("81"), F.lit("01"),
            _el(_CODECID, vcodec),
            _el(
                _VIDEO,
                F.concat(
                    F.lit(_PIXW), F.lit("82"), _hbe(width, 2),
                    F.lit(_PIXH), F.lit("82"), _hbe(height, 2),
                ),
            ),
        ),
    )
    audio_entry = F.when(
        eid % 2 == 1,
        _el(
            _TRACKENTRY,
            F.concat(
                F.lit(_TRACKTYPE), F.lit("81"), F.lit("02"),
                _el(_CODECID, F.lit(_hx("A_OPUS"))),
                _el(_AUDIO, F.lit("")),
            ),
        ),
    ).otherwise(F.lit(""))
    tracks = _el(_TRACKS, F.concat(video_entry, audio_entry))
    segment = _el(_SEGMENT, F.concat(info, tracks), vint2=True)
    return events.select(
        eid.alias("media_id"),
        F.unhex(F.concat(header, segment)).alias("payload"),
    )


def parse_ebml_headers(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Bounded vint walk. Per step: decode the ID vint (1-4 bytes,
    marker kept), the size vint (1-8 bytes, value = parsed - 2^(7L)),
    then enter masters / skip leaves / record known leaves. A zero
    first byte (invalid vint) or an unknown-size marker on a leaf
    stops the walk defensively; the Segment's unknown-size form
    still walks because Segment is entered, not skipped."""
    media = media.select("media_id", F.hex(F.col(payload_col)).alias("_h"))
    h = F.col("_h")

    init = F.struct(
        F.lit(1).cast("long").alias("pos"),
        F.lit(None).cast("string").alias("doc"),
        F.lit(None).cast("long").alias("tsc"),
        F.lit(0).cast("int").alias("ntrk"),
        F.lit(0).cast("long").alias("ltype"),
        F.lit(None).cast("string").alias("vc"),
        F.lit(None).cast("string").alias("ac"),
        F.lit(None).cast("long").alias("w"),
        F.lit(None).cast("long").alias("hh"),
        F.lit(0).cast("int").alias("nel"),
    )

    def byte_at(p):
        return F.conv(h.substr(p, F.lit(2)), 16, 10).cast("long")

    def step(acc, _):
        pos = acc["pos"]
        done = (pos + 1) > F.length(h)
        b0 = byte_at(pos)
        id_len = (
            F.when(b0 >= 128, 1)
            .when(b0 >= 64, 2)
            .when(b0 >= 32, 3)
            .when(b0 >= 16, 4)
            .otherwise(0)
            .cast("long")
        )
        idh = h.substr(pos, (id_len * 2).cast("int"))
        spos = pos + id_len * 2
        s0 = byte_at(spos)
        size_len = (
            F.when(s0 >= 128, 1)
            .when(s0 >= 64, 2)
            .when(s0 >= 32, 3)
            .when(s0 >= 16, 4)
            .when(s0 >= 8, 5)
            .when(s0 >= 4, 6)
            .when(s0 >= 2, 7)
            .when(s0 >= 1, 8)
            .otherwise(0)
            .cast("long")
        )
        raw = F.conv(h.substr(spos, (size_len * 2).cast("int")), 16, 10).cast(
            "long"
        )
        # 2^(7L) marker bit; exact in double up to L=8 (2^56)
        size = raw - F.pow(F.lit(2.0), (7 * size_len).cast("double")).cast("long")
        ppos = spos + size_len * 2
        stop = done | (id_len == 0) | (size_len == 0)
        is_master = idh.isin(*_MASTERS)
        uint_val = F.conv(h.substr(ppos, (size * 2).cast("int")), 16, 10).cast(
            "long"
        )
        str_val = F.decode(
            F.unhex(h.substr(ppos, (size * 2).cast("int"))), "UTF-8"
        )
        is_codec = ~done & (idh == _CODECID)
        video_hit = is_codec & (acc["ltype"] == 1) & acc["vc"].isNull()
        audio_hit = is_codec & (acc["ltype"] == 2) & acc["ac"].isNull()

        return F.struct(
            F.when(stop, pos)
            .when(is_master, ppos)
            .otherwise(ppos + size * 2)
            .cast("long")
            .alias("pos"),
            F.when(~done & (idh == _DOCTYPE), str_val)
            .otherwise(acc["doc"]).alias("doc"),
            F.when(~done & (idh == _TIMECODESCALE), uint_val)
            .otherwise(acc["tsc"]).alias("tsc"),
            (acc["ntrk"] + F.when(~stop & (idh == _TRACKENTRY), 1).otherwise(0))
            .cast("int").alias("ntrk"),
            F.when(~done & (idh == _TRACKTYPE), uint_val)
            .otherwise(acc["ltype"]).alias("ltype"),
            F.when(video_hit, str_val).otherwise(acc["vc"]).alias("vc"),
            F.when(audio_hit, str_val).otherwise(acc["ac"]).alias("ac"),
            F.when(~done & (idh == _PIXW) & acc["w"].isNull(), uint_val)
            .otherwise(acc["w"]).alias("w"),
            F.when(~done & (idh == _PIXH) & acc["hh"].isNull(), uint_val)
            .otherwise(acc["hh"]).alias("hh"),
            (acc["nel"] + F.when(stop, 0).otherwise(1)).cast("int").alias("nel"),
        )

    state = F.aggregate(F.sequence(F.lit(1), F.lit(EBML_MAX_ELEMENTS)), init, step)
    media = media.select("media_id", "_h", state.alias("_s"))
    s = F.col("_s")
    is_ebml = F.col("_h").substr(F.lit(1), F.lit(8)) == _EBML
    g = lambda c: F.when(is_ebml, c)  # noqa: E731
    return media.select(
        "media_id",
        is_ebml.alias("is_ebml"),
        g(s["doc"]).alias("doc_type"),
        g(s["tsc"]).alias("timecode_scale"),
        g(s["ntrk"].cast("long")).alias("n_tracks"),
        g(s["vc"]).alias("video_codec"),
        g(s["ac"]).alias("audio_codec"),
        g(s["w"]).alias("width"),
        g(s["hh"]).alias("height"),
        g(s["nel"].cast("long")).alias("n_elements"),
    )
