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

__all__ = [
    "EBML_MAX_ELEMENTS",
    "synthesize_ebml_headers",
    "parse_ebml_headers",
    "ebml_probe_roundtrip",
]

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


# -- Arrow-batched walk (r11) ----------------------------------------
#
# The walk ran as an interpreted Catalyst aggregate fold
# (EBML_MAX_ELEMENTS steps x ~30 string expressions per step, no
# codegen for higher-order lambdas) — measured ~110 us/row at sf0.1,
# 11.9s for the registered probe. The same walk over the same hex
# view in plain Python is ~8 us/row behind the sanctioned mapInPandas
# seam (the mp4_probe precedent, 8563fe3). `_substr`/`_conv16` below
# replicate Spark's substr/conv semantics exactly (1-based positions,
# pos 0 == pos 1, negative pos counts from the end, non-positive or
# past-end lengths -> '', empty string -> NULL) so every defensive
# stop, truncation freeze and null-propagation path of the fold is
# reproduced bit-for-bit — pinned by a differential fuzz test against
# `_parse_ebml_headers_catalyst` over hostile random payloads.

_MASTERS_SET = set(_MASTERS)

_PROBE_SCHEMA = (
    "media_id LONG, is_ebml BOOLEAN, doc_type STRING, "
    "timecode_scale LONG, n_tracks LONG, video_codec STRING, "
    "audio_codec STRING, width LONG, height LONG, n_elements LONG"
)


def _substr(s: str | None, pos: int | None, length: int | None) -> str | None:
    if s is None or pos is None or length is None:
        return None
    if length <= 0:
        return ""
    n = len(s)
    if pos > 0:
        start = pos - 1
    elif pos == 0:
        start = 0
    else:
        start = n + pos
        if start < 0:
            return ""
    if start >= n:
        return ""
    return s[start : start + length]


def _conv16(s: str | None) -> int | None:
    # conv(s, 16, 10): NULL on NULL/empty; our inputs are valid hex
    if not s:
        return None
    return int(s, 16)


def _id_len_of(b0: int | None) -> int:
    if b0 is None:
        return 0
    if b0 >= 128:
        return 1
    if b0 >= 64:
        return 2
    if b0 >= 32:
        return 3
    if b0 >= 16:
        return 4
    return 0


def _size_len_of(s0: int | None) -> int:
    if s0 is None:
        return 0
    for ln, th in enumerate((128, 64, 32, 16, 8, 4, 2, 1), start=1):
        if s0 >= th:
            return ln
    return 0


def _decode_hex_utf8(s: str) -> str:
    # unhex pads odd-length hex on the left; strict decode matches
    # the ANSI JVM decode() — invalid UTF-8 fails the row either way
    # (the mp4_probe precedent)
    if s == "":
        return ""
    if len(s) % 2:
        s = "0" + s
    return bytes.fromhex(s).decode("utf-8")


def _conv_checked(s: str | None) -> int | None:
    # conv(s,16,10).cast(long) under ANSI: conv raises past 2^64-1,
    # the long cast raises for [2^63, 2^64) — a hostile oversized
    # uint body fails the row in the seam exactly like the fold
    if not s:
        return None
    v = int(s, 16)
    if v >= 1 << 64:
        raise ArithmeticError("Overflow in function conv()")
    if v >= 1 << 63:
        raise ValueError(f"invalid cast to BIGINT: {v}")
    return v


def _ebml_walk_one(raw: bytes) -> tuple:
    # NOTE: the walk runs even for non-EBML payloads (the Catalyst
    # Project computed the fold state before the is_ebml mask, so a
    # malformed recorded field fails the row regardless of the
    # magic) — the final mask only nulls the OUTPUT columns
    h = raw.hex().upper()
    hex_len = len(h)
    pos: int | None = 1
    doc = tsc = vc = ac = w = hh = None
    ltype: int | None = 0
    ntrk = 0
    nel = 0
    for _ in range(EBML_MAX_ELEMENTS):
        done = None if pos is None else (pos + 1) > hex_len
        b0 = _conv16(_substr(h, pos, 2))
        id_len = _id_len_of(b0)
        idh = _substr(h, pos, id_len * 2)
        spos = None if pos is None else pos + id_len * 2
        s0 = _conv16(_substr(h, spos, 2))
        size_len = _size_len_of(s0)
        rawv = _conv16(_substr(h, spos, size_len * 2))
        size = None if rawv is None else rawv - (1 << (7 * size_len))
        ppos = None if spos is None else spos + size_len * 2
        # SQL three-valued OR: any True wins, else any NULL -> NULL
        stop_parts = (done, id_len == 0, size_len == 0)
        stop = (
            True
            if any(v is True for v in stop_parts)
            else (None if any(v is None for v in stop_parts) else False)
        )
        size2 = None if size is None else size * 2
        body_hex = _substr(h, ppos, size2)
        # uint_val / str_val are LAZY like Catalyst's CaseWhen branch
        # evaluation: decode/overflow errors fire only when a guard
        # actually records the field
        uintv = lambda: _conv_checked(body_hex)  # noqa: E731
        strv = lambda: None if body_hex is None else _decode_hex_utf8(body_hex)  # noqa: E731
        not_done = done is False
        is_codec = not_done and idh == _CODECID
        if not_done and idh == _DOCTYPE:
            doc = strv()
        if not_done and idh == _TIMECODESCALE:
            tsc = uintv()
        if stop is False and idh == _TRACKENTRY:
            ntrk += 1
        if not_done and idh == _TRACKTYPE:
            ltype = uintv()
        if is_codec and ltype == 1 and vc is None:
            vc = strv()
        if is_codec and ltype == 2 and ac is None:
            ac = strv()
        if not_done and idh == _PIXW and w is None:
            w = uintv()
        if not_done and idh == _PIXH and hh is None:
            hh = uintv()
        if stop is False:
            nel += 1
        if stop is True:
            break  # state is a fixpoint: same inputs, same guards
        if idh in _MASTERS_SET:
            pos = ppos
        else:
            pos = None if (ppos is None or size2 is None) else ppos + size2
            if pos is None:
                break  # next step stops via id_len == 0; all frozen
    if h[:8] != _EBML:
        return (False, None, None, None, None, None, None, None, None)
    return (True, doc, tsc, ntrk, vc, ac, w, hh, nel)


def parse_ebml_headers(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Bounded vint walk. Per step: decode the ID vint (1-4 bytes,
    marker kept), the size vint (1-8 bytes, value = parsed - 2^(7L)),
    then enter masters / skip leaves / record known leaves. A zero
    first byte (invalid vint) or an unknown-size marker on a leaf
    stops the walk defensively; the Segment's unknown-size form
    still walks because Segment is entered, not skipped. Runs as the
    Arrow-batched `_ebml_walk_one` seam (r11) — semantics pinned to
    the Catalyst fold twin by a differential fuzz test."""
    import pandas as _pd

    src = media.select("media_id", F.col(payload_col).alias("payload"))

    def walk(batches):
        for pdf in batches:
            rows = [
                (int(mid), *_ebml_walk_one(bytes(p)))
                for mid, p in zip(pdf["media_id"], pdf["payload"])
            ]
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id", "is_ebml", "doc_type", "timecode_scale",
                    "n_tracks", "video_codec", "audio_codec", "width",
                    "height", "n_elements",
                ],
                dtype=object,
            )

    return src.mapInPandas(walk, _PROBE_SCHEMA)


def _parse_ebml_headers_catalyst(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """The original interpreted Catalyst fold — kept as the reference
    twin for the differential fuzz test pinning `_ebml_walk_one`."""
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


# -- fused synth + walk (r11, the mp4_probe_roundtrip pattern) -------


def _vint(n: int, length: int) -> bytes:
    return (n | (1 << (7 * length))).to_bytes(length, "big")


def _pel(eid_hex: str, body: bytes, slen: int = 1) -> bytes:
    return bytes.fromhex(eid_hex) + _vint(len(body), slen) + body


def _ebml_synth_one(eid: int, uid: int) -> bytes:
    """Python twin of `synthesize_ebml_headers`'s column expression —
    byte-parity pinned in pytest."""
    doc = b"webm" if eid % 2 == 0 else b"matroska"
    header = _pel(
        _EBML, bytes.fromhex(_EBMLVER) + b"\x81\x01" + _pel(_DOCTYPE, doc)
    )
    tsc = (1_000_000, 500_000, 2_000_000)[uid % 3]
    info = _pel(_INFO, _pel(_TIMECODESCALE, tsc.to_bytes(3, "big")))
    width, height = uid % 1920 + 16, eid % 1080 + 16
    vcodec = b"V_VP8" if eid % 2 == 0 else b"V_VP9"
    video_entry = _pel(
        _TRACKENTRY,
        bytes.fromhex(_TRACKTYPE) + b"\x81\x01"
        + _pel(_CODECID, vcodec)
        + _pel(
            _VIDEO,
            bytes.fromhex(_PIXW) + b"\x82" + width.to_bytes(2, "big")
            + bytes.fromhex(_PIXH) + b"\x82" + height.to_bytes(2, "big"),
        ),
    )
    audio_entry = (
        _pel(
            _TRACKENTRY,
            bytes.fromhex(_TRACKTYPE) + b"\x81\x02"
            + _pel(_CODECID, b"A_OPUS")
            + _pel(_AUDIO, b""),
        )
        if eid % 2 == 1
        else b""
    )
    tracks = _pel(_TRACKS, video_entry + audio_entry)
    segment = _pel(_SEGMENT, info + tracks, slen=2)
    return header + segment


def ebml_probe_roundtrip(events: DataFrame) -> DataFrame:
    """Fused G21 path (r11): synthesize_ebml_headers >>
    parse_ebml_headers in ONE Arrow seam — the mp4_probe_roundtrip
    pattern. The two-stage form builds every payload through a large
    JVM hex-concat tree and ships it across the Arrow boundary;
    fusing synthesizes the SAME bytes in-task (`_ebml_synth_one`,
    byte-parity-pinned) and walks them immediately, so only the two
    generating longs cross JVM -> Python and only the 10 probe
    columns come back. Row-for-row identical to the composition —
    pinned by pytest parity on bytes AND rows."""
    import pandas as _pd

    n_shuffle = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    src = events.select(
        F.col("event_id").alias("media_id"), "user_id"
    ).repartition(n_shuffle, "media_id")

    def probe(batches):
        for pdf in batches:
            rows = [
                (int(eid), *_ebml_walk_one(_ebml_synth_one(int(eid), int(uid))))
                for eid, uid in zip(pdf["media_id"], pdf["user_id"])
            ]
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id", "is_ebml", "doc_type", "timecode_scale",
                    "n_tracks", "video_codec", "audio_codec", "width",
                    "height", "n_elements",
                ],
                dtype=object,
            )

    return src.mapInPandas(probe, _PROBE_SCHEMA)
