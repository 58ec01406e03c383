"""MP3 / ID3v2 decoder-free probe (G20).

The audio sibling of the MP4 box walk (mp4_probe.py): route a media
lake's MP3 column by tag size, MPEG version/layer, bitrate and
sample rate WITHOUT any audio decode. Layouts are public
(id3.org ID3v2.3 spec; the MPEG-1 audio frame header):

- ID3v2 header: 'ID3' + version(2) + flags(1) + size(4) where size
  is a SYNCSAFE 28-bit integer (high bit of every byte clear) so tag
  bytes can never alias a frame sync.
- MPEG frame header (4 bytes, after the tag): 11 sync bits, then
  version (2b), layer (2b), protection (1b) / bitrate index (4b),
  sample-rate index (2b), padding (1b), ... — bitrate/sample-rate
  resolve through fixed public tables; frame length =
  144 * bitrate / sample_rate + padding for Layer III.

Everything is fixed-offset hex reads + literal-array lookups — no
bounded fold even needed (the ID3 size field tells us exactly where
the frame header sits), so unlike the MP4 walk this probe stays
inside whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.operators.multimodal import _hbe

__all__ = ["synthesize_mp3_headers", "parse_mp3_headers"]

#: MPEG-1 Layer III bitrate table (kbps); header index 1-14
BITRATES_V1L3 = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
#: MPEG-1 sample-rate table; header index 0-2 (3 reserved)
SAMPLE_RATES_V1 = (44100, 48000, 32000)


def _syncsafe_hex(n):
    """28-bit value -> 4 syncsafe bytes (7 bits each, high bit 0)."""
    b0 = (n / (1 << 21)).cast("long") % 128
    b1 = (n / (1 << 14)).cast("long") % 128
    b2 = (n / (1 << 7)).cast("long") % 128
    b3 = n % 128
    return F.concat(_hbe(b0, 1), _hbe(b1, 1), _hbe(b2, 1), _hbe(b3, 1))


def synthesize_mp3_headers(events: DataFrame) -> DataFrame:
    """Deterministic MP3 payloads: ID3v2.3 header + tag padding of a
    per-row syncsafe size, then one valid MPEG-1 Layer III frame
    header (bitrate/sample-rate/padding varying per row) and a few
    placeholder audio bytes. Only (media_id, payload) survive."""
    n_shuffle = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    events = events.repartition(n_shuffle, "event_id")
    eid, uid = F.col("event_id"), F.col("user_id")
    tag_sz = eid % 200 + 10
    br_idx = (eid % 14 + 1).cast("int")
    sr_idx = (uid % 3).cast("int")
    pad = (eid % 2).cast("int")
    id3 = F.concat(
        F.lit("494433"),      # 'ID3'
        F.lit("0300"),        # v2.3.0
        F.lit("00"),          # flags
        _syncsafe_hex(tag_sz),
        F.repeat(F.lit("00"), tag_sz.cast("int")),
    )
    # frame header: FF FB = sync + MPEG1 + Layer III + no CRC; then
    # bitrate(4) + samplerate(2) + padding(1) + private(1); then
    # mode/extension byte
    b2 = br_idx * 16 + sr_idx * 4 + pad * 2
    frame = F.concat(F.lit("FFFB"), _hbe(b2, 1), F.lit("00"))
    return events.select(
        eid.alias("media_id"),
        F.unhex(F.concat(id3, frame, F.lit("00" * 8))).alias("payload"),
    )


def parse_mp3_headers(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Fixed-offset probe: syncsafe tag size -> frame header at
    10 + size -> table lookups. Invalid sync / reserved table
    indices yield null fields (never a crash); only MPEG-1 Layer III
    (the ubiquitous case) resolves bitrate — other version/layer
    combinations report version/layer with null rate fields."""
    media = media.select("media_id", F.hex(F.col(payload_col)).alias("_h"))
    h = F.col("_h")
    byte = lambda i: F.conv(h.substr(i, F.lit(2)), 16, 10).cast("long")  # noqa: E731
    is_mp3 = (F.length(h) >= 20) & (h.substr(F.lit(1), F.lit(6)) == "494433")
    tag_sz = (
        byte(F.lit(13)) * (1 << 21)
        + byte(F.lit(15)) * (1 << 14)
        + byte(F.lit(17)) * (1 << 7)
        + byte(F.lit(19))
    )
    fh = tag_sz * 2 + 21  # 1-indexed hex pos of the frame header
    hdr0 = byte(fh)
    hdr1 = byte(fh + 2)
    hdr2 = byte(fh + 4)
    sync_ok = (hdr0 == 255) & ((hdr1 / 32).cast("long") % 8 == 7)
    version_bits = (hdr1 / 8).cast("long") % 4   # 3 = MPEG-1
    layer_bits = (hdr1 / 2).cast("long") % 4     # 1 = Layer III
    br_idx = (hdr2 / 16).cast("long")
    sr_idx = (hdr2 / 4).cast("long") % 4
    pad = (hdr2 / 2).cast("long") % 2
    is_v1l3 = sync_ok & (version_bits == 3) & (layer_bits == 1)
    valid_tables = is_v1l3 & br_idx.between(1, 14) & (sr_idx <= 2)
    bitrate = F.element_at(
        F.array(*[F.lit(b) for b in BITRATES_V1L3]), br_idx.cast("int")
    ).cast("long")
    rate = F.element_at(
        F.array(*[F.lit(r) for r in SAMPLE_RATES_V1]), (sr_idx + 1).cast("int")
    ).cast("long")
    frame_bytes = (
        (144000 * bitrate - F.pmod(144000 * bitrate, rate)) / rate
    ).cast("long") + pad
    g = lambda c: F.when(is_mp3, c)  # noqa: E731
    gv = lambda c: F.when(is_mp3 & valid_tables, c)  # noqa: E731
    return media.select(
        "media_id",
        is_mp3.alias("is_mp3"),
        g(tag_sz).alias("tag_bytes"),
        g(
            F.when(sync_ok & (version_bits == 3), 1)
            .when(sync_ok & (version_bits == 2), 2)
            .when(sync_ok & (version_bits == 0), 25)  # MPEG-2.5 x10
        ).cast("int").alias("mpeg_version"),
        g(
            F.when(sync_ok & (layer_bits == 1), 3)
            .when(sync_ok & (layer_bits == 2), 2)
            .when(sync_ok & (layer_bits == 3), 1)
        ).cast("int").alias("layer"),
        gv(bitrate).alias("bitrate_kbps"),
        gv(rate).alias("sample_rate"),
        gv(frame_bytes).alias("frame_bytes"),
    )


# ---------------------------------------------------------------------------
# G23: ID3v2.3 text-frame extraction — read the tag, not just hop it

#: fold bound: synthesized tags carry <= 5 frames; hostile tags stop
#: on padding/invalid sizes long before this
ID3_MAX_FRAMES = 8

#: the four standard text frames a media library indexes on
_TIT2, _TPE1, _TALB, _TRCK = "54495432", "54504531", "54414C42", "5452434B"


def synthesize_id3_frames(events: DataFrame) -> DataFrame:
    """MP3 payloads whose ID3v2.3 tag carries REAL text frames
    (TIT2/TPE1/TALB/TRCK — title/artist/album/track, the public
    id3.org v2.3 frame layout: 4-char id + 4-byte big-endian size +
    2 flag bytes + 0x00 latin-1 encoding marker + text), variable
    padding, then one valid MPEG frame header. Every string derives
    from event_id/user_id so the oracle re-derives it."""
    n_shuffle = int(
        events.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    events = events.repartition(n_shuffle, "event_id")
    eid, uid = F.col("event_id"), F.col("user_id")

    def text_frame(fourcc_hex: str, txt):
        body_len = F.length(txt) + 1  # + encoding byte
        return F.concat(
            F.lit(fourcc_hex),
            _hbe(body_len, 4),      # v2.3 frame size: plain BE
            F.lit("0000"),          # flags
            F.lit("00"),            # encoding: latin-1
            F.hex(F.encode(txt, "UTF-8")),
        )

    title = F.concat(F.lit("Track "), (eid % 1000).cast("string"))
    artist = F.concat(F.lit("Artist "), (uid % 50).cast("string"))
    album = F.concat(F.lit("Album "), ((eid + uid) % 20).cast("string"))
    track = (eid % 12 + 1).cast("string")
    frames = F.concat(
        text_frame(_TIT2, title),
        text_frame(_TPE1, artist),
        text_frame(_TALB, album),
        text_frame(_TRCK, track),
    )
    pad = (eid % 5).cast("int") * 2
    tag_sz = (F.length(frames) + pad).cast("long") / 2
    id3 = F.concat(
        F.lit("494433"),  # 'ID3'
        F.lit("0300"),    # v2.3.0
        F.lit("00"),      # flags
        _syncsafe_hex(tag_sz),
        frames,
        F.repeat(F.lit("00"), pad),
    )
    mpeg = F.concat(F.lit("FFFB"), _hbe(F.lit(0xA4), 1), F.lit("00"))
    return events.select(
        eid.alias("media_id"),
        F.unhex(F.concat(id3, mpeg, F.lit("00" * 4))).alias("payload"),
    )


_ID3_SCHEMA = (
    "media_id LONG, is_id3 BOOLEAN, tag_bytes LONG, n_frames INT, "
    "title STRING, artist STRING, album STRING, track STRING"
)


def _id3_walk_one(raw: bytes) -> tuple:
    """Python twin of the Catalyst ID3 fold (r11) — the ebml_probe
    discipline: Spark substr/conv semantics via the shared helpers,
    three-valued stop logic, the NULL-pos freeze (where `stop` goes
    NULL the fold's otherwise(1) keeps counting frames — replicated),
    lazy strict UTF-8 decode only when a slot records. Pinned by a
    differential fuzz pytest against `_parse_id3_frames_catalyst`."""
    from timescaledb_event_streamer_spark.operators.ebml_probe import (
        _conv16,
        _substr,
    )

    h = raw.hex().upper()
    hl = len(h)
    is_id3 = hl >= 20 and h[0:6] == "494433"

    def byte(p):
        return _conv16(_substr(h, p, 2))

    b13, b15, b17, b19 = byte(13), byte(15), byte(17), byte(19)
    tag_sz = (
        None
        if None in (b13, b15, b17, b19)
        else (b13 << 21) + (b15 << 14) + (b17 << 7) + b19
    )
    bound = None if tag_sz is None else tag_sz * 2 + 21
    pos: int | None = 21
    nf = 0
    slots = {"title": None, "artist": None, "album": None, "trck": None}
    for step_i in range(ID3_MAX_FRAMES):
        if pos is None:
            # stop stays NULL from here on: when(stop, 0).otherwise(1)
            # fires every remaining step, nothing else changes
            nf += ID3_MAX_FRAMES - step_i
            break
        fid = _substr(h, pos, 8)
        size_b = _conv16(_substr(h, pos + 8, 8))
        first = byte(pos)
        valid_id = (
            None
            if first is None
            else (65 <= first <= 90) or (48 <= first <= 57)
        )
        parts = (
            None if bound is None else (pos + 20 > bound),
            None if valid_id is None else (not valid_id),
            None if size_b is None else (size_b <= 0),
            None
            if (size_b is None or bound is None)
            else (pos + 20 + size_b * 2 > bound),
        )
        stop = (
            True
            if any(v is True for v in parts)
            else (None if any(v is None for v in parts) else False)
        )
        lat = byte(pos + 20)
        latin1 = None if lat is None else lat == 0

        def txt():
            if latin1 is not True:
                return None
            l2 = None if size_b is None else (size_b - 1) * 2
            s = _substr(h, pos + 22, l2)
            if s is None:
                return None
            if s == "":
                return ""
            if len(s) % 2:
                s = "0" + s
            # strict decode == ANSI decode(): invalid UTF-8 fails the
            # row in both implementations
            return bytes.fromhex(s).decode("utf-8")

        if stop is False:
            for fourcc, slot in (
                (_TIT2, "title"), (_TPE1, "artist"),
                (_TALB, "album"), (_TRCK, "trck"),
            ):
                if fid == fourcc and slots[slot] is None:
                    slots[slot] = txt()
        if stop is not True:
            nf += 1
            pos = None if size_b is None else pos + 20 + size_b * 2
        else:
            break  # fixpoint: same inputs, same stop, nf adds 0
    if not is_id3:
        return (False, None, None, None, None, None, None)
    return (
        True, tag_sz, nf,
        slots["title"], slots["artist"], slots["album"], slots["trck"],
    )


def parse_id3_frames(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Walk the v2.3 frame list: each step reads the 4-char frame id
    and 4-byte big-endian size, records TIT2/TPE1/TALB/TRCK latin-1
    text, and advances by 10 + size bytes; a zero/invalid id byte
    (padding), a size that runs past the declared tag end, or the
    tag end itself stops the walk, so hostile length fields cannot
    loop. Only encoding 0x00 (latin-1/ASCII) text is decoded —
    frames with other encodings count but read as null (an honest
    gate, not a misread). Runs as the Arrow-batched `_id3_walk_one`
    seam (r11); semantics pinned to the retained Catalyst fold twin
    by a differential fuzz pytest."""
    import pandas as _pd

    src = media.select("media_id", F.col(payload_col).alias("payload"))

    def walk(batches):
        for pdf in batches:
            rows = [
                (int(mid), *_id3_walk_one(bytes(p)))
                for mid, p in zip(pdf["media_id"], pdf["payload"])
            ]
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id", "is_id3", "tag_bytes", "n_frames",
                    "title", "artist", "album", "track",
                ],
                dtype=object,
            )

    return src.mapInPandas(walk, _ID3_SCHEMA)


def _parse_id3_frames_catalyst(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """The original interpreted Catalyst fold — kept as the reference
    twin for the differential fuzz test pinning `_id3_walk_one`."""
    media = media.select(
        "media_id", F.hex(F.col(payload_col)).alias("_h")
    )
    h = F.col("_h")
    byte = lambda p: F.conv(h.substr(p, F.lit(2)), 16, 10).cast("long")  # noqa: E731
    is_id3 = (F.length(h) >= 20) & (
        h.substr(F.lit(1), F.lit(6)) == "494433"
    )
    tag_sz = (
        byte(F.lit(13)) * (1 << 21)
        + byte(F.lit(15)) * (1 << 14)
        + byte(F.lit(17)) * (1 << 7)
        + byte(F.lit(19))
    )
    bound = tag_sz * 2 + 21  # first hex pos past the tag

    init = F.struct(
        F.lit(21).cast("long").alias("pos"),  # first frame (hex, 1-idx)
        F.lit(0).cast("int").alias("nf"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("artist"),
        F.lit(None).cast("string").alias("album"),
        F.lit(None).cast("string").alias("trck"),
    )

    def step(acc, _):
        pos = acc["pos"]
        fid = h.substr(pos, F.lit(8))
        size_b = F.conv(h.substr(pos + 8, F.lit(8)), 16, 10).cast("long")
        first = byte(pos)
        # uppercase A-Z or 0-9 starts a real frame id; 0x00 is padding
        valid_id = ((first >= 65) & (first <= 90)) | (
            (first >= 48) & (first <= 57)
        )
        stop = (
            (pos + 20 > bound)
            | ~valid_id
            | (size_b <= 0)
            | (pos + 20 + size_b * 2 > bound + 0)
        )
        latin1 = byte(pos + 20) == 0
        txt = F.when(
            latin1,
            F.decode(
                F.unhex(h.substr(pos + 22, (size_b - 1) * 2)), "UTF-8"
            ),
        )

        def rec(fourcc_hex: str, slot: str):
            hit = ~stop & (fid == F.lit(fourcc_hex)) & acc[slot].isNull()
            return F.when(hit, txt).otherwise(acc[slot]).alias(slot)

        return F.struct(
            F.when(stop, pos)
            .otherwise(pos + 20 + size_b * 2)
            .cast("long")
            .alias("pos"),
            (acc["nf"] + F.when(stop, 0).otherwise(1))
            .cast("int")
            .alias("nf"),
            rec(_TIT2, "title"),
            rec(_TPE1, "artist"),
            rec(_TALB, "album"),
            rec(_TRCK, "trck"),
        )

    state = F.aggregate(
        F.sequence(F.lit(1), F.lit(ID3_MAX_FRAMES)), init, step
    )
    media = media.select("media_id", "_h", state.alias("_s"), is_id3.alias("_ok"),
                         tag_sz.alias("_tsz"))
    s = F.col("_s")
    g = lambda c: F.when(F.col("_ok"), c)  # noqa: E731
    return media.select(
        "media_id",
        F.coalesce(F.col("_ok"), F.lit(False)).alias("is_id3"),
        g(F.col("_tsz")).alias("tag_bytes"),
        g(s["nf"]).alias("n_frames"),
        g(s["title"]).alias("title"),
        g(s["artist"]).alias("artist"),
        g(s["album"]).alias("album"),
        g(s["trck"]).alias("track"),
    )
