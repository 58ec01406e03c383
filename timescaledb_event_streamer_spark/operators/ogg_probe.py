"""Ogg container decoder-free probe (G22).

The third container family after ISO-BMFF (mp4_probe.py) and EBML
(ebml_probe.py): Ogg frames logical streams into PAGES (RFC 3533),
and the first packet of the first page of an audio stream is the
codec's identification header — "OpusHead" (RFC 7845 §5.1) or
"\\x01vorbis" (Vorbis I spec §4.2.2). Both layouts are public:

- Ogg page header: 'OggS' + version(1, must be 0) + header_type(1,
  bit 1 = beginning-of-stream) + granule(8 LE) + serial(4 LE) +
  page_seq(4 LE) + crc(4) + n_segments(1) + lacing table
  (n_segments bytes). The first packet starts right after the
  lacing table — a FIXED offset once n_segments is read, so the
  whole probe is dynamic-offset hex reads, no fold needed (the G20
  MP3 posture, not the G18/G21 walk).
- OpusHead: magic(8) + version(1) + channels(1) + preskip(2 LE) +
  input_rate(4 LE) + gain(2) + mapping_family(1).
- Vorbis id: packet_type 0x01 + 'vorbis' + version(4 LE, must be
  0) + channels(1) + rate(4 LE) + bitrate max/nominal/min(3x4 LE).

At 100 TB this routes an audio lake (codec inventory, channel/rate
pruning, transcode fleet sizing) at projection cost; the entropy-
coded audio payload is never touched (decode stays honestly
ffmpeg-gated for Vorbis/Opus, multimodal.py:147).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.operators.multimodal import _hbe, _hle

__all__ = ["synthesize_ogg_headers", "parse_ogg_headers"]

#: Vorbis sample-rate choices the synthesizer cycles through
_VORBIS_RATES = (44100, 48000, 32000)


def synthesize_ogg_headers(events: DataFrame) -> DataFrame:
    """Deterministic Ogg BOS pages: even event_ids carry an OpusHead
    identification packet, odd ones a Vorbis id packet. Only
    (media_id, payload) survive; every probed field derives from
    event_id/user_id so the oracle can re-derive it (G5
    adjudication)."""
    n_shuffle = int(
        events.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    events = events.repartition(n_shuffle, "event_id")
    eid, uid = F.col("event_id"), F.col("user_id")
    serial = uid % 100000 + 1
    channels = uid % 2 + 1
    preskip = eid % 1000 + 64
    nominal_bps = (eid % 320 + 32) * 1000
    rate_idx = uid % 3

    opus_pkt = F.concat(
        F.lit("4F70757348656164"),  # 'OpusHead'
        F.lit("01"),                # version 1
        _hbe(channels, 1),
        _hle(preskip, 2),
        _hle(F.lit(48000), 4),      # input sample rate (spec: 48k family)
        F.lit("0000"),              # output gain
        F.lit("00"),                # mapping family 0
    )  # 19 bytes
    vorbis_rate = F.element_at(
        F.array(*[F.lit(r) for r in _VORBIS_RATES]),
        (rate_idx + 1).cast("int"),
    )
    vorbis_pkt = F.concat(
        F.lit("01766F72626973"),    # 0x01 'vorbis'
        _hle(F.lit(0), 4),          # version 0
        _hbe(channels, 1),
        _hle(vorbis_rate, 4),
        _hle(F.lit(0), 4),          # bitrate max
        _hle(nominal_bps, 4),       # bitrate nominal
        _hle(F.lit(0), 4),          # bitrate min
        F.lit("B8"),                # blocksizes
        F.lit("01"),                # framing
    )  # 30 bytes
    pkt = F.when(eid % 2 == 0, opus_pkt).otherwise(vorbis_pkt)
    pkt_len = F.when(eid % 2 == 0, F.lit(19)).otherwise(F.lit(30))
    page = F.concat(
        F.lit("4F676753"),          # 'OggS'
        F.lit("00"),                # version 0
        F.lit("02"),                # header_type: BOS
        F.lit("00" * 8),            # granule position
        _hle(serial, 4),
        _hle(F.lit(0), 4),          # page sequence
        F.lit("00" * 4),            # crc (probe never checks it)
        F.lit("01"),                # one segment
        _hbe(pkt_len, 1),           # lacing: packet length
        pkt,
    )
    return events.select(
        eid.alias("media_id"), F.unhex(page).alias("payload")
    )


def parse_ogg_headers(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Dynamic-offset probe: n_segments (byte 27) positions the
    first packet right after the lacing table; the packet magic
    dispatches Opus vs Vorbis field reads. Truncated or foreign
    payloads yield is_ogg=false / null fields, never an error —
    conv('') parses as 0 and the magic compares fail."""
    media = media.select(
        "media_id", F.hex(F.col(payload_col)).alias("_h")
    )
    h = F.col("_h")

    def byte(pos):
        # pos: 1-indexed BYTE position as a Column or int
        hexpos = F.lit(pos * 2 - 1) if isinstance(pos, int) else pos * 2 - 1
        return F.conv(h.substr(hexpos, F.lit(2)), 16, 10).cast("long")

    def le(pos, nbytes: int):
        out = None
        for k in range(nbytes):
            term = byte(pos + k)
            if k:
                term = term * (1 << (8 * k))
            out = term if out is None else out + term
        return out

    def ascii_at(pos, nbytes: int):
        return h.substr(pos * 2 - 1, F.lit(2 * nbytes))

    is_ogg = (F.length(h) >= 56) & (
        h.substr(F.lit(1), F.lit(8)) == "4F676753"
    ) & (byte(5) == 0)
    htype = byte(6)
    serial = le(F.lit(15), 4)
    page_seq = le(F.lit(19), 4)
    n_segs = byte(27)
    # first packet begins after the 27-byte header + lacing table
    pkt = n_segs + 28  # 1-indexed byte position (Column)
    magic8 = ascii_at(pkt, 8)
    magic7 = ascii_at(pkt, 7)
    is_opus = magic8 == "4F70757348656164"
    is_vorbis = magic7 == "01766F72626973"
    opus_ver = byte(pkt + 8)
    vorbis_ver = le(pkt + 7, 4)
    codec = F.when(is_opus & (opus_ver == 1), "opus").when(
        is_vorbis & (vorbis_ver == 0), "vorbis"
    )
    channels = F.when(is_opus, byte(pkt + 9)).when(
        is_vorbis, byte(pkt + 11)
    )
    sample_rate = F.when(is_opus, le(pkt + 12, 4)).when(
        is_vorbis, le(pkt + 12, 4)
    )
    preskip = F.when(is_opus, le(pkt + 10, 2))
    nominal = F.when(is_vorbis, le(pkt + 20, 4))
    g = lambda c: F.when(is_ogg, c)  # noqa: E731
    gc = lambda c: F.when(is_ogg & codec.isNotNull(), c)  # noqa: E731
    return media.select(
        "media_id",
        F.coalesce(is_ogg, F.lit(False)).alias("is_ogg"),
        g((htype / 2).cast("long") % 2 == 1).alias("is_bos"),
        g(serial).alias("serial"),
        g(page_seq).alias("page_seq"),
        g(n_segs).alias("n_segments"),
        g(codec).alias("codec"),
        gc(channels).alias("channels"),
        gc(sample_rate).alias("sample_rate"),
        gc(preskip).alias("preskip"),
        gc(nominal).alias("bitrate_nominal_bps"),
    )
