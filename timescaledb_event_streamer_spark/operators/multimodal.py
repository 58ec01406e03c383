"""Multimodal column plumbing (SURVEY.md §2.G): image/audio/video as
opaque binary columns with typed metadata, processed by Arrow-batched
mapInPandas.

Decode support is per-codec: `decoder="real"` runs ACTUAL PIXELS for
all four image containers, routed by magic bytes — PNG via
operators/png_codec.py (zlib + scanline filters, r6), JPEG via
operators/jpeg_codec.py (baseline SOF0 r7 + progressive SOF2 r8:
Huffman, dequant, IDCT, spectral selection + successive
approximation), GIF via operators/gif_codec.py (variable-width LZW +
interlace, r7), BMP via operators/bmp_codec.py (uncompressed BI_RGB
8/24/32-bit, both orientations, r8), TIFF via operators/tiff_codec.py
(baseline uncompressed strips, both byte orders, r8). Video/audio
entropy coders genuinely need a codec
library (ffmpeg/torchaudio, absent in this container), so those
payloads under `decoder="real"` raise at the exact seam where codecs
plug in.
`decoder="stub"` remains the deterministic fake that exercises
schema, binary Arrow transport, batch shapes and partition-parallel
extraction for every modality.

Scale notes: payloads stay opaque bytes end to end (no base64 blow-
up, no driver collection); mapInPandas streams Arrow record batches
so executor memory is bounded by batch size, not partition size —
the layout that holds for 100 TB of media shards.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ("image", "audio", "video")

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "media_id LONG, kind STRING, payload BINARY, width INT, height INT, duration_ms INT"
)

FEATURES_SCHEMA = (
    "media_id LONG, kind STRING, n_bytes LONG, sha256 STRING, features ARRAY<FLOAT>"
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Derive an opaque media table from `documents` (deterministic
    stand-in payloads: the utf-8 bytes of the text). Metadata columns
    are typed the way a real ingest would carry them."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.pmod(F.col("doc_id"), F.lit(len(MEDIA_KINDS))) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.pmod(F.col("doc_id"), F.lit(16)) * 64 + 64).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(9)) * 64 + 64).cast("int").alias("height"),
        (F.pmod(F.col("doc_id"), F.lit(30)) * 1000).cast("int").alias("duration_ms"),
    )


def _stub_features(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decode + embed': sha256 -> 8 floats."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(media: DataFrame, decoder: str = "stub") -> DataFrame:
    """Decode/feature-extract media payloads with mapInPandas.

    decoder="real" is the seam for actual codecs; it raises
    NotImplementedError here (libs absent) without touching the
    Spark plumbing around it.
    """
    if decoder not in ("stub", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if decoder == "real":
                # PNG decodes for real (pure-Python codec, r6); other
                # codecs stay environment-gated at this exact seam
                features = payloads.map(_real_image_features)
            else:
                features = payloads.map(lambda b: _stub_features(b).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "features": features,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def _real_decode_image(payload: bytes) -> np.ndarray:
    """Route a binary payload to its real pure-Python codec by magic
    bytes: PNG (png_codec, r6), JPEG (jpeg_codec, r7/r8), GIF
    (gif_codec, r7) or BMP (bmp_codec, r8). Anything else raises at
    the exact seam the remaining codecs (video/audio entropy coders)
    plug into."""
    from timescaledb_event_streamer_spark.operators.gif_codec import (
        GIF_MAGICS,
        gif_decode,
    )
    from timescaledb_event_streamer_spark.operators.jpeg_codec import (
        JPEG_SOI,
        jpeg_decode,
    )
    from timescaledb_event_streamer_spark.operators.png_codec import (
        PNG_SIGNATURE,
        png_decode,
    )

    from timescaledb_event_streamer_spark.operators.bmp_codec import (
        BMP_MAGIC,
        bmp_decode,
    )
    from timescaledb_event_streamer_spark.operators.tiff_codec import (
        TIFF_MAGICS,
        tiff_decode,
    )

    raw = bytes(payload)
    if raw.startswith(PNG_SIGNATURE):
        return png_decode(raw)
    if raw.startswith(JPEG_SOI):
        return jpeg_decode(raw)
    if raw.startswith(GIF_MAGICS):
        return gif_decode(raw)
    if raw.startswith(BMP_MAGIC):
        return bmp_decode(raw)
    if raw.startswith(TIFF_MAGICS):
        return tiff_decode(raw)
    raise NotImplementedError(
        "real decode beyond PNG/JPEG/GIF/BMP/TIFF images (and WAV/AIFF/"
        "AU/FLAC audio via their codecs) requires a codec library for "
        "LOSSY formats (ffmpeg/torchaudio); plug it in here"
    )


def _real_image_features(payload: bytes) -> list:
    """Real pixel features for PNG and baseline-JPEG payloads: width,
    height, channels, per-image mean/std/min/max and mean
    |horizontal gradient| (an edge-density proxy) — the 8-float
    contract of the stub, computed from DECODED PIXELS. Other
    payloads raise at the codec seam."""
    img = _real_decode_image(payload)
    px = img.astype(np.float64)
    grad = np.abs(np.diff(px, axis=1)).mean() if img.shape[1] > 1 else 0.0
    return [
        float(img.shape[1]),
        float(img.shape[0]),
        float(img.shape[2]),
        float(px.mean()),
        float(px.std()),
        float(px.min()),
        float(px.max()),
        float(grad),
    ]


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image-resize plumbing: target dimensions are pure JVM metadata
    arithmetic (preserve aspect ratio, cap the long side), so the
    plan carries (payload, target_w, target_h) into the decode seam —
    the actual pixel work belongs in resize_images."""
    image = media.filter(F.col("kind") == "image")
    scale = F.lit(float(max_side)) / F.greatest("width", "height")
    clamped = F.least(scale, F.lit(1.0))  # never upscale
    return image.select(
        "media_id",
        "payload",
        "width",
        "height",
        F.greatest(F.round(F.col("width") * clamped).cast("int"), F.lit(1)).alias(
            "target_w"
        ),
        F.greatest(F.round(F.col("height") * clamped).cast("int"), F.lit(1)).alias(
            "target_h"
        ),
    )


def resize_images(media: DataFrame, max_side: int = 256, decoder: str = "stub") -> DataFrame:
    """Resize via mapInPandas over resize_plan. decoder="real" is the
    PIL seam; the stub emits a deterministic payload whose length
    scales with the target area, preserving the binary-in/binary-out
    batch shape the real codec path uses."""
    if decoder not in ("stub", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    plan = resize_plan(media, max_side)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                # decode (PNG or baseline JPEG, routed by magic) ->
                # nearest resize -> re-encode as PNG (the lossless
                # intermediate: no in-repo JPEG encoder, and resized
                # training shards want a lossless container anyway);
                # other formats raise at the seam
                from timescaledb_event_streamer_spark.operators.png_codec import (
                    png_encode,
                    resize_nearest,
                )

                out = []
                for p, tw, th in zip(
                    pdf["payload"], pdf["target_w"], pdf["target_h"]
                ):
                    out.append(
                        png_encode(
                            resize_nearest(
                                _real_decode_image(bytes(p)), int(tw), int(th)
                            )
                        )
                    )
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "target_w": pdf["target_w"],
                        "target_h": pdf["target_h"],
                        "payload": out,
                    }
                )
                continue
            sizes = (pdf["target_w"] * pdf["target_h"] // 64 + 1).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "target_w": pdf["target_w"],
                    "target_h": pdf["target_h"],
                    "payload": [
                        bytes(p)[: int(s)].ljust(int(s), b"\0")
                        for p, s in zip(pdf["payload"], sizes)
                    ],
                }
            )

    return plan.mapInPandas(
        run, schema="media_id LONG, target_w INT, target_h INT, payload BINARY"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video payloads: one output row per
    sampled frame offset. The offsets come from metadata, so the
    expansion is pure JVM (`sequence` + `explode`) and the decode of
    each frame lands in extract_features' seam."""
    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_offset_ms"),
    )


# magic-byte signatures -> container format (hex prefixes of the
# payload; the container-sniffing pass every media ingest runs before
# routing payloads to a decoder). All JVM-side: hex prefix compare on
# the binary column, no Python per row and no codec libraries.
#: BMP's magic is only 2 ASCII bytes ("BM") — text payloads collide
#: with it (observed: 1-in-100k synthesized payloads at sf0.1), so
#: the sniff corroborates with the DIB header-size field at byte 14
#: (BITMAPINFOHEADER 40 / V4 108 / V5 124, little-endian), the same
#: plausibility check production sniffers use for short magics.
_BMP_DIB_SIZES_HEX = ("28000000", "6C000000", "7C000000")

MAGIC_SIGNATURES = (
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("49492A00", "tiff"),
    ("4D4D002A", "tiff"),
    # WAVE with fmt tag 0x0011 (LE '1100') at byte 20 = IMA-ADPCM
    # (G17, lossy 4-bit) — must precede the generic RIFF entry so the
    # subtype wins; corroborated by 'WAVE' at byte 8
    ("1100", "wav_adpcm", 40, ("57415645", 16)),
    ("52494646", "riff"),  # WAV/AVI/WebP share the RIFF container
    # 'AIFF' at byte 8 (hex offset 16), corroborated by the 'FORM'
    # group magic at byte 0 — same short-magic plausibility rule as
    # the BMP DIB-size check above.
    ("41494646", "aiff", 16, ("464F524D", 0)),
    ("2E736E64", "au"),  # Sun/NeXT '.snd'
    ("664C6143", "flac"),  # 'fLaC' (G14, entropy-coded audio)
    ("66747970", "mp4", 8),  # 'ftyp' at byte offset 4
    ("494433", "mp3"),
    ("1A45DFA3", "webm"),
    ("4F676753", "ogg"),  # RFC 3533 page magic (G22)
)


def sniff_format(payload_col) -> "F.Column":
    """Container format of a binary payload by magic bytes, as a pure
    codegen expression (hex-prefix compare). Unknown -> 'unknown'.

    Mirrors the typed-metadata contract: routing/filtering by format
    happens BEFORE any decode, so a 100 TB media scan that only wants
    PNGs prunes everything else at projection cost."""
    head = F.hex(payload_col).substr(F.lit(1), F.lit(44))
    expr = F.when(
        (head.substr(F.lit(1), F.lit(4)) == "424D")
        & head.substr(F.lit(29), F.lit(8)).isin(*_BMP_DIB_SIZES_HEX),
        F.lit("bmp"),
    ).otherwise(F.lit("unknown"))
    for sig in reversed(MAGIC_SIGNATURES):
        pattern, name = sig[0], sig[1]
        offset = sig[2] if len(sig) > 2 else 0
        cond = head.substr(F.lit(offset + 1), F.lit(len(pattern))) == pattern
        if len(sig) > 3:  # corroborating magic at a second offset
            corr_hex, corr_off = sig[3]
            cond = cond & (
                head.substr(F.lit(corr_off + 1), F.lit(len(corr_hex))) == corr_hex
            )
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return expr


def format_inventory(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-(declared kind, sniffed format) payload inventory — the QA
    pass that catches mislabeled media before decode jobs are
    scheduled. One scan + one tiny-key shuffle."""
    return (
        media.select(
            "kind",
            sniff_format(F.col(payload_col)).alias("format"),
            F.octet_length(F.col(payload_col)).alias("n_bytes"),
        )
        .groupBy("kind", "format")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# container header codecs: PNG / WAV / GIF metadata WITHOUT a decoder.
# Real media pipelines filter by resolution / sample rate / duration
# BEFORE scheduling decode jobs; all three containers put that
# metadata at fixed byte offsets, so it parses as pure JVM codegen
# over the binary column (hex substr/conv arithmetic — same technique
# as sources/pgoutput.py), no codec library and no Python per row.
#
# Header anatomy used (byte offsets 0-based):
# - PNG: 8-byte signature, IHDR length+tag, width BE u32 @16,
#        height BE u32 @20, bit depth @24, color type @25
# - WAV: RIFF size LE u32 @4, 'WAVE' + 'fmt ' chunk: channels LE u16
#        @22, sample rate LE u32 @24, byte rate LE u32 @28, bits per
#        sample LE u16 @34, 'data' tag + data size LE u32 @40
# - GIF: 'GIF89a', logical screen width LE u16 @6, height LE u16 @8


def _be_u(h, pos_hex: int, nbytes: int):
    """Big-endian unsigned int at 1-indexed hex position."""
    return F.conv(h.substr(F.lit(pos_hex), F.lit(2 * nbytes)), 16, 10).cast("long")


def _le_u(h, pos_hex: int, nbytes: int):
    """Little-endian unsigned int at 1-indexed hex position."""
    pairs = [h.substr(F.lit(pos_hex + 2 * i), F.lit(2)) for i in range(nbytes)]
    return F.conv(F.concat(*reversed(pairs)), 16, 10).cast("long")


def _le_u_txt(txt, pos: int, nbytes: int):
    """Little-endian unsigned int at 1-indexed BYTE position of a
    latin-1-decoded payload (char k ≡ byte k, code point ≡ byte
    value). ascii() of a one-char slice reads the byte directly —
    no base-16 string parse — and ascii('') past the end is 0, so
    truncated payloads read as zeros and fail validation instead of
    erroring."""
    out = None
    for k in range(nbytes):
        term = F.ascii(txt.substr(F.lit(pos + k), F.lit(1))).cast("long")
        if k:
            term = term * (1 << (8 * k))
        out = term if out is None else out + term
    return out


def _hbe(col, nbytes: int):
    return F.lpad(F.hex(col.cast("long")), 2 * nbytes, "0")


def _hle(col, nbytes: int):
    be = _hbe(col, nbytes)
    pairs = [F.substring(be, 2 * i + 1, 2) for i in range(nbytes)]
    return F.concat(*reversed(pairs))


def _wav_header_hex(channels, rate, data_size):
    """Canonical 44-byte RIFF/WAVE PCM header as hex — the ONE place
    the header field layout lives; both synthesizers and (by offset
    contract) the parse sides read this shape."""
    return F.concat(
        F.lit("52494646"), _hle(data_size + 36, 4), F.lit("57415645"),
        F.lit("666D7420"), F.lit("10000000"), F.lit("0100"),
        _hle(channels, 2), _hle(rate, 4), _hle(rate * channels * 2, 4),
        _hle(channels * 2, 2), F.lit("1000"),
        F.lit("64617461"), _hle(data_size, 4),
    )


def synthesize_media_headers(events: DataFrame) -> DataFrame:
    """Deterministic binary media payloads (real container headers)
    derived from the events table: PNG / WAV / GIF round-robin by
    event_id, dimensions and audio geometry derived from the row.
    The payload column is genuine BINARY — the parse side never sees
    the generating columns."""
    # restore source parallelism before per-row payload construction
    # (same rationale and measurement as sources/pgoutput.py)
    n_shuffle = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    events = events.repartition(n_shuffle, "event_id")
    eid, uid = F.col("event_id"), F.col("user_id")
    fmt = F.pmod(eid, 3)

    png_w = uid % 2048 + 16
    png_h = F.floor(eid / 3) % 2048 + 16
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"), F.lit("0000000D49484452"),
        _hbe(png_w, 4), _hbe(png_h, 4),
        F.lit("0806000000"), F.lit("00000000"),  # depth/color/etc + CRC
    )

    channels = eid % 2 + 1
    rate = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
        (F.pmod(uid, 3) + 1).cast("int"),
    )
    n_samples = eid % 100_000 + 1000
    data_size = n_samples * channels * 2
    wav_hex = _wav_header_hex(channels, rate, data_size)

    gif_w = uid % 4096 + 1
    gif_h = eid % 4096 + 1
    gif_hex = F.concat(
        F.lit("474946383961"), _hle(gif_w, 2), _hle(gif_h, 2), F.lit("F70000")
    )

    payload_hex = (
        F.when(fmt == 0, png_hex).when(fmt == 1, wav_hex).otherwise(gif_hex)
    )
    return events.select(
        eid.alias("media_id"), F.unhex(payload_hex).alias("payload")
    )


def parse_media_headers(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata out of raw container headers: dimensions +
    megapixels + aspect for images, channel/rate/duration geometry
    for audio. Dispatch rides on the same magic-byte sniff as
    format_inventory; every branch is fixed-offset integer reads, so
    the whole probe is one narrow projection — the shape that lets a
    100 TB media lake filter to '>=720p PNGs under 30s of audio'
    without decoding a single payload."""
    h = F.hex(F.col(payload_col))
    container = sniff_format(F.col(payload_col))

    is_png = container == "png"
    # RIFF is a family (WAV/AVI/WebP); WAV specifically carries 'WAVE'
    # at byte offset 8
    is_wav = (container == "riff") & (
        h.substr(F.lit(17), F.lit(8)) == "57415645"
    )
    is_gif = container == "gif"

    width = (
        F.when(is_png, _be_u(h, 33, 4)).when(is_gif, _le_u(h, 13, 2))
    )
    height = (
        F.when(is_png, _be_u(h, 41, 4)).when(is_gif, _le_u(h, 17, 2))
    )
    channels = F.when(is_wav, _le_u(h, 45, 2))
    rate = F.when(is_wav, _le_u(h, 49, 4))
    byte_rate = _le_u(h, 57, 4)
    data_size = _le_u(h, 81, 4)
    bit_depth = (
        F.when(is_png, _be_u(h, 49, 1)).when(is_wav, _le_u(h, 69, 2))
    )
    duration_ms = F.when(is_wav, F.floor(data_size * 1000 / byte_rate).cast("long"))

    return media.select(
        "media_id",
        F.when(is_wav, F.lit("wav")).otherwise(container).alias("container"),
        width.alias("width"),
        height.alias("height"),
        channels.alias("n_channels"),
        rate.alias("sample_rate"),
        bit_depth.alias("bit_depth"),
        duration_ms.alias("duration_ms"),
        F.when(is_png | is_gif, F.round(width * height / 1e6, 6)).alias("megapixels"),
        # floor(x + 0.5) instead of round(): 999/1920 = 0.5203125 sits
        # EXACTLY on the 6-decimal rounding boundary, where Spark's
        # BigDecimal HALF_UP and DuckDB's raw-double rounding disagree
        # by one ulp (observed at sf0.1); w x 10^6 / h + 0.5 is exact
        # at every boundary case, so floor is engine-identical (the
        # E7 quantizer reasoning)
        F.when(
            is_png | is_gif,
            F.floor(width * 1000000.0 / height + 0.5) / 1000000.0,
        ).alias("aspect_ratio"),
        F.octet_length(F.col(payload_col)).cast("long").alias("header_bytes"),
    )


# ---------------------------------------------------------------------------
# JPEG header probe: unlike PNG/WAV/GIF, JPEG metadata does NOT sit at
# a fixed offset — the SOF (start-of-frame) marker floats behind a
# variable-length chain of APPn/COM segments. The walk is still pure
# JVM codegen: a bounded F.aggregate over the segment chain, each step
# hopping `2 + length` bytes (the marker-segment wire rule), stopping
# at the first SOF0-SOF3 / scan-start / EOI. No codec library, no
# Python per row — the same "filter a 100 TB media lake by resolution
# before decoding anything" posture as parse_media_headers.
#
# Segment anatomy (1 byte = 2 hex chars): SOI FFD8, then markers
# FFxx + length(2B, includes itself) + body; SOFn carries
# precision(1B) + height(2B BE) + width(2B BE) + n_components(1B).

#: segment-walk iteration bound: JPEG headers put SOF within the
#: first handful of segments (EXIF/JFIF/ICC/COM); raise if probing
#: files with pathological metadata chains
JPEG_MAX_SEGMENTS = 8

_SOF_MARKERS = ["FFC0", "FFC1", "FFC2", "FFC3"]


def synthesize_jpeg_headers(events: DataFrame) -> DataFrame:
    """Deterministic JPEG header payloads with a VARIABLE segment
    layout derived from the events table: 1-3 APPn segments of
    varying length, an optional COM segment, then SOF0 (baseline) or
    SOF2 (progressive) carrying the dimensions. Only (media_id,
    payload) survive — the parse side runs from the bytes alone."""
    n_shuffle = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    events = events.repartition(n_shuffle, "event_id")
    eid, uid = F.col("event_id"), F.col("user_id")

    def app_segment(j: int):
        body_len = (uid + j) % 12 + 4
        return F.concat(
            F.lit(f"FFE{j}"), _hbe(body_len + 2, 2), F.repeat(F.lit("00"), body_len.cast("int"))
        )

    n_app = eid % 3 + 1  # 1..3 APP segments
    apps = F.concat(
        app_segment(0),
        F.when(n_app >= 2, app_segment(1)).otherwise(F.lit("")),
        F.when(n_app >= 3, app_segment(2)).otherwise(F.lit("")),
    )
    com_len = eid % 7 + 3
    com = F.when(
        eid % 2 == 0,
        F.concat(F.lit("FFFE"), _hbe(com_len + 2, 2),
                 F.repeat(F.lit("00"), com_len.cast("int"))),
    ).otherwise(F.lit(""))

    height = eid % 4000 + 8
    width = uid % 4000 + 8
    sof_marker = F.when(uid % 2 == 1, "FFC2").otherwise("FFC0")
    sof = F.concat(
        sof_marker, F.lit("0011"), F.lit("08"),  # len 17, precision 8
        _hbe(height, 2), _hbe(width, 2),
        F.lit("03"), F.lit("012200021101031101"),  # 3 components
    )
    payload_hex = F.concat(F.lit("FFD8"), apps, com, sof, F.lit("FFD9"))
    return events.select(
        eid.alias("media_id"), F.unhex(payload_hex).alias("payload")
    )


def parse_jpeg_headers(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Walk the JPEG segment chain to the first SOF marker and read
    frame geometry. The bounded walk runs UNROLLED (r12): the original
    F.aggregate fold never codegens (Catalyst higher-order lambdas
    always interpret, ~130 us/row-core measured), so the same step
    expression is applied JPEG_MAX_SEGMENTS times as staged
    withColumns projections instead — `_pos`/`_sof`/`_n` are
    non-cheap aliases referenced more than once, so cost-aware
    CollapseProject keeps every stage small and whole-stage codegen
    compiles the entire walk. Expression-for-expression identical to
    the retained fold twin (`_parse_jpeg_headers_catalyst`), pinned by
    a differential fuzz test; variable offsets and hostile inputs
    behave exactly as before (three-valued logic is Catalyst's own)."""
    df = media.select("media_id", F.hex(F.col(payload_col)).alias("_h"))
    h = F.col("_h")
    df = df.withColumns({
        "_pos": F.lit(5).cast("int"),   # 1-indexed hex cursor after SOI
        "_sof": F.lit(0).cast("int"),   # hex pos of the SOF marker
        "_n": F.lit(0).cast("int"),     # segments skipped before SOF
    })
    for _ in range(JPEG_MAX_SEGMENTS):
        pos, sof, n = F.col("_pos"), F.col("_sof"), F.col("_n")
        marker = h.substr(pos, F.lit(4))
        is_sof = marker.isin(*_SOF_MARKERS)
        seg_len = F.conv(h.substr(pos + 4, F.lit(4)), 16, 10).cast("int")
        done = (sof > 0) | (pos + 3 > F.length(h)) | marker.isin("FFD9", "FFDA")
        df = df.withColumns({
            "_pos": F.when(done | is_sof, pos)
            .otherwise(pos + 4 + seg_len * 2).cast("int"),
            "_sof": F.when(is_sof & (sof == 0), pos).otherwise(sof).cast("int"),
            "_n": F.when(done | is_sof, n).otherwise(n + 1).cast("int"),
        })
    hh, sof = F.col("_h"), F.col("_sof")
    is_jpeg = hh.substr(F.lit(1), F.lit(4)) == "FFD8"
    # geometry only for actual JPEGs: a non-JPEG payload whose bytes
    # happen to spell FFC0-FFC3 at a walked offset must stay null
    # (parse_media_headers gates every field the same way)
    found = (sof > 0) & is_jpeg
    marker = hh.substr(sof, F.lit(4))
    height = F.conv(hh.substr(sof + 10, F.lit(4)), 16, 10).cast("long")
    width = F.conv(hh.substr(sof + 14, F.lit(4)), 16, 10).cast("long")
    return df.select(
        "media_id",
        is_jpeg.alias("is_jpeg"),
        F.when(found, F.col("_n")).alias("n_header_segments"),
        F.when(found, F.conv(hh.substr(sof + 8, F.lit(2)), 16, 10).cast("long"))
        .alias("precision"),
        F.when(found, height).alias("height"),
        F.when(found, width).alias("width"),
        F.when(found, F.conv(hh.substr(sof + 18, F.lit(2)), 16, 10).cast("long"))
        .alias("n_components"),
        F.when(found, marker == "FFC2").alias("progressive"),
        F.when(found, F.round(width * height / 1e6, 6)).alias("megapixels"),
    )


def _parse_jpeg_headers_catalyst(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """The original interpreted Catalyst fold — kept as the reference
    twin for the differential fuzz tests pinning the unrolled walk.

    The hex string is materialized in its OWN projection before the
    fold: Catalyst does no common-subexpression elimination inside an
    expression tree, so folding over the raw hex(payload) expression
    re-hexes the payload at every one of the walk's ~3x
    JPEG_MAX_SEGMENTS substr reads."""
    media = media.select("media_id", F.hex(F.col(payload_col)).alias("_h"))
    h = F.col("_h")

    init = F.struct(
        F.lit(5).cast("int").alias("pos"),   # 1-indexed hex cursor after SOI (2 bytes)
        F.lit(0).cast("int").alias("sof"),   # hex pos of the SOF marker
        F.lit(0).cast("int").alias("n"),     # segments skipped before SOF
    )

    def step(acc, _):
        pos, sof, n = acc["pos"], acc["sof"], acc["n"]
        marker = h.substr(pos, F.lit(4))
        is_sof = marker.isin(*_SOF_MARKERS)
        seg_len = F.conv(h.substr(pos + 4, F.lit(4)), 16, 10).cast("int")
        done = (sof > 0) | (pos + 3 > F.length(h)) | marker.isin("FFD9", "FFDA")
        return F.struct(
            F.when(done | is_sof, pos).otherwise(pos + 4 + seg_len * 2)
            .cast("int").alias("pos"),
            F.when(is_sof & (sof == 0), pos).otherwise(sof).cast("int").alias("sof"),
            F.when(done | is_sof, n).otherwise(n + 1).cast("int").alias("n"),
        )

    state = F.aggregate(
        F.sequence(F.lit(1), F.lit(JPEG_MAX_SEGMENTS)), init, step
    )
    media = media.select("media_id", "_h", state.alias("_s"))
    hh, sof = F.col("_h"), F.col("_s.sof")
    is_jpeg = hh.substr(F.lit(1), F.lit(4)) == "FFD8"
    # geometry only for actual JPEGs: a non-JPEG payload whose bytes
    # happen to spell FFC0-FFC3 at a walked offset must stay null
    # (parse_media_headers gates every field the same way)
    found = (sof > 0) & is_jpeg
    marker = hh.substr(sof, F.lit(4))
    height = F.conv(hh.substr(sof + 10, F.lit(4)), 16, 10).cast("long")
    width = F.conv(hh.substr(sof + 14, F.lit(4)), 16, 10).cast("long")
    return media.select(
        "media_id",
        is_jpeg.alias("is_jpeg"),
        F.when(found, F.col("_s.n")).alias("n_header_segments"),
        F.when(found, F.conv(hh.substr(sof + 8, F.lit(2)), 16, 10).cast("long"))
        .alias("precision"),
        F.when(found, height).alias("height"),
        F.when(found, width).alias("width"),
        F.when(found, F.conv(hh.substr(sof + 18, F.lit(2)), 16, 10).cast("long"))
        .alias("n_components"),
        F.when(found, marker == "FFC2").alias("progressive"),
        F.when(found, F.round(width * height / 1e6, 6)).alias("megapixels"),
    )


# -- WAV PCM signal statistics: raw 16-bit PCM needs NO codec, so this
# is the one modality where feature extraction (not just header
# probing) runs for real in pure codegen — peak / DC sum / energy /
# zero-crossings straight off the interleaved sample bytes.

#: parse-side cap on samples folded per payload: bounds the per-row
#: transform against hostile data_size fields (synthesis stays far
#: below it)
WAV_PCM_MAX_SAMPLES = 1024


def synthesize_wav_pcm(events: DataFrame) -> DataFrame:
    """Deterministic mono 16-bit PCM WAV payloads WITH a real data
    chunk: canonical 44-byte header + n interleaved LE samples of a
    full-range pseudo-noise waveform derived from the row. Only
    (media_id, payload) survive — the parse side runs from bytes
    alone."""
    n_shuffle = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    events = events.repartition(n_shuffle, "event_id")
    eid, uid = F.col("event_id"), F.col("user_id")
    n = eid % 32 + 8
    rate = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
        (F.pmod(uid, 3) + 1).cast("int"),
    )
    data_size = n * 2
    header_hex = _wav_header_hex(F.lit(1), rate, data_size)
    samples_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: _hle(F.pmod(eid * 6151 + i * 32917, F.lit(65536)), 2),
        ),
        "",
    )
    return events.select(
        eid.alias("media_id"),
        F.unhex(F.concat(header_hex, samples_hex)).alias("payload"),
    )


def _decode_pcm_samples(media: DataFrame) -> DataFrame:
    """THE WAV decode contract, shared by every PCM feature fold
    (wav_pcm_stats, wav_silence_segments): header validation (RIFF/
    WAVE/data magics, PCM + mono + 16-bit format block, rate>0 so a
    corrupt file can't trip ANSI division), the sample-count cap
    (declared data size, bytes actually present, WAV_PCM_MAX_SAMPLES),
    and the latin-1 two-ascii()-per-sample LE-u16 decode. Returns
    (media_id, ok, is_pcm_wav, rate, n, samples) with samples
    MATERIALIZED once in its own projection — expression subtrees get
    no CSE across output columns, so folding statistics straight off
    the transform re-decodes per statistic (measured 5x slower at
    sf0.1). One copy of the contract: a header or cap fix lands in
    every fold at once."""
    h = F.decode(F.col("payload"), "ISO-8859-1")
    is_wav = (
        (h.substr(F.lit(1), F.lit(4)) == "RIFF")
        & (h.substr(F.lit(9), F.lit(4)) == "WAVE")
        & (h.substr(F.lit(37), F.lit(4)) == "data")
        & (_le_u_txt(h, 21, 2) == 1)   # PCM format tag
        & (_le_u_txt(h, 23, 2) == 1)   # mono
        & (_le_u_txt(h, 35, 2) == 16)  # 16-bit
        & (_le_u_txt(h, 25, 4) > 0)    # rate=0 is corrupt: guards the
        #   duration division under ANSI mode (one bad file must not
        #   kill the batch)
    )
    rate = _le_u_txt(h, 25, 4)
    data_size = _le_u_txt(h, 41, 4)
    # cap the fold and require the payload to actually carry the bytes
    n = F.least(
        (data_size / 2).cast("long"),
        ((F.length(h) - 44) / 2).cast("long"),
        F.lit(WAV_PCM_MAX_SAMPLES).cast("long"),
    )
    u = lambda i: (  # noqa: E731 — LE u16 at sample index i
        F.ascii(h.substr(F.lit(45) + i * 2, F.lit(1))).cast("long")
        + F.ascii(h.substr(F.lit(46) + i * 2, F.lit(1))).cast("long") * 256
    )
    signed = lambda v: F.when(v >= 32768, v - 65536).otherwise(v)  # noqa: E731
    return media.select(
        "media_id",
        (is_wav & (n > 0)).alias("ok"),
        is_wav.alias("is_pcm_wav"),
        F.when(is_wav, rate).alias("rate"),
        F.when(is_wav & (n > 0), n).alias("n"),
        F.when(
            is_wav & (n > 0),
            F.transform(F.sequence(F.lit(0), n - 1), lambda i: signed(u(i))),
        ).alias("samples"),
    )


def _wav_decode_one(raw: bytes):
    """Python twin of `_decode_pcm_samples`'s per-row contract (r11):
    same header validation, same cap arithmetic (double divisions
    truncate toward zero like the long casts), bytes past the payload
    end read as 0 exactly like ascii('') == 0. Returns
    (ok, is_wav, rate, n, samples int64 array)."""
    ln = len(raw)

    def le(off: int, nb: int) -> int:
        v = 0
        for k in range(nb):
            b = raw[off + k] if off + k < ln else 0
            v += b << (8 * k)
        return v

    is_wav = (
        raw[0:4] == b"RIFF"
        and raw[8:12] == b"WAVE"
        and raw[36:40] == b"data"
        and le(20, 2) == 1
        and le(22, 2) == 1
        and le(34, 2) == 16
        and le(24, 4) > 0
    )
    rate = le(24, 4)
    n = min(
        int(le(40, 4) / 2),
        int((ln - 44) / 2),  # trunc toward zero == the (x/2).cast long
        WAV_PCM_MAX_SAMPLES,
    )
    ok = is_wav and n > 0
    if not ok:
        return ok, is_wav, rate, n, None
    buf = raw[44 : 44 + 2 * n]
    if len(buf) < 2 * n:  # missing bytes decode as 0 (ascii('') == 0)
        buf = buf + b"\x00" * (2 * n - len(buf))
    samples = np.frombuffer(buf, "<i2").astype(np.int64)
    return ok, is_wav, rate, n, samples


_WAV_STATS_SCHEMA = (
    "media_id LONG, is_pcm_wav BOOLEAN, n_samples LONG, "
    "sample_rate LONG, duration_ms LONG, peak_abs LONG, "
    "sum_samples LONG, energy LONG, zero_crossings LONG"
)


def wav_pcm_stats(media: DataFrame) -> DataFrame:
    """Signal statistics from the PCM bytes of a canonical mono
    16-bit WAV: all integer arithmetic (exact at any summation
    order) — the shape that lets a 100 TB audio lake compute
    admission features (clipping, silence, DC offset) without a
    decode fleet. Non-WAV / non-PCM / truncated payloads yield nulls,
    never errors.

    Runs as the Arrow-batched `_wav_decode_one` + numpy seam (r11):
    the latin-1 two-ascii()-per-sample transform AND the statistics
    fold were both interpreted Catalyst HOFs (~12 us/row); the numpy
    pass computes the same exact integers. Semantics pinned to the
    retained Catalyst twin by a differential fuzz pytest."""
    import math

    import pandas as _pd

    def stats(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                ok, is_wav, rate, n, x = _wav_decode_one(raw)
                if not ok:
                    rows.append(
                        (int(mid), bool(is_wav), None, None, None, None,
                         None, None, None)
                    )
                    continue
                rows.append(
                    (
                        int(mid), True, n, rate,
                        math.floor(n * 1000 / rate),
                        int(np.abs(x).max()),
                        int(x.sum()),
                        int((x * x).sum()),
                        int(np.count_nonzero(x[:-1] * x[1:] < 0)),
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id", "is_pcm_wav", "n_samples", "sample_rate",
                    "duration_ms", "peak_abs", "sum_samples", "energy",
                    "zero_crossings",
                ],
                dtype=object,
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, _WAV_STATS_SCHEMA
    )


def _wav_pcm_stats_catalyst(media: DataFrame) -> DataFrame:
    """The original interpreted Catalyst fold — kept as the reference
    twin for the differential fuzz test pinning the seam."""
    decoded = _decode_pcm_samples(media)
    zero = F.lit(0).cast("long")
    init = F.struct(
        zero.alias("s"), zero.alias("e"), zero.alias("peak"),
        zero.alias("zc"), F.lit(None).cast("long").alias("prev"),
    )
    state = F.aggregate(
        F.col("samples"),
        init,
        lambda acc, v: F.struct(
            (acc["s"] + v).alias("s"),
            (acc["e"] + v * v).alias("e"),
            F.greatest(acc["peak"], F.abs(v)).alias("peak"),
            (
                acc["zc"]
                + F.when(acc["prev"] * v < 0, F.lit(1)).otherwise(F.lit(0))
            ).alias("zc"),
            v.alias("prev"),
        ),
    )
    # the fold, too, lands in its own projection so the four statistic
    # columns read fields of ONE evaluated struct instead of folding
    # the array four times
    folded = decoded.select(
        "media_id", "ok", "is_pcm_wav", "rate", "n", state.alias("st")
    )
    ok = F.col("ok")
    return folded.select(
        "media_id",
        F.col("is_pcm_wav"),
        F.col("n").alias("n_samples"),
        F.when(ok, F.col("rate")).alias("sample_rate"),
        F.when(ok, F.floor(F.col("n") * 1000 / F.col("rate"))).alias(
            "duration_ms"
        ),
        F.when(ok, F.col("st.peak")).alias("peak_abs"),
        F.when(ok, F.col("st.s")).alias("sum_samples"),
        F.when(ok, F.col("st.e")).alias("energy"),
        F.when(ok, F.coalesce(F.col("st.zc"), zero)).alias("zero_crossings"),
    )


#: |sample| below this is "silence" for segmentation purposes: 1/4 of
#: full scale. The synthesized pseudo-noise corpus is ~25% silent per
#: sample, so runs of every length appear and both branches of every
#: fold condition execute.
WAV_SILENCE_THRESHOLD = 8192


_WAV_SIL_SCHEMA = (
    "media_id LONG, is_pcm_wav BOOLEAN, n_samples LONG, "
    "lead_silence LONG, trail_silence LONG, n_segments LONG, "
    "longest_silence LONG, n_silent LONG"
)


def wav_silence_segments(
    media: DataFrame, threshold: int = WAV_SILENCE_THRESHOLD
) -> DataFrame:
    """Silence-run segmentation from the PCM bytes (G7): per payload,
    leading/trailing silence sample counts (the trim offsets an audio
    admission pipeline cuts before training), the number of loud
    segments (silence-separated speech/sound bursts), the longest
    silent run, and the total silent-sample count. Same decode
    contract as wav_pcm_stats (`_wav_decode_one`), all-integer and
    exact; non-WAV/truncated payloads yield nulls, never errors.
    Runs as the Arrow-batched numpy seam (r11, same rationale as
    wav_pcm_stats); semantics pinned to the retained Catalyst twin by
    the differential fuzz pytest."""
    import pandas as _pd

    th = int(threshold)

    def segs(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ok, is_wav, rate, n, x = _wav_decode_one(bytes(payload))
                if not ok:
                    rows.append(
                        (int(mid), bool(is_wav), None, None, None, None,
                         None, None)
                    )
                    continue
                silent = np.abs(x) < th
                nsil = int(silent.sum())
                loud_idx = np.flatnonzero(~silent)
                if len(loud_idx) == 0:
                    lead, trail, nseg, longest = n, n, 0, n
                else:
                    lead = int(loud_idx[0])
                    trail = int(n - 1 - loud_idx[-1])
                    # a loud segment starts at a loud sample whose
                    # predecessor is silent (or at the first sample)
                    nseg = int(1 + np.count_nonzero(np.diff(loud_idx) > 1))
                    # longest silent run: gaps between loud samples
                    # plus the leading/trailing runs
                    gaps = np.diff(loud_idx) - 1
                    longest = max(
                        lead, trail, int(gaps.max()) if len(gaps) else 0
                    )
                rows.append(
                    (int(mid), True, n, lead, trail, nseg, longest, nsil)
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "media_id", "is_pcm_wav", "n_samples", "lead_silence",
                    "trail_silence", "n_segments", "longest_silence",
                    "n_silent",
                ],
                dtype=object,
            )

    return media.select("media_id", "payload").mapInPandas(
        segs, _WAV_SIL_SCHEMA
    )


def _wav_silence_segments_catalyst(
    media: DataFrame, threshold: int = WAV_SILENCE_THRESHOLD
) -> DataFrame:
    """The original interpreted Catalyst fold — kept as the reference
    twin for the differential fuzz test pinning the seam."""
    decoded = _decode_pcm_samples(media)
    zero = F.lit(0).cast("long")
    init = F.struct(
        zero.alias("lead"), zero.alias("seen"), zero.alias("nseg"),
        zero.alias("inloud"), zero.alias("cur"), zero.alias("longest"),
        zero.alias("nsil"),
    )
    th = F.lit(int(threshold)).cast("long")

    def step(acc, v):
        silent = F.abs(v) < th
        cur = F.when(silent, acc["cur"] + 1).otherwise(zero)
        return F.struct(
            F.when((acc["seen"] == 0) & silent, acc["lead"] + 1)
            .otherwise(acc["lead"])
            .alias("lead"),
            F.when(silent, acc["seen"]).otherwise(F.lit(1).cast("long"))
            .alias("seen"),
            F.when(~silent & (acc["inloud"] == 0), acc["nseg"] + 1)
            .otherwise(acc["nseg"])
            .alias("nseg"),
            F.when(silent, zero).otherwise(F.lit(1).cast("long"))
            .alias("inloud"),
            cur.alias("cur"),
            F.greatest(acc["longest"], cur).alias("longest"),
            (acc["nsil"] + F.when(silent, F.lit(1).cast("long")).otherwise(zero))
            .alias("nsil"),
        )

    # one evaluated struct per row (same CSE rationale as
    # wav_pcm_stats: reading seven statistics off one fold, not
    # folding the array seven times)
    folded = decoded.select(
        "media_id", "ok", "is_pcm_wav", "n",
        F.aggregate(F.col("samples"), init, step).alias("st"),
    )
    ok = F.col("ok")
    return folded.select(
        "media_id",
        "is_pcm_wav",
        F.col("n").alias("n_samples"),
        F.when(ok, F.col("st.lead")).alias("lead_silence"),
        F.when(ok, F.col("st.cur")).alias("trail_silence"),
        F.when(ok, F.col("st.nseg")).alias("n_segments"),
        F.when(ok, F.col("st.longest")).alias("longest_silence"),
        F.when(ok, F.col("st.nsil")).alias("n_silent"),
    )


# ---------------------------------------------------------------------------
# perceptual image hashes (r8): the multimodal x dedup bridge — dHash /
# aHash over REAL decoded pixels (the G1 seam), banded into the same
# 64-bit hamming-LSH machinery the SimHash dedup family uses.


def _axis_weights(n_px: int, n_cells: int) -> np.ndarray:
    """(n_cells, n_px) fractional-overlap weights of each grid cell
    over each pixel: cell i covers [i*n_px/n_cells, (i+1)*n_px/n_cells)
    in pixel units, and a pixel contributes its exact overlap length.
    Rows sum to n_px/n_cells."""
    edges = np.arange(n_cells + 1) * (n_px / n_cells)
    px_lo = np.arange(n_px)
    lo = np.maximum(edges[:-1, None], px_lo[None, :])
    hi = np.minimum(edges[1:, None], (px_lo + 1)[None, :])
    return np.maximum(hi - lo, 0.0)


def _gray_grid(img: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Decoded image -> (rows, cols) float64 grayscale grid by EXACT
    fractional-area mean over the cell footprint (two small weight
    matmuls, no integer-floored boundaries). Exactness is what makes
    the hash RESOLUTION-INDEPENDENT: an image and its block-upscale
    (or any block-ALIGNED box-downsample) carry identical cell means,
    so a resized re-encode hashes identically up to re-encode
    rounding, and a non-aligned resample lands within a few bits —
    the property the near-dup detector relies on. Integer-floor
    boundaries (the usual shortcut) alias at sizes not divisible by
    the grid and cost real hamming distance on resized duplicates."""
    px = img.astype(np.float64)
    if px.ndim == 3:
        if px.shape[2] >= 3:
            # ITU-R BT.601 luma; alpha (if any) ignored
            px = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        else:
            px = px[:, :, 0]
    h, w = px.shape
    wr = _axis_weights(h, rows)
    wc = _axis_weights(w, cols)
    area = (h / rows) * (w / cols)
    # quantize: cell means of EQUAL content must compare equal after
    # a uniform brightness shift or a resolution change — without the
    # rounding, ~1e-13 matmul noise breaks strict > ties differently
    # per resolution and costs hamming distance on exact duplicates
    return np.round((wr @ px @ wc.T) / area, 6)


def _pack_bits64(bits: np.ndarray) -> int:
    """64 booleans (bit 0 first) -> SIGNED 64-bit int (Spark LongType;
    the same bit-63 two's-complement wrap the SimHash packer uses)."""
    val = 0
    for j, b in enumerate(bits.ravel()[:64]):
        if b:
            val |= 1 << j
    return val - (1 << 64) if val >= (1 << 63) else val


def dhash64(img: np.ndarray) -> int:
    """Difference hash: 8x9 grayscale grid, bit r*8+c set when the
    cell right of (r, c) is brighter — 64 horizontal-gradient signs.
    Invariant to uniform brightness/contrast shifts by construction."""
    g = _gray_grid(img, 8, 9)
    return _pack_bits64(g[:, 1:] > g[:, :-1])


def ahash64(img: np.ndarray) -> int:
    """Average hash: 8x8 grid, bit set when the cell beats the global
    mean. Complements dHash (captures coarse mass distribution, not
    gradients)."""
    g = _gray_grid(img, 8, 8)
    return _pack_bits64(g > g.mean())


IMAGE_HASH_SCHEMA = "media_id LONG, dhash LONG, ahash LONG"


def image_hashes(media: DataFrame, decoder: str = "real") -> DataFrame:
    """(media_id, payload) -> perceptual hashes over DECODED pixels
    via Arrow mapInPandas. decoder='real' routes PNG/baseline-JPEG/GIF
    through the pure-Python codecs (the G1 seam — swap in a native
    decoder at production scale, same seam); 'stub' hashes a
    deterministic fake gradient image derived from the payload bytes,
    keeping the plumbing testable without decodable payloads."""
    if decoder not in ("stub", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = (
                pdf["payload"].map(lambda b: _real_decode_image(bytes(b)))
                if decoder == "real"
                else pdf["payload"].map(_stub_image)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": imgs.map(dhash64).astype("int64"),
                    "ahash": imgs.map(ahash64).astype("int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_HASH_SCHEMA
    )


def _stub_image(payload: bytes) -> np.ndarray:
    """Deterministic fake decode for plumbing tests: a 16x16 gradient
    image seeded by the payload digest."""
    digest = hashlib.sha256(bytes(payload)).digest()
    base = np.frombuffer((digest * 8)[:256], dtype=np.uint8)
    return base.reshape(16, 16)


# -- EXIF (APP1 TIFF-IFD) probe: one level deeper than the SOF walk —
# the orientation/resolution metadata a media pipeline needs BEFORE
# deciding how to rotate/resize, read without any decoder. The APP1
# body is a little TIFF file (byte-order mark, IFD entry table,
# out-of-line values), so the probe handles BOTH endiannesses and
# Column-valued offsets — still pure whole-stage codegen.

#: IFD entries walked per payload (real cameras put orientation and
#: resolution in the first handful of IFD0 entries)
EXIF_MAX_IFD_ENTRIES = 6
#: marker-segment hops to locate APP1 (JFIF's APP0 may precede it)
EXIF_WALK_SEGMENTS = 4

_EXIF_MAGIC_HEX = "457869660000"  # "Exif\0\0"
_TAG_ORIENTATION = 0x0112
_TAG_XRESOLUTION = 0x011A
_TAG_EXIF_IFD = 0x8769


def synthesize_exif_headers(events: DataFrame) -> DataFrame:
    """Deterministic JPEG payloads carrying a REAL APP1/EXIF segment:
    byte order (II/MM) flips per row, an optional APP0 precedes APP1
    (so the locator must walk, not assume), IFD0 holds orientation
    (inline SHORT), XResolution (out-of-line RATIONAL — the offset
    indirection every TIFF reader must follow) and an ExifIFD
    pointer. Only (media_id, payload) survive."""
    n_shuffle = int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    events = events.repartition(n_shuffle, "event_id")
    eid, uid = F.col("event_id"), F.col("user_id")
    le = uid % 2 == 0  # 'II' little-endian rows

    def w(v, nbytes: int):
        col = F.lit(v).cast("long") if isinstance(v, int) else v.cast("long")
        return F.when(le, _hle(col, nbytes)).otherwise(_hbe(col, nbytes))

    orientation = eid % 8 + 1
    num, den = uid % 600 + 72, eid % 2 + 1

    def entry(tag: int, etype: int, value4) -> F.Column:
        return F.concat(w(tag, 2), w(etype, 2), w(1, 4), value4)

    # inline SHORT occupies the FIRST two value bytes in either order
    ori_value = F.concat(w(orientation, 2), F.lit("0000"))
    tiff = F.concat(
        F.when(le, F.lit("4949")).otherwise(F.lit("4D4D")),
        w(42, 2),
        w(8, 4),  # IFD0 starts right after the 8-byte TIFF header
        w(3, 2),  # 3 entries
        entry(_TAG_ORIENTATION, 3, ori_value),
        entry(_TAG_XRESOLUTION, 5, w(50, 4)),  # 8+2+36+4 = offset 50
        entry(_TAG_EXIF_IFD, 4, w(0, 4)),
        w(0, 4),  # no next IFD
        w(num, 4),
        w(den, 4),  # the out-of-line RATIONAL
    )
    app1 = F.concat(F.lit("FFE1"), F.lit("0042"), F.lit(_EXIF_MAGIC_HEX), tiff)
    app0 = F.when(
        eid % 2 == 0,
        F.concat(F.lit("FFE00010"), F.lit("4A46494600"), F.repeat(F.lit("00"), 9)),
    ).otherwise(F.lit(""))
    sof = F.concat(
        F.lit("FFC0000B08"), _hbe(eid % 2000 + 8, 2), _hbe(uid % 2000 + 8, 2),
        F.lit("01011100"),
    )
    payload_hex = F.concat(F.lit("FFD8"), app0, app1, sof, F.lit("FFD9"))
    return events.select(
        eid.alias("media_id"), F.unhex(payload_hex).alias("payload")
    )


def parse_exif_headers(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Walk to APP1, verify the Exif magic, then read the TIFF block
    honoring its byte-order mark: IFD0 entry count, orientation
    (inline SHORT), XResolution (out-of-line RATIONAL followed via
    its offset). Every read handles Column-valued offsets and both
    endiannesses in codegen; non-JPEG / non-EXIF payloads yield
    typed NULLs, never errors.

    Two r12 changes, both expression-for-expression pinned to the
    retained fold twin (`_parse_exif_headers_catalyst`) by a
    differential fuzz test and full-corpus parity:

    - the APP1 locator runs UNROLLED: the original F.aggregate fold
      never codegens (Catalyst higher-order lambdas always
      interpret), so the same step expression is applied
      EXIF_WALK_SEGMENTS times as staged withColumns projections —
      `_pos`/`_app1` are non-cheap aliases referenced more than once,
      so cost-aware CollapseProject keeps every stage small and
      whole-stage codegen compiles the whole locator;
    - the TIFF reads are BYTE-positional over the binary payload
      (hex-of-slice) instead of substr over the row's hex string:
      UTF8String.substr scans O(position) bytes per call, and the
      ~21 reads each paid that scan — binary substring is a
      byte-addressed O(length) slice. Every walked hex position is
      odd (byte-aligned: the cursor starts at 5 and advances by
      4 + seg_len*2) and the hex string always has even length, so
      hex pos x maps exactly to byte (x+1)/2 and truncated reads
      return the identical hex prefix.
    """
    p = F.col("_p")
    media = media.select(
        "media_id",
        F.col(payload_col).alias("_p"),
        F.hex(F.col(payload_col)).alias("_h"),
    )
    h = F.col("_h")
    media = media.withColumns({
        "_pos": F.lit(5).cast("int"),
        "_app1": F.lit(0).cast("int"),
    })
    for _ in range(EXIF_WALK_SEGMENTS):
        pos, app1 = F.col("_pos"), F.col("_app1")
        marker = h.substr(pos, F.lit(4))
        seg_len = F.conv(h.substr(pos + 4, F.lit(4)), 16, 10).cast("int")
        done = (app1 > 0) | (pos + 3 > F.length(h)) | marker.isin("FFD9", "FFDA")
        is_app1 = marker == "FFE1"
        media = media.withColumns({
            "_pos": F.when(done | is_app1, pos)
            .otherwise(pos + 4 + seg_len * 2).cast("int"),
            "_app1": F.when(is_app1 & (app1 == 0), pos)
            .otherwise(app1).cast("int"),
        })
    # STAGED projections from here on: Catalyst does no common-sub-
    # expression elimination inside one expression tree, so inlining
    # rd(rd(...)) (Column-valued offsets) squares the tree at every
    # hop and the generated method blows past the 64 KB JVM codegen
    # limit into the interpreted fallback (measured 36s -> 1s on the
    # registered probe). Each stage materializes the offsets the next
    # stage reads, keeping every projection small and codegen-able.
    media = media.select("media_id", "_p", "_app1")
    app1 = F.col("_app1")

    def rd(byte_off, nbytes: int, le=None):
        le = F.col("_le") if le is None else le
        # clamp hostile offsets: an APP1 segment caps at 64 KiB, so
        # any larger TIFF offset is garbage — without the clamp a
        # crafted 32-bit offset overflows substr's int position
        # (ANSI CAST_OVERFLOW) instead of reading as NULL
        off = F.least(byte_off.cast("long"), F.lit(131_072))
        bpos = (F.col("_tb") + off).cast("int")
        be = F.hex(p.substr(bpos, F.lit(nbytes)))
        pairs = [F.hex(p.substr(bpos + i, F.lit(1))) for i in range(nbytes)]
        return F.conv(
            F.when(le, F.concat(*reversed(pairs))).otherwise(be), 16, 10
        ).cast("long")

    media = media.select(
        "media_id",
        "_p",
        "_app1",
        (F.hex(p.substr(F.lit(1), F.lit(2))) == "FFD8").alias("_is_jpeg"),
        # byte pos of the TIFF header: hex pos app1+20 -> (app1+1)/2+10
        ((app1 + 1) / 2 + 10).cast("int").alias("_tb"),
    )
    media = media.select(
        "*",
        (
            F.col("_is_jpeg")
            & (app1 > 0)
            & (
                F.hex(p.substr(((app1 + 1) / 2 + 4).cast("int"), F.lit(6)))
                == _EXIF_MAGIC_HEX
            )
        ).alias("_has_exif"),
        (F.hex(p.substr(F.col("_tb"), F.lit(2))) == "4949").alias("_le"),
    )
    media = media.select("*", rd(F.lit(4).cast("long"), 4).alias("_ifd0"))
    media = media.select("*", rd(F.col("_ifd0"), 2).alias("_cnt"))
    # one small projection per IFD entry: tag + both value reads
    entry_cols = []
    for i in range(EXIF_MAX_IFD_ENTRIES):
        eoff = F.col("_ifd0") + 2 + 12 * i
        entry_cols.extend(
            [
                rd(eoff, 2).alias(f"_tag{i}"),
                rd(eoff + 8, 2).alias(f"_v2_{i}"),
                rd(eoff + 8, 4).alias(f"_v4_{i}"),
            ]
        )
    media = media.select("*", *entry_cols)
    ori = F.coalesce(
        *[
            F.when(
                (F.lit(i) < F.col("_cnt"))
                & (F.col(f"_tag{i}") == _TAG_ORIENTATION),
                F.col(f"_v2_{i}"),
            )
            for i in range(EXIF_MAX_IFD_ENTRIES)
        ]
    )
    xoff = F.coalesce(
        *[
            F.when(
                (F.lit(i) < F.col("_cnt"))
                & (F.col(f"_tag{i}") == _TAG_XRESOLUTION),
                F.col(f"_v4_{i}"),
            )
            for i in range(EXIF_MAX_IFD_ENTRIES)
        ]
    )
    media = media.select("*", ori.alias("_ori"), xoff.alias("_xoff"))
    media = media.select(
        "*",
        F.when(F.col("_xoff").isNotNull(), rd(F.col("_xoff"), 4)).alias("_num"),
        F.when(F.col("_xoff").isNotNull(), rd(F.col("_xoff") + 4, 4)).alias(
            "_den"
        ),
    )
    has_exif, cnt = F.col("_has_exif"), F.col("_cnt")
    num, den = F.col("_num"), F.col("_den")
    return media.select(
        "media_id",
        F.col("_is_jpeg").alias("is_jpeg"),
        has_exif.alias("has_exif"),
        F.when(
            has_exif, F.when(F.col("_le"), F.lit("II")).otherwise(F.lit("MM"))
        ).alias("byte_order"),
        F.when(has_exif, cnt).alias("n_ifd_entries"),
        F.when(has_exif, F.col("_ori")).alias("orientation"),
        F.when(has_exif, num).alias("xres_num"),
        F.when(has_exif, den).alias("xres_den"),
        F.when(
            has_exif & den.isNotNull() & (den > 0),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("xresolution"),
    )


def _parse_exif_headers_catalyst(
    media: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """The original fold-based probe — kept as the reference twin
    for the differential fuzz tests pinning the unrolled locator and
    the byte-positional TIFF reads."""
    media = media.select("media_id", F.hex(F.col(payload_col)).alias("_h"))
    h = F.col("_h")

    init = F.struct(
        F.lit(5).cast("int").alias("pos"),
        F.lit(0).cast("int").alias("app1"),
    )

    def step(acc, _):
        pos, app1 = acc["pos"], acc["app1"]
        marker = h.substr(pos, F.lit(4))
        seg_len = F.conv(h.substr(pos + 4, F.lit(4)), 16, 10).cast("int")
        done = (app1 > 0) | (pos + 3 > F.length(h)) | marker.isin("FFD9", "FFDA")
        is_app1 = marker == "FFE1"
        return F.struct(
            F.when(done | is_app1, pos).otherwise(pos + 4 + seg_len * 2)
            .cast("int").alias("pos"),
            F.when(is_app1 & (app1 == 0), pos).otherwise(app1)
            .cast("int").alias("app1"),
        )

    state = F.aggregate(F.sequence(F.lit(1), F.lit(EXIF_WALK_SEGMENTS)), init, step)
    # STAGED projections from here on: Catalyst does no common-sub-
    # expression elimination inside one expression tree, so inlining
    # rd(rd(...)) (Column-valued offsets) squares the tree at every
    # hop and the generated method blows past the 64 KB JVM codegen
    # limit into the interpreted fallback (measured 36s -> 1s on the
    # registered probe). Each stage materializes the offsets the next
    # stage reads, keeping every projection small and codegen-able.
    media = media.select("media_id", "_h", state["app1"].alias("_app1"))
    h, app1 = F.col("_h"), F.col("_app1")

    def rd(byte_off, nbytes: int, le=None):
        le = F.col("_le") if le is None else le
        # clamp hostile offsets: an APP1 segment caps at 64 KiB, so
        # any larger TIFF offset is garbage — without the clamp a
        # crafted 32-bit offset overflows substr's int position
        # (ANSI CAST_OVERFLOW) instead of reading as NULL
        off = F.least(byte_off.cast("long"), F.lit(131_072))
        pos = (F.col("_t") + off * 2).cast("int")
        be = h.substr(pos, F.lit(2 * nbytes))
        pairs = [h.substr(pos + 2 * i, F.lit(2)) for i in range(nbytes)]
        return F.conv(
            F.when(le, F.concat(*reversed(pairs))).otherwise(be), 16, 10
        ).cast("long")

    media = media.select(
        "media_id",
        "_h",
        "_app1",
        (h.substr(F.lit(1), F.lit(4)) == "FFD8").alias("_is_jpeg"),
        (app1 + 20).alias("_t"),  # 1-indexed hex pos of the TIFF header
    )
    media = media.select(
        "*",
        (
            F.col("_is_jpeg")
            & (app1 > 0)
            & (h.substr(app1 + 8, F.lit(12)) == _EXIF_MAGIC_HEX)
        ).alias("_has_exif"),
        (h.substr(F.col("_t"), F.lit(4)) == "4949").alias("_le"),
    )
    media = media.select("*", rd(F.lit(4).cast("long"), 4).alias("_ifd0"))
    media = media.select("*", rd(F.col("_ifd0"), 2).alias("_cnt"))
    # one small projection per IFD entry: tag + both value reads
    entry_cols = []
    for i in range(EXIF_MAX_IFD_ENTRIES):
        eoff = F.col("_ifd0") + 2 + 12 * i
        entry_cols.extend(
            [
                rd(eoff, 2).alias(f"_tag{i}"),
                rd(eoff + 8, 2).alias(f"_v2_{i}"),
                rd(eoff + 8, 4).alias(f"_v4_{i}"),
            ]
        )
    media = media.select("*", *entry_cols)
    ori = F.coalesce(
        *[
            F.when(
                (F.lit(i) < F.col("_cnt"))
                & (F.col(f"_tag{i}") == _TAG_ORIENTATION),
                F.col(f"_v2_{i}"),
            )
            for i in range(EXIF_MAX_IFD_ENTRIES)
        ]
    )
    xoff = F.coalesce(
        *[
            F.when(
                (F.lit(i) < F.col("_cnt"))
                & (F.col(f"_tag{i}") == _TAG_XRESOLUTION),
                F.col(f"_v4_{i}"),
            )
            for i in range(EXIF_MAX_IFD_ENTRIES)
        ]
    )
    media = media.select("*", ori.alias("_ori"), xoff.alias("_xoff"))
    media = media.select(
        "*",
        F.when(F.col("_xoff").isNotNull(), rd(F.col("_xoff"), 4)).alias("_num"),
        F.when(F.col("_xoff").isNotNull(), rd(F.col("_xoff") + 4, 4)).alias(
            "_den"
        ),
    )
    has_exif, cnt = F.col("_has_exif"), F.col("_cnt")
    num, den = F.col("_num"), F.col("_den")
    return media.select(
        "media_id",
        F.col("_is_jpeg").alias("is_jpeg"),
        has_exif.alias("has_exif"),
        F.when(
            has_exif, F.when(F.col("_le"), F.lit("II")).otherwise(F.lit("MM"))
        ).alias("byte_order"),
        F.when(has_exif, cnt).alias("n_ifd_entries"),
        F.when(has_exif, F.col("_ori")).alias("orientation"),
        F.when(has_exif, num).alias("xres_num"),
        F.when(has_exif, den).alias("xres_den"),
        F.when(
            has_exif & den.isNotNull() & (den > 0),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("xresolution"),
    )


def synthesize_flac_pcm(events: DataFrame) -> DataFrame:
    """Deterministic FLAC payloads carrying the SAME full-range
    pseudo-noise waveform as synthesize_wav_pcm (n = event_id%32+8
    samples of ((eid*6151 + i*32917) % 65536) - [65536 if >= 32768]),
    ENCODED through the real entropy coder (operators/flac_codec —
    rice residuals, CRC chain, MD5). Arrow-batched mapInPandas: the
    encode is genuinely per-row Python, the sanctioned multimodal
    seam. Only (media_id, payload) survive."""
    import pandas as _pd

    from timescaledb_event_streamer_spark.operators.flac_codec import (
        flac_encode,
    )

    n_shuffle = int(
        events.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    src = events.repartition(n_shuffle, "event_id").select(
        F.col("event_id").alias("media_id"),
        (F.col("event_id") % 32 + 8).alias("n"),
        F.element_at(
            F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
            (F.pmod(F.col("user_id"), 3) + 1).cast("int"),
        ).alias("rate"),
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for eid, n, rate in zip(pdf["media_id"], pdf["n"], pdf["rate"]):
                i = np.arange(int(n), dtype=np.int64)
                v = (int(eid) * 6151 + i * 32917) % 65536
                v = np.where(v >= 32768, v - 65536, v).astype(np.int16)
                payloads.append(flac_encode(v, int(rate)))
            yield _pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return src.mapInPandas(encode, "media_id LONG, payload BINARY")


_PCM_STATS_SCHEMA = (
    "media_id LONG, is_flac BOOLEAN, n_samples LONG, "
    "sample_rate LONG, duration_ms LONG, peak_abs LONG, "
    "sum_samples LONG, energy LONG, zero_crossings LONG"
)


def _flac_stat_row(mid, raw: bytes) -> dict:
    """One G15 output row from FLAC bytes (shared by the two-stage
    and fused seams)."""
    from timescaledb_event_streamer_spark.operators.flac_codec import (
        FLAC_MAGIC,
        flac_decode,
    )

    if not raw.startswith(FLAC_MAGIC):
        return {
            "media_id": mid, "is_flac": False,
            "n_samples": None, "sample_rate": None,
            "duration_ms": None, "peak_abs": None,
            "sum_samples": None, "energy": None,
            "zero_crossings": None,
        }
    arr, rate = flac_decode(raw)
    x = arr[:, 0].astype(np.int64)
    return {
        "media_id": mid,
        "is_flac": True,
        "n_samples": len(x),
        "sample_rate": rate,
        "duration_ms": len(x) * 1000 // rate,
        "peak_abs": int(np.abs(x).max()),
        "sum_samples": int(x.sum()),
        "energy": int((x * x).sum()),
        "zero_crossings": int(((x[:-1] * x[1:]) < 0).sum()),
    }


def flac_pcm_stats(media: DataFrame) -> DataFrame:
    """PCM signal statistics from FLAC bytes (G15): the G6 feature
    contract (peak / DC sum / energy / zero-crossings — all exact
    integers) computed from REAL entropy-decoded samples via the
    Arrow-batched decode seam. Losslessness means the numbers equal
    the WAV path's on identical samples — pinned in pytest AND by
    the oracle re-deriving every statistic from the generator rule,
    so an encode/decode bug pair cannot cancel unless it is an exact
    roundtrip identity (which the codec's fuzz battery guards)."""
    import pandas as _pd

    def stats(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                [
                    _flac_stat_row(mid, bytes(payload))
                    for mid, payload in zip(pdf["media_id"], pdf["payload"])
                ]
            )

    return media.mapInPandas(stats, _PCM_STATS_SCHEMA)


def flac_pcm_roundtrip_stats(events: DataFrame) -> DataFrame:
    """Fused G15 path (r11): synthesize_flac_pcm >> flac_pcm_stats in
    ONE Arrow seam. The two-stage form ships every entropy-coded
    payload JVM -> Python (encode) -> JVM -> Python (decode) -> JVM;
    fusing encodes AND decodes inside the same task, so the payload
    bytes never cross the boundary at all and only the 9 stat
    columns come back. Row-for-row identical to the composition
    (same generator, same codec, same `_flac_stat_row`) — pinned by
    a pytest parity check."""
    import pandas as _pd

    from timescaledb_event_streamer_spark.operators.flac_codec import (
        flac_encode,
    )

    n_shuffle = int(
        events.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    src = events.repartition(n_shuffle, "event_id").select(
        F.col("event_id").alias("media_id"),
        (F.col("event_id") % 32 + 8).alias("n"),
        F.element_at(
            F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
            (F.pmod(F.col("user_id"), 3) + 1).cast("int"),
        ).alias("rate"),
    )

    def roundtrip(batches):
        for pdf in batches:
            rows = []
            for eid, n, rate in zip(pdf["media_id"], pdf["n"], pdf["rate"]):
                i = np.arange(int(n), dtype=np.int64)
                v = (int(eid) * 6151 + i * 32917) % 65536
                v = np.where(v >= 32768, v - 65536, v).astype(np.int16)
                rows.append(
                    _flac_stat_row(int(eid), flac_encode(v, int(rate)))
                )
            yield _pd.DataFrame(rows)

    return src.mapInPandas(roundtrip, _PCM_STATS_SCHEMA)


def synthesize_adpcm_pcm(events: DataFrame) -> DataFrame:
    """Deterministic IMA-ADPCM payloads (G17) carrying the SAME
    pseudo-noise waveform as synthesize_wav_pcm / synthesize_flac_pcm
    (n = event_id%32+8 samples of ((eid*6151 + i*32917) % 65536)
    sign-folded), encoded through the real LOSSY coder
    (operators/adpcm_codec — 4-bit quantized residuals, per-block
    predictor state, fact-chunk sample count). Arrow-batched
    mapInPandas, the sanctioned multimodal seam; only
    (media_id, payload) survive."""
    import pandas as _pd

    from timescaledb_event_streamer_spark.operators.adpcm_codec import (
        adpcm_encode,
    )

    n_shuffle = int(
        events.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    src = events.repartition(n_shuffle, "event_id").select(
        F.col("event_id").alias("media_id"),
        (F.col("event_id") % 32 + 8).alias("n"),
        F.element_at(
            F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
            (F.pmod(F.col("user_id"), 3) + 1).cast("int"),
        ).alias("rate"),
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for eid, n, rate in zip(pdf["media_id"], pdf["n"], pdf["rate"]):
                i = np.arange(int(n), dtype=np.int64)
                v = (int(eid) * 6151 + i * 32917) % 65536
                v = np.where(v >= 32768, v - 65536, v).astype(np.int16)
                payloads.append(adpcm_encode(v, int(rate)))
            yield _pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return src.mapInPandas(encode, "media_id LONG, payload BINARY")


def adpcm_pcm_stats(media: DataFrame) -> DataFrame:
    """PCM signal statistics + reconstruction error from IMA-ADPCM
    bytes (G17): the G6 feature contract computed from LOSSY-decoded
    samples, plus the exact integer squared reconstruction error
    against the original generator waveform (recomputed from
    media_id) — the column that MEASURES what the 4-bit quantizer
    lost, the honest difference from the lossless G15 sibling. All
    integers, deterministic, rows-only certified (a DuckDB oracle
    cannot run the sequential step-table state machine); the decode
    itself is pinned exact in tests/test_adpcm.py."""
    import pandas as _pd

    def stats(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                [
                    _adpcm_stat_row(mid, bytes(payload))
                    for mid, payload in zip(pdf["media_id"], pdf["payload"])
                ]
            )

    return media.mapInPandas(stats, _ADPCM_STATS_SCHEMA)


_ADPCM_STATS_SCHEMA = (
    "media_id LONG, is_adpcm BOOLEAN, n_samples LONG, "
    "sample_rate LONG, peak_abs LONG, sum_samples LONG, "
    "energy LONG, zero_crossings LONG, sq_error LONG"
)


def _adpcm_stat_row(mid, raw: bytes) -> dict:
    """One G17 output row from IMA-ADPCM bytes (shared by the
    two-stage and fused seams). A structurally valid payload whose
    fact chunk declares zero samples decodes to an empty list —
    treated as not-ADPCM like any other rejection instead of letting
    np.abs([]).max() blow up the whole task (r10 advice)."""
    from timescaledb_event_streamer_spark.operators.adpcm_codec import (
        adpcm_decode,
    )

    try:
        out, rate = adpcm_decode(raw)
    except ValueError:
        out, rate = [], 0
    if len(out) == 0:
        return {
            "media_id": mid, "is_adpcm": False,
            "n_samples": None, "sample_rate": None,
            "peak_abs": None, "sum_samples": None,
            "energy": None, "zero_crossings": None,
            "sq_error": None,
        }
    x = np.asarray(out, dtype=np.int64)
    i = np.arange(len(x), dtype=np.int64)
    ref = (int(mid) * 6151 + i * 32917) % 65536
    ref = np.where(ref >= 32768, ref - 65536, ref)
    return {
        "media_id": mid,
        "is_adpcm": True,
        "n_samples": len(x),
        "sample_rate": rate,
        "peak_abs": int(np.abs(x).max()),
        "sum_samples": int(x.sum()),
        "energy": int((x * x).sum()),
        "zero_crossings": int(((x[:-1] * x[1:]) < 0).sum()),
        "sq_error": int(((x - ref) ** 2).sum()),
    }


def adpcm_pcm_roundtrip_stats(events: DataFrame) -> DataFrame:
    """Fused G17 path (r11): synthesize_adpcm_pcm >> adpcm_pcm_stats
    in ONE Arrow seam (the flac_pcm_roundtrip_stats rationale — the
    payload bytes never cross the JVM boundary). Row-identical to
    the composition; parity pinned in tests/test_multimodal.py."""
    import pandas as _pd

    from timescaledb_event_streamer_spark.operators.adpcm_codec import (
        adpcm_encode,
    )

    n_shuffle = int(
        events.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    src = events.repartition(n_shuffle, "event_id").select(
        F.col("event_id").alias("media_id"),
        (F.col("event_id") % 32 + 8).alias("n"),
        F.element_at(
            F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
            (F.pmod(F.col("user_id"), 3) + 1).cast("int"),
        ).alias("rate"),
    )

    def roundtrip(batches):
        for pdf in batches:
            rows = []
            for eid, n, rate in zip(pdf["media_id"], pdf["n"], pdf["rate"]):
                i = np.arange(int(n), dtype=np.int64)
                v = (int(eid) * 6151 + i * 32917) % 65536
                v = np.where(v >= 32768, v - 65536, v).astype(np.int16)
                rows.append(
                    _adpcm_stat_row(int(eid), adpcm_encode(v, int(rate)))
                )
            yield _pd.DataFrame(rows)

    return src.mapInPandas(roundtrip, _ADPCM_STATS_SCHEMA)


def synthesize_bmp_images(events: DataFrame) -> DataFrame:
    """Deterministic 9x8 grayscale BMP payloads: pixel(r, c) =
    (event_id*31 + r*17 + c*7) % 256, encoded through the REAL BMP
    coder (operators/bmp_codec — paletted 8-bit, bottom-up padded
    rows). Arrow-batched mapInPandas; only (media_id, payload)
    survive — the G15 synth pattern applied to images."""
    import pandas as _pd

    from timescaledb_event_streamer_spark.operators.bmp_codec import (
        bmp_encode,
    )

    n_shuffle = int(
        events.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    src = events.repartition(n_shuffle, "event_id").select(
        F.col("event_id").alias("media_id")
    )

    def encode(batches):
        r = np.arange(8)[:, None]
        c = np.arange(9)[None, :]
        for pdf in batches:
            payloads = [
                bmp_encode(
                    ((int(mid) * 31 + r * 17 + c * 7) % 256).astype(
                        np.uint8
                    )
                )
                for mid in pdf["media_id"]
            ]
            yield _pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return src.mapInPandas(encode, "media_id LONG, payload BINARY")


def bmp_dhash(media: DataFrame) -> DataFrame:
    """Difference-hash fingerprints from BMP bytes (G16): decode
    through the real codec, then the standard dHash (adjacent-column
    gradient signs over a 9-wide/8-tall grayscale grid -> 64 bits,
    rendered as 16 hex chars) and aHash (pixel >= integer mean).
    Exact integer comparisons throughout, so the fingerprints — and
    therefore the full decode path — value-certify against an
    oracle that re-derives them from the synthesis rule."""
    import pandas as _pd

    from timescaledb_event_streamer_spark.operators.bmp_codec import (
        BMP_MAGIC,
        bmp_decode,
    )

    def hash_batch(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if not raw.startswith(BMP_MAGIC):
                    rows.append(
                        {
                            "media_id": mid, "is_bmp": False,
                            "width": None, "height": None,
                            "dhash_bits": None, "ahash_bits": None,
                        }
                    )
                    continue
                img = bmp_decode(raw)
                g = img[:, :, 0].astype(np.int64)
                h, w = g.shape
                dbits = (g[:, :-1] > g[:, 1:]).ravel()
                mean = int(g.sum()) // (h * w)  # integer floor-mean
                abits = (g >= mean).ravel()
                rows.append(
                    {
                        "media_id": mid,
                        "is_bmp": True,
                        "width": w,
                        "height": h,
                        "dhash_bits": "".join(
                            "1" if b else "0" for b in dbits
                        ),
                        "ahash_bits": "".join(
                            "1" if b else "0" for b in abits
                        ),
                    }
                )
            yield _pd.DataFrame(rows)

    return media.mapInPandas(
        hash_batch,
        "media_id LONG, is_bmp BOOLEAN, width INT, height INT, "
        "dhash_bits STRING, ahash_bits STRING",
    )
