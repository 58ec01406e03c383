"""Multimodal column plumbing (SURVEY.md §2.G): image/audio/video as
opaque binary columns with typed metadata, processed by Arrow-batched
mapInPandas.

The decode step itself is environment-gated: real codecs (PIL,
ffmpeg, torchaudio) are not in this container, so `decoder="real"`
raises NotImplementedError at the exact seam where they plug in,
and `decoder="stub"` runs a deterministic fake that exercises the
production-relevant parts — schema, binary payload transport through
Arrow, batch shapes, and partition-parallel feature extraction.

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
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg/torchaudio; "
                    "plug the codec in here"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "features": payloads.map(lambda b: _stub_features(b).tolist()),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


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
                raise NotImplementedError(
                    "real image resize requires PIL; plug Image.open/thumbnail in here"
                )
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
MAGIC_SIGNATURES = (
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # WAV/AVI/WebP share the RIFF container
    ("66747970", "mp4", 8),  # 'ftyp' at byte offset 4
    ("494433", "mp3"),
    ("1A45DFA3", "webm"),
)


def sniff_format(payload_col) -> "F.Column":
    """Container format of a binary payload by magic bytes, as a pure
    codegen expression (hex-prefix compare). Unknown -> 'unknown'.

    Mirrors the typed-metadata contract: routing/filtering by format
    happens BEFORE any decode, so a 100 TB media scan that only wants
    PNGs prunes everything else at projection cost."""
    head = F.hex(payload_col).substr(F.lit(1), F.lit(24))
    expr = F.lit("unknown")
    for sig in reversed(MAGIC_SIGNATURES):
        pattern, name = sig[0], sig[1]
        offset = sig[2] if len(sig) > 2 else 0
        expr = F.when(
            head.substr(F.lit(offset + 1), F.lit(len(pattern))) == pattern,
            F.lit(name),
        ).otherwise(expr)
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
