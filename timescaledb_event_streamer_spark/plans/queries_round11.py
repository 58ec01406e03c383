"""Round-11 registered queries.

Continues the SURVEY.md §2 build-out. Reference attributions sit on
each query's docstring; oracles follow the rules in
plans/queries_olap.py (aliases, HALF_UP rounding, BIGINT casts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load

# ---------------------------------------------------------------------------
# G18 media_mp4_probe — ISO-BMFF decoder-free video-container probe


@register(
    "media_mp4_probe",
    family="multimodal",
    doc="Decoder-free MP4/ISO-BMFF probe (G18, operators/"
    "mp4_probe.py): the G5/G10 bounded-walk pattern applied to the "
    "video container — ONE linear F.aggregate walks the box tree "
    "(containers entered by +8 bytes, leaves skipped by their "
    "declared size) and reads movie duration/timescale (mvhd), "
    "track count and the first video track's real 16.16 "
    "dimensions (tkhd), and per-track codec fourccs (stsd sample "
    "entries) — everything a 100 TB media lake needs to ROUTE "
    "video (transcode fleet sizing, codec inventory, resolution "
    "pruning) at projection cost, with the entropy-coded payload "
    "untouched (decode stays honestly ffmpeg-gated, "
    "multimodal.py:147). Synthesis varies box layout per row "
    "(optional free box, 1-2 compatible brands, 1-2 traks) and "
    "exposes only the bytes; the oracle re-derives every field "
    "from the generating columns, so a walk bug cannot cancel out "
    "(the G5 adjudication). duration_ms uses exact "
    "numerator-divisible division, engine-identical with integer //.",
    oracle="""
        WITH g AS (
            SELECT event_id, user_id,
                   CASE user_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
                        ELSE 90000 END AS ts,
                   (event_id % 9000 + 1) * 100 AS dur
            FROM events
        )
        SELECT event_id AS media_id,
               TRUE AS is_mp4,
               CASE event_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
                    ELSE 'mp41' END AS major_brand,
               CAST(ts AS BIGINT) AS timescale,
               CAST(dur AS BIGINT) AS duration,
               CAST(dur * 1000 // ts AS BIGINT) AS duration_ms,
               CAST(event_id % 2 + 1 AS BIGINT) AS n_tracks,
               CAST(user_id % 1920 + 16 AS BIGINT) AS width,
               CAST(event_id % 1080 + 16 AS BIGINT) AS height,
               CASE WHEN event_id % 2 = 0 THEN 'avc1' ELSE 'hev1' END
                   AS video_codec,
               CASE WHEN event_id % 2 = 1 THEN 'mp4a' END AS audio_codec,
               CAST(CASE WHEN event_id % 2 = 0 THEN 11 ELSE 17 END
                   AS BIGINT) AS n_boxes
        FROM g
    """,
)
def media_mp4_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.mp4_probe import (
        parse_mp4_headers,
        synthesize_mp4_headers,
    )

    return parse_mp4_headers(synthesize_mp4_headers(load(spark, sf_dir, "events")))
