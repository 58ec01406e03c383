"""LLM / multimodal pipeline queries, part 5 (SURVEY.md §2, round-5
continuation 3): audio silence segmentation over the real PCM decode
path, and corpus word-association mining.

Registered AFTER the round-5 certification-waitlist freeze, so the
rotation (plans/registry.py) schedules these behind the 47 queries
already waiting for driver certification — they certify in round 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load


@register(
    "media_wav_silence",
    family="multimodal",
    doc="Silence-run segmentation from WAV PCM bytes (G7, extending "
    "G6's codec-free real decode): per payload, the leading/trailing "
    "silence trim offsets, silence-separated loud-segment count, "
    "longest silent run, and total silent samples — the features an "
    "audio training-data pipeline needs to trim and filter clips "
    "before a decode fleet ever runs. One narrow codegen projection "
    "per row, single capped integer left-fold, no shuffle. The "
    "oracle re-derives every statistic from the waveform generator "
    "formula via gaps-and-islands SQL — a completely different "
    "construction (windows over exploded samples vs a sequential "
    "fold), so a fold-state bug cannot cancel out.",
    oracle="""
        WITH src AS (
            SELECT event_id,
                   event_id % 32 + 8 AS n,
                   list_transform(
                       range(event_id % 32 + 8),
                       i -> CASE
                           WHEN (event_id * 6151 + i * 32917) % 65536 >= 32768
                           THEN (event_id * 6151 + i * 32917) % 65536 - 65536
                           ELSE (event_id * 6151 + i * 32917) % 65536
                       END) AS s
            FROM events
        ),
        samp AS (
            SELECT event_id, n, i, abs(s[i + 1]) < 8192 AS silent
            FROM src, unnest(range(n)) AS u(i)
        ),
        flag AS (
            SELECT *,
                   lag(silent) OVER (
                       PARTITION BY event_id ORDER BY i
                   ) AS prev_silent
            FROM samp
        ),
        runs AS (
            SELECT event_id,
                   i - row_number() OVER (
                       PARTITION BY event_id ORDER BY i
                   ) AS grp
            FROM samp WHERE silent
        ),
        longest AS (
            SELECT event_id, CAST(max(len) AS BIGINT) AS longest
            FROM (
                SELECT event_id, grp, count(*) AS len
                FROM runs GROUP BY 1, 2
            ) GROUP BY 1
        ),
        agg AS (
            SELECT event_id,
                   any_value(n) AS n,
                   CAST(coalesce(min(i) FILTER (NOT silent),
                                 any_value(n)) AS BIGINT) AS lead_silence,
                   CAST(coalesce(any_value(n) - 1 - max(i) FILTER (NOT silent),
                                 any_value(n)) AS BIGINT) AS trail_silence,
                   CAST(count(*) FILTER (
                       NOT silent AND (prev_silent IS NULL OR prev_silent)
                   ) AS BIGINT) AS n_segments,
                   CAST(count(*) FILTER (silent) AS BIGINT) AS n_silent
            FROM flag GROUP BY event_id
        )
        SELECT a.event_id AS media_id,
               true AS is_pcm_wav,
               CAST(a.n AS BIGINT) AS n_samples,
               a.lead_silence,
               a.trail_silence,
               a.n_segments,
               coalesce(l.longest, 0) AS longest_silence,
               a.n_silent
        FROM agg a LEFT JOIN longest l ON a.event_id = l.event_id
    """,
)
def media_wav_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.multimodal import (
        synthesize_wav_pcm,
        wav_silence_segments,
    )

    events = load(spark, sf_dir, "events")
    return wav_silence_segments(synthesize_wav_pcm(events))
