"""Round-10 registered queries.

Continues the SURVEY.md §2 build-out. Reference attributions sit on
each query's docstring; oracles follow the rules in
plans/queries_olap.py (aliases, HALF_UP rounding, BIGINT casts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load, spread

# ---------------------------------------------------------------------------
# G17 media_adpcm_pcm_stats — lossy-compressed audio feature extraction


@register(
    "media_adpcm_pcm_stats",
    family="multimodal",
    doc="PCM statistics + exact reconstruction error from IMA-ADPCM "
    "bytes (G17) — the first LOSSY compressed audio path (4-bit "
    "quantized residuals, operators/adpcm_codec; the multimodal "
    "gate's honest step past the ffmpeg-gated codecs, "
    "multimodal.py:147): the G6 waveform is encoded through the "
    "real coder and decoded back behind the Arrow seam; features "
    "are exact integers over the DECODED samples plus sq_error vs "
    "the original generator waveform — the column that measures "
    "what the quantizer lost. Rows-only by design: a DuckDB oracle "
    "cannot run the sequential step-table state machine; decode "
    "exactness is pinned against golden vectors + the hypothesis "
    "battery in tests/test_adpcm.py, and the lossless value-exact "
    "sibling is G15 media_flac_pcm_stats (same waveform, same "
    "feature fold, hash-green).",
)
def media_adpcm_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.multimodal import (
        adpcm_pcm_stats,
        synthesize_adpcm_pcm,
    )

    events = load(spark, sf_dir, "events")
    return adpcm_pcm_stats(synthesize_adpcm_pcm(events))
