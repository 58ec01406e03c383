"""TimescaleDB analytics, part 3 (SURVEY.md §2.B45+): round-4
additions to the hypertable/toolkit surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.functions.timeseries import time_bucket_epoch
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load

_SQL_EPOCH_S = "(epoch_us(ts) // 1000000)"
_SQL_TS_MS = "CAST(epoch_us(ts) // 1000 AS BIGINT)"
SIX_HOURS = 6 * 3600


@register(
    "ts_downsample_minmax",
    family="timeseries",
    doc="Min/max plot downsample: per series and 6-hour pixel bucket, "
    "keep the extreme points WITH their timestamps — the rendering "
    "downsample (Grafana-style) that, unlike LTTB (B19), is a pure "
    "associative aggregate: min/max over (value, ts) structs in ONE "
    "shuffle with map-side partials, so it rolls up hierarchically "
    "exactly like a cagg. Ties break deterministically on the "
    "timestamp (lexicographic struct order; the oracle mirrors it "
    "with a two-key row_number).",
    oracle=f"""
        WITH b AS (
            SELECT event_type,
                   ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {SIX_HOURS}) AS bucket_s,
                   value,
                   {_SQL_TS_MS} AS ts_ms
            FROM events
        ),
        r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY event_type, bucket_s
                                      ORDER BY value ASC, ts_ms ASC) AS rmin,
                   row_number() OVER (PARTITION BY event_type, bucket_s
                                      ORDER BY value DESC, ts_ms DESC) AS rmax
            FROM b
        )
        SELECT event_type AS series,
               bucket_s,
               count(*) AS n_points,
               max(CASE WHEN rmin = 1 THEN value END) AS v_min,
               max(CASE WHEN rmin = 1 THEN ts_ms END) AS ts_min_ms,
               max(CASE WHEN rmax = 1 THEN value END) AS v_max,
               max(CASE WHEN rmax = 1 THEN ts_ms END) AS ts_max_ms
        FROM r
        GROUP BY 1, 2
    """,
)
def ts_downsample_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    ts_ms = (F.unix_micros(F.col("ts")) / 1000).cast("long")
    pt = F.struct(F.col("value"), ts_ms.alias("ts_ms"))
    return (
        events.select(
            F.col("event_type").alias("series"),
            time_bucket_epoch(F.col("ts"), SIX_HOURS).alias("bucket_s"),
            pt.alias("pt"),
        )
        .groupBy("series", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("pt").getField("value").alias("v_min"),
            F.min("pt").getField("ts_ms").alias("ts_min_ms"),
            F.max("pt").getField("value").alias("v_max"),
            F.max("pt").getField("ts_ms").alias("ts_max_ms"),
        )
    )
