"""Round-7 additions: the continuous-aggregate scheduled-refresh
policy planner (B76) and companions.

Reference motivation: the one reference test without a named operator
mapping before this round — Test_ContinuousAggregate_Scheduled_Refresh
_Create_Events (tests/streamer_test.go:1235) drives a bgw_job
refresh policy (`alter_job(j.id, next_start => now() + interval '5
seconds')`) and asserts the refreshed buckets stream out in order.
The policy itself is TimescaleDB's add_continuous_aggregate_policy
(start_offset / end_offset / schedule_interval): each scheduled run
refreshes the COMPLETE buckets inside the bucket-aligned window
[now - start_offset, now - end_offset) that invalidation records mark
dirty, then reschedules itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load

#: policy geometry for the planner query: hourly buckets, refresh
#: the last 7 days up to the last complete hour, run hourly
_BUCKET_S = 3600
_START_OFFSET_S = 7 * 86400
_END_OFFSET_S = 3600
_SCHEDULE_INTERVAL_S = 3600

_SQL_EPOCH_S = "(epoch_us(ts) // 1000000)"
_SQL_BUCKET = f"({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {_BUCKET_S})"


@register(
    "ts_cagg_refresh_policy",
    family="timeseries",
    doc="Scheduled continuous-aggregate refresh policy planner (B76, "
    "reference test Test_ContinuousAggregate_Scheduled_Refresh_"
    "Create_Events, tests/streamer_test.go:1235): given the policy "
    "(start_offset 7d, end_offset 1h, schedule_interval 1h) and the "
    "invalidation watermark, produce the buckets-to-refresh plan one "
    "policy run executes — per (hypertable, bucket): row count, last "
    "write LSN, invalidated (written after the cagg's last "
    "materialization), inside the bucket-aligned refresh window "
    "[now-start_offset, now-end_offset) counting only COMPLETE "
    "buckets, the refresh verdict, and the run's next_start (the "
    "alter_job next_start the reference test drives). The refresh "
    "itself is B20's partial merge; this plans WHAT it touches. "
    "Scale: one scan -> (hypertable, bucket)-keyed aggregate "
    "(map-side combinable), scalar policy row broadcast — output is "
    "bucket-grain metadata, never row-grain.",
    oracle=f"""
        WITH pol AS (
            SELECT max({_SQL_EPOCH_S}) AS now_s,
                   max(event_id) * 9 // 10 AS mat_lsn
            FROM events
        ),
        buckets AS (
            SELECT event_type AS hypertable,
                   {_SQL_BUCKET} AS bucket_s,
                   count(*) AS n_rows,
                   max(event_id) AS last_lsn
            FROM events
            GROUP BY 1, 2
        )
        SELECT b.hypertable, b.bucket_s,
               CAST(b.n_rows AS BIGINT) AS n_rows,
               b.last_lsn,
               b.last_lsn > p.mat_lsn AS invalidated,
               b.bucket_s >= (p.now_s - {_START_OFFSET_S})
                   - (p.now_s - {_START_OFFSET_S}) % {_BUCKET_S}
               AND b.bucket_s + {_BUCKET_S}
                   <= (p.now_s - {_END_OFFSET_S})
                      - (p.now_s - {_END_OFFSET_S}) % {_BUCKET_S}
                   AS in_window,
               (b.last_lsn > p.mat_lsn)
               AND b.bucket_s >= (p.now_s - {_START_OFFSET_S})
                   - (p.now_s - {_START_OFFSET_S}) % {_BUCKET_S}
               AND b.bucket_s + {_BUCKET_S}
                   <= (p.now_s - {_END_OFFSET_S})
                      - (p.now_s - {_END_OFFSET_S}) % {_BUCKET_S}
                   AS needs_refresh,
               (p.now_s - {_START_OFFSET_S})
                   - (p.now_s - {_START_OFFSET_S}) % {_BUCKET_S}
                   AS window_start_s,
               (p.now_s - {_END_OFFSET_S})
                   - (p.now_s - {_END_OFFSET_S}) % {_BUCKET_S}
                   AS window_end_s,
               p.now_s + {_SCHEDULE_INTERVAL_S} AS next_start_s
        FROM buckets b CROSS JOIN pol p
    """,
)
def ts_cagg_refresh_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    es = F.expr("unix_micros(ts) div 1000000")
    # policy scalars: "now" pinned to the newest point (deterministic),
    # materialization watermark at the 90th-percentile LSN so both
    # invalidated branches coexist inside the refresh window
    pol = events.agg(
        F.max(es).alias("now_s"),
        F.expr("max(event_id) * 9 div 10").alias("mat_lsn"),
    )
    buckets = (
        events.select(
            F.col("event_type").alias("hypertable"),
            (es - es % _BUCKET_S).alias("bucket_s"),
            "event_id",
        )
        .groupBy("hypertable", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("event_id").alias("last_lsn"),
        )
    )
    raw_start = F.col("now_s") - _START_OFFSET_S
    raw_end = F.col("now_s") - _END_OFFSET_S
    win_start = raw_start - raw_start % _BUCKET_S
    win_end = raw_end - raw_end % _BUCKET_S
    invalidated = F.col("last_lsn") > F.col("mat_lsn")
    in_window = (F.col("bucket_s") >= win_start) & (
        F.col("bucket_s") + _BUCKET_S <= win_end
    )
    return buckets.crossJoin(F.broadcast(pol)).select(
        "hypertable",
        "bucket_s",
        "n_rows",
        "last_lsn",
        invalidated.alias("invalidated"),
        in_window.alias("in_window"),
        (invalidated & in_window).alias("needs_refresh"),
        win_start.alias("window_start_s"),
        win_end.alias("window_end_s"),
        (F.col("now_s") + _SCHEDULE_INTERVAL_S).alias("next_start_s"),
    )
