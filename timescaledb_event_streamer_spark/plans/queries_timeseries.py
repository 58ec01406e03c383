"""TimescaleDB analytics queries (SURVEY.md §2.B): the hypertable /
continuous-aggregate surface the reference's ecosystem serves.

All buckets are epoch-floor (see catalog/chunks.py origin note) and
emitted both as BIGINT epoch seconds and as a timestamp column so
the oracle checks the full path. Float aggregates are rounded
identically on both sides (see plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.functions.timeseries import (
    gapfill_buckets_auto,
    gapfill_locf_folded,
    locf,
    time_bucket_epoch,
)
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load

_SQL_EPOCH_S = "(epoch_us(ts) // 1000000)"


def _sql_bucket(width_s: int) -> str:
    return f"({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {width_s})"


HOUR = 3600
DAY = 86400


@register(
    "ts_time_bucket",
    family="timeseries",
    doc="time_bucket('1 hour') aggregation — a continuous aggregate refresh "
    "as batch. sum/avg ride on exact integer cents (value is 2-decimal by "
    "construction), so the result is independent of partition/summation "
    "order — float sums diverge from the oracle by 1 ulp at sf0.1+; the "
    "avg round is the engine-stable floor form (textstats.round_stable6).",
    oracle=f"""
        SELECT {_sql_bucket(HOUR)} AS bucket_s,
               CAST(to_timestamp({_sql_bucket(HOUR)}) AS TIMESTAMP) AS bucket,
               event_type,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value,
               floor(sum(CAST(round(value * 100) AS BIGINT)) * 10000.0
                     / count(*) + 0.5) / 1000000.0 AS avg_value,
               round(min(value), 2) AS min_value,
               round(max(value), 2) AS max_value
        FROM events
        GROUP BY 1, 2, 3
    """,
)
def ts_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    b = time_bucket_epoch(F.col("ts"), HOUR)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.withColumn("bucket_s", b)
        .withColumn("bucket", F.timestamp_seconds(F.col("bucket_s")))
        .withColumn("cents", cents)
        .groupBy("bucket_s", "bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("cents") / 100.0).alias("sum_value"),
            (F.floor(F.sum("cents") * 10000.0 / F.count(F.lit(1)) + 0.5) / 1000000.0)
            .alias("avg_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )


@register(
    "ts_first_last",
    family="timeseries",
    doc="first()/last() ordered aggregates per series (timescale first/last)",
    oracle="""
        SELECT event_type,
               min_by(value, ts) AS first_value,
               max_by(value, ts) AS last_value,
               min(ts) AS first_ts,
               max(ts) AS last_ts,
               count(*) AS n
        FROM events
        GROUP BY event_type
    """,
)
def ts_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.min_by("value", "ts").alias("first_value"),
        F.max_by("value", "ts").alias("last_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "ts_latest_point",
    family="timeseries",
    doc="Latest row per series (SELECT DISTINCT ON / timescale last-point)",
    oracle="""
        WITH ranked AS (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY event_type, user_id ORDER BY event_id DESC
                   ) AS rn
            FROM events
        )
        SELECT event_type, user_id, ts AS last_ts, value AS last_value, event_id AS last_lsn
        FROM ranked WHERE rn = 1
    """,
)
def ts_latest_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy(F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
            F.col("event_id").alias("last_lsn"),
        )
    )


@register(
    "ts_delta_rate",
    family="timeseries",
    doc="Counter delta/rate semantics via lag windows (timescale delta/rate)",
    oracle="""
        WITH d AS (
            SELECT event_type,
                   value - lag(value) OVER w AS delta,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dt_us
            FROM events
            WINDOW w AS (PARTITION BY event_type, user_id ORDER BY event_id)
        )
        SELECT event_type,
               count(*) AS n_deltas,
               round(avg(delta), 6) AS avg_delta,
               round(avg(delta / (dt_us / 1000000.0)), 6) AS avg_rate_per_s
        FROM d
        WHERE delta IS NOT NULL AND dt_us > 0
        GROUP BY event_type
    """,
)
def ts_delta_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("event_id")
    d = events.select(
        "event_type",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("dt_us"),
    )
    return (
        d.filter(F.col("delta").isNotNull() & (F.col("dt_us") > 0))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_deltas"),
            F.round(F.avg("delta"), 6).alias("avg_delta"),
            F.round(F.avg(F.col("delta") / (F.col("dt_us") / 1000000.0)), 6).alias(
                "avg_rate_per_s"
            ),
        )
    )


@register(
    "ts_chunk_pruning",
    family="timeseries",
    doc="Time-predicate chunk exclusion: the filter prunes parquet row groups / "
    "partitions (pushdown asserted in tests/test_plans.py)",
    oracle=f"""
        SELECT event_type,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
          AND ts < TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY event_type
    """,
)
def ts_chunk_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.filter(
            (F.col("ts") >= F.lit("2024-01-08 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "ts_cagg_rollup",
    family="timeseries",
    doc="Hierarchical continuous-aggregate rollup: hourly agg rolled up to daily "
    "(cagg-on-cagg). Map-side partials make the second agg shuffle tiny.",
    oracle=f"""
        SELECT {_sql_bucket(DAY)} AS bucket_day_s,
               event_type,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def ts_cagg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    hourly = (
        events.withColumn("bucket_h_s", time_bucket_epoch(F.col("ts"), HOUR))
        .groupBy("bucket_h_s", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )
    daily = (
        hourly.withColumn(
            "bucket_day_s",
            (F.col("bucket_h_s") - F.pmod(F.col("bucket_h_s"), F.lit(DAY))).cast("long"),
        )
        .groupBy("bucket_day_s", "event_type")
        .agg(F.sum("n").alias("n"), F.round(F.sum("sum_value"), 2).alias("sum_value"))
    )
    return daily


@register(
    "ts_gapfill_locf",
    family="timeseries",
    doc="time_bucket_gapfill + locf: dense daily grid per user for 'click', "
    "gaps carried forward",
    oracle=f"""
        WITH b AS (
            SELECT user_id,
                   {_sql_bucket(DAY)} AS bucket_s,
                   round(avg(value), 6) AS avg_value
            FROM events
            WHERE event_type = 'click'
            GROUP BY 1, 2
        ),
        bounds AS (
            SELECT min(bucket_s) AS lo, max(bucket_s) AS hi FROM b
        ),
        grid AS (
            SELECT u.user_id, g.bucket_s
            FROM (SELECT DISTINCT user_id FROM b) u
            CROSS JOIN (
                SELECT unnest(generate_series(lo, hi, {DAY})) AS bucket_s FROM bounds
            ) g
        )
        SELECT g.user_id,
               g.bucket_s,
               last_value(b.avg_value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket_s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS avg_value_locf
        FROM grid g
        LEFT JOIN b ON b.user_id = g.user_id AND b.bucket_s = g.bucket_s
    """,
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    # ONE user-keyed shuffle (the B16/B37 per-user-operator shape):
    # hashpartitioning(user_id) satisfies the (user_id, bucket)
    # clustering, so the bucket agg, the per-user pack and the LOCF
    # fold all run co-partitioned with no further exchange. Trade-off
    # vs shuffling bucket-grain partials: raw filtered events move
    # once — the same volume every per-user sequential operator
    # (sessionize, funnel) pays, and LOCF is inherently per-user
    # sequential. r9 rework: 2 exchanges + grid join + sort + window
    # -> 1 exchange + in-row segment fold (0.64s -> 0.35s at sf0.1).
    b = (
        events.filter(F.col("event_type") == "click")
        .repartition("user_id")
        .withColumn("bucket_s", time_bucket_epoch(F.col("ts"), DAY))
        .groupBy("user_id", "bucket_s")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
    ).persist()  # bucket-grain; bounds + fold branches both reuse it
    return gapfill_locf_folded(
        b,
        key="user_id",
        bucket_col="bucket_s",
        value_col="avg_value",
        width_s=DAY,
        out_col="avg_value_locf",
    )


@register(
    "ts_interpolate",
    family="timeseries",
    doc="time_bucket_gapfill + interpolate(): linear interpolation between "
    "surrounding observations on the dense daily grid",
    oracle=f"""
        WITH b AS (
            SELECT user_id,
                   {_sql_bucket(DAY)} AS bucket_s,
                   round(avg(value), 6) AS avg_value
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY 1, 2
        ),
        bounds AS (SELECT min(bucket_s) AS lo, max(bucket_s) AS hi FROM b),
        grid AS (
            SELECT u.user_id, g.bucket_s
            FROM (SELECT DISTINCT user_id FROM b) u
            CROSS JOIN (
                SELECT unnest(generate_series(lo, hi, {DAY})) AS bucket_s FROM bounds
            ) g
        ),
        j AS (
            SELECT g.user_id, g.bucket_s, b.avg_value,
                   CASE WHEN b.avg_value IS NOT NULL THEN g.bucket_s END AS obs_bucket
            FROM grid g LEFT JOIN b ON b.user_id = g.user_id AND b.bucket_s = g.bucket_s
        ),
        w AS (
            SELECT user_id, bucket_s, avg_value,
                   last_value(avg_value IGNORE NULLS) OVER wp AS prev_v,
                   last_value(obs_bucket IGNORE NULLS) OVER wp AS prev_b,
                   first_value(avg_value IGNORE NULLS) OVER wf AS next_v,
                   first_value(obs_bucket IGNORE NULLS) OVER wf AS next_b
            FROM j
            WINDOW wp AS (PARTITION BY user_id ORDER BY bucket_s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY user_id ORDER BY bucket_s
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        -- the 1e-9 nudge kills systematic half-way ties (fraction 1/2 of
        -- 6-dp inputs lands exactly on the rounding boundary, where the
        -- engines' rounding algorithms disagree)
        SELECT user_id, bucket_s,
               round(CASE
                   WHEN avg_value IS NOT NULL THEN avg_value
                   WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
                   ELSE prev_v + (next_v - prev_v)
                        * (bucket_s - prev_b) * 1.0 / (next_b - prev_b)
               END - 0.000000001, 6) AS value_interp
        FROM w
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    b = (
        events.filter(F.col("event_type") == "purchase")
        .withColumn("bucket_s", time_bucket_epoch(F.col("ts"), DAY))
        .groupBy("user_id", "bucket_s")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
    ).persist()  # bucket-grain; grid/bounds/join branches all reuse it
    filled = gapfill_buckets_auto(
        b, keys=["user_id"], bucket_col="bucket_s", width_s=DAY
    ).withColumn(
        "obs_bucket", F.when(F.col("avg_value").isNotNull(), F.col("bucket_s"))
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("bucket_s")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w = filled.select(
        "user_id",
        "bucket_s",
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(wp).alias("prev_v"),
        F.last("obs_bucket", ignorenulls=True).over(wp).alias("prev_b"),
        F.first("avg_value", ignorenulls=True).over(wf).alias("next_v"),
        F.first("obs_bucket", ignorenulls=True).over(wf).alias("next_b"),
    )
    interp = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(F.col("prev_v").isNull() | F.col("next_v").isNull(), F.lit(None))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (F.col("bucket_s") - F.col("prev_b"))
            / (F.col("next_b") - F.col("prev_b"))
        )
    )
    # -1e-9 nudge: see oracle comment (half-way tie avoidance)
    return w.select(
        "user_id", "bucket_s", F.round(interp - F.lit(1e-9), 6).alias("value_interp")
    )


@register(
    "ts_histogram",
    family="timeseries",
    doc="histogram(value, lo, hi, nbuckets) — timescale histogram() as width_bucket",
    oracle="""
        SELECT event_type,
               CAST(CASE
                   WHEN value < 0.0 THEN 0
                   WHEN value >= 50.0 THEN 11
                   ELSE CAST(floor(value / 5.0) AS BIGINT) + 1
               END AS BIGINT) AS bucket_no,
               count(*) AS n
        FROM events
        GROUP BY 1, 2
    """,
)
def ts_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    bucket_no = (
        F.when(F.col("value") < 0.0, F.lit(0))
        .when(F.col("value") >= 50.0, F.lit(11))
        .otherwise(F.floor(F.col("value") / 5.0) + 1)
    ).cast("long")
    return (
        events.withColumn("bucket_no", bucket_no)
        .groupBy("event_type", "bucket_no")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "ts_stats_agg",
    family="timeseries",
    doc="stats_agg: mean/stddev/corr per series (timescaledb-toolkit stats_agg)",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               round(avg(value), 6) AS mean_value,
               round(stddev_samp(value), 6) AS stddev_value,
               round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_value_user
        FROM events
        GROUP BY event_type
    """,
)
def ts_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.stddev_samp("value"), 6).alias("stddev_value"),
        F.round(F.corr("value", F.col("user_id").cast("double")), 6).alias(
            "corr_value_user"
        ),
    )


@register(
    "ts_approx_percentile",
    family="timeseries",
    doc="Percentiles per series — exact at oracle scale; swap to approx_percentile "
    "(t-digest) at 100 TB where exact sort is wasteful",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.50), 6) AS p50,
               round(quantile_cont(value, 0.90), 6) AS p90,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events
        GROUP BY event_type
    """,
)
def ts_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    pcts = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return events.groupBy("event_type").agg(
        F.round(pcts[0], 6).alias("p50"),
        F.round(pcts[1], 6).alias("p90"),
        F.round(pcts[2], 6).alias("p99"),
    )
