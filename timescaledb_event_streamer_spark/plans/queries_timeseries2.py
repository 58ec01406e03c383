"""TimescaleDB-toolkit analytics, part 2 (SURVEY.md §2.B, B12-B19):
as-of join, bucketed range join, time_weight, state_agg,
sessionization, OHLC/candlestick_agg, heartbeat_agg, LTTB.

These mirror the timescaledb-toolkit hyperfunction surface
(candlestick_agg, state_agg, heartbeat_agg, time_weight, lttb) that
users of the reference's ecosystem run over hypertables.

Determinism discipline: every window is ordered by (ts, event_id) —
event_id is the unique LSN stand-in — so ties on ts cannot make the
Spark and DuckDB results diverge. Duration sums are computed in
integer microseconds (exact in both engines) and divided/rounded
only at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.functions.downsample import lttb
from timescaledb_event_streamer_spark.functions.timeseries import (
    asof_join,
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
    "ts_asof_join",
    family="timeseries",
    doc="Backward as-of join: each click matched to the user's most recent "
    "purchase at-or-before it (DuckDB ASOF JOIN semantics). Spark impl is "
    "union+LOCF: ONE shuffle on user_id, zero row multiplication — the "
    "scale-correct form of an operator Spark lacks natively.",
    oracle="""
        WITH p AS (
            SELECT user_id, ts, max(value) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts
        ),
        c AS (
            SELECT event_id, user_id, ts, value AS click_value
            FROM events WHERE event_type = 'click'
        )
        SELECT c.event_id, c.user_id, c.ts, c.click_value, p.purchase_value
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")  # unique (by, on) => deterministic match
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks, purchases, on="ts", by=["user_id"], value_cols=["purchase_value"]
    )


@register(
    "ts_range_join",
    family="timeseries",
    doc="Range join via bucket-candidate explode: clicks within the hour "
    "before each purchase. Each click is published to the 2 hour-buckets "
    "it can serve; the join is then pure equi (user_id, bucket) + a "
    "residual range filter — candidate blow-up is 2x, not quadratic, and "
    "Catalyst keeps it a hash join (a naive range join degenerates to "
    "broadcast-nested-loop).",
    oracle="""
        SELECT p.event_id,
               count(c.c_ts) AS n_clicks_1h
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id AS c_uid, ts AS c_ts FROM events
                   WHERE event_type = 'click') c
          ON c.c_uid = p.user_id
         AND c.c_ts > p.ts - INTERVAL 1 HOUR
         AND c.c_ts <= p.ts
        GROUP BY p.event_id
    """,
)
def ts_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts")
    )
    cand = clicks.withColumn(
        "bkt",
        F.explode(
            F.array(
                time_bucket_epoch(F.col("c_ts"), HOUR),
                time_bucket_epoch(F.col("c_ts"), HOUR) + HOUR,
            )
        ),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = purchases.join(
        cand,
        (F.col("c_uid") == F.col("user_id"))
        & (F.col("bkt") == time_bucket_epoch(F.col("ts"), HOUR))
        & (F.col("c_ts") > F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("ts")),
        how="left",
    )
    return joined.groupBy("event_id").agg(F.count("c_ts").alias("n_clicks_1h"))


@register(
    "ts_time_weight",
    family="timeseries",
    doc="time_weight('LOCF'): time-weighted average per series — each value "
    "weighted by how long it held (until the next point). Durations in "
    "exact integer micros; one window + one agg.",
    oracle="""
        WITH s AS (
            SELECT event_type, value,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY event_type, user_id ORDER BY ts, event_id
                   ) - epoch_us(ts) AS dt_us
            FROM events
        )
        SELECT event_type,
               count(*) AS n_intervals,
               round(sum(value * dt_us) / sum(dt_us), 6) AS time_weighted_avg,
               round(CAST(sum(dt_us) AS BIGINT) / 1000000.0, 2) AS total_span_s
        FROM s
        WHERE dt_us IS NOT NULL AND dt_us > 0
        GROUP BY event_type
    """,
)
def ts_time_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    s = events.select(
        "event_type",
        "value",
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("dt_us"),
    )
    return (
        s.filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.round(F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6).alias(
                "time_weighted_avg"
            ),
            F.round(F.sum("dt_us") / F.lit(1000000.0), 2).alias("total_span_s"),
        )
    )


@register(
    "ts_state_agg",
    family="timeseries",
    doc="state_agg: total duration spent in each state (event_type as the "
    "state of its user's timeline, held until the next event)",
    oracle="""
        WITH s AS (
            SELECT event_type AS state,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) - epoch_us(ts) AS dt_us
            FROM events
        )
        SELECT state,
               count(*) AS n_intervals,
               round(CAST(sum(dt_us) AS BIGINT) / 1000000.0, 2) AS total_duration_s
        FROM s
        WHERE dt_us IS NOT NULL
        GROUP BY state
    """,
)
def ts_state_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = events.select(
        F.col("event_type").alias("state"),
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("dt_us"),
    )
    return (
        s.filter(F.col("dt_us").isNotNull())
        .groupBy("state")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.round(F.sum("dt_us") / F.lit(1000000.0), 2).alias("total_duration_s"),
        )
    )


@register(
    "ts_sessionize",
    family="timeseries",
    doc="Gap-based sessionization (new session after >30 min idle): lag to "
    "flag session starts, running sum to number them — two windows over "
    "the SAME (user_id, ts, event_id) sort, so Spark plans ONE shuffle + "
    "ONE sort for both.",
    oracle="""
        WITH o AS (
            SELECT user_id, event_id, epoch_us(ts) AS t,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS t_prev
            FROM events
        ),
        m AS (
            SELECT user_id, event_id, t,
                   CASE WHEN t_prev IS NULL OR t - t_prev > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM o
        ),
        s AS (
            SELECT user_id, t,
                   CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM m
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               round((max(t) - min(t)) / 1000000.0, 2) AS duration_s
        FROM s
        GROUP BY user_id, session_id
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t"),
        F.lag(F.unix_micros("ts")).over(w).alias("t_prev"),
    )
    m = o.withColumn(
        "is_new",
        F.when(
            F.col("t_prev").isNull() | (F.col("t") - F.col("t_prev") > 1_800_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    s = m.select(
        "user_id", "t", F.sum("is_new").over(wsum).alias("session_id")
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round((F.max("t") - F.min("t")) / F.lit(1000000.0), 2).alias("duration_s"),
    )


@register(
    "ts_ohlc",
    family="timeseries",
    doc="candlestick_agg: open/high/low/close per (series, day). Open/close "
    "are arg-min/arg-max by event_id (the LSN order — unique, so fully "
    "deterministic under equal timestamps); plain min/max for low/high. "
    "All map-side-combinable aggregates: one shuffle of tiny partials.",
    oracle=f"""
        SELECT event_type,
               {_sql_bucket(DAY)} AS bucket_day_s,
               arg_min(value, event_id) AS open,
               max(value) AS high,
               min(value) AS low,
               arg_max(value, event_id) AS close,
               count(*) AS n_trades
        FROM events
        GROUP BY 1, 2
    """,
)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.withColumn("bucket_day_s", time_bucket_epoch(F.col("ts"), DAY))
        .groupBy("event_type", "bucket_day_s")
        .agg(
            F.min_by("value", "event_id").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "event_id").alias("close"),
            F.count(F.lit(1)).alias("n_trades"),
        )
    )


@register(
    "ts_heartbeat_agg",
    family="timeseries",
    doc="heartbeat_agg: liveness per user from event heartbeats — uptime "
    "counts each gap up to the 1h timeout, longer gaps are outages",
    oracle="""
        WITH s AS (
            SELECT user_id,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) - epoch_us(ts) AS gap_us
            FROM events
        )
        SELECT user_id,
               count(*) AS n_heartbeats,
               round(CAST(sum(least(gap_us, 3600000000)) AS BIGINT)
                     / 1000000.0, 2) AS uptime_s,
               CAST(sum(CASE WHEN gap_us > 3600000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outages
        FROM s
        GROUP BY user_id
    """,
)
def ts_heartbeat_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = events.select(
        "user_id",
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("gap_us"),
    )
    timeout_us = 3_600_000_000
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_heartbeats"),
        F.round(
            F.sum(F.least(F.col("gap_us"), F.lit(timeout_us))) / F.lit(1000000.0), 2
        ).alias("uptime_s"),
        F.sum(
            F.when(F.col("gap_us") > timeout_us, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_outages"),
    )


@register(
    "ts_lttb",
    family="timeseries",
    doc="lttb(): largest-triangle-three-buckets downsample to 20 points per "
    "(event_type, user_id) series. Sequential within a series, so it runs "
    "as Arrow-batched applyInPandas per series key (rows-only: the "
    "bucket-average recursion is not SQL-expressible).",
)
def ts_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").select(
        "event_type", "user_id", "event_id", "ts", "value"
    )
    return lttb(
        events,
        series_keys=["event_type", "user_id"],
        ts_col="ts",
        value_col="value",
        n_out=20,
        order_tiebreak="event_id",
    )


@register(
    "ts_cagg_incremental_refresh",
    family="timeseries",
    doc="Continuous-aggregate incremental refresh: history materialized as "
    "algebraic partials (count/sum/min/max), the delta (rows past the LSN "
    "watermark) aggregated alone, merged by union + re-agg — refresh cost "
    "O(delta + touched buckets), never O(history). The oracle is the "
    "one-shot aggregate over everything: merge(partials) must equal it "
    "exactly.",
    oracle=f"""
        SELECT event_type,
               {_sql_bucket(HOUR)} AS bucket_s,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value,
               min(value) AS min_value,
               max(value) AS max_value,
               floor(sum(CAST(round(value * 100) AS BIGINT)) * 10000.0
                     / count(*) + 0.5) / 1000000.0 AS avg_value
        FROM events
        GROUP BY 1, 2
    """,
)
def ts_cagg_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.functions.cagg import (
        cagg_partials,
        merge_cagg,
    )

    # Sums ride on exact integer cents so merge(partials) equals the
    # one-shot aggregate EXACTLY whatever the history/delta split —
    # float partial sums drift 1 ulp from the oracle at sf0.1+.
    events = load(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    # LSN watermark: everything at-or-below is "already materialized
    # history", the rest is the delta. Any split merges to the same
    # result (associativity is the point), so the midpoint is fine.
    wm = events.agg(F.max("event_id")).first()[0] // 2
    history = events.filter(F.col("event_id") <= wm)
    delta = events.filter(F.col("event_id") > wm)
    merged = merge_cagg(
        ["event_type"],
        cagg_partials(history, ["event_type"], HOUR, sum_col="cents"),
        cagg_partials(delta, ["event_type"], HOUR, sum_col="cents"),
    )
    return merged.select(
        "event_type",
        "bucket_s",
        "n",
        (F.col("sum_value") / 100.0).alias("sum_value"),
        "min_value",
        "max_value",
        (F.floor(F.col("sum_value") * 10000.0 / F.col("n") + 0.5) / 1000000.0)
        .alias("avg_value"),
    )


@register(
    "ts_top_n",
    family="timeseries",
    doc="topn(): top-3 most active users per hypertable (toolkit "
    "topn/space-saving semantics, exact at oracle scale). Count first "
    "(map-side partials shrink the shuffle to #series rows), THEN a "
    "per-group window over the tiny aggregate — never a window over raw "
    "events.",
    oracle="""
        WITH c AS (
            SELECT event_type, user_id, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY event_type ORDER BY n DESC, user_id
            ) AS rn
            FROM c
        )
        SELECT event_type, user_id, n, CAST(rn AS BIGINT) AS rn
        FROM r WHERE rn <= 3
    """,
)
def ts_top_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    counts = events.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("user_id"))
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("event_type", "user_id", "n", "rn")
    )


@register(
    "ts_count_distinct",
    family="timeseries",
    doc="Distinct series cardinality per hypertable — exact here (the "
    "oracle contract); at 100 TB this swaps to approx_count_distinct "
    "(HyperLogLog++, toolkit hyperloglog), whose <2% error is asserted "
    "in tests/test_timeseries2.py.",
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
)
def ts_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "ts_rollup_grouping_sets",
    family="timeseries",
    doc="Multi-granularity continuous aggregate in ONE pass: ROLLUP over "
    "(hypertable, day) produces per-chunk, per-hypertable, and grand "
    "totals from a single shuffle (Spark expands grouping sets before "
    "the exchange — partials stay map-side combinable).",
    oracle=f"""
        SELECT event_type,
               {_sql_bucket(DAY)} AS bucket_day_s,
               grouping(event_type, {_sql_bucket(DAY)}) AS gid,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY ROLLUP(event_type, {_sql_bucket(DAY)})
    """,
)
def ts_rollup_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.withColumn("bucket_day_s", time_bucket_epoch(F.col("ts"), DAY))
        .rollup("event_type", "bucket_day_s")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select("event_type", "bucket_day_s", "gid", "n", "sum_value")
    )


@register(
    "ts_gauge_agg",
    family="timeseries",
    doc="Toolkit gauge_agg analog: per-series (event_type, user_id) "
    "first->last delta in replication order (gauges move both ways, "
    "so no counter reset logic), rolled up per event_type with the "
    "per-series rate over the covered span. min_by/max_by keep it a "
    "single aggregation pass -- no window, two keyed shuffles.",
    oracle="""
        WITH s AS (
            SELECT event_type, user_id,
                   arg_max(value, event_id) - arg_min(value, event_id) AS delta,
                   (max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0 AS span_s
            FROM events
            GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_series,
               round(sum(delta), 6) AS total_delta,
               round(avg(CASE WHEN span_s > 0 THEN delta / span_s END), 6)
                   AS avg_rate_per_s
        FROM s
        GROUP BY event_type
    """,
)
def ts_gauge_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    s = events.groupBy("event_type", "user_id").agg(
        (F.max_by("value", "event_id") - F.min_by("value", "event_id")).alias("delta"),
        (
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 1000000.0
        ).alias("span_s"),
    )
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_series"),
        F.round(F.sum("delta"), 6).alias("total_delta"),
        F.round(
            F.avg(F.when(F.col("span_s") > 0, F.col("delta") / F.col("span_s"))), 6
        ).alias("avg_rate_per_s"),
    )


@register(
    "ts_integral",
    family="timeseries",
    doc="Toolkit integral (LOCF): area under the curve per event_type "
    "in value-seconds -- each value held until the series' next point. "
    "Same one-window + one-agg scaffold as time_weight without the "
    "normalization; exact integer-micro durations.",
    oracle="""
        WITH s AS (
            SELECT event_type, value,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY event_type, user_id ORDER BY ts, event_id
                   ) - epoch_us(ts) AS dt_us
            FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_intervals,
               round(sum(value * dt_us) / 1000000.0, 2) AS integral_value_s
        FROM s
        WHERE dt_us IS NOT NULL AND dt_us > 0
        GROUP BY event_type
    """,
)
def ts_integral(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    s = events.select(
        "event_type",
        "value",
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("dt_us"),
    )
    return (
        s.filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.round(F.sum(F.col("value") * F.col("dt_us")) / 1000000.0, 2).alias(
                "integral_value_s"
            ),
        )
    )


@register(
    "ts_retention_policy",
    family="timeseries",
    doc="drop_chunks retention policy as a batch plan: per (hypertable, "
    "chunk) decide drop/keep against a cutoff older than the newest "
    "point minus 30 days -- chunk grain only (metadata-sized result), "
    "one aggregation plus a broadcast scalar cutoff, exactly how "
    "retention runs against the chunk catalog at scale.",
    oracle="""
        WITH cut AS (
            SELECT max(epoch_us(ts)) // 1000000 - 30 * 86400 AS cutoff_s
            FROM events
        ),
        chunks AS (
            SELECT event_type AS hypertable_name,
                   (epoch_us(ts) // 1000000)
                       - (epoch_us(ts) // 1000000) % 604800 AS range_start_s,
                   count(*) AS n_rows
            FROM events
            GROUP BY 1, 2
        )
        SELECT c.hypertable_name,
               c.range_start_s,
               c.range_start_s + 604800 AS range_end_s,
               c.n_rows,
               c.range_start_s + 604800 <= t.cutoff_s AS drop_chunk
        FROM chunks c CROSS JOIN cut t
    """,
)
def ts_retention_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.catalog.chunks import (
        CHUNK_INTERVAL_S,
        chunk_start_epoch,
    )

    events = load(spark, sf_dir, "events")
    cut = events.agg(
        (
            F.floor(F.max(F.unix_micros("ts")) / 1000000) - F.lit(30 * 86400)
        ).alias("cutoff_s")
    )
    chunks = (
        events.select(
            F.col("event_type").alias("hypertable_name"),
            chunk_start_epoch(F.col("ts")).alias("range_start_s"),
        )
        .groupBy("hypertable_name", "range_start_s")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return chunks.crossJoin(F.broadcast(cut)).select(
        "hypertable_name",
        "range_start_s",
        (F.col("range_start_s") + CHUNK_INTERVAL_S).alias("range_end_s"),
        "n_rows",
        (F.col("range_start_s") + CHUNK_INTERVAL_S <= F.col("cutoff_s")).alias(
            "drop_chunk"
        ),
    )


@register(
    "ts_ohlc_rollup",
    family="timeseries",
    doc="rollup(candlestick_agg): daily OHLC partials merged to weekly "
    "candles. Open/close carry their LSN through the partial (open = "
    "arg_min by lsn_open, close = arg_max by lsn_close), so the merge "
    "is associative -- the cagg-over-cagg property that makes "
    "hierarchical refresh O(partials) instead of O(raw rows).",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   {_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 86400 AS day_s,
                   arg_min(value, event_id) AS open,
                   max(value) AS high,
                   min(value) AS low,
                   arg_max(value, event_id) AS close,
                   min(event_id) AS lsn_open,
                   max(event_id) AS lsn_close,
                   count(*) AS n
            FROM events
            GROUP BY 1, 2
        )
        SELECT event_type,
               day_s - day_s % 604800 AS week_s,
               arg_min(open, lsn_open) AS open,
               max(high) AS high,
               min(low) AS low,
               arg_max(close, lsn_close) AS close,
               CAST(sum(n) AS BIGINT) AS n_points
        FROM daily
        GROUP BY 1, 2
    """,
)
def ts_ohlc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    epoch = F.unix_micros("ts") / F.lit(1000000)
    day_s = (F.floor(epoch / 86400) * 86400).cast("long")
    daily = (
        events.select("event_type", day_s.alias("day_s"), "value", "event_id")
        .groupBy("event_type", "day_s")
        .agg(
            F.min_by("value", "event_id").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "event_id").alias("close"),
            F.min("event_id").alias("lsn_open"),
            F.max("event_id").alias("lsn_close"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    week_s = (F.floor(F.col("day_s") / 604800) * 604800).cast("long")
    return daily.groupBy("event_type", week_s.alias("week_s")).agg(
        F.min_by("open", "lsn_open").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", "lsn_close").alias("close"),
        F.sum("n").alias("n_points"),
    )


@register(
    "ts_seasonality",
    family="timeseries",
    doc="Workload seasonality heatmap: events per (day-of-week, hour) "
    "per event_type -- the capacity-planning diagnostic for a CDC "
    "stream. dow normalized to 0=Sunday on both engines; single "
    "aggregation over a 168-cell key space, map-side partials absorb "
    "everything.",
    oracle="""
        SELECT event_type,
               CAST(date_part('dow', ts) AS BIGINT) AS dow,
               CAST(date_part('hour', ts) AS BIGINT) AS hour,
               count(*) AS n_events,
               round(avg(value), 6) AS avg_value
        FROM events
        GROUP BY 1, 2, 3
    """,
)
def ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            "event_type",
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),  # 0 = Sunday
            F.hour("ts").cast("long").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


@register(
    "ts_moving_avg",
    family="timeseries",
    doc="Sliding moving average + band: per-series 4-point trailing mean "
    "and sample stddev over (ts, event_id)-ordered values (the classic "
    "smoothing query TimescaleDB users run with AVG OVER a ROWS frame). "
    "ONE shuffle on user_id; the ROWS frame is computed incrementally "
    "inside the sort, so the plan is scan -> exchange -> window with no "
    "self-join -- the shape that survives a 100 TB series table.",
    oracle="""
        SELECT event_id,
               user_id,
               round(avg(value) OVER w, 6) AS ma_4,
               round(coalesce(stddev_samp(value) OVER w, 0.0), 6) AS sd_4,
               CAST(count(*) OVER w AS BIGINT) AS n_window
        FROM events
        WHERE event_type = 'view'
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
        )
    """,
)
def ts_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("ma_4"),
        F.round(F.coalesce(F.stddev_samp("value").over(w), F.lit(0.0)), 6).alias(
            "sd_4"
        ),
        F.count(F.lit(1)).over(w).alias("n_window"),
    )


@register(
    "ts_zscore_outliers",
    family="timeseries",
    doc="Per-series z-score anomaly gate: two-pass (series stats, then "
    "join back) flagging |z| > 2, rolled up to per-user counts. z is "
    "rounded to 3 decimals BEFORE the threshold compare so a 1e-12 "
    "stddev summation difference between engines cannot flip a "
    "boundary row. Stats side is series-grain (tiny) -> broadcast "
    "join back onto the raw scan: zero extra shuffle of the fact side.",
    oracle="""
        WITH stats AS (
            SELECT user_id,
                   avg(value) AS mu,
                   stddev_samp(value) AS sigma
            FROM events WHERE event_type = 'error'
            GROUP BY user_id
            HAVING stddev_samp(value) > 0
        ),
        z AS (
            SELECT e.user_id,
                   round((e.value - s.mu) / s.sigma, 3) AS z3
            FROM events e JOIN stats s USING (user_id)
            WHERE e.event_type = 'error'
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_points,
               CAST(sum(CASE WHEN abs(z3) > 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers,
               round(max(abs(z3)), 3) AS max_abs_z
        FROM z
        GROUP BY user_id
    """,
)
def ts_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    errors = load(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    stats = (
        errors.groupBy("user_id")
        .agg(
            F.avg("value").alias("mu"),
            F.stddev_samp("value").alias("sigma"),
        )
        .filter(F.col("sigma") > 0)
    )
    z = errors.join(F.broadcast(stats), "user_id").select(
        "user_id", F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 3).alias("z3")
    )
    return z.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.when(F.abs("z3") > 2, 1).otherwise(0)).alias("n_outliers"),
        F.round(F.max(F.abs("z3")), 3).alias("max_abs_z"),
    )


@register(
    "ts_time_bucket_month",
    family="timeseries",
    doc="Calendar-aware bucketing (time_bucket_ng month semantics): "
    "monthly per-type event counts and value sums. Fixed-width "
    "time_bucket can't express variable-length months; date_trunc "
    "is the codegen-native calendar bucket both engines share. Same "
    "map-side-partial shape as ts_time_bucket.",
    oracle="""
        SELECT event_type,
               date_trunc('month', ts) AS month_start,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def ts_time_bucket_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.groupBy(
        "event_type", F.date_trunc("month", F.col("ts")).alias("month_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
