"""Event-analytics operators over the ``events`` hypertable stand-in.

The reference streams hypertable rows for downstream consumers; the
queries a TimescaleDB/event-pipeline user actually runs on that
stream are product analytics: cohort retention, funnels, smoothed
trends, and level-shift detection. Each is expressed as a
declarative plan (windows + conditional aggregation — no Python in
the hot path) with a DuckDB oracle.

Scale notes (100 TB posture):
- All per-user work shuffles on ``user_id`` once and reuses that
  partitioning across the funnel's staged joins (same key, AQE
  co-partitions); cohort/funnel outputs are tiny (weeks x offsets,
  3 stages) so the final aggregations are broadcast-sized.
- EWMA / level-shift run on *bucketed* series (day grain), so the
  window state per series is bounded (30 rows here, ~365/yr at
  scale) regardless of raw event volume; the heavy reduction is the
  map-side partial avg into (series, day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, x=avg value) — the bucketed series all
    trend operators share. One shuffle, map-side partials."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.avg("value").alias("x"))
    )


@register(
    "ts_retention_cohorts",
    family="timeseries",
    doc="Weekly cohort retention matrix: cohort = week of a user's "
    "first event, cell = distinct users from that cohort active at "
    "each week offset. One shuffle on user_id (window min for the "
    "cohort week), then a distinct + agg over (cohort, offset) whose "
    "cardinality is weeks^2 — broadcast-sized at any data scale.",
    oracle="""
        WITH ev AS (
            SELECT user_id, date_trunc('week', ts) AS wk FROM events
        ),
        cohorts AS (
            SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY 1
        ),
        active AS (
            SELECT DISTINCT ev.user_id, c.cohort_week, ev.wk
            FROM ev JOIN cohorts c USING (user_id)
        ),
        cells AS (
            SELECT cohort_week,
                   CAST((epoch(wk) - epoch(cohort_week)) / 604800 AS BIGINT)
                       AS week_offset,
                   count(*) AS active_users
            FROM active GROUP BY 1, 2
        )
        SELECT cohort_week, week_offset, active_users,
               max(active_users) FILTER (week_offset = 0)
                   OVER (PARTITION BY cohort_week) AS cohort_size,
               round(active_users * 1.0 /
                   max(active_users) FILTER (week_offset = 0)
                       OVER (PARTITION BY cohort_week), 6) AS retention
        FROM cells
    """,
)
def ts_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    )
    # window-min instead of agg+join: one shuffle on user_id carries
    # the cohort label to every row of that user.
    ev = ev.withColumn("cohort_week", F.min("wk").over(Window.partitionBy("user_id")))
    cells = (
        ev.select("user_id", "cohort_week", "wk")
        .distinct()
        .groupBy(
            "cohort_week",
            (
                (F.unix_timestamp("wk") - F.unix_timestamp("cohort_week")) / 604800
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )
    w = Window.partitionBy("cohort_week")
    size = F.max(F.when(F.col("week_offset") == 0, F.col("active_users"))).over(w)
    return cells.select(
        "cohort_week",
        "week_offset",
        "active_users",
        size.alias("cohort_size"),
        F.round(F.col("active_users") / size, 6).alias("retention"),
    )


@register(
    "ts_funnel",
    family="timeseries",
    doc="Strict-order funnel view -> click -> purchase: a user "
    "converts at a stage only with an event strictly after their "
    "previous-stage time. Three conditional-min aggregations chained "
    "by user_id equi-joins — every shuffle is on the same key, so a "
    "bucketed-by-user layout (sources/bucketing.py) makes the whole "
    "funnel exchange-free; stage outputs are single rows.",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS t0 FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS t1
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY 1
        ),
        s AS (
            SELECT '1_view' AS stage, count(*) AS n_users FROM v
            UNION ALL SELECT '2_click', count(*) FROM c
            UNION ALL SELECT '3_purchase', count(*) FROM p
        )
        SELECT stage, n_users,
               round(n_users * 1.0 /
                   (SELECT n_users FROM s WHERE stage = '1_view'), 6)
                   AS conversion
        FROM s
    """,
)
def ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    stages = (
        v.agg(F.count("*").alias("n_users")).select(F.lit("1_view").alias("stage"), "n_users")
        .unionByName(
            c.agg(F.count("*").alias("n_users")).select(
                F.lit("2_click").alias("stage"), "n_users"
            )
        )
        .unionByName(
            p.agg(F.count("*").alias("n_users")).select(
                F.lit("3_purchase").alias("stage"), "n_users"
            )
        )
    )
    base = v.agg(F.count("*").alias("base_users"))
    return stages.crossJoin(F.broadcast(base)).select(
        "stage",
        "n_users",
        F.round(F.col("n_users") / F.col("base_users"), 6).alias("conversion"),
    )


@register(
    "ts_ewma",
    family="timeseries",
    doc="Trailing exponentially-weighted moving average (decay 0.7, "
    "20-bucket window, weight-normalized — pandas ewm adjust=True "
    "semantics) over the daily per-series mean. The recursive EWMA "
    "form is not prefix-expressible in SQL; the bounded-window "
    "normalized form is, via collect_list + array-lambda aggregation "
    "(all codegen, no Python). Window state is bounded by the bucket "
    "grain, not raw event volume.",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   avg(value) AS x
            FROM events GROUP BY 1, 2
        ),
        arrs AS (
            SELECT event_type, day,
                   list(x) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
                   ) AS arr
            FROM daily
        )
        SELECT event_type, day,
               round(
                   list_sum(list_transform(
                       arr, (v, i) -> v * pow(0.7, len(arr) - i))) /
                   list_sum(list_transform(
                       arr, (v, i) -> pow(0.7, len(arr) - i))),
                   6) AS ewma
        FROM arrs
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-19, Window.currentRow)
    )
    arrs = daily.withColumn("arr", F.collect_list("x").over(w))
    # Spark transform index j is 0-based (newest = size-1);
    # DuckDB list_transform index i is 1-based (newest = len) —
    # both give the newest bucket weight 0.7^0 = 1.
    num = F.expr(
        "aggregate(transform(arr, (v, j) -> v * power(0.7, size(arr) - 1 - j)),"
        " 0D, (acc, v) -> acc + v)"
    )
    den = F.expr(
        "aggregate(transform(arr, (v, j) -> power(0.7, size(arr) - 1 - j)),"
        " 0D, (acc, v) -> acc + v)"
    )
    return arrs.select(
        "event_type", "day", F.round(num / den, 6).alias("ewma")
    )


@register(
    "ts_change_detect",
    family="timeseries",
    doc="Level-shift detection per series: the day whose trailing-10 "
    "vs leading-10 daily-mean windows differ the most (both sides "
    "must have >= 5 buckets). Ranking uses the ROUNDED shift with a "
    "day tie-break so the winner is deterministic across engines. "
    "Window state bounded by bucket grain.",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   avg(value) AS x
            FROM events GROUP BY 1, 2
        ),
        shifts AS (
            SELECT event_type, day,
                   avg(x) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
                       AS before_mean,
                   avg(x) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 1 FOLLOWING AND 10 FOLLOWING)
                       AS after_mean,
                   count(*) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS nb,
                   count(*) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 1 FOLLOWING AND 10 FOLLOWING) AS na
            FROM daily
        ),
        ranked AS (
            SELECT event_type, day,
                   round(before_mean, 6) AS before_mean,
                   round(after_mean, 6) AS after_mean,
                   round(abs(after_mean - before_mean), 6) AS shift,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY round(abs(after_mean - before_mean), 6) DESC,
                                day
                   ) AS rn
            FROM shifts WHERE nb >= 5 AND na >= 5
        )
        SELECT event_type, day AS change_day, before_mean, after_mean, shift
        FROM ranked WHERE rn = 1
    """,
)
def ts_change_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    ws = Window.partitionBy("event_type").orderBy("day")
    before = ws.rowsBetween(-10, -1)
    after = ws.rowsBetween(1, 10)
    shifts = daily.select(
        "event_type",
        "day",
        F.avg("x").over(before).alias("before_mean"),
        F.avg("x").over(after).alias("after_mean"),
        F.count("*").over(before).alias("nb"),
        F.count("*").over(after).alias("na"),
    ).filter((F.col("nb") >= 5) & (F.col("na") >= 5))
    shift = F.round(F.abs(F.col("after_mean") - F.col("before_mean")), 6)
    ranked = shifts.withColumn("shift", shift).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.col("shift").desc(), "day")
        ),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "event_type",
        F.col("day").alias("change_day"),
        F.round("before_mean", 6).alias("before_mean"),
        F.round("after_mean", 6).alias("after_mean"),
        "shift",
    )


@register(
    "ts_series_corr",
    family="timeseries",
    doc="Cross-series Pearson correlation matrix over the daily "
    "per-series means: which metrics move together. The correlation "
    "input is the bucketed series (days x series — tiny), so the "
    "day-keyed self-join is broadcast-sized no matter how large the "
    "raw event volume; the heavy reduction is the shared map-side "
    "partial avg into (series, day).",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   avg(value) AS x
            FROM events GROUP BY 1, 2
        )
        SELECT a.event_type AS series_a,
               b.event_type AS series_b,
               CAST(count(*) AS BIGINT) AS n_days,
               round(corr(a.x, b.x), 6) AS pearson_r
        FROM daily a JOIN daily b
          ON a.day = b.day AND a.event_type < b.event_type
        GROUP BY 1, 2
    """,
)
def ts_series_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    a = daily.alias("a")
    b = daily.alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("series_a"),
            F.col("b.event_type").alias("series_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.corr(F.col("a.x"), F.col("b.x")), 6).alias("pearson_r"),
        )
    )


@register(
    "ts_pct_change",
    family="timeseries",
    doc="Day-over-day percent change per series (the TimescaleDB "
    "lag-window idiom users pair with time_bucket). One shuffle on "
    "the series key; window state is a single preceding row.",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   avg(value) AS x
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, day,
               round(x, 6) AS x,
               round(
                   (x - lag(x) OVER w) / lag(x) OVER w, 6
               ) AS pct_change
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def ts_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("x").over(w)
    return daily.select(
        "event_type",
        "day",
        F.round("x", 6).alias("x"),
        F.round((F.col("x") - prev) / prev, 6).alias("pct_change"),
    )


@register(
    "ts_cumulative",
    family="timeseries",
    doc="Running total and running event count per series over daily "
    "buckets (cumulative revenue/usage reporting). Prefix sums use "
    "the day-ordered frame, so both engines accumulate in the same "
    "order and the rounded totals agree exactly.",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   sum(value) AS day_total,
                   count(*) AS day_events
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, day,
               round(sum(day_total) OVER w, 4) AS running_total,
               CAST(sum(day_events) OVER w AS BIGINT) AS running_events
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def ts_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum("value").alias("day_total"),
            F.count(F.lit(1)).alias("day_events"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        F.round(F.sum("day_total").over(w), 4).alias("running_total"),
        F.sum("day_events").over(w).alias("running_events"),
    )


@register(
    "ts_cagg_hierarchy",
    family="timeseries",
    doc="Hierarchical continuous aggregates (TimescaleDB 2.9 caggs ON "
    "caggs): hour -> day -> month, each level a MERGE of the level "
    "below's partial states (sum-of-sums, sum-of-counts, min-of-mins, "
    "max-of-maxes) — never a rescan of raw data. Sums carry exact "
    "cents (longs), the average materializes only at read time, so "
    "the three-stage merge is bit-exact regardless of partial "
    "ordering. The oracle aggregates the RAW table straight to month "
    "grain: hierarchical merge must equal direct aggregation.",
    oracle="""
        SELECT event_type,
               date_trunc('month', ts) AS month,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
               round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0
                     / count(*), 6) AS avg_value,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY 1, 2
    """,
)
def ts_cagg_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("sum_cents"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )

    def merge_up(cagg: DataFrame, grain: str) -> DataFrame:
        return cagg.groupBy(
            "event_type", F.date_trunc(grain, "bucket").alias("bucket")
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )

    monthly = merge_up(merge_up(hourly, "day"), "month")
    return monthly.select(
        "event_type",
        F.col("bucket").alias("month"),
        "n_events",
        "sum_cents",
        F.round(F.col("sum_cents") / F.lit(100.0) / F.col("n_events"), 6).alias(
            "avg_value"
        ),
        "min_value",
        "max_value",
    )


@register(
    "ts_mad_outliers",
    family="timeseries",
    doc="Robust outlier gate per series: median + MAD (median absolute "
    "deviation), flagging |value - median| > 3 * 1.4826 * MAD — the "
    "median-based complement to ts_zscore_outliers that a single "
    "extreme spike cannot poison. Two grouped exact-percentile "
    "aggregations over the series key + a broadcast of the tiny "
    "per-series stats back over the scan. (At 100 TB exact "
    "per-group percentiles sort within groups; swap the same plan to "
    "approx_percentile when the gate tolerates sketch error.)",
    oracle="""
        WITH med AS (
            SELECT event_type,
                   quantile_cont(value, 0.5) AS med
            FROM events GROUP BY 1
        ),
        mad AS (
            SELECT e.event_type,
                   m.med,
                   quantile_cont(abs(e.value - m.med), 0.5) AS mad
            FROM events e JOIN med m USING (event_type)
            GROUP BY 1, 2
        )
        SELECT e.event_type,
               round(m.med, 6) AS median_value,
               round(m.mad, 6) AS mad_value,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * m.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               round(max(abs(e.value - m.med)), 6) AS max_abs_dev
        FROM events e JOIN mad m USING (event_type)
        GROUP BY 1, 2, 3
    """,
)
def ts_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    with_med = events.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type", "med").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    gated = events.join(F.broadcast(mad), "event_type")
    dev = F.abs(F.col("value") - F.col("med"))
    return gated.groupBy(
        "event_type",
        F.round("med", 6).alias("median_value"),
        F.round("mad", 6).alias("mad_value"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(dev > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
        ).alias("n_outliers"),
        F.round(F.max(dev), 6).alias("max_abs_dev"),
    )
