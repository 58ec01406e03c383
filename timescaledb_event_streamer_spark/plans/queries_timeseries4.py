"""TimescaleDB analytics, part 4 (SURVEY.md §2.B59+): round-5
additions — value-exact sketch percentiles, a deterministic HLL
sibling, and the training-feature window matrix.

The sketch pair closes the last approximation family that had no
cross-engine-exact member: ts_approx_percentile (B10) and
ts_count_distinct_hll rely on engine-internal sketches (Spark's
QuantileSummaries / HLL++ registers), so their registered forms are
rows-only.  The two operators here re-derive the SAME sketch
mathematics from primitives both engines compute bit-identically
(integer bucket arithmetic via bin()/shifts, md5-based registers,
sorted sequential float folds), so the full sketch pipeline — not
just a sibling exact aggregate — is DuckDB-hash-certifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import REGISTRY, register
from timescaledb_event_streamer_spark.sources.tables import load

_SQL_EPOCH_S = "(epoch_us(ts) // 1000000)"
_SQL_CENTS = "CAST(round(value * 100, 0) AS BIGINT)"
DAY = 86400

#: HDR sub-bucket resolution: 16 sub-buckets per octave = 4 mantissa
#: bits kept, relative error <= 1/16 per bucket. Values below 2^5 get
#: exact unit buckets (the HDR "linear region").
_HDR_SUB = 16
_HDR_LIN = 32  # 2^5: smallest value that uses a log-linear bucket

#: HLL geometry: p=9 -> m=512 registers, standard bias constant
#: alpha_m = 0.7213 / (1 + 1.079/m); expected rel. error ~1.04/sqrt(m)
#: = 4.6%. The 60-bit rho word is 15 md5 hex chars (fits a BIGINT on
#: both engines).
_HLL_M = 512


def hdr_buckets(events: DataFrame) -> DataFrame:
    """(event_type, bucket_id, cnt) HDR sketch partials — a pure
    associative count aggregate, so the SAME expression runs as a
    complete-mode streaming aggregation (tests/test_streaming.py
    proves stream == batch cell-for-cell)."""
    b = events.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).withColumn(
        # floor(log2(cents)) without floats: bin() renders the binary
        # digits, its length - 1 is the msb index (cents >= 1 always:
        # value >= 0.01 in the data model, and a 0 would take the
        # linear branch anyway)
        "bucket_id",
        F.when(F.col("cents") < _HDR_LIN, F.col("cents")).otherwise(
            _HDR_LIN
            + (F.length(F.bin(F.col("cents"))) - 6) * _HDR_SUB
            + F.expr(
                f"shiftright(cents, length(bin(cents)) - 5) & {_HDR_SUB - 1}"
            )
        ),
    )
    return b.groupBy("event_type", "bucket_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def hll_registers(events: DataFrame) -> DataFrame:
    """(event_type, idx, rho) HLL register table — a max-reduce, so it
    streams complete-mode unchanged and is idempotent under replay."""
    h = F.md5(F.col("user_id").cast("string"))
    rr = events.select(
        "event_type",
        (F.conv(F.substring(h, 1, 3), 16, 10).cast("long") % _HLL_M).alias(
            "idx"
        ),
        F.conv(F.substring(h, 4, 15), 16, 10).cast("long").alias("w"),
    )
    return rr.groupBy("event_type", "idx").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(61)).otherwise(
                61 - F.length(F.bin(F.col("w")))
            )
        ).alias("rho")
    )


@register(
    "ts_percentile_hdr",
    family="timeseries",
    doc="Value-EXACT sketch percentiles (p50/p90/p99 per hypertable) "
    "via HDR log-linear buckets — the cross-engine-reproducible "
    "form of the toolkit's uddsketch/percentile_agg (log-spaced "
    "buckets, mergeable counts; timescaledb-toolkit percentile_agg "
    "is the uddsketch default). Bucket id is pure integer "
    "arithmetic on cents (msb from length(bin(x)), 4 kept mantissa "
    "bits => rel. error <= 1/16), so Spark and DuckDB bin every row "
    "identically and the whole sketch — not just an exact sibling — "
    "hash-certifies. Scale shape: one (type, bucket)-grain reduce "
    "with map-side partials (<= ~200 buckets/series regardless of "
    "row count), cumulative rank walk on the sketch grain only; "
    "sketches merge by count addition exactly like cagg partials. "
    "Reference semantics: toolkit percentile aggregates over "
    "hypertables (SURVEY §1; B10 is the engine-internal analog).",
    oracle=f"""
        WITH c AS (
            SELECT event_type, {_SQL_CENTS} AS cents FROM events
        ),
        b AS (
            SELECT event_type,
                   CASE WHEN cents < {_HDR_LIN} THEN cents
                        ELSE {_HDR_LIN}
                             + (length(bin(cents)) - 6) * {_HDR_SUB}
                             + ((cents >> (length(bin(cents)) - 5))
                                & {_HDR_SUB - 1})
                   END AS bucket_id
            FROM c
        ),
        g AS (
            SELECT event_type, bucket_id, count(*) AS cnt
            FROM b GROUP BY 1, 2
        ),
        w AS (
            SELECT event_type, bucket_id, cnt,
                   sum(cnt) OVER (PARTITION BY event_type
                                  ORDER BY bucket_id) AS cum,
                   sum(cnt) OVER (PARTITION BY event_type) AS n
            FROM g
        ),
        r AS (
            SELECT *,
                   CASE WHEN bucket_id < {_HDR_LIN} THEN 1
                        ELSE (CAST(1 AS BIGINT)
                              << ((bucket_id - {_HDR_LIN}) // {_HDR_SUB} + 1))
                   END AS width,
                   CASE WHEN bucket_id < {_HDR_LIN} THEN bucket_id
                        ELSE (CAST(1 AS BIGINT)
                              << ((bucket_id - {_HDR_LIN}) // {_HDR_SUB} + 5))
                             + ((bucket_id - {_HDR_LIN}) % {_HDR_SUB})
                               * (CAST(1 AS BIGINT)
                                  << ((bucket_id - {_HDR_LIN}) // {_HDR_SUB} + 1))
                   END AS lb
            FROM w
        ),
        e AS (
            SELECT *,
                   round((lb + (width - 1) / 2.0) / 100.0, 6) AS rep
            FROM r
        )
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_buckets,
               min(CASE WHEN cum >= ceil(0.5 * n) THEN rep END) AS p50_est,
               min(CASE WHEN cum >= ceil(0.9 * n) THEN rep END) AS p90_est,
               min(CASE WHEN cum >= ceil(0.99 * n) THEN rep END) AS p99_est
        FROM e
        GROUP BY 1
        ORDER BY 1
    """,
)
def ts_percentile_hdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return hdr_percentiles(hdr_buckets(events))


def hdr_percentiles(g: DataFrame) -> DataFrame:
    """Percentile read over (event_type, bucket_id, cnt) sketch
    partials: cumulative rank walk + mid-bucket representative, all on
    the sketch grain."""
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bucket_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    oct_shift = f"CAST((bucket_id - {_HDR_LIN}) / {_HDR_SUB} AS INT)"
    width = F.when(F.col("bucket_id") < _HDR_LIN, F.lit(1).cast("long")).otherwise(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {oct_shift} + 1)")
    )
    lb = F.when(F.col("bucket_id") < _HDR_LIN, F.col("bucket_id")).otherwise(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {oct_shift} + 5)")
        + F.expr(f"(bucket_id - {_HDR_LIN}) % {_HDR_SUB}") * width
    )
    e = (
        g.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("n", F.sum("cnt").over(w_all))
        .withColumn("rep", F.round((lb + (width - 1) / 2.0) / 100.0, 6))
    )

    def pick(q: float):
        # rep is strictly increasing in bucket_id, so min over the
        # qualifying buckets IS the first bucket reaching the rank
        return F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("rep"))
        )

    return (
        e.groupBy("event_type")
        .agg(
            F.max("n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_buckets"),
            pick(0.5).alias("p50_est"),
            pick(0.9).alias("p90_est"),
            pick(0.99).alias("p99_est"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_hll_md5",
    family="timeseries",
    doc="Value-EXACT HyperLogLog (m=512 registers, md5-derived hash) "
    "per hypertable — the deterministic sibling that certifies "
    "ts_count_distinct_hll's register mathematics cross-engine (the "
    "D12/E11 pattern applied to HLL): register index = 12 md5 bits "
    "mod 512, rho = leading zeros of the next 60 bits + 1 (via "
    "length(bin(w)) — integer-exact), harmonic sum folded over the "
    "idx-sorted register list (2^-rho terms are exact powers of "
    "two; the sorted sequential fold makes the float sum "
    "bit-identical across engines), standard linear-counting "
    "correction below 2.5m. Scale shape: one (type, register)-grain "
    "max-reduce with map-side partials — shuffle traffic is 512 "
    "rows per series independent of row count, the property that "
    "makes HLL the 100 TB swap-in; registers merge by max() exactly "
    "like the toolkit's hyperloglog rollup. The exact distinct "
    "count rides along so the certified output also PROVES the "
    "estimate lands within the 3-sigma band (|err| <= 14%).",
    oracle=f"""
        WITH h AS (
            SELECT event_type,
                   md5(CAST(user_id AS VARCHAR)) AS hx
            FROM events
        ),
        rr AS (
            SELECT event_type,
                   CAST(('0x' || substr(hx, 1, 3)) AS BIGINT) % {_HLL_M}
                       AS idx,
                   CAST(('0x' || substr(hx, 4, 15)) AS BIGINT) AS w
            FROM h
        ),
        regs AS (
            SELECT event_type, idx,
                   max(CASE WHEN w = 0 THEN 61
                            ELSE 61 - length(bin(w)) END) AS rho
            FROM rr GROUP BY 1, 2
        ),
        folded AS (
            SELECT event_type,
                   count(*) AS n_regs,
                   list_reduce(
                       list_prepend(
                           CAST(0.0 AS DOUBLE),
                           list(pow(2.0, -rho) ORDER BY idx)),
                       (a, b) -> a + b) AS s_regs
            FROM regs GROUP BY 1
        ),
        ex AS (
            SELECT event_type,
                   count(DISTINCT user_id) AS n_exact
            FROM events GROUP BY 1
        ),
        est AS (
            SELECT f.event_type, f.n_regs, e.n_exact,
                   (0.7213 / (1.0 + 1.079 / {_HLL_M}))
                       * {_HLL_M} * {_HLL_M}
                       / (f.s_regs + ({_HLL_M} - f.n_regs) * 1.0) AS raw,
                   {_HLL_M} - f.n_regs AS z
            FROM folded f JOIN ex e USING (event_type)
        )
        SELECT event_type,
               CAST(n_exact AS BIGINT) AS n_exact,
               CAST(n_regs AS BIGINT) AS n_regs,
               round(CASE WHEN raw <= 2.5 * {_HLL_M} AND z > 0
                          THEN {_HLL_M} * ln({_HLL_M} * 1.0 / z)
                          ELSE raw END, 4) AS n_approx
        FROM est
        ORDER BY 1
    """,
)
def ts_hll_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    ex = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return hll_estimate(hll_registers(events), ex)


def hll_estimate(regs: DataFrame, ex: DataFrame) -> DataFrame:
    """Cardinality read over (event_type, idx, rho) registers: sorted
    harmonic fold + linear-counting branch, joined with the exact
    count so certified output proves the error band."""
    folded = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("idx", "rho"))),
            F.lit(0.0),
            lambda acc, s: acc + F.pow(F.lit(2.0), -s["rho"]),
        ).alias("s_regs"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    raw = (
        F.lit(alpha)
        * _HLL_M
        * _HLL_M
        / (F.col("s_regs") + (_HLL_M - F.col("n_regs")) * F.lit(1.0))
    )
    z = _HLL_M - F.col("n_regs")
    est = folded.join(ex, "event_type").select(
        "event_type",
        "n_exact",
        "n_regs",
        F.round(
            F.when(
                (raw <= 2.5 * _HLL_M) & (z > 0),
                _HLL_M * F.log(_HLL_M * 1.0 / z),
            ).otherwise(raw),
            4,
        ).alias("n_approx"),
    )
    return est.orderBy("event_type")


@register(
    "ts_lag_features",
    family="timeseries",
    doc="Training-feature window matrix — the feature-engineering "
    "read a forecasting pipeline runs over a hypertable before "
    "model training: per (hypertable, day) revenue with row-offset "
    "lag-1/lag-7, trailing-7-row mean/min/max, and the 1-step-ahead "
    "target (lead-1). All sums ride on integer cents (exact at any "
    "merge order); the trailing mean divides the exact cent sum by "
    "the actual in-window row count, so series heads are correct "
    "without NULL-padding. Scale shape: one day-grain reduce with "
    "map-side partials, then per-series windows over day-grain rows "
    "(bounded by the calendar, not the event count) — the same "
    "two-level shape as the cagg rollups; windows partition on the "
    "series key so no single-partition WindowExec appears at any "
    "scale.",
    oracle=f"""
        WITH d AS (
            SELECT event_type,
                   ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {DAY}) AS day_s,
                   CAST(sum({_SQL_CENTS}) AS BIGINT) AS rev_cents,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        ),
        w AS (
            SELECT event_type, day_s, rev_cents, n_events,
                   lag(rev_cents, 1) OVER win AS lag1_cents,
                   lag(rev_cents, 7) OVER win AS lag7_cents,
                   sum(rev_cents) OVER (win ROWS BETWEEN 6 PRECEDING
                                        AND CURRENT ROW) AS roll7_cents,
                   count(*) OVER (win ROWS BETWEEN 6 PRECEDING
                                  AND CURRENT ROW) AS roll7_n,
                   min(rev_cents) OVER (win ROWS BETWEEN 6 PRECEDING
                                        AND CURRENT ROW) AS roll7_min_cents,
                   max(rev_cents) OVER (win ROWS BETWEEN 6 PRECEDING
                                        AND CURRENT ROW) AS roll7_max_cents,
                   lead(rev_cents, 1) OVER win AS next_cents
            FROM d
            WINDOW win AS (PARTITION BY event_type ORDER BY day_s)
        )
        SELECT event_type, day_s,
               round(rev_cents / 100.0, 6) AS revenue,
               CAST(n_events AS BIGINT) AS n_events,
               round(lag1_cents / 100.0, 6) AS rev_lag1,
               round(lag7_cents / 100.0, 6) AS rev_lag7,
               round(roll7_cents / (100.0 * roll7_n), 6) AS roll7_mean,
               round(roll7_min_cents / 100.0, 6) AS roll7_min,
               round(roll7_max_cents / 100.0, 6) AS roll7_max,
               round(next_cents / 100.0, 6) AS rev_next
        FROM w
        ORDER BY 1, 2
    """,
)
def ts_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    epoch = F.unix_micros(F.col("ts")) / 1_000_000
    day_s = (epoch.cast("long") - epoch.cast("long") % DAY).alias("day_s")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    d = (
        events.select("event_type", day_s, cents.alias("cents"))
        .groupBy("event_type", "day_s")
        .agg(
            F.sum("cents").alias("rev_cents"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    win = Window.partitionBy("event_type").orderBy("day_s")
    roll = win.rowsBetween(-6, 0)
    c100 = lambda c: F.round(c / 100.0, 6)  # noqa: E731
    return d.select(
        "event_type",
        "day_s",
        c100(F.col("rev_cents")).alias("revenue"),
        "n_events",
        c100(F.lag("rev_cents", 1).over(win)).alias("rev_lag1"),
        c100(F.lag("rev_cents", 7).over(win)).alias("rev_lag7"),
        F.round(
            F.sum("rev_cents").over(roll)
            / (100.0 * F.count(F.lit(1)).over(roll)),
            6,
        ).alias("roll7_mean"),
        c100(F.min("rev_cents").over(roll)).alias("roll7_min"),
        c100(F.max("rev_cents").over(roll)).alias("roll7_max"),
        c100(F.lead("rev_cents", 1).over(win)).alias("rev_next"),
    ).orderBy("event_type", "day_s")


# The two rollup certifications below re-use B59/B60's oracles
# verbatim (direct computation from raw rows): the Spark side instead
# builds DAILY sketch partials and MERGES them (count addition / 
# register max), so a driver hash-green means merge == direct — the
# B47/B43 contract applied to the sketches, certified by the driver
# rather than only asserted in pytest.

_HDR_ORACLE = REGISTRY["ts_percentile_hdr"].oracle
_HLL_ORACLE = REGISTRY["ts_hll_md5"].oracle


@register(
    "ts_percentile_hdr_rollup",
    family="timeseries",
    doc="Sketch-merge certification for B59: per-day HDR bucket "
    "partials merged by count addition, then the same percentile "
    "read — against B59's direct-from-raw oracle, so the driver "
    "hash proves merge == direct. This is the 100 TB deployment "
    "shape: continuous per-chunk sketch partials, dashboard "
    "percentiles from merged sketch-grain state only.",
    oracle=_HDR_ORACLE,
)
def ts_percentile_hdr_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    epoch = F.unix_micros(F.col("ts")) / 1_000_000
    day_s = (epoch.cast("long") - epoch.cast("long") % DAY).alias("day_s")
    daily = (
        hdr_buckets(events.withColumn("event_type",
                                      F.concat_ws("|", "event_type",
                                                  day_s.cast("string"))))
    )
    # split the composite key back out and MERGE the daily partials
    merged = (
        daily.withColumn("event_type",
                         F.split(F.col("event_type"), r"\|")[0])
        .groupBy("event_type", "bucket_id")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return hdr_percentiles(merged)


@register(
    "ts_hll_rollup",
    family="timeseries",
    doc="Register-merge certification for B60: per-day HLL register "
    "tables merged by max(rho), then the same estimate read — "
    "against B60's direct-from-raw oracle, so the driver hash "
    "proves merge == direct (the toolkit's hyperloglog rollup "
    "semantics). Shuffle traffic stays at 512 rows per (series, "
    "day) partial.",
    oracle=_HLL_ORACLE,
)
def ts_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    epoch = F.unix_micros(F.col("ts")) / 1_000_000
    day_s = (epoch.cast("long") - epoch.cast("long") % DAY).alias("day_s")
    daily = hll_registers(
        events.withColumn("event_type",
                          F.concat_ws("|", "event_type",
                                      day_s.cast("string")))
    )
    merged = (
        daily.withColumn("event_type",
                         F.split(F.col("event_type"), r"\|")[0])
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    ex = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return hll_estimate(merged, ex)


_H_US = 3_600 * 1_000_000  # one bucket, in exact integer micros


@register(
    "ts_interpolated_time_weight",
    family="timeseries",
    doc="Toolkit interpolated_average (B64): per-bucket time-weighted "
    "LOCF average where a value-hold segment crossing a bucket "
    "boundary contributes to EVERY bucket it overlaps, "
    "proportionally to the overlap — the boundary-interpolation "
    "semantics time_weight(B14) deliberately skips (toolkit's "
    "interpolated_average / interpolated_integral accessors; the "
    "reference streams the hypertables these run on). All mass "
    "arithmetic is exact integers (cents x overlap-micros, bounded "
    "~1e17 << 2^63), so the sum is order-independent and the one "
    "float division is the engine-stable floor-round form. Plan: "
    "one per-series window (same shuffle key as B14), a BOUNDED "
    "explode (segments/bucket-span, the gapfill contract), one "
    "(type, bucket) reduce. At 100 TB the explode factor is "
    "span/bucket — the same bound every gapfill deployment already "
    "accepts — and the reduce key is low-cardinality x time, AQE- "
    "coalesced.",
    oracle=f"""
        WITH seg AS (
            SELECT event_type,
                   {_SQL_CENTS} AS cents,
                   epoch_us(ts) AS t0,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY event_type, user_id ORDER BY ts, event_id
                   ) AS t1
            FROM events
        ),
        split AS (
            SELECT event_type, cents, b,
                   least(t1, (b + 1) * {_H_US}) -
                       greatest(t0, b * {_H_US}) AS overlap_us
            FROM seg,
                 unnest(generate_series(t0 // {_H_US},
                                        (t1 - 1) // {_H_US})) AS u(b)
            WHERE t1 IS NOT NULL AND t1 > t0
        )
        SELECT event_type,
               make_timestamp(b * {_H_US}) AS bucket,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(sum(overlap_us) AS BIGINT) AS covered_us,
               floor(CAST(sum(cents * overlap_us) AS DOUBLE) * 10000.0
                     / sum(overlap_us) + 0.5) / 1000000.0
                   AS interpolated_avg
        FROM split
        GROUP BY 1, 2
    """,
)
def ts_interpolated_time_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    seg = events.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.unix_micros("ts").alias("t0"),
        F.lead(F.unix_micros("ts")).over(w).alias("t1"),
    ).filter(F.col("t1").isNotNull() & (F.col("t1") > F.col("t0")))
    h = F.lit(_H_US).cast("long")
    split = seg.select(
        "event_type",
        "cents",
        "t1",
        F.explode(
            F.sequence(
                (F.col("t0") / h).cast("long"),
                ((F.col("t1") - 1) / h).cast("long"),
            )
        ).alias("b"),
        "t0",
    ).select(
        "event_type",
        "cents",
        F.col("b"),
        (
            F.least(F.col("t1"), (F.col("b") + 1) * h)
            - F.greatest(F.col("t0"), F.col("b") * h)
        ).alias("overlap_us"),
    )
    mass = F.sum(F.col("cents") * F.col("overlap_us"))
    dur = F.sum("overlap_us")
    return (
        split.groupBy("event_type", F.timestamp_micros(F.col("b") * h).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            dur.alias("covered_us"),
            (F.floor(mass.cast("double") * 10000.0 / dur + 0.5) / 1000000.0).alias(
                "interpolated_avg"
            ),
        )
    )


#: staleness bound for the tolerance-bounded as-of join: 48 hours
_ASOF_TOL_S = 48 * 3600


@register(
    "ts_asof_tolerance",
    family="timeseries",
    doc="Tolerance-bounded as-of join (B66) — B12's backward as-of "
    "with a staleness bound (pandas merge_asof(tolerance=...), kdb "
    "wj): each click takes the user's most recent purchase ONLY if "
    "it is at most 48 h old, and the output carries the match age "
    "plus a fresh/stale/none status so downstream logic can "
    "distinguish 'no purchase ever' from 'purchase too old' — the "
    "semantics sensor-alignment and attribution pipelines actually "
    "need (an unbounded LOCF silently attributes to arbitrarily "
    "stale state). Same scale shape as B12: union + one LOCF window "
    "on the user key, zero row multiplication; the matched ts rides "
    "the same carry as the value, and age math is exact integer "
    "micros. The helper's tolerance_s path is pytest-proven "
    "equivalent to the emitted nulling rule.",
    oracle=f"""
        WITH p AS (
            SELECT user_id, ts, max(value) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts
        ),
        c AS (
            SELECT event_id, user_id, ts, value AS click_value
            FROM events WHERE event_type = 'click'
        ),
        j AS (
            SELECT c.event_id, c.user_id, c.ts, c.click_value,
                   p.purchase_value, p.ts AS p_ts
            FROM c ASOF LEFT JOIN p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        )
        SELECT event_id, user_id, ts, click_value,
               CASE WHEN p_ts IS NOT NULL
                    THEN (epoch_us(ts) - epoch_us(p_ts)) // 1000000
               END AS match_age_s,
               CASE WHEN p_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(p_ts)
                         <= {_ASOF_TOL_S * 1_000_000}
                    THEN purchase_value
               END AS purchase_value_fresh,
               CASE WHEN p_ts IS NULL THEN 'none'
                    WHEN epoch_us(ts) - epoch_us(p_ts)
                         <= {_ASOF_TOL_S * 1_000_000} THEN 'fresh'
                    ELSE 'stale'
               END AS match_status
        FROM j
    """,
)
def ts_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.functions.timeseries import asof_join

    events = load(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
        .withColumn("p_ts", F.col("ts"))
    )
    j = asof_join(
        clicks,
        purchases,
        on="ts",
        by=["user_id"],
        value_cols=["purchase_value", "p_ts"],
    )
    age_us = F.unix_micros("ts") - F.unix_micros("p_ts")
    tol_us = F.lit(_ASOF_TOL_S * 1_000_000).cast("long")
    matched = F.col("p_ts").isNotNull()
    return j.select(
        "event_id",
        "user_id",
        "ts",
        "click_value",
        F.when(matched, (age_us / 1_000_000).cast("long")).alias("match_age_s"),
        F.when(matched & (age_us <= tol_us), F.col("purchase_value")).alias(
            "purchase_value_fresh"
        ),
        F.when(~matched, F.lit("none"))
        .when(age_us <= tol_us, F.lit("fresh"))
        .otherwise(F.lit("stale"))
        .alias("match_status"),
    )


@register(
    "ts_stats_agg_2d",
    family="timeseries",
    doc="2-D stats_agg accessors (B67) — the toolkit's two-variable "
    "statistical aggregate over (time, value) per hypertable: "
    "covariance, regression slope / intercept (trend per hour) and "
    "r^2, the accessors B9's 1-D stats_agg doesn't carry "
    "(timescaledb-toolkit stats_agg(y, x) with slope() / "
    "intercept() / corr() / covariance()). Engine-exactness "
    "discipline: x = hours since the series' first point (exact "
    "integer, bounded so every moment sum n*Sxy, n*Sxx stays well "
    "inside 2^63), y = exact cents; all five moment sums are "
    "integer-exact and order-independent, and the final "
    "slope/intercept/r2/cov divisions are single pinned-order "
    "double expressions over those exact integers — bit-identical "
    "across engines and partitionings. One scan, a 1-row-per-series "
    "min-ts broadcast join, one reduce. Exactness bound: n*Sxy "
    "stays in int64 to ~1e8 rows/series at these domains; past "
    "that, SPARK_GRAFT_MOMENT_SUMS=decimal flips the moment sums "
    "to DECIMAL(38,0) (functions/exact.py) — same plan shape, both "
    "engines aggregate decimals exactly, value parity pinned by "
    "tests/test_exact_sums.py.",
    oracle=f"""
        WITH m AS (
            SELECT event_type, min(epoch_us(ts)) AS t0 FROM events GROUP BY 1
        ),
        p AS (
            SELECT e.event_type,
                   (epoch_us(e.ts) - m.t0) // 3600000000 AS x,
                   {_SQL_CENTS} AS y
            FROM events e JOIN m USING (event_type)
        ),
        s AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM p GROUP BY 1
        )
        SELECT event_type, n,
               round((n * sxy - sx * sy) * 1.0 / (n * n), 6)
                   AS covariance_pop,
               CASE WHEN n * sxx - sx * sx != 0 THEN
                   round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6)
               END AS slope_cents_per_hour,
               CASE WHEN n * sxx - sx * sx != 0 THEN
                   round((sy * 1.0 / n)
                         - ((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx))
                           * (sx * 1.0 / n), 6)
               END AS intercept_cents,
               CASE WHEN (n * sxx - sx * sx) != 0 AND (n * syy - sy * sy) != 0
                    THEN round(((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy))
                               / ((n * sxx - sx * sx) * 1.0
                                  * (n * syy - sy * sy)), 6)
               END AS r2
        FROM s
    """,
)
def ts_stats_agg_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    m = events.groupBy("event_type").agg(
        F.min(F.unix_micros("ts")).alias("t0")
    )
    p = events.join(F.broadcast(m), "event_type").select(
        "event_type",
        ((F.unix_micros("ts") - F.col("t0")) / 3_600_000_000).cast("long").alias("x"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y"),
    )
    from timescaledb_event_streamer_spark.functions.exact import moment_sum

    s = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        moment_sum(F.col("x")).alias("sx"),
        moment_sum(F.col("y")).alias("sy"),
        moment_sum(F.col("x") * F.col("x")).alias("sxx"),
        moment_sum(F.col("y") * F.col("y")).alias("syy"),
        moment_sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_num = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    # zero-variance guards: a single-point or constant series has no
    # slope / r2 — NULL on both engines, and ANSI mode must never see
    # the zero divisor
    slope = F.when(var_x != 0, cov_num * 1.0 / var_x)
    return s.select(
        "event_type",
        "n",
        F.round(cov_num * 1.0 / (n * n), 6).alias("covariance_pop"),
        F.round(slope, 6).alias("slope_cents_per_hour"),
        F.round((sy * 1.0 / n) - slope * (sx * 1.0 / n), 6).alias(
            "intercept_cents"
        ),
        F.when(
            (var_x != 0) & (var_y != 0),
            F.round((cov_num * 1.0 * cov_num) / (var_x * 1.0 * var_y), 6),
        ).alias("r2"),
    )


#: seasonal-naive period: 24 hourly buckets (same hour yesterday)
_SEASON_H = 24


@register(
    "ts_seasonal_backtest",
    family="timeseries",
    doc="Seasonal-naive forecast backtest (B68): predict each hourly "
    "bucket's revenue sum as the SAME HOUR ONE SEASON (24 h) "
    "earlier, then score the prediction over every bucket that has "
    "a season-old ancestor — the baseline every forecasting "
    "pipeline must beat before a model earns its training cost, "
    "and the backtest read TimescaleDB users run over caggs. "
    "Exactness: predictions and errors live on integer cent sums "
    "(MAE is an exact integer average rendered with the stable "
    "floor-round; MAPE is a pinned-order double over exact ints, "
    "zero-actual buckets excluded from MAPE's denominator "
    "explicitly). Plan: one (type, bucket) reduce, one bucket-grain shifted self-join "
    "(calendar-exact same-hour-yesterday even across gaps — a row-lag would mispredict gapped series), one per-series "
    "reduce — event-grain data is touched exactly once.",
    oracle=f"""
        WITH b AS (
            SELECT event_type,
                   ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 3600) AS bucket_s,
                   sum({_SQL_CENTS}) AS cents
            FROM events GROUP BY 1, 2
        ),
        lagged AS (
            SELECT b.event_type, b.bucket_s, b.cents, p.cents AS pred
            FROM b JOIN b p
              ON b.event_type = p.event_type
             AND p.bucket_s = b.bucket_s - {_SEASON_H} * 3600
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(abs(cents - pred)) AS BIGINT) AS total_abs_err_cents,
               floor(sum(abs(cents - pred)) * 10000.0 / count(*) + 0.5)
                   / 10000.0 AS mae_cents,
               round(sum(CASE WHEN cents != 0
                              THEN abs(cents - pred) * 1.0 / cents END)
                     / count(CASE WHEN cents != 0 THEN 1 END), 6) AS mape
        FROM lagged
        GROUP BY 1
    """,
)
def ts_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    epoch = (F.unix_micros("ts") / 1_000_000).cast("long")
    b = (
        events.select(
            "event_type",
            (epoch - epoch % 3600).alias("bucket_s"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("event_type", "bucket_s")
        .agg(F.sum("cents").alias("cents"))
    )
    # calendar join, not lag-by-rows: with gapped series a 24-ROW lag
    # silently predicts from the wrong hour; the shifted equi-join is
    # exact same-hour-yesterday and stays co-partitioned on the
    # (type, bucket) key family
    pred = b.select(
        "event_type",
        (F.col("bucket_s") + _SEASON_H * 3600).alias("bucket_s"),
        F.col("cents").alias("pred"),
    )
    lagged = b.join(pred, ["event_type", "bucket_s"])
    abs_err = F.abs(F.col("cents") - F.col("pred"))
    nonzero = F.col("cents") != 0
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(abs_err).alias("total_abs_err_cents"),
        (
            F.floor(F.sum(abs_err) * 10000.0 / F.count(F.lit(1)) + 0.5) / 10000.0
        ).alias("mae_cents"),
        F.round(
            F.sum(F.when(nonzero, abs_err * 1.0 / F.col("cents")))
            / F.count(F.when(nonzero, F.lit(1))),
            6,
        ).alias("mape"),
    )


def _gorilla_cost_sql(x: str) -> str:
    """Gorilla delta-of-delta bucket cost in bits (Pelkonen et al.,
    VLDB'15 §4.1.1: '0' / '10'+7 / '110'+9 / '1110'+12 / '1111'+32)."""
    return f"""CASE WHEN {x} = 0 THEN 1
                WHEN {x} BETWEEN -63 AND 64 THEN 9
                WHEN {x} BETWEEN -255 AND 256 THEN 12
                WHEN {x} BETWEEN -2047 AND 2048 THEN 16
                ELSE 36 END"""


@register(
    "ts_gorilla_estimate",
    family="timeseries",
    doc="Gorilla compression-cost model per chunk (B69) — the bit "
    "accounting behind B53's projected row reduction: per (hyper"
    "table, 7-day chunk), timestamps cost delta-of-delta bits and "
    "values cost delta bits on the exact cent grid, both classed by "
    "the Gorilla bucket table ('0'/'10'+7/'110'+9/'1110'+12/"
    "'1111'+32; Pelkonen et al. VLDB'15 — the scheme TimescaleDB's "
    "columnar timestamp compression derives from), first row at "
    "full 64+64, second row's time delta at the 14-bit header slot "
    "with a 36-bit escape. Everything is integer CASE arithmetic on "
    "second-grain deltas — order-fixed by (ts, event_id), exact on "
    "both engines. Plan: one window shuffle on the (type, chunk) "
    "key (the natural partition — per-chunk sequential scan is "
    "exactly how the real encoder runs), chunk-grain reduce.",
    oracle=f"""
        WITH p AS (
            SELECT event_type,
                   ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {7 * 24 * 3600})
                       AS chunk_s,
                   {_SQL_EPOCH_S} AS t_s,
                   {_SQL_CENTS} AS cents,
                   event_id
            FROM events
        ),
        d AS (
            SELECT event_type, chunk_s,
                   row_number() OVER w AS rn,
                   t_s - lag(t_s) OVER w AS d1,
                   (t_s - lag(t_s) OVER w)
                       - (lag(t_s) OVER w - lag(t_s, 2) OVER w) AS dod,
                   cents - lag(cents) OVER w AS dv
            FROM p
            WINDOW w AS (PARTITION BY event_type, chunk_s
                         ORDER BY t_s, event_id)
        ),
        costed AS (
            SELECT event_type, chunk_s,
                   CASE WHEN rn = 1 THEN 64
                        WHEN rn = 2 THEN
                            CASE WHEN abs(d1) <= 8191 THEN 14 ELSE 36 END
                        ELSE {_gorilla_cost_sql('dod')}
                   END AS ts_bits,
                   CASE WHEN rn = 1 THEN 64
                        ELSE {_gorilla_cost_sql('dv')}
                   END AS val_bits
            FROM d
        )
        SELECT event_type AS hypertable_name,
               chunk_s,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) * 128 AS BIGINT) AS raw_bits,
               CAST(sum(ts_bits) AS BIGINT) AS est_ts_bits,
               CAST(sum(val_bits) AS BIGINT) AS est_val_bits,
               round(count(*) * 128.0
                     / (sum(ts_bits) + sum(val_bits)), 4) AS est_ratio
        FROM costed
        GROUP BY 1, 2
    """,
)
def ts_gorilla_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    epoch = (F.unix_micros("ts") / 1_000_000).cast("long")
    chunk = epoch - epoch % (7 * 24 * 3600)
    p = events.select(
        "event_type",
        chunk.alias("chunk_s"),
        epoch.alias("t_s"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "chunk_s").orderBy("t_s", "event_id")
    d = p.select(
        "event_type",
        "chunk_s",
        F.row_number().over(w).alias("rn"),
        (F.col("t_s") - F.lag("t_s").over(w)).alias("d1"),
        (
            (F.col("t_s") - F.lag("t_s").over(w))
            - (F.lag("t_s").over(w) - F.lag("t_s", 2).over(w))
        ).alias("dod"),
        (F.col("cents") - F.lag("cents").over(w)).alias("dv"),
    )

    def cost(x):
        return (
            F.when(x == 0, 1)
            .when((x >= -63) & (x <= 64), 9)
            .when((x >= -255) & (x <= 256), 12)
            .when((x >= -2047) & (x <= 2048), 16)
            .otherwise(36)
        )

    costed = d.select(
        "event_type",
        "chunk_s",
        F.when(F.col("rn") == 1, 64)
        .when(
            F.col("rn") == 2,
            F.when(F.abs("d1") <= 8191, 14).otherwise(36),
        )
        .otherwise(cost(F.col("dod")))
        .alias("ts_bits"),
        F.when(F.col("rn") == 1, 64).otherwise(cost(F.col("dv"))).alias(
            "val_bits"
        ),
    )
    return costed.groupBy(
        F.col("event_type").alias("hypertable_name"), "chunk_s"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) * 128).alias("raw_bits"),
        F.sum("ts_bits").alias("est_ts_bits"),
        F.sum("val_bits").alias("est_val_bits"),
        F.round(
            F.count(F.lit(1)) * 128.0
            / (F.sum("ts_bits") + F.sum("val_bits")),
            4,
        ).alias("est_ratio"),
    )


#: the pivot's static column contract: explicit value list, the
#: production form (Spark requires known pivot values for a stable
#: schema; inferring them adds a collect and makes downstream schemas
#: data-dependent)
_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "ts_pivot_features",
    family="timeseries",
    doc="Wide-format pivot feature matrix (B70): one row per hourly "
    "bucket, one (revenue, count) column pair per event type — the "
    "long->wide reshape every model-training join ultimately wants "
    "(B61's lag matrix in the row direction; this is the column "
    "direction). Spark-native .pivot() with an EXPLICIT value list: "
    "the production contract, since inferred pivot values cost a "
    "collect and make downstream schemas data-dependent. Exact "
    "integer cents; absent (bucket, type) cells are zero-filled so "
    "the matrix is dense. Plan: one scan, ONE (bucket)-keyed "
    "reduce — the pivot is a map-side conditional projection, not "
    "an extra shuffle; the oracle re-derives via portable "
    "conditional aggregation.",
    oracle=f"""
        SELECT ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 3600) AS bucket_s,
        """
    + ",\n".join(
        f"""
               CAST(coalesce(sum(CASE WHEN event_type = '{t}'
                   THEN {_SQL_CENTS} END), 0) AS BIGINT) AS {t}_cents,
               CAST(count(CASE WHEN event_type = '{t}' THEN 1 END)
                   AS BIGINT) AS {t}_n"""
        for t in _PIVOT_TYPES
    )
    + """
        FROM events
        GROUP BY 1
    """,
)
def ts_pivot_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    epoch = (F.unix_micros("ts") / 1_000_000).cast("long")
    base = events.select(
        (epoch - epoch % 3600).alias("bucket_s"),
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    wide = (
        base.groupBy("bucket_s")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(
            F.sum("cents").alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return wide.select(
        "bucket_s",
        *[
            c
            for t in _PIVOT_TYPES
            for c in (
                F.coalesce(F.col(f"{t}_cents"), F.lit(0).cast("long")).alias(
                    f"{t}_cents"
                ),
                F.coalesce(F.col(f"{t}_n"), F.lit(0).cast("long")).alias(
                    f"{t}_n"
                ),
            )
        ],
    )


@register(
    "ts_unpivot_long",
    family="timeseries",
    doc="Unpivot / melt — the reshape inverse of B70, registered as a "
    "ROUNDTRIP proof: the wide feature matrix is melted back to "
    "long form with Spark's stack() and must hash-equal the direct "
    "long aggregate the oracle computes — so the pivot/unpivot pair "
    "is certified lossless (zero-filled cells are dropped on the "
    "way back, restoring the sparse long form exactly). stack() is "
    "a map-side row generator: no shuffle beyond B70's single "
    "bucket reduce.",
    oracle=f"""
        SELECT ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 3600) AS bucket_s,
               event_type,
               CAST(sum({_SQL_CENTS}) AS BIGINT) AS cents,
               CAST(count(*) AS BIGINT) AS n
        FROM events
        GROUP BY 1, 2
    """,
)
def ts_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = ts_pivot_features(spark, sf_dir)
    stack_expr = "stack({n}, {args}) AS (event_type, cents, n)".format(
        n=len(_PIVOT_TYPES),
        args=", ".join(f"'{t}', {t}_cents, {t}_n" for t in _PIVOT_TYPES),
    )
    return (
        wide.select("bucket_s", F.expr(stack_expr))
        # drop the dense zero-fill: a (bucket, type) with no events has
        # no long-form row
        .filter(F.col("n") > 0)
    )
