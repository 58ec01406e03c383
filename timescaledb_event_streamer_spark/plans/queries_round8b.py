"""Round-8 continuation: the technical-indicator dashboard family
(B83–B87) — MACD, VWAP, stochastic oscillator, CUSUM change
detection, and on-balance volume over the `events` hypertable.

These extend the B72/B73/B74/B82 family (Bollinger/RSI/drawdown/ATR):
every indicator reduces raw events to a day-grain per-series frame
first (bounded by calendar x series cardinality, NOT event volume),
then runs bounded windows over that frame. All arithmetic that feeds
a comparison or a hash-checked value is exact-integer (cents,
`props.$.k` volume units) or a deterministic fixed-order fold, the
ts_rsi / ts_ewma engine-exactness reasoning.

Reference anchor: the hypertable/cagg analytics surface the streamer
feeds (SURVEY §1; `spi/schema/eventschema.go` is the events shape) —
these are the continuous-aggregate-style dashboard queries a
TimescaleDB user runs downstream of the CDC feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load, spread

_SQL_EPOCH_S = "(epoch_us(ts) // 1000000)"
_SQL_DAY_S = f"CAST({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 86400 AS BIGINT)"

#: daily close/high/low/volume on exact integer cents + integer
#: volume units — the shared day-grain reduce every indicator
#: in this module starts from. Volume is the J1-typed `props.$.k`
#: extraction (the ts_candlestick precedent, queries_round6.py:633).
_SQL_DAILY = f"""
        daily AS (
            SELECT event_type AS series,
                   {_SQL_DAY_S} AS day_s,
                   max(CAST(round(value * 100) AS BIGINT)) AS hc,
                   min(CAST(round(value * 100) AS BIGINT)) AS lc,
                   arg_max(CAST(round(value * 100) AS BIGINT), event_id)
                       AS cc,
                   CAST(sum(CAST(json_extract_string(props, '$.k')
                       AS BIGINT)) AS BIGINT) AS vol
            FROM events GROUP BY 1, 2
        )
"""


def _daily_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark side of _SQL_DAILY: one day-grain partial-agg reduce
    (map-side combine; output rows = series x calendar days, bounded
    regardless of event volume)."""
    events = load(spark, sf_dir, "events")
    es = F.expr("unix_micros(ts) div 1000000")
    c = F.round(F.col("value") * 100, 0).cast("long")
    vol = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("_es", es)
        .groupBy(
            F.col("event_type").alias("series"),
            (F.col("_es") - F.pmod(F.col("_es"), F.lit(86400))).alias("day_s"),
        )
        .agg(
            F.max(c).alias("hc"),
            F.min(c).alias("lc"),
            F.max_by(c, F.col("event_id")).alias("cc"),
            F.sum(vol).alias("vol"),
        )
    )


# ---------------------------------------------------------------------------
# B83 ts_macd


#: ewm spans: MACD fast/slow/signal — alpha = 2/(span+1)
_MACD_FAST, _MACD_SLOW, _MACD_SIG = 12, 26, 9
#: bounded-window length for the weight-normalized EWMA form
#: (covers > 5 slow-span time constants; pandas ewm adjust=True
#: over this window); the B38 ts_ewma precedent.
_MACD_WIN = 40


@register(
    "ts_macd",
    family="timeseries",
    doc="MACD(12,26,9) per series on the daily close (B83, the "
    "B72/B73 dashboard family): fast/slow lines are weight-"
    "normalized bounded-window EWMAs (pandas ewm adjust=True over "
    "a 40-day window — the B38 SQL-expressible form of the EMA "
    "recursion), the signal line is the 9-span EWMA of the UNROUNDED "
    "macd values, histogram = macd - signal. Every fold runs over an "
    "ordered bounded collect_list in frame order on both engines "
    "(deterministic, bit-identical), rounded once at the output. "
    "Day-grain per-series windows; state bounded by calendar, not "
    "event volume.",
    oracle=f"""
        WITH {_SQL_DAILY},
        arrs AS (
            SELECT series, day_s,
                   list(cc) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_MACD_WIN - 1} PRECEDING
                            AND CURRENT ROW
                   ) AS arr
            FROM daily
        ),
        lines AS (
            SELECT series, day_s,
                   list_sum(list_transform(arr,
                       (v, i) -> v * pow(1.0 - 2.0/{_MACD_FAST + 1}.0,
                                         len(arr) - i))) /
                   list_sum(list_transform(arr,
                       (v, i) -> pow(1.0 - 2.0/{_MACD_FAST + 1}.0,
                                     len(arr) - i))) AS fast,
                   list_sum(list_transform(arr,
                       (v, i) -> v * pow(1.0 - 2.0/{_MACD_SLOW + 1}.0,
                                         len(arr) - i))) /
                   list_sum(list_transform(arr,
                       (v, i) -> pow(1.0 - 2.0/{_MACD_SLOW + 1}.0,
                                     len(arr) - i))) AS slow
            FROM arrs
        ),
        macd AS (
            SELECT series, day_s, fast - slow AS m FROM lines
        ),
        sig AS (
            SELECT series, day_s, m,
                   list(m) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_MACD_WIN - 1} PRECEDING
                            AND CURRENT ROW
                   ) AS marr
            FROM macd
        )
        SELECT series, day_s,
               round(m / 100.0, 6) AS macd,
               round(list_sum(list_transform(marr,
                         (v, i) -> v * pow(1.0 - 2.0/{_MACD_SIG + 1}.0,
                                           len(marr) - i))) /
                     list_sum(list_transform(marr,
                         (v, i) -> pow(1.0 - 2.0/{_MACD_SIG + 1}.0,
                                       len(marr) - i))) / 100.0,
                     6) AS signal,
               round((m - list_sum(list_transform(marr,
                         (v, i) -> v * pow(1.0 - 2.0/{_MACD_SIG + 1}.0,
                                           len(marr) - i))) /
                     list_sum(list_transform(marr,
                         (v, i) -> pow(1.0 - 2.0/{_MACD_SIG + 1}.0,
                                       len(marr) - i)))) / 100.0,
                     6) AS histogram
        FROM sig
    """,
)
def ts_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    w = (
        Window.partitionBy("series")
        .orderBy("day_s")
        .rowsBetween(-(_MACD_WIN - 1), Window.currentRow)
    )

    def ewma_arr(arr: str, span: int) -> F.Column:
        # Spark transform index j is 0-based (newest = size-1);
        # DuckDB's i is 1-based (newest = len) — both weight the
        # newest element (1-alpha)^0... times (1-alpha)^1 extra on
        # BOTH num and den, which cancels. Same fold order, same
        # doubles.
        d = 1.0 - 2.0 / (span + 1.0)
        num = F.expr(
            f"aggregate(transform({arr}, (v, j) ->"
            f" v * power({d!r}D, size({arr}) - j)), 0D, (a, v) -> a + v)"
        )
        den = F.expr(
            f"aggregate(transform({arr}, (v, j) ->"
            f" power({d!r}D, size({arr}) - j)), 0D, (a, v) -> a + v)"
        )
        return num / den

    arrs = daily.withColumn(
        "arr", F.collect_list(F.col("cc").cast("double")).over(w)
    )
    macd = arrs.select(
        "series",
        "day_s",
        (ewma_arr("arr", _MACD_FAST) - ewma_arr("arr", _MACD_SLOW)).alias("m"),
    )
    sig = macd.withColumn("marr", F.collect_list("m").over(w))
    s = ewma_arr("marr", _MACD_SIG)
    return sig.select(
        "series",
        "day_s",
        F.round(F.col("m") / 100.0, 6).alias("macd"),
        F.round(s / 100.0, 6).alias("signal"),
        F.round((F.col("m") - s) / 100.0, 6).alias("histogram"),
    )


# ---------------------------------------------------------------------------
# B84 ts_vwap


@register(
    "ts_vwap",
    family="timeseries",
    doc="Volume-weighted average price per series (B84): daily VWAP "
    "= sum(price_cents x volume) / sum(volume) and the running "
    "CUMULATIVE VWAP (anchored at series start) — both ratios of "
    "exact BIGINT sums (price on integer cents, volume from the "
    "J1-typed props.$.k extraction), divided and rounded ONCE per "
    "output row, so certification is value-exact at any SF. The "
    "event-grain weighted sums fold map-side (partial agg); the "
    "running form is a day-grain prefix sum per series.",
    oracle=f"""
        WITH pv AS (
            SELECT event_type AS series,
                   {_SQL_DAY_S} AS day_s,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)
                       * CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS BIGINT) AS pv_c,
                   CAST(sum(CAST(json_extract_string(props, '$.k')
                       AS BIGINT)) AS BIGINT) AS v
            FROM events GROUP BY 1, 2
        )
        SELECT series, day_s,
               round(pv_c * 1.0 / v / 100.0, 6) AS vwap_day,
               round(
                   sum(pv_c) OVER (PARTITION BY series ORDER BY day_s)
                   * 1.0 /
                   sum(v) OVER (PARTITION BY series ORDER BY day_s)
                   / 100.0, 6) AS vwap_running
        FROM pv
    """,
)
def ts_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    es = F.expr("unix_micros(ts) div 1000000")
    c = F.round(F.col("value") * 100, 0).cast("long")
    vol = F.get_json_object("props", "$.k").cast("long")
    pv = (
        events.withColumn("_es", es)
        .groupBy(
            F.col("event_type").alias("series"),
            (F.col("_es") - F.pmod(F.col("_es"), F.lit(86400))).alias("day_s"),
        )
        .agg(F.sum(c * vol).alias("pv_c"), F.sum(vol).alias("v"))
    )
    w = Window.partitionBy("series").orderBy("day_s")
    return pv.select(
        "series",
        "day_s",
        F.round(F.col("pv_c") / F.col("v") / 100.0, 6).alias("vwap_day"),
        F.round(
            F.sum("pv_c").over(w) / F.sum("v").over(w) / 100.0, 6
        ).alias("vwap_running"),
    )


# ---------------------------------------------------------------------------
# B85 ts_stochastic


_STOCH_WIN = 14  # %K lookback (days)
_STOCH_SMOOTH = 3  # %D smoothing (days)


@register(
    "ts_stochastic",
    family="timeseries",
    doc="Stochastic oscillator %K/%D per series (B85): %K = "
    "(close - 14-day low) / (14-day high - 14-day low) on exact "
    "integer cents — a ratio of integers rounded once — and %D = "
    "the 3-day SMA of the ROUNDED %K (a fixed-order 3-element "
    "window sum of identical doubles on both engines). Rows with a "
    "degenerate range (high == low) report NULL %K. Day-grain "
    "per-series windows, calendar-bounded state.",
    oracle=f"""
        WITH {_SQL_DAILY},
        k AS (
            SELECT series, day_s,
                   row_number() OVER w AS rn,
                   CASE WHEN max(hc) OVER wk > min(lc) OVER wk THEN
                       round((cc - min(lc) OVER wk) * 100.0 /
                             (max(hc) OVER wk - min(lc) OVER wk), 6)
                   END AS pct_k
            FROM daily
            WINDOW w  AS (PARTITION BY series ORDER BY day_s),
                   wk AS (PARTITION BY series ORDER BY day_s
                          ROWS BETWEEN {_STOCH_WIN - 1} PRECEDING
                               AND CURRENT ROW)
        )
        SELECT series, day_s, pct_k,
               CASE WHEN rn >= {_STOCH_SMOOTH} THEN
                   round(avg(pct_k) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_STOCH_SMOOTH - 1} PRECEDING
                            AND CURRENT ROW), 6)
               END AS pct_d
        FROM k
    """,
)
def ts_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("series").orderBy("day_s")
    wk = w.rowsBetween(-(_STOCH_WIN - 1), Window.currentRow)
    hh, ll = F.max("hc").over(wk), F.min("lc").over(wk)
    k = daily.select(
        "series",
        "day_s",
        F.row_number().over(w).alias("rn"),
        F.when(
            hh > ll, F.round((F.col("cc") - ll) * 100.0 / (hh - ll), 6)
        ).alias("pct_k"),
    )
    wd = w.rowsBetween(-(_STOCH_SMOOTH - 1), Window.currentRow)
    return k.select(
        "series",
        "day_s",
        "pct_k",
        F.when(
            F.col("rn") >= _STOCH_SMOOTH, F.round(F.avg("pct_k").over(wd), 6)
        ).alias("pct_d"),
    )


# ---------------------------------------------------------------------------
# B86 ts_cusum


#: alarm threshold in mean-absolute-deviation units
_CUSUM_H_MAD = 4


@register(
    "ts_cusum",
    family="timeseries",
    doc="Open-ended CUSUM change detection per series (B86, the "
    "B39 level-shift family done EXACTLY): the textbook recursion "
    "S+_t = max(0, S+_{t-1} + x_t - mu) is not a window function, "
    "but multiplying through by n turns it into pure prefix "
    "algebra on integers — P_t = cumsum(n*x_c - S) (x_c = daily "
    "close cents, S = series sum, so n*x - S is the n-scaled "
    "deviation from the series mean) gives S+_t = (P_t - running "
    "min P)/n and S-_t = (running max P - P_t)/n, both EXACT "
    "BIGINT window expressions — no recursion, no fold, two window "
    "passes. Alarms fire above " + str(_CUSUM_H_MAD) + "x the mean "
    "absolute deviation, compared in cross-multiplied integer form "
    "(never a float boundary). The 100 TB shape: one day-grain "
    "reduce, then windows over calendar-bounded frames.",
    oracle=f"""
        WITH {_SQL_DAILY},
        stats AS (
            SELECT series,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cc) AS BIGINT) AS s
            FROM daily GROUP BY series
        ),
        dev AS (
            SELECT d.series, d.day_s, st.n,
                   st.n * d.cc - st.s AS ndev
            FROM daily d JOIN stats st USING (series)
        ),
        mad AS (
            SELECT series, CAST(sum(abs(ndev)) AS BIGINT) AS sum_abs_ndev
            FROM dev GROUP BY series
        ),
        pre AS (
            SELECT series, day_s, n,
                   sum(ndev) OVER w AS p
            FROM dev
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        cus AS (
            -- the running extremum must include the EMPTY prefix
            -- (P_0 = 0): S+_t = P_t - min(0, P_1..P_t) is the
            -- textbook recursion's closed form
            SELECT series, day_s, n,
                   p - least(CAST(0 AS BIGINT), min(p) OVER w) AS up_n,
                   greatest(CAST(0 AS BIGINT), max(p) OVER w) - p AS dn_n
            FROM pre
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        )
        SELECT c.series, c.day_s,
               round(c.up_n * 1.0 / c.n / 100.0, 6) AS cusum_pos,
               round(c.dn_n * 1.0 / c.n / 100.0, 6) AS cusum_neg,
               c.up_n * c.n > {_CUSUM_H_MAD} * m.sum_abs_ndev
                   AS alarm_pos,
               c.dn_n * c.n > {_CUSUM_H_MAD} * m.sum_abs_ndev
                   AS alarm_neg
        FROM cus c JOIN mad m USING (series)
    """,
)
def ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the day-grain frame feeds multiple branches below — the eager
    # checkpoint pins ONE events scan (at 100 TB each extra branch
    # would otherwise re-read the fact table; frame size is calendar
    # x series, metadata-sized)
    daily = (
        _daily_ohlcv(spark, sf_dir)
        .select("series", "day_s", "cc")
        .localCheckpoint(eager=True)
    )
    stats = daily.groupBy("series").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cc").alias("s")
    )
    dev = daily.join(F.broadcast(stats), "series").select(
        "series",
        "day_s",
        "n",
        (F.col("n") * F.col("cc") - F.col("s")).alias("ndev"),
    )
    mad = dev.groupBy("series").agg(
        F.sum(F.abs(F.col("ndev"))).alias("sum_abs_ndev")
    )
    w = Window.partitionBy("series").orderBy("day_s")
    pre = dev.withColumn("p", F.sum("ndev").over(w))
    # the running extremum includes the EMPTY prefix (P_0 = 0), so
    # S+_t = P_t - min(0, P_1..P_t) matches the textbook recursion
    cus = pre.select(
        "series",
        "day_s",
        "n",
        (F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(w)))
        .alias("up_n"),
        (F.greatest(F.lit(0).cast("long"), F.max("p").over(w)) - F.col("p"))
        .alias("dn_n"),
    )
    return cus.join(F.broadcast(mad), "series").select(
        "series",
        "day_s",
        F.round(F.col("up_n") / F.col("n") / 100.0, 6).alias("cusum_pos"),
        F.round(F.col("dn_n") / F.col("n") / 100.0, 6).alias("cusum_neg"),
        (F.col("up_n") * F.col("n") > _CUSUM_H_MAD * F.col("sum_abs_ndev"))
        .alias("alarm_pos"),
        (F.col("dn_n") * F.col("n") > _CUSUM_H_MAD * F.col("sum_abs_ndev"))
        .alias("alarm_neg"),
    )


# ---------------------------------------------------------------------------
# B87 ts_obv


@register(
    "ts_obv",
    family="timeseries",
    doc="On-balance volume per series (B87): OBV = running sum of "
    "sign(close_t - close_{t-1}) x daily volume (props.$.k units) — "
    "all-BIGINT (sign on integer cents, integer volume, integer "
    "prefix sum), value-exact at any SF. Also reports the daily "
    "accumulation/distribution direction. One day-grain reduce + "
    "one lag + one prefix sum per series.",
    oracle=f"""
        WITH {_SQL_DAILY},
        dirs AS (
            SELECT series, day_s, vol,
                   CASE WHEN lag(cc) OVER w IS NULL THEN 0
                        WHEN cc > lag(cc) OVER w THEN 1
                        WHEN cc < lag(cc) OVER w THEN -1
                        ELSE 0 END AS direction
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        )
        SELECT series, day_s,
               CAST(direction AS INTEGER) AS direction,
               CAST(vol AS BIGINT) AS volume,
               CAST(sum(direction * vol) OVER (
                   PARTITION BY series ORDER BY day_s) AS BIGINT) AS obv
        FROM dirs
    """,
)
def ts_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("series").orderBy("day_s")
    prev = F.lag("cc").over(w)
    dirs = daily.select(
        "series",
        "day_s",
        "vol",
        F.when(prev.isNull(), 0)
        .when(F.col("cc") > prev, 1)
        .when(F.col("cc") < prev, -1)
        .otherwise(0)
        .cast("int")
        .alias("direction"),
    )
    return dirs.select(
        "series",
        "day_s",
        "direction",
        F.col("vol").alias("volume"),
        F.sum(F.col("direction") * F.col("vol")).over(w).alias("obv"),
    )


# ---------------------------------------------------------------------------
# E22 ann_sq8_topk


@register(
    "ann_sq8_topk",
    family="ann",
    doc="Symmetric int8-quantized inner-product search (E22): corpus "
    "AND query quantize with E7's per-vector scheme (scale = "
    "max|v|/127, floor(x/scale + 0.5), clamp), candidates rank by "
    "(int8_dot x query_scale) x vec_scale — the int8 dot is an "
    "EXACT BIGINT fold (|q.v| <= 127*127*64 ~ 1e6, exact in "
    "doubles), the two scale multiplies are pinned-order — so the "
    "approximate ranking itself is value-exact, not just audited. "
    "Each hit also carries the exact float inner product and an "
    "in_exact_topk flag (membership in the exact MIPS top-20), so "
    "the certified output IS the recall@20 measurement of the 4x-"
    "compressed serving path. One scan + two 20-row ordered takes; "
    "at 100 TB the quantized corpus is the stored table (4x "
    "smaller scan) and the flag join is a 20-row broadcast.",
    oracle="""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        qz AS (
            SELECT qv,
                   list_aggregate(list_transform(qv, x -> abs(x)), 'max')
                       / 127.0 AS qsc
            FROM q
        ),
        qq AS (
            SELECT qv, qsc,
                   list_transform(qv, x -> CAST(greatest(least(
                       floor(x / qsc + 0.5), 127), -127) AS BIGINT)) AS qvec
            FROM qz
        ),
        z AS (
            SELECT vec_id, label, v,
                   list_aggregate(list_transform(v, x -> abs(x)), 'max')
                       / 127.0 AS sc
            FROM e
        ),
        scored AS (
            SELECT vec_id, label,
                   (list_dot_product(
                        CAST(list_transform(v, x -> CAST(greatest(least(
                            floor(x / sc + 0.5), 127), -127) AS BIGINT))
                            AS DOUBLE[]),
                        CAST((SELECT qvec FROM qq) AS DOUBLE[]))
                    * (SELECT qsc FROM qq)) * sc AS approx,
                   list_dot_product(v, (SELECT qv FROM q)) AS exact
            FROM z
        ),
        exact_top AS (
            SELECT vec_id FROM scored
            ORDER BY round(exact, 6) DESC, vec_id LIMIT 20
        )
        SELECT vec_id, label,
               round(approx, 6) AS sq8_dot,
               round(exact, 6) AS exact_dot,
               vec_id IN (SELECT vec_id FROM exact_top) AS in_exact_topk
        FROM scored
        ORDER BY round(approx, 6) DESC, vec_id
        LIMIT 20
    """,
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from timescaledb_event_streamer_spark.operators.ann import dot

    # quantize the query DRIVER-side with the identical IEEE ops the
    # oracle runs in SQL (single-op float arithmetic on identical
    # inputs is bit-stable across engines)
    qvec = [
        float(x)
        for x in load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0][0]
    ]
    qsc = max(abs(x) for x in qvec) / 127.0
    qq = [max(min(math.floor(x / qsc + 0.5), 127), -127) for x in qvec]

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    sc = (
        F.array_max(F.transform("v", lambda x: F.abs(x))) / F.lit(127.0)
    ).alias("sc")
    z = emb.select("vec_id", "label", "v", sc)
    zv = F.transform(
        "v",
        lambda x: F.greatest(
            F.least(F.floor(x / F.col("sc") + F.lit(0.5)), F.lit(127)),
            F.lit(-127),
        ).cast("long"),
    )
    qq_arr = F.array(*[F.lit(float(b)) for b in qq])
    q_arr = F.array(*[F.lit(x) for x in qvec])
    scored = z.select(
        "vec_id",
        "label",
        (
            (dot(zv.cast("array<double>"), qq_arr) * F.lit(qsc)) * F.col("sc")
        ).alias("approx"),
        dot(F.col("v"), q_arr).alias("exact"),
    ).localCheckpoint(eager=True)  # one scan feeds both ordered takes
    exact_top = (
        scored.orderBy(F.round("exact", 6).desc(), "vec_id")
        .limit(20)
        .select("vec_id", F.lit(True).alias("flag"))
    )
    return (
        scored.orderBy(F.round("approx", 6).desc(), "vec_id")
        .limit(20)
        .join(F.broadcast(exact_top), "vec_id", "left")
        .select(
            "vec_id",
            "label",
            F.round("approx", 6).alias("sq8_dot"),
            F.round("exact", 6).alias("exact_dot"),
            F.coalesce("flag", F.lit(False)).alias("in_exact_topk"),
        )
    )


# ---------------------------------------------------------------------------
# F40 text_zipf_fit


_ZIPF_TOP = 100


@register(
    "text_zipf_fit",
    family="text",
    doc="Zipf rank-frequency fit per source (F40): OLS slope and r2 "
    "of ln(freq) on ln(rank) over the top-100 terms (freq desc, "
    "term asc tiebreak — deterministic ranks both engines). A "
    "natural corpus fits slope ~ -1; machine-generated or template "
    "text departs sharply, making this a source-level quality gate "
    "to pair with the doc-level F2/F11 filters. One (source, term) "
    "count shuffle bounded by vocabulary, a 100-row-per-source "
    "window take, then a 6-sum reduce; per-term ln() doubles are "
    "identical both engines, sum reorder noise ~1e-13 vs the 1e-6 "
    "rounding grid (the F13 entropy precedent).",
    oracle=f"""
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        cnt AS (
            SELECT source, w, count(*) AS c
            FROM tok WHERE length(w) > 0 GROUP BY 1, 2
        ),
        ranked AS (
            SELECT source, c,
                   row_number() OVER (
                       PARTITION BY source ORDER BY c DESC, w
                   ) AS r
            FROM cnt
        ),
        pts AS (
            SELECT source, ln(r) AS x, ln(c) AS y
            FROM ranked WHERE r <= {_ZIPF_TOP}
        ),
        sums AS (
            SELECT source, count(*) AS n,
                   sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                   sum(x * x) AS sxx, sum(y * y) AS syy
            FROM pts GROUP BY source
        )
        SELECT source,
               CAST(n AS BIGINT) AS n_terms,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                   AS zipf_slope,
               round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
                     ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                   AS zipf_r2
        FROM sums
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = spread(load(spark, sf_dir, "documents"))
    cnt = (
        docs.select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    r = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("c"), "w")
    )
    pts = (
        cnt.withColumn("r", r)
        .filter(F.col("r") <= _ZIPF_TOP)
        .select(
            "source",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    sums = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov, varx, vary = (
        n * sxy - sx * sy,
        n * sxx - sx * sx,
        n * syy - sy * sy,
    )
    return sums.select(
        "source",
        n.cast("long").alias("n_terms"),
        F.round(cov / varx, 6).alias("zipf_slope"),
        F.round(cov * cov / (varx * vary), 6).alias("zipf_r2"),
    )


# ---------------------------------------------------------------------------
# F41 text_hapax_stats


@register(
    "text_hapax_stats",
    family="text",
    doc="Vocabulary-richness diagnostics per source (F41): token "
    "count N, vocabulary V, hapax (freq 1) and dis (freq 2) "
    "legomena counts, hapax/V, type-token ratio V/N, and Herdan's "
    "C = ln V / ln N — the lexical-diversity gate that flags "
    "template-generated sources (hapax collapse) before they skew "
    "a training mix. All counts exact BIGINTs from one vocabulary-"
    "bounded reduce; the three ratios divide once and round.",
    oracle="""
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        cnt AS (
            SELECT source, w, count(*) AS c
            FROM tok WHERE length(w) > 0 GROUP BY 1, 2
        ),
        per AS (
            SELECT source,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS vocab,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS hapax,
                   CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS dis
            FROM cnt GROUP BY source
        )
        SELECT source, n_tokens, vocab, hapax, dis,
               round(hapax * 1.0 / vocab, 6) AS hapax_ratio,
               round(vocab * 1.0 / n_tokens, 6) AS type_token_ratio,
               round(ln(vocab) / ln(n_tokens), 6) AS herdan_c
        FROM per
    """,
)
def text_hapax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    cnt = (
        docs.select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = cnt.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum((F.col("c") == 1).cast("long")).alias("hapax"),
        F.sum((F.col("c") == 2).cast("long")).alias("dis"),
    )
    return per.select(
        "source",
        "n_tokens",
        "vocab",
        "hapax",
        "dis",
        F.round(F.col("hapax") / F.col("vocab"), 6).alias("hapax_ratio"),
        F.round(F.col("vocab") / F.col("n_tokens"), 6).alias(
            "type_token_ratio"
        ),
        F.round(F.log(F.col("vocab")) / F.log(F.col("n_tokens")), 6).alias(
            "herdan_c"
        ),
    )


# ---------------------------------------------------------------------------
# B88 ts_sax


_SAX_FRAME = 8  # PAA frame length (days)
#: 4-ary SAX breakpoints are {-b, 0, +b} with b = 0.6745 (the
#: standard-normal quartiles); b^2 = 45495025 / 10^8 EXACTLY, which
#: is what lets the breakpoint comparison run in integers.
_SAX_B2_NUM = 45495025
_SAX_B2_DEN = 100_000_000


@register(
    "ts_sax",
    family="timeseries",
    doc="SAX symbolization per series (B88; Lin/Keogh/Lonardi's "
    "Symbolic Aggregate approXimation): z-normalized PAA over "
    "8-day frames of the daily close, quantized to a 4-symbol "
    "alphabet at the standard-normal quartile breakpoints "
    "{-0.6745, 0, 0.6745}. The float trap — engines computing "
    "mean/stddev with different summation orders flip symbols at "
    "the breakpoints — is eliminated by comparing in CROSS-"
    "MULTIPLIED INTEGER form: with integer cents, sign(z) = "
    "sign(A) for A = frame_sum x n - series_sum x frame_len, and "
    "|z| vs b compares A^2 x 10^8 against 45495025 x flen^2 x "
    "(n x sumsq - sum^2) — exact DECIMAL(38)/HUGEINT arithmetic, "
    "never a float boundary (b^2 = 0.6745^2 is exactly "
    "45495025/10^8). Constant series guard to the low-middle "
    "symbol on both engines. Day-grain reduce + per-series frame "
    "reduce; the rendered paa/z are display-only doubles.",
    oracle=f"""
        WITH {_SQL_DAILY},
        seq AS (
            SELECT series, day_s, cc,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
        ),
        stats AS (
            SELECT series,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cc) AS BIGINT) AS s,
                   CAST(sum(cc * cc) AS BIGINT) AS q
            FROM seq GROUP BY series
        ),
        frames AS (
            SELECT series,
                   (rn - 1) // {_SAX_FRAME} AS frame_idx,
                   CAST(min(day_s) AS BIGINT) AS frame_start_day,
                   CAST(count(*) AS BIGINT) AS flen,
                   CAST(sum(cc) AS BIGINT) AS fs
            FROM seq GROUP BY 1, 2
        ),
        j AS (
            SELECT f.series, f.frame_idx, f.frame_start_day, f.flen, f.fs,
                   st.n, st.s,
                   CAST(f.fs AS HUGEINT) * st.n
                       - CAST(st.s AS HUGEINT) * f.flen AS a,
                   CAST(st.n AS HUGEINT) * st.q
                       - CAST(st.s AS HUGEINT) * st.s AS varn
            FROM frames f JOIN stats st USING (series)
        )
        SELECT series, frame_idx, frame_start_day, flen,
               round(fs * 1.0 / flen / 100.0, 6) AS paa,
               CASE
                   WHEN varn = 0 THEN 'b'
                   WHEN a < 0 AND a * a * {_SAX_B2_DEN} >
                       {_SAX_B2_NUM} * CAST(flen AS HUGEINT) * flen * varn
                       THEN 'a'
                   WHEN a < 0 THEN 'b'
                   WHEN a * a * {_SAX_B2_DEN} <=
                       {_SAX_B2_NUM} * CAST(flen AS HUGEINT) * flen * varn
                       THEN 'c'
                   ELSE 'd'
               END AS symbol
        FROM j
    """,
)
def ts_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the day-grain frame feeds multiple branches below — the eager
    # checkpoint pins ONE events scan (at 100 TB each extra branch
    # would otherwise re-read the fact table; frame size is calendar
    # x series, metadata-sized)
    daily = (
        _daily_ohlcv(spark, sf_dir)
        .select("series", "day_s", "cc")
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("series").orderBy("day_s")
    seq = daily.withColumn("rn", F.row_number().over(w))
    stats = seq.groupBy("series").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cc").alias("s"),
        F.sum(F.col("cc") * F.col("cc")).alias("q"),
    )
    frames = seq.groupBy(
        "series", ((F.col("rn") - 1) / _SAX_FRAME).cast("long").alias("frame_idx")
    ).agg(
        F.min("day_s").alias("frame_start_day"),
        F.count(F.lit(1)).alias("flen"),
        F.sum("cc").alias("fs"),
    )
    dec = "decimal(38,0)"
    j = frames.join(F.broadcast(stats), "series").select(
        "series",
        "frame_idx",
        "frame_start_day",
        "flen",
        "fs",
        (
            F.col("fs").cast(dec) * F.col("n")
            - F.col("s").cast(dec) * F.col("flen")
        ).alias("a"),
        (
            F.col("n").cast(dec) * F.col("q")
            - F.col("s").cast(dec) * F.col("s")
        ).alias("varn"),
    )
    lhs = F.col("a") * F.col("a") * F.lit(_SAX_B2_DEN)
    rhs = (
        F.lit(_SAX_B2_NUM)
        * F.col("flen").cast(dec)
        * F.col("flen")
        * F.col("varn")
    )
    return j.select(
        "series",
        "frame_idx",
        "frame_start_day",
        "flen",
        F.round(F.col("fs") / F.col("flen") / 100.0, 6).alias("paa"),
        F.when(F.col("varn") == 0, F.lit("b"))
        .when((F.col("a") < 0) & (lhs > rhs), F.lit("a"))
        .when(F.col("a") < 0, F.lit("b"))
        .when(lhs <= rhs, F.lit("c"))
        .otherwise(F.lit("d"))
        .alias("symbol"),
    )


# ---------------------------------------------------------------------------
# B89 ts_kaufman_er


_KER_N = 10


@register(
    "ts_kaufman_er",
    family="timeseries",
    doc="Kaufman efficiency ratio per series (B89): ER = |close_t - "
    "close_{t-10}| / sum of the 10 daily |changes| — the signal-to-"
    "noise measure behind KAMA, and the regime filter that decides "
    "when trend indicators (B83/B85) are trustworthy. Numerator and "
    "denominator are exact BIGINTs on integer cents (lag + windowed "
    "sum of abs diffs), divided and rounded once; a flat window "
    "(denominator 0) reports NULL. Day-grain per-series windows.",
    oracle=f"""
        WITH {_SQL_DAILY},
        d AS (
            SELECT series, day_s, cc,
                   cc - lag(cc) OVER w AS chg,
                   lag(cc, {_KER_N}) OVER w AS base,
                   row_number() OVER w AS rn
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        n AS (
            SELECT series, day_s, rn, base, cc,
                   sum(abs(chg)) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_KER_N - 1} PRECEDING
                            AND CURRENT ROW) AS noise
            FROM d
        )
        SELECT series, day_s,
               CAST(abs(cc - base) AS BIGINT) AS signal_cents,
               CAST(noise AS BIGINT) AS noise_cents,
               CASE WHEN noise > 0
                    THEN round(abs(cc - base) * 1.0 / noise, 6) END
                   AS efficiency_ratio
        FROM n
        WHERE rn > {_KER_N}
    """,
)
def ts_kaufman_er(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir).select("series", "day_s", "cc")
    w = Window.partitionBy("series").orderBy("day_s")
    d = daily.select(
        "series",
        "day_s",
        "cc",
        (F.col("cc") - F.lag("cc").over(w)).alias("chg"),
        F.lag("cc", _KER_N).over(w).alias("base"),
        F.row_number().over(w).alias("rn"),
    )
    wn = w.rowsBetween(-(_KER_N - 1), Window.currentRow)
    n = d.withColumn("noise", F.sum(F.abs(F.col("chg"))).over(wn))
    sig = F.abs(F.col("cc") - F.col("base"))
    return n.filter(F.col("rn") > _KER_N).select(
        "series",
        "day_s",
        sig.alias("signal_cents"),
        F.col("noise").alias("noise_cents"),
        F.when(F.col("noise") > 0, F.round(sig / F.col("noise"), 6)).alias(
            "efficiency_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# B90 ts_aroon


_AROON_N = 25
#: rn packs into the low decimal digits of the cent price; series
#: length stays far below this at the calendar day grain
_AROON_PACK = 1_000_000


@register(
    "ts_aroon",
    family="timeseries",
    doc="Aroon oscillator per series (B90): days since the 25-day "
    "high/low turned into aroon_up/down = 100 x (N - days_since) / "
    "N. The windowed argmax-with-latest-tie is the subtle part: "
    "both engines compute max(hc x 10^6 + rn) (and min(lc x 10^6 + "
    "(10^6 - rn)) for the low side) — packed integer compares with "
    "a DETERMINISTIC latest-occurrence tie-break, no arg_max tie "
    "ambiguity, no float. Outputs are exact rationals rounded "
    "once; rows emit from day N on. Day-grain per-series windows.",
    oracle=f"""
        WITH {_SQL_DAILY},
        seq AS (
            SELECT series, day_s, hc, lc,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
        ),
        packed AS (
            SELECT series, day_s, rn,
                   max(hc * {_AROON_PACK} + rn) OVER w AS hi_pack,
                   min(lc * {_AROON_PACK} + ({_AROON_PACK} - rn)) OVER w
                       AS lo_pack
            FROM seq
            WINDOW w AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_AROON_N - 1} PRECEDING
                              AND CURRENT ROW)
        )
        SELECT series, day_s,
               CAST(rn - hi_pack % {_AROON_PACK} AS BIGINT)
                   AS days_since_high,
               CAST(rn - ({_AROON_PACK} - lo_pack % {_AROON_PACK})
                   AS BIGINT) AS days_since_low,
               round((({_AROON_N} - (rn - hi_pack % {_AROON_PACK}))
                   * 100.0) / {_AROON_N}, 6) AS aroon_up,
               round((({_AROON_N} - (rn - ({_AROON_PACK}
                   - lo_pack % {_AROON_PACK}))) * 100.0) / {_AROON_N}, 6)
                   AS aroon_down
        FROM packed
        WHERE rn >= {_AROON_N}
    """,
)
def ts_aroon(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir).select("series", "day_s", "hc", "lc")
    w = Window.partitionBy("series").orderBy("day_s")
    seq = daily.withColumn("rn", F.row_number().over(w))
    ww = w.rowsBetween(-(_AROON_N - 1), Window.currentRow)
    packed = seq.select(
        "series",
        "day_s",
        "rn",
        F.max(F.col("hc") * _AROON_PACK + F.col("rn")).over(ww).alias(
            "hi_pack"
        ),
        F.min(
            F.col("lc") * _AROON_PACK + (F.lit(_AROON_PACK) - F.col("rn"))
        )
        .over(ww)
        .alias("lo_pack"),
    )
    hi_rn = F.col("hi_pack") % _AROON_PACK
    lo_rn = F.lit(_AROON_PACK) - F.col("lo_pack") % _AROON_PACK
    return packed.filter(F.col("rn") >= _AROON_N).select(
        "series",
        "day_s",
        (F.col("rn") - hi_rn).alias("days_since_high"),
        (F.col("rn") - lo_rn).alias("days_since_low"),
        F.round(
            (F.lit(_AROON_N) - (F.col("rn") - hi_rn)) * 100.0 / _AROON_N, 6
        ).alias("aroon_up"),
        F.round(
            (F.lit(_AROON_N) - (F.col("rn") - lo_rn)) * 100.0 / _AROON_N, 6
        ).alias("aroon_down"),
    )


# ---------------------------------------------------------------------------
# B91 ts_acf


_ACF_MAX_LAG = 7


@register(
    "ts_acf",
    family="timeseries",
    doc="Autocorrelation function per series, lags 1-7 (B91): acf_k "
    "= sum((x_t - mu)(x_{t+k} - mu)) / sum((x_t - mu)^2) computed "
    "EXACTLY by multiplying through by n — with ndev = n x cents - "
    "series_sum, every product is DECIMAL(38)/HUGEINT integer "
    "arithmetic (the B86/B88 float-free pattern; n^2 cancels in "
    "the ratio), divided and rounded once per lag. One day-grain "
    "reduce, 7 lead columns in one window pass, one per-series "
    "fold, then a 7-row explode — the weekly-seasonality detector "
    "(a lag-7 spike) at calendar-bounded state.",
    oracle=f"""
        WITH {_SQL_DAILY},
        stats AS (
            SELECT series,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cc) AS BIGINT) AS s
            FROM daily GROUP BY series
        ),
        dev AS (
            SELECT d.series, d.day_s,
                   CAST(st.n * d.cc - st.s AS HUGEINT) AS ndev
            FROM daily d JOIN stats st USING (series)
        ),
        led AS (
            SELECT series, ndev,
                   {", ".join(f"lead(ndev, {k}) OVER (PARTITION BY series ORDER BY day_s) AS ndev{k}" for k in range(1, _ACF_MAX_LAG + 1))}
            FROM dev
        ),
        agg AS (
            SELECT series,
                   sum(ndev * ndev) AS den,
                   {", ".join(f"sum(ndev * ndev{k}) AS num{k}" for k in range(1, _ACF_MAX_LAG + 1))}
            FROM led GROUP BY series
        )
        SELECT series, CAST(k AS BIGINT) AS lag,
               round(CASE k
                   {" ".join(f"WHEN {k} THEN num{k}" for k in range(1, _ACF_MAX_LAG + 1))}
               END * 1.0 / den, 6) AS acf
        FROM agg, (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS k)
        WHERE den > 0
    """,
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the day-grain frame feeds multiple branches below — the eager
    # checkpoint pins ONE events scan (at 100 TB each extra branch
    # would otherwise re-read the fact table; frame size is calendar
    # x series, metadata-sized)
    daily = (
        _daily_ohlcv(spark, sf_dir)
        .select("series", "day_s", "cc")
        .localCheckpoint(eager=True)
    )
    stats = daily.groupBy("series").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cc").alias("s")
    )
    dec = "decimal(38,0)"
    dev = daily.join(F.broadcast(stats), "series").select(
        "series",
        "day_s",
        (F.col("n") * F.col("cc") - F.col("s")).cast(dec).alias("ndev"),
    )
    w = Window.partitionBy("series").orderBy("day_s")
    led = dev.select(
        "series",
        "ndev",
        *[
            F.lead("ndev", k).over(w).alias(f"ndev{k}")
            for k in range(1, _ACF_MAX_LAG + 1)
        ],
    )
    agg = led.groupBy("series").agg(
        F.sum(F.col("ndev") * F.col("ndev")).alias("den"),
        *[
            F.sum(F.col("ndev") * F.col(f"ndev{k}")).alias(f"num{k}")
            for k in range(1, _ACF_MAX_LAG + 1)
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("lag"),
                # exact integer sums convert to double BEFORE the
                # division (both < 2^53 at the day grain; DuckDB's
                # `num * 1.0 / den` takes the same double path) —
                # decimal/decimal division would return a decimal
                # dtype the driver's hash distinguishes from float64
                F.round(
                    F.col(f"num{k}").cast("double")
                    / F.col("den").cast("double"),
                    6,
                ).alias("acf"),
            )
            for k in range(1, _ACF_MAX_LAG + 1)
        ]
    )
    return (
        agg.filter(F.col("den") > 0)
        .select("series", F.explode(pairs).alias("p"))
        .select("series", F.col("p.lag").alias("lag"), F.col("p.acf").alias("acf"))
    )


# ---------------------------------------------------------------------------
# F42 text_bigram_lm_score


@register(
    "text_bigram_lm_score",
    family="text",
    doc="Per-document cross-entropy under the corpus's own BIGRAM "
    "model (F42) — the conditional upgrade of F19's unigram proxy: "
    "P(w|prev) = corpus_count(prev, w) / corpus_count(prev as "
    "context), within-document adjacency only, so every document "
    "bigram exists in the model by construction and the statistic "
    "is exact (no smoothing constant to tune). Documents whose "
    "repeated phrases dominate the corpus score LOW bits/bigram — "
    "the template detector that unigram surprise misses. Plan: one "
    "corpus scan -> (doc, prev, w) counts; corpus bigram and "
    "context tables reduce from the same counts (map-side "
    "partials); joins keyed on the bigram/context (AQE handles "
    "stopword skew). Single-token documents drop (no bigrams).",
    oracle="""
        WITH tok AS (
            SELECT doc_id, t, row_number() OVER (
                PARTITION BY doc_id ORDER BY pos) AS rn
            FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS t,
                       generate_subscripts(string_split(text, ' '), 1)
                           AS pos
                FROM documents
            ) WHERE length(t) > 0
        ),
        big AS (
            SELECT a.doc_id, a.t AS prev, b.t AS w
            FROM tok a JOIN tok b
              ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
        ),
        dcnt AS (
            SELECT doc_id, prev, w, count(*) AS c
            FROM big GROUP BY 1, 2, 3
        ),
        bf AS (
            SELECT prev, w, CAST(sum(c) AS BIGINT) AS bf
            FROM dcnt GROUP BY prev, w
        ),
        ctx AS (
            SELECT prev, CAST(sum(bf) AS BIGINT) AS ctxf FROM bf
            GROUP BY prev
        )
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_bigrams,
               round(-sum(c * log2(bf * 1.0 / ctxf)) / sum(c), 6)
                   AS bigram_entropy_bits
        FROM dcnt JOIN bf USING (prev, w) JOIN ctx USING (prev)
        GROUP BY doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: F.length(t) > 0).alias(
            "ts"
        ),
    )
    big = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("prev"), b.alias("w")),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.w").alias("w"))
    dcnt = big.groupBy("doc_id", "prev", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    bf = dcnt.groupBy("prev", "w").agg(F.sum("c").alias("bf"))
    ctx = bf.groupBy("prev").agg(F.sum("bf").alias("ctxf"))
    joined = dcnt.join(bf, ["prev", "w"]).join(ctx, "prev")
    bits = F.col("c") * F.log2(F.col("bf") / F.col("ctxf"))
    return joined.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(-F.sum(bits) / F.sum("c"), 6).alias("bigram_entropy_bits"),
    )


# ---------------------------------------------------------------------------
# B92 ts_matrix_profile


_MP_M = 7  # subsequence length (days)
_MP_EXCL = 4  # trivial-match exclusion zone (m/2, rounded up)
#: nearest-neighbor tie-break packs the neighbor start into the low
#: digits of the squared distance (dist2 <= 7 x (max cents)^2 ~ 1e11
#: at the observed value range; start indices stay far below 10^6)
_MP_PACK = 1_000_000


@register(
    "ts_matrix_profile",
    family="timeseries",
    doc="Matrix profile per series (B92; Yeh/Keogh, ICDM'16): for "
    "every 7-day window of the daily close, the squared Euclidean "
    "distance to its nearest non-trivial neighbor window (exclusion "
    "zone m/2) plus that neighbor's start — low profile values mark "
    "MOTIFS (repeated regimes), the maximum marks the top DISCORD "
    "(anomaly). Distances are exact BIGINT sums of squared cent "
    "differences; the argmin ties break deterministically by "
    "packing the neighbor start into the distance (the B90 packed-"
    "integer compare). The day-grain frame makes the per-series "
    "window count CALENDAR-bounded, so the within-series join is "
    "O(days^2) per key regardless of event volume — the join keys "
    "on series and never crosses series.",
    oracle=f"""
        WITH {_SQL_DAILY},
        seq AS (
            SELECT series, day_s, cc,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn,
                   count(*) OVER (PARTITION BY series) AS n
            FROM daily
        ),
        win AS (
            SELECT series, rn AS t, min(day_s) AS start_day,
                   list(cc ORDER BY day_s) AS arr
            FROM (
                SELECT a.series, a.rn, b.day_s, b.cc
                FROM seq a JOIN seq b
                  ON a.series = b.series
                 AND b.rn BETWEEN a.rn AND a.rn + {_MP_M - 1}
                WHERE a.rn + {_MP_M - 1} <= a.n
            ) GROUP BY series, rn
        ),
        pairs AS (
            SELECT a.series, a.t, a.start_day,
                   min(
                       list_sum(list_transform(range(1, {_MP_M + 1}),
                           i -> (a.arr[i] - b.arr[i])
                                * (a.arr[i] - b.arr[i])))
                       * {_MP_PACK} + b.t
                   ) AS packed
            FROM win a JOIN win b
              ON a.series = b.series
             AND abs(a.t - b.t) >= {_MP_EXCL}
            GROUP BY a.series, a.t, a.start_day
        )
        SELECT series, start_day,
               CAST(packed // {_MP_PACK} AS BIGINT) AS nn_dist2_cents,
               CAST(packed % {_MP_PACK} AS BIGINT) AS nn_start,
               round(sqrt(packed // {_MP_PACK}) / 100.0, 6) AS nn_dist
        FROM pairs
    """,
)
def ts_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir).select("series", "day_s", "cc")
    w = Window.partitionBy("series").orderBy("day_s")
    seq = daily.select(
        "series",
        "day_s",
        "cc",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("series")).alias("n"),
    )
    wf = w.rowsBetween(0, _MP_M - 1)
    win = (
        seq.select(
            "series",
            F.col("rn").alias("t"),
            F.col("day_s").alias("start_day"),
            F.collect_list("cc").over(wf).alias("arr"),
            "n",
        )
        .filter(F.col("t") + (_MP_M - 1) <= F.col("n"))
        .drop("n")
        # both sides of the self-join read this frame — checkpoint
        # pins one events scan (calendar-bounded rows)
        .localCheckpoint(eager=True)
    )
    a = win.alias("a")
    b = win.select(
        F.col("series").alias("series_b"),
        F.col("t").alias("tb"),
        F.col("arr").alias("arr_b"),
    )
    dist2 = F.aggregate(
        F.zip_with("arr", "arr_b", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = (
        a.join(
            b,
            (F.col("series") == F.col("series_b"))
            & (F.abs(F.col("t") - F.col("tb")) >= _MP_EXCL),
        )
        .groupBy("series", "t", "start_day")
        .agg(F.min(dist2 * _MP_PACK + F.col("tb")).alias("packed"))
    )
    d2 = F.floor(F.col("packed") / _MP_PACK).cast("long")
    return pairs.select(
        "series",
        "start_day",
        d2.alias("nn_dist2_cents"),
        F.pmod(F.col("packed"), F.lit(_MP_PACK)).cast("long").alias(
            "nn_start"
        ),
        F.round(F.sqrt(d2) / 100.0, 6).alias("nn_dist"),
    )


# ---------------------------------------------------------------------------
# G10 media_exif_probe


@register(
    "media_exif_probe",
    family="multimodal",
    doc="Decoder-free EXIF probe (G10): one level deeper than the "
    "G5 SOF walk — the APP1 payload is a little TIFF file, so the "
    "probe honors the per-payload byte-order mark (II/MM flips per "
    "row), walks IFD0's entry table, reads orientation inline and "
    "FOLLOWS the XResolution offset to its out-of-line RATIONAL — "
    "the two fields that decide rotate/resize for a 100 TB media "
    "lake, extracted in pure whole-stage codegen with zero Python "
    "per row and zero decode (the APP1 locator runs UNROLLED since "
    "r12: the F.aggregate fold always interpreted, so the same step "
    "expression is applied as staged projections instead, pinned to "
    "the retained fold twin by differential fuzz). "
    "Synthesis varies byte order, an "
    "optional preceding APP0, and all field values per row; the "
    "oracle re-derives every output from the GENERATING columns, "
    "so a parser bug cannot cancel out (the G5 adjudication).",
    oracle="""
        SELECT event_id AS media_id,
               TRUE AS is_jpeg,
               TRUE AS has_exif,
               CASE WHEN user_id % 2 = 0 THEN 'II' ELSE 'MM' END
                   AS byte_order,
               3 AS n_ifd_entries,
               event_id % 8 + 1 AS orientation,
               user_id % 600 + 72 AS xres_num,
               event_id % 2 + 1 AS xres_den,
               round((user_id % 600 + 72) * 1.0 / (event_id % 2 + 1), 6)
                   AS xresolution
        FROM events
    """,
)
def media_exif_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_exif_headers,
        synthesize_exif_headers,
    )

    return parse_exif_headers(
        synthesize_exif_headers(load(spark, sf_dir, "events"))
    )


# ---------------------------------------------------------------------------
# E23 ann_ivf_sq8


@register(
    "ann_ivf_sq8",
    family="ann",
    doc="IVF + SQ8 + exact rerank (E23) — the three-stage serving "
    "configuration real vector stores deploy (FAISS 'IVF,SQ8'): "
    "coarse probe prunes to ~nprobe/|seeds| of the corpus, the int8 "
    "symmetric scan ranks those candidates at 4x-compressed width "
    "(exact BIGINT dot fold x pinned scales — the E22 exactness), "
    "and only the 30-row shortlist pays full-precision rerank. "
    "Seeds are the E11 deterministic corpus points, so EVERY stage "
    "— assignment, probe list, approximate ranking, rerank — is "
    "replayed by the oracle and value-certified; at 100 TB the "
    "assignment is a one-off build and the probe is a partition-"
    "pruned scan of the 4x-smaller quantized table.",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        seeds AS (
            SELECT vec_id AS seed_id, v AS sv FROM e
            WHERE vec_id % 25 = 0 AND vec_id < 2500
        ),
        asg0 AS (
            SELECT e.vec_id, e.v, s.seed_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(e.v, s.sv), 6)
                                DESC, s.seed_id
                   ) AS rn
            FROM e CROSS JOIN seeds s
        ),
        asg AS (SELECT vec_id, v, seed_id FROM asg0 WHERE rn = 1),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
        probes AS (
            SELECT seed_id
            FROM seeds CROSS JOIN q
            ORDER BY round(list_cosine_similarity(sv, qv), 6) DESC, seed_id
            LIMIT 8
        ),
        qz AS (
            SELECT qv,
                   list_aggregate(list_transform(qv, x -> abs(x)), 'max')
                       / 127.0 AS qsc
            FROM q
        ),
        qq AS (
            SELECT qsc,
                   list_transform(qv, x -> CAST(greatest(least(
                       floor(x / qsc + 0.5), 127), -127) AS BIGINT)) AS qvec
            FROM qz
        ),
        cand AS (
            SELECT a.vec_id, a.v,
                   list_aggregate(list_transform(a.v, x -> abs(x)), 'max')
                       / 127.0 AS sc
            FROM asg a JOIN probes USING (seed_id)
            WHERE a.vec_id <> 1
        ),
        sq AS (
            SELECT vec_id, v,
                   (list_dot_product(
                        CAST(list_transform(v, x -> CAST(greatest(least(
                            floor(x / sc + 0.5), 127), -127) AS BIGINT))
                            AS DOUBLE[]),
                        CAST((SELECT qvec FROM qq) AS DOUBLE[]))
                    * (SELECT qsc FROM qq)) * sc AS approx
            FROM cand
        ),
        short AS (
            SELECT vec_id, v, approx FROM sq
            ORDER BY round(approx, 6) DESC, vec_id LIMIT 30
        ),
        rer AS (
            SELECT vec_id,
                   round(approx, 6) AS sq8_dot,
                   round(list_dot_product(v, (SELECT qv FROM q)), 6)
                       AS exact_dot
            FROM short
        )
        SELECT vec_id, sq8_dot, exact_dot,
               CAST(row_number() OVER (ORDER BY exact_dot DESC, vec_id)
                   AS BIGINT) AS rnk
        FROM rer
        ORDER BY rnk LIMIT 10
    """,
)
def ann_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ann import ivf_sq8_topk

    return ivf_sq8_topk(load(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# F43 text_rake_keywords


#: the corpus stopword inventory (queries_llm._STOP_SQL) as a RAKE
#: phrase delimiter — non-capturing so split() behaves identically
#: on Java regex and RE2
_RAKE_DELIM = r"\b(?:the|a|of|and|in|to|is)\b"
_RAKE_TOP = 3


@register(
    "text_rake_keywords",
    family="text",
    doc="RAKE keyword extraction per document (F43; Rose et al. "
    "2010): candidate phrases are maximal stopword-free runs "
    "(REGEX-delimited split — in-row, codegen, no gaps-and-islands "
    "shuffle), word scores are deg/freq over the document's own "
    "phrase set (exact integer counts), phrase score sums its "
    "words' scores, top-3 phrases per doc with a rounded-score + "
    "phrase tie-break. The keyword/topic signal for corpus "
    "curation that pairs with the F24 tf-idf view. Shuffles key "
    "on (doc, word) and (doc, phrase) only.",
    oracle=f"""
        WITH phr0 AS (
            SELECT doc_id,
                   trim(regexp_replace(p, ' +', ' ', 'g')) AS phrase
            FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(text,
                           '{_RAKE_DELIM}')) AS p
                FROM documents
            )
        ),
        phr AS (
            SELECT doc_id, phrase FROM phr0 WHERE length(phrase) > 0
        ),
        pw AS (
            SELECT doc_id, phrase,
                   unnest(string_split(phrase, ' ')) AS w,
                   len(string_split(phrase, ' ')) AS plen
            FROM phr
        ),
        ws AS (
            SELECT doc_id, w,
                   CAST(count(*) AS BIGINT) AS freq,
                   CAST(sum(plen) AS BIGINT) AS deg
            FROM pw GROUP BY doc_id, w
        ),
        ps AS (
            SELECT p.doc_id, p.phrase,
                   round(sum(s.deg * 1.0 / s.freq), 6) AS score
            FROM pw p JOIN ws s USING (doc_id, w)
            GROUP BY p.doc_id, p.phrase
        ),
        ranked AS (
            SELECT doc_id, phrase, score,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score DESC, phrase
                   ) AS rnk
            FROM ps
        )
        SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, phrase, score
        FROM ranked WHERE rnk <= {_RAKE_TOP}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    phr = (
        docs.select(
            "doc_id",
            F.explode(F.split("text", _RAKE_DELIM)).alias("p"),
        )
        .select(
            "doc_id",
            F.trim(F.regexp_replace("p", " +", " ")).alias("phrase"),
        )
        .filter(F.length("phrase") > 0)
    )
    pw = phr.select(
        "doc_id",
        "phrase",
        F.size(F.split("phrase", " ")).cast("long").alias("plen"),
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    ws = pw.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    ps = (
        pw.join(ws, ["doc_id", "w"])
        .groupBy("doc_id", "phrase")
        .agg(F.round(F.sum(F.col("deg") / F.col("freq")), 6).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "phrase")
    return (
        ps.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _RAKE_TOP)
        .select("doc_id", "rnk", "phrase", "score")
    )


# ---------------------------------------------------------------------------
# B93 ts_haar_energy


@register(
    "ts_haar_energy",
    family="timeseries",
    doc="3-level Haar wavelet energy decomposition per 8-day frame "
    "(B93): the multi-resolution regime signature — e1 (day-to-day "
    "detail), e2 (2-day swings), e3 (half-frame trend) and the "
    "approximation sum s3 — computed entirely in exact BIGINT cent "
    "arithmetic by pivoting the frame's 8 positions into columns "
    "with ONE day-grain reduce (positions are unique per frame, so "
    "max(CASE) extracts losslessly; no per-level shuffle chain). "
    "Every row also certifies Parseval for the unnormalized Haar "
    "basis — 4 x e1 + 2 x e2 + e3 + s3^2 == 8 x sum(x^2) — as an "
    "INTEGER equality both engines must agree on, so the transform "
    "itself is value-checked, not just its rendering. Partial "
    "trailing frames are dropped.",
    oracle=f"""
        WITH {_SQL_DAILY},
        seq AS (
            SELECT series, day_s, cc,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) - 1 AS idx
            FROM daily
        ),
        piv AS (
            SELECT series, idx // 8 AS frame_idx,
                   CAST(min(day_s) AS BIGINT) AS frame_start_day,
                   count(*) AS flen,
                   CAST(sum(cc * cc) AS BIGINT) AS sumsq,
                   {", ".join(f"CAST(max(CASE WHEN idx % 8 = {i} THEN cc END) AS BIGINT) AS x{i}" for i in range(8))}
            FROM seq GROUP BY 1, 2
        ),
        lev AS (
            SELECT series, frame_idx, frame_start_day, sumsq,
                   (x0-x1)*(x0-x1) + (x2-x3)*(x2-x3)
                       + (x4-x5)*(x4-x5) + (x6-x7)*(x6-x7) AS e1,
                   ((x0+x1)-(x2+x3))*((x0+x1)-(x2+x3))
                       + ((x4+x5)-(x6+x7))*((x4+x5)-(x6+x7)) AS e2,
                   ((x0+x1+x2+x3)-(x4+x5+x6+x7))
                       * ((x0+x1+x2+x3)-(x4+x5+x6+x7)) AS e3,
                   x0+x1+x2+x3+x4+x5+x6+x7 AS s3
            FROM piv WHERE flen = 8
        )
        SELECT series, CAST(frame_idx AS BIGINT) AS frame_idx,
               frame_start_day,
               round(s3 / 8.0 / 100.0, 6) AS approx_mean,
               CAST(e1 AS BIGINT) AS e1_cents2,
               CAST(e2 AS BIGINT) AS e2_cents2,
               CAST(e3 AS BIGINT) AS e3_cents2,
               4 * e1 + 2 * e2 + e3 + s3 * s3 = 8 * sumsq
                   AS parseval_ok
        FROM lev
    """,
)
def ts_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir).select("series", "day_s", "cc")
    w = Window.partitionBy("series").orderBy("day_s")
    seq = daily.withColumn("idx", F.row_number().over(w) - 1)
    piv = (
        seq.groupBy(
            "series", (F.col("idx") / 8).cast("long").alias("frame_idx")
        )
        .agg(
            F.min("day_s").alias("frame_start_day"),
            F.count(F.lit(1)).alias("flen"),
            F.sum(F.col("cc") * F.col("cc")).alias("sumsq"),
            *[
                F.max(
                    F.when(F.pmod(F.col("idx"), F.lit(8)) == i, F.col("cc"))
                ).alias(f"x{i}")
                for i in range(8)
            ],
        )
        .filter(F.col("flen") == 8)
    )
    x = [F.col(f"x{i}") for i in range(8)]
    e1 = sum((x[2 * j] - x[2 * j + 1]) * (x[2 * j] - x[2 * j + 1]) for j in range(4))
    s1 = [x[2 * j] + x[2 * j + 1] for j in range(4)]
    e2 = sum((s1[2 * j] - s1[2 * j + 1]) * (s1[2 * j] - s1[2 * j + 1]) for j in range(2))
    s2 = [s1[2 * j] + s1[2 * j + 1] for j in range(2)]
    e3 = (s2[0] - s2[1]) * (s2[0] - s2[1])
    s3 = s2[0] + s2[1]
    return piv.select(
        "series",
        "frame_idx",
        "frame_start_day",
        F.round(s3 / 8.0 / 100.0, 6).alias("approx_mean"),
        e1.alias("e1_cents2"),
        e2.alias("e2_cents2"),
        e3.alias("e3_cents2"),
        (4 * e1 + 2 * e2 + e3 + s3 * s3 == 8 * F.col("sumsq")).alias(
            "parseval_ok"
        ),
    )


# ---------------------------------------------------------------------------
# B94 ts_theil_sen / B95 ts_mann_kendall


@register(
    "ts_theil_sen",
    family="timeseries",
    doc="Theil-Sen robust trend per series (B94): the median of all "
    "pairwise slopes (close_j - close_i)/(day_j - day_i) — the "
    "outlier-resistant alternative to the B67 OLS slope. The "
    "day-grain frame keeps the pair set CALENDAR-bounded "
    "(O(days^2) per series key regardless of event volume). Each "
    "slope is ONE division of exact integers (identical IEEE "
    "result both engines) and the median picks by (slope, i, j) "
    "row_number — a fully deterministic selection; even pair "
    "counts average the two middle slopes in pinned order. Slope "
    "units: cents per day, rendered /100.",
    oracle=f"""
        WITH {_SQL_DAILY},
        seq AS (
            SELECT series, day_s, cc,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
        ),
        slopes AS (
            SELECT a.series,
                   (b.cc - a.cc) * 1.0 / ((b.day_s - a.day_s) / 86400.0)
                       AS slope,
                   a.rn AS i, b.rn AS j
            FROM seq a JOIN seq b
              ON a.series = b.series AND b.rn > a.rn
        ),
        ranked AS (
            SELECT series, slope,
                   row_number() OVER (
                       PARTITION BY series ORDER BY slope, i, j) AS r,
                   count(*) OVER (PARTITION BY series) AS n
            FROM slopes
        )
        SELECT series,
               CAST(max(n) AS BIGINT) AS n_pairs,
               round(avg(slope) / 100.0, 6) AS theil_sen_slope
        FROM ranked
        WHERE r * 2 IN (n, n + 1, n + 2)
        GROUP BY series
    """,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the day-grain frame feeds multiple branches below — the eager
    # checkpoint pins ONE events scan (at 100 TB each extra branch
    # would otherwise re-read the fact table; frame size is calendar
    # x series, metadata-sized)
    daily = _daily_ohlcv(spark, sf_dir).select("series", "day_s", "cc")
    w = Window.partitionBy("series").orderBy("day_s")
    seq = daily.withColumn("rn", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    a = seq.select(
        "series",
        F.col("day_s").alias("da"),
        F.col("cc").alias("ca"),
        F.col("rn").alias("i"),
    )
    b = seq.select(
        F.col("series").alias("series_b"),
        F.col("day_s").alias("db"),
        F.col("cc").alias("cb"),
        F.col("rn").alias("j"),
    )
    slopes = a.join(
        b, (F.col("series") == F.col("series_b")) & (F.col("j") > F.col("i"))
    ).select(
        "series",
        (
            (F.col("cb") - F.col("ca"))
            / ((F.col("db") - F.col("da")) / 86400.0)
        ).alias("slope"),
        "i",
        "j",
    )
    ws = Window.partitionBy("series").orderBy("slope", "i", "j")
    ranked = slopes.select(
        "series",
        "slope",
        F.row_number().over(ws).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("series")).alias("n"),
    )
    mid = ranked.filter(
        (F.col("r") * 2).isin(F.col("n"), F.col("n") + 1, F.col("n") + 2)
    )
    return mid.groupBy("series").agg(
        F.max("n").alias("n_pairs"),
        F.round(F.avg("slope") / 100.0, 6).alias("theil_sen_slope"),
    )


@register(
    "ts_mann_kendall",
    family="timeseries",
    doc="Mann-Kendall trend test per series (B95, the Theil-Sen "
    "companion): S = sum over i<j of sign(close_j - close_i) and "
    "the tie-corrected variance Var(S) = (n(n-1)(2n+5) - sum "
    "t(t-1)(2t+5)) / 18 — S, both variance terms and the tie "
    "groups are EXACT BIGINTs (sign on integer cents; tie counts "
    "from a value-grain reduce), so the monotone-trend verdict "
    "can never flip on float noise; only the final z renders as a "
    "pinned-order double (continuity-corrected, sqrt of an exact "
    "rational). Calendar-bounded pair join, value-grain tie "
    "reduce.",
    oracle=f"""
        WITH {_SQL_DAILY},
        s AS (
            SELECT a.series,
                   CAST(sum(CASE WHEN b.cc > a.cc THEN 1
                                 WHEN b.cc < a.cc THEN -1
                                 ELSE 0 END) AS BIGINT) AS s_stat
            FROM daily a JOIN daily b
              ON a.series = b.series AND b.day_s > a.day_s
            GROUP BY a.series
        ),
        n AS (
            SELECT series, CAST(count(*) AS BIGINT) AS n
            FROM daily GROUP BY series
        ),
        ties AS (
            SELECT series,
                   CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                       AS BIGINT) AS tie_term
            FROM (
                SELECT series, cc, count(*) AS t
                FROM daily GROUP BY series, cc
                HAVING count(*) > 1
            ) GROUP BY series
        )
        SELECT s.series, s.s_stat, n.n,
               CAST(n.n * (n.n - 1) * (2 * n.n + 5)
                   - coalesce(t.tie_term, 0) AS BIGINT) AS var18,
               round(CASE
                   WHEN s.s_stat > 0 THEN (s.s_stat - 1) /
                       sqrt((n.n * (n.n - 1) * (2 * n.n + 5)
                             - coalesce(t.tie_term, 0)) / 18.0)
                   WHEN s.s_stat < 0 THEN (s.s_stat + 1) /
                       sqrt((n.n * (n.n - 1) * (2 * n.n + 5)
                             - coalesce(t.tie_term, 0)) / 18.0)
                   ELSE 0.0 END, 6) AS z_score
        FROM s JOIN n USING (series)
        LEFT JOIN ties t USING (series)
    """,
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the day-grain frame feeds multiple branches below — the eager
    # checkpoint pins ONE events scan (at 100 TB each extra branch
    # would otherwise re-read the fact table; frame size is calendar
    # x series, metadata-sized)
    daily = (
        _daily_ohlcv(spark, sf_dir)
        .select("series", "day_s", "cc")
        .localCheckpoint(eager=True)
    )
    a = daily.select(
        "series", F.col("day_s").alias("da"), F.col("cc").alias("ca")
    )
    b = daily.select(
        F.col("series").alias("series_b"),
        F.col("day_s").alias("db"),
        F.col("cc").alias("cb"),
    )
    s = (
        a.join(
            b,
            (F.col("series") == F.col("series_b"))
            & (F.col("db") > F.col("da")),
        )
        .groupBy("series")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    n = daily.groupBy("series").agg(F.count(F.lit(1)).alias("n"))
    t = F.col("t")
    ties = (
        daily.groupBy("series", "cc")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(t > 1)
        .groupBy("series")
        .agg(F.sum(t * (t - 1) * (2 * t + 5)).alias("tie_term"))
    )
    j = (
        s.join(F.broadcast(n), "series")
        .join(F.broadcast(ties), "series", "left")
        .withColumn("tie_term", F.coalesce("tie_term", F.lit(0)))
    )
    nn = F.col("n")
    var18 = nn * (nn - 1) * (2 * nn + 5) - F.col("tie_term")
    sd = F.sqrt(var18 / 18.0)
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / sd)
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "series",
        "s_stat",
        "n",
        var18.cast("long").alias("var18"),
        F.round(z, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# F44 text_readability


@register(
    "text_readability",
    family="text",
    doc="Readability scores per document (F44): Flesch reading ease "
    "and Flesch-Kincaid grade from three regex-countable exact "
    "integers — sentences (maximal [.!?]+ runs), words (whitespace "
    "tokens) and syllables (vowel-group runs [aeiouy]+, the "
    "standard dictionary-free approximation) — the classic "
    "quality/complexity gate for corpus curation (too-low grade = "
    "fragment soup, too-high = OCR noise). One codegen projection, "
    "no shuffle beyond the scan; counts are integers on both "
    "engines (same RE2/Java-compatible patterns), ratios divide "
    "and round once. Documents without a sentence terminator count "
    "as one sentence.",
    oracle="""
        WITH c AS (
            SELECT doc_id,
                   greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                       AS n_sentences,
                   len(regexp_extract_all(text, '[^ ]+')) AS n_words,
                   greatest(len(regexp_extract_all(lower(text),
                       '[aeiouy]+')), 1) AS n_syllables
            FROM documents
        )
        SELECT doc_id,
               CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_syllables AS BIGINT) AS n_syllables,
               round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                     - 84.6 * (n_syllables * 1.0 / n_words), 6)
                   AS flesch_ease,
               round(0.39 * (n_words * 1.0 / n_sentences)
                     + 11.8 * (n_syllables * 1.0 / n_words) - 15.59, 6)
                   AS fk_grade
        FROM c
        WHERE n_words > 0
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    n_sent = F.greatest(
        F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    ).cast("long")
    n_words = F.size(F.expr(r"regexp_extract_all(text, '[^ ]+', 0)")).cast(
        "long"
    )
    n_syll = F.greatest(
        F.size(F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")),
        F.lit(1),
    ).cast("long")
    c = docs.select(
        "doc_id",
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words") / F.col("n_sentences")
    spw = F.col("n_syllables") / F.col("n_words")
    return c.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_syllables",
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 6).alias("flesch_ease"),
        F.round(0.39 * wps + 11.8 * spw - 15.59, 6).alias("fk_grade"),
    )


# ---------------------------------------------------------------------------
# B96 ts_hurst_rs


_HURST_KS = (8, 16)


def _sql_rs(k: int) -> str:
    """R/S at block size k over the `seq` CTE (series, day_s, cc,
    rn): non-overlapping full blocks; range of the k-scaled
    mean-adjusted prefix sums is exact integer, one sqrt + one
    division per block."""
    return f"""
            SELECT series, {k} AS k,
                   avg(rs) AS rs
            FROM (
                SELECT series, blk,
                       (max(zs) - min(zs)) * 1.0
                           / sqrt({k} * max(qb) - max(sb) * max(sb)) AS rs
                FROM (
                    SELECT s.series, s.blk, s.t,
                           {k} * sum(s.cc) OVER (
                               PARTITION BY s.series, s.blk ORDER BY s.t
                           ) - s.t * st.sb AS zs,
                           st.sb, st.qb
                    FROM (
                        SELECT series, cc, (rn - 1) // {k} AS blk,
                               (rn - 1) % {k} + 1 AS t,
                               count(*) OVER (
                                   PARTITION BY series, (rn - 1) // {k}
                               ) AS bn
                        FROM seq
                    ) s JOIN (
                        SELECT series, (rn - 1) // {k} AS blk,
                               CAST(sum(cc) AS BIGINT) AS sb,
                               CAST(sum(cc * cc) AS BIGINT) AS qb
                        FROM seq GROUP BY 1, 2
                    ) st USING (series, blk)
                    WHERE s.bn = {k}
                )
                GROUP BY series, blk
                HAVING {k} * max(qb) - max(sb) * max(sb) > 0
            )
            GROUP BY series
    """


@register(
    "ts_hurst_rs",
    family="timeseries",
    doc="Hurst exponent by rescaled-range analysis per series (B96): "
    "R/S over non-overlapping blocks of 8 and 16 days, H = "
    "log2(RS16/RS8). The range numerator is EXACT — k-scaled "
    "mean-adjusted prefix sums (k x cumsum - t x block_sum, the "
    "B86 integer-prefix trick) make max-min a BIGINT before the "
    "single sqrt/division per block — so the long-memory verdict "
    "(H>0.5 trending, H<0.5 mean-reverting) rides on integer "
    "ranges, not float accumulation. Day-grain frame, block-grain "
    "windows, calendar-bounded state.",
    oracle=f"""
        WITH {_SQL_DAILY},
        seq AS (
            SELECT series, day_s, cc,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
        ),
        rs8 AS ({_sql_rs(8)}),
        rs16 AS ({_sql_rs(16)})
        SELECT a.series,
               round(a.rs, 6) AS rs8,
               round(b.rs, 6) AS rs16,
               round(log2(b.rs / a.rs), 6) AS hurst
        FROM rs8 a JOIN rs16 b USING (series)
    """,
)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _daily_ohlcv(spark, sf_dir)
        .select("series", "day_s", "cc")
        .localCheckpoint(eager=True)  # both block sizes read this frame
    )
    w = Window.partitionBy("series").orderBy("day_s")
    seq = daily.withColumn("rn", F.row_number().over(w))

    def rs_at(k: int) -> DataFrame:
        blk = ((F.col("rn") - 1) / k).cast("long").alias("blk")
        t = (F.pmod(F.col("rn") - 1, F.lit(k)) + 1).alias("t")
        s = seq.select("series", "cc", blk, t)
        stats = s.groupBy("series", "blk").agg(
            F.sum("cc").alias("sb"),
            F.sum(F.col("cc") * F.col("cc")).alias("qb"),
            F.count(F.lit(1)).alias("bn"),
        )
        wz = Window.partitionBy("series", "blk").orderBy("t")
        zs = (
            s.join(F.broadcast(stats.filter(F.col("bn") == k)), ["series", "blk"])
            .withColumn(
                "zs",
                F.lit(k) * F.sum("cc").over(wz) - F.col("t") * F.col("sb"),
            )
        )
        per_blk = (
            zs.groupBy("series", "blk")
            .agg(
                (F.max("zs") - F.min("zs")).alias("rng"),
                F.max("qb").alias("qb"),
                F.max("sb").alias("sb"),
            )
            .filter(
                F.lit(k) * F.col("qb") - F.col("sb") * F.col("sb") > 0
            )
            .select(
                "series",
                (
                    F.col("rng")
                    / F.sqrt(
                        F.lit(k) * F.col("qb") - F.col("sb") * F.col("sb")
                    )
                ).alias("rs"),
            )
        )
        return per_blk.groupBy("series").agg(F.avg("rs").alias(f"rs{k}"))

    a, b = rs_at(8), rs_at(16)
    return a.join(b, "series").select(
        "series",
        F.round("rs8", 6).alias("rs8"),
        F.round("rs16", 6).alias("rs16"),
        F.round(F.log2(F.col("rs16") / F.col("rs8")), 6).alias("hurst"),
    )


# ---------------------------------------------------------------------------
# D23 dedup_rate_report


@register(
    "dedup_rate_report",
    family="dedup",
    doc="Per-source deduplication ops report (D23) — the dashboard "
    "every production dedup run emits: document counts, exact-"
    "duplicate removals (non-canonical members of identical-text "
    "groups, canonical = min doc_id), near-duplicate flags "
    "(distinct docs in the D12 md5-MinHash LSH pair set at "
    "jaccard >= 0.5 that survive exact dedup), and both rates. "
    "Reuses the value-exact D12 signature chain verbatim, so the "
    "whole report — including which docs the LSH banding pairs — "
    "is oracle-certified; exact groups key on md5(text), one "
    "corpus scan each side.",
    oracle=None,  # set below: wraps the D12 oracle as a CTE
)
def dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.dedup import (
        _MERSENNE,
        minhash_lsh_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    md5_base = lambda s: (  # noqa: E731
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % _MERSENNE
    )
    pairs = minhash_lsh_pairs(
        docs.filter(F.size(F.split(F.col("text"), " ")) >= 5),
        threshold=0.5,
        base_hash=md5_base,
    )
    near = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("near_flag", F.lit(True))
    )
    w = Window.partitionBy(F.md5("text"))
    exd = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_exact_dup"),
    )
    per = (
        exd.join(near, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("is_exact_dup").cast("long")).alias(
                "exact_dup_docs"
            ),
            F.sum(
                (
                    (~F.col("is_exact_dup"))
                    & F.col("near_flag").isNotNull()
                ).cast("long")
            ).alias("near_dup_docs"),
        )
    )
    return per.select(
        "source",
        "n_docs",
        "exact_dup_docs",
        "near_dup_docs",
        F.round(F.col("exact_dup_docs") / F.col("n_docs"), 6).alias(
            "exact_dup_rate"
        ),
        F.round(F.col("near_dup_docs") / F.col("n_docs"), 6).alias(
            "near_dup_rate"
        ),
    )


def _dedup_rate_oracle() -> str:
    from timescaledb_event_streamer_spark.plans.queries_llm import (
        _minhash_md5_oracle,
    )

    return f"""
        WITH pairs AS ({_minhash_md5_oracle()}),
        near AS (
            SELECT DISTINCT doc_id FROM (
                SELECT doc_a AS doc_id FROM pairs
                UNION ALL SELECT doc_b FROM pairs
            )
        ),
        exd AS (
            SELECT doc_id, source,
                   doc_id <> min(doc_id) OVER (PARTITION BY md5(text))
                       AS is_exact_dup
            FROM documents
        ),
        per AS (
            SELECT e.source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN e.is_exact_dup THEN 1 ELSE 0 END)
                       AS BIGINT) AS exact_dup_docs,
                   CAST(sum(CASE WHEN NOT e.is_exact_dup
                                  AND n.doc_id IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS near_dup_docs
            FROM exd e LEFT JOIN near n USING (doc_id)
            GROUP BY e.source
        )
        SELECT source, n_docs, exact_dup_docs, near_dup_docs,
               round(exact_dup_docs * 1.0 / n_docs, 6) AS exact_dup_rate,
               round(near_dup_docs * 1.0 / n_docs, 6) AS near_dup_rate
        FROM per
    """


# late-bind the oracle (it needs the D12 helper imported above)
from timescaledb_event_streamer_spark.plans.registry import REGISTRY as _REG  # noqa: E402
import dataclasses as _dc  # noqa: E402

_REG["dedup_rate_report"] = _dc.replace(
    _REG["dedup_rate_report"], oracle=_dedup_rate_oracle()
)


# ---------------------------------------------------------------------------
# F45 corpus_curriculum_order


_CURRICULUM_PHASES = 4


@register(
    "corpus_curriculum_order",
    family="text",
    doc="Curriculum phase plan (F45): documents ordered by the F44 "
    "Flesch-Kincaid difficulty proxy (doc_id tie-break — a total "
    "deterministic order) and cut into 4 ntile phases, reported as "
    "the phase table a curriculum-training run consumes: document "
    "and whitespace-token counts, grade boundaries, token share. "
    "ntile over an explicit total order is engine-identical "
    "(remainder rows go to leading phases on both), and is computed "
    "DISTRIBUTED: two-pass range-partitioned rank (operators/"
    "ranking.py) + the closed-form ntile rule from the rank and a "
    "1-row broadcast total (first N%%n phases take ceil(N/n) rows) "
    "— never a single-partition window over doc-grain rows.",
    oracle=f"""
        WITH c AS (
            SELECT doc_id,
                   greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                       AS ns,
                   len(regexp_extract_all(text, '[^ ]+')) AS nw,
                   greatest(len(regexp_extract_all(lower(text),
                       '[aeiouy]+')), 1) AS nsy
            FROM documents
        ),
        g AS (
            SELECT doc_id, nw,
                   round(0.39 * (nw * 1.0 / ns)
                         + 11.8 * (nsy * 1.0 / nw) - 15.59, 6) AS grade
            FROM c WHERE nw > 0
        ),
        ph AS (
            SELECT doc_id, nw, grade,
                   ntile({_CURRICULUM_PHASES}) OVER (
                       ORDER BY grade, doc_id) AS phase
            FROM g
        ),
        tot AS (SELECT CAST(sum(nw) AS BIGINT) AS t FROM ph)
        SELECT CAST(phase AS BIGINT) AS phase,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nw) AS BIGINT) AS n_tokens,
               round(min(grade), 6) AS grade_min,
               round(max(grade), 6) AS grade_max,
               round(sum(nw) * 1.0 / (SELECT t FROM tot), 6)
                   AS token_share
        FROM ph
        GROUP BY phase
    """,
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    ns = F.greatest(
        F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    )
    nw = F.size(F.expr(r"regexp_extract_all(text, '[^ ]+', 0)")).cast("long")
    nsy = F.greatest(
        F.size(F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")),
        F.lit(1),
    )
    g = docs.select(
        "doc_id",
        nw.alias("nw"),
        F.round(
            0.39 * (nw / ns) + 11.8 * (nsy / nw) - 15.59, 6
        ).alias("grade"),
    ).filter(F.col("nw") > 0)
    # distributed ntile: global rank via the two-pass range-
    # partitioned row_number, then the closed-form SQL ntile rule —
    # with N rows and n phases, the first N%n phases take
    # ceil(N/n) rows and the rest take floor(N/n)
    from timescaledb_event_streamer_spark.operators.ranking import (
        global_row_number,
    )

    ranked = global_row_number(
        g,
        [F.col("grade").asc(), F.col("doc_id").asc()],
        col_name="rk0",
        zero_based=True,
    )
    tot = ranked.agg(
        F.sum("nw").alias("t"), F.count(F.lit(1)).alias("n_rows")
    )
    n = F.lit(_CURRICULUM_PHASES).cast("long")
    small = (F.col("n_rows") / n).cast("long")
    rem = F.col("n_rows") % n
    big = small + 1
    cut = rem * big  # first `rem` phases hold `big` rows each
    ph = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "phase",
        F.when(F.col("rk0") < cut, (F.col("rk0") / big).cast("long") + 1)
        .otherwise(
            rem
            + ((F.col("rk0") - cut) / F.greatest(small, F.lit(1))).cast(
                "long"
            )
            + 1
        )
        .cast("long"),
    )
    per = ph.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nw").alias("n_tokens"),
        F.round(F.min("grade"), 6).alias("grade_min"),
        F.round(F.max("grade"), 6).alias("grade_max"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "phase",
        "n_docs",
        "n_tokens",
        "grade_min",
        "grade_max",
        F.round(F.col("n_tokens") / F.col("t"), 6).alias("token_share"),
    )
