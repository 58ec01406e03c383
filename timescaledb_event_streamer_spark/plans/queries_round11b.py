"""Round-11 registered queries, continued (second file).

Continues the SURVEY.md §2 build-out — the B125+ indicator family,
E31 binary-sketch ANN, F56 Heaps'-law fit and G22 Ogg probe.
Reference attributions sit on each query's docstring; oracles follow
the rules in plans/queries_olap.py (aliases, HALF_UP rounding,
BIGINT casts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.caching import scoped_persist
from timescaledb_event_streamer_spark.plans.queries_round8b import (
    _SQL_DAILY,
    _daily_ohlcv,
)
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load, spread


def _ewma_fold(arr_col, span: int):
    """Weight-normalized bounded-window EWMA (pandas ewm adjust=True)
    as the B83/B120 two-arg fold: weights decay^(len - i) with
    DuckDB's 1-based list index i; Spark builds i = 1..len explicitly
    so both engines evaluate the identical expression tree over the
    identical frame-ordered list."""
    decay = 1.0 - 2.0 / (span + 1)
    n = F.size(arr_col)
    w = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.pow(F.lit(decay), (n - i).cast("double")),
    )
    num = F.aggregate(
        F.zip_with(arr_col.cast("array<double>"), w, lambda v, x: v * x),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    den = F.aggregate(w, F.lit(0.0), lambda acc, v: acc + v)
    return num / den


def _sql_ewma_fold(arr: str, span: int) -> str:
    """The DuckDB spelling of _ewma_fold over a list column."""
    decay = f"(1.0 - 2.0/{span + 1}.0)"
    return (
        f"(list_sum(list_transform({arr}, (v, i) -> v * pow({decay}, "
        f"len({arr}) - i))) / list_sum(list_transform({arr}, "
        f"(v, i) -> pow({decay}, len({arr}) - i))))"
    )


# ---------------------------------------------------------------------------
# B125 ts_ultimate_oscillator — Larry Williams' Ultimate Oscillator

#: classic periods are 7/14/28; the 30-calendar-day certification SF
#: can't fill a 28-window after the TR seed row, so the documented
#: adaptation is 5/10/20 (same 1:2:4 geometry, B116 precedent)
_UO_P1, _UO_P2, _UO_P3 = 5, 10, 20


@register(
    "ts_ultimate_oscillator",
    family="timeseries",
    doc="Ultimate Oscillator (B125, Larry Williams' public 1976 "
    "formulation, 5/10/20 certification-SF adaptation of 7/14/28): "
    "buying pressure BP = close - min(low, prev_close) and true "
    "range TR = max(high, prev_close) - min(low, prev_close) are "
    "exact integer cents; the three window sums are BIGINTs; "
    "UO = 100 * (4*BP5/TR5 + 2*BP10/TR10 + BP20/TR20) / 7 does "
    "three divisions on identical exact-integer arguments, so both "
    "engines evaluate the same doubles. Flat windows (any TR sum "
    "zero) yield NULL. Day-grain per-series windows; rows once the "
    "longest window is full.",
    oracle=f"""
        WITH {_SQL_DAILY},
        tr AS (
            SELECT series, day_s,
                   cc - least(lc, lag(cc) OVER w) AS bp,
                   greatest(hc, lag(cc) OVER w)
                       - least(lc, lag(cc) OVER w) AS tr_c,
                   row_number() OVER w AS rn
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        s AS (
            SELECT series, day_s, rn,
                   CAST(sum(bp) OVER v1 AS BIGINT) AS bp1,
                   CAST(sum(tr_c) OVER v1 AS BIGINT) AS tr1,
                   CAST(sum(bp) OVER v2 AS BIGINT) AS bp2,
                   CAST(sum(tr_c) OVER v2 AS BIGINT) AS tr2,
                   CAST(sum(bp) OVER v3 AS BIGINT) AS bp3,
                   CAST(sum(tr_c) OVER v3 AS BIGINT) AS tr3
            FROM tr WHERE rn >= 2
            WINDOW v1 AS (PARTITION BY series ORDER BY day_s
                          ROWS BETWEEN {_UO_P1 - 1} PRECEDING
                               AND CURRENT ROW),
                   v2 AS (PARTITION BY series ORDER BY day_s
                          ROWS BETWEEN {_UO_P2 - 1} PRECEDING
                               AND CURRENT ROW),
                   v3 AS (PARTITION BY series ORDER BY day_s
                          ROWS BETWEEN {_UO_P3 - 1} PRECEDING
                               AND CURRENT ROW)
        )
        SELECT series, day_s,
               bp3 AS bp_sum20, tr3 AS tr_sum20,
               CASE WHEN tr1 > 0 AND tr2 > 0 AND tr3 > 0 THEN
                   round(100.0 * (4.0 * bp1 / tr1 + 2.0 * bp2 / tr2
                                  + CAST(bp3 AS DOUBLE) / tr3) / 7.0, 6)
               END AS uo
        FROM s WHERE rn >= {_UO_P3 + 1}
    """,
)
def ts_ultimate_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    prev_c = F.lag("cc").over(wo)
    tr = daily.select(
        "series",
        "day_s",
        (F.col("cc") - F.least(F.col("lc"), prev_c)).alias("bp"),
        (
            F.greatest(F.col("hc"), prev_c) - F.least(F.col("lc"), prev_c)
        ).alias("tr_c"),
        F.row_number().over(wo).alias("rn"),
    ).filter(F.col("rn") >= 2)
    v1 = wo.rowsBetween(-(_UO_P1 - 1), 0)
    v2 = wo.rowsBetween(-(_UO_P2 - 1), 0)
    v3 = wo.rowsBetween(-(_UO_P3 - 1), 0)
    s = tr.select(
        "series",
        "day_s",
        "rn",
        F.sum("bp").over(v1).alias("bp1"),
        F.sum("tr_c").over(v1).alias("tr1"),
        F.sum("bp").over(v2).alias("bp2"),
        F.sum("tr_c").over(v2).alias("tr2"),
        F.sum("bp").over(v3).alias("bp3"),
        F.sum("tr_c").over(v3).alias("tr3"),
    )
    ok = (F.col("tr1") > 0) & (F.col("tr2") > 0) & (F.col("tr3") > 0)
    return s.filter(F.col("rn") >= _UO_P3 + 1).select(
        "series",
        "day_s",
        F.col("bp3").alias("bp_sum20"),
        F.col("tr3").alias("tr_sum20"),
        F.when(
            ok,
            F.round(
                100.0
                * (
                    4.0 * F.col("bp1") / F.col("tr1")
                    + 2.0 * F.col("bp2") / F.col("tr2")
                    + F.col("bp3").cast("double") / F.col("tr3")
                )
                / 7.0,
                6,
            ),
        ).alias("uo"),
    )


# ---------------------------------------------------------------------------
# B126 ts_ease_of_movement — Richard Arms' EMV

_EMV_N = 14          # classic 14-day smoothing


@register(
    "ts_ease_of_movement",
    family="timeseries",
    doc="Ease of Movement (B126, Richard Arms' public formulation, "
    "14-day SMA): distance moved = midpoint shift, box ratio = "
    "volume / range; EMV = distance / box = midmove * range / "
    "volume, reported in raw cents-squared-per-volume-unit (no "
    "arbitrary 1e4 rescale: keeping |EMV| ~ 1e5 keeps round(x, 6) "
    "inside the range where x*1e6 is exactly representable, so "
    "HALF_UP agrees bit-for-bit across engines). The numerator "
    "stays EXACT — the 2x-scaled midpoint "
    "move (hc+lc minus the prior day's) times the day's range, both "
    "BIGINTs — so each day does ONE double division by 2*volume; "
    "the 14-day SMA is a frame-ordered list fold (list_sum/len, "
    "identical sequential association both engines — the B83 "
    "discipline, since window sums over DOUBLES are tree-summed by "
    "DuckDB but sequential in Spark). Days with zero range or zero "
    "volume are excluded UP FRONT on both engines so no NULLs enter "
    "the fold lists (DuckDB list() keeps NULLs, collect_list drops "
    "them).",
    oracle=f"""
        WITH {_SQL_DAILY},
        flt AS (
            SELECT series, day_s, hc, lc, vol,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily WHERE hc > lc AND vol > 0
        ),
        emv AS (
            SELECT series, day_s, rn,
                   CAST(((hc + lc) - (lag(hc) OVER w + lag(lc) OVER w))
                        * (hc - lc) AS BIGINT) AS num,
                   vol
            FROM flt
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        d AS (
            SELECT series, day_s, rn, num,
                   num / (2.0 * vol) AS emv_d
            FROM emv WHERE rn >= 2
        ),
        arrs AS (
            SELECT series, day_s, rn, num, emv_d,
                   list(emv_d) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_EMV_N - 1} PRECEDING
                            AND CURRENT ROW) AS arr
            FROM d
        )
        SELECT series, day_s, num AS emv_num,
               round(emv_d, 6) AS emv,
               round(list_sum(arr) / len(arr), 6) AS emv_sma
        FROM arrs WHERE rn >= {_EMV_N + 1}
    """,
)
def ts_ease_of_movement(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    flt = (
        daily.filter((F.col("hc") > F.col("lc")) & (F.col("vol") > 0))
        .select(
            "series",
            "day_s",
            "hc",
            "lc",
            "vol",
            F.row_number().over(wo).alias("rn"),
        )
    )
    mid2 = F.col("hc") + F.col("lc")
    num = (mid2 - (F.lag("hc").over(wo) + F.lag("lc").over(wo))) * (
        F.col("hc") - F.col("lc")
    )
    d = (
        flt.select("series", "day_s", "rn", num.alias("num"), "vol")
        .filter(F.col("rn") >= 2)
        .select(
            "series",
            "day_s",
            "rn",
            "num",
            (F.col("num") / (2.0 * F.col("vol"))).alias("emv_d"),
        )
    )
    arr = F.collect_list("emv_d").over(wo.rowsBetween(-(_EMV_N - 1), 0))
    mean = F.aggregate(arr, F.lit(0.0), lambda a, v: a + v) / F.size(arr)
    return (
        d.select("series", "day_s", "rn", "num", "emv_d", mean.alias("sma"))
        .filter(F.col("rn") >= _EMV_N + 1)
        .select(
            "series",
            "day_s",
            F.col("num").alias("emv_num"),
            F.round("emv_d", 6).alias("emv"),
            F.round("sma", 6).alias("emv_sma"),
        )
    )


# ---------------------------------------------------------------------------
# B127 ts_kst — Martin Pring's Know Sure Thing

#: classic daily KST is ROC(10,15,20,30) SMA(10,10,10,15); the
#: 30-day certification SF uses the same 4-component weighted shape
#: at ROC(5,8,11,14) SMA(3,3,3,5) (documented adaptation)
_KST_ROCS = (5, 8, 11, 14)
_KST_SMAS = (3, 3, 3, 5)
_KST_SIG = 5


@register(
    "ts_kst",
    family="timeseries",
    doc="Know Sure Thing (B127, Martin Pring's public weighted "
    "multi-ROC momentum; ROC(5,8,11,14)/SMA(3,3,3,5) certification-"
    "SF adaptation of the daily 10/15/20/30): each ROC is 100 * "
    "exact-integer close delta over the exact lagged close (ONE "
    "division), each SMA and the signal line are frame-ordered "
    "list-fold means (the B126/B83 double-summation discipline), "
    "KST = 1*s1 + 2*s2 + 3*s3 + 4*s4. Zero-close days are excluded "
    "up front on both engines so ROC denominators never hit zero "
    "and no NULLs enter fold lists; the ROC series restarts its row "
    "numbering once all four ROCs are defined so every list is "
    "NULL-free.",
    oracle=f"""
        WITH {_SQL_DAILY},
        flt AS (
            SELECT series, day_s, cc,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily WHERE cc > 0
        ),
        roc AS (
            SELECT series, day_s, rn,
                   100.0 * (cc - lag(cc, {_KST_ROCS[0]}) OVER w)
                       / lag(cc, {_KST_ROCS[0]}) OVER w AS r1,
                   100.0 * (cc - lag(cc, {_KST_ROCS[1]}) OVER w)
                       / lag(cc, {_KST_ROCS[1]}) OVER w AS r2,
                   100.0 * (cc - lag(cc, {_KST_ROCS[2]}) OVER w)
                       / lag(cc, {_KST_ROCS[2]}) OVER w AS r3,
                   100.0 * (cc - lag(cc, {_KST_ROCS[3]}) OVER w)
                       / lag(cc, {_KST_ROCS[3]}) OVER w AS r4
            FROM flt
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        full_roc AS (
            SELECT series, day_s, r1, r2, r3, r4,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn2
            FROM roc WHERE rn >= {_KST_ROCS[3] + 1}
        ),
        sm AS (
            SELECT series, day_s, rn2,
                   list_sum(a1) / len(a1) AS s1,
                   list_sum(a2) / len(a2) AS s2,
                   list_sum(a3) / len(a3) AS s3,
                   list_sum(a4) / len(a4) AS s4
            FROM (
                SELECT series, day_s, rn2,
                       list(r1) OVER v1 AS a1, list(r2) OVER v1 AS a2,
                       list(r3) OVER v1 AS a3, list(r4) OVER v2 AS a4
                FROM full_roc
                WINDOW v1 AS (PARTITION BY series ORDER BY day_s
                              ROWS BETWEEN {_KST_SMAS[0] - 1} PRECEDING
                                   AND CURRENT ROW),
                       v2 AS (PARTITION BY series ORDER BY day_s
                              ROWS BETWEEN {_KST_SMAS[3] - 1} PRECEDING
                                   AND CURRENT ROW)
            )
        ),
        kst AS (
            SELECT series, day_s, rn2,
                   s1 + 2.0 * s2 + 3.0 * s3 + 4.0 * s4 AS k
            FROM sm WHERE rn2 >= {_KST_SMAS[3]}
        ),
        sig AS (
            SELECT series, day_s, rn2, k,
                   list(k) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_KST_SIG - 1} PRECEDING
                            AND CURRENT ROW) AS ka
            FROM kst
        )
        SELECT series, day_s,
               round(k, 6) AS kst,
               round(list_sum(ka) / len(ka), 6) AS kst_signal
        FROM sig WHERE rn2 >= {_KST_SMAS[3] + _KST_SIG - 1}
    """,
)
def ts_kst(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    flt = daily.filter(F.col("cc") > 0).select(
        "series", "day_s", "cc", F.row_number().over(wo).alias("rn")
    )

    def roc(n):
        lagged = F.lag("cc", n).over(wo)
        return 100.0 * (F.col("cc") - lagged) / lagged

    rocs = flt.select(
        "series",
        "day_s",
        "rn",
        roc(_KST_ROCS[0]).alias("r1"),
        roc(_KST_ROCS[1]).alias("r2"),
        roc(_KST_ROCS[2]).alias("r3"),
        roc(_KST_ROCS[3]).alias("r4"),
    )
    full_roc = rocs.filter(F.col("rn") >= _KST_ROCS[3] + 1).select(
        "series",
        "day_s",
        "r1",
        "r2",
        "r3",
        "r4",
        F.row_number().over(wo).alias("rn2"),
    )
    v1 = wo.rowsBetween(-(_KST_SMAS[0] - 1), 0)
    v2 = wo.rowsBetween(-(_KST_SMAS[3] - 1), 0)

    def mean(arr):
        return F.aggregate(arr, F.lit(0.0), lambda a, v: a + v) / F.size(arr)

    sm = full_roc.select(
        "series",
        "day_s",
        "rn2",
        mean(F.collect_list("r1").over(v1)).alias("s1"),
        mean(F.collect_list("r2").over(v1)).alias("s2"),
        mean(F.collect_list("r3").over(v1)).alias("s3"),
        mean(F.collect_list("r4").over(v2)).alias("s4"),
    )
    kst = sm.filter(F.col("rn2") >= _KST_SMAS[3]).select(
        "series",
        "day_s",
        "rn2",
        (
            F.col("s1") + 2.0 * F.col("s2") + 3.0 * F.col("s3")
            + 4.0 * F.col("s4")
        ).alias("k"),
    )
    ka = F.collect_list("k").over(wo.rowsBetween(-(_KST_SIG - 1), 0))
    return kst.select(
        "series", "day_s", "rn2", "k", mean(ka).alias("sig")
    ).filter(F.col("rn2") >= _KST_SMAS[3] + _KST_SIG - 1).select(
        "series",
        "day_s",
        F.round("k", 6).alias("kst"),
        F.round("sig", 6).alias("kst_signal"),
    )


# ---------------------------------------------------------------------------
# B128 ts_pvt — Price Volume Trend


@register(
    "ts_pvt",
    family="timeseries",
    doc="Price Volume Trend (B128, the public volume-momentum "
    "cumulative: PVT_t = PVT_{t-1} + volume * pct_change(close)) — "
    "B87 OBV's proportional sibling: volume contributes scaled by "
    "the day's relative move, not just its sign. Each day's term "
    "does ONE double division (exact BIGINT volume*delta numerator "
    "over the exact lagged close); the cumulative is a frame-"
    "ordered list fold over the per-series day sequence (bounded by "
    "CALENDAR, not event volume — the B41 cumulative discipline; "
    "sequential association identical on both engines). Zero-close "
    "days are excluded up front so denominators never hit zero.",
    oracle=f"""
        WITH {_SQL_DAILY},
        flt AS (
            SELECT series, day_s, cc, vol,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily WHERE cc > 0
        ),
        t AS (
            SELECT series, day_s, rn,
                   CAST(vol * (cc - lag(cc) OVER w) AS BIGINT) AS num,
                   vol * (cc - lag(cc) OVER w)
                       / CAST(lag(cc) OVER w AS DOUBLE) AS term
            FROM flt
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        c AS (
            SELECT series, day_s, num, term,
                   list(term) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS arr
            FROM t WHERE rn >= 2
        )
        SELECT series, day_s, num AS pvt_num,
               round(term, 6) AS pvt_term,
               round(list_sum(arr), 6) AS pvt
        FROM c
    """,
)
def ts_pvt(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    flt = daily.filter(F.col("cc") > 0).select(
        "series",
        "day_s",
        "cc",
        "vol",
        F.row_number().over(wo).alias("rn"),
    )
    prev = F.lag("cc").over(wo)
    t = flt.select(
        "series",
        "day_s",
        "rn",
        (F.col("vol") * (F.col("cc") - prev)).alias("num"),
        (
            F.col("vol") * (F.col("cc") - prev) / prev.cast("double")
        ).alias("term"),
    ).filter(F.col("rn") >= 2)
    arr = F.collect_list("term").over(
        wo.rowsBetween(Window.unboundedPreceding, 0)
    )
    return t.select(
        "series",
        "day_s",
        F.col("num").alias("pvt_num"),
        F.round("term", 6).alias("pvt_term"),
        F.round(F.aggregate(arr, F.lit(0.0), lambda a, v: a + v), 6).alias(
            "pvt"
        ),
    )


# ---------------------------------------------------------------------------
# B129 ts_balance_of_power — smoothed BOP

_BOP_N = 14


@register(
    "ts_balance_of_power",
    family="timeseries",
    doc="Balance of Power (B129, Igor Livshin's public formulation, "
    "14-day SMA): BOP = (close - open) / (high - low) — where the "
    "close settles in the day's range, signed by conviction. Daily "
    "open = arg_min(event) close = arg_max(event) in exact integer "
    "cents (the B121 RVI discipline), ONE double division per day; "
    "the smoothing is a frame-ordered list-fold mean (B126 "
    "discipline). Zero-range days are excluded up front on both "
    "engines so no NULLs enter the fold lists.",
    oracle=f"""
        WITH daily_o AS (
            SELECT event_type AS series,
                   CAST(epoch(ts)::BIGINT - epoch(ts)::BIGINT % 86400
                       AS BIGINT) AS day_s,
                   arg_min(CAST(round(value * 100) AS BIGINT), event_id)
                       AS oc,
                   arg_max(CAST(round(value * 100) AS BIGINT), event_id)
                       AS cc,
                   max(CAST(round(value * 100) AS BIGINT)) AS hc,
                   min(CAST(round(value * 100) AS BIGINT)) AS lc
            FROM events GROUP BY 1, 2
        ),
        flt AS (
            SELECT series, day_s, oc, cc, hc, lc,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily_o WHERE hc > lc
        ),
        b AS (
            SELECT series, day_s, rn,
                   cc - oc AS co_cents, hc - lc AS range_cents,
                   CAST(cc - oc AS DOUBLE) / (hc - lc) AS bop
            FROM flt
        ),
        arrs AS (
            SELECT series, day_s, rn, co_cents, range_cents, bop,
                   list(bop) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_BOP_N - 1} PRECEDING
                            AND CURRENT ROW) AS arr
            FROM b
        )
        SELECT series, day_s, co_cents, range_cents,
               round(bop, 6) AS bop,
               round(list_sum(arr) / len(arr), 6) AS bop_sma
        FROM arrs WHERE rn >= {_BOP_N}
    """,
)
def ts_balance_of_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    es = F.expr("unix_micros(ts) div 1000000")
    c = F.round(F.col("value") * 100, 0).cast("long")
    daily = (
        events.withColumn("_es", es)
        .groupBy(
            F.col("event_type").alias("series"),
            (F.col("_es") - F.pmod(F.col("_es"), F.lit(86400))).alias(
                "day_s"
            ),
        )
        .agg(
            F.min_by(c, F.col("event_id")).alias("oc"),
            F.max_by(c, F.col("event_id")).alias("cc"),
            F.max(c).alias("hc"),
            F.min(c).alias("lc"),
        )
    )
    wo = Window.partitionBy("series").orderBy("day_s")
    flt = daily.filter(F.col("hc") > F.col("lc")).select(
        "series",
        "day_s",
        "oc",
        "cc",
        "hc",
        "lc",
        F.row_number().over(wo).alias("rn"),
    )
    b = flt.select(
        "series",
        "day_s",
        "rn",
        (F.col("cc") - F.col("oc")).alias("co_cents"),
        (F.col("hc") - F.col("lc")).alias("range_cents"),
        (
            (F.col("cc") - F.col("oc")).cast("double")
            / (F.col("hc") - F.col("lc"))
        ).alias("bop"),
    )
    arr = F.collect_list("bop").over(wo.rowsBetween(-(_BOP_N - 1), 0))
    mean = F.aggregate(arr, F.lit(0.0), lambda a, v: a + v) / F.size(arr)
    return b.select(
        "series",
        "day_s",
        "co_cents",
        "range_cents",
        "rn",
        F.round("bop", 6).alias("bop"),
        F.round(mean, 6).alias("bop_sma"),
    ).filter(F.col("rn") >= _BOP_N).drop("rn")


# ---------------------------------------------------------------------------
# B130 ts_tsi — William Blau's True Strength Index

_TSI_S1 = 25   # first smoothing span (classic 25)
_TSI_S2 = 13   # second smoothing span (classic 13)
_TSI_WIN = 40  # bounded window for the adjust=true EWMA weights


@register(
    "ts_tsi",
    family="timeseries",
    doc="True Strength Index (B130, William Blau's public double-"
    "smoothed momentum): TSI = 100 * EMA13(EMA25(mom)) / "
    "EMA13(EMA25(|mom|)) where mom is the exact-integer daily close "
    "delta in cents. Both smoothing stages are weight-normalized "
    "bounded-window EWMAs (the B83/B120 two-arg list fold, "
    "adjust=true over a 40-day window; the second stage folds the "
    "first stage's doubles — the B120 double-smoothing precedent), "
    "so both engines evaluate identical expression trees over "
    "identical frame-ordered lists. The |mom| chain is positive "
    "whenever any window momentum is nonzero; all-flat windows "
    "yield NULL. ONE division at the output.",
    oracle=f"""
        WITH {_SQL_DAILY},
        m AS (
            SELECT series, day_s,
                   cc - lag(cc) OVER w AS mom,
                   row_number() OVER w AS rn
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        arrs AS (
            SELECT series, day_s, rn,
                   list(mom) OVER v AS am,
                   list(abs(mom)) OVER v AS aa
            FROM m WHERE rn >= 2
            WINDOW v AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_TSI_WIN - 1} PRECEDING
                              AND CURRENT ROW)
        ),
        e1 AS (
            SELECT series, day_s, rn,
                   {_sql_ewma_fold('am', _TSI_S1)} AS em,
                   {_sql_ewma_fold('aa', _TSI_S1)} AS ea
            FROM arrs
        ),
        e2 AS (
            SELECT series, day_s, rn,
                   list(em) OVER v AS am2,
                   list(ea) OVER v AS aa2
            FROM e1
            WINDOW v AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_TSI_WIN - 1} PRECEDING
                              AND CURRENT ROW)
        )
        SELECT series, day_s,
               CASE WHEN {_sql_ewma_fold('aa2', _TSI_S2)} > 0 THEN
                   round(100.0 * {_sql_ewma_fold('am2', _TSI_S2)}
                         / {_sql_ewma_fold('aa2', _TSI_S2)}, 6)
               END AS tsi
        FROM e2 WHERE rn >= {_TSI_S2 + 2}
    """,
)
def ts_tsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    m = daily.select(
        "series",
        "day_s",
        (F.col("cc") - F.lag("cc").over(wo)).alias("mom"),
        F.row_number().over(wo).alias("rn"),
    ).filter(F.col("rn") >= 2)
    wv = wo.rowsBetween(-(_TSI_WIN - 1), 0)
    arrs = m.select(
        "series",
        "day_s",
        "rn",
        F.collect_list("mom").over(wv).alias("am"),
        F.collect_list(F.abs(F.col("mom"))).over(wv).alias("aa"),
    )
    e1 = arrs.select(
        "series",
        "day_s",
        "rn",
        _ewma_fold(F.col("am"), _TSI_S1).alias("em"),
        _ewma_fold(F.col("aa"), _TSI_S1).alias("ea"),
    )
    e2 = e1.select(
        "series",
        "day_s",
        "rn",
        F.collect_list("em").over(wv).alias("am2"),
        F.collect_list("ea").over(wv).alias("aa2"),
    )
    den = _ewma_fold(F.col("aa2"), _TSI_S2)
    num = _ewma_fold(F.col("am2"), _TSI_S2)
    return e2.filter(F.col("rn") >= _TSI_S2 + 2).select(
        "series",
        "day_s",
        F.when(den > 0, F.round(100.0 * num / den, 6)).alias("tsi"),
    )


# ---------------------------------------------------------------------------
# E31 ann_hamming_topk — 64-bit sign-sketch Hamming prefilter + rerank

_HAM_CAND = 64  # Hamming candidate pool reranked exactly
_HAM_K = 20     # final top-k


@register(
    "ann_hamming_topk",
    family="ann",
    doc="Binary sign-sketch ANN (E31, the classic SimHash/ITQ-style "
    "1-bit quantization serving path): each 64-dim embedding "
    "collapses to TWO 32-bit words of sign bits (bit i set iff "
    "v[i] >= 0 — exact integer packing, no float comparison "
    "ambiguity), the query (vec_id 0) packs driver-side with "
    "identical integer ops, and candidate generation is "
    "bit_count(xor) Hamming distance — a 16-byte-per-vector scan "
    "(16x smaller than the float corpus; at 100 TB THIS table is "
    "what the first-stage fleet reads). Top-64 by (hamming, "
    "vec_id) rerank by the EXACT float inner product to the final "
    "top-20, each hit carrying hamming, exact dot and membership "
    "in the exact MIPS top-20 — so the certified output IS the "
    "recall@20 measurement of the 16x-compressed path (the E22 "
    "adjudication). One scan feeds both ordered takes.",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        packed AS (
            SELECT vec_id, label, v,
                   list_sum(list_transform(v[1:32], (x, i) ->
                       CASE WHEN x >= 0
                            THEN CAST(1 AS BIGINT) << (i - 1)
                            ELSE 0 END)) AS w0,
                   list_sum(list_transform(v[33:64], (x, i) ->
                       CASE WHEN x >= 0
                            THEN CAST(1 AS BIGINT) << (i - 1)
                            ELSE 0 END)) AS w1
            FROM e
        ),
        q AS (SELECT v AS qv, w0 AS q0, w1 AS q1
              FROM packed WHERE vec_id = 0),
        scored AS (
            SELECT vec_id, label,
                   CAST(bit_count(xor(w0, (SELECT q0 FROM q)))
                        + bit_count(xor(w1, (SELECT q1 FROM q)))
                        AS BIGINT) AS hamming,
                   list_dot_product(v, (SELECT qv FROM q)) AS exact
            FROM packed
        ),
        exact_top AS (
            SELECT vec_id FROM scored
            ORDER BY round(exact, 6) DESC, vec_id LIMIT {_HAM_K}
        ),
        cand AS (
            SELECT * FROM scored
            ORDER BY hamming, vec_id LIMIT {_HAM_CAND}
        )
        SELECT vec_id, label, hamming,
               round(exact, 6) AS exact_dot,
               vec_id IN (SELECT vec_id FROM exact_top) AS in_exact_topk
        FROM cand
        ORDER BY round(exact, 6) DESC, vec_id
        LIMIT {_HAM_K}
    """,
)
def ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ann import dot

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )

    def pack(lo: int):
        # 32 sign bits from v[lo..lo+31] (1-based), bit i-1 set
        # iff the component is >= 0 — mirrors DuckDB's 1-based
        # list_transform index
        half = F.slice("v", lo, 32)
        return F.aggregate(
            F.zip_with(
                half,
                F.sequence(F.lit(0), F.lit(31)),
                lambda x, i: F.when(
                    x >= 0, F.pow(F.lit(2.0), i).cast("long")
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        )

    packed = emb.select(
        "vec_id", "label", "v", pack(1).alias("w0"), pack(33).alias("w1")
    )
    qrow = (
        packed.filter(F.col("vec_id") == 0)
        .select("v", "w0", "w1")
        .collect()[0]
    )
    qv, q0, q1 = list(qrow[0]), int(qrow[1]), int(qrow[2])
    q_arr = F.array(*[F.lit(float(x)) for x in qv])
    scored = packed.select(
        "vec_id",
        "label",
        (
            F.bit_count(F.col("w0").bitwiseXOR(F.lit(q0)))
            + F.bit_count(F.col("w1").bitwiseXOR(F.lit(q1)))
        ).cast("long").alias("hamming"),
        dot(F.col("v"), q_arr).alias("exact"),
    ).localCheckpoint(eager=True)  # one scan feeds both ordered takes
    exact_top = (
        scored.orderBy(F.round("exact", 6).desc(), "vec_id")
        .limit(_HAM_K)
        .select("vec_id", F.lit(True).alias("flag"))
    )
    return (
        scored.orderBy("hamming", "vec_id")
        .limit(_HAM_CAND)
        .join(F.broadcast(exact_top), "vec_id", "left")
        .orderBy(F.round("exact", 6).desc(), "vec_id")
        .limit(_HAM_K)
        .select(
            "vec_id",
            "label",
            "hamming",
            F.round("exact", 6).alias("exact_dot"),
            F.coalesce("flag", F.lit(False)).alias("in_exact_topk"),
        )
    )


# ---------------------------------------------------------------------------
# F56 text_heaps_fit — Heaps'-law vocabulary-growth fit

_HEAPS_B = 10  # doc-id-prefix checkpoints


@register(
    "text_heaps_fit",
    family="text",
    doc="Heaps'-law fit (F56, the published V = K * N^beta "
    "vocabulary-growth law; Heaps 1978): the corpus is cut into 10 "
    "doc_id-prefix checkpoints (bucket = doc_id*10 / (max_id+1) "
    "from a 1-row max broadcast — deterministic, no global sort); "
    "types are word BIGRAMS (the unigram vocabulary of the "
    "synthetic corpus saturates immediately — bigrams grow the way "
    "a natural vocabulary does, which is the regime the law "
    "describes); cumulative token mass N_k comes from per-bucket "
    "bigram counts and cumulative vocabulary V_k from each type's "
    "FIRST bucket "
    "(min over the vocabulary-grain reduce — types are counted "
    "once, where they first appear, never rescanned). The log-log "
    "OLS over the 10 checkpoint points (the F40 Zipf-fit shape; "
    "10-point double sums sit ~1e-13 below the 1e-6 rounding grid) "
    "yields beta and K = exp(intercept); each checkpoint row "
    "carries N_k, V_k, the fitted K*N^beta and the residual — the "
    "curve a tokenizer-vocab sizing decision actually consults. "
    "Token-grain reduce + 10-row metadata algebra; no doc-grain "
    "window anywhere.",
    oracle=f"""
        WITH mx AS (
            SELECT max(doc_id) + 1 AS m FROM documents
        ),
        tok AS (
            SELECT CAST(floor(doc_id * {_HEAPS_B} * 1e0
                        / (SELECT m FROM mx)) AS BIGINT) AS b,
                   unnest(list_transform(
                       range(1, len(list_filter(string_split(text, ' '),
                                                w -> length(w) > 0))),
                       i -> list_filter(string_split(text, ' '),
                                        w -> length(w) > 0)[i] || ' ' ||
                            list_filter(string_split(text, ' '),
                                        w -> length(w) > 0)[i + 1])) AS t
            FROM documents
        ),
        tc AS (
            SELECT b, t, CAST(count(*) AS BIGINT) AS c
            FROM tok WHERE length(t) > 0 GROUP BY 1, 2
        ),
        per_bucket AS (
            SELECT b, CAST(sum(c) AS BIGINT) AS toks FROM tc GROUP BY b
        ),
        first_seen AS (
            SELECT t, min(b) AS fb FROM tc GROUP BY t
        ),
        new_types AS (
            SELECT fb AS b, CAST(count(*) AS BIGINT) AS vnew
            FROM first_seen GROUP BY fb
        ),
        ck AS (
            SELECT p.b AS checkpoint,
                   CAST(sum(p2.toks) AS BIGINT) AS n_tokens,
                   CAST(sum(coalesce(n2.vnew, 0)) AS BIGINT) AS vocab
            FROM per_bucket p
            JOIN per_bucket p2 ON p2.b <= p.b
            LEFT JOIN new_types n2 ON n2.b = p2.b
            GROUP BY p.b
        ),
        pts AS (
            SELECT checkpoint, n_tokens, vocab,
                   ln(CAST(n_tokens AS DOUBLE)) AS x,
                   ln(CAST(vocab AS DOUBLE)) AS y
            FROM ck
        ),
        fit AS (
            SELECT count(*) * 1.0 AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM pts
        )
        SELECT checkpoint, n_tokens, vocab,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                   AS heaps_beta,
               round(exp((sy - (n * sxy - sx * sy)
                          / (n * sxx - sx * sx) * sx) / n), 6)
                   AS heaps_k,
               round(exp((sy - (n * sxy - sx * sy)
                          / (n * sxx - sx * sx) * sx) / n)
                     * pow(CAST(n_tokens AS DOUBLE),
                           (n * sxy - sx * sy) / (n * sxx - sx * sx)),
                     6) AS fitted_vocab
        FROM pts, fit
        ORDER BY checkpoint
    """,
)
def text_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    mx = docs.agg((F.max("doc_id") + 1).alias("m"))
    words = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(words) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i + 1), F.element_at(words, i + 2)
        ),
    )
    tok = docs.join(F.broadcast(mx)).select(
        F.floor(F.col("doc_id") * _HEAPS_B / F.col("m"))
        .cast("long")
        .alias("b"),
        F.explode(
            F.when(F.size(words) >= 2, bigrams).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("t"),
    )
    tc = tok.groupBy("b", "t").agg(F.count(F.lit(1)).alias("c"))
    # ONE vocabulary-grain reduce carries BOTH signals (r11 single-
    # chain rework): each type's first bucket AND its per-bucket
    # counts (<= B structs per type, bounded by the checkpoint
    # count). The old shape read tc through two branches and pts
    # through two more (the fit self-join), so the initial plan held
    # FOUR copies of the corpus explode (8 parquet scans, 58
    # exchanges); this chain scans once and shuffles three times.
    ty = tc.groupBy("t").agg(
        F.min("b").alias("fb"),
        F.collect_list(F.struct("b", "c")).alias("bc"),
    )
    contrib = ty.select(
        F.explode(
            F.concat(
                F.expr(
                    "transform(bc, s -> struct(s.b AS b, s.c AS toks, 0L AS vnew))"
                ),
                F.expr("array(struct(fb AS b, 0L AS toks, 1L AS vnew))"),
            )
        ).alias("e")
    )
    buckets = contrib.groupBy(F.col("e.b").alias("b")).agg(
        F.sum("e.toks").alias("toks"),
        F.sum("e.vnew").alias("vnew"),
    )
    # B-row metadata algebra from here down, all IN-ROW over one
    # collected array (no single-partition cumsum window, no
    # pts x fit self-join re-executing the corpus subtree); the
    # checkpoint prefix sums stay exact longs, and the OLS folds run
    # in checkpoint order — the 10-point double sums sit ~1e-13
    # below the 1e-6 rounding grid, as before
    one = buckets.agg(
        F.array_sort(F.collect_list(F.struct("b", "toks", "vnew"))).alias("bs")
    )
    pts = one.select(
        F.expr(
            "transform(sequence(1, size(bs)), k -> struct("
            " bs[k-1].b AS checkpoint,"
            " aggregate(slice(bs, 1, k), 0L, (a, s) -> a + s.toks) AS n_tokens,"
            " aggregate(slice(bs, 1, k), 0L, (a, s) -> a + s.vnew) AS vocab))"
        ).alias("pts")
    )
    xy = pts.select(
        "pts",
        F.expr("transform(pts, p -> ln(cast(p.n_tokens AS double)))").alias("xs"),
        F.expr("transform(pts, p -> ln(cast(p.vocab AS double)))").alias("ys"),
    )
    sums = xy.select(
        "pts",
        F.expr("cast(size(pts) AS double)").alias("n"),
        F.expr("aggregate(xs, 0D, (a, v) -> a + v)").alias("sx"),
        F.expr("aggregate(ys, 0D, (a, v) -> a + v)").alias("sy"),
        F.expr(
            "aggregate(zip_with(xs, ys, (x, y) -> x * y), 0D, (a, v) -> a + v)"
        ).alias("sxy"),
        F.expr(
            "aggregate(transform(xs, v -> v * v), 0D, (a, v) -> a + v)"
        ).alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    k = F.exp((sy - beta * sx) / n)
    fit = sums.select("pts", beta.alias("beta"), k.alias("kk"))
    return (
        fit.select(F.explode("pts").alias("p"), "beta", "kk")
        .select(
            F.col("p.checkpoint").alias("checkpoint"),
            F.col("p.n_tokens").alias("n_tokens"),
            F.col("p.vocab").alias("vocab"),
            F.round("beta", 6).alias("heaps_beta"),
            F.round("kk", 6).alias("heaps_k"),
            F.round(
                F.col("kk")
                * F.pow(F.col("p.n_tokens").cast("double"), F.col("beta")),
                6,
            ).alias("fitted_vocab"),
        )
        .orderBy("checkpoint")
    )


# ---------------------------------------------------------------------------
# G22 media_ogg_probe — Ogg page + codec id-header probe


@register(
    "media_ogg_probe",
    family="multimodal",
    doc="Decoder-free Ogg probe (G22, operators/ogg_probe.py): the "
    "THIRD container family after ISO-BMFF (G18) and EBML (G21) — "
    "RFC 3533 frames logical streams into pages, and the first "
    "packet of a beginning-of-stream page is the codec "
    "identification header, so ONE dynamic-offset read sequence "
    "(page header -> n_segments -> lacing table -> packet magic) "
    "resolves codec (OpusHead per RFC 7845 / Vorbis I id packet), "
    "channels, sample rate, Opus preskip and Vorbis nominal "
    "bitrate at projection cost — the G20 fixed-offset posture "
    "(whole-stage codegen, no fold), with the entropy-coded audio "
    "untouched. Synthesis alternates Opus/Vorbis packets per "
    "residue class and exposes only the bytes; the oracle "
    "re-derives every field from generating columns (G5 "
    "adjudication).",
    oracle="""
        SELECT event_id AS media_id,
               TRUE AS is_ogg,
               TRUE AS is_bos,
               CAST(user_id % 100000 + 1 AS BIGINT) AS serial,
               CAST(0 AS BIGINT) AS page_seq,
               CAST(1 AS BIGINT) AS n_segments,
               CASE WHEN event_id % 2 = 0 THEN 'opus'
                    ELSE 'vorbis' END AS codec,
               CAST(user_id % 2 + 1 AS BIGINT) AS channels,
               CAST(CASE WHEN event_id % 2 = 0 THEN 48000
                    ELSE CASE user_id % 3 WHEN 0 THEN 44100
                         WHEN 1 THEN 48000 ELSE 32000 END
                    END AS BIGINT) AS sample_rate,
               CAST(CASE WHEN event_id % 2 = 0
                    THEN event_id % 1000 + 64 END AS BIGINT) AS preskip,
               CAST(CASE WHEN event_id % 2 = 1
                    THEN (event_id % 320 + 32) * 1000 END AS BIGINT)
                   AS bitrate_nominal_bps
        FROM events
    """,
)
def media_ogg_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ogg_probe import (
        parse_ogg_headers,
        synthesize_ogg_headers,
    )

    return parse_ogg_headers(
        synthesize_ogg_headers(load(spark, sf_dir, "events"))
    )


# ---------------------------------------------------------------------------
# G23 media_id3_text_frames — read the ID3 tag, not just hop it


@register(
    "media_id3_text_frames",
    family="multimodal",
    doc="ID3v2.3 text-frame extraction (G23, operators/mp3_probe.py "
    "second half): G20 hops the tag to find audio; THIS reads it — "
    "one bounded F.aggregate walk (the G18 fold discipline) over "
    "the public id3.org v2.3 frame list (4-char id + 4-byte "
    "big-endian size + 2 flags + encoding byte + text) pulling "
    "TIT2/TPE1/TALB/TRCK (title/artist/album/track) as latin-1 "
    "text, stopping on padding, tag end, or any size that runs "
    "past the declared bound (hostile lengths cannot loop). The "
    "TEXTUAL metadata is what a media lake dedups and searches on "
    "— this turns an opaque audio column into joinable strings at "
    "projection cost, no decode. Non-latin-1 encodings count as "
    "frames but read null (honest gate). Synthesis varies string "
    "lengths and padding per row; the oracle re-derives every "
    "string AND the tag byte count from generating columns (G5 "
    "adjudication — a walk bug cannot cancel out).",
    oracle="""
        SELECT event_id AS media_id,
               TRUE AS is_id3,
               CAST(63
                    + length(CAST(event_id % 1000 AS VARCHAR))
                    + length(CAST(user_id % 50 AS VARCHAR))
                    + length(CAST((event_id + user_id) % 20 AS VARCHAR))
                    + length(CAST(event_id % 12 + 1 AS VARCHAR))
                    + event_id % 5 AS BIGINT) AS tag_bytes,
               CAST(4 AS INT) AS n_frames,
               'Track ' || CAST(event_id % 1000 AS VARCHAR) AS title,
               'Artist ' || CAST(user_id % 50 AS VARCHAR) AS artist,
               'Album ' || CAST((event_id + user_id) % 20 AS VARCHAR)
                   AS album,
               CAST(event_id % 12 + 1 AS VARCHAR) AS track
        FROM events
    """,
)
def media_id3_text_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.mp3_probe import (
        parse_id3_frames,
        synthesize_id3_frames,
    )

    return parse_id3_frames(
        synthesize_id3_frames(load(spark, sf_dir, "events"))
    )


# ---------------------------------------------------------------------------
# D32 dedup_hamming_blocking — sign-prefix blocking quality audit

_HB_BITS = 12   # blocking key: the first 12 sign bits (prefix trick)


@register(
    "dedup_hamming_blocking",
    family="dedup",
    doc="Sign-PREFIX blocking audit (D32, the multi-index prefix "
    "trick binary-sketch systems deploy): a full 64-bit sketch "
    "almost never collides exactly (verified: zero blocks at "
    "certification SF), so the blocking key is the first 12 SIGN "
    "BITS — candidate pairs exist only within identical prefixes "
    "(ONE hash-groupBy shuffle on a 2-byte key — never all-pairs, "
    "never even banded). Per block it reports candidate mass, "
    "LABEL-agreement mass (same_label/pairs — on label-clustered "
    "embeddings this is the measurable blocking quality; random "
    "blocking scores ~1/n_labels) and the within-block cosine mass "
    "in exact integer micro-units (the D29/E22 discipline: "
    "sum of round(cos*1e6) as BIGINT, ONE division at the output) "
    "— the pre-flight that decides whether 1-bit blocking "
    "suffices before paying for MinHash banding (the D27 "
    "posture). At 100 TB the blocking scan reads 2 bytes/vector "
    "and pair work is bounded by block sizes.",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        packed AS (
            SELECT vec_id, label, v,
                   CAST(list_sum(list_transform(v[1:{_HB_BITS}], (x, i) ->
                       CASE WHEN x >= 0
                            THEN CAST(1 AS BIGINT) << (i - 1)
                            ELSE 0 END)) AS BIGINT) AS blk
            FROM e
        ),
        blocks AS (
            SELECT blk, CAST(count(*) AS BIGINT) AS n
            FROM packed GROUP BY blk HAVING count(*) >= 2
        ),
        pairs AS (
            SELECT a.blk,
                   CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS same,
                   CAST(round(list_dot_product(a.v, b.v)
                       / sqrt(list_dot_product(a.v, a.v)
                              * list_dot_product(b.v, b.v)) * 1e6)
                       AS BIGINT) AS cos_u
            FROM packed a JOIN packed b
              ON a.blk = b.blk AND a.vec_id < b.vec_id
        )
        SELECT p.blk AS block_key, b.n AS block_size,
               CAST(count(*) AS BIGINT) AS candidate_pairs,
               CAST(sum(p.same) AS BIGINT) AS same_label_pairs,
               round(CAST(sum(p.same) AS DOUBLE) / count(*), 6)
                   AS label_precision,
               CAST(sum(p.cos_u) AS BIGINT) AS cos_mass_micro,
               round(CAST(sum(p.cos_u) AS DOUBLE)
                     / (count(*) * 1e6), 6) AS mean_cos
        FROM pairs p JOIN blocks b ON p.blk = b.blk
        GROUP BY p.blk, b.n
    """,
)
def dedup_hamming_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ann import dot

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    blk = F.aggregate(
        F.zip_with(
            F.slice("v", 1, _HB_BITS),
            F.sequence(F.lit(0), F.lit(_HB_BITS - 1)),
            lambda x, i: F.when(
                x >= 0, F.pow(F.lit(2.0), i).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    packed = emb.select("vec_id", "label", "v", blk.alias("blk"))
    blocks = (
        packed.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )
    a = packed.alias("a")
    b = packed.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / F.sqrt(
        dot(F.col("a.v"), F.col("a.v")) * dot(F.col("b.v"), F.col("b.v"))
    )
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.blk").alias("blk"),
        F.when(F.col("a.label") == F.col("b.label"), 1)
        .otherwise(0)
        .alias("same"),
        F.round(cos * F.lit(1e6), 0).cast("long").alias("cos_u"),
    )
    return (
        pairs.groupBy("blk")
        .agg(
            F.count(F.lit(1)).alias("candidate_pairs"),
            F.sum("same").alias("same_label_pairs"),
            F.sum("cos_u").alias("cos_mass_micro"),
        )
        .join(blocks, ["blk"])
        .select(
            F.col("blk").alias("block_key"),
            F.col("n").alias("block_size"),
            "candidate_pairs",
            "same_label_pairs",
            F.round(
                F.col("same_label_pairs").cast("double")
                / F.col("candidate_pairs"),
                6,
            ).alias("label_precision"),
            "cos_mass_micro",
            F.round(
                F.col("cos_mass_micro").cast("double")
                / (F.col("candidate_pairs") * F.lit(1e6)),
                6,
            ).alias("mean_cos"),
        )
    )


# ---------------------------------------------------------------------------
# B131 ts_connors_rsi — Connors RSI(3, 2, 10) composite

_CRSI_RSI, _CRSI_STREAK, _CRSI_RANK = 3, 2, 10


@register(
    "ts_connors_rsi",
    family="timeseries",
    doc="Connors RSI (B131, the published Connors Research "
    "composite, 3/2/10): mean of (a) Cutler RSI(3) on daily close "
    "deltas — the B73 exact-integer gain/loss form, (b) RSI(2) on "
    "the signed STREAK series (gaps-and-islands run encoding: "
    "run_id = cumulative sign-change count, streak = sign * "
    "position-in-run — all partitioned integer windows), and (c) "
    "the 10-day percent rank of the 1-day return, counted EXACTLY "
    "by cross-multiplication (d_i * prev_cur < d_cur * prev_i with "
    "positive prevs — no float return is ever compared, so the "
    "count cannot disagree across engines). Both RSIs use the B73 "
    "scale-0 rounding; the composite rounds once at the output. "
    "Zero-close days excluded up front; rows once the rank window "
    "is full.",
    oracle=f"""
        WITH {_SQL_DAILY},
        flt AS (
            SELECT series, day_s, cc,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily WHERE cc > 0
        ),
        d AS (
            SELECT series, day_s,
                   cc - lag(cc) OVER w AS delta,
                   lag(cc) OVER w AS prev,
                   row_number() OVER w - 1 AS rn2
            FROM flt
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        base AS (SELECT * FROM d WHERE rn2 >= 1),
        chg AS (
            SELECT series, day_s, delta, prev, rn2,
                   CASE WHEN lag(sign(delta)) OVER w IS NULL
                        OR sign(delta) != lag(sign(delta)) OVER w
                        THEN 1 ELSE 0 END AS is_chg
            FROM base
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        runs AS (
            SELECT series, day_s, delta, prev, rn2,
                   CAST(sum(is_chg) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS run_id
            FROM chg
        ),
        st AS (
            SELECT series, day_s, delta, prev, rn2,
                   CAST(sign(delta) AS BIGINT)
                       * row_number() OVER (
                           PARTITION BY series, run_id
                           ORDER BY day_s) AS streak
            FROM runs
        ),
        legs AS (
            SELECT series, day_s, delta, prev, rn2, streak,
                   streak - lag(streak) OVER w AS sdelta,
                   CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END)
                       OVER v3 AS BIGINT) AS g3,
                   CAST(sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END)
                       OVER v3 AS BIGINT) AS l3,
                   list({{'d': delta, 'p': prev}}) OVER vr AS arr
            FROM st
            WINDOW w AS (PARTITION BY series ORDER BY day_s),
                   v3 AS (PARTITION BY series ORDER BY day_s
                          ROWS BETWEEN {_CRSI_RSI - 1} PRECEDING
                               AND CURRENT ROW),
                   vr AS (PARTITION BY series ORDER BY day_s
                          ROWS BETWEEN {_CRSI_RANK} PRECEDING
                               AND 1 PRECEDING)
        ),
        legs2 AS (
            SELECT series, day_s, rn2, streak, delta, prev, g3, l3, arr,
                   CAST(sum(CASE WHEN sdelta > 0 THEN sdelta ELSE 0 END)
                       OVER v2 AS BIGINT) AS gs,
                   CAST(sum(CASE WHEN sdelta < 0 THEN -sdelta ELSE 0 END)
                       OVER v2 AS BIGINT) AS ls
            FROM legs
            WINDOW v2 AS (PARTITION BY series ORDER BY day_s
                          ROWS BETWEEN {_CRSI_STREAK - 1} PRECEDING
                               AND CURRENT ROW)
        ),
        scored AS (
            SELECT series, day_s, rn2, streak,
                   CASE WHEN g3 + l3 = 0 THEN 50.0
                        ELSE round(100000000.0 * g3 / (g3 + l3), 0)
                             / 1000000.0 END AS rsi3,
                   CASE WHEN gs + ls = 0 THEN 50.0
                        ELSE round(100000000.0 * gs / (gs + ls), 0)
                             / 1000000.0 END AS streak_rsi2,
                   10.0 * len(list_filter(arr,
                       s -> s.d * prev < delta * s.p)) AS pct_rank
            FROM legs2
        )
        SELECT series, day_s, streak, rsi3, streak_rsi2, pct_rank,
               round((rsi3 + streak_rsi2 + pct_rank) / 3.0, 6) AS crsi
        FROM scored WHERE rn2 >= {_CRSI_RANK + 1}
    """,
)
def ts_connors_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    flt = daily.filter(F.col("cc") > 0).select(
        "series", "day_s", "cc", F.row_number().over(wo).alias("rn")
    )
    base = flt.select(
        "series",
        "day_s",
        (F.col("cc") - F.lag("cc").over(wo)).alias("delta"),
        F.lag("cc").over(wo).alias("prev"),
        (F.row_number().over(wo) - 1).alias("rn2"),
    ).filter(F.col("rn2") >= 1)
    sgn = F.signum(F.col("delta").cast("double")).cast("long")
    chg = F.when(
        F.lag(sgn).over(wo).isNull() | (sgn != F.lag(sgn).over(wo)), 1
    ).otherwise(0)
    runs = base.select(
        "series",
        "day_s",
        "delta",
        "prev",
        "rn2",
        F.sum(chg)
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("run_id"),
    )
    streak = sgn * F.row_number().over(
        Window.partitionBy("series", "run_id").orderBy("day_s")
    )
    st = runs.select(
        "series", "day_s", "delta", "prev", "rn2", streak.alias("streak")
    )
    v3 = wo.rowsBetween(-(_CRSI_RSI - 1), 0)
    vr = wo.rowsBetween(-_CRSI_RANK, -1)
    zero = F.lit(0).cast("long")
    legs = st.select(
        "series",
        "day_s",
        "delta",
        "prev",
        "rn2",
        "streak",
        (F.col("streak") - F.lag("streak").over(wo)).alias("sdelta"),
        F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(zero))
        .over(v3)
        .alias("g3"),
        F.sum(F.when(F.col("delta") < 0, -F.col("delta")).otherwise(zero))
        .over(v3)
        .alias("l3"),
        F.collect_list(
            F.struct(F.col("delta").alias("d"), F.col("prev").alias("p"))
        )
        .over(vr)
        .alias("arr"),
    )
    v2 = wo.rowsBetween(-(_CRSI_STREAK - 1), 0)
    legs2 = legs.select(
        "series",
        "day_s",
        "rn2",
        "streak",
        "delta",
        "prev",
        "g3",
        "l3",
        "arr",
        F.sum(F.when(F.col("sdelta") > 0, F.col("sdelta")).otherwise(zero))
        .over(v2)
        .alias("gs"),
        F.sum(F.when(F.col("sdelta") < 0, -F.col("sdelta")).otherwise(zero))
        .over(v2)
        .alias("ls"),
    )

    def rsi(g, l):
        return F.when(g + l == zero, F.lit(50.0)).otherwise(
            F.round(100000000.0 * g / (g + l), 0) / 1000000.0
        )

    dcur, pcur = F.col("delta"), F.col("prev")
    pct = 10.0 * F.size(
        F.filter(F.col("arr"), lambda s: s["d"] * pcur < dcur * s["p"])
    )
    scored = legs2.select(
        "series",
        "day_s",
        "rn2",
        "streak",
        rsi(F.col("g3"), F.col("l3")).alias("rsi3"),
        rsi(F.col("gs"), F.col("ls")).alias("streak_rsi2"),
        pct.alias("pct_rank"),
    )
    return scored.filter(F.col("rn2") >= _CRSI_RANK + 1).select(
        "series",
        "day_s",
        "streak",
        "rsi3",
        "streak_rsi2",
        "pct_rank",
        F.round(
            (F.col("rsi3") + F.col("streak_rsi2") + F.col("pct_rank"))
            / 3.0,
            6,
        ).alias("crsi"),
    )


# ---------------------------------------------------------------------------
# F57 text_decontamination_near — MinHash near-dup benchmark decontamination

_DECON_MOD = 7     # benchmark slice: doc_id % 7 == 0 (deterministic)
_DECON_TAU = 0.5   # est-Jaccard contamination threshold


def _decon_near_oracle() -> str:
    from timescaledb_event_streamer_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_PERMS,
        _A,
        _B,
        _MERSENNE,
    )

    rows = MINHASH_PERMS // MINHASH_BANDS
    mins = ",\n               ".join(
        f"min((h * {_A[i]} + {_B[i]}) % {_MERSENNE}) AS mh{i}"
        for i in range(MINHASH_PERMS)
    )
    band_conds = "\n               OR ".join(
        "("
        + " AND ".join(
            f"a.mh{bi * rows + ri} = b.mh{bi * rows + ri}"
            for ri in range(rows)
        )
        + ")"
        for bi in range(MINHASH_BANDS)
    )
    eqsum = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END"
        for i in range(MINHASH_PERMS)
    )
    return f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            WHERE len(string_split(text, ' ')) >= 5
        ),
        s0 AS (SELECT doc_id, unnest(range(len(toks) - 4)) AS i, toks
               FROM t),
        sh AS (
            SELECT doc_id,
                   ('0x' || substr(md5(array_to_string(
                       toks[i + 1 : i + 5], ' ')), 1, 15))::BIGINT
                       % {_MERSENNE} AS h
            FROM s0
        ),
        sig AS (
            SELECT doc_id,
               {mins}
            FROM sh GROUP BY doc_id
        )
        SELECT a.doc_id AS train_doc, b.doc_id AS bench_doc,
               ({eqsum}) / 32.0 AS est_jaccard,
               ({eqsum}) / 32.0 >= {_DECON_TAU} AS contaminated
        FROM sig a JOIN sig b
          ON a.doc_id % {_DECON_MOD} != 0 AND b.doc_id % {_DECON_MOD} = 0
        WHERE {band_conds}
    """


@register(
    "text_decontamination_near",
    family="text",
    doc="NEAR-duplicate benchmark decontamination (F57, the "
    "published contamination posture of the Llama/PaLM reports — "
    "exact n-gram overlap (F8) and Bloom membership (F22) miss "
    "paraphrased or lightly-edited eval leakage, so the third gate "
    "is MinHash: the benchmark slice (doc_id % 7 == 0, standing in "
    "for the eval set a real run loads) and the training corpus "
    "each get D12's md5-portable 32-perm signatures, candidates "
    "come ONLY from banded LSH collisions between a training doc "
    "and a benchmark doc (asymmetric: the benchmark side is "
    "tiny and BROADCAST — cost scales with the training corpus "
    "x collision rate, the D25 posture, never corpus x benchmark), "
    "and each candidate carries the exact k/32 est-Jaccard (5 "
    "decimals, exactly representable) with the >= 0.5 contamination "
    "verdict. At 100 TB this is the decontamination fleet's actual "
    "shape: benchmark signatures ship to every executor; the corpus "
    "streams once.",
    oracle=_decon_near_oracle(),
)
def text_decontamination_near(spark: SparkSession, sf_dir: str) -> DataFrame:

    from timescaledb_event_streamer_spark.operators.dedup import (
        _MERSENNE,
        MINHASH_BANDS,
        MINHASH_PERMS,
        minhash_signatures,
    )

    rows = MINHASH_PERMS // MINHASH_BANDS
    docs = load(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 5
    )
    md5_base = lambda s: (  # noqa: E731
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % _MERSENNE
    )
    sig = scoped_persist(
        minhash_signatures(docs, base_hash=md5_base),
        "text_decontamination_near.sig",
    )

    def banded(frame):
        return frame.select(
            "doc_id",
            "sig",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.xxhash64(
                                F.concat_ws(
                                    ",",
                                    *[
                                        F.col("sig")[bi * rows + ri].cast(
                                            "string"
                                        )
                                        for ri in range(rows)
                                    ],
                                )
                            ).alias("bucket"),
                        )
                        for bi in range(MINHASH_BANDS)
                    ]
                )
            ).alias("bb"),
        ).select("doc_id", "sig", "bb.band", "bb.bucket")
    train = banded(sig.filter(F.col("doc_id") % _DECON_MOD != 0)).alias("a")
    bench = banded(sig.filter(F.col("doc_id") % _DECON_MOD == 0)).alias("b")
    agree = F.aggregate(
        F.zip_with(
            F.col("a.sig"),
            F.col("b.sig"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    cand = (
        train.join(
            F.broadcast(bench),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.doc_id").alias("train_doc"),
            F.col("b.doc_id").alias("bench_doc"),
            (agree / 32.0).alias("est_jaccard"),
        )
        .dropDuplicates(["train_doc", "bench_doc"])
    )
    return cand.select(
        "train_doc",
        "bench_doc",
        "est_jaccard",
        (F.col("est_jaccard") >= _DECON_TAU).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# A35 cdc_wal_growth_forecast — slot-retention breach forecast

_WAL_BUDGET = 100000  # configured max_slot_wal_keep stand-in (LSN units)


@register(
    "cdc_wal_growth_forecast",
    family="cdc",
    doc="WAL-retention breach forecast (A35, the ops question A34's "
    "report raises: WHEN does the pinned slot hit "
    "max_slot_wal_keep_size?): per table the WAL emission rate is "
    "the OLS slope of LSN against MIN-CENTERED time (centering "
    "keeps the regression sums inside double precision; the F40 "
    "slope idiom, sum-reorder noise ~1e-14 under the 1e-6 rounding "
    "grid), the slot posture (confirmed_flush = min acked LSN, "
    "retained mass) comes from A34's exact model, and the forecast "
    "divides remaining budget by the TOTAL emission rate — the "
    "number a pager alert actually fires on. Per-table grain with "
    "two 1-row broadcasts (slot posture, total rate); no global "
    "window, no skew.",
    oracle=f"""
        WITH r AS (
            SELECT event_type, event_id,
                   (epoch_us(ts) // 1000000) AS es,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        c AS (
            SELECT event_type,
                   CAST(es - min(es) OVER (PARTITION BY event_type)
                       AS BIGINT) AS x,
                   CAST(event_id AS BIGINT) AS y,
                   event_id, rn, n
            FROM r
        ),
        sums AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(max(event_id) AS BIGINT) AS head_lsn,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(max(CASE WHEN rn = (9 * n + 9) // 10
                            THEN event_id END) AS BIGINT) AS acked_lsn
            FROM c GROUP BY event_type
        ),
        fit AS (
            SELECT event_type, n_events, head_lsn, acked_lsn,
                   CAST(n_events AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
                   CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx
            FROM sums
        ),
        slot AS (SELECT min(acked_lsn) AS confirmed_flush FROM fit),
        ret AS (
            SELECT e.event_type, CAST(count(*) AS BIGINT) AS retained
            FROM events e, slot s
            WHERE e.event_id > s.confirmed_flush
            GROUP BY e.event_type
        ),
        rated AS (
            SELECT f.event_type, f.n_events, f.head_lsn,
                   3600.0 * f.cov / f.varx AS rate_h,
                   coalesce(r.retained, 0) AS retained
            FROM fit f LEFT JOIN ret r ON r.event_type = f.event_type
        ),
        tot AS (
            SELECT sum(rate_h) AS total_rate_h,
                   CAST(sum(retained) AS BIGINT) AS total_retained
            FROM rated
        )
        SELECT d.event_type AS source_table,
               d.n_events, d.head_lsn,
               round(d.rate_h, 6) AS rate_lsn_per_hour,
               d.retained AS retained_by_slot,
               t.total_retained,
               round(({_WAL_BUDGET} - t.total_retained)
                     / t.total_rate_h, 3) AS hours_to_breach,
               ({_WAL_BUDGET} - t.total_retained) / t.total_rate_h
                   <= 24.0 AS breach_within_24h
        FROM rated d CROSS JOIN tot t
    """,
)
def cdc_wal_growth_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    es = F.expr("unix_micros(ts) div 1000000")
    wt = Window.partitionBy("event_type")
    wo = wt.orderBy("event_id")
    r = events.select(
        "event_type",
        "event_id",
        es.alias("es"),
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    c = r.select(
        "event_type",
        (F.col("es") - F.min("es").over(wt)).cast("long").alias("x"),
        F.col("event_id").cast("long").alias("y"),
        "event_id",
        "rn",
        "n",
    )
    sums = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("event_id").alias("head_lsn"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.max(
            F.when(
                F.col("rn") == F.floor((9 * F.col("n") + 9) / 10),
                F.col("event_id"),
            )
        ).alias("acked_lsn"),
    )
    nd = F.col("n_events").cast("double")
    fit = sums.select(
        "event_type",
        "n_events",
        "head_lsn",
        "acked_lsn",
        (
            nd * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        ).alias("cov"),
        (
            nd * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        ).alias("varx"),
    )
    slot = fit.agg(F.min("acked_lsn").alias("confirmed_flush"))
    ret = (
        events.join(F.broadcast(slot))
        .filter(F.col("event_id") > F.col("confirmed_flush"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("retained"))
    )
    rated = (
        fit.join(ret, "event_type", "left")
        .select(
            "event_type",
            "n_events",
            "head_lsn",
            (3600.0 * F.col("cov") / F.col("varx")).alias("rate_h"),
            F.coalesce("retained", F.lit(0)).alias("retained"),
        )
    )
    tot = rated.agg(
        F.sum("rate_h").alias("total_rate_h"),
        F.sum("retained").alias("total_retained"),
    )
    hrs = (F.lit(float(_WAL_BUDGET)) - F.col("total_retained")) / F.col(
        "total_rate_h"
    )
    return rated.join(F.broadcast(tot)).select(
        F.col("event_type").alias("source_table"),
        "n_events",
        "head_lsn",
        F.round("rate_h", 6).alias("rate_lsn_per_hour"),
        F.col("retained").alias("retained_by_slot"),
        "total_retained",
        F.round(hrs, 3).alias("hours_to_breach"),
        (hrs <= 24.0).alias("breach_within_24h"),
    )
