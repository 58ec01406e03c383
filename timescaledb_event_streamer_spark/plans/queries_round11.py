"""Round-11 registered queries.

Continues the SURVEY.md §2 build-out. Reference attributions sit on
each query's docstring; oracles follow the rules in
plans/queries_olap.py (aliases, HALF_UP rounding, BIGINT casts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.caching import scoped_persist
from timescaledb_event_streamer_spark.plans.queries_round8b import _SQL_DAILY
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load

# ---------------------------------------------------------------------------
# G18 media_mp4_probe — ISO-BMFF decoder-free video-container probe


@register(
    "media_mp4_probe",
    family="multimodal",
    doc="Decoder-free MP4/ISO-BMFF probe (G18, operators/"
    "mp4_probe.py): the G5/G10 bounded-walk pattern applied to the "
    "video container — ONE linear F.aggregate walks the box tree "
    "(containers entered by +8 bytes, leaves skipped by their "
    "declared size) and reads movie duration/timescale (mvhd), "
    "track count and the first video track's real 16.16 "
    "dimensions (tkhd), and per-track codec fourccs (stsd sample "
    "entries) — JVM-side, zero Python per row (the fold is an "
    "interpreted Catalyst HOF — ~60 us/row wall on local[32], "
    "linear; the interpreter, not the walk, is the cost) — all a "
    "100 TB media lake needs to ROUTE "
    "video (transcode fleet sizing, codec inventory, resolution "
    "pruning) at projection cost, with the entropy-coded payload "
    "untouched (decode stays honestly ffmpeg-gated, "
    "multimodal.py:147). Synthesis varies box layout per row "
    "(optional free box, 1-2 compatible brands, 1-2 traks) and "
    "exposes only the bytes; the oracle re-derives every field "
    "from the generating columns, so a walk bug cannot cancel out "
    "(the G5 adjudication). duration_ms uses exact "
    "numerator-divisible division, engine-identical with integer //.",
    oracle="""
        WITH g AS (
            SELECT event_id, user_id,
                   CASE user_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
                        ELSE 90000 END AS ts,
                   (event_id % 9000 + 1) * 100 AS dur
            FROM events
        )
        SELECT event_id AS media_id,
               TRUE AS is_mp4,
               CASE event_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
                    ELSE 'mp41' END AS major_brand,
               CAST(ts AS BIGINT) AS timescale,
               CAST(dur AS BIGINT) AS duration,
               CAST(dur * 1000 // ts AS BIGINT) AS duration_ms,
               CAST(event_id % 2 + 1 AS BIGINT) AS n_tracks,
               CAST(user_id % 1920 + 16 AS BIGINT) AS width,
               CAST(event_id % 1080 + 16 AS BIGINT) AS height,
               CASE WHEN event_id % 2 = 0 THEN 'avc1' ELSE 'hev1' END
                   AS video_codec,
               CASE WHEN event_id % 2 = 1 THEN 'mp4a' END AS audio_codec,
               CAST(CASE WHEN event_id % 2 = 0 THEN 11 ELSE 17 END
                   AS BIGINT) AS n_boxes
        FROM g
    """,
)
def media_mp4_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.mp4_probe import (
        mp4_probe_roundtrip,
    )

    # fused synth+walk seam (r11): same rows as
    # parse_mp4_headers(synthesize_mp4_headers(...)) — byte- and
    # row-parity pinned in pytest; the payload never crosses the
    # Arrow boundary
    return mp4_probe_roundtrip(load(spark, sf_dir, "events"))

# ---------------------------------------------------------------------------
# B116 ts_awesome_oscillator — Bill Williams' AO

# classic AO is 5/34; the certification SF spans 30 calendar days,
# so the slow window is parameterized down to 21 (same algebra —
# a production deployment sets 34 back via these constants)
_AO_FAST, _AO_SLOW = 5, 21


@register(
    "ts_awesome_oscillator",
    family="timeseries",
    doc="Awesome Oscillator (B116, Bill Williams' public "
    "formulation; the B72/B105 dashboard family): SMA5(midpoint) - "
    "SMAslow(midpoint) on the daily bars (5/34 classic; slow=21 at "
    "the 30-day certification SF, same algebra). Exact-integer "
    "algebra: mp2 = H+L (2x scale, no halving), ao_num = "
    "slow*sum_fast(mp2) - fast*sum_slow(mp2) is an exact integer, ONE "
    "double division at the output; the bar color compares exact "
    "integer numerators (green = rising), so the signal column "
    "cannot disagree across engines by an ulp. Day-grain per-series "
    "windows, rows emitted once the slow window is full.",
    oracle=f"""
        WITH {_SQL_DAILY},
        s AS (
            SELECT series, day_s,
                   CAST(sum(hc + lc) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_AO_FAST - 1} PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS s_fast,
                   CAST(sum(hc + lc) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_AO_SLOW - 1} PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS s_slow,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
        ),
        n AS (
            SELECT series, day_s, rn,
                   {_AO_SLOW} * s_fast - {_AO_FAST} * s_slow AS ao_num,
                   lag({_AO_SLOW} * s_fast - {_AO_FAST} * s_slow) OVER (
                       PARTITION BY series ORDER BY day_s) AS prev_num,
                   lag(rn) OVER (
                       PARTITION BY series ORDER BY day_s) AS prev_rn
            FROM s
        )
        SELECT series, day_s,
               round(ao_num / {_AO_FAST * _AO_SLOW * 2}.0, 6) AS ao,
               CASE WHEN prev_rn >= {_AO_SLOW} AND ao_num > prev_num
                    THEN 'green'
                    WHEN prev_rn >= {_AO_SLOW} AND ao_num < prev_num
                    THEN 'red'
                    WHEN prev_rn >= {_AO_SLOW} THEN 'flat'
               END AS color
        FROM n WHERE rn >= {_AO_SLOW}
    """,
)
def ts_awesome_oscillator(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    mp2 = F.col("hc") + F.col("lc")
    s = daily.select(
        "series",
        "day_s",
        F.sum(mp2).over(wo.rowsBetween(-(_AO_FAST - 1), 0)).alias("s_fast"),
        F.sum(mp2).over(wo.rowsBetween(-(_AO_SLOW - 1), 0)).alias("s_slow"),
        F.row_number().over(wo).alias("rn"),
    )
    ao_num = _AO_SLOW * F.col("s_fast") - _AO_FAST * F.col("s_slow")
    n = s.select(
        "series",
        "day_s",
        "rn",
        ao_num.alias("ao_num"),
        F.lag(ao_num).over(wo).alias("prev_num"),
        F.lag("rn").over(wo).alias("prev_rn"),
    )
    seen = F.col("prev_rn") >= _AO_SLOW
    return n.filter(F.col("rn") >= _AO_SLOW).select(
        "series",
        "day_s",
        F.round(F.col("ao_num") / float(_AO_FAST * _AO_SLOW * 2), 6).alias("ao"),
        F.when(seen & (F.col("ao_num") > F.col("prev_num")), "green")
        .when(seen & (F.col("ao_num") < F.col("prev_num")), "red")
        .when(seen, "flat")
        .alias("color"),
    )


# ---------------------------------------------------------------------------
# B117 ts_coppock_curve — WMA10 of ROC14 + ROC11 (daily adaptation)

_CPK_R1, _CPK_R2, _CPK_W = 14, 11, 10


@register(
    "ts_coppock_curve",
    family="timeseries",
    doc="Coppock Curve (B117, E.S.C. Coppock's public momentum "
    "gauge, daily adaptation of the monthly original): WMA10 of "
    "(ROC14 + ROC11) on the daily close. ROCs are rationals of "
    "exact integer cents; the WMA folds the 10-deep window with "
    "linearly ascending weights via the two-arg list_transform on "
    "both engines (the B83 MACD idiom — identical fold order, so "
    "the doubles agree bit-for-bit), normalized by the constant 55; "
    "rounded once at the output. Emitted once both ROC lags and the "
    "full WMA window exist.",
    oracle=f"""
        WITH {_SQL_DAILY},
        r AS (
            SELECT series, day_s,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn,
                   100.0 * (cc - lag(cc, {_CPK_R1}) OVER w)
                       / lag(cc, {_CPK_R1}) OVER w
                   + 100.0 * (cc - lag(cc, {_CPK_R2}) OVER w)
                       / lag(cc, {_CPK_R2}) OVER w AS roc2
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        arrs AS (
            SELECT series, day_s, rn,
                   list(roc2) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_CPK_W - 1} PRECEDING
                            AND CURRENT ROW) AS arr
            FROM r WHERE rn > {_CPK_R1}
        )
        SELECT series, day_s,
               round(list_sum(list_transform(arr, (v, i) -> v * i))
                     / {_CPK_W * (_CPK_W + 1) // 2}.0, 6) AS coppock
        FROM arrs WHERE len(arr) = {_CPK_W}
    """,
)
def ts_coppock_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    roc = lambda n: (  # noqa: E731
        100.0
        * (F.col("cc") - F.lag("cc", n).over(wo))
        / F.lag("cc", n).over(wo)
    )
    r = daily.select(
        "series",
        "day_s",
        F.row_number().over(wo).alias("rn"),
        (roc(_CPK_R1) + roc(_CPK_R2)).alias("roc2"),
    ).filter(F.col("rn") > _CPK_R1)
    arrs = r.select(
        "series",
        "day_s",
        F.collect_list("roc2")
        .over(wo.rowsBetween(-(_CPK_W - 1), 0))
        .alias("arr"),
    ).filter(F.size("arr") == _CPK_W)
    # (v, i) -> v * i with DuckDB's 1-based index: Spark's transform
    # index is 0-based, so weight = i + 1
    wsum = F.aggregate(
        F.zip_with(
            F.col("arr"),
            F.sequence(F.lit(1), F.lit(_CPK_W)).cast("array<double>"),
            lambda v, i: v * i,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return arrs.select(
        "series",
        "day_s",
        F.round(wsum / float(_CPK_W * (_CPK_W + 1) // 2), 6).alias("coppock"),
    )


# ---------------------------------------------------------------------------
# B118 ts_chande_momentum — Chande Momentum Oscillator

_CMO_N = 14


@register(
    "ts_chande_momentum",
    family="timeseries",
    doc="Chande Momentum Oscillator (B118, Tushar Chande's public "
    "formulation): 100 * (sum_up - sum_down) / (sum_up + sum_down) "
    "over 14 days of daily close changes — RSI's unsmoothed cousin, "
    "bounded [-100, 100]. Exact integers end-to-end: the close "
    "deltas, their positive/negative clamps and both window sums "
    "are BIGINTs, ONE double division at the output; a flat window "
    "(zero total movement) yields NULL instead of a division "
    "error.",
    oracle=f"""
        WITH {_SQL_DAILY},
        d AS (
            SELECT series, day_s,
                   cc - lag(cc) OVER w AS delta,
                   row_number() OVER w AS rn
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        s AS (
            SELECT series, day_s, rn,
                   CAST(sum(greatest(delta, 0)) OVER v AS BIGINT) AS up,
                   CAST(sum(greatest(-delta, 0)) OVER v AS BIGINT) AS down
            FROM d WHERE rn >= 2
            WINDOW v AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_CMO_N - 1} PRECEDING
                              AND CURRENT ROW)
        )
        SELECT series, day_s, up AS up_cents, down AS down_cents,
               CASE WHEN up + down > 0 THEN
                   round(100.0 * (up - down) / (up + down), 6)
               END AS cmo
        FROM s WHERE rn >= {_CMO_N + 1}
    """,
)
def ts_chande_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    d = daily.select(
        "series",
        "day_s",
        (F.col("cc") - F.lag("cc").over(wo)).alias("delta"),
        F.row_number().over(wo).alias("rn"),
    ).filter(F.col("rn") >= 2)
    wv = wo.rowsBetween(-(_CMO_N - 1), 0)
    s = d.select(
        "series",
        "day_s",
        "rn",
        F.sum(F.greatest(F.col("delta"), F.lit(0))).over(wv).alias("up"),
        F.sum(F.greatest(-F.col("delta"), F.lit(0))).over(wv).alias("down"),
    )
    tot = F.col("up") + F.col("down")
    return s.filter(F.col("rn") >= _CMO_N + 1).select(
        "series",
        "day_s",
        F.col("up").alias("up_cents"),
        F.col("down").alias("down_cents"),
        F.when(tot > 0, F.round(100.0 * (F.col("up") - F.col("down")) / tot, 6)).alias("cmo"),
    )


# ---------------------------------------------------------------------------
# B119 ts_accumulation_distribution — Chaikin ADL

@register(
    "ts_accumulation_distribution",
    family="timeseries",
    doc="Accumulation/Distribution Line (B119, Marc Chaikin's "
    "public cumulative form; B107's running cousin): per day the "
    "money-flow multiplier ((C-L)-(H-C))/(H-L) times volume, "
    "accumulated from the series start. The B107 exactness "
    "discipline: per-day MFV quantized to integer micro-units, the "
    "running total is an exact BIGINT window sum (summation order "
    "can never touch the hash), ONE descale at the output; flat "
    "days (H == L) contribute zero by the public convention. "
    "Day-grain per-series cumulative window — state bounded by "
    "calendar days, not event volume.",
    oracle=f"""
        WITH {_SQL_DAILY},
        mf AS (
            SELECT series, day_s, vol,
                   CASE WHEN hc > lc THEN
                       CAST(round(vol * (2*cc - hc - lc) * 1000000.0
                                  / (hc - lc)) AS BIGINT)
                   ELSE 0 END AS mfv_u
            FROM daily
        ),
        c AS (
            SELECT series, day_s,
                   CAST(sum(mfv_u) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS adl_u
            FROM mf
        ),
        s AS (
            SELECT series, day_s, adl_u,
                   lag(adl_u) OVER (
                       PARTITION BY series ORDER BY day_s) AS prev_u
            FROM c
        )
        SELECT series, day_s,
               round(adl_u / 1000000.0, 6) AS adl,
               adl_u > coalesce(prev_u, 0) AS accumulating
        FROM s
    """,
)
def ts_accumulation_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    mfv_u = F.when(
        F.col("hc") > F.col("lc"),
        F.round(
            F.col("vol")
            * (2 * F.col("cc") - F.col("hc") - F.col("lc"))
            * 1000000.0
            / (F.col("hc") - F.col("lc")),
            0,
        ).cast("long"),
    ).otherwise(F.lit(0))
    mf = daily.select("series", "day_s", mfv_u.alias("mfv_u"))
    c = mf.select(
        "series",
        "day_s",
        F.sum("mfv_u")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("adl_u"),
    )
    s = c.select(
        "series",
        "day_s",
        "adl_u",
        F.lag("adl_u").over(wo).alias("prev_u"),
    )
    return s.select(
        "series",
        "day_s",
        F.round(F.col("adl_u") / 1000000.0, 6).alias("adl"),
        (F.col("adl_u") > F.coalesce(F.col("prev_u"), F.lit(0))).alias(
            "accumulating"
        ),
    )


# ---------------------------------------------------------------------------
# B120 ts_mass_index — Donald Dorsey's range-expansion gauge

_MI_SPAN = 9       # EMA span for the range smoothing (classic 9)
_MI_WIN = 25       # bounded window for the adjust=true EWMA weights
_MI_SUM = 25       # ratio sum length (classic 25)


@register(
    "ts_mass_index",
    family="timeseries",
    doc="Mass Index (B120, Donald Dorsey's public range-expansion "
    "gauge): sum over 25 days of EMA9(H-L) / EMA9(EMA9(H-L)) — "
    "range expansion regardless of direction; the 'reversal bulge' "
    "fires above 27. Both EMAs are weight-normalized bounded-window "
    "EWMAs (the B83 MACD idiom: identical two-arg list_transform "
    "fold on both engines over a 25-deep window, adjust=true), the "
    "double-smoothed stage folds the FIRST stage's doubles, and the "
    "ratio sum is a plain 25-window sum of those — rounded once at "
    "the output. Emitted once the ratio window is full.",
    oracle=f"""
        WITH {_SQL_DAILY},
        arrs AS (
            SELECT series, day_s,
                   list(hc - lc) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_MI_WIN - 1} PRECEDING
                            AND CURRENT ROW) AS arr
            FROM daily
        ),
        e1 AS (
            SELECT series, day_s,
                   list_sum(list_transform(arr,
                       (v, i) -> v * pow(1.0 - 2.0/{_MI_SPAN + 1}.0,
                                         len(arr) - i))) /
                   list_sum(list_transform(arr,
                       (v, i) -> pow(1.0 - 2.0/{_MI_SPAN + 1}.0,
                                     len(arr) - i))) AS ema1
            FROM arrs
        ),
        e2 AS (
            SELECT series, day_s, ema1,
                   list(ema1) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_MI_WIN - 1} PRECEDING
                            AND CURRENT ROW) AS earr
            FROM e1
        ),
        ratio AS (
            SELECT series, day_s,
                   ema1 / (list_sum(list_transform(earr,
                       (v, i) -> v * pow(1.0 - 2.0/{_MI_SPAN + 1}.0,
                                         len(earr) - i))) /
                   list_sum(list_transform(earr,
                       (v, i) -> pow(1.0 - 2.0/{_MI_SPAN + 1}.0,
                                     len(earr) - i)))) AS r,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM e2
        )
        SELECT series, day_s,
               round(sum(r) OVER (
                   PARTITION BY series ORDER BY day_s
                   ROWS BETWEEN {_MI_SUM - 1} PRECEDING
                        AND CURRENT ROW), 6) AS mass_index
        FROM ratio QUALIFY rn >= {_MI_SUM}
    """,
)
def ts_mass_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    wlist = wo.rowsBetween(-(_MI_WIN - 1), 0)
    decay = 1.0 - 2.0 / (_MI_SPAN + 1)

    def ewma(arr_col):
        # (v, i) with DuckDB's 1-based i: weight decay^(len - i);
        # Spark's 0-based index k maps to i = k + 1
        n = F.size(arr_col)
        num = F.aggregate(
            F.zip_with(
                arr_col.cast("array<double>"),
                F.transform(
                    F.sequence(F.lit(1), n),
                    lambda i: F.pow(F.lit(decay), (n - i).cast("double")),
                ),
                lambda v, w_: v * w_,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        den = F.aggregate(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.pow(F.lit(decay), (n - i).cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return num / den

    arrs = daily.select(
        "series",
        "day_s",
        F.collect_list(F.col("hc") - F.col("lc")).over(wlist).alias("arr"),
    )
    e1 = arrs.select("series", "day_s", ewma(F.col("arr")).alias("ema1"))
    e2 = e1.select(
        "series",
        "day_s",
        "ema1",
        F.collect_list("ema1").over(wlist).alias("earr"),
    )
    ratio = e2.select(
        "series",
        "day_s",
        (F.col("ema1") / ewma(F.col("earr"))).alias("r"),
        F.row_number().over(wo).alias("rn"),
    )
    return ratio.select(
        "series",
        "day_s",
        F.round(
            F.sum("r").over(wo.rowsBetween(-(_MI_SUM - 1), 0)), 6
        ).alias("mass_index"),
        "rn",
    ).filter(F.col("rn") >= _MI_SUM).drop("rn")


# ---------------------------------------------------------------------------
# F53 text_lexical_richness — source-grain richness panel

@register(
    "text_lexical_richness",
    family="text",
    doc="Lexical-richness panel per SOURCE (F53; the corpus-grain "
    "complement of F50's per-doc Yule's K — the panel stylometry "
    "and corpus QA actually consult before mixing sources): "
    "Simpson's D (repeat-draw probability, exact integer sums "
    "sum c(c-1) / N(N-1)), Guiraud's R (V/sqrt(N)), Honore's H "
    "(100 ln(N) V / (V - V1), hapax-sensitive; all-hapax sources "
    "yield NULL), and Sichel's S (dis-legomena share V2/V). One "
    "(source, token) count reduce + one source reduce — "
    "vocabulary-grain, no doc-grain shuffle; each statistic does "
    "ONE double division.",
    oracle="""
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS t
            FROM documents
        ),
        tc AS (
            SELECT source, t, CAST(count(*) AS BIGINT) AS c
            FROM tok WHERE length(t) > 0 GROUP BY 1, 2
        ),
        s AS (
            SELECT source,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS v1,
                   CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS v2,
                   CAST(sum(c * (c - 1)) AS BIGINT) AS rep2
            FROM tc GROUP BY source
        )
        SELECT source, n_tokens, n_types, v1 AS hapax, v2 AS dis,
               round(CAST(rep2 AS DOUBLE)
                     / (n_tokens * (n_tokens - 1)), 6) AS simpson_d,
               round(n_types / sqrt(CAST(n_tokens AS DOUBLE)), 6)
                   AS guiraud_r,
               CASE WHEN n_types > v1 THEN
                   round(100.0 * ln(CAST(n_tokens AS DOUBLE)) * n_types
                         / (n_types - v1), 6)
               END AS honore_h,
               round(CAST(v2 AS DOUBLE) / n_types, 6) AS sichel_s
        FROM s
    """,
)
def text_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("t")
        )
        .filter(F.length("t") > 0)
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = tc.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("v1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("v2"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("rep2"),
    )
    n, v = F.col("n_tokens"), F.col("n_types")
    return s.select(
        "source",
        "n_tokens",
        "n_types",
        F.col("v1").alias("hapax"),
        F.col("v2").alias("dis"),
        F.round(F.col("rep2").cast("double") / (n * (n - 1)), 6).alias(
            "simpson_d"
        ),
        F.round(v / F.sqrt(n.cast("double")), 6).alias("guiraud_r"),
        F.when(
            v > F.col("v1"),
            F.round(
                100.0 * F.log(n.cast("double")) * v / (v - F.col("v1")), 6
            ),
        ).alias("honore_h"),
        F.round(F.col("v2").cast("double") / v, 6).alias("sichel_s"),
    )


# ---------------------------------------------------------------------------
# F54 text_msttr — mean segmental type-token ratio

_MSTTR_SEG = 25


@register(
    "text_msttr",
    family="text",
    doc="Mean Segmental Type-Token Ratio (F54, MSTTR-25 — the "
    "classic fix for raw TTR's length bias: cut each document's "
    "token stream into consecutive FULL 25-token segments, take "
    "each segment's type count, average): per doc the full-segment "
    "count, mean distinct-per-segment and MSTTR. Exact integers "
    "until the very end — MSTTR = sum(distinct_i) / (25 * "
    "n_segments) is ONE double division of integer sums, so "
    "per-segment TTR doubles are never averaged. Position comes "
    "from the FILTERED token sequence on both engines (posexplode "
    "vs 1-based list_transform index); docs shorter than one "
    "segment are excluded (MSTTR undefined).",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '),
                               x -> length(x) > 0) AS arr
            FROM documents
        ),
        pos AS (
            SELECT doc_id, u.p.t AS t,
                   CAST((u.p.i - 1) // {_MSTTR_SEG} AS BIGINT) AS seg,
                   len(arr) AS n_toks
            FROM toks,
                 unnest(list_transform(arr,
                     (x, i) -> struct_pack(t := x, i := i))) AS u(p)
        ),
        segs AS (
            SELECT doc_id, seg,
                   CAST(count(DISTINCT t) AS BIGINT) AS n_distinct
            FROM pos
            WHERE seg < n_toks // {_MSTTR_SEG}
            GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(sum(n_distinct) AS BIGINT) AS distinct_sum,
               round(CAST(sum(n_distinct) AS DOUBLE)
                     / ({_MSTTR_SEG} * count(*)), 6) AS msttr
        FROM segs GROUP BY doc_id
    """,
)
def text_msttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: F.length(x) > 0).alias(
            "arr"
        ),
    )
    pos = toks.select(
        "doc_id",
        F.size("arr").alias("n_toks"),
        F.posexplode("arr").alias("p", "t"),
    ).select(
        "doc_id",
        "t",
        (F.col("p") / _MSTTR_SEG).cast("long").alias("seg"),
        "n_toks",
    )
    segs = (
        pos.filter(
            F.col("seg") < (F.col("n_toks") / _MSTTR_SEG).cast("long")
        )
        .groupBy("doc_id", "seg")
        .agg(F.count_distinct("t").alias("n_distinct"))
    )
    return segs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("n_distinct").alias("distinct_sum"),
        F.round(
            F.sum("n_distinct").cast("double")
            / (_MSTTR_SEG * F.count(F.lit(1))),
            6,
        ).alias("msttr"),
    )


# ---------------------------------------------------------------------------
# E29 embedding_duplicate_audit — exact-duplicate vector audit

@register(
    "embedding_duplicate_audit",
    family="ann",
    doc="Exact-duplicate embedding audit per label (E29) — the "
    "vector-side sibling of D1: re-ingested or re-encoded items "
    "produce bit-identical vectors that inflate ANN indexes and "
    "poison contrastive batches, and the cheapest pre-index sweep "
    "is a hash-groupBy on the QUANTIZED vector (floor(x*1e6 + 0.5) "
    "per dim — the E7 engine-neutral quantizer, exact on every "
    "float input; no pairwise anything). Per label: vector count, "
    "distinct quantized keys, vectors carrying a duplicated key, "
    "and the largest duplicate group — group-by on the array key "
    "shuffles once on the key hash, the same plan at any corpus "
    "size.",
    oracle="""
        WITH q AS (
            SELECT label, vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))
                       AS qv
            FROM embeddings
        ),
        g AS (
            SELECT label, qv, CAST(count(*) AS BIGINT) AS c
            FROM q GROUP BY label, qv
        )
        SELECT CAST(label AS BIGINT) AS label,
               CAST(sum(c) AS BIGINT) AS n_vecs,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                   AS n_dup_vecs,
               CAST(max(c) AS BIGINT) AS max_group,
               round(CAST(count(*) AS DOUBLE) / sum(c), 6)
                   AS distinct_ratio
        FROM g GROUP BY label
    """,
)
def embedding_duplicate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qv = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * 1000000.0 + 0.5).cast("long"),
    )
    g = (
        emb.select(F.col("label").cast("long").alias("label"), qv.alias("qv"))
        .groupBy("label", "qv")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return g.groupBy("label").agg(
        F.sum("c").alias("n_vecs"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
            "n_dup_vecs"
        ),
        F.max("c").alias("max_group"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("c"), 6
        ).alias("distinct_ratio"),
    )


# ---------------------------------------------------------------------------
# A34 cdc_slot_retention_lag — replication-slot retention diagnostic

@register(
    "cdc_slot_retention_lag",
    family="cdc",
    doc="Replication-slot retention lag report (A34): the ops "
    "diagnostic behind the reference's offset tracking "
    "(spi/statestorage, A11) and keepalive/ack flow (J14, A29) — "
    "PostgreSQL retains WAL from the slot's confirmed_flush (the "
    "MINIMUM acked LSN across consumers), so ONE lagging table "
    "pins WAL for everyone. Each table's consumer is modeled as "
    "acked-through its ceil(0.9 n)-th event by LSN order "
    "(deterministic keyset position, exact integers); per table: "
    "head LSN, acked LSN, its own pending events, events the SLOT "
    "retains because of the laggard, and the laggard flag. "
    "Table-partitioned rank + a 1-row min-ack broadcast — no "
    "global window, no skew.",
    oracle="""
        WITH r AS (
            SELECT event_type, event_id,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        acked AS (
            SELECT event_type,
                   CAST(max(event_id) AS BIGINT) AS head_lsn,
                   CAST(max(CASE WHEN rn = (9 * n + 9) // 10
                            THEN event_id END) AS BIGINT) AS acked_lsn,
                   CAST(sum(CASE WHEN rn > (9 * n + 9) // 10
                            THEN 1 ELSE 0 END) AS BIGINT) AS pending
            FROM r GROUP BY event_type
        ),
        slot AS (SELECT min(acked_lsn) AS confirmed_flush FROM acked),
        ret AS (
            SELECT e.event_type, CAST(count(*) AS BIGINT) AS retained
            FROM events e, slot s
            WHERE e.event_id > s.confirmed_flush
            GROUP BY e.event_type
        )
        SELECT a.event_type AS source_table,
               a.head_lsn, a.acked_lsn, a.pending,
               CAST(s.confirmed_flush AS BIGINT) AS confirmed_flush,
               coalesce(r.retained, 0) AS retained_by_slot,
               a.acked_lsn = s.confirmed_flush AS is_laggard
        FROM acked a
        CROSS JOIN slot s
        LEFT JOIN ret r ON r.event_type = a.event_type
    """,
)
def cdc_slot_retention_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    wt = Window.partitionBy("event_type").orderBy("event_id")
    wn = Window.partitionBy("event_type")
    r = events.select(
        "event_type",
        "event_id",
        F.row_number().over(wt).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    target = ((9 * F.col("n") + 9) / 10).cast("long")
    acked = r.groupBy("event_type").agg(
        F.max("event_id").alias("head_lsn"),
        F.max(F.when(F.col("rn") == target, F.col("event_id"))).alias(
            "acked_lsn"
        ),
        F.sum(F.when(F.col("rn") > target, 1).otherwise(0)).alias(
            "pending"
        ),
    )
    slot = acked.agg(F.min("acked_lsn").alias("confirmed_flush"))
    ret = (
        events.crossJoin(F.broadcast(slot))
        .filter(F.col("event_id") > F.col("confirmed_flush"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("retained"))
    )
    return (
        acked.crossJoin(F.broadcast(slot))
        .join(F.broadcast(ret), "event_type", "left")
        .select(
            F.col("event_type").alias("source_table"),
            "head_lsn",
            "acked_lsn",
            "pending",
            "confirmed_flush",
            F.coalesce("retained", F.lit(0)).alias("retained_by_slot"),
            (F.col("acked_lsn") == F.col("confirmed_flush")).alias(
                "is_laggard"
            ),
        )
    )


# ---------------------------------------------------------------------------
# D28 dedup_url_canonical — URL canonicalization dedup

@register(
    "dedup_url_canonical",
    family="dedup",
    doc="URL canonicalization dedup (D28) — the step every "
    "web-crawl ingest (CommonCrawl-style) runs BEFORE content "
    "dedup: the same page arrives under case-mangled schemes/hosts, "
    "explicit default ports, utm_* tracking params, shuffled query "
    "order, fragments and trailing slashes. The parse side "
    "normalizes the messy string with pure codegen string algebra "
    "(lowercase scheme+host, strip :443, drop utm_*, sort remaining "
    "params, strip fragment and trailing slash) and keys the "
    "doc-grain dedup on the canonical form — a hash-groupBy, no "
    "pairwise anything. Synthesis mangles a per-doc URL from "
    "generating columns; the oracle re-derives the EXPECTED "
    "canonical form directly from those columns (G5 adjudication: "
    "a normalizer bug cannot cancel out), plus the per-doc mess "
    "flags and cluster size.",
    oracle="""
        WITH g AS (
            SELECT doc_id, source,
                   'https://cdn' || (doc_id % 5) || '.example.com/docs/'
                       || source || '/' || (doc_id % 10)
                       || '?ref=' || (doc_id % 3) || '&v=' || (doc_id % 2)
                       AS canon,
                   doc_id % 3 = 1 AS had_utm,
                   doc_id % 5 = 1 AS had_fragment,
                   doc_id % 5 = 0 AS had_port
            FROM documents
        ),
        c AS (
            SELECT canon, CAST(count(*) AS BIGINT) AS cluster_size,
                   CAST(min(doc_id) AS BIGINT) AS canonical_doc
            FROM g GROUP BY canon
        )
        SELECT g.doc_id, g.canon AS canonical_url,
               g.had_utm, g.had_fragment, g.had_port,
               c.cluster_size,
               g.doc_id = c.canonical_doc AS is_canonical
        FROM g JOIN c ON g.canon = c.canon
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    # -- synthesis: the messy URL, from generating columns only ------
    scheme = F.when(d % 2 == 0, "HTTPS").otherwise("https")
    host = F.concat(
        F.when(d % 3 == 0, "CDN").otherwise("cdn"),
        (d % 5).cast("string"),
        F.when(d % 3 == 0, ".Example.COM").otherwise(".example.com"),
    )
    port = F.when(d % 5 == 0, ":443").otherwise("")
    path = F.concat(
        F.lit("/docs/"), F.col("source"), F.lit("/"), (d % 10).cast("string"),
        F.when(d % 4 == 0, "/").otherwise(""),
    )
    p_ref = F.concat(F.lit("ref="), (d % 3).cast("string"))
    p_v = F.concat(F.lit("v="), (d % 2).cast("string"))
    p_utm = F.when(d % 3 == 1, F.lit("utm_source=feed"))
    params = F.when(
        d % 2 == 1, F.concat_ws("&", p_v, p_ref, p_utm)
    ).otherwise(F.concat_ws("&", p_ref, p_utm, p_v))
    frag = F.when(
        d % 5 == 1, F.concat(F.lit("#sec"), (d % 4).cast("string"))
    ).otherwise("")
    url = F.concat(
        scheme, F.lit("://"), host, port, path, F.lit("?"), params, frag
    )
    messy = docs.select("doc_id", url.alias("url"))

    # -- parse side: normalize from the STRING alone (shared with
    # the I41 streaming admission gate — operators/urls.py)
    from timescaledb_event_streamer_spark.operators.urls import (
        canonicalize_url,
    )

    cols = canonicalize_url(F.col("url"))
    parsed = messy.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )
    c = parsed.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.min("doc_id").alias("canonical_doc"),
    )
    return parsed.join(c, "canonical_url").select(
        "doc_id",
        "canonical_url",
        "had_utm",
        "had_fragment",
        "had_port",
        "cluster_size",
        (F.col("doc_id") == F.col("canonical_doc")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# B121 ts_rvi — Relative Vigor Index

_RVI_N = 10


@register(
    "ts_rvi",
    family="timeseries",
    doc="Relative Vigor Index (B121, John Ehlers' public "
    "formulation): conviction = where the close sits vs the open, "
    "normalized by range. Both the numerator (close-open) and "
    "denominator (high-low) take the symmetric (1,2,2,1)/6 FIR "
    "smoothing, then a 10-day sum of each; RVI = num/den. "
    "Exact-integer algebra throughout: daily open = arg_min(event) "
    "close = arg_max(event) in cents, the FIR numerators stay "
    "6x-scaled integers, both 10-day sums are BIGINTs and the 6s "
    "cancel — ONE double division, then the signal line is the "
    "same FIR over the RVI doubles written as one fixed-shape "
    "expression on both engines. Flat 10-day stretches (den sum 0) "
    "yield NULL.",
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
        fir AS (
            SELECT series, day_s,
                   row_number() OVER w AS rn,
                   (cc - oc) + 2*lag(cc - oc, 1) OVER w
                       + 2*lag(cc - oc, 2) OVER w
                       + lag(cc - oc, 3) OVER w AS num6,
                   (hc - lc) + 2*lag(hc - lc, 1) OVER w
                       + 2*lag(hc - lc, 2) OVER w
                       + lag(hc - lc, 3) OVER w AS den6
            FROM daily_o
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        sums AS (
            SELECT series, day_s, rn,
                   CAST(sum(num6) OVER v AS BIGINT) AS snum,
                   CAST(sum(den6) OVER v AS BIGINT) AS sden
            FROM fir WHERE rn >= 4
            WINDOW v AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_RVI_N - 1} PRECEDING
                              AND CURRENT ROW)
        ),
        rvi AS (
            SELECT series, day_s, rn,
                   CASE WHEN sden > 0 THEN
                       CAST(snum AS DOUBLE) / sden END AS r
            FROM sums WHERE rn >= {_RVI_N + 3}
        )
        SELECT series, day_s,
               round(r, 6) AS rvi,
               round((r + 2*lag(r, 1) OVER w + 2*lag(r, 2) OVER w
                      + lag(r, 3) OVER w) / 6.0, 6) AS signal
        FROM rvi
        WINDOW w AS (PARTITION BY series ORDER BY day_s)
        QUALIFY rn >= {_RVI_N + 6}
    """,
)
def ts_rvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

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
    co = F.col("cc") - F.col("oc")
    hl = F.col("hc") - F.col("lc")
    fir = daily.select(
        "series",
        "day_s",
        F.row_number().over(wo).alias("rn"),
        (
            co + 2 * F.lag(co, 1).over(wo) + 2 * F.lag(co, 2).over(wo)
            + F.lag(co, 3).over(wo)
        ).alias("num6"),
        (
            hl + 2 * F.lag(hl, 1).over(wo) + 2 * F.lag(hl, 2).over(wo)
            + F.lag(hl, 3).over(wo)
        ).alias("den6"),
    ).filter(F.col("rn") >= 4)
    wv = wo.rowsBetween(-(_RVI_N - 1), 0)
    sums = fir.select(
        "series",
        "day_s",
        "rn",
        F.sum("num6").over(wv).alias("snum"),
        F.sum("den6").over(wv).alias("sden"),
    ).filter(F.col("rn") >= _RVI_N + 3)
    rvi = sums.select(
        "series",
        "day_s",
        "rn",
        F.when(
            F.col("sden") > 0, F.col("snum").cast("double") / F.col("sden")
        ).alias("r"),
    )
    sig = (
        F.col("r")
        + 2 * F.lag("r", 1).over(wo)
        + 2 * F.lag("r", 2).over(wo)
        + F.lag("r", 3).over(wo)
    ) / 6.0
    return (
        rvi.select(
            "series",
            "day_s",
            "rn",
            F.round(F.col("r"), 6).alias("rvi"),
            F.round(sig, 6).alias("signal"),
        )
        .filter(F.col("rn") >= _RVI_N + 6)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# E30 ann_mutual_knn_audit — kNN-graph symmetry / hubness QA

_MKNN_K = 5


@register(
    "ann_mutual_knn_audit",
    family="ann",
    doc="Mutual-kNN and hubness audit per label (E30) — the graph-"
    "quality gate run BEFORE committing to a graph-routed ANN index "
    "(E25's navigable graph degrades exactly where edges are "
    "asymmetric and hub vectors concentrate in-degree; mutual-kNN "
    "rate and the in-degree tail are the two standard diagnostics). "
    "Composes D-on-E5: the SAME k=5 cosine kNN build, then edge "
    "symmetry via a self left-semi join on the reversed edge and "
    "in-degree via a dst-keyed reduce — label joined from the "
    "embeddings table (broadcast at certification SF, label-keyed "
    "equi-join at scale). Exact arithmetic: counts are BIGINTs, "
    "mutual_rate and mean_in_degree are single divisions.",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        p AS (
            SELECT a.vec_id AS src, b.vec_id AS dst,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
            FROM e a JOIN e b ON a.vec_id <> b.vec_id
        ),
        knn AS (
            SELECT src, dst FROM (
                SELECT src, dst,
                       row_number() OVER (
                           PARTITION BY src
                           ORDER BY cos_sim DESC, dst) AS rank
                FROM p) WHERE rank <= {_MKNN_K}
        ),
        mut AS (
            SELECT k.src, k.dst,
                   EXISTS (SELECT 1 FROM knn r
                           WHERE r.src = k.dst AND r.dst = k.src)
                       AS is_mutual
            FROM knn k
        ),
        per_src AS (
            SELECT e.label, m.src,
                   CAST(count(*) AS BIGINT) AS n_edges,
                   CAST(sum(CASE WHEN is_mutual THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_mutual
            FROM mut m JOIN e ON e.vec_id = m.src
            GROUP BY 1, 2
        ),
        indeg AS (
            SELECT e.label, m.dst,
                   CAST(count(*) AS BIGINT) AS deg
            FROM mut m JOIN e ON e.vec_id = m.dst
            GROUP BY 1, 2
        ),
        lab AS (
            SELECT label,
                   CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(sum(n_edges) AS BIGINT) AS n_edges,
                   CAST(sum(n_mutual) AS BIGINT) AS n_mutual
            FROM per_src GROUP BY label
        ),
        ind AS (
            SELECT label, CAST(max(deg) AS BIGINT) AS max_in_degree,
                   CAST(sum(deg) AS BIGINT) AS in_mass,
                   CAST(count(*) AS BIGINT) AS in_nodes
            FROM indeg GROUP BY label
        )
        SELECT CAST(l.label AS BIGINT) AS label,
               l.n_nodes, l.n_edges, l.n_mutual,
               round(CAST(l.n_mutual AS DOUBLE) / l.n_edges, 6)
                   AS mutual_rate,
               i.max_in_degree,
               round(CAST(i.in_mass AS DOUBLE) / i.in_nodes, 6)
                   AS mean_in_degree
        FROM lab l JOIN ind i ON l.label = i.label
    """,
)
def ann_mutual_knn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.plans.queries_ext import (
        ann_knn_graph,
    )

    edges = ann_knn_graph(spark, sf_dir).select("src", "dst")
    labels = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    mut = edges.join(rev, ["src", "dst"], "left_semi").select(
        "src", "dst", F.lit(True).alias("is_mutual")
    )
    marked = edges.join(mut.select("src", "dst", "is_mutual"), ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("is_mutual", F.lit(False)).alias("is_mutual")
    )
    per_src = (
        marked.join(
            F.broadcast(labels), marked["src"] == labels["vec_id"]
        )
        .groupBy("label", "src")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum(F.when(F.col("is_mutual"), 1).otherwise(0)).alias(
                "n_mutual"
            ),
        )
    )
    lab = per_src.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("n_edges").alias("n_edges"),
        F.sum("n_mutual").alias("n_mutual"),
    )
    indeg = (
        marked.join(
            F.broadcast(labels), marked["dst"] == labels["vec_id"]
        )
        .groupBy("label", "dst")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ind = indeg.groupBy("label").agg(
        F.max("deg").alias("max_in_degree"),
        F.sum("deg").alias("in_mass"),
        F.count(F.lit(1)).alias("in_nodes"),
    )
    return lab.join(ind, "label").select(
        "label",
        "n_nodes",
        "n_edges",
        "n_mutual",
        F.round(
            F.col("n_mutual").cast("double") / F.col("n_edges"), 6
        ).alias("mutual_rate"),
        "max_in_degree",
        F.round(
            F.col("in_mass").cast("double") / F.col("in_nodes"), 6
        ).alias("mean_in_degree"),
    )


# ---------------------------------------------------------------------------
# G19 media_container_router — mixed-lake sniff + route + probe

@register(
    "media_container_router",
    family="multimodal",
    doc="Mixed-media routing (G19) — the integration shape the whole "
    "G family exists for: ONE binary column carrying EIGHT container "
    "formats (PNG / WAV / GIF / JPEG / MP4 / MP3 / WebM / Ogg, "
    "disjoint "
    "residue classes), sniffed by magic bytes (sniff_format, pure "
    "codegen), routed to the MATCHING prober — fixed-offset header "
    "reads for PNG/WAV/GIF (G4), the segment walk for JPEG (G5), "
    "the box walk for MP4 (G18), the syncsafe/frame-table reads for "
    "MP3 (G20), the EBML vint walk for WebM (G21), the lacing-table "
    "hop for Ogg (G22) — and emitted as "
    "one unified media-grain row "
    "(container, width/height, duration_ms, codec). At 100 TB this "
    "is the scan that partitions a heterogeneous lake into decode "
    "fleets at projection cost; each prober touches only its own "
    "slice (filter pushes into the union branches). Oracle "
    "re-derives every field from generating columns per residue "
    "class, so a sniff OR probe bug cannot cancel out.",
    oracle="""
        WITH src AS (
            SELECT event_id, user_id, event_id % 8 AS route,
                   event_id % 3 AS fmt,
                   user_id % 2048 + 16 AS png_w,
                   CAST(floor(event_id / 3) AS BIGINT) % 2048 + 16 AS png_h,
                   event_id % 2 + 1 AS ch,
                   CASE user_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                        ELSE 44100 END AS rate,
                   (event_id % 100000 + 1000) * (event_id % 2 + 1) * 2
                       AS wav_data,
                   user_id % 4096 + 1 AS gif_w,
                   event_id % 4096 + 1 AS gif_h,
                   user_id % 4000 + 8 AS jpg_w,
                   event_id % 4000 + 8 AS jpg_h,
                   user_id % 1920 + 16 AS mp4_w,
                   event_id % 1080 + 16 AS mp4_h,
                   (event_id % 9000 + 1) * 100 AS dur,
                   CASE user_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
                        ELSE 90000 END AS ts
            FROM events
        )
        SELECT event_id AS media_id,
               CASE WHEN route <= 2 THEN
                        CASE fmt WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
                             ELSE 'gif' END
                    WHEN route = 3 THEN 'jpeg' WHEN route = 4 THEN 'mp4'
                    WHEN route = 5 THEN 'mp3'
                    WHEN route = 6 THEN
                         CASE WHEN event_id % 2 = 0 THEN 'webm'
                              ELSE 'matroska' END
                    ELSE 'ogg' END AS container,
               CASE WHEN route <= 2 AND fmt = 0 THEN png_w
                    WHEN route <= 2 AND fmt = 2 THEN gif_w
                    WHEN route = 3 THEN jpg_w
                    WHEN route = 4 THEN mp4_w
                    WHEN route = 6 THEN CAST(user_id % 1920 + 16 AS BIGINT)
               END AS width,
               CASE WHEN route <= 2 AND fmt = 0 THEN png_h
                    WHEN route <= 2 AND fmt = 2 THEN gif_h
                    WHEN route = 3 THEN jpg_h
                    WHEN route = 4 THEN mp4_h
                    WHEN route = 6 THEN CAST(event_id % 1080 + 16 AS BIGINT)
               END AS height,
               CASE WHEN route <= 2 AND fmt = 1 THEN
                        CAST(floor(wav_data * 1000 / (rate * ch * 2))
                            AS BIGINT)
                    WHEN route = 4 THEN
                        CAST(dur * 1000 // ts AS BIGINT) END AS duration_ms,
               CASE WHEN route <= 2 AND fmt = 1 THEN 'pcm16le'
                    WHEN route = 3 AND user_id % 2 = 1
                        THEN 'jpeg_progressive'
                    WHEN route = 3 THEN 'jpeg_baseline'
                    WHEN route = 4 AND event_id % 2 = 0 THEN 'avc1'
                    WHEN route = 4 THEN 'hev1'
                    WHEN route = 5 THEN 'mpeg1_layer3'
                    WHEN route = 6 AND event_id % 2 = 0 THEN 'V_VP8'
                    WHEN route = 6 THEN 'V_VP9'
                    WHEN route = 7 AND event_id % 2 = 0 THEN 'opus'
                    WHEN route = 7 THEN 'vorbis' END AS codec
        FROM src
    """,
)
def media_container_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.mp4_probe import (
        parse_mp4_headers,
        synthesize_mp4_headers,
    )
    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_jpeg_headers,
        parse_media_headers,
        sniff_format,
        synthesize_jpeg_headers,
        synthesize_media_headers,
    )

    from timescaledb_event_streamer_spark.operators.ebml_probe import (
        parse_ebml_headers,
        synthesize_ebml_headers,
    )
    from timescaledb_event_streamer_spark.operators.mp3_probe import (
        parse_mp3_headers,
        synthesize_mp3_headers,
    )
    from timescaledb_event_streamer_spark.operators.ogg_probe import (
        parse_ogg_headers,
        synthesize_ogg_headers,
    )

    ev = load(spark, sf_dir, "events")
    rid = F.col("event_id") % 8
    mixed = (
        synthesize_media_headers(ev.filter(rid <= 2))
        .unionByName(synthesize_jpeg_headers(ev.filter(rid == 3)))
        .unionByName(synthesize_mp4_headers(ev.filter(rid == 4)))
        .unionByName(synthesize_mp3_headers(ev.filter(rid == 5)))
        .unionByName(synthesize_ebml_headers(ev.filter(rid == 6)))
        .unionByName(synthesize_ogg_headers(ev.filter(rid == 7)))
    )

    # three probe branches filter this frame; persist or each branch
    # re-runs every synthesizer (3x the pipeline). In production the
    # mixed bytes are a parquet column and each branch is a
    # pushed-filter scan — the persist replaces exactly that reuse.
    sniffed = scoped_persist(
        mixed.select(
            "media_id", "payload", sniff_format(F.col("payload")).alias("c")
        ),
        "media_container_router.sniffed",
    )
    out_cols = ["media_id", "container", "width", "height", "duration_ms", "codec"]

    fixed = parse_media_headers(
        sniffed.filter(F.col("c").isin("png", "riff", "gif"))
    ).select(
        "media_id",
        "container",
        "width",
        "height",
        "duration_ms",
        F.when(F.col("container") == "wav", "pcm16le").alias("codec"),
    )
    jpeg = parse_jpeg_headers(sniffed.filter(F.col("c") == "jpeg")).select(
        "media_id",
        F.lit("jpeg").alias("container"),
        "width",
        "height",
        F.lit(None).cast("long").alias("duration_ms"),
        F.when(F.col("progressive"), "jpeg_progressive")
        .otherwise("jpeg_baseline")
        .alias("codec"),
    )
    mp4 = parse_mp4_headers(sniffed.filter(F.col("c") == "mp4")).select(
        "media_id",
        F.lit("mp4").alias("container"),
        "width",
        "height",
        "duration_ms",
        F.col("video_codec").alias("codec"),
    )
    mp3 = parse_mp3_headers(sniffed.filter(F.col("c") == "mp3")).select(
        "media_id",
        F.lit("mp3").alias("container"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.when(
            (F.col("mpeg_version") == 1) & (F.col("layer") == 3),
            "mpeg1_layer3",
        ).alias("codec"),
    )
    webm = parse_ebml_headers(sniffed.filter(F.col("c") == "webm")).select(
        "media_id",
        F.col("doc_type").alias("container"),
        "width",
        "height",
        F.lit(None).cast("long").alias("duration_ms"),
        F.col("video_codec").alias("codec"),
    )
    ogg = parse_ogg_headers(sniffed.filter(F.col("c") == "ogg")).select(
        "media_id",
        F.lit("ogg").alias("container"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.col("codec"),
    )
    return (
        fixed.select(out_cols)
        .unionByName(jpeg.select(out_cols))
        .unionByName(mp4.select(out_cols))
        .unionByName(mp3.select(out_cols))
        .unionByName(webm.select(out_cols))
        .unionByName(ogg.select(out_cols))
    )


# ---------------------------------------------------------------------------
# F55 corpus_temperature_mix — temperature-sampled source weights

_TEMP_ALPHAS = (0.3, 0.5, 0.7, 1.0)
_TEMP_BUDGET = 1_000_000  # tokens drawn per epoch at certification SF


@register(
    "corpus_temperature_mix",
    family="text",
    doc="Temperature-sampled source mixing (F55): the alpha-"
    "exponentiated weighting multilingual/multi-source LM pipelines "
    "use to keep small sources from vanishing (w_i proportional to "
    "p_i^alpha, the published XLM-R/mT5 recipe; alpha=1 is "
    "proportional sampling, alpha->0 uniform) — F18's mix planner "
    "generalized to a temperature sweep. Per (alpha, source): the "
    "sampled weight, tokens drawn from a fixed budget, and the "
    "effective epoch count over that source (the oversampling "
    "factor that predicts memorization risk). One source-grain "
    "token reduce + a 4-row literal alpha unfold over the tiny "
    "aggregate; pow/sums on doubles composed identically on both "
    "engines, rounded once.",
    oracle=f"""
        WITH tok AS (
            SELECT source,
                   CAST(sum(len(list_filter(string_split(text, ' '),
                        t -> length(t) > 0))) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        ),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM tok),
        a AS (SELECT unnest(ARRAY{list(_TEMP_ALPHAS)}) AS alpha),
        w AS (
            SELECT a.alpha, t.source, t.n_tokens,
                   pow(CAST(t.n_tokens AS DOUBLE) / x.total, a.alpha) AS raw
            FROM tok t CROSS JOIN tot x CROSS JOIN a
        ),
        z AS (
            SELECT alpha, CAST(sum(raw) AS DOUBLE) AS zsum
            FROM w GROUP BY alpha
        )
        SELECT w.alpha, w.source, w.n_tokens,
               round(w.raw / z.zsum, 6) AS weight,
               CAST(floor(w.raw / z.zsum * {_TEMP_BUDGET}) AS BIGINT)
                   AS tokens_drawn,
               round(w.raw / z.zsum * {_TEMP_BUDGET} / w.n_tokens, 6)
                   AS effective_epochs
        FROM w JOIN z ON w.alpha = z.alpha
    """,
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "source",
            F.size(
                F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
            ).cast("long").alias("nt"),
        )
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    tot = tok.agg(F.sum("n_tokens").alias("total"))
    alphas = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(float(al)) for al in _TEMP_ALPHAS])
        ).alias("alpha")
    )
    w = (
        tok.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(alphas))
        .select(
            "alpha",
            "source",
            "n_tokens",
            F.pow(
                F.col("n_tokens").cast("double") / F.col("total"),
                F.col("alpha"),
            ).alias("raw"),
        )
    )
    z = w.groupBy("alpha").agg(F.sum("raw").alias("zsum"))
    share = F.col("raw") / F.col("zsum")
    return w.join(F.broadcast(z), "alpha").select(
        "alpha",
        "source",
        "n_tokens",
        F.round(share, 6).alias("weight"),
        F.floor(share * _TEMP_BUDGET).cast("long").alias("tokens_drawn"),
        F.round(share * _TEMP_BUDGET / F.col("n_tokens"), 6).alias(
            "effective_epochs"
        ),
    )


# ---------------------------------------------------------------------------
# D29 dedup_modality_agreement — text-vs-embedding dedup cross-audit

#: cosine bands in integer micro-units (half-open, ordered)
_DMA_BANDS = ((-2_000_000, 0), (0, 100_000), (100_000, 200_000), (200_000, 2_000_000))


def _modality_agreement_oracle() -> str:
    """D12's md5-portable MinHash+LSH oracle (same _A/_B constants,
    same band-collision OR) extended with the embedding join: every
    candidate pair's cosine is quantized to integer micro-units
    BEFORE the band reduce so group sums are exact integers."""
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
    band_case = " ".join(
        f"WHEN cos_u >= {lo} AND cos_u < {hi} THEN 'c{lo // 100000}'"
        for lo, hi in _DMA_BANDS
    )
    return f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            WHERE len(string_split(text, ' ')) >= 5
        ),
        s0 AS (SELECT doc_id, unnest(range(len(toks) - 4)) AS i, toks FROM t),
        sh AS (
            SELECT doc_id,
                   ('0x' || substr(md5(array_to_string(toks[i + 1 : i + 5], ' ')), 1, 15))::BIGINT
                       % {_MERSENNE} AS h
            FROM s0
        ),
        sig AS (
            SELECT doc_id,
               {mins}
            FROM sh GROUP BY doc_id
        ),
        cand AS (
            SELECT a.doc_id AS ida, b.doc_id AS idb,
                   CAST({eqsum} AS BIGINT) AS agree
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE {band_conds}
        ),
        ev AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        pairs AS (
            SELECT c.agree,
                   CAST(floor(list_cosine_similarity(a.v, b.v)
                              * 1000000.0 + 0.5) AS BIGINT) AS cos_u
            FROM cand c
            JOIN ev a ON a.vec_id = c.ida
            JOIN ev b ON b.vec_id = c.idb
        )
        SELECT band, CAST(count(*) AS BIGINT) AS n_pairs,
               round(CAST(sum(agree) AS DOUBLE)
                     / count(*) / {MINHASH_PERMS}, 6)
                   AS mean_est_jaccard,
               round(CAST(min(agree) AS DOUBLE) / {MINHASH_PERMS}, 6)
                   AS min_est_jaccard,
               round(CAST(sum(cos_u) AS DOUBLE)
                     / count(*) / 1000000.0, 6) AS mean_cosine
        FROM (SELECT CASE {band_case} END AS band, agree, cos_u
              FROM pairs)
        GROUP BY band
    """


@register(
    "dedup_modality_agreement",
    family="dedup",
    doc="Cross-modality dedup agreement audit (D29): the MinHash "
    "near-dup signal (text shingles, D12's md5-portable pipeline) "
    "scored against embedding cosine on the SAME banded candidate "
    "pairs — the QA pass that quantifies dedup failure modes: "
    "template noise that shingle-matches but embeds apart shows up "
    "as a high-Jaccard band with a low cosine profile (paraphrase "
    "dups invisible to MinHash are D5/D6's job). Per COSINE band "
    "over the candidate pairs: pair count, the est-Jaccard profile "
    "(exact k/32 integer agreement sums) and mean cosine, every "
    "per-pair cosine quantized to integer micro-units BEFORE the "
    "band reduce (E22 discipline: group sums run on exact "
    "integers, summation order can never touch the hash). "
    "Candidates come from the banded LSH join — never all-pairs; "
    "doc_id==vec_id is the testdata's 1:1 alignment (the E26 "
    "adjudication).",
    oracle=_modality_agreement_oracle(),
)
def dedup_modality_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:

    from timescaledb_event_streamer_spark.operators.ann import dot, norm
    from timescaledb_event_streamer_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_PERMS,
        _MERSENNE,
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
        "dedup_modality_agreement.sig",
    )
    banded = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("b"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[bi * rows + ri].cast("string")
                                    for ri in range(rows)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(MINHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.b", "bb.bucket")
    a = banded.select(
        F.col("doc_id").alias("ida"), F.col("sig").alias("sa"), "b", "bucket"
    )
    bside = banded.select(
        F.col("doc_id").alias("idb"), F.col("sig").alias("sb"), "b", "bucket"
    )
    agree = F.aggregate(
        F.zip_with(
            F.col("sa"), F.col("sb"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    scored = (
        a.join(bside, ["b", "bucket"])
        .filter(F.col("ida") < F.col("idb"))
        .dropDuplicates(["ida", "idb"])
        .select("ida", "idb", agree.cast("long").alias("agree"))
    )
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ea = emb.select(
        F.col("vec_id").alias("ida"), F.col("v").alias("va"),
        norm(F.col("v")).alias("na"),
    )
    eb = emb.select(
        F.col("vec_id").alias("idb"), F.col("v").alias("vb"),
        norm(F.col("v")).alias("nb"),
    )
    pairs = (
        scored.join(ea, "ida")
        .join(eb, "idb")
        .select(
            "agree",
            F.floor(
                dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb"))
                * 1000000.0
                + 0.5
            ).cast("long").alias("cos_u"),
        )
    )
    band = None
    for lo, hi in _DMA_BANDS:
        cond = (F.col("cos_u") >= lo) & (F.col("cos_u") < hi)
        label = f"c{lo // 100000}"
        band = F.when(cond, label) if band is None else band.when(cond, label)
    return (
        pairs.select(band.alias("band"), "agree", "cos_u")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum("agree").cast("double")
                / F.count(F.lit(1))
                / MINHASH_PERMS,
                6,
            ).alias("mean_est_jaccard"),
            F.round(
                F.min("agree").cast("double") / MINHASH_PERMS, 6
            ).alias("min_est_jaccard"),
            F.round(
                F.sum("cos_u").cast("double") / F.count(F.lit(1)) / 1000000.0,
                6,
            ).alias("mean_cosine"),
        )
    )


# ---------------------------------------------------------------------------
# B122 ts_fisher_transform — Ehlers Fisher Transform

_FT_N = 10


@register(
    "ts_fisher_transform",
    family="timeseries",
    doc="Fisher Transform (B122, Ehlers' public formulation): "
    "normalize the midprice position inside its 10-day channel to "
    "(-1, 1), smooth RECURSIVELY (v = 0.66*(pos-0.5) + 0.67*v_prev, "
    "clamped to +-0.999 — the clamp makes this nonlinear, so no "
    "closed-form weighted fold exists), then fisher = 0.5*ln((1+v)/"
    "(1-v)) + 0.5*fisher_prev. The B101 recursion idiom: Spark "
    "folds the packed per-series day array (bounded by calendar "
    "days); the oracle is a genuine RECURSIVE CTE stepping rn+1 "
    "with the IDENTICAL expression shape, so the doubles track "
    "bit-for-bit; pos is an exact rational of integer 2x-scaled "
    "midprices; flat channels contribute pos = 0.5 (zero drive). "
    "Rounded once at the output.",
    oracle=f"""
        WITH RECURSIVE {_SQL_DAILY},
        ch AS (
            SELECT series, day_s,
                   hc + lc AS mid2,
                   max(hc + lc) OVER v AS hh2,
                   min(hc + lc) OVER v AS ll2,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
            WINDOW v AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_FT_N - 1} PRECEDING
                              AND CURRENT ROW)
        ),
        p AS (
            SELECT series, day_s, rn,
                   CASE WHEN hh2 > ll2 THEN
                       CAST(mid2 - ll2 AS DOUBLE) / (hh2 - ll2)
                   ELSE 0.5 END AS pos
            FROM ch WHERE rn >= {_FT_N}
        ),
        f AS (
            SELECT series, day_s, rn,
                   greatest(least(0.66 * (pos - 0.5) + 0.67 * 0.0,
                                  0.999), -0.999) AS v,
                   0.5 * ln((1.0 + greatest(least(
                       0.66 * (pos - 0.5) + 0.67 * 0.0, 0.999), -0.999))
                       / (1.0 - greatest(least(
                       0.66 * (pos - 0.5) + 0.67 * 0.0, 0.999), -0.999)))
                       + 0.5 * 0.0 AS fisher
            FROM p WHERE rn = {_FT_N}
            UNION ALL
            SELECT e.series, e.day_s, e.rn,
                   greatest(least(0.66 * (e.pos - 0.5) + 0.67 * f.v,
                                  0.999), -0.999),
                   0.5 * ln((1.0 + greatest(least(
                       0.66 * (e.pos - 0.5) + 0.67 * f.v, 0.999), -0.999))
                       / (1.0 - greatest(least(
                       0.66 * (e.pos - 0.5) + 0.67 * f.v, 0.999), -0.999)))
                       + 0.5 * f.fisher
            FROM p e JOIN f ON e.series = f.series AND e.rn = f.rn + 1
        )
        SELECT series, day_s,
               round(v, 6) AS value1,
               round(fisher, 6) AS fisher,
               fisher > 0 AS bullish
        FROM f
    """,
)
def ts_fisher_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("series").orderBy("day_s")
    wv = w.rowsBetween(-(_FT_N - 1), 0)
    mid2 = F.col("hc") + F.col("lc")
    ch = daily.select(
        "series",
        "day_s",
        mid2.alias("mid2"),
        F.max(mid2).over(wv).alias("hh2"),
        F.min(mid2).over(wv).alias("ll2"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") >= _FT_N)
    p = ch.select(
        "series",
        "day_s",
        F.when(
            F.col("hh2") > F.col("ll2"),
            (F.col("mid2") - F.col("ll2")).cast("double")
            / (F.col("hh2") - F.col("ll2")),
        )
        .otherwise(0.5)
        .alias("pos"),
    )
    packed = p.groupBy("series").agg(
        F.array_sort(F.collect_list(F.struct("day_s", "pos"))).alias("ds")
    )
    init = F.struct(
        F.array()
        .cast("array<struct<day_s:bigint,v:double,fisher:double>>")
        .alias("arr"),
        F.lit(0.0).alias("pv"),
        F.lit(0.0).alias("pf"),
    )

    def step(acc, x):
        v = F.greatest(
            F.least(
                0.66 * (x["pos"] - 0.5) + 0.67 * acc["pv"], F.lit(0.999)
            ),
            F.lit(-0.999),
        )
        fisher = 0.5 * F.log((1.0 + v) / (1.0 - v)) + 0.5 * acc["pf"]
        entry = F.struct(
            x["day_s"].alias("day_s"), v.alias("v"), fisher.alias("fisher")
        )
        return F.struct(
            F.concat(acc["arr"], F.array(entry)).alias("arr"),
            v.alias("pv"),
            fisher.alias("pf"),
        )

    folded = packed.select(
        "series",
        F.aggregate(F.col("ds"), init, step, lambda a: a["arr"]).alias("arr"),
    )
    x = folded.select("series", F.explode("arr").alias("x")).select(
        "series", "x.*"
    )
    return x.select(
        "series",
        "day_s",
        F.round(F.col("v"), 6).alias("value1"),
        F.round(F.col("fisher"), 6).alias("fisher"),
        (F.col("fisher") > 0).alias("bullish"),
    )


# ---------------------------------------------------------------------------
# D30 dedup_semdedup — embedding-cluster semantic dedup (SemDeDup)

_SDD_TAU = 0.45  # house D5 threshold family; paper uses ~0.95+ on
#                  real text embeddings — the synthetic corpus's
#                  cosine mass tops out near 0.51 (see D5)
_SDD_SEED_MOD = 64


@register(
    "dedup_semdedup",
    family="dedup",
    doc="SemDeDup (D30, Abbas et al. 2023, arXiv:2303.09540 — the "
    "published semantic-dedup recipe FineWeb-class pipelines run "
    "AFTER MinHash): cluster the embedding space (deterministic "
    "seeded centroids, vec_id %% 64 == 0 — the E11 oracle-portable "
    "discipline), then WITHIN each cluster mark cosine >= tau "
    "pairs and keep, per the paper's rule, the member with the "
    "LOWEST centroid similarity (keep the outlier, drop the "
    "redundant core). Greedy pairwise form: v drops iff a tau-"
    "partner u exists with (cent_sim(u), u) < (cent_sim(v), v) — "
    "no connected components needed, engine-identical because "
    "every cosine is rounded to 6dp BEFORE comparison. The scale "
    "story is the paper's own: pairwise work is bounded within "
    "clusters (k scales with corpus), never corpus^2; assignment "
    "is a broadcast-seed scan.",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        seeds AS (
            SELECT vec_id AS seed_id, v AS sv FROM e
            WHERE vec_id % {_SDD_SEED_MOD} = 0
        ),
        asg0 AS (
            SELECT e.vec_id, e.v, s.seed_id,
                   round(list_cosine_similarity(e.v, s.sv), 6) AS cs,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(e.v, s.sv), 6)
                                DESC, s.seed_id
                   ) AS rn
            FROM e CROSS JOIN seeds s
        ),
        asg AS (
            SELECT vec_id, v, seed_id AS cluster_id, cs AS cent_sim
            FROM asg0 WHERE rn = 1
        ),
        pairs AS (
            SELECT a.vec_id AS ida, b.vec_id AS idb,
                   a.cent_sim AS ca, b.cent_sim AS cb
            FROM asg a JOIN asg b
              ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id
            WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {_SDD_TAU}
        ),
        stats AS (
            SELECT ida AS vec_id,
                   CAST(count(*) AS BIGINT) AS n_dup_partners,
                   CAST(sum(CASE WHEN cb < ca
                                 OR (cb = ca AND idb < ida)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_better
            FROM pairs GROUP BY ida
        )
        SELECT a.vec_id, CAST(a.cluster_id AS BIGINT) AS cluster_id,
               a.cent_sim,
               coalesce(s.n_dup_partners, 0) AS n_dup_partners,
               coalesce(s.n_better, 0) = 0 AS kept
        FROM asg a LEFT JOIN stats s ON s.vec_id = a.vec_id
    """,
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.operators.ann import cosine

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = emb.filter(F.col("vec_id") % _SDD_SEED_MOD == 0).select(
        F.col("vec_id").alias("seed_id"), F.col("v").alias("sv")
    )
    cs = F.round(cosine(F.col("v"), F.col("sv")), 6)
    asg0 = emb.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "v",
        "seed_id",
        cs.alias("cs"),
        F.row_number()
        .over(
            Window.partitionBy("vec_id").orderBy(
                cs.desc(), F.col("seed_id")
            )
        )
        .alias("rn"),
    )

    # vector-grain (one row per vec) and referenced by BOTH pair
    # sides + the final join: persist or the broadcast-seed scan +
    # assignment window re-executes three times (measured 49x on the
    # sf1 step before this pin)
    asg = (
        asg0.filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "v",
            F.col("seed_id").alias("cluster_id"),
            F.col("cs").alias("cent_sim"),
        )
    )
    asg = scoped_persist(asg, "dedup_semdedup.asg")
    a = asg.select(
        F.col("vec_id").alias("ida"), F.col("v").alias("va"),
        F.col("cluster_id").alias("ca_id"), F.col("cent_sim").alias("ca"),
    )
    b = asg.select(
        F.col("vec_id").alias("idb"), F.col("v").alias("vb"),
        F.col("cluster_id").alias("cb_id"), F.col("cent_sim").alias("cb"),
    )
    pairs = (
        a.join(b, (F.col("ca_id") == F.col("cb_id")) & (F.col("ida") != F.col("idb")))
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= _SDD_TAU)
        .select("ida", "idb", "ca", "cb")
    )
    stats = pairs.groupBy("ida").agg(
        F.count(F.lit(1)).alias("n_dup_partners"),
        F.sum(
            F.when(
                (F.col("cb") < F.col("ca"))
                | ((F.col("cb") == F.col("ca")) & (F.col("idb") < F.col("ida"))),
                1,
            ).otherwise(0)
        ).alias("n_better"),
    )
    return (
        asg.join(stats, asg["vec_id"] == stats["ida"], "left")
        .select(
            "vec_id",
            F.col("cluster_id").cast("long").alias("cluster_id"),
            "cent_sim",
            F.coalesce("n_dup_partners", F.lit(0)).alias("n_dup_partners"),
            (F.coalesce("n_better", F.lit(0)) == 0).alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# B123 ts_elder_impulse — Elder Impulse System

_EI_EMA = 13
_EI_WIN = 30  # bounded window for the adjust=true EWMA weights


@register(
    "ts_elder_impulse",
    family="timeseries",
    doc="Elder Impulse System (B123, Alexander Elder's public "
    "composite): bar color = EMA(13) slope direction AND MACD-"
    "histogram direction — green when both rise (momentum + trend "
    "agree), red when both fall, blue otherwise. Composes the B83 "
    "idiom twice: the EMA and both MACD lines are weight-normalized "
    "bounded-window EWMAs over the SAME shared fold shape (two-arg "
    "list_transform both engines, identical order), directions "
    "compare each day's doubles against the previous day's — the "
    "comparisons are engine-identical because both sides compute "
    "the same chains; rounded once at the output.",
    oracle=f"""
        WITH {_SQL_DAILY},
        arrs AS (
            SELECT series, day_s,
                   list(cc) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_EI_WIN - 1} PRECEDING
                            AND CURRENT ROW) AS arr,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
        ),
        lines AS (
            SELECT series, day_s, rn,
                   list_sum(list_transform(arr,
                       (v, i) -> v * pow(1.0 - 2.0/{_EI_EMA + 1}.0,
                                         len(arr) - i))) /
                   list_sum(list_transform(arr,
                       (v, i) -> pow(1.0 - 2.0/{_EI_EMA + 1}.0,
                                     len(arr) - i))) AS ema13,
                   list_sum(list_transform(arr,
                       (v, i) -> v * pow(1.0 - 2.0/13.0,
                                         len(arr) - i))) /
                   list_sum(list_transform(arr,
                       (v, i) -> pow(1.0 - 2.0/13.0,
                                     len(arr) - i)))
                   - list_sum(list_transform(arr,
                       (v, i) -> v * pow(1.0 - 2.0/27.0,
                                         len(arr) - i))) /
                     list_sum(list_transform(arr,
                       (v, i) -> pow(1.0 - 2.0/27.0,
                                     len(arr) - i))) AS macd
            FROM arrs
        ),
        sig AS (
            SELECT series, day_s, rn, ema13, macd,
                   list(macd) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_EI_WIN - 1} PRECEDING
                            AND CURRENT ROW) AS marr
            FROM lines
        ),
        hist AS (
            SELECT series, day_s, rn, ema13,
                   macd - list_sum(list_transform(marr,
                       (v, i) -> v * pow(1.0 - 2.0/10.0,
                                         len(marr) - i))) /
                   list_sum(list_transform(marr,
                       (v, i) -> pow(1.0 - 2.0/10.0,
                                     len(marr) - i))) AS h
            FROM sig
        ),
        d AS (
            SELECT series, day_s, rn, ema13, h,
                   lag(ema13) OVER w AS pe,
                   lag(h) OVER w AS ph
            FROM hist
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        )
        SELECT series, day_s,
               round(ema13 / 100.0, 6) AS ema13,
               round(h / 100.0, 6) AS histogram,
               CASE WHEN ema13 > pe AND h > ph THEN 'green'
                    WHEN ema13 < pe AND h < ph THEN 'red'
                    ELSE 'blue' END AS impulse
        FROM d WHERE rn >= 2
    """,
)
def ts_elder_impulse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    wlist = wo.rowsBetween(-(_EI_WIN - 1), 0)

    def ewma(arr_col, span):
        decay = 1.0 - 2.0 / (span + 1)
        n = F.size(arr_col)
        w_arr = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.pow(F.lit(decay), (n - i).cast("double")),
        )
        num = F.aggregate(
            F.zip_with(
                arr_col.cast("array<double>"), w_arr, lambda v, w_: v * w_
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        den = F.aggregate(w_arr, F.lit(0.0), lambda acc, v: acc + v)
        return num / den

    arrs = daily.select(
        "series",
        "day_s",
        F.collect_list("cc").over(wlist).alias("arr"),
        F.row_number().over(wo).alias("rn"),
    )
    lines = arrs.select(
        "series",
        "day_s",
        "rn",
        ewma(F.col("arr"), _EI_EMA).alias("ema13"),
        (ewma(F.col("arr"), 12) - ewma(F.col("arr"), 26)).alias("macd"),
    )
    sig = lines.select(
        "series",
        "day_s",
        "rn",
        "ema13",
        "macd",
        F.collect_list("macd").over(wlist).alias("marr"),
    )
    hist = sig.select(
        "series",
        "day_s",
        "rn",
        "ema13",
        (F.col("macd") - ewma(F.col("marr"), 9)).alias("h"),
    )
    d = hist.select(
        "series",
        "day_s",
        "rn",
        "ema13",
        "h",
        F.lag("ema13").over(wo).alias("pe"),
        F.lag("h").over(wo).alias("ph"),
    )
    rising = (F.col("ema13") > F.col("pe")) & (F.col("h") > F.col("ph"))
    falling = (F.col("ema13") < F.col("pe")) & (F.col("h") < F.col("ph"))
    return d.filter(F.col("rn") >= 2).select(
        "series",
        "day_s",
        F.round(F.col("ema13") / 100.0, 6).alias("ema13"),
        F.round(F.col("h") / 100.0, 6).alias("histogram"),
        F.when(rising, "green").when(falling, "red").otherwise("blue").alias(
            "impulse"
        ),
    )


# ---------------------------------------------------------------------------
# D31 dedup_cascade_ledger — the staged dedup funnel

def _cascade_oracle() -> str:
    """Composes the D12 md5-MinHash CTE and the D30 SemDeDup CTEs
    with survivor chaining: each stage's candidates are the previous
    stage's survivors, exactly as a production cascade runs."""
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
        WITH exact_sur AS (
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        ),
        t AS (
            SELECT d.doc_id, string_split(d.text, ' ') AS toks
            FROM documents d JOIN exact_sur e ON e.doc_id = d.doc_id
            WHERE len(string_split(d.text, ' ')) >= 5
        ),
        s0 AS (SELECT doc_id, unnest(range(len(toks) - 4)) AS i, toks FROM t),
        sh AS (
            SELECT doc_id,
                   ('0x' || substr(md5(array_to_string(toks[i + 1 : i + 5], ' ')), 1, 15))::BIGINT
                       % {_MERSENNE} AS h
            FROM s0
        ),
        sig AS (
            SELECT doc_id,
               {mins}
            FROM sh GROUP BY doc_id
        ),
        mh_removed AS (
            SELECT DISTINCT b.doc_id
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE ({band_conds})
              AND ({eqsum}) / {MINHASH_PERMS}.0 >= 0.5
        ),
        mh_sur AS (
            SELECT e.doc_id FROM exact_sur e
            LEFT JOIN mh_removed r ON r.doc_id = e.doc_id
            WHERE r.doc_id IS NULL
        ),
        ev AS (
            SELECT m.doc_id AS vec_id, CAST(e.embedding AS DOUBLE[]) AS v
            FROM mh_sur m JOIN embeddings e ON e.vec_id = m.doc_id
        ),
        seeds AS (
            SELECT vec_id AS seed_id, CAST(embedding AS DOUBLE[]) AS sv
            FROM embeddings WHERE vec_id % {_SDD_SEED_MOD} = 0
        ),
        asg0 AS (
            SELECT ev.vec_id, ev.v, s.seed_id,
                   round(list_cosine_similarity(ev.v, s.sv), 6) AS cs,
                   row_number() OVER (
                       PARTITION BY ev.vec_id
                       ORDER BY round(list_cosine_similarity(ev.v, s.sv), 6)
                                DESC, s.seed_id
                   ) AS rn
            FROM ev CROSS JOIN seeds s
        ),
        asg AS (
            SELECT vec_id, v, seed_id AS cid, cs FROM asg0 WHERE rn = 1
        ),
        sem_removed AS (
            SELECT DISTINCT a.vec_id AS doc_id
            FROM asg a JOIN asg b
              ON a.cid = b.cid AND a.vec_id <> b.vec_id
            WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {_SDD_TAU}
              AND (b.cs < a.cs OR (b.cs = a.cs AND b.vec_id < a.vec_id))
        ),
        n AS (
            SELECT (SELECT count(*) FROM documents) AS n_docs,
                   (SELECT count(*) FROM exact_sur) AS n_exact,
                   (SELECT count(*) FROM mh_removed) AS n_mh_rm,
                   (SELECT count(*) FROM sem_removed) AS n_sem_rm
        )
        SELECT '1_exact' AS stage,
               CAST(n_docs AS BIGINT) AS n_in,
               CAST(n_docs - n_exact AS BIGINT) AS n_removed,
               CAST(n_exact AS BIGINT) AS n_out
        FROM n
        UNION ALL
        SELECT '2_near_minhash', CAST(n_exact AS BIGINT),
               CAST(n_mh_rm AS BIGINT),
               CAST(n_exact - n_mh_rm AS BIGINT)
        FROM n
        UNION ALL
        SELECT '3_semantic', CAST(n_exact - n_mh_rm AS BIGINT),
               CAST(n_sem_rm AS BIGINT),
               CAST(n_exact - n_mh_rm - n_sem_rm AS BIGINT)
        FROM n
    """


@register(
    "dedup_cascade_ledger",
    family="dedup",
    doc="Staged dedup funnel ledger (D31) — the D-family capstone, "
    "the cascade a production corpus actually runs, in order: "
    "exact text dedup (hash-groupBy, D1), MinHash near-dup on the "
    "exact survivors (D12's md5-portable banded pipeline at the "
    "0.5 threshold, greedy keep-min-id), then SemDeDup on the "
    "near-dup survivors (D30's seeded clusters + keep-the-outlier "
    "at tau). Each stage consumes ONLY the previous stage's "
    "survivors — removal counts chain, so n_out(i) == n_in(i+1) by "
    "construction (pinned in pytest). Output is the 3-row "
    "stage-grain ledger (n_in / n_removed / n_out); every stage's "
    "pair generation stays banded or cluster-bounded, and the "
    "ledger rows are 1-row aggregate cross joins (bounded "
    "broadcast).",
    oracle=_cascade_oracle(),
)
def dedup_cascade_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.operators.ann import cosine
    from timescaledb_event_streamer_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_PERMS,
        _MERSENNE,
        minhash_signatures,
    )

    docs = load(spark, sf_dir, "documents")
    exact_sur = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))

    rows = MINHASH_PERMS // MINHASH_BANDS
    md5_base = lambda s: (  # noqa: E731
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % _MERSENNE
    )
    mh_docs = (
        docs.join(exact_sur.select("doc_id"), "doc_id", "left_semi")
        .filter(F.size(F.split(F.col("text"), " ")) >= 5)
    )
    sig = scoped_persist(
        minhash_signatures(mh_docs, base_hash=md5_base),
        "dedup_cascade_ledger.sig",
    )
    banded = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("b"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[bi * rows + ri].cast("string")
                                    for ri in range(rows)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(MINHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.b", "bb.bucket")
    a = banded.select(
        F.col("doc_id").alias("ida"), F.col("sig").alias("sa"), "b", "bucket"
    )
    bside = banded.select(
        F.col("doc_id").alias("idb"), F.col("sig").alias("sb"), "b", "bucket"
    )
    agree = F.aggregate(
        F.zip_with(
            F.col("sa"), F.col("sb"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    mh_removed = (
        a.join(bside, ["b", "bucket"])
        .filter(F.col("ida") < F.col("idb"))
        .dropDuplicates(["ida", "idb"])
        .filter(agree / float(MINHASH_PERMS) >= 0.5)
        .select(F.col("idb").alias("doc_id"))
        .distinct()
    )
    mh_sur = exact_sur.select("doc_id").join(mh_removed, "doc_id", "left_anti")

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ev = mh_sur.join(emb, mh_sur["doc_id"] == emb["vec_id"]).select(
        "vec_id", "v"
    )
    seeds = emb.filter(F.col("vec_id") % _SDD_SEED_MOD == 0).select(
        F.col("vec_id").alias("seed_id"), F.col("v").alias("sv")
    )
    cs = F.round(cosine(F.col("v"), F.col("sv")), 6)
    asg = (
        ev.crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            "v",
            "seed_id",
            cs.alias("cs"),
            F.row_number()
            .over(
                Window.partitionBy("vec_id").orderBy(
                    cs.desc(), F.col("seed_id")
                )
            )
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("seed_id").alias("cid"), "cs")
    )
    asg = scoped_persist(asg, "dedup_cascade_ledger.asg")
    pa = asg.select(
        F.col("vec_id").alias("ida"), F.col("v").alias("va"),
        F.col("cid").alias("ca_id"), F.col("cs").alias("ca"),
    )
    pb = asg.select(
        F.col("vec_id").alias("idb"), F.col("v").alias("vb"),
        F.col("cid").alias("cb_id"), F.col("cs").alias("cb"),
    )
    sem_removed = (
        pa.join(
            pb,
            (F.col("ca_id") == F.col("cb_id")) & (F.col("ida") != F.col("idb")),
        )
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= _SDD_TAU)
        .filter(
            (F.col("cb") < F.col("ca"))
            | ((F.col("cb") == F.col("ca")) & (F.col("idb") < F.col("ida")))
        )
        .select(F.col("ida").alias("doc_id"))
        .distinct()
    )

    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    n_exact = exact_sur.agg(F.count(F.lit(1)).alias("n_exact"))
    n_mh = mh_removed.agg(F.count(F.lit(1)).alias("n_mh_rm"))
    n_sem = sem_removed.agg(F.count(F.lit(1)).alias("n_sem_rm"))
    n = (
        n_docs.crossJoin(F.broadcast(n_exact))
        .crossJoin(F.broadcast(n_mh))
        .crossJoin(F.broadcast(n_sem))
    )
    r1 = n.select(
        F.lit("1_exact").alias("stage"),
        F.col("n_docs").alias("n_in"),
        (F.col("n_docs") - F.col("n_exact")).alias("n_removed"),
        F.col("n_exact").alias("n_out"),
    )
    r2 = n.select(
        F.lit("2_near_minhash").alias("stage"),
        F.col("n_exact").alias("n_in"),
        F.col("n_mh_rm").alias("n_removed"),
        (F.col("n_exact") - F.col("n_mh_rm")).alias("n_out"),
    )
    r3 = n.select(
        F.lit("3_semantic").alias("stage"),
        (F.col("n_exact") - F.col("n_mh_rm")).alias("n_in"),
        F.col("n_sem_rm").alias("n_removed"),
        (F.col("n_exact") - F.col("n_mh_rm") - F.col("n_sem_rm")).alias(
            "n_out"
        ),
    )
    return r1.unionByName(r2).unionByName(r3)


# ---------------------------------------------------------------------------
# G20 media_mp3_probe — ID3v2 + MPEG frame-header probe

#: MPEG-1 Layer III bitrate table (kbps), index 1-14 (0/15 invalid)
_MP3_BITRATES = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)  # sample-rate index 0/1/2


@register(
    "media_mp3_probe",
    family="multimodal",
    doc="Decoder-free MP3 probe (G20): ID3v2 tag size via the "
    "SYNCSAFE 28-bit integer (4 bytes, high bit of each clear — the "
    "public id3.org layout), hop the tag, validate the MPEG frame "
    "sync (11 set bits) and read version/layer/bitrate/sample-rate "
    "from the first audio frame header with the public MPEG-1 "
    "Layer III tables — bitrate and frame length at projection "
    "cost, entropy-coded audio data untouched (decode stays "
    "ffmpeg-gated, the G18 posture). frame_bytes uses the standard "
    "144*bitrate/samplerate+padding formula on exact integers. "
    "Synthesis varies tag size / bitrate / rate / padding per row "
    "and exposes only bytes; the oracle re-derives every field "
    "from generating columns (G5 adjudication).",
    oracle=f"""
        WITH g AS (
            SELECT event_id, user_id,
                   event_id % 200 + 10 AS tag_sz,
                   event_id % 14 + 1 AS br_idx,
                   user_id % 3 AS sr_idx,
                   event_id % 2 AS pad
            FROM events
        )
        SELECT event_id AS media_id,
               TRUE AS is_mp3,
               CAST(tag_sz AS BIGINT) AS tag_bytes,
               1 AS mpeg_version,
               3 AS layer,
               CAST(CASE br_idx {' '.join(f'WHEN {i + 1} THEN {b}' for i, b in enumerate(_MP3_BITRATES))} END AS BIGINT) AS bitrate_kbps,
               CAST(CASE sr_idx {' '.join(f'WHEN {i} THEN {r}' for i, r in enumerate(_MP3_RATES))} END AS BIGINT) AS sample_rate,
               CAST(144000 * (CASE br_idx {' '.join(f'WHEN {i + 1} THEN {b}' for i, b in enumerate(_MP3_BITRATES))} END)
                    // (CASE sr_idx {' '.join(f'WHEN {i} THEN {r}' for i, r in enumerate(_MP3_RATES))} END)
                    + pad AS BIGINT) AS frame_bytes
        FROM g
    """,
)
def media_mp3_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.mp3_probe import (
        parse_mp3_headers,
        synthesize_mp3_headers,
    )

    return parse_mp3_headers(
        synthesize_mp3_headers(load(spark, sf_dir, "events"))
    )


# ---------------------------------------------------------------------------
# B124 ts_choppiness — Choppiness Index

_CHOP_N = 14


@register(
    "ts_choppiness",
    family="timeseries",
    doc="Choppiness Index (B124, E.W. Dreiss' public formulation): "
    "100 * log10(sum_TR(n) / (maxHigh - minLow)) / log10(n) over a "
    "14-day window — near 100 the market churns inside a static "
    "range (sum of true ranges dwarfs the net range), near 0 it "
    "trends. Exact integers feed ONE log-ratio: the TR sum (B82's "
    "integer true range) and the window's high/low extremes are "
    "BIGINTs, so both engines evaluate log10 on identical "
    "arguments; flat windows (zero net range) yield NULL. Day-grain "
    "per-series windows, rows once the window is full.",
    oracle=f"""
        WITH {_SQL_DAILY},
        tr AS (
            SELECT series, day_s, hc, lc,
                   greatest(
                       hc - lc,
                       abs(hc - lag(cc) OVER w),
                       abs(lc - lag(cc) OVER w)
                   ) AS tr_c,
                   row_number() OVER w AS rn
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        s AS (
            SELECT series, day_s, rn,
                   CAST(sum(tr_c) OVER v AS BIGINT) AS str_c,
                   CAST(max(hc) OVER v AS BIGINT) AS hh,
                   CAST(min(lc) OVER v AS BIGINT) AS ll
            FROM tr WHERE rn >= 2
            WINDOW v AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_CHOP_N - 1} PRECEDING
                              AND CURRENT ROW)
        )
        SELECT series, day_s, str_c AS tr_sum_cents,
               hh - ll AS range_cents,
               CASE WHEN hh > ll THEN
                   round(100.0 * log10(CAST(str_c AS DOUBLE) / (hh - ll))
                         / log10({_CHOP_N}.0), 6)
               END AS choppiness
        FROM s WHERE rn >= {_CHOP_N + 1}
    """,
)
def ts_choppiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    prev_c = F.lag("cc").over(wo)
    tr = daily.select(
        "series",
        "day_s",
        "hc",
        "lc",
        F.greatest(
            F.col("hc") - F.col("lc"),
            F.abs(F.col("hc") - prev_c),
            F.abs(F.col("lc") - prev_c),
        ).alias("tr_c"),
        F.row_number().over(wo).alias("rn"),
    ).filter(F.col("rn") >= 2)
    wv = wo.rowsBetween(-(_CHOP_N - 1), 0)
    s = tr.select(
        "series",
        "day_s",
        "rn",
        F.sum("tr_c").over(wv).alias("str_c"),
        F.max("hc").over(wv).alias("hh"),
        F.min("lc").over(wv).alias("ll"),
    )
    rng = F.col("hh") - F.col("ll")
    import math

    return s.filter(F.col("rn") >= _CHOP_N + 1).select(
        "series",
        "day_s",
        F.col("str_c").alias("tr_sum_cents"),
        rng.alias("range_cents"),
        F.when(
            rng > 0,
            F.round(
                100.0
                * F.log10(F.col("str_c").cast("double") / rng)
                / math.log10(_CHOP_N),
                6,
            ),
        ).alias("choppiness"),
    )


# ---------------------------------------------------------------------------
# G21 media_webm_probe — EBML/Matroska vint walk


@register(
    "media_webm_probe",
    family="multimodal",
    doc="Decoder-free WebM/Matroska probe (G21, operators/"
    "ebml_probe.py): the SECOND major video container after G18's "
    "ISO-BMFF — EBML (RFC 8794) frames every element with "
    "VARIABLE-LENGTH integers, so each walk step decodes an ID "
    "vint (1-4 bytes, leading-one length) and a size vint (1-8 "
    "bytes, value = parsed - 2^(7L)) before entering masters / "
    "skipping leaves; DocType, TimecodeScale, per-track type + "
    "CodecID (V_VP8/V_VP9/A_OPUS) and pixel geometry come out at "
    "projection cost with Cluster data untouched. Synthesis varies "
    "doctype/timescale/track count per row and encodes the Segment "
    "size as a 2-BYTE vint so multi-byte vint decoding is "
    "exercised, not just 0x80|n; the oracle re-derives every field "
    "from generating columns (G5 adjudication).",
    oracle="""
        SELECT event_id AS media_id,
               TRUE AS is_ebml,
               CASE WHEN event_id % 2 = 0 THEN 'webm'
                    ELSE 'matroska' END AS doc_type,
               CAST(CASE user_id % 3 WHEN 0 THEN 1000000
                    WHEN 1 THEN 500000 ELSE 2000000 END AS BIGINT)
                   AS timecode_scale,
               CAST(event_id % 2 + 1 AS BIGINT) AS n_tracks,
               CASE WHEN event_id % 2 = 0 THEN 'V_VP8'
                    ELSE 'V_VP9' END AS video_codec,
               CASE WHEN event_id % 2 = 1 THEN 'A_OPUS' END
                   AS audio_codec,
               CAST(user_id % 1920 + 16 AS BIGINT) AS width,
               CAST(event_id % 1080 + 16 AS BIGINT) AS height,
               CAST(CASE WHEN event_id % 2 = 0 THEN 13 ELSE 17 END
                   AS BIGINT) AS n_elements
        FROM events
    """,
)
def media_webm_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ebml_probe import (
        ebml_probe_roundtrip,
    )

    # fused single-seam form (r11): synthesize + vint-walk in one
    # Arrow pass — the payload bytes never cross the JVM boundary
    # (the G18 mp4_probe_roundtrip pattern). Row-identical to
    # parse_ebml_headers(synthesize_ebml_headers(events)); parity
    # pinned in tests/test_round11.py.
    return ebml_probe_roundtrip(load(spark, sf_dir, "events"))
