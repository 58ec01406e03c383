"""Round-10 registered queries.

Continues the SURVEY.md §2 build-out. Reference attributions sit on
each query's docstring; oracles follow the rules in
plans/queries_olap.py (aliases, HALF_UP rounding, BIGINT casts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.operators.ranking import global_row_number
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.plans.queries_llm import _SQL_JACCARD_CTES
from timescaledb_event_streamer_spark.plans.queries_round8b import _SQL_DAILY
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
        adpcm_pcm_roundtrip_stats,
    )

    # fused single-seam form (r11, the G15 rationale): row-identical
    # to adpcm_pcm_stats(synthesize_adpcm_pcm(events)), parity
    # pinned in tests/test_multimodal.py.
    events = load(spark, sf_dir, "events")
    return adpcm_pcm_roundtrip_stats(events)

# ---------------------------------------------------------------------------
# B105 ts_williams_r — Williams %R oscillator

_WR_N = 14


@register(
    "ts_williams_r",
    family="timeseries",
    doc="Williams %R (B105, the B72/B85 oscillator family): "
    "%R = -100 * (HH - C) / (HH - LL) over a 14-day channel on the "
    "exact integer-cents daily bars — the stochastic's mirror "
    "image, overbought above -20, oversold below -80. Integer "
    "window extrema, ONE double division at the end (the family's "
    "exactness discipline); flat channels (HH == LL) yield NULL "
    "instead of a division error. Day-grain per-series windows, "
    "rows emitted only once the window is full.",
    oracle=f"""
        WITH {_SQL_DAILY},
        ch AS (
            SELECT series, day_s, cc,
                   max(hc) OVER w AS hh,
                   min(lc) OVER w AS ll,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_WR_N - 1} PRECEDING
                              AND CURRENT ROW)
        )
        SELECT series, day_s,
               CAST(cc AS BIGINT) AS close_cents,
               CAST(hh AS BIGINT) AS hh_cents,
               CAST(ll AS BIGINT) AS ll_cents,
               CASE WHEN hh > ll THEN
                   round(-100.0 * (hh - cc) / (hh - ll), 6)
               END AS williams_r,
               CASE WHEN hh > ll AND -100.0*(hh-cc)/(hh-ll) > -20.0
                    THEN 'overbought'
                    WHEN hh > ll AND -100.0*(hh-cc)/(hh-ll) < -80.0
                    THEN 'oversold'
                    WHEN hh > ll THEN 'neutral'
               END AS zone
        FROM ch WHERE rn >= {_WR_N}
    """,
)
def ts_williams_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    w = wo.rowsBetween(-(_WR_N - 1), Window.currentRow)
    ch = daily.select(
        "series",
        "day_s",
        "cc",
        F.max("hc").over(w).alias("hh"),
        F.min("lc").over(w).alias("ll"),
        F.row_number().over(wo).alias("rn"),
    )
    wr = -100.0 * (F.col("hh") - F.col("cc")) / (F.col("hh") - F.col("ll"))
    open_ch = F.col("hh") > F.col("ll")
    return ch.filter(F.col("rn") >= _WR_N).select(
        "series",
        "day_s",
        F.col("cc").alias("close_cents"),
        F.col("hh").alias("hh_cents"),
        F.col("ll").alias("ll_cents"),
        F.when(open_ch, F.round(wr, 6)).alias("williams_r"),
        F.when(open_ch & (wr > -20.0), "overbought")
        .when(open_ch & (wr < -80.0), "oversold")
        .when(open_ch, "neutral")
        .alias("zone"),
    )


# ---------------------------------------------------------------------------
# B106 ts_vortex — Vortex indicator VI+/VI-

_VTX_N = 14


@register(
    "ts_vortex",
    family="timeseries",
    doc="Vortex indicator (B106, Botes & Siepman 2009 public "
    "formulation): VM+ = |high - prev_low|, VM- = |low - prev_high| "
    "capture upward/downward range transfer; VI+/- = 14-day VM sums "
    "over the 14-day True Range sum. All three window sums run on "
    "EXACT integers (cents), the two divisions happen once at the "
    "end — no double accumulates through a window (segment-tree "
    "summation order never touches the hash). Crossovers of VI+ "
    "over VI- flag trend changes.",
    oracle=f"""
        WITH {_SQL_DAILY},
        vm AS (
            SELECT series, day_s,
                   abs(hc - lag(lc) OVER wo) AS vm_plus,
                   abs(lc - lag(hc) OVER wo) AS vm_minus,
                   greatest(
                       hc - lc,
                       abs(hc - lag(cc) OVER wo),
                       abs(lc - lag(cc) OVER wo)
                   ) AS tr_c,
                   row_number() OVER wo AS rn
            FROM daily
            WINDOW wo AS (PARTITION BY series ORDER BY day_s)
        ),
        s AS (
            SELECT series, day_s, rn,
                   CAST(sum(vm_plus) OVER w AS BIGINT) AS svp,
                   CAST(sum(vm_minus) OVER w AS BIGINT) AS svm,
                   CAST(sum(tr_c) OVER w AS BIGINT) AS str
            FROM vm WHERE rn > 1
            WINDOW w AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_VTX_N - 1} PRECEDING
                              AND CURRENT ROW)
        )
        SELECT series, day_s, svp AS vm_plus_sum, svm AS vm_minus_sum,
               str AS tr_sum,
               CASE WHEN str > 0
                    THEN round(CAST(svp AS DOUBLE) / str, 6) END
                   AS vi_plus,
               CASE WHEN str > 0
                    THEN round(CAST(svm AS DOUBLE) / str, 6) END
                   AS vi_minus,
               CASE WHEN str > 0 THEN svp > svm END AS uptrend
        FROM s WHERE rn > {_VTX_N}
    """,
)
def ts_vortex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    prev_h, prev_l, prev_c = (
        F.lag("hc").over(wo),
        F.lag("lc").over(wo),
        F.lag("cc").over(wo),
    )
    vm = daily.select(
        "series",
        "day_s",
        F.abs(F.col("hc") - prev_l).alias("vm_plus"),
        F.abs(F.col("lc") - prev_h).alias("vm_minus"),
        F.greatest(
            F.col("hc") - F.col("lc"),
            F.abs(F.col("hc") - prev_c),
            F.abs(F.col("lc") - prev_c),
        ).alias("tr_c"),
        F.row_number().over(wo).alias("rn"),
    )
    w = wo.rowsBetween(-(_VTX_N - 1), Window.currentRow)
    s = vm.filter(F.col("rn") > 1).select(
        "series",
        "day_s",
        "rn",
        F.sum("vm_plus").over(w).alias("svp"),
        F.sum("vm_minus").over(w).alias("svm"),
        F.sum("tr_c").over(w).alias("str"),
    )
    pos = F.col("str") > 0
    return s.filter(F.col("rn") > _VTX_N).select(
        "series",
        "day_s",
        F.col("svp").alias("vm_plus_sum"),
        F.col("svm").alias("vm_minus_sum"),
        F.col("str").alias("tr_sum"),
        F.when(pos, F.round(F.col("svp").cast("double") / F.col("str"), 6)).alias("vi_plus"),
        F.when(pos, F.round(F.col("svm").cast("double") / F.col("str"), 6)).alias("vi_minus"),
        F.when(pos, F.col("svp") > F.col("svm")).alias("uptrend"),
    )


# ---------------------------------------------------------------------------
# B107 ts_chaikin_money_flow — volume-weighted accumulation pressure

_CMF_N = 20


@register(
    "ts_chaikin_money_flow",
    family="timeseries",
    doc="Chaikin Money Flow (B107): the money-flow multiplier "
    "((C-L)-(H-C))/(H-L) weights each day's volume by where the "
    "close sits in the range; CMF = 20-day sum of money-flow volume "
    "over 20-day volume. Exactness discipline: the per-day MFV is "
    "quantized to integer MICRO-units (round(vol*(2C-H-L)*1e6/"
    "(H-L))) so both window sums run on exact integers and the "
    "segment-tree summation order can never touch the hash; flat "
    "days (H == L) contribute zero MFV by the public convention. "
    "One double division at the end.",
    oracle=f"""
        WITH {_SQL_DAILY},
        mf AS (
            SELECT series, day_s, vol,
                   CASE WHEN hc > lc THEN
                       CAST(round(vol * (2*cc - hc - lc) * 1000000.0
                                  / (hc - lc)) AS BIGINT)
                   ELSE 0 END AS mfv_u,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
        ),
        s AS (
            SELECT series, day_s, rn,
                   CAST(sum(mfv_u) OVER w AS BIGINT) AS smfv,
                   CAST(sum(vol) OVER w AS BIGINT) AS svol
            FROM mf
            WINDOW w AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_CMF_N - 1} PRECEDING
                              AND CURRENT ROW)
        )
        SELECT series, day_s, smfv AS mfv_micro_sum, svol AS vol_sum,
               CASE WHEN svol > 0 THEN
                   round(CAST(smfv AS DOUBLE) / svol / 1000000.0, 6)
               END AS cmf,
               CASE WHEN svol > 0 THEN smfv > 0 END AS accumulating
        FROM s WHERE rn >= {_CMF_N}
    """,
)
def ts_chaikin_money_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    mf = daily.select(
        "series",
        "day_s",
        "vol",
        mfv_u.alias("mfv_u"),
        F.row_number().over(wo).alias("rn"),
    )
    w = wo.rowsBetween(-(_CMF_N - 1), Window.currentRow)
    s = mf.select(
        "series",
        "day_s",
        "rn",
        F.sum("mfv_u").over(w).alias("smfv"),
        F.sum("vol").over(w).alias("svol"),
    )
    pos = F.col("svol") > 0
    return s.filter(F.col("rn") >= _CMF_N).select(
        "series",
        "day_s",
        F.col("smfv").alias("mfv_micro_sum"),
        F.col("svol").alias("vol_sum"),
        F.when(
            pos,
            F.round(F.col("smfv").cast("double") / F.col("svol") / 1000000.0, 6),
        ).alias("cmf"),
        F.when(pos, F.col("smfv") > 0).alias("accumulating"),
    )


# ---------------------------------------------------------------------------
# B108 ts_money_flow_index — volume-weighted RSI

_MFI_N = 14


@register(
    "ts_money_flow_index",
    family="timeseries",
    doc="Money Flow Index (B108): typical price (H+L+C)/3 direction "
    "vs the previous day splits raw money flow (TP x volume) into "
    "positive/negative streams; MFI = 100 * pos / (pos + neg) over "
    "14 days — the volume-weighted RSI. The x3-scaled integer "
    "typical price (hc+lc+cc, no division) drives both the "
    "direction comparison and the flow product, so every window sum "
    "is exact integer; one double division at the end. Unchanged "
    "TP days contribute to neither stream (the public convention).",
    oracle=f"""
        WITH {_SQL_DAILY},
        tp AS (
            SELECT series, day_s, vol,
                   hc + lc + cc AS tp3,
                   lag(hc + lc + cc) OVER wo AS prev_tp3,
                   row_number() OVER wo AS rn
            FROM daily
            WINDOW wo AS (PARTITION BY series ORDER BY day_s)
        ),
        fl AS (
            SELECT series, day_s, rn,
                   CASE WHEN tp3 > prev_tp3 THEN tp3 * vol ELSE 0 END
                       AS pos_f,
                   CASE WHEN tp3 < prev_tp3 THEN tp3 * vol ELSE 0 END
                       AS neg_f
            FROM tp WHERE rn > 1
        ),
        s AS (
            SELECT series, day_s, rn,
                   CAST(sum(pos_f) OVER w AS BIGINT) AS spos,
                   CAST(sum(neg_f) OVER w AS BIGINT) AS sneg
            FROM fl
            WINDOW w AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_MFI_N - 1} PRECEDING
                              AND CURRENT ROW)
        )
        SELECT series, day_s, spos AS pos_flow, sneg AS neg_flow,
               CASE WHEN spos + sneg > 0 THEN
                   round(100.0 * spos / (spos + sneg), 6)
               END AS mfi,
               CASE WHEN spos + sneg > 0
                    THEN 100.0*spos/(spos+sneg) > 80.0 END
                   AS overbought,
               CASE WHEN spos + sneg > 0
                    THEN 100.0*spos/(spos+sneg) < 20.0 END
                   AS oversold
        FROM s WHERE rn > {_MFI_N}
    """,
)
def ts_money_flow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    tp3 = (F.col("hc") + F.col("lc") + F.col("cc")).alias("tp3")
    tp = daily.select(
        "series",
        "day_s",
        "vol",
        tp3,
        F.lag(F.col("hc") + F.col("lc") + F.col("cc")).over(wo).alias("prev_tp3"),
        F.row_number().over(wo).alias("rn"),
    )
    fl = tp.filter(F.col("rn") > 1).select(
        "series",
        "day_s",
        "rn",
        F.when(F.col("tp3") > F.col("prev_tp3"), F.col("tp3") * F.col("vol"))
        .otherwise(F.lit(0))
        .alias("pos_f"),
        F.when(F.col("tp3") < F.col("prev_tp3"), F.col("tp3") * F.col("vol"))
        .otherwise(F.lit(0))
        .alias("neg_f"),
    )
    w = wo.rowsBetween(-(_MFI_N - 1), Window.currentRow)
    s = fl.select(
        "series",
        "day_s",
        "rn",
        F.sum("pos_f").over(w).alias("spos"),
        F.sum("neg_f").over(w).alias("sneg"),
    )
    tot = F.col("spos") + F.col("sneg")
    mfi = 100.0 * F.col("spos") / tot
    return s.filter(F.col("rn") > _MFI_N).select(
        "series",
        "day_s",
        F.col("spos").alias("pos_flow"),
        F.col("sneg").alias("neg_flow"),
        F.when(tot > 0, F.round(mfi, 6)).alias("mfi"),
        F.when(tot > 0, mfi > 80.0).alias("overbought"),
        F.when(tot > 0, mfi < 20.0).alias("oversold"),
    )


# ---------------------------------------------------------------------------
# B109 ts_ulcer_index — downside-risk drawdown RMS

_UI_N = 14


@register(
    "ts_ulcer_index",
    family="timeseries",
    doc="Ulcer Index (B109, Peter Martin's public formulation): "
    "drawdown%% = 100 * (C - 14-day high close) / that high, Ulcer "
    "= sqrt(mean of squared drawdown%% over the same window) — the "
    "downside-risk complement of B74's max-drawdown. Exactness: "
    "the per-day drawdown is quantized to integer micro-percent "
    "(one rounded double->int per day), the window then sums exact "
    "SQUARED integers (fits BIGINT: (1e8)^2 x 14 < 2^63), and the "
    "final mean/sqrt/round chain runs once per row in identical "
    "op order on both engines.",
    oracle=f"""
        WITH {_SQL_DAILY},
        dd AS (
            SELECT series, day_s,
                   CAST(round(1000000.0 * 100.0
                              * (cc - max(cc) OVER w)
                              / max(cc) OVER w) AS BIGINT) AS dd_u,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_UI_N - 1} PRECEDING
                              AND CURRENT ROW)
        ),
        s AS (
            SELECT series, day_s, rn, dd_u,
                   CAST(sum(dd_u * dd_u) OVER w2 AS BIGINT) AS ssq
            FROM dd
            WINDOW w2 AS (PARTITION BY series ORDER BY day_s
                          ROWS BETWEEN {_UI_N - 1} PRECEDING
                               AND CURRENT ROW)
        )
        SELECT series, day_s,
               round(dd_u / 1000000.0, 6) AS drawdown_pct,
               round(sqrt(CAST(ssq AS DOUBLE) / {_UI_N})
                     / 1000000.0, 6) AS ulcer_index
        FROM s WHERE rn >= {_UI_N}
    """,
)
def ts_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    w = wo.rowsBetween(-(_UI_N - 1), Window.currentRow)
    maxc = F.max("cc").over(w)
    dd = daily.select(
        "series",
        "day_s",
        F.round(1000000.0 * 100.0 * (F.col("cc") - maxc) / maxc, 0)
        .cast("long")
        .alias("dd_u"),
        F.row_number().over(wo).alias("rn"),
    )
    s = dd.select(
        "series",
        "day_s",
        "rn",
        "dd_u",
        F.sum(F.col("dd_u") * F.col("dd_u")).over(w).alias("ssq"),
    )
    return s.filter(F.col("rn") >= _UI_N).select(
        "series",
        "day_s",
        F.round(F.col("dd_u") / 1000000.0, 6).alias("drawdown_pct"),
        F.round(
            F.sqrt(F.col("ssq").cast("double") / _UI_N) / 1000000.0, 6
        ).alias("ulcer_index"),
    )


# ---------------------------------------------------------------------------
# D26 dedup_survivorship — canonical-doc election + savings ledger


@register(
    "dedup_survivorship",
    family="dedup",
    doc="Survivorship resolution (D26): the step AFTER clustering "
    "that a production dedup pipeline actually executes — for every "
    "near-dup cluster (D7's connected components over the "
    "jaccard>=0.3 pair graph), elect the canonical survivor "
    "(longest text, ties to the lowest doc_id — the deterministic "
    "keep-best rule) and emit the cluster-grain savings ledger: "
    "survivor identity/source, docs removed, chars kept vs removed. "
    "Pure composition of certified parts (shingle-bucketed pair "
    "join + min-label CC + one doc-grain metadata join); the ledger "
    "is what a 100 TB dedup run reports to its operator.",
    oracle=f"""
        WITH RECURSIVE
        {_SQL_JACCARD_CTES},
        dup AS (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.3),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM dup
            UNION SELECT doc_b, doc_a FROM dup
        ),
        reach(node, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.node = e.src
        ),
        cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
        members AS (
            SELECT cc.cluster_id, d.doc_id, d.source, d.n_chars,
                   row_number() OVER (
                       PARTITION BY cc.cluster_id
                       ORDER BY d.n_chars DESC, d.doc_id
                   ) AS rk
            FROM cc JOIN documents d ON cc.node = d.doc_id
        )
        SELECT cluster_id,
               CAST(count(*) AS BIGINT) AS cluster_size,
               max(CASE WHEN rk = 1 THEN doc_id END) AS survivor_doc_id,
               max(CASE WHEN rk = 1 THEN source END) AS survivor_source,
               CAST(count(*) - 1 AS BIGINT) AS n_removed,
               CAST(max(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT)
                   AS chars_kept,
               CAST(sum(CASE WHEN rk > 1 THEN n_chars ELSE 0 END)
                   AS BIGINT) AS chars_removed
        FROM members GROUP BY cluster_id
    """,
)
def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.dedup import (
        dedup_clusters,
    )
    from timescaledb_event_streamer_spark.plans.queries_llm import (
        shingle_pairs_jaccard,
    )

    docs = load(spark, sf_dir, "documents")
    eligible = docs.filter(F.size(F.split(F.col("text"), " ")) >= 5)
    pairs = shingle_pairs_jaccard(eligible).filter(F.col("jaccard") >= 0.3)
    cc = dedup_clusters(pairs)
    members = cc.join(
        docs.select("doc_id", "source", "n_chars"), "doc_id"
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                F.col("n_chars").desc(), "doc_id"
            )
        ),
    )
    first = lambda c: F.max(F.when(F.col("rk") == 1, F.col(c)))  # noqa: E731
    return members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        first("doc_id").alias("survivor_doc_id"),
        first("source").alias("survivor_source"),
        (F.count(F.lit(1)) - 1).alias("n_removed"),
        first("n_chars").alias("chars_kept"),
        F.sum(F.when(F.col("rk") > 1, F.col("n_chars")).otherwise(0)).alias(
            "chars_removed"
        ),
    )


# ---------------------------------------------------------------------------
# F49 text_burstiness — token dispersion audit


_BURST_MIN_DF = 10


@register(
    "text_burstiness",
    family="text",
    doc="Token burstiness (F49, Church & Gale's dispersion measure): "
    "variance-to-mean ratio of per-document counts over the WHOLE "
    "corpus (zeros included) — VMR 1 is Poisson scatter, far above "
    "1 marks topical/bursty tokens, the signal that separates "
    "content words from function words for stopword induction and "
    "quality heuristics. Exactness: vmr = (N*sumsq - tot^2) / "
    "(N*tot) keeps numerator and denominator exact integers (one "
    "doc-grain count reduce + one token-grain reduce + a single-row "
    "corpus-N broadcast); one double division at the end. Tokens "
    "with df >= 10 only, so the output is vocabulary-grain bounded.",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
        ),
        dc AS (
            SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
            FROM tok WHERE length(t) > 0 GROUP BY 1, 2
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        tk AS (
            SELECT t,
                   CAST(count(*) AS BIGINT) AS df,
                   CAST(sum(c) AS BIGINT) AS tot,
                   CAST(sum(c * c) AS BIGINT) AS sumsq
            FROM dc GROUP BY t
        )
        SELECT t AS token, df, tot AS total_count,
               round(CAST(n.n_docs * tk.sumsq - tk.tot * tk.tot AS DOUBLE)
                     / (n.n_docs * tk.tot), 6) AS vmr,
               (n.n_docs * tk.sumsq - tk.tot * tk.tot)
                   > 2 * n.n_docs * tk.tot AS bursty
        FROM tk, n WHERE df >= {_BURST_MIN_DF}
    """,
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    dc = (
        spread(docs)
        .select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.length("t") > 0)
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tk = dc.groupBy("t").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("tot"),
        F.sum(F.col("c") * F.col("c")).alias("sumsq"),
    )
    num = F.col("n_docs") * F.col("sumsq") - F.col("tot") * F.col("tot")
    return (
        tk.filter(F.col("df") >= _BURST_MIN_DF)
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("t").alias("token"),
            "df",
            F.col("tot").alias("total_count"),
            F.round(
                num.cast("double") / (F.col("n_docs") * F.col("tot")), 6
            ).alias("vmr"),
            (num > 2 * F.col("n_docs") * F.col("tot")).alias("bursty"),
        )
    )


# ---------------------------------------------------------------------------
# F50 text_yule_k — lexical-diversity characteristic


@register(
    "text_yule_k",
    family="text",
    doc="Yule's K characteristic (F50, the classic length-robust "
    "lexical-diversity statistic): K = 10^4 * (sum over types of "
    "c^2 - N) / N^2 per document — low K means rich vocabulary, "
    "high K means repetitive text; unlike raw TTR it barely drifts "
    "with document length, which is why stylometry and corpus QA "
    "use it. All integer sums per doc (one (doc, token) reduce + "
    "one doc reduce), one double division at the end; single-token "
    "docs (N = 1) yield NULL (K undefined at N^2 = sum c^2 = 1).",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
        ),
        dc AS (
            SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
            FROM tok WHERE length(t) > 0 GROUP BY 1, 2
        ),
        d AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(c * c) AS BIGINT) AS sum_c2
            FROM dc GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, n_types,
               CASE WHEN n_tokens > 1 THEN
                   round(10000.0 * (sum_c2 - n_tokens)
                         / (CAST(n_tokens AS DOUBLE) * n_tokens), 6)
               END AS yule_k
        FROM d
    """,
)
def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dc = (
        spread(docs)
        .select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.length("t") > 0)
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d = dc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.when(
            F.col("n_tokens") > 1,
            F.round(
                10000.0
                * (F.col("sum_c2") - F.col("n_tokens"))
                / (F.col("n_tokens").cast("double") * F.col("n_tokens")),
                6,
            ),
        ).alias("yule_k"),
    )


# ---------------------------------------------------------------------------
# B110 ts_elder_ray / B111 ts_force_index — EMA-anchored strength gauges

_ER_SPAN = 13
_ER_WIN = 40  # bounded EWMA window (B38/B83 precedent: > 3 time constants)


def _ewma_sql(arr: str, span: int) -> str:
    """The B83 weight-normalized bounded-window EWMA in DuckDB SQL."""
    d = 1.0 - 2.0 / (span + 1.0)
    return (
        f"list_sum(list_transform({arr}, (v, i) -> v * pow({d!r}, "
        f"len({arr}) - i))) / list_sum(list_transform({arr}, "
        f"(v, i) -> pow({d!r}, len({arr}) - i)))"
    )


def _ewma_arr(arr: str, span: int) -> F.Column:
    """The B83 EWMA fold (identical doubles both engines: Spark's
    0-based transform index vs DuckDB's 1-based shifts BOTH num and
    den by one extra power, which cancels)."""
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


@register(
    "ts_elder_ray",
    family="timeseries",
    doc="Elder-Ray bull/bear power (B110, Alexander Elder's public "
    "formulation): bull = high - EMA13(close), bear = low - "
    "EMA13(close) — how far the day's extremes push past the "
    "consensus trend line. The EMA is the B83 weight-normalized "
    "bounded-window form (identical fold both engines) over exact "
    "integer cents; output in dollars rounded 6.",
    oracle=f"""
        WITH {_SQL_DAILY},
        arrs AS (
            SELECT series, day_s, hc, lc,
                   list(cc) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_ER_WIN - 1} PRECEDING
                            AND CURRENT ROW
                   ) AS arr,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
        )
        SELECT series, day_s,
               round({_ewma_sql("arr", _ER_SPAN)} / 100.0, 6) AS ema13,
               round((hc - {_ewma_sql("arr", _ER_SPAN)}) / 100.0, 6)
                   AS bull_power,
               round((lc - {_ewma_sql("arr", _ER_SPAN)}) / 100.0, 6)
                   AS bear_power,
               hc - {_ewma_sql("arr", _ER_SPAN)} > 0
                   AND lc - {_ewma_sql("arr", _ER_SPAN)} > 0 AS bulls_own
        FROM arrs WHERE rn >= {_ER_SPAN}
    """,
)
def ts_elder_ray(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    w = wo.rowsBetween(-(_ER_WIN - 1), Window.currentRow)
    arrs = daily.select(
        "series",
        "day_s",
        "hc",
        "lc",
        F.collect_list(F.col("cc").cast("double")).over(w).alias("arr"),
        F.row_number().over(wo).alias("rn"),
    )
    ema = _ewma_arr("arr", _ER_SPAN)
    return arrs.filter(F.col("rn") >= _ER_SPAN).select(
        "series",
        "day_s",
        F.round(ema / 100.0, 6).alias("ema13"),
        F.round((F.col("hc") - ema) / 100.0, 6).alias("bull_power"),
        F.round((F.col("lc") - ema) / 100.0, 6).alias("bear_power"),
        ((F.col("hc") - ema > 0) & (F.col("lc") - ema > 0)).alias(
            "bulls_own"
        ),
    )


_FI_SPAN = 13


@register(
    "ts_force_index",
    family="timeseries",
    doc="Force Index (B111, Elder): raw force = (close - prev close) "
    "x volume — EXACT integer per day (cents x volume) — smoothed "
    "by the B83 bounded-window EMA13. The raw integer column rides "
    "along so the smoothing is auditable; output in dollar units "
    "rounded 6.",
    oracle=f"""
        WITH {_SQL_DAILY},
        fi AS (
            SELECT series, day_s,
                   (cc - lag(cc) OVER wo) * vol AS raw_fi,
                   row_number() OVER wo AS rn
            FROM daily
            WINDOW wo AS (PARTITION BY series ORDER BY day_s)
        ),
        arrs AS (
            SELECT series, day_s, raw_fi, rn,
                   list(CAST(raw_fi AS DOUBLE)) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_ER_WIN - 1} PRECEDING
                            AND CURRENT ROW
                   ) AS arr
            FROM fi WHERE rn > 1
        )
        SELECT series, day_s,
               CAST(raw_fi AS BIGINT) AS raw_force_cents,
               round({_ewma_sql("arr", _FI_SPAN)} / 100.0, 6)
                   AS force_index,
               {_ewma_sql("arr", _FI_SPAN)} > 0 AS buying_pressure
        FROM arrs WHERE rn > {_FI_SPAN}
    """,
)
def ts_force_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    fi = daily.select(
        "series",
        "day_s",
        ((F.col("cc") - F.lag("cc").over(wo)) * F.col("vol")).alias(
            "raw_fi"
        ),
        F.row_number().over(wo).alias("rn"),
    )
    w = wo.rowsBetween(-(_ER_WIN - 1), Window.currentRow)
    arrs = fi.filter(F.col("rn") > 1).select(
        "series",
        "day_s",
        "raw_fi",
        "rn",
        F.collect_list(F.col("raw_fi").cast("double")).over(w).alias("arr"),
    )
    ema = _ewma_arr("arr", _FI_SPAN)
    return arrs.filter(F.col("rn") > _FI_SPAN).select(
        "series",
        "day_s",
        F.col("raw_fi").alias("raw_force_cents"),
        F.round(ema / 100.0, 6).alias("force_index"),
        (ema > 0).alias("buying_pressure"),
    )


# ---------------------------------------------------------------------------
# B112 ts_parabolic_sar — Wilder's trailing stop-and-reverse

_SAR_AF = 0.02  # acceleration increment
_SAR_MAX_STEP = 10  # af cap = 10 * 0.02 = 0.2


@register(
    "ts_parabolic_sar",
    family="timeseries",
    doc="Parabolic SAR (B112, Wilder 1978, the full public recursion "
    "INCLUDING the two-bar clamp most simplified ports drop): "
    "sar' = sar + af*(ep - sar), clamped so a rising SAR never "
    "enters the prior two bars' range (least with lag(low,1), "
    "lag(low,2); mirrored with the lagged highs in a downtrend); "
    "reversal when the bar penetrates the clamped SAR (low < sar "
    "rising, high > sar falling) resets SAR to the old EP, EP to "
    "the penetrating extreme and af to 0.02; otherwise EP tracks "
    "the trend extreme and af steps by 0.02 (cap 0.2) only on a "
    "NEW extreme. af is carried as an INTEGER step count so the "
    "float recursion is one multiply-add per day in identical op "
    "order on both engines. Seed at the second bar: trend by close "
    "direction, SAR = prior bar's opposite extreme. Certified by a "
    "genuine recursive CTE carrying (trend, sar, ep, step); Spark "
    "side is the B80/B101 in-row fold.",
    oracle=f"""
        WITH RECURSIVE {_SQL_DAILY},
        b AS (
            SELECT series, day_s, hc, lc, cc,
                   lag(cc) OVER wo AS pc,
                   lag(lc, 1) OVER wo AS p1l,
                   lag(lc, 2) OVER wo AS p2l,
                   lag(hc, 1) OVER wo AS p1h,
                   lag(hc, 2) OVER wo AS p2h,
                   row_number() OVER wo AS rn
            FROM daily
            WINDOW wo AS (PARTITION BY series ORDER BY day_s)
        ),
        sar AS (
            SELECT series, rn,
                   CASE WHEN cc >= pc THEN 'up' ELSE 'down' END AS trend,
                   CASE WHEN cc >= pc THEN CAST(p1l AS DOUBLE)
                        ELSE CAST(p1h AS DOUBLE) END AS sar,
                   CASE WHEN cc >= pc THEN hc ELSE lc END AS ep,
                   1 AS stp,
                   false AS reversed
            FROM b WHERE rn = 2
            UNION ALL
            SELECT e.series, e.rn,
                   CASE WHEN s.trend = 'up' THEN
                       CASE WHEN e.lc < least(
                                s.sar + (s.stp * {_SAR_AF}) * (s.ep - s.sar),
                                e.p1l, e.p2l)
                            THEN 'down' ELSE 'up' END
                   ELSE
                       CASE WHEN e.hc > greatest(
                                s.sar + (s.stp * {_SAR_AF}) * (s.ep - s.sar),
                                e.p1h, e.p2h)
                            THEN 'up' ELSE 'down' END
                   END,
                   CASE WHEN s.trend = 'up' THEN
                       CASE WHEN e.lc < least(
                                s.sar + (s.stp * {_SAR_AF}) * (s.ep - s.sar),
                                e.p1l, e.p2l)
                            THEN CAST(s.ep AS DOUBLE)
                            ELSE least(
                                s.sar + (s.stp * {_SAR_AF}) * (s.ep - s.sar),
                                e.p1l, e.p2l) END
                   ELSE
                       CASE WHEN e.hc > greatest(
                                s.sar + (s.stp * {_SAR_AF}) * (s.ep - s.sar),
                                e.p1h, e.p2h)
                            THEN CAST(s.ep AS DOUBLE)
                            ELSE greatest(
                                s.sar + (s.stp * {_SAR_AF}) * (s.ep - s.sar),
                                e.p1h, e.p2h) END
                   END,
                   CASE WHEN s.trend = 'up' THEN
                       CASE WHEN e.lc < least(
                                s.sar + (s.stp * {_SAR_AF}) * (s.ep - s.sar),
                                e.p1l, e.p2l)
                            THEN e.lc ELSE greatest(s.ep, e.hc) END
                   ELSE
                       CASE WHEN e.hc > greatest(
                                s.sar + (s.stp * {_SAR_AF}) * (s.ep - s.sar),
                                e.p1h, e.p2h)
                            THEN e.hc ELSE least(s.ep, e.lc) END
                   END,
                   CASE WHEN s.trend = 'up' THEN
                       CASE WHEN e.lc < least(
                                s.sar + (s.stp * {_SAR_AF}) * (s.ep - s.sar),
                                e.p1l, e.p2l)
                            THEN 1
                            WHEN e.hc > s.ep
                            THEN least(s.stp + 1, {_SAR_MAX_STEP})
                            ELSE s.stp END
                   ELSE
                       CASE WHEN e.hc > greatest(
                                s.sar + (s.stp * {_SAR_AF}) * (s.ep - s.sar),
                                e.p1h, e.p2h)
                            THEN 1
                            WHEN e.lc < s.ep
                            THEN least(s.stp + 1, {_SAR_MAX_STEP})
                            ELSE s.stp END
                   END,
                   CASE WHEN s.trend = 'up' THEN
                       e.lc < least(
                           s.sar + (s.stp * {_SAR_AF}) * (s.ep - s.sar),
                           e.p1l, e.p2l)
                   ELSE
                       e.hc > greatest(
                           s.sar + (s.stp * {_SAR_AF}) * (s.ep - s.sar),
                           e.p1h, e.p2h)
                   END
            FROM b e JOIN sar s
              ON e.series = s.series AND e.rn = s.rn + 1
        )
        SELECT b.series, b.day_s,
               CAST(b.cc AS BIGINT) AS close_cents,
               round(sar.sar * 1000000.0, 0) / 1000000.0 AS sar_cents,
               sar.trend,
               CAST(sar.ep AS BIGINT) AS ep_cents,
               round(sar.stp * {_SAR_AF}, 6) AS af,
               sar.reversed
        FROM sar JOIN b ON sar.series = b.series AND sar.rn = b.rn
    """,
)
def ts_parabolic_sar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    b = daily.select(
        "series",
        "day_s",
        "hc",
        "lc",
        "cc",
        F.lag("cc").over(wo).alias("pc"),
        F.lag("lc", 1).over(wo).alias("p1l"),
        F.lag("lc", 2).over(wo).alias("p2l"),
        F.lag("hc", 1).over(wo).alias("p1h"),
        F.lag("hc", 2).over(wo).alias("p2h"),
        F.row_number().over(wo).alias("rn"),
    ).filter(F.col("rn") >= 2)
    packed = b.groupBy("series").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "day_s", "rn", "hc", "lc", "cc", "pc",
                    "p1l", "p2l", "p1h", "p2h",
                )
            )
        ).alias("ds")
    )
    init = F.struct(
        F.array()
        .cast(
            "array<struct<day_s:bigint,cc:bigint,sar:double,trend:string,"
            "ep:bigint,stp:int,reversed:boolean>>"
        )
        .alias("arr"),
        F.lit(None).cast("string").alias("trend"),
        F.lit(None).cast("double").alias("sar"),
        F.lit(None).cast("bigint").alias("ep"),
        F.lit(None).cast("int").alias("stp"),
    )
    af = F.lit(_SAR_AF)

    def step(acc, x):
        seeded = acc["trend"].isNull()
        raw = acc["sar"] + (acc["stp"] * af) * (acc["ep"] - acc["sar"])
        up_sar = F.least(raw, x["p1l"].cast("double"), x["p2l"].cast("double"))
        dn_sar = F.greatest(raw, x["p1h"].cast("double"), x["p2h"].cast("double"))
        up_rev = x["lc"] < up_sar
        dn_rev = x["hc"] > dn_sar
        trend = F.when(
            seeded, F.when(x["cc"] >= x["pc"], "up").otherwise("down")
        ).otherwise(
            F.when(
                acc["trend"] == "up",
                F.when(up_rev, "down").otherwise("up"),
            ).otherwise(F.when(dn_rev, "up").otherwise("down"))
        )
        sar = F.when(
            seeded,
            F.when(
                x["cc"] >= x["pc"], x["p1l"].cast("double")
            ).otherwise(x["p1h"].cast("double")),
        ).otherwise(
            F.when(
                acc["trend"] == "up",
                F.when(up_rev, acc["ep"].cast("double")).otherwise(up_sar),
            ).otherwise(
                F.when(dn_rev, acc["ep"].cast("double")).otherwise(dn_sar)
            )
        )
        ep = F.when(
            seeded, F.when(x["cc"] >= x["pc"], x["hc"]).otherwise(x["lc"])
        ).otherwise(
            F.when(
                acc["trend"] == "up",
                F.when(up_rev, x["lc"]).otherwise(
                    F.greatest(acc["ep"], x["hc"])
                ),
            ).otherwise(
                F.when(dn_rev, x["hc"]).otherwise(
                    F.least(acc["ep"], x["lc"])
                )
            )
        )
        stp = F.when(seeded, F.lit(1)).otherwise(
            F.when(
                acc["trend"] == "up",
                F.when(up_rev, F.lit(1))
                .when(
                    x["hc"] > acc["ep"],
                    F.least(acc["stp"] + 1, F.lit(_SAR_MAX_STEP)),
                )
                .otherwise(acc["stp"]),
            ).otherwise(
                F.when(dn_rev, F.lit(1))
                .when(
                    x["lc"] < acc["ep"],
                    F.least(acc["stp"] + 1, F.lit(_SAR_MAX_STEP)),
                )
                .otherwise(acc["stp"])
            )
        )
        reversed_ = F.when(seeded, F.lit(False)).otherwise(
            F.when(acc["trend"] == "up", up_rev).otherwise(dn_rev)
        )
        entry = F.struct(
            x["day_s"].alias("day_s"),
            x["cc"].alias("cc"),
            sar.alias("sar"),
            trend.alias("trend"),
            ep.alias("ep"),
            stp.cast("int").alias("stp"),
            reversed_.alias("reversed"),
        )
        return F.struct(
            F.concat(acc["arr"], F.array(entry)).alias("arr"),
            trend.alias("trend"),
            sar.alias("sar"),
            ep.alias("ep"),
            stp.cast("int").alias("stp"),
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
        F.col("cc").alias("close_cents"),
        (F.round(F.col("sar") * 1000000.0, 0) / 1000000.0).alias("sar_cents"),
        "trend",
        F.col("ep").alias("ep_cents"),
        F.round(F.col("stp") * af, 6).alias("af"),
        "reversed",
    )


# ---------------------------------------------------------------------------
# D27 dedup_bucket_skew_audit — banded-join shuffle-health metric


def _bucket_skew_oracle() -> str:
    """Per-band bucket-size distribution over the md5 MinHash
    signatures (D12's portable base): the oracle re-derives the
    32 permutations and groups each band's 4-row key independently,
    then aggregates the size distribution per band."""
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
    per_band = "\n            UNION ALL\n".join(
        f"""
            SELECT {bi} AS band,
                   CAST(count(*) AS BIGINT) AS bucket_size
            FROM sig
            GROUP BY {", ".join(f"mh{bi * rows + ri}" for ri in range(rows))}
        """
        for bi in range(MINHASH_BANDS)
    )
    return f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            WHERE len(string_split(text, ' ')) >= 5
        ),
        s0 AS (SELECT doc_id, unnest(range(len(toks) - 4)) AS i, toks FROM t),
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
        ),
        buckets AS (
            {per_band}
        )
        SELECT band,
               CAST(sum(bucket_size) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(max(bucket_size) AS BIGINT) AS max_bucket,
               CAST(sum(CASE WHEN bucket_size = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS singleton_buckets,
               CAST(sum(bucket_size * (bucket_size - 1) / 2) AS BIGINT)
                   AS candidate_pairs,
               round(CAST(max(bucket_size) AS DOUBLE)
                     * count(*) / sum(bucket_size), 6)
                   AS skew_factor
        FROM buckets GROUP BY band
    """


@register(
    "dedup_bucket_skew_audit",
    family="dedup",
    doc="Banded-LSH bucket-skew audit (D27) — the shuffle-health "
    "metric every banded dedup in this repo rides on: per band, the "
    "bucket-size distribution of the md5 MinHash signatures (D12's "
    "portable base) — bucket count, max bucket, singleton share, "
    "and the CANDIDATE-PAIR MASS sum(n*(n-1)/2), which is exactly "
    "the work the band self-join will shuffle. skew_factor = "
    "max_bucket / mean_bucket: near 1 means uniform hash keys (the "
    "scale claim made in operators/dedup.py), large means a hot "
    "bucket that needs a df-cap or salt BEFORE the join is run at "
    "100 TB. This is the audit you run on a new corpus before "
    "scheduling the dedup fleet; 8 output rows regardless of corpus "
    "size.",
    oracle=_bucket_skew_oracle(),
)
def dedup_bucket_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % _MERSENNE
    )
    sigs = minhash_signatures(docs, base_hash=md5_base)
    bands = sigs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", bi * rows + ri + 1).cast(
                                    "string"
                                )
                                for ri in range(rows)
                            ],
                        ).alias("key"),
                    )
                    for bi in range(MINHASH_BANDS)
                ]
            )
        ).alias("bb")
    ).select(F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    buckets = bands.groupBy("band", "key").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    return buckets.groupBy("band").agg(
        F.sum("bucket_size").alias("n_docs"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("bucket_size").alias("max_bucket"),
        F.sum(F.when(F.col("bucket_size") == 1, 1).otherwise(0)).alias(
            "singleton_buckets"
        ),
        F.sum(
            F.col("bucket_size") * (F.col("bucket_size") - 1) / 2
        )
        .cast("long")
        .alias("candidate_pairs"),
        F.round(
            F.max("bucket_size").cast("double")
            * F.count(F.lit(1))
            / F.sum("bucket_size"),
            6,
        ).alias("skew_factor"),
    )


# ---------------------------------------------------------------------------
# F51 text_vocab_concentration — top-k coverage curve

_VC_KS = (10, 50, 100, 500, 1000)


@register(
    "text_vocab_concentration",
    family="text",
    doc="Vocabulary concentration curve (F51): what fraction of all "
    "corpus tokens the top-k types cover, at k = 10/50/100/500/1000 "
    "— the complement of F40's Zipf fit (that estimates the "
    "exponent; this reports the actionable mass: how large a "
    "tokenizer vocab or stopword list must be to cover X%% of the "
    "stream). One (token)-grain count reduce; the top-max(k) types "
    "come out of a distributed sort + limit (TakeOrdered, never an "
    "unpartitioned window over the full vocabulary — the F35 "
    "shape), the cumulative sum runs over that <=1000-row metadata "
    "table, and total mass / type count come from a plain 1-row "
    "aggregate. Rank ties break on the token string so the "
    "cumulative sum is deterministic.",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS t FROM documents
        ),
        tc AS (
            SELECT t, CAST(count(*) AS BIGINT) AS c
            FROM tok WHERE length(t) > 0 GROUP BY t
        ),
        ranked AS (
            SELECT t, c,
                   row_number() OVER (ORDER BY c DESC, t) AS rk,
                   CAST(sum(c) OVER (ORDER BY c DESC, t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum,
                   CAST(sum(c) OVER () AS BIGINT) AS total,
                   CAST(count(*) OVER () AS BIGINT) AS n_types
            FROM tc
        ),
        ks AS (SELECT unnest(ARRAY{list(_VC_KS)}) AS k)
        SELECT k,
               max(r.n_types) AS n_types,
               CAST(max(CASE WHEN r.rk = least(k, r.n_types)
                        THEN r.cum END) AS BIGINT) AS tokens_covered,
               max(r.total) AS total_tokens,
               round(CAST(max(CASE WHEN r.rk = least(k, r.n_types)
                             THEN r.cum END) AS DOUBLE)
                     / max(r.total), 6) AS coverage
        FROM ks, ranked r GROUP BY k
    """,
)
def text_vocab_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tc = (
        spread(docs)
        .select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.length("t") > 0)
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # totals from a plain aggregate (1 row); top-max(k) types from a
    # distributed sort + limit — the vocabulary never funnels through
    # a single-partition window (F35 shape)
    tot = tc.agg(
        F.sum("c").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_types"),
    )
    top = tc.orderBy(F.col("c").desc(), "t").limit(max(_VC_KS))
    wr = Window.orderBy(F.col("c").desc(), "t")
    cum = top.select(
        F.row_number().over(wr).alias("rk"),
        F.sum("c")
        .over(wr.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    # one conditional aggregate per checkpoint over the <=1000
    # metadata rows, then stack() the single row out to checkpoint
    # grain — no per-k join against the vocabulary
    hit = lambda k: F.max(  # noqa: E731
        F.when(
            F.col("rk")
            == F.least(F.lit(k).cast("long"), F.col("n_types")),
            F.col("cum"),
        )
    )
    one = cum.crossJoin(F.broadcast(tot)).agg(
        F.max("n_types").alias("n_types"),
        F.max("total_tokens").alias("total_tokens"),
        *[hit(k).alias(f"cov_{k}") for k in _VC_KS],
    )
    stack = ", ".join(f"{k}, cov_{k}" for k in _VC_KS)
    return one.select(
        F.expr(
            f"stack({len(_VC_KS)}, {stack}) as (k, tokens_covered)"
        ),
        "n_types",
        "total_tokens",
    ).select(
        "k",
        "n_types",
        "tokens_covered",
        "total_tokens",
        F.round(
            F.col("tokens_covered").cast("double") / F.col("total_tokens"),
            6,
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# B113 ts_cci — Commodity Channel Index

_CCI_N = 20


@register(
    "ts_cci",
    family="timeseries",
    doc="Commodity Channel Index (B113, Lambert's public "
    "formulation): (TP - SMA20(TP)) / (0.015 x mean deviation). "
    "The window-inside-a-window (each row's deviations are measured "
    "against ITS OWN window's mean) is algebraized to stay exact "
    "integer: with tp3 = H+L+C (x3 scale, no division) and S = the "
    "window's tp3 sum, cci = 4000*(20*tp3 - S) / (3 * sum_i|20*"
    "tp3_i - S|) — numerator and the deviation sum are exact "
    "integers folded over the packed window array (list_transform/"
    "aggregate on both engines), ONE double division at the end. "
    "Zero-deviation (flat) windows yield NULL.",
    oracle=f"""
        WITH {_SQL_DAILY},
        tp AS (
            SELECT series, day_s, hc + lc + cc AS tp3,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
        ),
        arrs AS (
            SELECT series, day_s, tp3, rn,
                   list(tp3) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_CCI_N - 1} PRECEDING
                            AND CURRENT ROW
                   ) AS arr
            FROM tp
        ),
        s AS (
            SELECT series, day_s, tp3, rn,
                   CAST(list_sum(arr) AS BIGINT) AS stp,
                   CAST(list_sum(list_transform(arr,
                       x -> abs({_CCI_N} * x - list_sum(arr))))
                       AS BIGINT) AS dev
            FROM arrs
        )
        SELECT series, day_s,
               CAST(tp3 AS BIGINT) AS tp3_cents,
               stp AS tp3_sum,
               dev AS dev_sum,
               CASE WHEN dev > 0 THEN
                   round(4000.0 * ({_CCI_N} * tp3 - stp) / (3.0 * dev), 6)
               END AS cci
        FROM s WHERE rn >= {_CCI_N}
    """,
)
def ts_cci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    w = wo.rowsBetween(-(_CCI_N - 1), Window.currentRow)
    tp = daily.select(
        "series",
        "day_s",
        (F.col("hc") + F.col("lc") + F.col("cc")).alias("tp3"),
        F.row_number().over(wo).alias("rn"),
    )
    arrs = tp.withColumn("arr", F.collect_list("tp3").over(w))
    ssum = F.aggregate(
        F.col("arr"), F.lit(0).cast("long"), lambda a, x: a + x
    )
    s = arrs.select(
        "series",
        "day_s",
        "tp3",
        "rn",
        ssum.alias("stp"),
        F.aggregate(
            F.col("arr"),
            F.lit(0).cast("long"),
            lambda a, x: a + F.abs(F.lit(_CCI_N) * x - ssum),
        ).alias("dev"),
    )
    return s.filter(F.col("rn") >= _CCI_N).select(
        "series",
        "day_s",
        F.col("tp3").alias("tp3_cents"),
        F.col("stp").alias("tp3_sum"),
        F.col("dev").alias("dev_sum"),
        F.when(
            F.col("dev") > 0,
            F.round(
                4000.0 * (_CCI_N * F.col("tp3") - F.col("stp"))
                / (3.0 * F.col("dev")),
                6,
            ),
        ).alias("cci"),
    )


# ---------------------------------------------------------------------------
# B114 ts_dpo — detrended price oscillator

_DPO_N = 10  # the classic 20 halved to the one-month calendar (the
#   B104 precedent); displacement keeps the textbook n/2+1 rule
_DPO_SHIFT = _DPO_N // 2 + 1


@register(
    "ts_dpo",
    family="timeseries",
    doc="Detrended Price Oscillator (B114): close minus the 20-day "
    "SMA displaced back n/2+1 = 11 bars — removes the trend longer "
    "than the window so cycle length reads directly off the "
    "zero-crossings. dpo is kept exact: 20*cc - lagged window sum "
    "is an exact integer, divided once for the output (dollars, "
    "round 6); the zero-cross flag compares the integers so it can "
    "never disagree with the rounded value.",
    oracle=f"""
        WITH {_SQL_DAILY},
        s AS (
            SELECT series, day_s, cc,
                   lag(sma_sum, {_DPO_SHIFT}) OVER wo AS lag_sum,
                   row_number() OVER wo AS rn
            FROM (
                SELECT series, day_s, cc,
                       CAST(sum(cc) OVER (
                           PARTITION BY series ORDER BY day_s
                           ROWS BETWEEN {_DPO_N - 1} PRECEDING
                                AND CURRENT ROW
                       ) AS BIGINT) AS sma_sum
                FROM daily
            )
            WINDOW wo AS (PARTITION BY series ORDER BY day_s)
        ),
        d AS (
            SELECT series, day_s, cc, lag_sum,
                   {_DPO_N} * cc - lag_sum AS dpo_i,
                   lag({_DPO_N} * cc - lag_sum) OVER (
                       PARTITION BY series ORDER BY day_s) AS prev_dpo_i
            FROM s WHERE rn >= {_DPO_N + _DPO_SHIFT}
        )
        SELECT series, day_s,
               CAST(cc AS BIGINT) AS close_cents,
               round(dpo_i / ({_DPO_N} * 100.0), 6) AS dpo,
               coalesce((dpo_i > 0) <> (prev_dpo_i > 0), false)
                   AS zero_cross
        FROM d
    """,
)
def ts_dpo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    w = wo.rowsBetween(-(_DPO_N - 1), Window.currentRow)
    s = daily.select(
        "series",
        "day_s",
        "cc",
        F.lag(F.sum("cc").over(w), _DPO_SHIFT).over(wo).alias("lag_sum"),
        F.row_number().over(wo).alias("rn"),
    )
    dpo_i = _DPO_N * F.col("cc") - F.col("lag_sum")
    d = s.filter(F.col("rn") >= _DPO_N + _DPO_SHIFT).select(
        "series",
        "day_s",
        "cc",
        dpo_i.alias("dpo_i"),
        F.lag(dpo_i).over(wo).alias("prev_dpo_i"),
    )
    return d.select(
        "series",
        "day_s",
        F.col("cc").alias("close_cents"),
        F.round(F.col("dpo_i") / (_DPO_N * 100.0), 6).alias("dpo"),
        F.coalesce(
            (F.col("dpo_i") > 0) != (F.col("prev_dpo_i") > 0),
            F.lit(False),
        ).alias("zero_cross"),
    )


# ---------------------------------------------------------------------------
# B115 ts_trix — triple-EMA rate of change

_TRIX_SPAN = 15


@register(
    "ts_trix",
    family="timeseries",
    doc="TRIX (B115, Hutson's triple-smoothed momentum): EMA15 of "
    "EMA15 of EMA15 of close, then the one-day percent change x 100 "
    "(basis-point scale) — triple smoothing kills noise shorter "
    "than the span, the 1-day ROC restores direction. Three CHAINED "
    "B83 bounded-window weight-normalized EWMAs: each stage's value "
    "is a deterministic per-row double, so the next stage's window "
    "array collects identical values on both engines; signal flag = "
    "trix > 0.",
    oracle=f"""
        WITH {_SQL_DAILY},
        a1 AS (
            SELECT series, day_s,
                   list(CAST(cc AS DOUBLE)) OVER w AS arr,
                   row_number() OVER (
                       PARTITION BY series ORDER BY day_s) AS rn
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_ER_WIN - 1} PRECEDING
                              AND CURRENT ROW)
        ),
        e1 AS (
            SELECT series, day_s, rn,
                   {_ewma_sql("arr", _TRIX_SPAN)} AS v FROM a1
        ),
        a2 AS (
            SELECT series, day_s, rn,
                   list(v) OVER w AS arr
            FROM e1
            WINDOW w AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_ER_WIN - 1} PRECEDING
                              AND CURRENT ROW)
        ),
        e2 AS (
            SELECT series, day_s, rn,
                   {_ewma_sql("arr", _TRIX_SPAN)} AS v FROM a2
        ),
        a3 AS (
            SELECT series, day_s, rn,
                   list(v) OVER w AS arr
            FROM e2
            WINDOW w AS (PARTITION BY series ORDER BY day_s
                         ROWS BETWEEN {_ER_WIN - 1} PRECEDING
                              AND CURRENT ROW)
        ),
        e3 AS (
            SELECT series, day_s, rn,
                   {_ewma_sql("arr", _TRIX_SPAN)} AS v FROM a3
        ),
        t AS (
            SELECT series, day_s, rn, v,
                   lag(v) OVER (PARTITION BY series ORDER BY day_s)
                       AS pv
            FROM e3
        )
        SELECT series, day_s,
               round(v / 100.0, 6) AS ema3,
               round(10000.0 * (v - pv) / pv, 6) AS trix,
               10000.0 * (v - pv) / pv > 0.0 AS rising
        FROM t WHERE rn > {_TRIX_SPAN}
    """,
)
def ts_trix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.plans.queries_round8b import (
        _daily_ohlcv,
    )

    daily = _daily_ohlcv(spark, sf_dir)
    wo = Window.partitionBy("series").orderBy("day_s")
    w = wo.rowsBetween(-(_ER_WIN - 1), Window.currentRow)
    a1 = daily.select(
        "series",
        "day_s",
        F.collect_list(F.col("cc").cast("double")).over(w).alias("arr"),
        F.row_number().over(wo).alias("rn"),
    )
    e1 = a1.select(
        "series", "day_s", "rn", _ewma_arr("arr", _TRIX_SPAN).alias("v")
    )
    a2 = e1.select(
        "series", "day_s", "rn", F.collect_list("v").over(w).alias("arr")
    )
    e2 = a2.select(
        "series", "day_s", "rn", _ewma_arr("arr", _TRIX_SPAN).alias("v")
    )
    a3 = e2.select(
        "series", "day_s", "rn", F.collect_list("v").over(w).alias("arr")
    )
    e3 = a3.select(
        "series", "day_s", "rn", _ewma_arr("arr", _TRIX_SPAN).alias("v")
    )
    t = e3.select(
        "series", "day_s", "rn", "v", F.lag("v").over(wo).alias("pv")
    )
    trix = 10000.0 * (F.col("v") - F.col("pv")) / F.col("pv")
    return t.filter(F.col("rn") > _TRIX_SPAN).select(
        "series",
        "day_s",
        F.round(F.col("v") / 100.0, 6).alias("ema3"),
        F.round(trix, 6).alias("trix"),
        (trix > 0.0).alias("rising"),
    )


# ---------------------------------------------------------------------------
# E28 embedding_label_centroid_confusion — label-space quality audit

_LCC_Q = 1_000_000


@register(
    "embedding_label_centroid_confusion",
    family="ann",
    doc="Label-centroid confusion matrix (E28) — the embedding-"
    "quality audit run before trusting labels for supervised "
    "fine-tuning or stratified sampling: per-label centroids from "
    "EXACT integer per-dimension sums (the E18/E27 quantization "
    "discipline: round(v*1e6) BIGINT sums, ONE division to the "
    "double centroid — summation order can never touch the hash), "
    "then every vector routes to its nearest centroid by cosine "
    "(unrounded compare, label-asc ties) and the (true_label, "
    "nearest_label) matrix with row shares comes out. Fully "
    "distributed: dim-keyed partial sums (64 x labels rows), a "
    "label-count-sized broadcast for the scoring join (10 centroid "
    "rows), no driver collect. Diagonal mass = separability; "
    "off-diagonal cells name the confusable label pairs.",
    oracle=f"""
        WITH q AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        d AS (
            SELECT label, t.i AS pos,
                   CAST(round(v[t.i] * {_LCC_Q}) AS BIGINT) AS qv
            FROM q, range(1, 65) t(i)
        ),
        sums AS (
            SELECT label, pos,
                   CAST(sum(qv) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM d GROUP BY label, pos
        ),
        cent AS (
            SELECT label AS cand,
                   list(CAST(s AS DOUBLE) / n ORDER BY pos) AS c
            FROM sums GROUP BY label
        ),
        scored AS (
            SELECT q.vec_id, q.label AS true_label, cent.cand,
                   list_dot_product(q.v, cent.c)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(cent.c, cent.c))) AS cos
            FROM q CROSS JOIN cent
        ),
        nearest AS (
            SELECT vec_id, true_label, cand AS nearest_label
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY cos DESC, cand) AS rk
                FROM scored
            ) WHERE rk = 1
        ),
        m AS (
            SELECT true_label, nearest_label,
                   CAST(count(*) AS BIGINT) AS n
            FROM nearest GROUP BY 1, 2
        )
        SELECT true_label, nearest_label, n,
               round(CAST(n AS DOUBLE)
                     / sum(n) OVER (PARTITION BY true_label), 6)
                   AS row_share,
               true_label = nearest_label AS on_diagonal
        FROM m
    """,
)
def embedding_label_centroid_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ann import dot

    q = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    d = q.select(
        "label", F.posexplode("v").alias("pos0", "el")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("el") * _LCC_Q, 0).cast("long").alias("qv"),
    )
    sums = d.groupBy("label", "pos").agg(
        F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n")
    )
    cent = sums.groupBy(F.col("label").alias("cand")).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "pos", (F.col("s").cast("double") / F.col("n")).alias("val")
                    )
                )
            ),
            lambda st: st["val"],
        ).alias("c")
    )
    scored = q.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.col("label").alias("true_label"),
        "cand",
        (
            dot(F.col("v"), F.col("c"))
            / (
                F.sqrt(dot(F.col("v"), F.col("v")))
                * F.sqrt(dot(F.col("c"), F.col("c")))
            )
        ).alias("cos"),
    )
    wn = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), "cand")
    nearest = (
        scored.withColumn("rk", F.row_number().over(wn))
        .filter(F.col("rk") == 1)
        .select("true_label", F.col("cand").alias("nearest_label"))
    )
    m = nearest.groupBy("true_label", "nearest_label").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("true_label")
    return m.select(
        "true_label",
        "nearest_label",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 6).alias(
            "row_share"
        ),
        (F.col("true_label") == F.col("nearest_label")).alias(
            "on_diagonal"
        ),
    )


# ---------------------------------------------------------------------------
# F52 corpus_shard_planner — token-balanced output sharding

_SHARDS = 8


@register(
    "corpus_shard_planner",
    family="text",
    doc="Token-balanced shard plan (F52) — the write-side step of a "
    "training-data pipeline: assign every document to one of 8 "
    "output shards so shard token totals stay balanced (balanced "
    "shards = balanced downstream dataloader workers). Serpentine "
    "assignment over the token-count ranking (rank desc, doc_id "
    "ties; row k of each 8-row strip goes forward on even strips, "
    "backward on odd — the deterministic LPT-flavored rule that "
    "beats plain modulo on skewed sizes). Output is the 8-row "
    "shard ledger: doc/token counts, token share, and skew vs the "
    "ideal eighth — in production the assignment column feeds "
    "repartitionByRange/partitionBy on the write. The ranking is "
    "the TWO-PASS distributed rank (operators/ranking.py): "
    "repartitionByRange on (n_tokens desc, doc_id) -> per-partition "
    "row_number + broadcast partition-offset cumsum — never a "
    "single-partition window over doc-grain rows; identical rank "
    "algebra at any partition-bound placement because the order is "
    "total.",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(text, ' '),
                        t -> length(t) > 0)) AS BIGINT) AS n_tokens
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, n_tokens,
                   row_number() OVER (
                       ORDER BY n_tokens DESC, doc_id) - 1 AS rk
            FROM d
        ),
        assigned AS (
            SELECT doc_id, n_tokens,
                   CASE WHEN (rk // {_SHARDS}) % 2 = 0
                        THEN rk % {_SHARDS}
                        ELSE {_SHARDS - 1} - rk % {_SHARDS}
                   END AS shard
            FROM ranked
        ),
        s AS (
            SELECT shard,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
            FROM assigned GROUP BY shard
        )
        SELECT shard, n_docs, shard_tokens,
               round(CAST(shard_tokens AS DOUBLE)
                     / sum(shard_tokens) OVER (), 6) AS token_share,
               round(CAST(shard_tokens AS DOUBLE) * {_SHARDS}
                     / sum(shard_tokens) OVER (), 6) AS skew_vs_ideal
        FROM s
    """,
)
def corpus_shard_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    d = spread(docs).select(
        "doc_id",
        F.size(
            F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
        )
        .cast("long")
        .alias("n_tokens"),
    )
    ranked = global_row_number(
        d,
        [F.col("n_tokens").desc(), F.col("doc_id").asc()],
        col_name="rk",
        zero_based=True,
    ).select("doc_id", "n_tokens", "rk")
    strip = (F.col("rk") / _SHARDS).cast("long")
    fwd = F.col("rk") % _SHARDS
    assigned = ranked.select(
        "doc_id",
        "n_tokens",
        F.when(strip % 2 == 0, fwd)
        .otherwise(F.lit(_SHARDS - 1) - fwd)
        .alias("shard"),
    )
    s = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
    )
    wt = Window.partitionBy()
    tot = F.sum("shard_tokens").over(wt)
    return s.select(
        "shard",
        "n_docs",
        "shard_tokens",
        F.round(F.col("shard_tokens").cast("double") / tot, 6).alias(
            "token_share"
        ),
        F.round(
            F.col("shard_tokens").cast("double") * _SHARDS / tot, 6
        ).alias("skew_vs_ideal"),
    )
