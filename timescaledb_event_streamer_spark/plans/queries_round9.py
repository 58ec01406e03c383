"""Round-9 additions: Kaufman adaptive moving average (B97) and the
IVF-PQ nprobe tuning sweep (E24).

KAMA is the B80/ts_heikin_ashi shape — a genuinely recursive
per-series fold no window function expresses (each day's output
depends on the previous day's OUTPUT) — certified by a genuine
RECURSIVE CTE oracle walking rn = rn + 1. The nprobe sweep is E21's
recall-vs-scan curve re-run on the E14 seeded PQ index: the tuning
table a deployment needs before picking the 32x-compressed path.

Reference anchor: the hypertable/cagg analytics surface the streamer
feeds (SURVEY §1; `spi/schema/eventschema.go` is the events shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load
from timescaledb_event_streamer_spark.plans.queries_round8b import (
    _KER_N,
    _SQL_DAILY,
    _daily_ohlcv,
)

# ---------------------------------------------------------------------------
# B97 ts_kama — Kaufman adaptive moving average

#: KAMA constants (Kaufman 1995, public formulation): ER lookback
#: shares B89's window; smoothing constant interpolates between the
#: fast (2-period) and slow (30-period) EWMA alphas, squared.
_KAMA_FAST = 2.0 / 3.0  # 2/(2+1)
_KAMA_SLOW = 2.0 / 31.0  # 2/(30+1)


@register(
    "ts_kama",
    family="timeseries",
    doc="Kaufman adaptive moving average per series (B97): "
    "KAMA(t) = KAMA(t-1) + sc(t) * (price(t) - KAMA(t-1)) with "
    "sc = (ER * (fast - slow) + slow)^2 — B89's efficiency ratio "
    "driving a VARIABLE-alpha EWMA, so trending regimes track fast "
    "and choppy regimes smooth hard. The recursion depends on the "
    "previous day's OUTPUT, not its inputs (no window expresses it): "
    "Spark shape is the B80 fold — one day-grain reduce, ER via exact "
    "BIGINT lag/rolling-sum windows, then each series folds its own "
    "(day, price, er) array sequentially in-row (array length = "
    "calendar days per series, never event volume) and explodes "
    "back. Seeded KAMA = price at the first ER-computable day. The "
    "oracle is a genuine RECURSIVE CTE, so the hash certifies the "
    "recursion; both engines run identical left-assoc double "
    "expressions in identical day order.",
    oracle=f"""
        WITH RECURSIVE {_SQL_DAILY},
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
        ),
        er AS (
            SELECT series, day_s, rn, cc,
                   CASE WHEN noise > 0
                        THEN abs(cc - base) * 1.0 / noise
                        ELSE 0.0 END AS er
            FROM n WHERE rn > {_KER_N}
        ),
        kama AS (
            SELECT series, day_s, rn, cc, er,
                   CAST(cc AS DOUBLE) AS kama
            FROM er WHERE rn = {_KER_N + 1}
            UNION ALL
            SELECT e.series, e.day_s, e.rn, e.cc, e.er,
                   kama.kama
                       + ((e.er * ({_KAMA_FAST!r} - {_KAMA_SLOW!r})
                           + {_KAMA_SLOW!r})
                          * (e.er * ({_KAMA_FAST!r} - {_KAMA_SLOW!r})
                             + {_KAMA_SLOW!r}))
                         * (e.cc - kama.kama)
            FROM er e
            JOIN kama ON e.series = kama.series AND e.rn = kama.rn + 1
        )
        SELECT series, day_s,
               cc AS close_cents,
               round(er * 1000000.0, 0) / 1000000.0 AS efficiency_ratio,
               round(kama * 1000000.0, 0) / 1000000.0 AS kama_cents,
               cc > kama AS above_kama
        FROM kama
    """,
)
def ts_kama(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    er = n.filter(F.col("rn") > _KER_N).select(
        "series",
        "day_s",
        "cc",
        F.when(
            F.col("noise") > 0,
            F.abs(F.col("cc") - F.col("base")) / F.col("noise"),
        )
        .otherwise(F.lit(0.0))
        .alias("er"),
    )
    # pack each series' (day, price, er) into day order and fold the
    # recursion in-row — the B80 iterative-per-key shape
    packed = er.groupBy("series").agg(
        F.array_sort(F.collect_list(F.struct("day_s", "cc", "er"))).alias(
            "ds"
        )
    )
    init = F.struct(
        F.array()
        .cast(
            "array<struct<day_s:bigint,cc:bigint,er:double,kama:double>>"
        )
        .alias("arr"),
        F.lit(None).cast("double").alias("pk"),
    )

    def step(acc, x):
        sc = (
            x["er"] * F.lit(_KAMA_FAST - _KAMA_SLOW) + F.lit(_KAMA_SLOW)
        )
        kama = F.when(
            acc["pk"].isNull(), x["cc"].cast("double")
        ).otherwise(acc["pk"] + (sc * sc) * (x["cc"] - acc["pk"]))
        entry = F.struct(
            x["day_s"].alias("day_s"),
            x["cc"].alias("cc"),
            x["er"].alias("er"),
            kama.alias("kama"),
        )
        return F.struct(
            F.concat(acc["arr"], F.array(entry)).alias("arr"),
            kama.alias("pk"),
        )

    folded = packed.select(
        "series",
        F.aggregate(F.col("ds"), init, step, lambda a: a["arr"]).alias(
            "arr"
        ),
    )
    x = folded.select("series", F.explode("arr").alias("x")).select(
        "series", "x.*"
    )
    sc6 = lambda col: F.round(col * 1000000.0, 0) / 1000000.0  # noqa: E731
    return x.select(
        "series",
        "day_s",
        F.col("cc").alias("close_cents"),
        sc6(F.col("er")).alias("efficiency_ratio"),
        sc6(F.col("kama")).alias("kama_cents"),
        (F.col("cc") > F.col("kama")).alias("above_kama"),
    )


# ---------------------------------------------------------------------------
# E24 ann_ivfpq_nprobe_sweep — recall-vs-scan tuning curve on the
# seeded IVF-PQ index (E14's quantizers, E21's sweep shape)

_PQ_SWEEP_NPROBES = (1, 2, 4, 8)
_PQ_SWEEP_K = 10
_PQ_SWEEP_RERANK = 100
_PQ_STRIDE = 25
_PQ_CB_STRIDE = 31
_PQ_CB_K = 16
_PQ_M = 8
_PQ_QUERY = 1


def _pq_sweep_oracle() -> str:
    """E14's seeded-PQ SQL with the index build factored into shared
    CTEs (assignment + per-vector PQ codes computed ONCE) and one
    probe/ADC/rerank branch per nprobe — the amortized-build shape
    the Spark side persists."""
    base = """
        e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        eu AS (
            SELECT vec_id, v,
                   list_transform(v, x -> x / sqrt(
                       list_reduce(list_transform(v, y -> y * y),
                                   (a, b) -> a + b))) AS u
            FROM e
        ),
        cb AS (
            SELECT list(u ORDER BY vec_id) AS cbs
            FROM eu WHERE vec_id % {cbs} = 0 AND vec_id < {cbs} * {cbk}
        ),
        q AS (SELECT v AS qv, u AS qu FROM eu WHERE vec_id = {query}),
        adc AS (
            SELECT list_transform(range({m}), mm ->
                       list_transform(range({cbk}), j ->
                           list_reduce(list_transform(range(1, 9),
                               i -> q.qu[mm * 8 + i] * cb.cbs[j + 1][mm * 8 + i]),
                               (x, y) -> x + y))) AS adcl
            FROM q, cb
        ),
        seeds AS (
            SELECT vec_id AS seed_id, v AS sv FROM e
            WHERE vec_id % {stride} = 0 AND vec_id < {stride} * 100
        ),
        asg0 AS (
            SELECT eu.vec_id, eu.v, eu.u, s.seed_id,
                   row_number() OVER (
                       PARTITION BY eu.vec_id
                       ORDER BY round(list_cosine_similarity(eu.v, s.sv), 6)
                                DESC, s.seed_id
                   ) AS rn
            FROM eu CROSS JOIN seeds s
        ),
        codes AS (
            SELECT a.vec_id, a.v, a.seed_id,
                   list_transform(range({m}), mm ->
                       list_position(
                           list_transform(range({cbk}), j ->
                               list_reduce(list_transform(range(1, 9),
                                   i -> (a.u[mm * 8 + i]
                                         - cb.cbs[j + 1][mm * 8 + i])
                                      * (a.u[mm * 8 + i]
                                         - cb.cbs[j + 1][mm * 8 + i])),
                                   (x, y) -> x + y)),
                           list_min(list_transform(range({cbk}), j ->
                               list_reduce(list_transform(range(1, 9),
                                   i -> (a.u[mm * 8 + i]
                                         - cb.cbs[j + 1][mm * 8 + i])
                                      * (a.u[mm * 8 + i]
                                         - cb.cbs[j + 1][mm * 8 + i])),
                                   (x, y) -> x + y))))) AS code
            FROM (SELECT vec_id, v, u, seed_id FROM asg0 WHERE rn = 1) a, cb
        ),
        n AS (SELECT count(*) AS n_vecs FROM e WHERE vec_id <> {query}),
        exact AS (
            SELECT vec_id
            FROM e CROSS JOIN q
            WHERE vec_id <> {query}
            ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id
            LIMIT {k}
        )
    """.format(
        stride=_PQ_STRIDE, cbs=_PQ_CB_STRIDE, cbk=_PQ_CB_K, m=_PQ_M,
        query=_PQ_QUERY, k=_PQ_SWEEP_K,
    )
    branches = []
    for np_ in _PQ_SWEEP_NPROBES:
        branches.append(
            """
        SELECT {np} AS nprobe,
               (SELECT count(*) FROM codes c
                WHERE c.vec_id <> {query} AND c.seed_id IN (
                    SELECT seed_id FROM seeds CROSS JOIN q
                    ORDER BY round(list_cosine_similarity(sv, qv), 6) DESC,
                             seed_id
                    LIMIT {np})) AS n_candidates,
               (SELECT count(*) FROM (
                    SELECT vec_id
                    FROM (
                        SELECT c.vec_id, c.v,
                               round(list_reduce(
                                   list_transform(range({m}), mm ->
                                       adc.adcl[mm + 1][c.code[mm + 1]]),
                                   (x, y) -> x + y), 6) AS approx_dot
                        FROM codes c JOIN (
                            SELECT seed_id FROM seeds CROSS JOIN q
                            ORDER BY round(list_cosine_similarity(sv, qv), 6)
                                     DESC, seed_id
                            LIMIT {np}) p USING (seed_id), adc
                        WHERE c.vec_id <> {query}
                        ORDER BY approx_dot DESC, c.vec_id
                        LIMIT {rerank}
                    ) shortlist, q
                    ORDER BY round(list_cosine_similarity(shortlist.v, q.qv),
                                   6) DESC, vec_id
                    LIMIT {k}
                ) ap JOIN exact USING (vec_id)) / {k}.0 AS recall_at_k
            """.format(
                np=np_, query=_PQ_QUERY, k=_PQ_SWEEP_K, m=_PQ_M,
                rerank=_PQ_SWEEP_RERANK,
            )
        )
    body = " UNION ALL ".join(branches)
    return f"""
        WITH {base}
        SELECT s.nprobe, CAST(s.n_candidates AS BIGINT) AS n_candidates,
               round(s.n_candidates * 1000000.0 / n.n_vecs, 0) / 1000000.0
                   AS scan_fraction,
               s.recall_at_k
        FROM ({body}) s CROSS JOIN n
    """


@register(
    "ann_ivfpq_nprobe_sweep",
    family="ann",
    doc="IVF-PQ nprobe tuning sweep (E24): E21's recall-vs-scan curve "
    "re-run on E14's seeded product-quantization index — the tuning "
    "table a deployment reads before committing to the "
    "32x-compressed path. The BUILD (coarse assignment + per-vector "
    "PQ codes) is computed once and persisted, exactly how a real "
    "index amortizes; each sweep point then only re-probes "
    "(metadata), ADC-scores its candidate slice by table lookup, "
    "reranks the top-100 shortlist by exact cosine and reports "
    "candidates / scan fraction / recall@10 against the brute-force "
    "top-10. Every float reduction is a sequential left fold on both "
    "engines (the E14 bit-exactness discipline), so the PQ codes — "
    "and therefore every sweep number — hash-certify.",
    oracle=_pq_sweep_oracle(),
)
def ann_ivfpq_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark import StorageLevel

    from timescaledb_event_streamer_spark.operators.ann import cosine, dot

    sub_dim = 64 // _PQ_M
    emb = load(spark, sf_dir, "embeddings")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = emb.repartition(n_shuffle).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    eu = e.select(
        "vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("_n")
    ).select(
        "vec_id", "v",
        F.transform(F.col("v"), lambda x: x / F.col("_n")).alias("u"),
    )

    # --- metadata-sized quantizer collects (the E14 pattern) --------
    def _unit(vec):
        n = math.sqrt(sum(x * x for x in vec))
        return [x / n for x in vec]

    cb_rows = sorted(
        e.filter(
            (F.col("vec_id") % _PQ_CB_STRIDE == 0)
            & (F.col("vec_id") < _PQ_CB_STRIDE * _PQ_CB_K)
        ).collect(),
        key=lambda r: r["vec_id"],
    )
    cb_k = min(_PQ_CB_K, len(cb_rows))
    cb_units = [_unit(list(r["v"])) for r in cb_rows]
    qv_raw = list(
        e.filter(F.col("vec_id") == _PQ_QUERY).collect()[0]["v"]
    )
    q_unit = _unit(qv_raw)
    adc = [
        [
            sum(
                q_unit[m * sub_dim + i] * cb_units[j][m * sub_dim + i]
                for i in range(sub_dim)
            )
            for j in range(cb_k)
        ]
        for m in range(_PQ_M)
    ]
    qcol = F.array(*[F.lit(float(x)) for x in qv_raw])

    # --- the index BUILD: coarse assignment + PQ codes, ONCE --------
    seeds = e.filter(
        (F.col("vec_id") % _PQ_STRIDE == 0)
        & (F.col("vec_id") < 100 * _PQ_STRIDE)
    ).select(F.col("vec_id").alias("seed_id"), F.col("v").alias("sv"))
    scored = eu.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "v", "u", "seed_id",
        F.round(cosine(F.col("v"), F.col("sv")), 6).alias("c"),
    )
    asg = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("c"), (-F.col("seed_id")).alias("ns"))
            ).alias("m"),
            F.first("v").alias("v"),
            F.first("u").alias("u"),
        )
        .select("vec_id", "v", "u", (-F.col("m.ns")).alias("seed_id"))
    )
    code_cols = []
    for m in range(_PQ_M):
        sub = F.slice("u", m * sub_dim + 1, sub_dim)
        dists = F.array(*[
            F.aggregate(
                F.zip_with(
                    sub,
                    F.array(*[
                        F.lit(cb_units[j][m * sub_dim + i])
                        for i in range(sub_dim)
                    ]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, d: acc + d,
            )
            for j in range(cb_k)
        ])
        code_cols.append(
            F.array_position(dists, F.array_min(dists)).cast("int")
        )
    index = asg.select(
        "vec_id", "v", "seed_id", F.array(*code_cols).alias("code")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    n_vecs = e.filter(F.col("vec_id") != _PQ_QUERY).agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    probe_rank = seeds.select(
        "seed_id", F.round(cosine(F.col("sv"), qcol), 6).alias("qc")
    )
    exact = (
        e.filter(F.col("vec_id") != _PQ_QUERY)
        .select(
            "vec_id", F.round(cosine(F.col("v"), qcol), 6).alias("c")
        )
        .orderBy(F.col("c").desc(), "vec_id")
        .limit(_PQ_SWEEP_K)
        .select("vec_id")
    )

    # --- per-nprobe: probe -> ADC lookup -> rerank -> recall --------
    rows = []
    for np_ in _PQ_SWEEP_NPROBES:
        probes = (
            probe_rank.orderBy(F.col("qc").desc(), "seed_id")
            .limit(np_)
            .select("seed_id")
        )
        cand = index.join(F.broadcast(probes), "seed_id").filter(
            F.col("vec_id") != _PQ_QUERY
        )
        approx = F.lit(0.0)
        for m in range(_PQ_M):
            adc_m = F.array(*[F.lit(x) for x in adc[m]])
            approx = approx + F.element_at(
                adc_m, F.element_at("code", m + 1)
            )
        shortlist = (
            cand.select(
                "vec_id", "v", F.round(approx, 6).alias("approx_dot")
            )
            .orderBy(F.col("approx_dot").desc(), "vec_id")
            .limit(_PQ_SWEEP_RERANK)
        )
        topk = (
            shortlist.select(
                "vec_id",
                F.round(cosine(F.col("v"), qcol), 6).alias("cosine"),
            )
            .orderBy(F.col("cosine").desc(), "vec_id")
            .limit(_PQ_SWEEP_K)
            .select("vec_id")
        )
        summary = cand.agg(
            F.count(F.lit(1)).alias("n_candidates")
        ).crossJoin(
            topk.join(exact, "vec_id").agg(
                (F.count(F.lit(1)) / float(_PQ_SWEEP_K)).alias(
                    "recall_at_k"
                )
            )
        ).select(
            F.lit(np_).alias("nprobe"), "n_candidates", "recall_at_k"
        )
        rows.append(summary)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.crossJoin(F.broadcast(n_vecs)).select(
        "nprobe",
        "n_candidates",
        (
            F.round(F.col("n_candidates") * 1000000.0 / F.col("n_vecs"), 0)
            / 1000000.0
        ).alias("scan_fraction"),
        "recall_at_k",
    )


# ---------------------------------------------------------------------------
# B98 ts_keltner_channels — EMA-free Keltner (SMA center + ATR bands)

_KC_SMA, _KC_ATR, _KC_MULT = 20, 10, 2


@register(
    "ts_keltner_channels",
    family="timeseries",
    doc="Keltner channels (B98, the B72/B82 volatility-band family): "
    "center = 20-day SMA of the typical price (hc+lc+cc kept as an "
    "exact integer THIRD-sum so the window sum stays associative "
    "BIGINT arithmetic; one double division by 60 at the end), band "
    "width = 2 x the 10-day SMA ATR (B82's integer true-range sum), "
    "breach flags on the exact integer close vs the rounded bands. "
    "Day-grain windows per series; every float is a single "
    "fixed-order expression identical on both engines.",
    oracle=f"""
        WITH {_SQL_DAILY},
        tr AS (
            SELECT series, day_s, hc, lc, cc,
                   hc + lc + cc AS tp3,
                   greatest(
                       hc - lc,
                       abs(hc - lag(cc) OVER w),
                       abs(lc - lag(cc) OVER w)
                   ) AS tr_c,
                   row_number() OVER w AS rn
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        b AS (
            SELECT series, day_s, cc, rn,
                   CAST(sum(tp3) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_KC_SMA - 1} PRECEDING AND CURRENT ROW
                   ) AS DOUBLE) / {_KC_SMA * 3}.0 AS center,
                   CAST(sum(tr_c) OVER (
                       PARTITION BY series ORDER BY day_s
                       ROWS BETWEEN {_KC_ATR - 1} PRECEDING AND CURRENT ROW
                   ) AS DOUBLE) / {_KC_ATR}.0 AS atr
            FROM tr
        )
        SELECT series, day_s,
               round(center * 1000000.0, 0) / 1000000.0 AS center_cents,
               round(atr * 1000000.0, 0) / 1000000.0 AS atr_cents,
               round((center + {_KC_MULT}.0 * atr) * 1000000.0, 0)
                   / 1000000.0 AS upper_cents,
               round((center - {_KC_MULT}.0 * atr) * 1000000.0, 0)
                   / 1000000.0 AS lower_cents,
               cc > center + {_KC_MULT}.0 * atr AS above_upper,
               cc < center - {_KC_MULT}.0 * atr AS below_lower
        FROM b WHERE rn > {_KC_SMA}
    """,
)
def ts_keltner_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("series").orderBy("day_s")
    prev_c = F.lag("cc").over(w)
    tr = daily.select(
        "series",
        "day_s",
        "cc",
        (F.col("hc") + F.col("lc") + F.col("cc")).alias("tp3"),
        F.greatest(
            F.col("hc") - F.col("lc"),
            F.abs(F.col("hc") - prev_c),
            F.abs(F.col("lc") - prev_c),
        ).alias("tr_c"),
        F.row_number().over(w).alias("rn"),
    )
    ws = w.rowsBetween(-(_KC_SMA - 1), Window.currentRow)
    wa = w.rowsBetween(-(_KC_ATR - 1), Window.currentRow)
    center = F.sum("tp3").over(ws).cast("double") / float(_KC_SMA * 3)
    atr = F.sum("tr_c").over(wa).cast("double") / float(_KC_ATR)
    b = tr.select(
        "series", "day_s", "cc", "rn",
        center.alias("center"), atr.alias("atr"),
    )
    sc6 = lambda col: F.round(col * 1000000.0, 0) / 1000000.0  # noqa: E731
    m = float(_KC_MULT)
    return b.filter(F.col("rn") > _KC_SMA).select(
        "series",
        "day_s",
        sc6(F.col("center")).alias("center_cents"),
        sc6(F.col("atr")).alias("atr_cents"),
        sc6(F.col("center") + m * F.col("atr")).alias("upper_cents"),
        sc6(F.col("center") - m * F.col("atr")).alias("lower_cents"),
        (F.col("cc") > F.col("center") + m * F.col("atr")).alias(
            "above_upper"
        ),
        (F.col("cc") < F.col("center") - m * F.col("atr")).alias(
            "below_lower"
        ),
    )


# ---------------------------------------------------------------------------
# B99 ts_ichimoku — the five-line midpoint system

_ICH_T, _ICH_K, _ICH_S = 4, 9, 18


@register(
    "ts_ichimoku",
    family="timeseries",
    doc="Ichimoku cloud (B99): tenkan/kijun/senkou-B are midpoints "
    "of integer-cent rolling high/low windows (4/9/18 days — the "
    "classic 9/26/52 proportions compacted to the one-month span "
    "of the test calendar; the ratios, shifts and NULL build-up "
    "semantics are unchanged; the chikou line is omitted — it is "
    "the close series displaced, fully redundant with close_cents) — "
    "exact BIGINT max/min folds, one /2.0 each; senkou A/B shift "
    "FORWARD 26 days (lag over the day grid), chikou shifts back "
    "(lead, NULL near the stream head like every charting package); "
    "each line is NULL until its own window is full, so the cloud "
    "builds up exactly as a terminal renders it. Day-grain windows "
    "per series, scale-6 rendering, cloud color on the raw doubles.",
    oracle=f"""
        WITH {_SQL_DAILY},
        r AS (
            SELECT series, day_s, hc, lc, cc,
                   row_number() OVER w AS rn,
                   CASE WHEN row_number() OVER w >= {_ICH_T} THEN
                       (max(hc) OVER (PARTITION BY series ORDER BY day_s
                            ROWS BETWEEN {_ICH_T - 1} PRECEDING AND CURRENT ROW)
                        + min(lc) OVER (PARTITION BY series ORDER BY day_s
                            ROWS BETWEEN {_ICH_T - 1} PRECEDING AND CURRENT ROW)
                       ) / 2.0 END AS tenkan,
                   CASE WHEN row_number() OVER w >= {_ICH_K} THEN
                       (max(hc) OVER (PARTITION BY series ORDER BY day_s
                            ROWS BETWEEN {_ICH_K - 1} PRECEDING AND CURRENT ROW)
                        + min(lc) OVER (PARTITION BY series ORDER BY day_s
                            ROWS BETWEEN {_ICH_K - 1} PRECEDING AND CURRENT ROW)
                       ) / 2.0 END AS kijun,
                   CASE WHEN row_number() OVER w >= {_ICH_S} THEN
                       (max(hc) OVER (PARTITION BY series ORDER BY day_s
                            ROWS BETWEEN {_ICH_S - 1} PRECEDING AND CURRENT ROW)
                        + min(lc) OVER (PARTITION BY series ORDER BY day_s
                            ROWS BETWEEN {_ICH_S - 1} PRECEDING AND CURRENT ROW)
                       ) / 2.0 END AS senkou_b_raw
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        s AS (
            SELECT series, day_s, cc, rn, tenkan, kijun,
                   lag((tenkan + kijun) / 2.0, {_ICH_K}) OVER w AS senkou_a,
                   lag(senkou_b_raw, {_ICH_K}) OVER w AS senkou_b,
                   lead(cc, {_ICH_K}) OVER w AS chikou
            FROM r
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        )
        SELECT series, day_s,
               CAST(cc AS BIGINT) AS close_cents,
               round(tenkan * 1000000.0, 0) / 1000000.0 AS tenkan,
               round(kijun * 1000000.0, 0) / 1000000.0 AS kijun,
               round(senkou_a * 1000000.0, 0) / 1000000.0 AS senkou_a,
               round(senkou_b * 1000000.0, 0) / 1000000.0 AS senkou_b,
               CASE WHEN senkou_a IS NOT NULL AND senkou_b IS NOT NULL
                    THEN CASE WHEN senkou_a > senkou_b
                         THEN 'bull' ELSE 'bear' END END AS cloud
        FROM s WHERE rn >= {_ICH_K}
    """,
)
def ts_ichimoku(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("series").orderBy("day_s")
    rn = F.row_number().over(w)

    def midpoint(n: int):
        win = w.rowsBetween(-(n - 1), Window.currentRow)
        return F.when(
            rn >= n,
            (F.max("hc").over(win) + F.min("lc").over(win)) / 2.0,
        )

    r = daily.select(
        "series",
        "day_s",
        "cc",
        rn.alias("rn"),
        midpoint(_ICH_T).alias("tenkan"),
        midpoint(_ICH_K).alias("kijun"),
        midpoint(_ICH_S).alias("senkou_b_raw"),
    )
    s = r.select(
        "series",
        "day_s",
        "cc",
        "rn",
        "tenkan",
        "kijun",
        F.lag((F.col("tenkan") + F.col("kijun")) / 2.0, _ICH_K)
        .over(w)
        .alias("senkou_a"),
        F.lag("senkou_b_raw", _ICH_K).over(w).alias("senkou_b"),
    )
    sc6 = lambda col: F.round(col * 1000000.0, 0) / 1000000.0  # noqa: E731
    return s.filter(F.col("rn") >= _ICH_K).select(
        "series",
        "day_s",
        F.col("cc").alias("close_cents"),
        sc6(F.col("tenkan")).alias("tenkan"),
        sc6(F.col("kijun")).alias("kijun"),
        sc6(F.col("senkou_a")).alias("senkou_a"),
        sc6(F.col("senkou_b")).alias("senkou_b"),
        F.when(
            F.col("senkou_a").isNotNull() & F.col("senkou_b").isNotNull(),
            F.when(F.col("senkou_a") > F.col("senkou_b"), "bull").otherwise(
                "bear"
            ),
        ).alias("cloud"),
    )


# ---------------------------------------------------------------------------
# B100 ts_donchian — rolling high/low channel + breakout flags

_DON_N = 20


@register(
    "ts_donchian",
    family="timeseries",
    doc="Donchian channel (B100): 20-day rolling integer-cent "
    "high/low (exact BIGINT max/min window folds), midline as the "
    "single double half, and the turtle-style breakout flags — "
    "close vs the PREVIOUS day's channel (lag, so today's print "
    "cannot contain itself). Day-grain windows per series.",
    oracle=f"""
        WITH {_SQL_DAILY},
        d AS (
            SELECT series, day_s, cc,
                   max(hc) OVER wn AS upper_c,
                   min(lc) OVER wn AS lower_c,
                   row_number() OVER w AS rn
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s),
                   wn AS (PARTITION BY series ORDER BY day_s
                          ROWS BETWEEN {_DON_N - 1} PRECEDING
                               AND CURRENT ROW)
        ),
        x AS (
            SELECT series, day_s, cc, rn, upper_c, lower_c,
                   lag(upper_c) OVER w AS prev_upper,
                   lag(lower_c) OVER w AS prev_lower
            FROM d
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        )
        SELECT series, day_s,
               CAST(cc AS BIGINT) AS close_cents,
               CAST(upper_c AS BIGINT) AS upper_cents,
               CAST(lower_c AS BIGINT) AS lower_cents,
               round((upper_c + lower_c) / 2.0 * 1000000.0, 0)
                   / 1000000.0 AS mid_cents,
               cc > prev_upper AS breakout_up,
               cc < prev_lower AS breakout_down
        FROM x WHERE rn > {_DON_N}
    """,
)
def ts_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("series").orderBy("day_s")
    wn = w.rowsBetween(-(_DON_N - 1), Window.currentRow)
    d = daily.select(
        "series",
        "day_s",
        "cc",
        F.max("hc").over(wn).alias("upper_c"),
        F.min("lc").over(wn).alias("lower_c"),
        F.row_number().over(w).alias("rn"),
    )
    x = d.select(
        "series", "day_s", "cc", "rn", "upper_c", "lower_c",
        F.lag("upper_c").over(w).alias("prev_upper"),
        F.lag("lower_c").over(w).alias("prev_lower"),
    )
    sc6 = lambda col: F.round(col * 1000000.0, 0) / 1000000.0  # noqa: E731
    return x.filter(F.col("rn") > _DON_N).select(
        "series",
        "day_s",
        F.col("cc").alias("close_cents"),
        F.col("upper_c").alias("upper_cents"),
        F.col("lower_c").alias("lower_cents"),
        sc6((F.col("upper_c") + F.col("lower_c")) / 2.0).alias("mid_cents"),
        (F.col("cc") > F.col("prev_upper")).alias("breakout_up"),
        (F.col("cc") < F.col("prev_lower")).alias("breakout_down"),
    )


# ---------------------------------------------------------------------------
# B101 ts_supertrend — recursive ATR trailing bands

_ST_ATR, _ST_MULT = 10, 3


@register(
    "ts_supertrend",
    family="timeseries",
    doc="Supertrend (B101): ATR trailing-stop bands with the "
    "RECURSIVE tightening rule — final_ub(t) = basic_ub(t) if it "
    "tightens the stop OR the previous close broke out above, else "
    "the previous final_ub carries (mirrored for the lower band), "
    "and the trend flips only when the close crosses the ACTIVE "
    "band. Each day depends on the previous day's OUTPUT (carried "
    "bands + trend + prev close), so no window expresses it: the "
    "B80/B97 in-row fold over the packed day array, certified by a "
    "genuine RECURSIVE CTE oracle walking rn = rn + 1. Bands are "
    "fixed-order doubles on exact integer inputs (hl2 = (hc+lc)/2, "
    "ATR = the B82 integer TR sum / 10); seed row takes its basic "
    "bands with trend = up iff close >= hl2.",
    oracle=f"""
        WITH RECURSIVE {_SQL_DAILY},
        tr AS (
            SELECT series, day_s, hc, lc, cc,
                   greatest(
                       hc - lc,
                       abs(hc - lag(cc) OVER w),
                       abs(lc - lag(cc) OVER w)
                   ) AS tr_c,
                   row_number() OVER w AS rn
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        b AS (
            SELECT series, day_s, cc, rn,
                   (hc + lc) / 2.0
                       + {_ST_MULT}.0 * (CAST(sum(tr_c) OVER wa AS DOUBLE)
                                         / {_ST_ATR}.0) AS bub,
                   (hc + lc) / 2.0
                       - {_ST_MULT}.0 * (CAST(sum(tr_c) OVER wa AS DOUBLE)
                                         / {_ST_ATR}.0) AS blb,
                   (hc + lc) / 2.0 AS hl2
            FROM tr
            WINDOW wa AS (PARTITION BY series ORDER BY day_s
                          ROWS BETWEEN {_ST_ATR - 1} PRECEDING
                               AND CURRENT ROW)
        ),
        st AS (
            SELECT series, day_s, cc, rn, bub AS fub, blb AS flb,
                   CASE WHEN cc >= hl2 THEN 'up' ELSE 'down' END AS trend
            FROM b WHERE rn = {_ST_ATR + 1}
            UNION ALL
            SELECT e.series, e.day_s, e.cc, e.rn,
                   CASE WHEN e.bub < st.fub OR st.cc > st.fub
                        THEN e.bub ELSE st.fub END,
                   CASE WHEN e.blb > st.flb OR st.cc < st.flb
                        THEN e.blb ELSE st.flb END,
                   CASE WHEN st.trend = 'up' THEN
                       CASE WHEN e.cc < (CASE WHEN e.blb > st.flb
                                              OR st.cc < st.flb
                                         THEN e.blb ELSE st.flb END)
                            THEN 'down' ELSE 'up' END
                   ELSE
                       CASE WHEN e.cc > (CASE WHEN e.bub < st.fub
                                              OR st.cc > st.fub
                                         THEN e.bub ELSE st.fub END)
                            THEN 'up' ELSE 'down' END
                   END
            FROM b e
            JOIN st ON e.series = st.series AND e.rn = st.rn + 1
        )
        SELECT series, day_s,
               CAST(cc AS BIGINT) AS close_cents,
               round(fub * 1000000.0, 0) / 1000000.0 AS final_upper,
               round(flb * 1000000.0, 0) / 1000000.0 AS final_lower,
               trend,
               round(CASE WHEN trend = 'up' THEN flb ELSE fub END
                     * 1000000.0, 0) / 1000000.0 AS supertrend
        FROM st
    """,
)
def ts_supertrend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("series").orderBy("day_s")
    prev_c = F.lag("cc").over(w)
    tr = daily.select(
        "series",
        "day_s",
        "hc",
        "lc",
        "cc",
        F.greatest(
            F.col("hc") - F.col("lc"),
            F.abs(F.col("hc") - prev_c),
            F.abs(F.col("lc") - prev_c),
        ).alias("tr_c"),
        F.row_number().over(w).alias("rn"),
    )
    wa = w.rowsBetween(-(_ST_ATR - 1), Window.currentRow)
    atr = F.sum("tr_c").over(wa).cast("double") / float(_ST_ATR)
    hl2 = (F.col("hc") + F.col("lc")) / 2.0
    m = float(_ST_MULT)
    b = tr.select(
        "series",
        "day_s",
        "cc",
        "rn",
        (hl2 + m * atr).alias("bub"),
        (hl2 - m * atr).alias("blb"),
        hl2.alias("hl2"),
    ).filter(F.col("rn") > _ST_ATR)
    packed = b.groupBy("series").agg(
        F.array_sort(
            F.collect_list(F.struct("day_s", "cc", "rn", "bub", "blb", "hl2"))
        ).alias("ds")
    )
    init = F.struct(
        F.array()
        .cast(
            "array<struct<day_s:bigint,cc:bigint,fub:double,flb:double,"
            "trend:string>>"
        )
        .alias("arr"),
        F.lit(None).cast("double").alias("pub"),
        F.lit(None).cast("double").alias("plb"),
        F.lit(None).cast("string").alias("pt"),
        F.lit(None).cast("bigint").alias("pc"),
    )

    def step(acc, x):
        seeded = acc["pt"].isNull()
        fub = F.when(seeded, x["bub"]).otherwise(
            F.when(
                (x["bub"] < acc["pub"]) | (acc["pc"] > acc["pub"]),
                x["bub"],
            ).otherwise(acc["pub"])
        )
        flb = F.when(seeded, x["blb"]).otherwise(
            F.when(
                (x["blb"] > acc["plb"]) | (acc["pc"] < acc["plb"]),
                x["blb"],
            ).otherwise(acc["plb"])
        )
        trend = F.when(
            seeded,
            F.when(x["cc"] >= x["hl2"], "up").otherwise("down"),
        ).otherwise(
            F.when(
                acc["pt"] == "up",
                F.when(x["cc"] < flb, "down").otherwise("up"),
            ).otherwise(F.when(x["cc"] > fub, "up").otherwise("down"))
        )
        entry = F.struct(
            x["day_s"].alias("day_s"),
            x["cc"].alias("cc"),
            fub.alias("fub"),
            flb.alias("flb"),
            trend.alias("trend"),
        )
        return F.struct(
            F.concat(acc["arr"], F.array(entry)).alias("arr"),
            fub.alias("pub"),
            flb.alias("plb"),
            trend.alias("pt"),
            x["cc"].alias("pc"),
        )

    folded = packed.select(
        "series",
        F.aggregate(F.col("ds"), init, step, lambda a: a["arr"]).alias(
            "arr"
        ),
    )
    x = folded.select("series", F.explode("arr").alias("x")).select(
        "series", "x.*"
    )
    sc6 = lambda col: F.round(col * 1000000.0, 0) / 1000000.0  # noqa: E731
    return x.select(
        "series",
        "day_s",
        F.col("cc").alias("close_cents"),
        sc6(F.col("fub")).alias("final_upper"),
        sc6(F.col("flb")).alias("final_lower"),
        "trend",
        sc6(
            F.when(F.col("trend") == "up", F.col("flb")).otherwise(
                F.col("fub")
            )
        ).alias("supertrend"),
    )
