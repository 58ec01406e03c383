"""Round-9 additions.

Timeseries indicators (the B72-B96 dashboard family continued):
KAMA (B97, recursive variable-alpha EWMA), Keltner channels (B98),
Ichimoku cloud (B99), Donchian channel (B100), Supertrend (B101,
two-sided recursive band carry), volume profile (B102), pivot
points (B103), ADX (B104, two CHAINED Wilder recursions). Every
recursive operator runs as the B80 in-row per-series fold and is
certified by a genuine RECURSIVE CTE oracle.

Similarity search: the IVF-PQ nprobe tuning sweep (E24, amortized
build), kNN-graph beam search (E25, the HNSW-layer-0 routing idea),
hybrid BM25+vector RRF fusion (E26).

Dedup: winnowing fingerprints (D24, the MOSS algorithm) and
incremental batch-vs-index MinHash (D25, the daily-ingest posture).

Text/corpus: held-out trigram stupid-backoff eval (F46), Heaps-law
vocabulary growth (F47), the one-scan quality feature matrix (F48).

Multimodal: FLAC PCM stats (G15) — the first registered query
certified through an entropy coder.

Reference anchor: the hypertable/cagg analytics surface the streamer
feeds (SURVEY §1; `spi/schema/eventschema.go` is the events shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.caching import scoped_persist
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load, spread
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


    from timescaledb_event_streamer_spark.operators.ann import cosine, dot

    sub_dim = 64 // _PQ_M
    emb = load(spark, sf_dir, "embeddings")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # the widening repartition serves ONLY the per-vector PQ-code
    # build (heavy ADC arithmetic, persisted once); the metadata
    # branches (codebook collects, seeds, probe ranking, exact
    # top-k, corpus count) read the raw narrow scan — each one saved
    # a 32-way exchange + stage wave per execution (r11)
    e0 = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    e = e0.repartition(n_shuffle)
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
        e0.filter(
            (F.col("vec_id") % _PQ_CB_STRIDE == 0)
            & (F.col("vec_id") < _PQ_CB_STRIDE * _PQ_CB_K)
        ).collect(),
        key=lambda r: r["vec_id"],
    )
    cb_k = min(_PQ_CB_K, len(cb_rows))
    cb_units = [_unit(list(r["v"])) for r in cb_rows]
    qv_raw = list(
        e0.filter(F.col("vec_id") == _PQ_QUERY).collect()[0]["v"]
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
    seeds = e0.filter(
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
    index = scoped_persist(
        asg.select("vec_id", "v", "seed_id", F.array(*code_cols).alias("code")),
        "ann_ivfpq_nprobe_sweep.index",
    )

    n_vecs = e0.filter(F.col("vec_id") != _PQ_QUERY).agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    probe_rank = seeds.select(
        "seed_id", F.round(cosine(F.col("sv"), qcol), 6).alias("qc")
    )
    exact = (
        e0.filter(F.col("vec_id") != _PQ_QUERY)
        .select(
            "vec_id", F.round(cosine(F.col("v"), qcol), 6).alias("c")
        )
        .orderBy(F.col("c").desc(), "vec_id")
        .limit(_PQ_SWEEP_K)
        .select("vec_id")
    )

    # --- the sweep as ONE plan (r11): nprobe is a COLUMN, not a
    # python loop. The old per-point loop re-planned the whole
    # probe -> ADC -> rerank subtree four times and unioned the
    # results (106 exchanges, stage-wave dominated at tiny SF); the
    # probe sets are nested (top-1 c top-2 c ...), so one broadcast
    # of the ranked seed list + an exploded nprobe dimension +
    # per-nprobe row_number windows produce exactly the same rows
    # from a single subtree. Windows partition on nprobe and rank at
    # most the candidate slice — bounded, never corpus-grain.
    from pyspark.sql import Window

    seed_rank = probe_rank.limit(100).select(
        "seed_id",
        # 100-seed metadata rank; the limit(100) is a no-op (the
        # stride filter already admits at most 100 seeds) that puts a
        # bounding node under the global-order window so the plan
        # audit can PROVE the window input is metadata-grain
        F.row_number()
        .over(Window.orderBy(F.col("qc").desc(), "seed_id"))
        .alias("rk"),
    )
    sweep = spark.createDataFrame(
        [(int(v),) for v in _PQ_SWEEP_NPROBES], "nprobe INT"
    )
    cand = (
        index.join(F.broadcast(seed_rank), "seed_id")
        .filter(F.col("vec_id") != _PQ_QUERY)
        .crossJoin(F.broadcast(sweep))
        .filter(F.col("rk") <= F.col("nprobe"))
    )
    approx = F.lit(0.0)
    for m in range(_PQ_M):
        adc_m = F.array(*[F.lit(x) for x in adc[m]])
        approx = approx + F.element_at(adc_m, F.element_at("code", m + 1))
    w_adc = Window.partitionBy("nprobe").orderBy(
        F.col("approx_dot").desc(), "vec_id"
    )
    shortlist = (
        cand.select(
            "nprobe", "vec_id", "v", F.round(approx, 6).alias("approx_dot")
        )
        .withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= _PQ_SWEEP_RERANK)
    )
    w_ex = Window.partitionBy("nprobe").orderBy(
        F.col("cosine").desc(), "vec_id"
    )
    topk = (
        shortlist.select(
            "nprobe",
            "vec_id",
            F.round(cosine(F.col("v"), qcol), 6).alias("cosine"),
        )
        .withColumn("rn2", F.row_number().over(w_ex))
        .filter(F.col("rn2") <= _PQ_SWEEP_K)
        .select("nprobe", "vec_id")
    )
    ncand = cand.groupBy("nprobe").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    rec = (
        topk.join(exact, "vec_id")
        .groupBy("nprobe")
        .agg(
            (F.count(F.lit(1)) / float(_PQ_SWEEP_K)).alias("recall_at_k")
        )
    )
    # left joins from the sweep spine: a probe slice with zero
    # candidates or zero recall hits must still emit its row with
    # 0 / 0.0, exactly as the old per-point aggregates did
    out = (
        sweep.join(ncand, "nprobe", "left")
        .join(rec, "nprobe", "left")
        .select(
            "nprobe",
            F.coalesce("n_candidates", F.lit(0).cast("long")).alias(
                "n_candidates"
            ),
            F.coalesce("recall_at_k", F.lit(0.0)).alias("recall_at_k"),
        )
    )
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


# ---------------------------------------------------------------------------
# F46 text_trigram_backoff_score — held-out stupid-backoff LM eval

_SB_ALPHA = 0.4  # Brants et al. 2007 "stupid backoff" constant


@register(
    "text_trigram_backoff_score",
    family="text",
    doc="Held-out trigram LM scoring with stupid backoff (F46, the "
    "F42 conditional model pushed one order higher and made an "
    "honest EVAL): the model trains on EVEN doc_ids only and scores "
    "the ODD docs, so unseen n-grams actually occur and the backoff "
    "chain engages — S(w|a,b) = c3/c2 when the trigram is known, "
    "else 0.4 * (c2'/c1') on the bigram, else 0.4^2 * c1/N, else "
    "0.4^2 / (N+1) for OOV (every branch a ratio of exact BIGINTs, "
    "one log2 per scored trigram). Reports bits/trigram plus the "
    "fraction resolved at each order — the table that tells a "
    "curation pipeline whether its corpus slice actually "
    "generalizes. Plan: one corpus scan -> doc-grain trigram "
    "counts; the three model tables reduce from the even half "
    "(map-side partials); scoring is three LEFT joins keyed on the "
    "n-gram (AQE handles stopword skew).",
    oracle=f"""
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
        tri AS (
            SELECT a.doc_id, a.t AS w1, b.t AS w2, c.t AS w3
            FROM tok a
            JOIN tok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
            JOIN tok c ON a.doc_id = c.doc_id AND c.rn = a.rn + 2
        ),
        m3 AS (
            SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c3
            FROM tri WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3
        ),
        m2 AS (
            SELECT a.t AS w1, b.t AS w2, CAST(count(*) AS BIGINT) AS c2
            FROM tok a JOIN tok b
              ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
            WHERE a.doc_id % 2 = 0 GROUP BY 1, 2
        ),
        m1 AS (
            SELECT t AS w1, CAST(count(*) AS BIGINT) AS c1
            FROM tok WHERE doc_id % 2 = 0 GROUP BY 1
        ),
        n AS (
            SELECT CAST(count(*) AS BIGINT) AS total FROM tok
            WHERE doc_id % 2 = 0
        ),
        dtri AS (
            SELECT doc_id, w1, w2, w3, CAST(count(*) AS BIGINT) AS c
            FROM tri WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3, 4
        ),
        scored AS (
            SELECT d.doc_id, d.c,
                   CASE
                     WHEN t3.c3 IS NOT NULL THEN 0
                     WHEN b2.c2x IS NOT NULL THEN 1
                     WHEN u1.c1 IS NOT NULL THEN 2
                     ELSE 3
                   END AS ord_used,
                   CASE
                     WHEN t3.c3 IS NOT NULL
                       THEN t3.c3 * 1.0 / ctx2.c2
                     WHEN b2.c2x IS NOT NULL
                       THEN {_SB_ALPHA} * (b2.c2x * 1.0 / ctx1.c1)
                     WHEN u1.c1 IS NOT NULL
                       THEN {_SB_ALPHA} * {_SB_ALPHA}
                            * (u1.c1 * 1.0 / n.total)
                     ELSE {_SB_ALPHA} * {_SB_ALPHA} / (n.total + 1)
                   END AS s
            FROM dtri d
            LEFT JOIN m3 t3 ON d.w1 = t3.w1 AND d.w2 = t3.w2
                            AND d.w3 = t3.w3
            LEFT JOIN m2 ctx2 ON d.w1 = ctx2.w1 AND d.w2 = ctx2.w2
            LEFT JOIN (SELECT w1, w2, c2 AS c2x FROM m2) b2
                   ON d.w2 = b2.w1 AND d.w3 = b2.w2
            LEFT JOIN m1 ctx1 ON d.w2 = ctx1.w1
            LEFT JOIN m1 u1 ON d.w3 = u1.w1
            CROSS JOIN n
        )
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_trigrams,
               round(-sum(c * log2(s)) / sum(c), 6) AS backoff_bits,
               round(sum(CASE WHEN ord_used = 0 THEN c ELSE 0 END)
                     * 1.0 / sum(c), 6) AS frac_trigram,
               round(sum(CASE WHEN ord_used = 1 THEN c ELSE 0 END)
                     * 1.0 / sum(c), 6) AS frac_bigram,
               round(sum(CASE WHEN ord_used >= 2 THEN c ELSE 0 END)
                     * 1.0 / sum(c), 6) AS frac_unigram_or_oov
        FROM scored GROUP BY doc_id
    """,
)
def text_trigram_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: F.length(t) > 0).alias(
            "ts"
        ),
    )
    nminus = lambda k: F.greatest(F.size("ts") - k, F.lit(0))  # noqa: E731
    tri = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.zip_with(
                    F.slice(F.col("ts"), 1, nminus(2)),
                    F.slice(F.col("ts"), 2, nminus(2)),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
                F.slice(F.col("ts"), 3, nminus(2)),
                lambda p, c: F.struct(
                    p["w1"].alias("w1"), p["w2"].alias("w2"), c.alias("w3")
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.w1", "g.w2", "g.w3")
    big = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, nminus(1)),
                F.slice(F.col("ts"), 2, nminus(1)),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("g"),
    ).select("doc_id", "g.w1", "g.w2")
    uni = toks.select("doc_id", F.explode("ts").alias("w1"))
    even = F.col("doc_id") % 2 == 0
    m3 = tri.filter(even).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c3")
    )
    m2 = big.filter(even).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c2")
    )
    m1 = uni.filter(even).groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    total = uni.filter(even).agg(F.count(F.lit(1)).alias("total"))
    dtri = tri.filter(~even).groupBy("doc_id", "w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c")
    )
    b2 = m2.select(
        F.col("w1").alias("b_w1"),
        F.col("w2").alias("b_w2"),
        F.col("c2").alias("c2x"),
    )
    ctx1 = m1.select(F.col("w1").alias("x_w1"), F.col("c1").alias("x_c1"))
    u1 = m1.select(F.col("w1").alias("u_w1"), F.col("c1").alias("u_c1"))
    scored = (
        dtri.join(m3, ["w1", "w2", "w3"], "left")
        .join(
            m2.select("w1", "w2", F.col("c2").alias("ctx_c2")),
            ["w1", "w2"],
            "left",
        )
        .join(
            b2,
            (F.col("w2") == F.col("b_w1")) & (F.col("w3") == F.col("b_w2")),
            "left",
        )
        .join(ctx1, F.col("w2") == F.col("x_w1"), "left")
        .join(u1, F.col("w3") == F.col("u_w1"), "left")
        .crossJoin(F.broadcast(total))
    )
    a = _SB_ALPHA
    ord_used = (
        F.when(F.col("c3").isNotNull(), 0)
        .when(F.col("c2x").isNotNull(), 1)
        .when(F.col("u_c1").isNotNull(), 2)
        .otherwise(3)
    )
    s = (
        F.when(F.col("c3").isNotNull(), F.col("c3") * 1.0 / F.col("ctx_c2"))
        .when(
            F.col("c2x").isNotNull(),
            F.lit(a) * (F.col("c2x") * 1.0 / F.col("x_c1")),
        )
        .when(
            F.col("u_c1").isNotNull(),
            F.lit(a) * F.lit(a) * (F.col("u_c1") * 1.0 / F.col("total")),
        )
        .otherwise(F.lit(a) * F.lit(a) / (F.col("total") + 1))
    )
    sc = scored.select(
        "doc_id", "c", ord_used.alias("ord_used"), s.alias("s")
    )
    frac = lambda cond: F.round(  # noqa: E731
        F.sum(F.when(cond, F.col("c")).otherwise(F.lit(0)))
        * 1.0
        / F.sum("c"),
        6,
    )
    return sc.groupBy("doc_id").agg(
        F.sum("c").alias("n_trigrams"),
        F.round(
            -F.sum(F.col("c") * F.log2("s")) / F.sum("c"), 6
        ).alias("backoff_bits"),
        frac(F.col("ord_used") == 0).alias("frac_trigram"),
        frac(F.col("ord_used") == 1).alias("frac_bigram"),
        frac(F.col("ord_used") >= 2).alias("frac_unigram_or_oov"),
    )


# ---------------------------------------------------------------------------
# F47 corpus_vocab_growth — Heaps-law vocabulary growth curve

_VG_CHECKPOINTS = 10


@register(
    "corpus_vocab_growth",
    family="text",
    doc="Vocabulary growth curve (F47): types-seen vs tokens-seen at "
    "ten decile checkpoints of the corpus read in deterministic "
    "(doc_id, pos) order — the Heaps-law measurement behind the BPE "
    "scaling claim (F31's word-TYPE-grain state is sublinear "
    "exactly because this curve is). Scale shape: a token's global "
    "index = (window-sum of doc lengths at DOC grain, a tiny "
    "frame) + in-doc pos — NO corpus-wide row_number; "
    "first-occurrence per type is one token-keyed min; the ten "
    "checkpoint counts are conditional aggregates over the "
    "first-occurrence table in a single pass. All exact integers "
    "except the final type/token ratio.",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, t, pos
            FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS t,
                       generate_subscripts(string_split(text, ' '), 1)
                           AS pos
                FROM documents
            ) WHERE length(t) > 0
        ),
        dlen AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n
            FROM tok GROUP BY doc_id
        ),
        base AS (
            SELECT doc_id,
                   CAST(sum(n) OVER (ORDER BY doc_id) - n AS BIGINT)
                       AS before_doc
            FROM dlen
        ),
        firsts AS (
            SELECT tok.t,
                   min(base.before_doc + tok.pos) AS first_idx
            FROM tok JOIN base USING (doc_id)
            GROUP BY tok.t
        ),
        n AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM dlen),
        cp AS (
            SELECT k, CAST(n.total * k // {_VG_CHECKPOINTS} AS BIGINT)
                       AS boundary
            FROM range(1, {_VG_CHECKPOINTS} + 1) r(k), n
        )
        SELECT CAST(cp.k AS INT) AS checkpoint,
               cp.boundary AS tokens_seen,
               CAST(count(*) FILTER (
                   WHERE firsts.first_idx <= cp.boundary
               ) AS BIGINT) AS types_seen,
               round(count(*) FILTER (
                   WHERE firsts.first_idx <= cp.boundary
               ) * 1.0 / cp.boundary, 6) AS type_token_ratio
        FROM cp, firsts
        GROUP BY cp.k, cp.boundary
    """,
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
        ).alias("pos0", "t"),
    ).select("doc_id", "t", (F.col("pos0") + 1).alias("pos"))
    dlen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    wdoc = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # doc-grain running sum: the window runs over #docs rows, never
    # over tokens
    base = dlen.select(
        "doc_id", (F.sum("n").over(wdoc) - F.col("n")).alias("before_doc")
    )
    firsts = (
        tok.join(base, "doc_id")
        .groupBy("t")
        .agg(F.min(F.col("before_doc") + F.col("pos")).alias("first_idx"))
    )
    total = dlen.agg(F.sum("n").alias("total"))
    cp = total.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(_VG_CHECKPOINTS)),
                lambda k: F.struct(
                    k.cast("int").alias("checkpoint"),
                    F.floor(
                        F.col("total") * k.cast("bigint")
                        / F.lit(_VG_CHECKPOINTS)
                    )
                    .cast("bigint")
                    .alias("boundary"),
                ),
            )
        ).alias("c")
    ).select("c.checkpoint", "c.boundary")
    seen = F.sum(
        F.when(F.col("first_idx") <= F.col("boundary"), 1).otherwise(0)
    )
    return (
        firsts.crossJoin(F.broadcast(cp))
        .groupBy("checkpoint", "boundary")
        .agg(
            seen.cast("bigint").alias("types_seen"),
            F.round(seen * 1.0 / F.col("boundary"), 6).alias(
                "type_token_ratio"
            ),
        )
        .select(
            "checkpoint",
            F.col("boundary").alias("tokens_seen"),
            "types_seen",
            "type_token_ratio",
        )
    )


# ---------------------------------------------------------------------------
# E25 ann_graph_beam_search — kNN-graph best-first routing (the
# HNSW-layer-0 idea on E5's graph shape)

_BEAM_B = 8
_BEAM_HOPS = 3
_BEAM_K = 10
_BEAM_DEG = 5
_BEAM_NODE_MOD = 5  # graph nodes: vec_id % 5 == 0 (a 20% shard)
_BEAM_QUERY = 1
# banded-LSH candidate generation for the kNN-graph build (the E5
# posture): 8 bands x 4 sign bits, all 32 hyperplanes drawn from one
# LCG stream. At 100 TB band_bits grows with log n to keep per-bucket
# candidate groups bounded; the band join is the only pair-generating
# shuffle and it carries slim (vid, band, bucket) rows.
_BEAM_BANDS = 8
_BEAM_BAND_BITS = 4
_BEAM_PLANE_SEED = 424243


def _beam_planes() -> list[list[float]]:
    from timescaledb_event_streamer_spark.operators.ann import _planes

    return _planes(_BEAM_PLANE_SEED, _BEAM_BANDS * _BEAM_BAND_BITS, 64)


def _beam_oracle() -> str:
    """The 3-hop beam search unrolled round by round: candidates =
    neighbors of the frontier not yet visited, frontier = top-B new
    candidates, visited accumulates; identical round algebra to the
    Spark loop. The kNN-graph build is banded-LSH: the oracle
    re-derives every band's sign bucket with list_dot_product
    against the same 32 constant hyperplanes (the E2/D6 pattern),
    collides on any band, and exact-reranks only the candidates —
    an independent recomputation of the Spark build, not an echo."""
    from timescaledb_event_streamer_spark.plans.queries_llm import (
        _sql_plane_list,
    )

    planes = _beam_planes()
    plane_rows = ", ".join(
        "({band}, {bit}, CAST({p} AS DOUBLE[]))".format(
            band=i // _BEAM_BAND_BITS,
            bit=i % _BEAM_BAND_BITS,
            p=_sql_plane_list(coords),
        )
        for i, coords in enumerate(planes)
    )
    head = """
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        nodes AS (SELECT * FROM e WHERE vec_id % {mod} = 0),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {query}),
        planes AS (
            SELECT * FROM (VALUES {plane_rows}) t(band, bit, p)
        ),
        sig AS (
            SELECT n.vec_id, pl.band,
                   CAST(sum(CASE WHEN list_dot_product(n.v, pl.p) > 0
                            THEN 1 << pl.bit ELSE 0 END) AS BIGINT)
                       AS bucket
            FROM nodes n CROSS JOIN planes pl
            GROUP BY n.vec_id, pl.band
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
            FROM sig a JOIN sig b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.vec_id <> b.vec_id
        ),
        g AS (
            SELECT src, dst FROM (
                SELECT c.src, c.dst,
                       row_number() OVER (
                           PARTITION BY c.src
                           ORDER BY round(list_cosine_similarity(na.v, nb.v),
                                          6) DESC, c.dst
                       ) AS rnk
                FROM cand c
                JOIN nodes na ON c.src = na.vec_id
                JOIN nodes nb ON c.dst = nb.vec_id
            ) WHERE rnk <= {deg}
        ),
        scoredall AS (
            SELECT n.vec_id,
                   round(list_cosine_similarity(n.v, q.qv), 6) AS c
            FROM nodes n, q
        ),
        entry AS (
            SELECT vec_id, c FROM scoredall
            WHERE vec_id % 25 = 0 AND vec_id < 2500
            ORDER BY c DESC, vec_id LIMIT 1
        ),
        v0 AS (SELECT vec_id, c, 0 AS hop FROM entry),
        f0 AS (SELECT vec_id FROM entry)
    """.format(
        mod=_BEAM_NODE_MOD,
        query=_BEAM_QUERY,
        deg=_BEAM_DEG,
        plane_rows=plane_rows,
    )
    rounds = []
    for r in range(1, _BEAM_HOPS + 1):
        rounds.append(
            """
        c{r} AS (
            SELECT DISTINCT g.dst AS vec_id FROM g
            JOIN f{p} ON g.src = f{p}.vec_id
            WHERE g.dst NOT IN (SELECT vec_id FROM v{p})
        ),
        s{r} AS (
            SELECT c{r}.vec_id, sa.c, {r} AS hop
            FROM c{r} JOIN scoredall sa USING (vec_id)
        ),
        f{r} AS (
            SELECT vec_id FROM s{r} ORDER BY c DESC, vec_id LIMIT {b}
        ),
        v{r} AS (
            SELECT * FROM v{p} UNION ALL SELECT * FROM s{r}
        )
            """.format(r=r, p=r - 1, b=_BEAM_B)
        )
    tail = """
        ,
        exact AS (
            SELECT vec_id FROM scoredall
            ORDER BY c DESC, vec_id LIMIT {k}
        )
        SELECT v.vec_id, v.c AS cos_sim, CAST(v.hop AS INT) AS found_at_hop,
               CAST(row_number() OVER (ORDER BY v.c DESC, v.vec_id)
                    AS BIGINT) AS rnk,
               v.vec_id IN (SELECT vec_id FROM exact) AS in_exact_topk
        FROM v{last} v
        ORDER BY rnk LIMIT {k}
    """.format(last=_BEAM_HOPS, k=_BEAM_K)
    return head + "," + ",".join(rounds) + tail


@register(
    "ann_graph_beam_search",
    family="ann",
    doc="Graph-routed ANN (E25): best-first beam search over E5's "
    "k=5 cosine kNN graph, built on a deterministic 20% node shard "
    "— the HNSW-layer-0 routing idea with everything pinned: entry "
    "= best E11 seed, 3 hops, beam 8, candidates = unvisited "
    "neighbors of the frontier, rounded-cosine + vec_id ordering "
    "everywhere. Output = the search's top-10 with the hop each hit "
    "was discovered at and an in_exact_topk flag vs the shard's "
    "brute-force truth — the curve that shows graph routing finding "
    "near-neighbors while scoring only frontier neighborhoods. The "
    "graph build is the one-off index cost and is CANDIDATE-BOUNDED "
    "at every scale: banded-LSH sign sketches (8 bands x 4 bits, "
    "one LCG plane stream) generate candidate pairs via a slim "
    "(vid, band, bucket) equi-join, and only candidates are exact- "
    "reranked to top-deg per node — never all pairs. The oracle "
    "re-derives the buckets from the same plane literals, so the "
    "banding itself is hash-certified. band_bits grows with log n "
    "at 100 TB to keep per-bucket groups bounded; each search hop "
    "scores <= beam x degree vectors.",
    oracle=_beam_oracle(),
)
def ann_graph_beam_search(spark: SparkSession, sf_dir: str) -> DataFrame:

    from timescaledb_event_streamer_spark.operators.ann import cosine

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    nodes = emb.filter(F.col("vec_id") % _BEAM_NODE_MOD == 0)
    qv = F.array(
        *[
            F.lit(float(x))
            for x in emb.filter(F.col("vec_id") == _BEAM_QUERY).collect()[
                0
            ]["v"]
        ]
    )
    from timescaledb_event_streamer_spark.operators.ann import dot

    planes = _beam_planes()
    band_structs = []
    for bi in range(_BEAM_BANDS):
        bucket = F.lit(0).cast("long")
        for j in range(_BEAM_BAND_BITS):
            coords = planes[bi * _BEAM_BAND_BITS + j]
            plane = F.array(*[F.lit(c) for c in coords])
            bit = (dot(F.col("v"), plane) > 0).cast("long")
            bucket = bucket.bitwiseOR(F.shiftleft(bit, j))
        band_structs.append(
            F.struct(F.lit(bi).alias("band"), bucket.alias("bucket"))
        )
    # slim (vid, band, bucket) rows: the band self-join never
    # shuffles 64-dim arrays, and vectors re-attach only to the
    # deduped candidate pairs for the exact rerank
    banded = nodes.select(
        F.col("vec_id").alias("vid"),
        F.explode(F.array(*band_structs)).alias("bb"),
    ).select("vid", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    ba = banded.alias("ba")
    bb = banded.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.bucket") == F.col("bb.bucket"))
            & (F.col("ba.vid") != F.col("bb.vid")),
        )
        .select(F.col("ba.vid").alias("src"), F.col("bb.vid").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    na = nodes.select(F.col("vec_id").alias("src"), F.col("v").alias("va"))
    nb = nodes.select(F.col("vec_id").alias("dst"), F.col("v").alias("vb"))
    w = Window.partitionBy("src").orderBy(F.col("c").desc(), "dst")
    g = (
        cand.join(na, "src")
        .join(nb, "dst")
        .select(
            "src",
            "dst",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("c"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _BEAM_DEG)
        .select("src", "dst")
    )
    g = scoped_persist(g, "ann_graph_beam_search.edges")
    scoredall = scoped_persist(
        nodes.select("vec_id", F.round(cosine(F.col("v"), qv), 6).alias("c")),
        "ann_graph_beam_search.scoredall",
    )
    entry = (
        scoredall.filter(
            (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 2500)
        )
        .orderBy(F.col("c").desc(), "vec_id")
        .limit(1)
    )
    visited = entry.select("vec_id", "c", F.lit(0).alias("hop"))
    frontier = entry.select("vec_id")
    for r in range(1, _BEAM_HOPS + 1):
        cand = (
            g.join(
                frontier.select(F.col("vec_id").alias("src")), "src"
            )
            .select(F.col("dst").alias("vec_id"))
            .distinct()
            .join(visited.select("vec_id"), "vec_id", "left_anti")
        )
        s = cand.join(scoredall, "vec_id").select(
            "vec_id", "c", F.lit(r).alias("hop")
        )
        frontier = (
            s.orderBy(F.col("c").desc(), "vec_id")
            .limit(_BEAM_B)
            .select("vec_id")
        )
        visited = visited.unionByName(s)
    exact = (
        scoredall.orderBy(F.col("c").desc(), "vec_id")
        .limit(_BEAM_K)
        .select("vec_id", F.lit(True).alias("_in"))
    )
    wr = Window.orderBy(F.col("c").desc(), "vec_id")
    return (
        visited.join(F.broadcast(exact), "vec_id", "left")
        .withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= _BEAM_K)
        .select(
            "vec_id",
            F.col("c").alias("cos_sim"),
            F.col("hop").cast("int").alias("found_at_hop"),
            "rnk",
            F.coalesce(F.col("_in"), F.lit(False)).alias("in_exact_topk"),
        )
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# D24 dedup_winnowing — MOSS-style winnowing fingerprints

_WIN_K = 3  # token k-gram size
_WIN_W = 4  # winnowing window (hashes per window)
_WIN_PACK = 1 << 20  # position packs into the low 20 bits
_WIN_MIN_SHARED = 2


@register(
    "dedup_winnowing",
    family="dedup",
    doc="Winnowing fingerprint dedup (D24, Schleimer et al. 2003 — "
    "the MOSS algorithm): token 3-gram md5 hashes per document, "
    "each 4-hash window selects its minimum with the RIGHTMOST tie "
    "rule (the paper's robust-winnowing guarantee: any shared run "
    "of >= k+w-1 tokens yields a shared fingerprint), pairs share "
    ">= 2 selected fingerprints. The rightmost-min rule is ONE "
    "integer min: packed = hash40 * 2^20 + (2^20-1-pos), so the "
    "window min IS the arg-min with the right tie-break — no "
    "second pass. Fingerprint density ~ 2/(w+1) of k-grams; the "
    "pair join keys on the selected hash (bucket-bounded like every "
    "dedup join here; a df cap on pathological phrase hashes is "
    "the documented scale swap). Value-exact md5 base so the whole "
    "operator hash-certifies.",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, t, pos
            FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS t,
                       generate_subscripts(string_split(text, ' '), 1)
                           AS pos
                FROM documents
            ) WHERE length(t) > 0
        ),
        kg AS (
            SELECT a.doc_id,
                   a.pos,
                   ('0x' || substr(
                       md5(a.t || ' ' || b.t || ' ' || c.t), 1, 10
                   ))::BIGINT AS h
            FROM tok a
            JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        ),
        ranked AS (
            SELECT doc_id, pos,
                   h * {_WIN_PACK} + ({_WIN_PACK} - 1 - pos) AS packed,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY pos) AS rn,
                   count(*) OVER (PARTITION BY doc_id) AS nk
            FROM kg
        ),
        sel AS (
            SELECT DISTINCT doc_id,
                   min(packed) OVER (
                       PARTITION BY doc_id ORDER BY rn
                       ROWS BETWEEN CURRENT ROW
                            AND {_WIN_W - 1} FOLLOWING
                   ) // {_WIN_PACK} AS fp
            FROM ranked
            QUALIFY rn <= nk - {_WIN_W - 1}
        ),
        sizes AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp
            FROM sel GROUP BY doc_id
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM sel a JOIN sel b
              ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= {_WIN_MIN_SHARED}
        )
        SELECT p.doc_a, p.doc_b, p.n_shared,
               round(p.n_shared * 1.0 / least(sa.nfp, sb.nfp), 6)
                   AS overlap_score
        FROM pairs p
        JOIN sizes sa ON p.doc_a = sa.doc_id
        JOIN sizes sb ON p.doc_b = sb.doc_id
    """,
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: F.length(t) > 0).alias(
            "ts"
        ),
    )
    nm2 = F.greatest(F.size("ts") - 2, F.lit(0))
    kg = toks.select(
        "doc_id",
        F.posexplode(
            F.zip_with(
                F.zip_with(
                    F.slice(F.col("ts"), 1, nm2),
                    F.slice(F.col("ts"), 2, nm2),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
                F.slice(F.col("ts"), 3, nm2),
                lambda ab, c: F.concat_ws(" ", ab, c),
            )
        ).alias("pos0", "g"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.conv(F.substring(F.md5("g"), 1, 10), 16, 10)
        .cast("long")
        .alias("h"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    ranked = kg.select(
        "doc_id",
        "pos",
        (
            F.col("h") * _WIN_PACK + (F.lit(_WIN_PACK - 1) - F.col("pos"))
        ).alias("packed"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("nk"),
    )
    wmin = w.rowsBetween(Window.currentRow, _WIN_W - 1)
    sel = (
        ranked.withColumn("selp", F.min("packed").over(wmin))
        .filter(F.col("rn") <= F.col("nk") - (_WIN_W - 1))
        .select(
            # integer div: a double division would lose precision at
            # the packed values' 2^60 magnitude
            "doc_id",
            F.expr(f"selp div {_WIN_PACK}").alias("fp"),
        )
        .distinct()
    )
    # persisted fingerprint table (r11, the _shingle_table rationale):
    # sizes and BOTH pair-join sides read sel, and without the
    # materialization each consumer re-runs the whole tokenize ->
    # md5 -> winnowing-window chain (4 corpus scans in the initial
    # plan). Density ~2/(w+1) of k-grams — the bounded artifact
    # winnowing exists to produce.

    sel = scoped_persist(sel, "dedup_winnowing.sel")
    sizes = sel.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nfp"))
    a = sel.select(F.col("doc_id").alias("doc_a"), "fp")
    b = sel.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_MIN_SHARED)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nfp").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nfp").alias("nb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_shared").cast("long"),
            F.round(
                F.col("n_shared") * 1.0 / F.least("na", "nb"), 6
            ).alias("overlap_score"),
        )
    )


# ---------------------------------------------------------------------------
# F48 corpus_quality_feature_matrix — the classifier input assembly

_QF_STOPWORDS = ("a", "the", "of", "and", "to", "in")


@register(
    "corpus_quality_feature_matrix",
    family="text",
    doc="Per-document quality FEATURE MATRIX (F48): the single-pass "
    "assembly a fastText-style quality classifier trains on — "
    "token/type counts, TTR, top-token share, stopword ratio "
    "(fixed 6-word list), hapax share, mean token length, bigram "
    "repetition (1 - distinct/total bigrams) and token entropy, "
    "all from ONE corpus scan feeding a (doc, token)-grain count "
    "and a bigram-grain count (map-side partials, doc-keyed "
    "reduces). The individual signals exist as separate certified "
    "queries (F2/F9/F10/F13/F41); this is the wide matrix a "
    "pipeline actually materializes — one scan, not eight.",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, t, pos
            FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS t,
                       generate_subscripts(string_split(text, ' '), 1)
                           AS pos
                FROM documents
            ) WHERE length(t) > 0
        ),
        tc AS (
            SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY doc_id, t
        ),
        tcn AS (
            SELECT doc_id, t, c,
                   sum(c) OVER (PARTITION BY doc_id) AS n
            FROM tc
        ),
        doc1 AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(max(c) AS BIGINT) AS top_c,
                   CAST(sum(CASE WHEN t IN {_QF_STOPWORDS!r} THEN c
                            ELSE 0 END) AS BIGINT) AS stop_c,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS hapax_c,
                   CAST(sum(c * length(t)) AS BIGINT) AS char_c,
                   round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)), 6)
                       AS token_entropy_bits
            FROM tcn GROUP BY doc_id
        ),
        big AS (
            SELECT a.doc_id, a.t AS w1, b.t AS w2
            FROM tok a JOIN tok b
              ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ),
        doc2 AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(count(DISTINCT (w1, w2)) AS BIGINT) AS n_dbigrams
            FROM big GROUP BY doc_id
        )
        SELECT d1.doc_id, d1.n_tokens, d1.n_types,
               round(d1.n_types * 1.0 / d1.n_tokens, 6) AS ttr,
               round(d1.top_c * 1.0 / d1.n_tokens, 6) AS top_token_share,
               round(d1.stop_c * 1.0 / d1.n_tokens, 6) AS stopword_ratio,
               round(d1.hapax_c * 1.0 / d1.n_types, 6) AS hapax_share,
               round(d1.char_c * 1.0 / d1.n_tokens, 6) AS mean_token_len,
               round(1.0 - d2.n_dbigrams * 1.0 / d2.n_bigrams, 6)
                   AS bigram_repetition,
               d1.token_entropy_bits
        FROM doc1 d1 JOIN doc2 d2 USING (doc_id)
    """,
)
def corpus_quality_feature_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: F.length(t) > 0).alias(
            "ts"
        ),
    )
    tok = toks.select("doc_id", F.explode("ts").alias("t"))
    tc = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    wdoc = Window.partitionBy("doc_id")
    p = F.col("c") * 1.0 / F.sum("c").over(wdoc)
    ent = tc.withColumn("plogp", p * F.log2(p))
    doc1 = ent.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.max("c").alias("top_c"),
        F.sum(
            F.when(F.col("t").isin(*_QF_STOPWORDS), F.col("c")).otherwise(
                F.lit(0)
            )
        ).alias("stop_c"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax_c"),
        F.sum(F.col("c") * F.length("t")).alias("char_c"),
        F.round(-F.sum("plogp"), 6).alias("token_entropy_bits"),
    )
    nm1 = F.greatest(F.size("ts") - 1, F.lit(0))
    big = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, nm1),
                F.slice(F.col("ts"), 2, nm1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("g"),
    ).select("doc_id", "g.w1", "g.w2")
    doc2 = big.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.count_distinct("w1", "w2").alias("n_dbigrams"),
    )
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return doc1.join(doc2, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_types",
        r6(F.col("n_types") * 1.0 / F.col("n_tokens")).alias("ttr"),
        r6(F.col("top_c") * 1.0 / F.col("n_tokens")).alias(
            "top_token_share"
        ),
        r6(F.col("stop_c") * 1.0 / F.col("n_tokens")).alias(
            "stopword_ratio"
        ),
        r6(F.col("hapax_c") * 1.0 / F.col("n_types")).alias("hapax_share"),
        r6(F.col("char_c") * 1.0 / F.col("n_tokens")).alias(
            "mean_token_len"
        ),
        r6(1.0 - F.col("n_dbigrams") * 1.0 / F.col("n_bigrams")).alias(
            "bigram_repetition"
        ),
        "token_entropy_bits",
    )


# ---------------------------------------------------------------------------
# G15 media_flac_pcm_stats — entropy-decoded feature extraction


@register(
    "media_flac_pcm_stats",
    family="multimodal",
    doc="PCM signal statistics from FLAC bytes (G15) — the first "
    "registered query whose features come from an ENTROPY-CODED "
    "payload: the G6 pseudo-noise waveform is encoded through the "
    "real FLAC coder (rice residuals, CRC-8/16 chain, MD5) and "
    "decoded back behind the Arrow-batched seam; peak / DC sum / "
    "energy / zero-crossings are exact integers over the decoded "
    "samples. The oracle re-derives every statistic from the "
    "generator rule — losslessness IS the claim being certified, "
    "because any decode deviation breaks the hash. Synthesis and "
    "decode are per-row Python (the sanctioned multimodal seam); "
    "everything around them is columnar.",
    oracle="""
        WITH src AS (
            SELECT event_id,
                   event_id % 32 + 8 AS n,
                   CASE user_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                        ELSE 44100 END AS rate,
                   list_transform(
                       range(event_id % 32 + 8),
                       i -> CASE
                           WHEN (event_id * 6151 + i * 32917) % 65536 >= 32768
                           THEN (event_id * 6151 + i * 32917) % 65536 - 65536
                           ELSE (event_id * 6151 + i * 32917) % 65536
                       END) AS s
            FROM events
        )
        SELECT event_id AS media_id,
               true AS is_flac,
               CAST(n AS BIGINT) AS n_samples,
               CAST(rate AS BIGINT) AS sample_rate,
               CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
               CAST(list_max(list_transform(s, v -> abs(v))) AS BIGINT)
                   AS peak_abs,
               CAST(list_sum(s) AS BIGINT) AS sum_samples,
               CAST(list_sum(list_transform(s, v -> v * v)) AS BIGINT)
                   AS energy,
               CAST(list_sum(list_transform(
                   range(1, n), i -> CASE WHEN s[i] * s[i + 1] < 0
                                          THEN 1 ELSE 0 END)) AS BIGINT)
                   AS zero_crossings
        FROM src
    """,
)
def media_flac_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.multimodal import (
        flac_pcm_roundtrip_stats,
    )

    # fused single-seam form (r11): encode + decode + stats in one
    # Arrow pass — the payload bytes never cross the JVM boundary.
    # Row-identical to flac_pcm_stats(synthesize_flac_pcm(events));
    # parity pinned in tests/test_round9.py.
    events = load(spark, sf_dir, "events")
    return flac_pcm_roundtrip_stats(events)


# ---------------------------------------------------------------------------
# B102 ts_volume_profile — price-bucket volume histogram + value area

_VP_BUCKET = 500  # cents per price bucket


@register(
    "ts_volume_profile",
    family="timeseries",
    doc="Volume profile (B102): per-series histogram of traded "
    "volume by 500-cent price bucket, the point of control (max-"
    "volume bucket, lowest-price tie), and the volume-ranked 70% "
    "value area (buckets admitted in (volume desc, price asc) order "
    "while the PRIOR cumulative volume is below 70% of the total — "
    "the crossing bucket included, the deterministic ranked variant "
    "of the center-expansion rule). Everything is exact BIGINT "
    "arithmetic: volumes are the J1-typed props.$.k units, the 70% "
    "test is 10*cum_before < 7*total, shares round once. One "
    "(series, bucket) shuffle with map-side partials; the "
    "value-area windows run over bucket-grain rows (hundreds per "
    "series), never events.",
    oracle=f"""
        WITH pb AS (
            SELECT event_type AS series,
                   CAST(round(value * 100) AS BIGINT)
                       - CAST(round(value * 100) AS BIGINT) % {_VP_BUCKET}
                       AS bucket_c,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS v
            FROM events
        ),
        hist AS (
            SELECT series, bucket_c, CAST(sum(v) AS BIGINT) AS vol
            FROM pb GROUP BY 1, 2
        ),
        ranked AS (
            SELECT series, bucket_c, vol,
                   CAST(row_number() OVER wv AS BIGINT) AS vol_rank,
                   sum(vol) OVER (
                       PARTITION BY series ORDER BY vol DESC, bucket_c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - vol AS cum_before,
                   sum(vol) OVER (PARTITION BY series) AS total
            FROM hist
            WINDOW wv AS (PARTITION BY series ORDER BY vol DESC, bucket_c)
        )
        SELECT series, bucket_c, vol,
               round(vol * 1.0 / total, 6) AS vol_share,
               vol_rank,
               vol_rank = 1 AS is_poc,
               10 * cum_before < 7 * total AS in_value_area
        FROM ranked
    """,
)
def ts_volume_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    pb = events.select(
        F.col("event_type").alias("series"),
        (cents - F.pmod(cents, F.lit(_VP_BUCKET))).alias("bucket_c"),
        F.get_json_object("props", "$.k").cast("long").alias("v"),
    )
    hist = pb.groupBy("series", "bucket_c").agg(F.sum("v").alias("vol"))
    wv = Window.partitionBy("series").orderBy(
        F.col("vol").desc(), "bucket_c"
    )
    wcum = wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy("series")
    ranked = hist.select(
        "series",
        "bucket_c",
        "vol",
        F.row_number().over(wv).cast("long").alias("vol_rank"),
        (F.sum("vol").over(wcum) - F.col("vol")).alias("cum_before"),
        F.sum("vol").over(wtot).alias("total"),
    )
    return ranked.select(
        "series",
        "bucket_c",
        "vol",
        F.round(F.col("vol") * 1.0 / F.col("total"), 6).alias("vol_share"),
        "vol_rank",
        (F.col("vol_rank") == 1).alias("is_poc"),
        (10 * F.col("cum_before") < 7 * F.col("total")).alias(
            "in_value_area"
        ),
    )


# ---------------------------------------------------------------------------
# D25 dedup_incremental_minhash — new batch vs historical index


def _inc_minhash_oracle() -> str:
    """The D12 md5-portable MinHash machinery in the INCREMENTAL
    posture: signatures once over the corpus, band collisions only
    between the new batch (doc_id % 3 == 0) and the index, per-new-
    doc best match + admission verdict."""
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
        cand AS (
            SELECT a.doc_id AS new_id, b.doc_id AS index_id,
                   ({eqsum}) / 32.0 AS est_jaccard
            FROM sig a JOIN sig b
              ON a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0
            WHERE {band_conds}
        ),
        best AS (
            SELECT new_id, index_id, est_jaccard
            FROM cand
            QUALIFY row_number() OVER (
                PARTITION BY new_id
                ORDER BY est_jaccard DESC, index_id
            ) = 1
        ),
        counts AS (
            SELECT new_id, CAST(count(*) AS BIGINT) AS n_candidates
            FROM cand GROUP BY new_id
        )
        SELECT t.doc_id,
               coalesce(c.n_candidates, 0) AS n_candidates,
               coalesce(b.index_id, -1) AS best_match_id,
               coalesce(b.est_jaccard, 0.0) AS best_est_jaccard,
               coalesce(b.est_jaccard, 0.0) < 0.5 AS admitted
        FROM t
        LEFT JOIN counts c ON t.doc_id = c.new_id
        LEFT JOIN best b ON t.doc_id = b.new_id
        WHERE t.doc_id % 3 = 0
    """


@register(
    "dedup_incremental_minhash",
    family="dedup",
    doc="Incremental MinHash dedup (D25) — the PRODUCTION daily-"
    "ingest posture the all-pairs queries (D3/D12) don't cover: a "
    "new batch (doc_id % 3 == 0) bands against the HISTORICAL index "
    "only — no new-vs-new, no index-vs-index — so the join cost is "
    "|batch| x collision rate, not corpus^2, and the index "
    "signatures are the reusable artifact a nightly job appends to. "
    "Per new document: candidate count, best index match (highest "
    "est_jaccard, lowest-id tie), and the admission verdict at the "
    "0.5 threshold (no-candidate docs admit with sentinel -1 / "
    "0.0). md5-portable base hash, so the WHOLE incremental flow "
    "hash-certifies (the D12 discipline).",
    oracle=_inc_minhash_oracle(),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:

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
        "dedup_incremental_minhash.sig",
    )
    banded = sig.select(
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
    new_side = banded.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("new_id"),
        F.col("sig").alias("sig_a"),
        "band",
        "bucket",
    )
    idx_side = banded.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("index_id"),
        F.col("sig").alias("sig_b"),
        "band",
        "bucket",
    )
    agree = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    cand = (
        new_side.join(idx_side, ["band", "bucket"])
        .select("new_id", "index_id", "sig_a", "sig_b")
        .dropDuplicates(["new_id", "index_id"])
        .select(
            "new_id",
            "index_id",
            (agree / float(MINHASH_PERMS)).alias("est_jaccard"),
        )
    )
    cand = scoped_persist(cand, "dedup_incremental_minhash.cand")
    wbest = Window.partitionBy("new_id").orderBy(
        F.col("est_jaccard").desc(), "index_id"
    )
    best = (
        cand.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select("new_id", "index_id", "est_jaccard")
    )
    counts = cand.groupBy("new_id").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    new_docs = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    return (
        new_docs.join(
            counts, F.col("doc_id") == F.col("new_id"), "left"
        )
        .drop("new_id")
        .join(best, F.col("doc_id") == F.col("new_id"), "left")
        .drop("new_id")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias(
                "n_candidates"
            ),
            F.coalesce("index_id", F.lit(-1)).cast("long").alias(
                "best_match_id"
            ),
            F.coalesce("est_jaccard", F.lit(0.0)).alias(
                "best_est_jaccard"
            ),
            (F.coalesce("est_jaccard", F.lit(0.0)) < 0.5).alias(
                "admitted"
            ),
        )
    )


# ---------------------------------------------------------------------------
# E26 ann_hybrid_rrf — BM25 + vector fusion (reciprocal rank fusion)

_RRF_K = 60
_RRF_DEPTH = 50
_RRF_TOP = 10
_RRF_QUERY = 1


def _hybrid_rrf_oracle() -> str:
    from timescaledb_event_streamer_spark.plans.queries_llm4 import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )

    tf_cols = ", ".join(
        "len(list_filter(string_split(text, ' '), "
        f"x -> x = '{t}')) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _BM25_TERMS
    )
    score = " + ".join(
        f"(CASE WHEN d.tf_{t} > 0 THEN "
        f"ln(1.0 + (s.n_docs - s.df_{t} + 0.5) / (s.df_{t} + 0.5))"
        f" * (d.tf_{t} * ({_BM25_K1} + 1.0))"
        f" / (d.tf_{t} + {_BM25_K1} * (1.0 - {_BM25_B}"
        f" + {_BM25_B} * d.dl / s.avgdl)) ELSE 0.0 END)"
        for t in _BM25_TERMS
    )
    return f"""
        WITH tfdoc AS (
            SELECT doc_id, len(string_split(text, ' ')) AS dl, {tf_cols}
            FROM documents WHERE doc_id <> {_RRF_QUERY}
        ),
        stats AS (
            SELECT count(*) AS n_docs,
                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
                   {df_cols}
            FROM tfdoc
        ),
        lex AS (
            SELECT doc_id, CAST(row_number() OVER (
                       ORDER BY round({score}, 6) DESC, d.doc_id
                   ) AS BIGINT) AS lex_rank
            FROM tfdoc d, stats s
            QUALIFY lex_rank <= {_RRF_DEPTH}
        ),
        e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {_RRF_QUERY}),
        vec AS (
            SELECT vec_id AS doc_id, CAST(row_number() OVER (
                       ORDER BY round(list_cosine_similarity(v, qv), 6)
                                DESC, vec_id
                   ) AS BIGINT) AS vec_rank
            FROM e, q WHERE vec_id <> {_RRF_QUERY}
            QUALIFY vec_rank <= {_RRF_DEPTH}
        ),
        fused AS (
            SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
                   coalesce(lex.lex_rank, -1) AS lex_rank,
                   coalesce(vec.vec_rank, -1) AS vec_rank,
                   round(
                       (CASE WHEN lex.lex_rank IS NOT NULL
                             THEN 1.0 / ({_RRF_K} + lex.lex_rank)
                             ELSE 0.0 END)
                       + (CASE WHEN vec.vec_rank IS NOT NULL
                               THEN 1.0 / ({_RRF_K} + vec.vec_rank)
                               ELSE 0.0 END), 6) AS rrf_score,
                   lex.doc_id IS NOT NULL AND vec.doc_id IS NOT NULL
                       AS in_both
            FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
        )
        SELECT doc_id, lex_rank, vec_rank, rrf_score, in_both,
               CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
                    AS BIGINT) AS fused_rank
        FROM fused
        QUALIFY fused_rank <= {_RRF_TOP}
    """


@register(
    "ann_hybrid_rrf",
    family="ann",
    doc="Hybrid lexical+vector retrieval (E26): F25's BM25 ranking "
    "and E1's cosine ranking fused with reciprocal rank fusion "
    "(RRF, k=60) — the standard hybrid-search serving pattern. Each "
    "leg produces its deterministic top-50 (rounded score + id tie "
    "everywhere); fusion is a FULL OUTER join of two 50-row "
    "metadata frames with -1 sentinels for single-leg hits, "
    "rrf = 1/(60+lex_rank) + 1/(60+vec_rank) as a fixed two-term "
    "sum. The corpus pays one BM25 projection scan and one cosine "
    "scan; everything after the two ordered takes is metadata-"
    "sized. Top-10 fused with both ranks and an in_both flag.",
    oracle=_hybrid_rrf_oracle(),
)
def ann_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ann import cosine
    from timescaledb_event_streamer_spark.plans.queries_llm4 import (
        bm25_search,
    )

    docs = spread(load(spark, sf_dir, "documents")).filter(
        F.col("doc_id") != _RRF_QUERY
    )
    lex = (
        bm25_search(docs, top_n=_RRF_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
            .cast("long")
            .alias("lex_rank"),
        )
    )
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = F.array(
        *[
            F.lit(float(x))
            for x in emb.filter(F.col("vec_id") == _RRF_QUERY).collect()[
                0
            ]["v"]
        ]
    )
    vec = (
        emb.filter(F.col("vec_id") != _RRF_QUERY)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("v"), qv), 6).alias("c"),
        )
        .orderBy(F.col("c").desc(), "doc_id")
        .limit(_RRF_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), "doc_id"))
            .cast("long")
            .alias("vec_rank"),
        )
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("lex_rank", F.lit(-1)).alias("lex_rank"),
        F.coalesce("vec_rank", F.lit(-1)).alias("vec_rank"),
        F.round(
            F.when(
                F.col("lex_rank").isNotNull(),
                1.0 / (F.lit(_RRF_K) + F.col("lex_rank")),
            ).otherwise(F.lit(0.0))
            + F.when(
                F.col("vec_rank").isNotNull(),
                1.0 / (F.lit(_RRF_K) + F.col("vec_rank")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rrf_score"),
        (
            F.col("lex_rank").isNotNull() & F.col("vec_rank").isNotNull()
        ).alias("in_both"),
    )
    wf = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("fused_rank") <= _RRF_TOP)
    )


# ---------------------------------------------------------------------------
# B103 ts_pivot_points — floor-trader pivots from the prior session


@register(
    "ts_pivot_points",
    family="timeseries",
    doc="Classic floor-trader pivot levels (B103): P = (H+L+C)/3 of "
    "the PREVIOUS day (lag over the day grid — today's print never "
    "contains itself), R1 = 2P - prevL, S1 = 2P - prevH, R2 = P + "
    "(prevH - prevL), S2 = P - (prevH - prevL), plus where today's "
    "close actually landed (below S1 / S1..P / P..R1 / above R1 — "
    "the session-bias label). Inputs are exact integer cents; P is "
    "the single /3.0, every level a fixed-order expression on it; "
    "the zone label compares the integer close against the rounded "
    "levels identically on both engines.",
    oracle=f"""
        WITH {_SQL_DAILY},
        d AS (
            SELECT series, day_s, cc,
                   lag(hc) OVER w AS ph,
                   lag(lc) OVER w AS pl,
                   lag(cc) OVER w AS pc
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        p AS (
            SELECT series, day_s, cc, ph, pl,
                   (ph + pl + pc) / 3.0 AS piv
            FROM d WHERE ph IS NOT NULL
        )
        SELECT series, day_s,
               CAST(cc AS BIGINT) AS close_cents,
               round(piv * 1000000.0, 0) / 1000000.0 AS pivot,
               round((2.0 * piv - pl) * 1000000.0, 0) / 1000000.0 AS r1,
               round((2.0 * piv - ph) * 1000000.0, 0) / 1000000.0 AS s1,
               round((piv + (ph - pl)) * 1000000.0, 0) / 1000000.0 AS r2,
               round((piv - (ph - pl)) * 1000000.0, 0) / 1000000.0 AS s2,
               CASE WHEN cc < 2.0 * piv - ph THEN 'below_s1'
                    WHEN cc < piv THEN 's1_to_pivot'
                    WHEN cc < 2.0 * piv - pl THEN 'pivot_to_r1'
                    ELSE 'above_r1' END AS zone
        FROM p
    """,
)
def ts_pivot_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("series").orderBy("day_s")
    d = daily.select(
        "series",
        "day_s",
        "cc",
        F.lag("hc").over(w).alias("ph"),
        F.lag("lc").over(w).alias("pl"),
        F.lag("cc").over(w).alias("pc"),
    ).filter(F.col("ph").isNotNull())
    piv = (F.col("ph") + F.col("pl") + F.col("pc")) / 3.0
    p = d.select("series", "day_s", "cc", "ph", "pl", piv.alias("piv"))
    sc6 = lambda col: F.round(col * 1000000.0, 0) / 1000000.0  # noqa: E731
    r1 = 2.0 * F.col("piv") - F.col("pl")
    s1 = 2.0 * F.col("piv") - F.col("ph")
    return p.select(
        "series",
        "day_s",
        F.col("cc").alias("close_cents"),
        sc6(F.col("piv")).alias("pivot"),
        sc6(r1).alias("r1"),
        sc6(s1).alias("s1"),
        sc6(F.col("piv") + (F.col("ph") - F.col("pl"))).alias("r2"),
        sc6(F.col("piv") - (F.col("ph") - F.col("pl"))).alias("s2"),
        F.when(F.col("cc") < s1, "below_s1")
        .when(F.col("cc") < F.col("piv"), "s1_to_pivot")
        .when(F.col("cc") < r1, "pivot_to_r1")
        .otherwise("above_r1")
        .alias("zone"),
    )


# ---------------------------------------------------------------------------
# B104 ts_adx — average directional index (Wilder smoothing, n=7)

_ADX_N = 7


def _adx_oracle() -> str:
    n = _ADX_N
    # dx expression on the NEW smoothed values (repeated where SQL
    # cannot name it); guards: st > 0 for the DIs, di sum > 0 for dx
    dip = "CASE WHEN stn > 0 THEN 100.0 * spn / stn ELSE 0.0 END"
    dim = "CASE WHEN stn > 0 THEN 100.0 * smn / stn ELSE 0.0 END"
    dx = (
        f"CASE WHEN ({dip}) + ({dim}) > 0 THEN "
        f"100.0 * abs(({dip}) - ({dim})) / (({dip}) + ({dim})) "
        f"ELSE 0.0 END"
    )
    return f"""
        WITH RECURSIVE {_SQL_DAILY},
        d AS (
            SELECT series, day_s,
                   row_number() OVER w AS rn,
                   CASE WHEN hc - lag(hc) OVER w > lag(lc) OVER w - lc
                         AND hc - lag(hc) OVER w > 0
                        THEN hc - lag(hc) OVER w ELSE 0 END AS dmp,
                   CASE WHEN lag(lc) OVER w - lc > hc - lag(hc) OVER w
                         AND lag(lc) OVER w - lc > 0
                        THEN lag(lc) OVER w - lc ELSE 0 END AS dmm,
                   greatest(hc - lc, abs(hc - lag(cc) OVER w),
                            abs(lc - lag(cc) OVER w)) AS tr
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        ),
        st AS (
            SELECT series, day_s, rn,
                   CAST(dmp AS DOUBLE) AS sp, CAST(dmm AS DOUBLE) AS sm,
                   CAST(tr AS DOUBLE) AS stt,
                   CAST(0.0 AS DOUBLE) AS dxs,
                   CAST(NULL AS DOUBLE) AS adx,
                   CAST(0.0 AS DOUBLE) AS dx
            FROM d WHERE rn = 2
            UNION ALL
            SELECT e.series, e.day_s, e.rn, u.spn, u.smn, u.stn,
                   CASE WHEN e.rn >= {n + 1} AND e.rn <= {2 * n}
                        THEN s.dxs + ({dx}) ELSE s.dxs END,
                   CASE WHEN e.rn = {2 * n}
                        THEN (s.dxs + ({dx})) / {n}.0
                        WHEN e.rn > {2 * n}
                        THEN (s.adx * {n - 1}.0 + ({dx})) / {n}.0
                        ELSE NULL END,
                   CASE WHEN e.rn >= {n + 1} THEN ({dx}) ELSE 0.0 END
            FROM d e
            JOIN st s ON e.series = s.series AND e.rn = s.rn + 1,
            LATERAL (SELECT
                CASE WHEN e.rn <= {n + 1} THEN s.sp + e.dmp
                     ELSE s.sp - s.sp / {n}.0 + e.dmp END AS spn,
                CASE WHEN e.rn <= {n + 1} THEN s.sm + e.dmm
                     ELSE s.sm - s.sm / {n}.0 + e.dmm END AS smn,
                CASE WHEN e.rn <= {n + 1} THEN s.stt + e.tr
                     ELSE s.stt - s.stt / {n}.0 + e.tr END AS stn
            ) u
        )
        SELECT series, day_s,
               round((CASE WHEN stt > 0 THEN 100.0 * sp / stt
                           ELSE 0.0 END) * 1000000.0, 0) / 1000000.0
                   AS plus_di,
               round((CASE WHEN stt > 0 THEN 100.0 * sm / stt
                           ELSE 0.0 END) * 1000000.0, 0) / 1000000.0
                   AS minus_di,
               round(dx * 1000000.0, 0) / 1000000.0 AS dx,
               round(adx * 1000000.0, 0) / 1000000.0 AS adx
        FROM st WHERE rn >= {2 * n}
    """


@register(
    "ts_adx",
    family="timeseries",
    doc="Average directional index (B104): Wilder's +DM/-DM/TR on "
    "exact integer cents, Wilder smoothing (s - s/n + x, seeded by "
    "the first n-sum) for all three, directional indexes, DX, and "
    "the second-stage Wilder smoothing of DX into ADX — TWO chained "
    "recursions (each value depends on the previous OUTPUT), run as "
    "one in-row fold per series (the B80/B97/B101 shape) and "
    "certified by a genuine RECURSIVE CTE carrying (smoothed +DM, "
    "-DM, TR, DX seed-sum, ADX). n=7 fits the one-month calendar "
    "(the classic 14 halved; the algebra is unchanged). Every "
    "branch guard and division is written identically on both "
    "engines.",
    oracle=_adx_oracle(),
)
def ts_adx(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _ADX_N
    daily = _daily_ohlcv(spark, sf_dir)
    w = Window.partitionBy("series").orderBy("day_s")
    ph, pl, pc = F.lag("hc").over(w), F.lag("lc").over(w), F.lag("cc").over(w)
    up, dn = F.col("hc") - ph, pl - F.col("lc")
    d = daily.select(
        "series",
        "day_s",
        F.row_number().over(w).alias("rn"),
        F.when((up > dn) & (up > 0), up).otherwise(F.lit(0)).alias("dmp"),
        F.when((dn > up) & (dn > 0), dn).otherwise(F.lit(0)).alias("dmm"),
        F.greatest(
            F.col("hc") - F.col("lc"),
            F.abs(F.col("hc") - pc),
            F.abs(F.col("lc") - pc),
        ).alias("tr"),
    ).filter(F.col("rn") >= 2)
    packed = d.groupBy("series").agg(
        F.array_sort(
            F.collect_list(F.struct("rn", "day_s", "dmp", "dmm", "tr"))
        ).alias("ds")
    )
    init = F.struct(
        F.array()
        .cast(
            "array<struct<day_s:bigint,rn:int,sp:double,sm:double,"
            "stt:double,dx:double,adx:double>>"
        )
        .alias("arr"),
        F.lit(None).cast("double").alias("sp"),
        F.lit(None).cast("double").alias("sm"),
        F.lit(None).cast("double").alias("stt"),
        F.lit(0.0).alias("dxs"),
        F.lit(None).cast("double").alias("adx"),
    )

    def step(acc, x):
        first = acc["sp"].isNull()
        spn = F.when(first, x["dmp"].cast("double")).otherwise(
            F.when(x["rn"] <= n + 1, acc["sp"] + x["dmp"]).otherwise(
                acc["sp"] - acc["sp"] / float(n) + x["dmp"]
            )
        )
        smn = F.when(first, x["dmm"].cast("double")).otherwise(
            F.when(x["rn"] <= n + 1, acc["sm"] + x["dmm"]).otherwise(
                acc["sm"] - acc["sm"] / float(n) + x["dmm"]
            )
        )
        stn = F.when(first, x["tr"].cast("double")).otherwise(
            F.when(x["rn"] <= n + 1, acc["stt"] + x["tr"]).otherwise(
                acc["stt"] - acc["stt"] / float(n) + x["tr"]
            )
        )
        dip = F.when(stn > 0, 100.0 * spn / stn).otherwise(F.lit(0.0))
        dim = F.when(stn > 0, 100.0 * smn / stn).otherwise(F.lit(0.0))
        dx_raw = F.when(
            (dip + dim) > 0, 100.0 * F.abs(dip - dim) / (dip + dim)
        ).otherwise(F.lit(0.0))
        dx = F.when(x["rn"] >= n + 1, dx_raw).otherwise(F.lit(0.0))
        dxs = F.when(
            (x["rn"] >= n + 1) & (x["rn"] <= 2 * n),
            acc["dxs"] + dx_raw,
        ).otherwise(acc["dxs"])
        adx = (
            F.when(x["rn"] == 2 * n, (acc["dxs"] + dx_raw) / float(n))
            .when(
                x["rn"] > 2 * n,
                (acc["adx"] * float(n - 1) + dx_raw) / float(n),
            )
            .otherwise(F.lit(None).cast("double"))
        )
        entry = F.struct(
            x["day_s"].alias("day_s"),
            x["rn"].alias("rn"),
            spn.alias("sp"),
            smn.alias("sm"),
            stn.alias("stt"),
            dx.alias("dx"),
            adx.alias("adx"),
        )
        return F.struct(
            F.concat(acc["arr"], F.array(entry)).alias("arr"),
            spn.alias("sp"),
            smn.alias("sm"),
            stn.alias("stt"),
            dxs.alias("dxs"),
            adx.alias("adx"),
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
    dip_o = F.when(
        F.col("stt") > 0, 100.0 * F.col("sp") / F.col("stt")
    ).otherwise(F.lit(0.0))
    dim_o = F.when(
        F.col("stt") > 0, 100.0 * F.col("sm") / F.col("stt")
    ).otherwise(F.lit(0.0))
    return x.filter(F.col("rn") >= 2 * n).select(
        "series",
        "day_s",
        sc6(dip_o).alias("plus_di"),
        sc6(dim_o).alias("minus_di"),
        sc6(F.col("dx")).alias("dx"),
        sc6(F.col("adx")).alias("adx"),
    )


# ---------------------------------------------------------------------------
# G16 media_bmp_dhash — perceptual hashes certified THROUGH the codec


@register(
    "media_bmp_dhash",
    family="multimodal",
    doc="Perceptual image fingerprints certified THROUGH the real "
    "BMP codec (G16, the G15 pattern applied to images — and the "
    "value-exact sibling the rows-only G8 bridge was missing): a "
    "deterministic 9x8 grayscale rule (pixel = (eid*31 + r*17 + "
    "c*7) % 256) is ENCODED with the real coder (paletted 8-bit, "
    "bottom-up padded rows), decoded back behind the Arrow seam, "
    "and hashed — dHash = adjacent-column gradient signs (64 bits), "
    "aHash = pixel >= integer floor-mean (72 bits), both as "
    "portable bit strings. The oracle re-derives both hashes from "
    "the RULE, so any deviation anywhere in encode -> decode -> "
    "hash breaks the certification.",
    oracle="""
        WITH src AS (
            SELECT event_id,
                   flatten(list_transform(range(8), r ->
                       list_transform(range(9), c ->
                           (event_id * 31 + r * 17 + c * 7) % 256)))
                       AS px
            FROM events
        )
        SELECT event_id AS media_id,
               true AS is_bmp,
               CAST(9 AS INT) AS width,
               CAST(8 AS INT) AS height,
               array_to_string(
                   flatten(list_transform(range(8), r ->
                       list_transform(range(8), c ->
                           CASE WHEN px[r * 9 + c + 1]
                                     > px[r * 9 + c + 2]
                                THEN '1' ELSE '0' END))), '')
                   AS dhash_bits,
               array_to_string(
                   list_transform(range(72), i ->
                       CASE WHEN px[i + 1] >= list_sum(px) // 72
                            THEN '1' ELSE '0' END), '')
                   AS ahash_bits
        FROM src
    """,
)
def media_bmp_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.multimodal import (
        bmp_dhash,
        synthesize_bmp_images,
    )

    events = load(spark, sf_dir, "events")
    return bmp_dhash(synthesize_bmp_images(events))


# ---------------------------------------------------------------------------
# E27 embedding_top_eigvec_power — PCA direction by power iteration

_PI_Q = 1_000_000
_PI_DIM = 64
_PI_ITERS = 16


def _round6(x: float) -> float:
    """Half-away-from-zero rounding to 6 decimals — matches DuckDB's
    round() and Spark's F.round (HALF_UP), unlike Python's banker's
    round() which would break bit-exact hash certification on an
    exact .5 * 1e-6 tie."""
    import math

    if x >= 0:
        return math.floor(x * 1e6 + 0.5) / 1e6
    return -math.floor(-x * 1e6 + 0.5) / 1e6


def _power_oracle() -> str:
    """Exact-integer covariance sums (the E18 discipline) -> the
    64x64 matrix as a list-of-lists -> eight UNROLLED multiply +
    normalize steps with left-fold reductions -> Rayleigh quotient —
    every float expression mirrored by the Spark/driver side."""
    head = f"""
        WITH q AS (
            SELECT list_transform(CAST(embedding AS DOUBLE[]),
                                  v -> CAST(round(v * {_PI_Q}) AS BIGINT))
                       AS qv
            FROM embeddings
        ),
        dims AS (
            SELECT a.range AS i, b.range AS j
            FROM range(0, {_PI_DIM}) a, range(0, {_PI_DIM}) b
        ),
        sums AS (
            SELECT i, j,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(qv[i + 1] * qv[j + 1]) AS BIGINT) AS spq,
                   CAST(sum(qv[i + 1]) AS BIGINT) AS si,
                   CAST(sum(qv[j + 1]) AS BIGINT) AS sj
            FROM q, dims GROUP BY i, j
        ),
        cells AS (
            SELECT i, j,
                   (CAST(spq AS DOUBLE)
                    - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE) / n) / n
                       AS c,
                   n
            FROM sums
        ),
        crow AS (
            SELECT i, list(c ORDER BY j) AS row FROM cells GROUP BY i
        ),
        cmat AS (
            SELECT list(row ORDER BY i) AS m,
                   (SELECT max(n) FROM cells) AS n_vecs
            FROM crow
        ),
        m2t AS (
            SELECT n_vecs, m,
                   list_transform(range({_PI_DIM}), i ->
                       list_transform(range({_PI_DIM}), j ->
                           list_reduce(list_transform(range({_PI_DIM}),
                               k -> m[i + 1][k + 1] * m[k + 1][j + 1]),
                               (x, y) -> x + y))) AS m2
            FROM cmat
        ),
        m4t AS (
            SELECT n_vecs, m,
                   list_transform(range({_PI_DIM}), i ->
                       list_transform(range({_PI_DIM}), j ->
                           list_reduce(list_transform(range({_PI_DIM}),
                               k -> m2[i + 1][k + 1] * m2[k + 1][j + 1]),
                               (x, y) -> x + y))) AS m4
            FROM m2t
        ),
        it0 AS (
            SELECT m, m4, n_vecs,
                   list_transform(range({_PI_DIM}),
                       i -> CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END) AS v
            FROM m4t
        )
    """
    steps = []
    for k in range(1, _PI_ITERS + 1):
        steps.append(f"""
        w{k} AS (
            SELECT m, m4, n_vecs,
                   list_transform(range({_PI_DIM}), i ->
                       list_reduce(list_transform(range({_PI_DIM}),
                           j -> m4[i + 1][j + 1] * v[j + 1]),
                           (x, y) -> x + y)) AS w
            FROM it{k - 1}
        ),
        it{k} AS (
            SELECT m, m4, n_vecs,
                   list_transform(w, x -> x / sqrt(
                       list_reduce(list_transform(w, y -> y * y),
                                   (a, b) -> a + b))) AS v
            FROM w{k}
        )""")
    tail = f"""
        ,
        fin AS (
            SELECT m, n_vecs, v,
                   list_transform(range({_PI_DIM}), i ->
                       list_reduce(list_transform(range({_PI_DIM}),
                           j -> m[i + 1][j + 1] * v[j + 1]),
                           (x, y) -> x + y)) AS cv
            FROM it{_PI_ITERS}
        ),
        ray AS (
            SELECT v,
                   list_reduce(list_transform(range({_PI_DIM}),
                       i -> v[i + 1] * cv[i + 1]), (x, y) -> x + y)
                       AS lam_q,
                   list_reduce(list_transform(range({_PI_DIM}),
                       i -> m[i + 1][i + 1]), (x, y) -> x + y) AS trace_q,
                   n_vecs
            FROM fin
        )
        SELECT CAST(d.range AS INT) AS dim,
               round(v[d.range + 1] * 1000000.0, 0) / 1000000.0
                   AS eigvec,
               round(lam_q / {float(_PI_Q * _PI_Q)!r} * 1000000.0, 0)
                   / 1000000.0 AS top_eigenvalue,
               round(lam_q / trace_q * 1000000.0, 0) / 1000000.0
                   AS explained_ratio,
               CAST(n_vecs AS BIGINT) AS n_vecs
        FROM ray, range(0, {_PI_DIM}) d
    """
    return head + "," + ",".join(steps) + tail


@register(
    "embedding_top_eigvec_power",
    family="ann",
    doc="Top principal direction of the embedding covariance by "
    "ACCELERATED power iteration (E27): the matrix is squared twice "
    "(C^4 — random embeddings have a tight Marchenko-Pastur "
    "spectrum, so plain steps converge at (l2/l1)~0.99 per step) "
    "and sixteen multiply-normalize steps run on C^4 = 64 effective "
    "power steps; the Rayleigh quotient and explained-variance "
    "ratio evaluate on the ORIGINAL C. The corpus pays ONE scan "
    "producing exact-INTEGER covariance sums (the E18 quantization, "
    "shuffle traffic 64x64 cells regardless of corpus size); the "
    "matrix squaring and iteration are metadata work, performed "
    "with IDENTICAL left-fold orders on both engines (k-ascending "
    "matrix products, j-ascending row dots, i-ascending norms), so "
    "even after two squarings and sixteen nonlinear normalize steps "
    "the vectors agree to the last bit and the output "
    "hash-certifies; numpy eigh parity pinned in pytest.",
    oracle=_power_oracle(),
)
def embedding_top_eigvec_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    emb = load(spark, sf_dir, "embeddings")
    q = F.expr(
        f"transform(embedding, v -> cast(round(cast(v as double)"
        f" * {_PI_Q}) as long))"
    )
    # full-matrix integer product cells + per-dim sums, partial-
    # aggregated before the shuffle (the E18 explode shape)
    entries = F.expr(
        f"concat("
        f" transform(sequence(0, {_PI_DIM - 1}),"
        "   i -> struct(i AS i, -1 AS j, q[i] AS v)),"
        f" flatten(transform(sequence(0, {_PI_DIM - 1}), i ->"
        f"  transform(sequence(0, {_PI_DIM - 1}),"
        "    j -> struct(i AS i, j AS j, q[i] * q[j] AS v)))))"
    )
    cells = (
        emb.select(q.alias("q"))
        .select(F.explode(entries).alias("e"))
        .groupBy("e.i", "e.j")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("e.v").alias("s"))
        .collect()
    )
    n_vecs = cells[0]["n"]
    si = {r["i"]: r["s"] for r in cells if r["j"] == -1}
    spq = {(r["i"], r["j"]): r["s"] for r in cells if r["j"] >= 0}
    dim, n = _PI_DIM, n_vecs
    # the oracle's exact double expression, mirrored term for term
    C = [
        [
            (float(spq[(i, j)]) - float(si[i]) * float(si[j]) / n) / n
            for j in range(dim)
        ]
        for i in range(dim)
    ]
    def matsq(m):
        out = []
        for i in range(dim):
            row = []
            for j in range(dim):
                acc = m[i][0] * m[0][j]
                for k in range(1, dim):
                    acc = acc + m[i][k] * m[k][j]
                row.append(acc)
            out.append(row)
        return out

    C4 = matsq(matsq(C))
    v = [1.0] + [0.0] * (dim - 1)
    for _ in range(_PI_ITERS):
        w = []
        for i in range(dim):
            acc = C4[i][0] * v[0]
            for j in range(1, dim):
                acc = acc + C4[i][j] * v[j]
            w.append(acc)
        nrm_acc = w[0] * w[0]
        for y in w[1:]:
            nrm_acc = nrm_acc + y * y
        nrm = math.sqrt(nrm_acc)
        v = [x / nrm for x in w]
    cv = []
    for i in range(dim):
        acc = C[i][0] * v[0]
        for j in range(1, dim):
            acc = acc + C[i][j] * v[j]
        cv.append(acc)
    lam_acc = v[0] * cv[0]
    for i in range(1, dim):
        lam_acc = lam_acc + v[i] * cv[i]
    trace_acc = C[0][0]
    for i in range(1, dim):
        trace_acc = trace_acc + C[i][i]
    lam_real = _round6(lam_acc / float(_PI_Q * _PI_Q))
    explained = _round6(lam_acc / trace_acc)
    rows = [
        (
            i,
            _round6(v[i]),
            lam_real,
            explained,
            int(n_vecs),
        )
        for i in range(dim)
    ]
    return emb.sparkSession.createDataFrame(
        rows,
        "dim INT, eigvec DOUBLE, top_eigenvalue DOUBLE, "
        "explained_ratio DOUBLE, n_vecs BIGINT",
    )
