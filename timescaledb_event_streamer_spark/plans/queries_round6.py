"""Round-6 additions: embedding covariance (E18) and the remaining
dashboard-analytics trio — Bollinger bands, RSI, drawdown (B72-B74).

Reference motivation: the toolkit's stats_agg/rolling families
(timescaledb-toolkit stats_agg, candlestick_agg consumers) and the
whitening/PCA-prep pass every embedding pipeline runs before
indexing. All four queries follow the repo's exactness discipline —
integer quantization so every cross-engine sum is associative and
bit-stable, with doubles only in one final mirrored expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load

#: embedding quantization step: 1e-6 units keep float32 inputs exact
#: (they carry <= 7 significant decimal digits) while products stay
#: far under 2^53 for exact double rendering of the integer sums
_Q = 1_000_000

_EMB_DIM = 64


@register(
    "embedding_covariance",
    family="ann",
    doc="Embedding covariance + Pearson correlation matrix (E18) — "
    "the PCA/whitening-prep pass an embedding pipeline runs before "
    "indexing (mean-center, decorrelate, pick principal dims). "
    "Values are quantized to integer 1e-6 units so EVERY sum is "
    "exact integer arithmetic with map-side partials: the plan "
    "explodes each vector into its 2080 upper-triangle (i, j, "
    "qi*qj) products and partial-aggregates BEFORE the shuffle, so "
    "shuffle traffic is partitions x 2080 rows — independent of "
    "corpus size (the B59/B60 sketch-grain principle applied to a "
    "dense-linear-algebra reduce). Covariance and correlation come "
    "from the exact integer sums in ONE mirrored double expression "
    "(sums < 2^53, so the double rendering is itself exact). Past "
    "~1e8 vectors, SPARK_GRAFT_MOMENT_SUMS=decimal flips the sum to "
    "DECIMAL(38,0) (functions/exact.py), parity pinned by "
    "tests/test_exact_sums.py.",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  v -> CAST(round(v * {_Q}) AS BIGINT)) AS qv
            FROM embeddings
        ),
        dims AS (
            SELECT a.range AS i, b.range AS j
            FROM range(0, {_EMB_DIM}) a, range(0, {_EMB_DIM}) b
            WHERE b.range >= a.range
        ),
        sums AS (
            SELECT i, j,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(qv[i + 1] * qv[j + 1]) AS BIGINT) AS spq,
                   CAST(sum(qv[i + 1]) AS BIGINT) AS si,
                   CAST(sum(qv[j + 1]) AS BIGINT) AS sj,
                   CAST(sum(qv[i + 1] * qv[i + 1]) AS BIGINT) AS sii,
                   CAST(sum(qv[j + 1] * qv[j + 1]) AS BIGINT) AS sjj
            FROM q, dims GROUP BY i, j
        )
        SELECT i AS dim_i, j AS dim_j, n AS n_vecs,
               round((CAST(spq AS DOUBLE)
                      - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE) / n)
                     / n / 1000.0, 0) / 1000000000.0 AS covariance,
               round((CAST(spq AS DOUBLE)
                      - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE) / n)
                     / sqrt((CAST(sii AS DOUBLE)
                             - CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / n)
                            * (CAST(sjj AS DOUBLE)
                               - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE) / n))
                     * 1000000.0, 0) / 1000000.0 AS correlation
        FROM sums
    """,
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return covariance_from_sums(
        covariance_sums(load(spark, sf_dir, "embeddings"))
    )


def covariance_sums(emb: DataFrame) -> DataFrame:
    """The covariance partial-sum table, SLIM form: one (i, j, sum)
    cell per upper-triangle product plus a (i, -1) pseudo-pair per
    dim carrying the plain sum — 2144 three-field entries per vector
    instead of 2080 seven-field ones (the first form re-summed
    si/sj/sii/sjj redundantly in every cell; diagonal cells already
    ARE sii, measured ~2x less explode CPU). Still ONE associative
    count/sum aggregation, so the identical expression maintains the
    matrix as a complete-mode STREAMING aggregation over a vector
    stream (I23 — tests/test_streaming.py proves stream == batch
    cell-for-cell); covariance_from_sums reshapes via 64-row
    broadcast joins."""
    # multiply in DOUBLE: float32 * int would round the product to
    # float32 and diverge from the oracle's double arithmetic
    q = F.expr(
        f"transform(embedding, v -> cast(round(cast(v as double) * {_Q}) as long))"
    )
    entries = F.expr(
        f"concat("
        f" transform(sequence(0, {_EMB_DIM - 1}),"
        "   i -> struct(i AS i, -1 AS j, q[i] AS v)),"
        f" flatten(transform(sequence(0, {_EMB_DIM - 1}), i ->"
        f"  transform(sequence(i, {_EMB_DIM - 1}),"
        "    j -> struct(i AS i, j AS j, q[i] * q[j] AS v)))))"
    )
    from timescaledb_event_streamer_spark.functions.exact import moment_sum

    return (
        emb.select(q.alias("q"))
        .select(F.explode(entries).alias("p"))
        .groupBy("p.i", "p.j")
        .agg(F.count(F.lit(1)).alias("n"), moment_sum(F.col("p.v")).alias("s"))
    )


def covariance_from_sums(sums: DataFrame) -> DataFrame:
    """Covariance/correlation projection over the slim sums table:
    (i, -1) rows carry si and N, diagonal rows carry sii; both are
    64-row tables, broadcast back onto the 2080 product cells.

    The sums table feeds FIVE branches (cells + two dim views + two
    diagonal views); without a materialization boundary each branch
    re-runs the whole explode/aggregate pipeline — audited at 5
    corpus scans. It is 2144 rows, so the eager localCheckpoint is
    free (the D20 inverted-index precedent)."""
    sums = sums.localCheckpoint(eager=True)
    dims = sums.filter(F.col("j") == -1).select(
        F.col("i").alias("d"), F.col("s").alias("sd"), F.col("n").alias("nd")
    )
    cells = sums.filter(F.col("j") >= 0)
    di = dims.select(
        F.col("d").alias("i"), F.col("sd").alias("si"), F.col("nd").alias("n_vecs")
    )
    dj = dims.select(F.col("d").alias("j"), F.col("sd").alias("sj"))
    diag = sums.filter(F.col("i") == F.col("j"))
    gi = diag.select(F.col("i").alias("i"), F.col("s").alias("sii"))
    gj = diag.select(F.col("j").alias("j"), F.col("s").alias("sjj"))
    t = (
        cells.join(F.broadcast(di), "i")
        .join(F.broadcast(dj), "j")
        .join(F.broadcast(gi), "i")
        .join(F.broadcast(gj), "j")
    )
    n = F.col("n_vecs")
    spq, si, sj = F.col("s"), F.col("si"), F.col("sj")
    sii, sjj = F.col("sii"), F.col("sjj")
    cov_num = spq.cast("double") - si.cast("double") * sj.cast("double") / n
    var_i = sii.cast("double") - si.cast("double") * si.cast("double") / n
    var_j = sjj.cast("double") - sj.cast("double") * sj.cast("double") / n
    # scale-0 rounding only (see ts_bollinger): round(x, d>0) on an
    # arbitrary double is repr-vs-exact-value ambiguous cross-engine;
    # covariance renders at 1e-9, correlation at 1e-6
    return t.select(
        F.col("i").alias("dim_i"),
        F.col("j").alias("dim_j"),
        "n_vecs",
        (F.round(cov_num / n / 1000.0, 0) / 1e9).alias("covariance"),
        (F.round(cov_num / F.sqrt(var_i * var_j) * 1e6, 0) / 1e6).alias(
            "correlation"
        ),
    )


def _daily_cents(events: DataFrame) -> DataFrame:
    """(series, day, cents) — exact integer daily mean in cents
    (the repo's standard day-grain reduction: sums of cents are
    associative, the mean division happens once per day row)."""
    return (
        events.withColumn("day", F.date_trunc("day", F.col("ts")))
        .withColumn("c", F.round(F.col("value") * 100, 0).cast("long"))
        .groupBy(F.col("event_type").alias("series"), "day")
        .agg(F.sum("c").alias("sc"), F.count(F.lit(1)).alias("nc"))
    )


_BOLL_WINDOW = 7  # days
_BOLL_K = 2.0

_SQL_DAILY = """
        daily AS (
            SELECT event_type AS series, date_trunc('day', ts) AS day,
                   sum(CAST(round(value * 100) AS BIGINT)) AS sc,
                   CAST(count(*) AS BIGINT) AS nc
            FROM events GROUP BY 1, 2
        )
"""


@register(
    "ts_bollinger",
    family="timeseries",
    doc="Bollinger bands (B72): 7-day rolling mean ± 2σ over the "
    "daily mean, with band-breach flags — the volatility-envelope "
    "chart every monitoring dashboard renders next to B33's moving "
    "average. The day value is the FLOORED micro-cent mean — an "
    "integer — so the rolling sum and sum-of-squares are exact "
    "associative integer arithmetic on both engines (a double day "
    "mean would make window sums association-order-dependent: "
    "DuckDB aggregates frames via segment trees, Spark via running "
    "accumulation); mean/sigma come from those exact sums in one "
    "mirrored double expression. Day-grain windows per series "
    "(chunk-catalog bounded, never event-grain).",
    oracle=f"""
        WITH {_SQL_DAILY},
        x AS (
            SELECT series, day, (sc * 10000) // nc AS xq
            FROM daily
        ),
        w AS (
            SELECT series, day, xq,
                   count(*) OVER win AS n_days,
                   CAST(sum(xq) OVER win AS BIGINT) AS sx,
                   CAST(sum(xq * xq) OVER win AS BIGINT) AS sxx
            FROM x
            WINDOW win AS (PARTITION BY series ORDER BY day
                           ROWS BETWEEN {_BOLL_WINDOW - 1} PRECEDING
                           AND CURRENT ROW)
        )
        SELECT series, day,
               round(xq / 1000000.0, 6) AS day_mean,
               n_days,
               round(CAST(sx AS DOUBLE) / n_days, 0) / 1000000.0 AS sma,
               round(sqrt(greatest(CAST(sxx AS DOUBLE) / n_days
                                   - (CAST(sx AS DOUBLE) / n_days)
                                     * (CAST(sx AS DOUBLE) / n_days), 0)),
                     0) / 1000000.0 AS sigma,
               n_days >= {_BOLL_WINDOW} AND
                 CAST(xq AS DOUBLE) > CAST(sx AS DOUBLE) / n_days
                   + {_BOLL_K} * sqrt(greatest(CAST(sxx AS DOUBLE) / n_days
                       - (CAST(sx AS DOUBLE) / n_days)
                         * (CAST(sx AS DOUBLE) / n_days), 0))
                   AS above_upper,
               n_days >= {_BOLL_WINDOW} AND
                 CAST(xq AS DOUBLE) < CAST(sx AS DOUBLE) / n_days
                   - {_BOLL_K} * sqrt(greatest(CAST(sxx AS DOUBLE) / n_days
                       - (CAST(sx AS DOUBLE) / n_days)
                         * (CAST(sx AS DOUBLE) / n_days), 0))
                   AS below_lower
        FROM w
    """,
)
def ts_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cents(load(spark, sf_dir, "events"))
    # day value = FLOORED micro-cent mean: an integer, so the rolling
    # sums are associative integer arithmetic on BOTH engines — a
    # double day-mean would make the window sums association-order-
    # dependent (DuckDB sums frames via segment trees, Spark via
    # running accumulation) and break the hash
    x = daily.select(
        "series", "day", F.expr("(sc * 10000) div nc").alias("xq")
    )
    win = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(-(_BOLL_WINDOW - 1), Window.currentRow)
    )
    w = x.select(
        "series",
        "day",
        "xq",
        F.count(F.lit(1)).over(win).alias("n_days"),
        F.sum("xq").over(win).alias("sx"),
        F.sum(F.col("xq") * F.col("xq")).over(win).alias("sxx"),
    )
    n = F.col("n_days")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    mean = sx / n
    sigma = F.sqrt(F.greatest(sxx / n - mean * mean, F.lit(0.0)))
    full = n >= _BOLL_WINDOW
    xd = F.col("xq").cast("double")
    # round-at-scale-0 only: Spark's round(x, d) rounds the SHORTEST
    # decimal repr while DuckDB rounds the exact binary value, and a
    # d>0 tie (X.0000005) is never exactly representable — a value
    # like sx/n = 65635291.5 exactly renders repr "65.6352915" after
    # /1e6 while its binary value sits below the tie, so the engines
    # split. Integer-and-a-half ties ARE representable, so rounding
    # the micro-unit value at scale 0 and dividing afterwards agrees
    # everywhere (caught by the sf0.001 suite on this exact cell).
    return w.select(
        "series",
        "day",
        F.round(F.col("xq") / 1000000.0, 6).alias("day_mean"),
        "n_days",
        (F.round(mean, 0) / 1000000.0).alias("sma"),
        (F.round(sigma, 0) / 1000000.0).alias("sigma"),
        (full & (xd > mean + _BOLL_K * sigma)).alias("above_upper"),
        (full & (xd < mean - _BOLL_K * sigma)).alias("below_lower"),
    )


_RSI_WINDOW = 14  # days


@register(
    "ts_rsi",
    family="timeseries",
    doc="Relative Strength Index (B73, Cutler's SMA form): daily "
    "deltas of the day-mean split into gain/loss legs, averaged "
    "over a 14-day window, RSI = 100·avg_gain/(avg_gain+avg_loss) "
    "— the momentum oscillator counterpart of B25's counter deltas. "
    "Day value is the FLOORED micro-cent mean (pure integer, like "
    "ts_bollinger), so deltas and their windowed gain/loss sums are "
    "exact integers on both engines; the final division is one "
    "mirrored double expression. Neutral 50 when the window has no "
    "movement (the standard convention, avoids 0/0).",
    oracle=f"""
        WITH {_SQL_DAILY},
        x AS (
            SELECT series, day, (sc * 10000) // nc AS xq
            FROM daily
        ),
        d AS (
            SELECT series, day,
                   xq - lag(xq) OVER (PARTITION BY series ORDER BY day)
                       AS delta
            FROM x
        ),
        w AS (
            SELECT series, day, delta,
                   count(delta) OVER win AS n_deltas,
                   CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END)
                       OVER win AS BIGINT) AS gains,
                   CAST(sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END)
                       OVER win AS BIGINT) AS losses
            FROM d
            WINDOW win AS (PARTITION BY series ORDER BY day
                           ROWS BETWEEN {_RSI_WINDOW - 1} PRECEDING
                           AND CURRENT ROW)
        )
        SELECT series, day, n_deltas,
               round(gains / 1000000.0, 6) AS gain_sum,
               round(losses / 1000000.0, 6) AS loss_sum,
               CASE WHEN gains + losses = 0 THEN 50.0
                    ELSE round(100000000.0 * gains / (gains + losses), 0)
                         / 1000000.0 END AS rsi
        FROM w WHERE delta IS NOT NULL
    """,
)
def ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cents(load(spark, sf_dir, "events"))
    # same integer micro-cent day value as ts_bollinger: deltas and
    # their windowed gain/loss sums stay exact integers cross-engine
    x = daily.select(
        "series", "day", F.expr("(sc * 10000) div nc").alias("xq")
    )
    lag_w = Window.partitionBy("series").orderBy("day")
    d = x.select(
        "series", "day", (F.col("xq") - F.lag("xq").over(lag_w)).alias("delta")
    )
    win = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(-(_RSI_WINDOW - 1), Window.currentRow)
    )
    zero = F.lit(0).cast("long")
    gains = F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(zero)).over(win)
    losses = F.sum(F.when(F.col("delta") < 0, -F.col("delta")).otherwise(zero)).over(win)
    w = d.select(
        "series",
        "day",
        "delta",
        F.count("delta").over(win).alias("n_deltas"),
        gains.alias("gains"),
        losses.alias("losses"),
    ).filter(F.col("delta").isNotNull())
    g, l = F.col("gains"), F.col("losses")
    return w.select(
        "series",
        "day",
        "n_deltas",
        F.round(g / 1000000.0, 6).alias("gain_sum"),
        F.round(l / 1000000.0, 6).alias("loss_sum"),
        # scale-0 rounding only (see ts_bollinger): 6-dp ties on the
        # arbitrary-ratio double are repr-vs-exact-value ambiguous
        F.when(g + l == zero, F.lit(50.0))
        .otherwise(F.round(100000000.0 * g / (g + l), 0) / 1000000.0)
        .alias("rsi"),
    )


@register(
    "ts_drawdown",
    family="timeseries",
    doc="Drawdown analysis (B74): per series, the running peak of the "
    "cumulative daily value and each day's drawdown from it, plus "
    "the max-drawdown summary — the risk statistic monitoring and "
    "backtest dashboards pair with B41's cumulative view. ENTIRELY "
    "exact integer arithmetic: cumulative cents and their running "
    "max are int window folds, drawdown is an int difference, and "
    "only the final /100 rendering touches doubles. Day-grain "
    "windows per series (chunk-catalog bounded).",
    oracle="""
        WITH daily AS (
            SELECT event_type AS series, date_trunc('day', ts) AS day,
                   sum(CAST(round(value * 100) AS BIGINT)) AS sc
            FROM events GROUP BY 1, 2
        ),
        c AS (
            SELECT series, day,
                   sum(sc) OVER (PARTITION BY series ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS cum
            FROM daily
        ),
        p AS (
            SELECT series, day, cum,
                   max(cum) OVER (PARTITION BY series ORDER BY day
                                  ROWS UNBOUNDED PRECEDING) AS peak
            FROM c
        )
        SELECT series, day,
               round(cum / 100.0, 6) AS cumulative,
               round(peak / 100.0, 6) AS running_peak,
               round((peak - cum) / 100.0, 6) AS drawdown,
               round(max(peak - cum) OVER (PARTITION BY series) / 100.0, 6)
                   AS max_drawdown,
               peak - cum = max(peak - cum) OVER (PARTITION BY series)
                   AS is_max_drawdown_day
        FROM p
    """,
)
def ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    daily = (
        events.withColumn("day", F.date_trunc("day", F.col("ts")))
        .withColumn("c", F.round(F.col("value") * 100, 0).cast("long"))
        .groupBy(F.col("event_type").alias("series"), "day")
        .agg(F.sum("c").alias("sc"))
    )
    cum_w = (
        Window.partitionBy("series")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = daily.select(
        "series", "day", F.sum("sc").over(cum_w).alias("cum")
    )
    p = c.select(
        "series", "day", "cum", F.max("cum").over(cum_w).alias("peak")
    )
    series_w = Window.partitionBy("series")
    dd = F.col("peak") - F.col("cum")
    return p.select(
        "series",
        "day",
        F.round(F.col("cum") / 100.0, 6).alias("cumulative"),
        F.round(F.col("peak") / 100.0, 6).alias("running_peak"),
        F.round(dd / 100.0, 6).alias("drawdown"),
        F.round(F.max(dd).over(series_w) / 100.0, 6).alias("max_drawdown"),
        (dd == F.max(dd).over(series_w)).alias("is_max_drawdown_day"),
    )


@register(
    "text_ngram_novelty",
    family="text",
    doc="Per-document n-gram novelty (F32): the fraction of a doc's "
    "distinct word-3-grams whose FIRST corpus occurrence (min "
    "doc_id) is this doc — the new-information curve dedup-aware "
    "curriculum ordering and crawl-frontier scoring read (a doc "
    "whose shingles all appeared earlier adds nothing even if no "
    "single earlier doc near-duplicates it, the gap D2/D14 pair "
    "metrics can't see). Plan: shingle-keyed min reduce, shingle-"
    "keyed join back (co-partitioned, no second shuffle family), "
    "doc-keyed count reduce — the D2 candidate-generation scale "
    "shape without the pair blowup.",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        s0 AS (
            SELECT doc_id, unnest(range(len(toks) - 2)) AS i, toks
            FROM t WHERE len(toks) >= 3
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3]) AS s
            FROM s0
        ),
        firsts AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1)
        SELECT sh.doc_id,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               round(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                     * 1000000.0 / count(*), 0) / 1000000.0 AS novelty,
               sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                     * 1.0 / count(*) < 0.2 AS mostly_redundant
        FROM sh JOIN firsts f USING (s)
        GROUP BY sh.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.sources.tables import spread

    docs = spread(load(spark, sf_dir, "documents"))
    sh = (
        docs.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(0, size(toks) - 3), i ->"
                        " concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))"
                    )
                )
            ).alias("s"),
        )
    )
    firsts = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        sh.join(firsts, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
            # integer-scale rounding (SURVEY §6): round(x, d>0) on an
            # arbitrary double ratio is cross-engine ambiguous
            (
                F.round(novel * 1000000.0 / F.count(F.lit(1)), 0) / 1e6
            ).alias("novelty"),
            (novel / F.count(F.lit(1)) < 0.2).alias("mostly_redundant"),
        )
    )


#: importance-resampling length normalizer: docs at/over this token
#: count carry weight 1.0
_RESAMPLE_NORM_TOKENS = 200

#: 2^32 - 1: the top of the md5-prefix uniform's range, so weight 1.0
#: keeps every doc while the threshold hex stays 8 digits wide
_RESAMPLE_SCALE = 4_294_967_295


@register(
    "corpus_importance_resample",
    family="text",
    doc="Deterministic importance resampling (F33, the DSIR-style "
    "acceptance step): each doc keeps with probability equal to its "
    "importance weight (length-normalized, capped at 1.0), decided "
    "by comparing a salted-md5-prefix uniform against the weight's "
    "fixed-width hex threshold — reproducible on any engine and any "
    "run, no RNG state, unlike F16's flat per-source rates the keep "
    "probability varies PER DOC with the importance signal. Pure "
    "projection + filter, no shuffle; the weight column is the seam "
    "where a learned importance model (n-gram likelihood ratios) "
    "plugs in.",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   least(1.0, len(string_split(text, ' '))
                              / {_RESAMPLE_NORM_TOKENS}.0) AS weight
            FROM documents
        )
        SELECT doc_id, source, n_tokens, round(weight, 6) AS weight,
               substr(md5('resample:' || doc_id), 1, 8) AS u8
        FROM w
        WHERE substr(md5('resample:' || doc_id), 1, 8)
              < lpad(lower(to_hex(CAST(round(weight * {_RESAMPLE_SCALE})
                                       AS BIGINT))), 8, '0')
    """,
)
def corpus_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    weight = F.least(F.lit(1.0), n_tokens / float(_RESAMPLE_NORM_TOKENS))
    u8 = F.substring(
        F.md5(F.concat(F.lit("resample:"), F.col("doc_id").cast("string"))), 1, 8
    )
    thr = F.lpad(
        F.lower(F.hex(F.round(weight * _RESAMPLE_SCALE).cast("long"))), 8, "0"
    )
    return docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.round(weight, 6).alias("weight"),
        u8.alias("u8"),
        thr.alias("_thr"),
    ).filter(F.col("u8") < F.col("_thr")).drop("_thr")


@register(
    "ts_candlestick",
    family="timeseries",
    doc="Full candlestick_agg accessor set (B75): B17's OHLC extended "
    "with volume and VWAP per (series, day) — volume rides the "
    "props JSON payload ($.k, the J1-typed extraction), turnover is "
    "the exact integer sum of cents x volume, and VWAP = "
    "turnover/volume renders through the r6 scale-0 rounding rule "
    "(micro-unit round then divide — a d>0 round on the arbitrary "
    "ratio would be repr-vs-exact ambiguous cross-engine). Every "
    "aggregate is map-side-combinable: one shuffle of tiny partials, "
    "day-grain output.",
    oracle="""
        SELECT event_type AS series,
               CAST(epoch_us(ts) // 1000000
                    - epoch_us(ts) // 1000000 % 86400 AS BIGINT)
                   AS bucket_day_s,
               arg_min(value, event_id) AS open,
               max(value) AS high,
               min(value) AS low,
               arg_max(value, event_id) AS close,
               CAST(count(*) AS BIGINT) AS n_trades,
               CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS volume,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                        * CAST(props->>'$.k' AS BIGINT)) AS BIGINT)
                   AS turnover_cents,
               round(CAST(sum(CAST(round(value * 100) AS BIGINT)
                              * CAST(props->>'$.k' AS BIGINT)) AS DOUBLE)
                     * 10000.0
                     / sum(CAST(props->>'$.k' AS BIGINT)), 0) / 1000000.0
                   AS vwap
        FROM events
        GROUP BY 1, 2
    """,
)
def ts_candlestick(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    vol = F.get_json_object("props", "$.k").cast("long")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    # integer `div`, not double division + cast: exact past 2^53 us
    # and truncate-vs-floor-consistent with the oracle's // (same fix
    # as cdc_incremental_snapshot's snap_lsn)
    day = F.expr("unix_micros(ts) div 1000000")
    bucket = (F.col("_es") - F.pmod(F.col("_es"), F.lit(86400))).alias(
        "bucket_day_s"
    )
    agg = (
        events.withColumn("_es", day)
        .groupBy(F.col("event_type").alias("series"), bucket)
        .agg(
            F.min_by("value", "event_id").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "event_id").alias("close"),
            F.count(F.lit(1)).alias("n_trades"),
            F.sum(vol).alias("volume"),
            F.sum(cents * vol).alias("turnover_cents"),
        )
    )
    return agg.withColumn(
        "vwap",
        F.round(
            F.col("turnover_cents").cast("double") * 10000.0 / F.col("volume"),
            0,
        )
        / 1000000.0,
    )
