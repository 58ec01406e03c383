"""TimescaleDB analytics, part 3 (SURVEY.md §2.B45+): round-4
additions to the hypertable/toolkit surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.functions.timeseries import time_bucket_epoch
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load

_SQL_EPOCH_S = "(epoch_us(ts) // 1000000)"
_SQL_TS_MS = "CAST(epoch_us(ts) // 1000 AS BIGINT)"
SIX_HOURS = 6 * 3600


@register(
    "ts_downsample_minmax",
    family="timeseries",
    doc="Min/max plot downsample: per series and 6-hour pixel bucket, "
    "keep the extreme points WITH their timestamps — the rendering "
    "downsample (Grafana-style) that, unlike LTTB (B19), is a pure "
    "associative aggregate: min/max over (value, ts) structs in ONE "
    "shuffle with map-side partials, so it rolls up hierarchically "
    "exactly like a cagg. Ties break deterministically on the "
    "timestamp (lexicographic struct order; the oracle mirrors it "
    "with a two-key row_number).",
    oracle=f"""
        WITH b AS (
            SELECT event_type,
                   ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {SIX_HOURS}) AS bucket_s,
                   value,
                   {_SQL_TS_MS} AS ts_ms
            FROM events
        ),
        r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY event_type, bucket_s
                                      ORDER BY value ASC, ts_ms ASC) AS rmin,
                   row_number() OVER (PARTITION BY event_type, bucket_s
                                      ORDER BY value DESC, ts_ms DESC) AS rmax
            FROM b
        )
        SELECT event_type AS series,
               bucket_s,
               count(*) AS n_points,
               max(CASE WHEN rmin = 1 THEN value END) AS v_min,
               max(CASE WHEN rmin = 1 THEN ts_ms END) AS ts_min_ms,
               max(CASE WHEN rmax = 1 THEN value END) AS v_max,
               max(CASE WHEN rmax = 1 THEN ts_ms END) AS ts_max_ms
        FROM r
        GROUP BY 1, 2
    """,
)
def ts_downsample_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    ts_ms = (F.unix_micros(F.col("ts")) / 1000).cast("long")
    pt = F.struct(F.col("value"), ts_ms.alias("ts_ms"))
    return (
        events.select(
            F.col("event_type").alias("series"),
            time_bucket_epoch(F.col("ts"), SIX_HOURS).alias("bucket_s"),
            pt.alias("pt"),
        )
        .groupBy("series", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("pt").getField("value").alias("v_min"),
            F.min("pt").getField("ts_ms").alias("ts_min_ms"),
            F.max("pt").getField("value").alias("v_max"),
            F.max("pt").getField("ts_ms").alias("ts_max_ms"),
        )
    )


@register(
    "ts_asap_smooth",
    family="timeseries",
    doc="ASAP smoothing parameter search (toolkit asap_smooth; Rong & "
    "Bailis, VLDB'17): per series, choose the moving-average window "
    "that minimizes roughness (stddev of first differences) while "
    "preserving kurtosis >= the original series' — the "
    "spike-preserving smoothing rule. Bounded candidate set (w <= "
    "15) over the daily-bucketed series; every statistic is a "
    "SEQUENTIAL left-fold over the ordered value array (Spark "
    "aggregate == DuckDB list_reduce, identical IEEE op order, so "
    "the float results and the argmin agree bit-for-bit across "
    "engines). State is bounded by the bucket grain, not raw event "
    "volume — the candidate explode is series x 14 rows, metadata-"
    "sized at any corpus scale.",
    oracle=f"""
        WITH daily AS (
            SELECT event_type AS series, date_trunc('day', ts) AS day,
                   sum(CAST(round(value * 100) AS BIGINT))
                       / (100.0 * count(*)) AS x
            FROM events GROUP BY 1, 2
        ),
        arrs AS (
            SELECT series, list(x ORDER BY day) AS xs, count(*) AS n
            FROM daily GROUP BY series
            HAVING count(*) >= 4
        ),
        base AS (
            SELECT series, xs, n,
                   list_reduce(xs, (a, v) -> a + v) / n AS mu
            FROM arrs
        ),
        orig AS (
            SELECT series, xs, n, mu,
                   list_reduce(list_transform(xs, v -> (v - mu) * (v - mu)),
                               (a, v) -> a + v) AS m2s,
                   list_reduce(list_transform(
                       xs, v -> (v - mu) * (v - mu) * (v - mu) * (v - mu)),
                               (a, v) -> a + v) AS m4s
            FROM base
        ),
        okurt AS (
            SELECT series, xs, n,
                   n * m4s / nullif(m2s * m2s, 0) AS kurt_o
            FROM orig
        ),
        cand AS (
            SELECT series, xs, n, kurt_o, CAST(w AS BIGINT) AS w,
                   CASE WHEN w = 1 THEN xs ELSE
                       list_transform(
                           range(1, CAST(n - w + 2 AS BIGINT)),
                           i -> list_reduce(list_slice(xs, i, i + w - 1),
                                            (a, v) -> a + v) / w)
                   END AS s
            FROM okurt,
                 unnest(list_concat([1], list_transform(
                     range(2, CAST(greatest(least(15, n - 2) + 1, 2) AS BIGINT)),
                     v -> CAST(v AS INTEGER)))) AS u(w)
        ),
        dstats AS (
            SELECT series, n, kurt_o, w, s,
                   list_transform(range(1, CAST(len(s) AS BIGINT)),
                                  i -> s[i + 1] - s[i]) AS d
            FROM cand
        ),
        dmu AS (
            SELECT *, list_reduce(d, (a, v) -> a + v) / len(d) AS mu_d,
                   list_reduce(s, (a, v) -> a + v) / len(s) AS mu_s
            FROM dstats
        ),
        scored AS (
            SELECT series, n, kurt_o, w,
                   sqrt(list_reduce(list_transform(
                            d, v -> (v - mu_d) * (v - mu_d)), (a, v) -> a + v)
                        / len(d)) AS rough,
                   len(s) * list_reduce(list_transform(
                       s, v -> (v-mu_s)*(v-mu_s)*(v-mu_s)*(v-mu_s)), (a,v) -> a+v)
                   / nullif(pow(list_reduce(list_transform(
                         s, v -> (v-mu_s)*(v-mu_s)), (a,v) -> a+v), 2), 0) AS kurt
            FROM dmu
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY series ORDER BY rough ASC, w ASC) AS rk
            FROM scored
            WHERE w = 1 OR kurt >= kurt_o
        )
        SELECT series,
               CAST(n AS BIGINT) AS n_days,
               w AS w_chosen,
               round(rough, 6) AS roughness,
               round(kurt, 6) AS kurtosis,
               round(kurt_o, 6) AS kurtosis_orig
        FROM ranked WHERE rk = 1
    """,
)
def ts_asap_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    daily = (
        events.withColumn("day", F.date_trunc("day", F.col("ts")))
        .withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
        .groupBy(F.col("event_type").alias("series"), "day")
        .agg((F.sum("cents") / (100.0 * F.count(F.lit(1)))).alias("x"))
    )
    arrs = daily.groupBy("series").agg(
        F.expr("transform(array_sort(collect_list(struct(day, x))), s -> s.x)")
        .alias("xs"),
        F.count(F.lit(1)).alias("n"),
    ).filter(F.col("n") >= 4)  # roughness/kurtosis need >= 2 diffs and a
    # real candidate set; a 1-bucket series would make the d-sequence
    # descend and element_at throw under ANSI mode
    #
    # deliberately FEW partitions for the search stages: past this
    # point the data is one row PER SERIES (metadata-sized — the
    # chunk-catalog note), while the fold expressions below compile to
    # very large generated code; 32 near-empty tasks each paying that
    # closure cost measured ~20% of the query at sf0.1. But a flat
    # coalesce(1) serializes the heavy per-series folds through one
    # task when series cardinality is high — the realistic 100x axis
    # for this operator (r7 verdict). Shape the target on the actual
    # series count (one cheap HLL pre-pass on the pruned event_type
    # column) capped at the session's parallelism: 5 series -> 1-2
    # tasks and the closure cost stays out, 10k series -> every core
    # folds.
    n_series = int(
        events.agg(F.approx_count_distinct("event_type")).first()[0]
    )
    target = max(1, min(n_series, spark.sparkContext.defaultParallelism))
    arrs = arrs.coalesce(target)
    base = arrs.withColumn(
        "mu", F.expr("aggregate(xs, 0D, (a, v) -> a + v) / n")
    )
    okurt = base.select(
        "series", "xs", "n",
        F.expr(
            "n * aggregate(transform(xs, v -> (v-mu)*(v-mu)*(v-mu)*(v-mu)),"
            " 0D, (a, v) -> a + v)"
            " / nullif(pow(aggregate(transform(xs, v -> (v-mu)*(v-mu)),"
            " 0D, (a, v) -> a + v), 2), 0)"
        ).alias("kurt_o"),
    )
    cand = (
        okurt.select(
            "series", "n", "kurt_o", "xs",
            F.explode(
                F.expr("concat(array(1), sequence(2, greatest(least(15, n - 2), 1)))")
            ).alias("w0"),
        )
        .withColumn("w", F.col("w0").cast("long"))
        .drop("w0")
        .filter((F.col("w") == 1) | (F.col("w") <= F.col("n") - 2))
    )
    sma = cand.withColumn(
        "s",
        F.expr(
            "CASE WHEN w = 1 THEN xs ELSE"
            " transform(sequence(1, int(n - w + 1)),"
            " i -> aggregate(slice(xs, i, int(w)), 0D, (a, v) -> a + v) / w)"
            " END"
        ),
    )
    dstats = sma.withColumn(
        "d",
        F.expr("transform(sequence(1, greatest(size(s) - 1, 1)),"
               " i -> element_at(s, least(i + 1, size(s))) - element_at(s, i))"),
    )
    dmu = dstats.withColumn(
        "mu_d", F.expr("aggregate(d, 0D, (a, v) -> a + v) / size(d)")
    ).withColumn("mu_s", F.expr("aggregate(s, 0D, (a, v) -> a + v) / size(s)"))
    scored = dmu.select(
        "series", "n", "kurt_o", "w",
        F.expr(
            "sqrt(aggregate(transform(d, v -> (v - mu_d) * (v - mu_d)),"
            " 0D, (a, v) -> a + v) / size(d))"
        ).alias("rough"),
        F.expr(
            "size(s) * aggregate(transform(s, v -> (v-mu_s)*(v-mu_s)*(v-mu_s)*(v-mu_s)),"
            " 0D, (a, v) -> a + v)"
            " / nullif(pow(aggregate(transform(s, v -> (v-mu_s)*(v-mu_s)),"
            " 0D, (a, v) -> a + v), 2), 0)"
        ).alias("kurt"),
    )
    qualified = scored.filter((F.col("w") == 1) | (F.col("kurt") >= F.col("kurt_o")))
    # argmin per series as a min_by AGGREGATION instead of a
    # row_number window (r11): (rough, w) is a total order (w is
    # unique within a series), so min_by picks exactly the old rk=1
    # row, but the partial aggregate folds the 14-candidate rows
    # map-side — one HashAggregate replacing Sort + Exchange + Sort +
    # WindowGroupLimit + Window in the plan tail.
    return (
        qualified.groupBy("series")
        .agg(
            F.min_by(
                F.struct("n", "w", "rough", "kurt", "kurt_o"),
                F.struct("rough", "w"),
            ).alias("b")
        )
        .select(
            "series",
            F.col("b.n").alias("n_days"),
            F.col("b.w").alias("w_chosen"),
            F.round("b.rough", 6).alias("roughness"),
            F.round("b.kurt", 6).alias("kurtosis"),
            F.round("b.kurt_o", 6).alias("kurtosis_orig"),
        )
    )


@register(
    "ts_downsample_minmax_rollup",
    family="timeseries",
    doc="Hierarchical rollup of the min/max downsample: the 24-hour "
    "pixel row is computed by MERGING the 6-hour buckets' "
    "(value, ts) extreme structs — never re-reading raw points — "
    "while the oracle computes the 24-hour row DIRECTLY from the "
    "raw events, so the driver's value hash certifies the "
    "associativity claim itself (merge == direct), the same "
    "partial-merge contract as the cagg hierarchy (B43). Struct "
    "min/max carries the timestamp through the merge, so tie-breaks "
    "survive rollup.",
    oracle=f"""
        WITH b AS (
            SELECT event_type,
                   ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 86400) AS bucket_s,
                   value,
                   {_SQL_TS_MS} AS ts_ms
            FROM events
        ),
        r AS (
            SELECT *,
                   row_number() OVER (PARTITION BY event_type, bucket_s
                                      ORDER BY value ASC, ts_ms ASC) AS rmin,
                   row_number() OVER (PARTITION BY event_type, bucket_s
                                      ORDER BY value DESC, ts_ms DESC) AS rmax
            FROM b
        )
        SELECT event_type AS series,
               bucket_s,
               count(*) AS n_points,
               max(CASE WHEN rmin = 1 THEN value END) AS v_min,
               max(CASE WHEN rmin = 1 THEN ts_ms END) AS ts_min_ms,
               max(CASE WHEN rmax = 1 THEN value END) AS v_max,
               max(CASE WHEN rmax = 1 THEN ts_ms END) AS ts_max_ms
        FROM r
        GROUP BY 1, 2
    """,
)
def ts_downsample_minmax_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    six = ts_downsample_minmax(spark, sf_dir)
    return (
        six.withColumn("b24", F.col("bucket_s") - F.col("bucket_s") % 86400)
        .groupBy("series", F.col("b24").alias("bucket_s"))
        .agg(
            F.sum("n_points").alias("n_points"),
            F.min(F.struct("v_min", "ts_min_ms")).getField("v_min").alias("v_min"),
            F.min(F.struct("v_min", "ts_min_ms")).getField("ts_min_ms")
            .alias("ts_min_ms"),
            F.max(F.struct("v_max", "ts_max_ms")).getField("v_max").alias("v_max"),
            F.max(F.struct("v_max", "ts_max_ms")).getField("ts_max_ms")
            .alias("ts_max_ms"),
        )
    )


N_OUT = 20  # LTTB output points per series
_STEPS = N_OUT - 2  # interior bucket picks
_NEDGE = N_OUT - 1  # bucket edge count (0-based edges[0..17+1])


@register(
    "ts_lttb_codegen",
    family="timeseries",
    doc="LTTB (largest-triangle-three-buckets, Steinarsson 2013; the "
    "toolkit lttb() hyperfunction) as PURE whole-stage codegen: the "
    "inherently sequential select-next-point chain runs as an "
    "F.aggregate fold over the per-series bucket list — struct state "
    "carries (previous kept point, selections) — so unlike the "
    "applyInPandas form (B19, rows-only) this one is fully "
    "value-checked: the DuckDB oracle replays the identical fold as "
    "a recursive CTE with the same IEEE op order, so bucket means, "
    "triangle areas, and every argmax tie agree bit-for-bit. "
    "Integer-arithmetic bucket edges (no float linspace) keep the "
    "bucketing engine-exact. Per-series state is bounded by the "
    "bucket grain; parallelism = series count, same as B19.",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT event_type AS series,
                   epoch_us(date_trunc('day', ts)) // 1000000 AS day_s,
                   sum(CAST(round(value * 100) AS BIGINT))
                       / (100.0 * count(*)) AS y
            FROM events GROUP BY 1, 2
        ),
        arrs AS (
            SELECT series,
                   list(CAST(day_s AS DOUBLE) ORDER BY day_s) AS xs,
                   list(y ORDER BY day_s) AS ys,
                   count(*) AS n
            FROM daily GROUP BY series
        ),
        ed AS (
            SELECT series, xs, ys, n,
                   list_transform(range(0, {_NEDGE}),
                                  i -> 1 + (i * (n - 2)) // {_STEPS}) AS edges
            FROM arrs WHERE n > {N_OUT}
        ),
        rec AS (
            SELECT series, xs, ys, n, edges,
                   0 AS bi, CAST(0 AS BIGINT) AS prev,
                   CAST([] AS BIGINT[]) AS sel
            FROM ed
            UNION ALL
            SELECT series, xs, ys, n, edges, bi + 1,
                   lo + list_indexof(areas, list_aggregate(areas, 'max')) - 1,
                   list_append(
                       sel,
                       lo + list_indexof(areas, list_aggregate(areas, 'max')) - 1)
            FROM (
                SELECT *,
                       list_transform(
                           range(lo, hi),
                           j -> abs((px - ax) * (ys[j + 1] - py)
                                    - (px - xs[j + 1]) * (ay - py))) AS areas
                FROM (
                    SELECT *,
                           xs[prev + 1] AS px, ys[prev + 1] AS py,
                           list_reduce(xs[nlo + 1 : nhi], (a, v) -> a + v)
                               / (nhi - nlo) AS ax,
                           list_reduce(ys[nlo + 1 : nhi], (a, v) -> a + v)
                               / (nhi - nlo) AS ay
                    FROM (
                        SELECT *,
                               edges[bi + 1] AS lo,
                               edges[bi + 2] AS hi,
                               CASE WHEN bi + 2 < {_NEDGE} THEN edges[bi + 2]
                                    ELSE n - 1 END AS nlo,
                               CASE WHEN bi + 2 < {_NEDGE} THEN edges[bi + 3]
                                    ELSE n END AS nhi
                        FROM rec WHERE bi < {_STEPS}
                    )
                )
            )
        ),
        fin AS (
            SELECT series, xs, ys, n,
                   list_concat(list_concat([CAST(0 AS BIGINT)], sel),
                               [n - 1]) AS keep
            FROM rec WHERE bi = {_STEPS}
        )
        SELECT series,
               CAST(i - 1 AS BIGINT) AS pt_ord,
               CAST(xs[keep[i] + 1] AS BIGINT) AS t_s,
               round(ys[keep[i] + 1], 6) AS v
        FROM fin, unnest(range(1, {N_OUT} + 1)) AS u(i)
    """,
)
def ts_lttb_codegen(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    daily = (
        events.withColumn(
            "day_s",
            (F.unix_micros(F.date_trunc("day", F.col("ts"))) / 1_000_000)
            .cast("long"),
        )
        .withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
        .groupBy(F.col("event_type").alias("series"), "day_s")
        .agg((F.sum("cents") / (100.0 * F.count(F.lit(1)))).alias("y"))
    )
    arrs = daily.groupBy("series").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day_s, y))),"
            " s -> CAST(s.day_s AS DOUBLE))"
        ).alias("xs"),
        F.expr("transform(array_sort(collect_list(struct(day_s, y))), s -> s.y)")
        .alias("ys"),
        F.count(F.lit(1)).alias("n"),
    ).filter(F.col("n") > N_OUT)
    ed = arrs.withColumn(
        "edges",
        F.expr(
            f"transform(sequence(0, {_NEDGE - 1}),"
            f" i -> CAST(1 + (i * (n - 2)) DIV {_STEPS} AS BIGINT))"
        ),
    )
    # the sequential LTTB chain as a fold: state = (prev kept index,
    # selections so far); each step scores its bucket's candidates
    # against (prev point, next-bucket mean) and keeps the argmax
    # (first-match tiebreak on both engines)
    lo = f"element_at(edges, CAST(bi + 1 AS INT))"
    hi = f"element_at(edges, CAST(bi + 2 AS INT))"
    nlo = f"IF(bi + 2 < {_NEDGE}, element_at(edges, CAST(bi + 2 AS INT)), n - 1)"
    nhi = f"IF(bi + 2 < {_NEDGE}, element_at(edges, CAST(bi + 3 AS INT)), n)"
    px = "element_at(xs, CAST(acc.prev + 1 AS INT))"
    py = "element_at(ys, CAST(acc.prev + 1 AS INT))"
    # greatest(...) keeps the division total: the n > N_OUT filter
    # excludes degenerate buckets, but the optimizer inlines this
    # fold into the generator's size predicate where ANSI division
    # would still evaluate on filtered-out rows
    ax = (f"aggregate(slice(xs, CAST({nlo} + 1 AS INT), CAST({nhi} - {nlo} AS INT)),"
          f" 0D, (a, v) -> a + v) / greatest({nhi} - {nlo}, 1)")
    ay = (f"aggregate(slice(ys, CAST({nlo} + 1 AS INT), CAST({nhi} - {nlo} AS INT)),"
          f" 0D, (a, v) -> a + v) / greatest({nhi} - {nlo}, 1)")
    areas = (
        f"transform(sequence({lo} + 1, {hi}),"
        f" j1 -> abs(({px} - {ax}) * (element_at(ys, CAST(j1 AS INT)) - {py})"
        f" - ({px} - element_at(xs, CAST(j1 AS INT))) * ({ay} - {py})))"
    )
    newprev = f"({lo} + array_position({areas}, array_max({areas})) - 1)"
    fold = (
        f"aggregate(sequence(0, {_STEPS - 1}),"
        f" struct(CAST(0 AS BIGINT) AS prev, CAST(array() AS ARRAY<BIGINT>) AS sel),"
        f" (acc, bi) -> struct(CAST({newprev} AS BIGINT) AS prev,"
        f" concat(acc.sel, array(CAST({newprev} AS BIGINT))) AS sel))"
    )
    fin = ed.withColumn(
        "keep",
        F.expr(f"concat(array(CAST(0 AS BIGINT)), ({fold}).sel, array(n - 1))"),
    )
    return fin.select(
        "series", "xs", "ys", F.posexplode("keep").alias("pt_ord", "idx")
    ).select(
        "series",
        F.col("pt_ord").cast("long").alias("pt_ord"),
        F.expr("CAST(element_at(xs, CAST(idx + 1 AS INT)) AS BIGINT)").alias("t_s"),
        F.expr("round(element_at(ys, CAST(idx + 1 AS INT)), 6)").alias("v"),
    )


@register(
    "ts_audience_overlap",
    family="timeseries",
    doc="Pairwise distinct-user overlap between event types (audience "
    "overlap / segment intersection): ONE user-keyed shuffle folds "
    "each user into a 5-bit type bitmask, the mask histogram is 32 "
    "rows, and every pairwise intersection/union then reads off the "
    "histogram with a broadcast-sized expansion — no per-pair "
    "distinct-count passes, no self-join of the user set. The exact "
    "form of what a theta/minhash sketch estimates at 100 TB; "
    "per-pair Jaccard of the user sets comes free from the same "
    "histogram.",
    oracle="""
        WITH types AS (
            SELECT event_type,
                   row_number() OVER (ORDER BY event_type) - 1 AS bit
            FROM (SELECT DISTINCT event_type FROM events)
        ),
        per_user AS (
            SELECT e.user_id,
                   CAST(sum(DISTINCT CAST(pow(2, t.bit) AS BIGINT)) AS BIGINT)
                       AS mask
            FROM events e JOIN types t USING (event_type)
            GROUP BY e.user_id
        ),
        hist AS (SELECT mask, count(*) AS c FROM per_user GROUP BY mask),
        pairs AS (
            SELECT a.event_type AS type_a, a.bit AS bit_a,
                   b.event_type AS type_b, b.bit AS bit_b
            FROM types a JOIN types b ON a.event_type < b.event_type
        )
        SELECT p.type_a,
               p.type_b,
               CAST(sum(CASE WHEN (h.mask // CAST(pow(2, p.bit_a) AS BIGINT)) % 2 = 1
                              AND (h.mask // CAST(pow(2, p.bit_b) AS BIGINT)) % 2 = 1
                             THEN h.c ELSE 0 END) AS BIGINT) AS n_both,
               CAST(sum(CASE WHEN (h.mask // CAST(pow(2, p.bit_a) AS BIGINT)) % 2 = 1
                               OR (h.mask // CAST(pow(2, p.bit_b) AS BIGINT)) % 2 = 1
                             THEN h.c ELSE 0 END) AS BIGINT) AS n_either,
               round(sum(CASE WHEN (h.mask // CAST(pow(2, p.bit_a) AS BIGINT)) % 2 = 1
                               AND (h.mask // CAST(pow(2, p.bit_b) AS BIGINT)) % 2 = 1
                              THEN h.c ELSE 0 END)
                     * 1.0 /
                     sum(CASE WHEN (h.mask // CAST(pow(2, p.bit_a) AS BIGINT)) % 2 = 1
                               OR (h.mask // CAST(pow(2, p.bit_b) AS BIGINT)) % 2 = 1
                              THEN h.c ELSE 0 END), 6) AS user_jaccard
        FROM pairs p, hist h
        GROUP BY p.type_a, p.type_b
    """,
)
def ts_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    types = (
        events.select("event_type").distinct()
        .withColumn(
            "bit",
            # deliberate single partition: the TYPE LIST is
            # metadata-sized (same note as catalog/chunks.py)
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy("event_type")
            ) - 1,
        )
        # bitmask representation is only exact below 64 types: Spark
        # shiftleft(1L, bit) wraps at bit>=64 and the oracle's
        # pow(2,bit) loses integer exactness past 2^53 — fail loudly
        # instead of silently aliasing masks on a wider taxonomy
        # (switch to an array-of-bits mask beyond 62).
        .withColumn(
            "bit",
            F.when(F.col("bit") < 62, F.col("bit")).otherwise(
                F.raise_error(
                    F.lit("ts_audience_overlap: >62 distinct event types "
                          "exceed the 64-bit mask representation")
                ).cast("int")
            ),
        )
    )
    per_user = (
        events.join(F.broadcast(types), "event_type")
        .groupBy("user_id")
        .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("mask"))
    )
    hist = per_user.groupBy("mask").agg(F.count(F.lit(1)).alias("c"))
    a, b = types.alias("a"), types.alias("b")
    pairs = a.join(b, F.col("a.event_type") < F.col("b.event_type")).select(
        F.col("a.event_type").alias("type_a"), F.col("a.bit").alias("bit_a"),
        F.col("b.event_type").alias("type_b"), F.col("b.bit").alias("bit_b"),
    )
    has_a = F.expr("shiftright(mask, bit_a) % 2 = 1")
    has_b = F.expr("shiftright(mask, bit_b) % 2 = 1")
    both = F.sum(F.when(has_a & has_b, F.col("c")).otherwise(F.lit(0)))
    either = F.sum(F.when(has_a | has_b, F.col("c")).otherwise(F.lit(0)))
    return (
        pairs.crossJoin(F.broadcast(hist))
        .groupBy("type_a", "type_b")
        .agg(
            both.alias("n_both"),
            either.alias("n_either"),
            F.round(both / either, 6).alias("user_jaccard"),
        )
    )


HOUR = 3600
DAY = 86400
# hour-bucket expression over the aggregate max(ts) (the oracle's
# watermark derivation must mirror time_bucket_epoch exactly)
_SQL_MAX_EPOCH_S = "(epoch_us(max(ts)) // 1000000)"


def _sql_b(width_s: int) -> str:
    return f"({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {width_s})"


@register(
    "ts_cagg_realtime",
    family="timeseries",
    doc="Real-time continuous aggregate — TimescaleDB's flagship read "
    "path (caggs are first-class catalog relations, reference "
    "internal/systemcatalog/catalogeventhandler.go): the query over a "
    "realtime cagg returns MATERIALIZED buckets below the "
    "materialization watermark UNION ALL the aggregation of RAW rows "
    "at-or-after it, so dashboards see data the refresh job hasn't "
    "materialized yet. Watermark here = last hour boundary minus one "
    "day, so the raw tail is a full day of buckets. The watermark is "
    "bucket-aligned, hence the two tiers are disjoint bucket sets and "
    "the union needs no merge re-aggregation; the tail filter is a "
    "pushed literal ts predicate (chunk exclusion of history). The "
    "oracle aggregates raw directly over EVERYTHING — materialized ∪ "
    "tail must equal the direct aggregate exactly (the B43 contract), "
    "which sums on integer cents guarantee.",
    oracle=f"""
        WITH wm AS (
            SELECT ({_SQL_MAX_EPOCH_S} - {_SQL_MAX_EPOCH_S} % {HOUR}) - {DAY}
                       AS wm_s
            FROM events
        )
        SELECT event_type,
               {_sql_b(HOUR)} AS bucket_s,
               CASE WHEN {_sql_b(HOUR)} < wm_s
                    THEN 'materialized' ELSE 'raw_tail' END AS tier,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value,
               min(value) AS min_value,
               max(value) AS max_value,
               floor(sum(CAST(round(value * 100) AS BIGINT)) * 10000.0
                     / count(*) + 0.5) / 1000000.0 AS avg_value
        FROM events, wm
        GROUP BY 1, 2, 3
    """,
)
def ts_cagg_realtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.functions.cagg import (
        cagg_partials,
        realtime_cagg_read,
    )

    # exact integer cents so merge == direct whatever the split (the
    # same discipline as ts_cagg_incremental_refresh)
    events = load(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    # materialization watermark: one day behind the last completed
    # hour (1-row agg action, the B20 precedent — metadata-sized)
    wm_s = (
        events.agg(time_bucket_epoch(F.max("ts"), HOUR)).first()[0] - DAY
    )
    materialized = cagg_partials(
        events.filter(F.col("ts") < F.timestamp_seconds(F.lit(wm_s))),
        ["event_type"], HOUR, sum_col="cents",
    )
    read = realtime_cagg_read(
        materialized, events, ["event_type"], HOUR, wm_s, sum_col="cents"
    )
    return read.select(
        "event_type",
        "bucket_s",
        F.when(F.col("bucket_s") < wm_s, F.lit("materialized"))
        .otherwise(F.lit("raw_tail")).alias("tier"),
        "n",
        (F.col("sum_value") / 100.0).alias("sum_value"),
        "min_value",
        "max_value",
        (F.floor(F.col("sum_value") * 10000.0 / F.col("n") + 0.5) / 1000000.0)
        .alias("avg_value"),
    )


@register(
    "ts_count_distinct_hll",
    family="timeseries",
    # rows-only: HLL++ register contents are engine-specific, so no
    # cross-engine oracle exists BY DESIGN; the <=2% relative-error
    # contract vs the exact ts_count_distinct is asserted in
    # tests/test_timeseries3.py (and ts_count_distinct stays the
    # value-exact sibling — the D12/E11 pattern).
    doc="The 100 TB swap-in for ts_count_distinct (B22): per-hypertable "
    "distinct-series cardinality via HyperLogLog++ "
    "(approx_count_distinct, rsd=0.02 — toolkit hyperloglog analog). "
    "Sketch partials merge map-side, so the shuffle moves one "
    "register set per (type, partition) instead of the user_id "
    "stream: the aggregate's traffic is independent of row count.",
)
def ts_count_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "ts_freq_agg_topk_sketch",
    family="timeseries",
    # rows-only: batch boundaries (and therefore the exact truncation
    # losses) are an execution detail no SQL oracle can replay; the
    # Misra-Gries bound est <= true <= est + err_bound and full
    # heavy-hitter recall vs the exact ts_freq_agg are asserted in
    # tests/test_timeseries3.py.
    doc="The 100 TB swap-in for ts_freq_agg (B24): per-hypertable "
    "heavy-hitter users via the truncate-and-merge space-saving "
    "summary (operators/sketches.topk_space_saving, m=256): each "
    "Arrow batch keeps its exact top-256 plus a truncation threshold, "
    "partials merge by summation, and every item with true share >= "
    "0.8% (> n/256) is GUARANTEED to surface with "
    "est <= true <= est + err_bound. Only sketch-sized rows shuffle — "
    "the raw user stream never does.",
)
def ts_freq_agg_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.operators.sketches import (
        topk_space_saving,
    )

    events = load(spark, sf_dir, "events")
    sk = topk_space_saving(events, "event_type", "user_id", m=256)
    w = Window.partitionBy("event_type").orderBy(
        F.col("est_count").desc(), F.col("user_id")
    )
    return (
        sk.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("event_type", "user_id", "est_count", "err_bound", "rank")
    )


@register(
    "ts_compression_policy",
    family="timeseries",
    doc="Columnar-compression policy planner — the compress_chunk "
    "batching TimescaleDB applies to chunks past the policy horizon "
    "(the catalog tracks hypertable<->compressed-hypertable pairs, "
    "reference internal/systemcatalog/systemcatalog.go:51, and the "
    "resolver handles the resulting compression markers, "
    "replicationresolver.go:84). Per 7-day chunk: compress when the "
    "chunk's END is at least two full chunk intervals behind the "
    "newest chunk start (i.e. the chunk START is 21 days back); "
    "segment_by = user_id, order_by = ts, batches of up to 1000 rows "
    "per segment (the TimescaleDB batch size). Output is the "
    "chunk-grain plan: segment count, batch count, rows, and the "
    "projected row reduction (each batch collapses to one compressed "
    "row). One scan + one (chunk, segment)-keyed reduce + a "
    "metadata-sized chunk fold; the 1-row max-ts broadcast is the "
    "gapfill-bounds pattern.",
    oracle=f"""
        WITH mx AS (
            SELECT ({_SQL_MAX_EPOCH_S} - {_SQL_MAX_EPOCH_S} % 604800)
                       AS newest_chunk_s
            FROM events
        ),
        seg AS (
            SELECT event_type AS hypertable_name,
                   ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 604800) AS range_start_s,
                   user_id AS segment_key,
                   count(*) AS seg_rows
            FROM events
            GROUP BY 1, 2, 3
        )
        SELECT hypertable_name,
               range_start_s,
               range_start_s + 604800 <= newest_chunk_s - 1209600
                   AS compress,
               count(*) AS n_segments,
               CAST(sum(ceil(seg_rows / 1000.0)) AS BIGINT) AS n_batches,
               CAST(sum(seg_rows) AS BIGINT) AS n_rows,
               CAST(CASE WHEN range_start_s + 604800
                              <= newest_chunk_s - 1209600
                         THEN sum(seg_rows)
                              - CAST(sum(ceil(seg_rows / 1000.0)) AS BIGINT)
                         ELSE 0 END AS BIGINT) AS rows_saved
        FROM seg, mx
        GROUP BY 1, 2, newest_chunk_s
    """,
)
def ts_compression_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.catalog.chunks import (
        CHUNK_INTERVAL_S,
        chunk_start_epoch,
    )

    events = load(spark, sf_dir, "events")
    # policy horizon: chunk end at least two chunk intervals behind
    # the newest chunk start (metadata-sized 1-row action — the
    # B20/B50 precedent)
    newest_chunk_s = events.agg(
        chunk_start_epoch(F.max("ts"))
    ).first()[0]
    cutoff = newest_chunk_s - 2 * CHUNK_INTERVAL_S
    seg = (
        events.select(
            F.col("event_type").alias("hypertable_name"),
            chunk_start_epoch(F.col("ts")).alias("range_start_s"),
            F.col("user_id").alias("segment_key"),
        )
        .groupBy("hypertable_name", "range_start_s", "segment_key")
        .agg(F.count(F.lit(1)).alias("seg_rows"))
    )
    compress = F.col("range_start_s") + CHUNK_INTERVAL_S <= F.lit(cutoff)
    n_batches = F.sum(F.ceil(F.col("seg_rows") / 1000.0)).cast("long")
    return (
        seg.groupBy("hypertable_name", "range_start_s")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            n_batches.alias("n_batches"),
            F.sum("seg_rows").alias("n_rows"),
        )
        .select(
            "hypertable_name",
            "range_start_s",
            compress.alias("compress"),
            "n_segments",
            "n_batches",
            "n_rows",
            F.when(compress, F.col("n_rows") - F.col("n_batches"))
            .otherwise(F.lit(0)).alias("rows_saved"),
        )
    )


@register(
    "ts_cagg_realtime_invalidation",
    family="timeseries",
    doc="Real-time cagg read UNDER PENDING INVALIDATIONS — B20 + B26 "
    "+ B50 composed into TimescaleDB's actual refresh-lag read path: "
    "the materialization was built from a STALE snapshot (updates "
    "add +1.00 afterwards, deletes remove rows — the derived CDC "
    "ops), so the read serves (a) CLEAN materialized buckets below "
    "the watermark untouched, (b) DIRTY buckets (any u/d hit them, "
    "the B26 invalidation log) recomputed from the CURRENT raw "
    "state, and (c) the raw tail at-or-after the watermark. The "
    "oracle aggregates the current state directly — if a dirty "
    "bucket were ever served from the stale materialization its "
    "values would differ and the hash check would catch it, so the "
    "certification proves the invalidation ROUTING, not just the "
    "arithmetic. Dirty set is bucket-grain metadata (broadcast "
    "anti/semi joins); three disjoint branches, no merge re-agg.",
    oracle=f"""
        WITH wm AS (
            SELECT ({_SQL_MAX_EPOCH_S} - {_SQL_MAX_EPOCH_S} % {HOUR}) - {DAY}
                       AS wm_s
            FROM events
        ),
        cur AS (
            SELECT event_type,
                   {_sql_b(HOUR)} AS bucket_s,
                   CASE WHEN event_id % 10 IN (1, 2)
                        THEN CAST(round(value * 100) AS BIGINT) + 100
                        ELSE CAST(round(value * 100) AS BIGINT) END AS cents,
                   CASE WHEN event_id % 10 IN (1, 2)
                        THEN value + 1.0 ELSE value END AS v
            FROM events
            WHERE event_id % 10 <> 0
        ),
        dirty AS (
            SELECT DISTINCT event_type, {_sql_b(HOUR)} AS bucket_s
            FROM events, wm
            WHERE event_id % 10 IN (0, 1, 2) AND {_sql_b(HOUR)} < wm_s
        )
        SELECT c.event_type,
               c.bucket_s,
               CASE WHEN c.bucket_s >= wm_s THEN 'raw_tail'
                    WHEN d.event_type IS NOT NULL THEN 'recomputed'
                    ELSE 'materialized' END AS tier,
               count(*) AS n,
               sum(c.cents) / 100.0 AS sum_value,
               min(c.v) AS min_value,
               max(c.v) AS max_value,
               floor(sum(c.cents) * 10000.0 / count(*) + 0.5) / 1000000.0
                   AS avg_value
        FROM cur c
        LEFT JOIN dirty d
          ON c.event_type = d.event_type AND c.bucket_s = d.bucket_s, wm
        GROUP BY 1, 2, 3
    """,
)
def ts_cagg_realtime_invalidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.cdc.envelope import derive_op
    from timescaledb_event_streamer_spark.functions.cagg import cagg_partials

    events = load(spark, sf_dir, "events").withColumn(
        "op", derive_op(F.col("event_id"))
    )
    # the CURRENT table state: updates applied (+1.00), deletes gone
    cur = events.filter(F.col("op") != "d").select(
        "event_type",
        "ts",
        F.when(F.col("op") == "u", F.col("value") + 1.0)
        .otherwise(F.col("value")).alias("value"),
        (F.when(F.col("op") == "u",
                F.round(F.col("value") * 100, 0).cast("long") + 100)
         .otherwise(F.round(F.col("value") * 100, 0).cast("long")))
        .alias("cents"),
    )
    # the STALE snapshot the materialization was built from
    stale = events.select(
        "event_type", "ts", "value",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    wm_s = (
        events.agg(time_bucket_epoch(F.max("ts"), HOUR)).first()[0] - DAY
    )
    wm_ts = F.timestamp_seconds(F.lit(wm_s))

    # B26's invalidation log at bucket grain (metadata-sized)
    dirty = (
        events.filter(F.col("op").isin("u", "d") & (F.col("ts") < wm_ts))
        .select(
            "event_type", time_bucket_epoch(F.col("ts"), HOUR).alias("bucket_s")
        )
        .distinct()
    )
    mat_clean = cagg_partials(
        stale.filter(F.col("ts") < wm_ts), ["event_type"], HOUR, sum_col="cents"
    ).join(F.broadcast(dirty), ["event_type", "bucket_s"], "left_anti")
    recomputed = cagg_partials(
        cur.filter(F.col("ts") < wm_ts), ["event_type"], HOUR, sum_col="cents"
    ).join(F.broadcast(dirty), ["event_type", "bucket_s"], "left_semi")
    tail = cagg_partials(
        cur.filter(F.col("ts") >= wm_ts), ["event_type"], HOUR, sum_col="cents"
    )
    read = (
        mat_clean.withColumn("tier", F.lit("materialized"))
        .unionByName(recomputed.withColumn("tier", F.lit("recomputed")))
        .unionByName(tail.withColumn("tier", F.lit("raw_tail")))
    )
    return read.select(
        "event_type",
        "bucket_s",
        "tier",
        "n",
        (F.col("sum_value") / 100.0).alias("sum_value"),
        "min_value",
        "max_value",
        (F.floor(F.col("sum_value") * 10000.0 / F.col("n") + 0.5) / 1000000.0)
        .alias("avg_value"),
    )


@register(
    "ts_compressed_roundtrip",
    family="timeseries",
    doc="Columnar compressed-chunk ROUNDTRIP — the read path for the "
    "layout ts_compression_policy (B53) plans: each (chunk, "
    "segment_by=user_id) slice stores order_by=ts batches of up to "
    "1000 rows as columnar arrays (TimescaleDB's compressed-chunk "
    "row format; catalog pairs internal/systemcatalog/"
    "systemcatalog.go:51, markers replicationresolver.go:84). This "
    "operator BUILDS the compressed form (one (chunk,segment)-keyed "
    "window for batch ids + ordered array fold) and then READS IT "
    "BACK: row/batch counts, exact cent-sums, and the first/last "
    "values taken from the array heads/tails WITHOUT re-sorting — "
    "so a layout that lost the order_by invariant or dropped rows "
    "hash-mismatches the oracle, which computes the same facts from "
    "the raw uncompressed table. first/last tie-break on event_id "
    "in BOTH engines, so they stay deterministic even when "
    "ms-truncated timestamps collide. Integer cents "
    "arithmetic keeps every column exact. Scale: shuffles are "
    "segment-grain, batches bound array width at 1000 rows; the "
    "explode is a per-partition codegen unnest, no extra exchange.",
    oracle=f"""
        WITH e AS (
            SELECT event_type AS hypertable_name,
                   ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 604800)
                       AS range_start_s,
                   user_id AS segment_key,
                   {_SQL_TS_MS} AS ts_ms,
                   event_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT hypertable_name,
               range_start_s,
               segment_key,
               count(*) AS n_rows,
               CAST(ceil(count(*) / 1000.0) AS BIGINT) AS n_batches,
               CAST(sum(cents) AS BIGINT) AS sum_cents,
               min(ts_ms) AS ts_min_ms,
               max(ts_ms) AS ts_max_ms,
               first(cents ORDER BY ts_ms, event_id) AS first_cents,
               last(cents ORDER BY ts_ms, event_id) AS last_cents
        FROM e
        GROUP BY 1, 2, 3
    """,
)
def ts_compressed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return compressed_roundtrip(events)


def compressed_roundtrip(events: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    e = events.select(
        F.col("event_type").alias("hypertable_name"),
        (F.unix_micros(F.col("ts")) / 1000000).cast("long").alias("epoch_s"),
        F.col("user_id").alias("segment_key"),
        (F.unix_micros(F.col("ts")) / 1000).cast("long").alias("ts_ms"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).withColumn(
        "range_start_s", F.col("epoch_s") - F.col("epoch_s") % 604800
    )
    seg_cols = ["hypertable_name", "range_start_s", "segment_key"]
    w = Window.partitionBy(*seg_cols).orderBy("ts_ms", "event_id")
    # compression: batch id from the order_by rank, then each batch
    # folds to ONE row holding its columns as ordered arrays — the
    # compressed-chunk row format
    compressed = (
        e.withColumn(
            "batch_id", F.floor((F.row_number().over(w) - 1) / 1000)
        )
        .groupBy(*seg_cols, "batch_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts_ms", "event_id", "cents"))
            ).alias("batch")
        )
    )
    # decompression read: per-batch facts come from the ARRAYS as
    # stored (heads/tails untouched by any re-sort); the segment fold
    # then reduces batch-grain rows only
    per_batch = compressed.select(
        *seg_cols,
        "batch_id",
        F.size("batch").alias("b_rows"),
        F.aggregate(
            F.col("batch"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x["cents"],
        ).alias("b_cents"),
        F.element_at("batch", 1).alias("head"),
        F.element_at("batch", -1).alias("tail"),
    )
    return per_batch.groupBy(*seg_cols).agg(
        F.sum("b_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("b_cents").alias("sum_cents"),
        F.min(F.col("head")["ts_ms"]).alias("ts_min_ms"),
        F.max(F.col("tail")["ts_ms"]).alias("ts_max_ms"),
        F.min_by(F.col("head")["cents"], F.col("batch_id")).alias("first_cents"),
        F.max_by(F.col("tail")["cents"], F.col("batch_id")).alias("last_cents"),
    )


@register(
    "ts_downsample_m4",
    family="timeseries",
    doc="M4 downsample (Jugel et al., VLDB 2014): per series and "
    "6-hour pixel bucket keep min, max, FIRST and LAST — the four "
    "points that make a line chart pixel-exact, where min/max alone "
    "(B45) can misdraw the bucket-boundary segments. Still a pure "
    "associative aggregate: min/max over (value, ts) AND (ts, value) "
    "structs in ONE shuffle with map-side partials, so it rolls up "
    "hierarchically like a cagg. first/last tie-break on event_id in "
    "BOTH engines (raw-ts uniqueness does not survive the ms "
    "truncation), the B55 discipline.",
    oracle=f"""
        WITH b AS (
            SELECT event_type,
                   ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {SIX_HOURS}) AS bucket_s,
                   value,
                   event_id,
                   {_SQL_TS_MS} AS ts_ms
            FROM events
        )
        SELECT event_type AS series,
               bucket_s,
               count(*) AS n_points,
               min(value) AS v_min,
               max(value) AS v_max,
               min(ts_ms) AS ts_first_ms,
               first(value ORDER BY ts_ms, event_id) AS v_first,
               max(ts_ms) AS ts_last_ms,
               last(value ORDER BY ts_ms, event_id) AS v_last
        FROM b
        GROUP BY 1, 2
    """,
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    ts_ms = (F.unix_micros(F.col("ts")) / 1000).cast("long")
    tpt = F.struct(ts_ms.alias("ts_ms"), F.col("event_id"), F.col("value"))
    return (
        events.select(
            F.col("event_type").alias("series"),
            time_bucket_epoch(F.col("ts"), SIX_HOURS).alias("bucket_s"),
            F.col("value"),
            tpt.alias("tpt"),
        )
        .groupBy("series", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.min("tpt").getField("ts_ms").alias("ts_first_ms"),
            F.min("tpt").getField("value").alias("v_first"),
            F.max("tpt").getField("ts_ms").alias("ts_last_ms"),
            F.max("tpt").getField("value").alias("v_last"),
        )
    )


@register(
    "ts_hist2d",
    family="timeseries",
    doc="2-D time x value histogram (B57) — the Grafana/TimescaleDB "
    "heatmap panel shape: per (series, 1-day time bucket, fixed "
    "10-wide value bin) cell count and exact cent mass. One "
    "associative shuffle with map-side partials (cells are the "
    "grain, so shuffle traffic is heatmap-resolution-sized, not "
    "event-sized), rolls up over either axis like a cagg.",
    oracle=f"""
        SELECT event_type AS series,
               ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 86400) AS bucket_s,
               CAST(floor(value / 10) AS BIGINT) AS v_bin,
               count(*) AS n_points,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events
        GROUP BY 1, 2, 3
    """,
)
def ts_hist2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.select(
            F.col("event_type").alias("series"),
            time_bucket_epoch(F.col("ts"), 86400).alias("bucket_s"),
            F.floor(F.col("value") / 10).cast("long").alias("v_bin"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("series", "bucket_s", "v_bin")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("cents").alias("sum_cents"),
        )
    )


@register(
    "ts_holt_linear",
    family="timeseries",
    doc="Holt's linear trend (double exponential smoothing, "
    "alpha=0.5 beta=0.3) per series over the daily-bucketed mean, "
    "with a 1-step-ahead forecast — the trend-aware sibling of "
    "ts_ewma that a dashboarding user reaches for next. The "
    "recurrence has no closed window form (level and trend couple), "
    "so it runs as a SEQUENTIAL left-fold over the ordered daily "
    "array with an (level, trend) array accumulator (standard init: "
    "level = 2nd point, trend = 1st difference): Spark "
    "aggregate == DuckDB list_reduce with the init state prepended "
    "as the first element (DuckDB 1.0 has no 3-arg fold), identical "
    "IEEE op order, so the floats agree bit-for-bit. Daily means "
    "use the exact integer-cents trick, making the fold input "
    "order-independent. State is bounded by the day grain per "
    "series (the chunk-catalog bound), never raw event volume.",
    oracle="""
        WITH daily AS (
            SELECT event_type AS series, date_trunc('day', ts) AS day,
                   sum(CAST(round(value * 100) AS BIGINT))
                       / (100.0 * count(*)) AS x
            FROM events GROUP BY 1, 2
        ),
        arrs AS (
            SELECT series, list(x ORDER BY day) AS xs,
                   CAST(count(*) AS BIGINT) AS n
            FROM daily GROUP BY series
            HAVING count(*) >= 3
        ),
        folded AS (
            SELECT series, n,
                   list_reduce(
                       list_concat(
                           [[xs[2], xs[2] - xs[1]]],
                           list_transform(list_slice(xs, 3, n),
                                          v -> [v, 0.0])),
                       (a, v) -> [
                           0.5 * v[1] + 0.5 * (a[1] + a[2]),
                           0.3 * ((0.5 * v[1] + 0.5 * (a[1] + a[2])) - a[1])
                               + 0.7 * a[2]
                       ]) AS lt
            FROM arrs
        )
        SELECT series, n AS n_days,
               round(lt[1], 6) AS level,
               round(lt[2], 6) AS trend,
               round(lt[1] + lt[2], 6) AS forecast_1
        FROM folded
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    return holt_linear(load(spark, sf_dir, "events"))


def holt_linear(events: DataFrame) -> DataFrame:
    daily = (
        events.withColumn("day", F.date_trunc("day", F.col("ts")))
        .withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
        .groupBy(F.col("event_type").alias("series"), "day")
        .agg((F.sum("cents") / (100.0 * F.count(F.lit(1)))).alias("x"))
    )
    arrs = (
        daily.groupBy("series")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(day, x))), s -> s.x)")
            .alias("xs"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 3)
        # one row per series past this point (metadata-sized) — same
        # single-partition rationale as ts_asap_smooth: don't pay the
        # generated-fold closure cost on 32 near-empty tasks
        .coalesce(1)
    )
    # (level, trend) accumulator; the trend line recomputes level'
    # inline because neither engine's lambda has a let-binding — the
    # duplicated expression is evaluated identically on both sides
    folded = arrs.withColumn(
        "lt",
        F.expr(
            "aggregate(slice(xs, 3, int(n - 2)),"
            " array(element_at(xs, 2), element_at(xs, 2) - element_at(xs, 1)),"
            " (a, v) -> array("
            "   0.5 * v + 0.5 * (element_at(a, 1) + element_at(a, 2)),"
            "   0.3 * ((0.5 * v + 0.5 * (element_at(a, 1) + element_at(a, 2)))"
            "       - element_at(a, 1))"
            "     + 0.7 * element_at(a, 2)))"
        ),
    )
    return folded.select(
        "series",
        F.col("n").alias("n_days"),
        F.round(F.expr("element_at(lt, 1)"), 6).alias("level"),
        F.round(F.expr("element_at(lt, 2)"), 6).alias("trend"),
        F.round(F.expr("element_at(lt, 1) + element_at(lt, 2)"), 6).alias(
            "forecast_1"
        ),
    )
