"""Round-7 additions: the continuous-aggregate scheduled-refresh
policy planner (B76) and companions.

Reference motivation: the one reference test without a named operator
mapping before this round — Test_ContinuousAggregate_Scheduled_Refresh
_Create_Events (tests/streamer_test.go:1235) drives a bgw_job
refresh policy (`alter_job(j.id, next_start => now() + interval '5
seconds')`) and asserts the refreshed buckets stream out in order.
The policy itself is TimescaleDB's add_continuous_aggregate_policy
(start_offset / end_offset / schedule_interval): each scheduled run
refreshes the COMPLETE buckets inside the bucket-aligned window
[now - start_offset, now - end_offset) that invalidation records mark
dirty, then reschedules itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.caching import scoped_persist
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load

#: policy geometry for the planner query: hourly buckets, refresh
#: the last 7 days up to the last complete hour, run hourly
_BUCKET_S = 3600
_START_OFFSET_S = 7 * 86400
_END_OFFSET_S = 3600
_SCHEDULE_INTERVAL_S = 3600

_SQL_EPOCH_S = "(epoch_us(ts) // 1000000)"
_SQL_BUCKET = f"({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {_BUCKET_S})"

#: exact integer cents of the value column (the repo-wide convention)
_SQL_CENTS_R7 = "CAST(round(value * 100) AS BIGINT)"


@register(
    "ts_cagg_refresh_policy",
    family="timeseries",
    doc="Scheduled continuous-aggregate refresh policy planner (B76, "
    "reference test Test_ContinuousAggregate_Scheduled_Refresh_"
    "Create_Events, tests/streamer_test.go:1235): given the policy "
    "(start_offset 7d, end_offset 1h, schedule_interval 1h) and the "
    "invalidation watermark, produce the buckets-to-refresh plan one "
    "policy run executes — per (hypertable, bucket): row count, last "
    "write LSN, invalidated (written after the cagg's last "
    "materialization), inside the bucket-aligned refresh window "
    "[now-start_offset, now-end_offset) counting only COMPLETE "
    "buckets, the refresh verdict, and the run's next_start (the "
    "alter_job next_start the reference test drives). The refresh "
    "itself is B20's partial merge; this plans WHAT it touches. "
    "Scale: one scan -> (hypertable, bucket)-keyed aggregate "
    "(map-side combinable), scalar policy row broadcast — output is "
    "bucket-grain metadata, never row-grain.",
    oracle=f"""
        WITH pol AS (
            SELECT max({_SQL_EPOCH_S}) AS now_s,
                   max(event_id) * 9 // 10 AS mat_lsn
            FROM events
        ),
        buckets AS (
            SELECT event_type AS hypertable,
                   {_SQL_BUCKET} AS bucket_s,
                   count(*) AS n_rows,
                   max(event_id) AS last_lsn
            FROM events
            GROUP BY 1, 2
        )
        SELECT b.hypertable, b.bucket_s,
               CAST(b.n_rows AS BIGINT) AS n_rows,
               b.last_lsn,
               b.last_lsn > p.mat_lsn AS invalidated,
               b.bucket_s >= (p.now_s - {_START_OFFSET_S})
                   - (p.now_s - {_START_OFFSET_S}) % {_BUCKET_S}
               AND b.bucket_s + {_BUCKET_S}
                   <= (p.now_s - {_END_OFFSET_S})
                      - (p.now_s - {_END_OFFSET_S}) % {_BUCKET_S}
                   AS in_window,
               (b.last_lsn > p.mat_lsn)
               AND b.bucket_s >= (p.now_s - {_START_OFFSET_S})
                   - (p.now_s - {_START_OFFSET_S}) % {_BUCKET_S}
               AND b.bucket_s + {_BUCKET_S}
                   <= (p.now_s - {_END_OFFSET_S})
                      - (p.now_s - {_END_OFFSET_S}) % {_BUCKET_S}
                   AS needs_refresh,
               (p.now_s - {_START_OFFSET_S})
                   - (p.now_s - {_START_OFFSET_S}) % {_BUCKET_S}
                   AS window_start_s,
               (p.now_s - {_END_OFFSET_S})
                   - (p.now_s - {_END_OFFSET_S}) % {_BUCKET_S}
                   AS window_end_s,
               p.now_s + {_SCHEDULE_INTERVAL_S} AS next_start_s
        FROM buckets b CROSS JOIN pol p
    """,
)
def ts_cagg_refresh_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    es = F.expr("unix_micros(ts) div 1000000")
    # policy scalars: "now" pinned to the newest point (deterministic),
    # materialization watermark at the 90th-percentile LSN so both
    # invalidated branches coexist inside the refresh window
    pol = events.agg(
        F.max(es).alias("now_s"),
        F.expr("max(event_id) * 9 div 10").alias("mat_lsn"),
    )
    buckets = (
        events.select(
            F.col("event_type").alias("hypertable"),
            (es - es % _BUCKET_S).alias("bucket_s"),
            "event_id",
        )
        .groupBy("hypertable", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("event_id").alias("last_lsn"),
        )
    )
    raw_start = F.col("now_s") - _START_OFFSET_S
    raw_end = F.col("now_s") - _END_OFFSET_S
    win_start = raw_start - raw_start % _BUCKET_S
    win_end = raw_end - raw_end % _BUCKET_S
    invalidated = F.col("last_lsn") > F.col("mat_lsn")
    in_window = (F.col("bucket_s") >= win_start) & (
        F.col("bucket_s") + _BUCKET_S <= win_end
    )
    return buckets.crossJoin(F.broadcast(pol)).select(
        "hypertable",
        "bucket_s",
        "n_rows",
        "last_lsn",
        invalidated.alias("invalidated"),
        in_window.alias("in_window"),
        (invalidated & in_window).alias("needs_refresh"),
        win_start.alias("window_start_s"),
        win_end.alias("window_end_s"),
        (F.col("now_s") + _SCHEDULE_INTERVAL_S).alias("next_start_s"),
    )


# ---------------------------------------------------------------------------
# B77: skewness / kurtosis stats_agg accessors on DECIMAL(38,0) sums


@register(
    "ts_stats_agg_moments",
    family="timeseries",
    doc="Higher-moment stats_agg accessors (B77): skewness and excess "
    "kurtosis per hypertable — the toolkit's skewness()/kurtosis() "
    "reads over stats_agg (timescaledb-toolkit stats_agg 1-D "
    "accessors), which B9 (mean/stddev) stops short of. The 3rd/4th "
    "power sums of exact cents overflow int64 at any real row "
    "count, so this operator natively runs the DECIMAL(38,0) "
    "moment-sum path (functions/exact.py rationale): per-row "
    "products and sums are exact decimal integers on BOTH engines "
    "(Spark decimal aggregate, DuckDB HUGEINT), cast to double once "
    "each, and every downstream expression is a single mirrored "
    "pinned-order double formula. One scan, one keyed reduce with "
    "map-side partials, series-grain output.",
    oracle=f"""
        WITH s AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   sum(CAST({_SQL_CENTS_R7} AS HUGEINT)) AS s1,
                   sum(CAST({_SQL_CENTS_R7} AS HUGEINT)
                       * {_SQL_CENTS_R7}) AS s2,
                   sum(CAST({_SQL_CENTS_R7} AS HUGEINT)
                       * {_SQL_CENTS_R7} * {_SQL_CENTS_R7}) AS s3,
                   sum(CAST({_SQL_CENTS_R7} AS HUGEINT)
                       * {_SQL_CENTS_R7} * {_SQL_CENTS_R7}
                       * {_SQL_CENTS_R7}) AS s4
            FROM events GROUP BY 1
        ),
        m AS (
            SELECT event_type, n,
                   CAST(s1 AS DOUBLE) / n AS mean,
                   CAST(s2 AS DOUBLE) / n AS ex2,
                   CAST(s3 AS DOUBLE) / n AS ex3,
                   CAST(s4 AS DOUBLE) / n AS ex4
            FROM s
        ),
        c AS (
            SELECT event_type, n, mean,
                   ex2 - mean * mean AS m2,
                   ex3 - 3.0 * mean * ex2 + 2.0 * mean * mean * mean AS m3,
                   ex4 - 4.0 * mean * ex3 + 6.0 * mean * mean * ex2
                       - 3.0 * mean * mean * mean * mean AS m4
            FROM m
        )
        SELECT event_type, n,
               round(mean * 100.0, 0) / 10000.0 AS mean_value,
               round(sqrt(m2), 0) / 100.0 AS stddev_pop_cents_e2,
               CASE WHEN m2 > 0 THEN
                   round(m3 / pow(m2, 1.5) * 1000000.0, 0) / 1000000.0
               END AS skewness,
               CASE WHEN m2 > 0 THEN
                   round((m4 / (m2 * m2) - 3.0) * 1000000.0, 0) / 1000000.0
               END AS excess_kurtosis
        FROM c
    """,
)
def ts_stats_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100, 0).cast("long")
    cd = c.cast("decimal(38,0)")
    s = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cd).alias("s1"),
        F.sum(cd * c).alias("s2"),
        F.sum(cd * c * c).alias("s3"),
        F.sum(cd * c * c * c).alias("s4"),
    )
    n = F.col("n")
    mean = F.col("s1").cast("double") / n
    ex2 = F.col("s2").cast("double") / n
    ex3 = F.col("s3").cast("double") / n
    ex4 = F.col("s4").cast("double") / n
    m = s.select("event_type", "n", mean.alias("mean"),
                 ex2.alias("ex2"), ex3.alias("ex3"), ex4.alias("ex4"))
    mean, ex2 = F.col("mean"), F.col("ex2")
    ex3, ex4 = F.col("ex3"), F.col("ex4")
    m2 = ex2 - mean * mean
    m3 = ex3 - 3.0 * mean * ex2 + 2.0 * mean * mean * mean
    m4 = (
        ex4 - 4.0 * mean * ex3 + 6.0 * mean * mean * ex2
        - 3.0 * mean * mean * mean * mean
    )
    cc = m.select(
        "event_type", "n", "mean",
        m2.alias("m2"), m3.alias("m3"), m4.alias("m4"),
    )
    m2, m3, m4 = F.col("m2"), F.col("m3"), F.col("m4")
    return cc.select(
        "event_type",
        "n",
        (F.round(F.col("mean") * 100.0, 0) / 10000.0).alias("mean_value"),
        (F.round(F.sqrt(m2), 0) / 100.0).alias("stddev_pop_cents_e2"),
        F.when(
            m2 > 0, F.round(m3 / F.pow(m2, 1.5) * 1000000.0, 0) / 1000000.0
        ).alias("skewness"),
        F.when(
            m2 > 0,
            F.round((m4 / (m2 * m2) - 3.0) * 1000000.0, 0) / 1000000.0,
        ).alias("excess_kurtosis"),
    )


# ---------------------------------------------------------------------------
# B78: count-min sketch point estimates (toolkit count_min_sketch)

#: CMS geometry: d hash rows x w columns. w=64 at ~150 items per
#: series gives real collisions, so the overestimate branch is live
#: at certification SF; production picks w = ceil(e / eps).
_CMS_D = 4
_CMS_W = 64

#: tracked point queries: every (series, user_id < 20) pair present
_CMS_TRACKED = 20


def cms_registers(events: DataFrame) -> DataFrame:
    """The count-min register table: (event_type, hash row j, column)
    -> count, one associative COUNT aggregate over d=4 md5-derived
    hashes per event. Shuffle traffic is at most series x d x w rows
    (metadata-sized, row-count-independent) with map-side partials —
    the property that makes CMS the 100 TB frequency-table swap-in;
    registers merge across shards/batches by plain +, so the SAME
    expression maintains live registers as a streaming aggregation
    (I25, stream == batch register-for-register)."""
    hashes = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"{j}:"),
                                    F.col("user_id").cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % _CMS_W
                ).alias("idx"),
            )
            for j in range(_CMS_D)
        ]
    )
    return (
        events.select("event_type", F.explode(hashes).alias("h"))
        .groupBy("event_type", "h.j", "h.idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _sql_cms_idx(j: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('{j}:' || CAST(user_id AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {_CMS_W}"
    )


@register(
    "ts_count_min_sketch",
    family="timeseries",
    doc="Count-min sketch frequency estimates (B78, timescaledb-"
    "toolkit count_min_sketch + approx_count): d=4 md5-derived hash "
    "rows x w=64 columns of event counts per hypertable, point "
    "estimate = min over the item's d registers. Register table is "
    "one associative count reduce (series x 256 rows of shuffle "
    "whatever the row count — the sketch-grain principle of "
    "B51/B59/B60); estimates join the tracked items against the "
    "broadcast register table. The exact count rides along so the "
    "certified output PROVES the CMS one-sided guarantee: estimate "
    ">= exact always (overestimate_by >= 0), with w=64 sized so "
    "collisions actually occur at certification SF.",
    oracle=f"""
        WITH regs AS (
            SELECT event_type, j,
                   CASE j
                       WHEN 0 THEN {_sql_cms_idx(0)}
                       WHEN 1 THEN {_sql_cms_idx(1)}
                       WHEN 2 THEN {_sql_cms_idx(2)}
                       WHEN 3 THEN {_sql_cms_idx(3)}
                   END AS idx,
                   count(*) AS cnt
            FROM events CROSS JOIN (
                SELECT unnest(range({_CMS_D})) AS j
            ) js
            GROUP BY 1, 2, 3
        ),
        q AS (
            SELECT event_type, user_id,
                   CAST(count(*) AS BIGINT) AS n_exact
            FROM events WHERE user_id < {_CMS_TRACKED}
            GROUP BY 1, 2
        ),
        est AS (
            SELECT q.event_type, q.user_id, q.n_exact,
                   min(r.cnt) AS n_cms
            FROM q JOIN regs r
              ON r.event_type = q.event_type
             AND r.idx = CASE r.j
                     WHEN 0 THEN CAST(('0x' || substr(md5('0:'
                         || CAST(q.user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                         % {_CMS_W}
                     WHEN 1 THEN CAST(('0x' || substr(md5('1:'
                         || CAST(q.user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                         % {_CMS_W}
                     WHEN 2 THEN CAST(('0x' || substr(md5('2:'
                         || CAST(q.user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                         % {_CMS_W}
                     WHEN 3 THEN CAST(('0x' || substr(md5('3:'
                         || CAST(q.user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                         % {_CMS_W}
                 END
            GROUP BY 1, 2, 3
        )
        SELECT event_type, user_id, n_exact,
               CAST(n_cms AS BIGINT) AS n_cms,
               CAST(n_cms - n_exact AS BIGINT) AS overestimate_by,
               n_cms >= n_exact AS never_underestimates
        FROM est
    """,
)
def ts_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    regs = cms_registers(events)
    q = (
        events.filter(F.col("user_id") < _CMS_TRACKED)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    # the tracked item's d register addresses, exploded then matched
    # against the broadcast register table
    probes = q.select(
        "event_type",
        "user_id",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"{j}:"),
                                            F.col("user_id").cast("string"),
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % _CMS_W
                        ).alias("idx"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("h"),
    )
    est = (
        probes.join(
            F.broadcast(regs),
            (probes["event_type"] == regs["event_type"])
            & (probes["h.j"] == regs["j"])
            & (probes["h.idx"] == regs["idx"]),
        )
        .groupBy(probes["event_type"], "user_id", "n_exact")
        .agg(F.min("cnt").alias("n_cms"))
    )
    return est.select(
        "event_type",
        "user_id",
        "n_exact",
        "n_cms",
        (F.col("n_cms") - F.col("n_exact")).alias("overestimate_by"),
        (F.col("n_cms") >= F.col("n_exact")).alias("never_underestimates"),
    )


# ---------------------------------------------------------------------------
# E19: int8 quantization-error decomposition (ScaNN's split)

_EMB_DIM_R7 = 64


@register(
    "embedding_quantization_error",
    family="ann",
    doc="Int8 quantization-error audit (E19): symmetric per-dim int8 "
    "quantization (the E7 codec) scored per vector with the "
    "parallel/orthogonal residual decomposition of Guo et al. "
    "(ScaNN, ICML'20 §3) — the parallel component is what inflates "
    "inner-product ranking error, so an ANN pipeline audits it "
    "before shipping a quantized index. Per-dim scales are a 64-row "
    "aggregate collected into ONE broadcast array row (no per-dim "
    "join, no explode); per-vector math is sequential array folds "
    "over the dim order, mirrored exactly in the oracle "
    "(list_zip + ordered list_reduce), with floor(x + 0.5) as the "
    "engine-neutral round-half-up and scale-0 integer rendering. "
    "One corpus scan + one metadata aggregate — vector-grain "
    "output, shuffle-free per-vector work.",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        sc AS (
            SELECT list(mx ORDER BY d) AS s FROM (
                SELECT d, max(abs(v[d + 1])) AS mx
                FROM e CROSS JOIN (
                    SELECT unnest(range({_EMB_DIM_R7})) AS d
                ) ds
                GROUP BY d
            )
        ),
        r AS (
            SELECT vec_id,
                   list_transform(
                       list_zip(v, s),
                       p -> p[1] - least(greatest(
                                floor(p[1] * 127.0 / p[2] + 0.5),
                                -127.0), 127.0) * p[2] / 127.0
                   ) AS res,
                   v
            FROM e CROSS JOIN sc
        ),
        d AS (
            SELECT vec_id,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(v, x -> x * x)), (a, b) -> a + b)
                       AS v2,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(res, x -> x * x)), (a, b) -> a + b)
                       AS err2,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(list_zip(res, v),
                                      p -> p[1] * p[2])), (a, b) -> a + b)
                       AS dot_rv
            FROM r
        )
        SELECT vec_id,
               round(v2 * 1000000.0, 0) / 1000000.0 AS norm2,
               round(err2 * 1000000000.0, 0) / 1000000000.0 AS err2,
               round(dot_rv * dot_rv / v2 * 1000000000.0, 0)
                   / 1000000000.0 AS err_parallel,
               round((err2 - dot_rv * dot_rv / v2) * 1000000000.0, 0)
                   / 1000000000.0 AS err_orthogonal,
               err2 <= v2 AS quantization_contracts
        FROM d
    """,
)
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    # per-dim max-abs scales folded to ONE array row, broadcast
    dims = (
        emb.select(F.posexplode("v").alias("d", "x"))
        .groupBy("d")
        .agg(F.max(F.abs(F.col("x"))).alias("mx"))
    )
    sc = dims.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, mx))), p -> p.mx)"
        ).alias("s")
    )
    r = emb.crossJoin(F.broadcast(sc)).select(
        "vec_id",
        "v",
        F.zip_with(
            "v",
            "s",
            lambda x, s: x
            - F.least(
                F.greatest(F.floor(x * 127.0 / s + 0.5), F.lit(-127.0)),
                F.lit(127.0),
            )
            * s
            / 127.0,
        ).alias("res"),
    )
    fold = lambda col: F.aggregate(  # noqa: E731 — ordered exact fold
        col, F.lit(0.0), lambda a, b: a + b
    )
    d = r.select(
        "vec_id",
        fold(F.expr("transform(v, x -> x * x)")).alias("v2"),
        fold(F.expr("transform(res, x -> x * x)")).alias("err2"),
        fold(F.zip_with("res", "v", lambda a, b: a * b)).alias("dot_rv"),
    )
    v2, err2, dot = F.col("v2"), F.col("err2"), F.col("dot_rv")
    return d.select(
        "vec_id",
        (F.round(v2 * 1000000.0, 0) / 1000000.0).alias("norm2"),
        (F.round(err2 * 1000000000.0, 0) / 1000000000.0).alias("err2"),
        (F.round(dot * dot / v2 * 1000000000.0, 0) / 1000000000.0).alias(
            "err_parallel"
        ),
        (
            F.round((err2 - dot * dot / v2) * 1000000000.0, 0) / 1000000000.0
        ).alias("err_orthogonal"),
        (err2 <= v2).alias("quantization_contracts"),
    )


# ---------------------------------------------------------------------------
# F34: cross-source n-gram overlap matrix

_OVL_N = 5  # word n-gram grain


@register(
    "corpus_source_overlap_matrix",
    family="text",
    doc="Cross-source n-gram overlap matrix (F34): for every source "
    "pair, how many distinct word-5-grams they SHARE, with "
    "containment ratios both ways and Jaccard — the corpus-level "
    "leakage audit run before treating sources as independent "
    "mixture components (D9/D16 answer it doc-by-doc; this is the "
    "source-grain contamination matrix, the view dataset cards "
    "report). Plan: distinct (shingle, source) table (shingle-keyed "
    "reduce), shingle-keyed self-join whose per-key groups are "
    "bounded by source count (<= 20^2 pairs per shingle whatever "
    "the corpus size), pair-keyed count, per-source totals "
    "broadcast back. Integer-scale ratio rendering (SURVEY §6).",
    oracle=f"""
        WITH t AS (
            SELECT source, string_split(text, ' ') AS toks FROM documents
        ),
        sh AS (
            SELECT DISTINCT source,
                   concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3],
                             toks[i + 4], toks[i + 5]) AS g
            FROM t CROSS JOIN unnest(range(len(toks) - {_OVL_N - 1})) u(i)
            WHERE len(toks) >= {_OVL_N}
        ),
        tot AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1
        ),
        pairs AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT p.source_a, p.source_b, p.n_shared,
               ta.n AS n_a, tb.n AS n_b,
               round(p.n_shared * 1000000.0 / ta.n, 0) / 1000000.0
                   AS containment_a,
               round(p.n_shared * 1000000.0 / tb.n, 0) / 1000000.0
                   AS containment_b,
               round(p.n_shared * 1000000.0
                     / (ta.n + tb.n - p.n_shared), 0) / 1000000.0
                   AS jaccard
        FROM pairs p
        JOIN tot ta ON ta.source = p.source_a
        JOIN tot tb ON tb.source = p.source_b
    """,
)
def corpus_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.sources.tables import spread

    docs = spread(load(spark, sf_dir, "documents"))
    sh = (
        docs.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= _OVL_N)
        .select(
            "source",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(0, size(toks) - {_OVL_N}), i ->"
                        " concat_ws(' ', toks[i], toks[i + 1], toks[i + 2],"
                        " toks[i + 3], toks[i + 4]))"
                    )
                )
            ).alias("g"),
        )
        .distinct()
    )
    tot = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("source_a"), "g")
    b = sh.select(F.col("source").alias("source_b"), "g")
    pairs = (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    p = pairs.join(F.broadcast(ta), "source_a").join(F.broadcast(tb), "source_b")
    shared = F.col("n_shared")
    return p.select(
        "source_a",
        "source_b",
        "n_shared",
        "n_a",
        "n_b",
        (F.round(shared * 1000000.0 / F.col("n_a"), 0) / 1000000.0).alias(
            "containment_a"
        ),
        (F.round(shared * 1000000.0 / F.col("n_b"), 0) / 1000000.0).alias(
            "containment_b"
        ),
        (
            F.round(
                shared * 1000000.0 / (F.col("n_a") + F.col("n_b") - shared), 0
            )
            / 1000000.0
        ).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# D22: minhash estimator accuracy audit (estimate vs exact Jaccard)


def _minhash_audit_oracle() -> str:
    """D12's md5 MinHash+LSH SQL extended with the EXACT 5-gram
    Jaccard per candidate pair — the estimator-calibration view."""
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
            f"a.mh{bi * rows + ri} = b.mh{bi * rows + ri}" for ri in range(rows)
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
        g AS (
            SELECT DISTINCT doc_id,
                   array_to_string(toks[i + 1 : i + 5], ' ') AS g
            FROM s0
        ),
        sh AS (
            SELECT doc_id,
                   ('0x' || substr(md5(g), 1, 15))::BIGINT % {_MERSENNE} AS h
            FROM g
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        sig AS (
            SELECT doc_id,
               {mins}
            FROM sh GROUP BY doc_id
        ),
        cand AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   ({eqsum}) / 32.0 AS est_jaccard
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE {band_conds}
        ),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS n_inter
            FROM cand c
            JOIN g ga ON ga.doc_id = c.doc_a
            JOIN g gb ON gb.doc_id = c.doc_b AND gb.g = ga.g
            GROUP BY 1, 2
        )
        SELECT c.doc_a, c.doc_b, c.est_jaccard,
               CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
               sa.n + sb.n - coalesce(i.n_inter, 0) AS n_union,
               round(coalesce(i.n_inter, 0) * 1000000.0
                     / (sa.n + sb.n - coalesce(i.n_inter, 0)), 0)
                   / 1000000.0 AS exact_jaccard,
               round(abs(c.est_jaccard - coalesce(i.n_inter, 0) * 1.0
                         / (sa.n + sb.n - coalesce(i.n_inter, 0)))
                     * 1000000.0, 0) / 1000000.0 AS abs_err
        FROM cand c
        LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        JOIN sizes sa ON sa.doc_id = c.doc_a
        JOIN sizes sb ON sb.doc_id = c.doc_b
    """


@register(
    "dedup_minhash_estimate_audit",
    family="dedup",
    doc="MinHash estimator calibration audit (D22): every LSH "
    "candidate pair (threshold 0 — the full collision set, not just "
    "accepted near-dups) scored with BOTH the 32-perm signature "
    "estimate and the exact distinct-5-gram Jaccard, plus the "
    "absolute error — the measurement that justifies (or vetoes) a "
    "chosen (k, bands) geometry before a 100 TB dedup run trusts "
    "it. Reuses D12's md5 signature chain verbatim; the exact side "
    "is a shingle-keyed intersection join whose per-key groups are "
    "candidate-bounded. est_jaccard is k/32 (exactly representable); "
    "ratios render integer-scale (SURVEY §6).",
    oracle=_minhash_audit_oracle(),
)
def dedup_minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.dedup import (
        _MERSENNE,
        minhash_lsh_pairs,
    )

    docs = load(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 5
    )
    md5_base = lambda s: (  # noqa: E731 — D12's portable base hash
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % _MERSENNE
    )
    cand = minhash_lsh_pairs(docs, threshold=0.0, base_hash=md5_base).select(
        "doc_a", "doc_b", "est_jaccard"
    )
    g = (
        docs.withColumn("toks", F.split("text", " "))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(0, size(toks) - 5), i ->"
                        " concat_ws(' ', toks[i], toks[i + 1], toks[i + 2],"
                        " toks[i + 3], toks[i + 4]))"
                    )
                )
            ).alias("g"),
        )
    )
    sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ga = g.select(F.col("doc_id").alias("doc_a"), "g")
    gb = g.select(F.col("doc_id").alias("doc_b"), "g")
    inter = (
        cand.join(ga, "doc_a")
        .join(gb, ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    t = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0)))
        .withColumn(
            "n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter")
        )
    )
    exact = F.col("n_inter") * 1.0 / F.col("n_union")
    return t.select(
        "doc_a",
        "doc_b",
        "est_jaccard",
        "n_inter",
        "n_union",
        (
            F.round(F.col("n_inter") * 1000000.0 / F.col("n_union"), 0)
            / 1000000.0
        ).alias("exact_jaccard"),
        (
            F.round(F.abs(F.col("est_jaccard") - exact) * 1000000.0, 0)
            / 1000000.0
        ).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# A32: snapshot keyset-pagination batch plan

#: the reference's snapshot fetch size (config.example.toml:9,
#: postgresql.snapshot.batchsize default 1000, configuration.go:109)
_SNAP_BATCH = 1000


@register(
    "cdc_snapshot_batch_plan",
    family="cdc",
    doc="Snapshot keyset-pagination plan (A32): the reference's "
    "snapshotter reads each chunk in batchsize-row slices "
    "(postgresql.snapshot.batchsize, configuration.go:109; the "
    "snapshot scanner pages with a cursor in PK order) — this "
    "materializes the batch table a parallel snapshot run executes: "
    "per (hypertable, chunk, batch): row count, the start/end PK "
    "keyset bounds the cursor uses, and the last-batch flag that "
    "terminates the chunk's loop. Plan: one scan, a chunk-"
    "partitioned row_number (the snapshotter's natural partition — "
    "no global window), batch-keyed reduce; output is batch-grain "
    "metadata (rows/batchsize rows).",
    oracle=f"""
        WITH r AS (
            SELECT event_type AS hypertable,
                   ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {7 * 86400})
                       AS chunk_s,
                   event_id,
                   row_number() OVER (
                       PARTITION BY event_type,
                           ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {7 * 86400})
                       ORDER BY event_id
                   ) AS rn
            FROM events
        ),
        b AS (
            SELECT hypertable, chunk_s,
                   (rn - 1) // {_SNAP_BATCH} AS batch_idx,
                   count(*) AS n_rows,
                   min(event_id) AS start_key,
                   max(event_id) AS end_key
            FROM r GROUP BY 1, 2, 3
        )
        SELECT hypertable, chunk_s, batch_idx,
               CAST(n_rows AS BIGINT) AS n_rows,
               start_key, end_key,
               n_rows < {_SNAP_BATCH} AS is_last_batch
        FROM b
    """,
)
def cdc_snapshot_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.catalog.chunks import (
        chunk_start_epoch,
    )

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("hypertable", "chunk_s").orderBy("event_id")
    r = events.select(
        F.col("event_type").alias("hypertable"),
        chunk_start_epoch(F.col("ts")).alias("chunk_s"),
        "event_id",
    ).withColumn("rn", F.row_number().over(w))
    b = (
        r.withColumn("batch_idx", F.expr(f"(rn - 1) div {_SNAP_BATCH}"))
        .groupBy("hypertable", "chunk_s", "batch_idx")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("event_id").alias("start_key"),
            F.max("event_id").alias("end_key"),
        )
    )
    return b.select(
        "hypertable",
        "chunk_s",
        "batch_idx",
        "n_rows",
        "start_key",
        "end_key",
        (F.col("n_rows") < _SNAP_BATCH).alias("is_last_batch"),
    )


# ---------------------------------------------------------------------------
# E20: per-dim standardization audit

#: E18's quantization step (1e-6 units keep float32 inputs exact)
_QZ = 1_000_000


@register(
    "embedding_standardize_audit",
    family="ann",
    doc="Per-dimension standardization audit (E20): the z-score "
    "(whitening-diagonal) pass every embedding pipeline applies "
    "before ANN indexing or PCA, audited per dim — pre-mean and "
    "pre-variance from EXACT integer-quantized sums (the E18 "
    "discipline), then the extreme standardized values and the "
    "|z| > 3 outlier count per dim from a second scan against the "
    "broadcast (mean, sd) arrays. Dims whose max |z| explodes are "
    "the ones a clipping/winsorizing step must handle before "
    "quantization (E7/E19). Two scans, dim-keyed 64-row reduces, "
    "one single-row broadcast — no vector-grain shuffle.",
    oracle=f"""
        WITH e AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  v -> CAST(round(v * {_QZ}) AS BIGINT)) AS q
            FROM embeddings
        ),
        d AS (
            SELECT dim, q[dim + 1] AS qv
            FROM e CROSS JOIN (
                SELECT unnest(range({_EMB_DIM_R7})) AS dim
            ) ds
        ),
        s AS (
            SELECT dim, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(qv) AS BIGINT) AS s1,
                   CAST(sum(qv * qv) AS BIGINT) AS s2
            FROM d GROUP BY 1
        ),
        m AS (
            SELECT dim, n, s1, s2,
                   CAST(s1 AS DOUBLE) / n AS mean,
                   sqrt(CAST(s2 AS DOUBLE) / n
                        - (CAST(s1 AS DOUBLE) / n)
                          * (CAST(s1 AS DOUBLE) / n)) AS sd
            FROM s
        ),
        z AS (
            SELECT d.dim,
                   (d.qv - m.mean) / m.sd AS z
            FROM d JOIN m USING (dim)
        ),
        zz AS (
            SELECT dim,
                   min(z) AS min_z, max(z) AS max_z,
                   CAST(sum(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_outliers
            FROM z GROUP BY 1
        )
        SELECT m.dim, m.n,
               round(m.mean / 10.0, 0) / 100000.0 AS mean_dim,
               round(m.sd / 10.0, 0) / 100000.0 AS sd_dim,
               round(zz.min_z * 1000000.0, 0) / 1000000.0 AS min_z,
               round(zz.max_z * 1000000.0, 0) / 1000000.0 AS max_z,
               zz.n_outliers
        FROM m JOIN zz USING (dim)
    """,
)
def embedding_standardize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            f"transform(embedding, v -> cast(round(cast(v as double) * {_QZ})"
            " as long))"
        ).alias("q"),
    )
    d = emb.select(F.posexplode("q").alias("dim", "qv"))
    s = d.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qv").alias("s1"),
        F.sum(F.col("qv") * F.col("qv")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        F.col("s2").cast("double") / F.col("n") - mean * mean
    )
    m = s.select("dim", "n", mean.alias("mean"), sd.alias("sd"))
    z = d.join(F.broadcast(m), "dim").select(
        "dim", ((F.col("qv") - F.col("mean")) / F.col("sd")).alias("z")
    )
    zz = z.groupBy("dim").agg(
        F.min("z").alias("min_z_raw"),
        F.max("z").alias("max_z_raw"),
        F.sum(F.when(F.abs(F.col("z")) > 3.0, 1).otherwise(0)).alias(
            "n_outliers"
        ),
    )
    return m.join(zz, "dim").select(
        "dim",
        "n",
        (F.round(F.col("mean") / 10.0, 0) / 100000.0).alias("mean_dim"),
        (F.round(F.col("sd") / 10.0, 0) / 100000.0).alias("sd_dim"),
        (F.round(F.col("min_z_raw") * 1000000.0, 0) / 1000000.0).alias(
            "min_z"
        ),
        (F.round(F.col("max_z_raw") * 1000000.0, 0) / 1000000.0).alias(
            "max_z"
        ),
        "n_outliers",
    )


# ---------------------------------------------------------------------------
# F35: vocabulary coverage curve

#: curve sample points (top-k vocabulary sizes)
_COV_KS = (1, 2, 5, 10, 20, 50)


@register(
    "corpus_vocab_coverage",
    family="text",
    doc="Vocabulary coverage curve (F35): the fraction of corpus "
    "token mass covered by the top-k word types at fixed k — the "
    "concentration measure that budgets tokenizer vocabulary size "
    "and predicts BPE merge-frontier width (see the SCALING.md BPE "
    "regimes). Scale-safe construction: NO full-vocabulary "
    "cumulative window — the top-max(k) types come out of a "
    "distributed sort + limit (metadata-sized), the running mass is "
    "a window over that tiny table, and each curve point reads one "
    "rank row; ties rank deterministically by (count desc, word).",
    oracle=f"""
        WITH wc AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ),
        cnt AS (
            SELECT w, count(*) AS c FROM wc WHERE w != '' GROUP BY 1
        ),
        tot AS (SELECT sum(c) AS total, count(*) AS vocab FROM cnt),
        top AS (
            SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rank
            FROM cnt
            ORDER BY c DESC, w
            LIMIT {max(_COV_KS)}
        ),
        cum AS (
            SELECT rank, sum(c) OVER (
                ORDER BY rank ROWS UNBOUNDED PRECEDING
            ) AS mass
            FROM top
        ),
        ks AS (SELECT unnest(ARRAY{list(_COV_KS)}) AS k)
        SELECT ks.k,
               CAST(t.vocab AS BIGINT) AS vocab_size,
               CAST(t.total AS BIGINT) AS total_tokens,
               CAST(coalesce(c.mass,  t.total) AS BIGINT) AS top_k_mass,
               round(coalesce(c.mass, t.total) * 1000000.0 / t.total, 0)
                   / 1000000.0 AS coverage
        FROM ks
        CROSS JOIN tot t
        LEFT JOIN cum c ON c.rank = least(ks.k, t.vocab)
    """,
)
def corpus_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    top = cnt.orderBy(F.col("c").desc(), "w").limit(max(_COV_KS))
    wr = Window.orderBy(F.col("c").desc(), "w")
    cum = top.select(
        F.row_number().over(wr).alias("rank"),
        F.sum("c")
        .over(wr.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("mass"),
    )
    ks = spark.createDataFrame([(k,) for k in _COV_KS], "k int")
    t = ks.crossJoin(F.broadcast(tot)).withColumn(
        "rank_at", F.least(F.col("k"), F.col("vocab")).cast("int")
    )
    out = t.join(
        F.broadcast(cum), t["rank_at"] == cum["rank"], "left"
    )
    mass = F.coalesce(F.col("mass"), F.col("total"))
    return out.select(
        "k",
        F.col("vocab").alias("vocab_size"),
        F.col("total").alias("total_tokens"),
        mass.alias("top_k_mass"),
        (F.round(mass * 1000000.0 / F.col("total"), 0) / 1000000.0).alias(
            "coverage"
        ),
    )


# ---------------------------------------------------------------------------
# B79: candlestick partial-merge rollup (toolkit rollup(candlestick_agg))

_WEEK_S = 7 * 86400


@register(
    "ts_candlestick_rollup",
    family="timeseries",
    doc="Weekly candlesticks rolled up from DAILY candle partials "
    "(B79, timescaledb-toolkit rollup(candlestick_agg)): each daily "
    "partial carries (open, open_key) / (close, close_key) so the "
    "merge picks the week's true first/last trade via min_by/max_by "
    "on the LSN key, high/low/volume/turnover merge associatively, "
    "and VWAP renders once from the merged exact integers (the "
    "B47/B43 merge==direct contract applied to candles: the ORACLE "
    "aggregates raw events straight to weeks, so the driver hash "
    "certifies that merging daily partials equals the direct weekly "
    "aggregate). Two keyed reduces — day grain then week grain — "
    "with map-side partials; no window, no raw re-scan in the "
    "rollup.",
    oracle=f"""
        SELECT event_type AS series,
               CAST({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % {_WEEK_S} AS BIGINT)
                   AS week_s,
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
def ts_candlestick_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    es = F.expr("unix_micros(ts) div 1000000")
    vol = F.get_json_object("props", "$.k").cast("long")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = (
        events.withColumn("_es", es)
        .groupBy(
            F.col("event_type").alias("series"),
            (F.col("_es") - F.pmod(F.col("_es"), F.lit(86400))).alias("day_s"),
        )
        .agg(
            F.min("event_id").alias("open_key"),
            F.min_by("value", "event_id").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max("event_id").alias("close_key"),
            F.max_by("value", "event_id").alias("close"),
            F.count(F.lit(1)).alias("n_trades"),
            F.sum(vol).alias("volume"),
            F.sum(cents * vol).alias("turnover_cents"),
        )
    )
    weekly = (
        daily.groupBy(
            "series",
            (F.col("day_s") - F.pmod(F.col("day_s"), F.lit(_WEEK_S))).alias(
                "week_s"
            ),
        )
        .agg(
            F.min_by("open", "open_key").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "close_key").alias("close"),
            F.sum("n_trades").alias("n_trades"),
            F.sum("volume").alias("volume"),
            F.sum("turnover_cents").alias("turnover_cents"),
        )
    )
    return weekly.withColumn(
        "vwap",
        F.round(
            F.col("turnover_cents").cast("double") * 10000.0 / F.col("volume"),
            0,
        )
        / 1000000.0,
    )


# ---------------------------------------------------------------------------
# A33: transaction-window buffering policy (transactiontracker.go)

#: postgresql.transaction.window.{maxsize,timeout} stand-ins sized so
#: all three outcomes (fully buffered / overflowed / timed out) are
#: live at certification SF
_TXNW_MAXSIZE = 4
_TXNW_TIMEOUT_S = 3000


@register(
    "cdc_txn_window_policy",
    family="cdc",
    doc="Transaction-window buffering policy (A33, "
    "postgresql.transaction.window.{enabled,timeout,maxsize} — "
    "configuration.go:129-133, transactiontracker.go:458-481): the "
    "tracker buffers a transaction's entries to reorder "
    "compression/decompression markers, draining early when the "
    "queue hits maxsize (overflowed) or a push lands past the "
    "deadline (timedOut); the tripping entry itself is still "
    "buffered, everything after streams through directly. Model: "
    "each (event_type, hour) is one transaction; per txn the plan "
    "emits size, span, both trip flags evaluated exactly as the "
    "tracker does (at each push: elapsed > timeout OR queue == "
    "maxsize, first trip wins), the buffered prefix length and the "
    "streamed-through remainder. Plan: one scan, txn-partitioned "
    "row_number (the tracker's per-transaction order), one keyed "
    "reduce — txn-grain output.",
    oracle=f"""
        WITH r AS (
            SELECT event_type,
                   ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 3600) AS txn_s,
                   {_SQL_EPOCH_S} AS es,
                   row_number() OVER (
                       PARTITION BY event_type,
                           ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 3600)
                       ORDER BY {_SQL_EPOCH_S}, event_id
                   ) AS rn,
                   min({_SQL_EPOCH_S}) OVER (
                       PARTITION BY event_type,
                           ({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 3600)
                   ) AS t0
            FROM events
        ),
        t AS (
            SELECT event_type, txn_s,
                   CAST(count(*) AS BIGINT) AS n_events,
                   max(es) - min(es) AS span_s,
                   min(CASE WHEN es - t0 > {_TXNW_TIMEOUT_S}
                             OR rn = {_TXNW_MAXSIZE}
                            THEN rn END) AS trip_rn,
                   min(CASE WHEN es - t0 > {_TXNW_TIMEOUT_S} THEN rn END)
                       AS trip_timeout_rn,
                   min(CASE WHEN rn = {_TXNW_MAXSIZE} THEN rn END)
                       AS trip_overflow_rn
            FROM r GROUP BY 1, 2
        )
        SELECT event_type, txn_s, n_events, span_s,
               trip_rn IS NULL AS buffered_fully,
               coalesce(trip_overflow_rn, 9223372036854775807)
                   <= coalesce(trip_rn, 0) AS overflowed,
               coalesce(trip_timeout_rn, 9223372036854775807)
                   <= coalesce(trip_rn, 0) AS timed_out,
               coalesce(trip_rn, n_events) AS n_buffered,
               n_events - coalesce(trip_rn, n_events) AS n_streamed_through
        FROM t
    """,
)
def cdc_txn_window_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    es = F.expr("unix_micros(ts) div 1000000")
    base = events.select(
        "event_type",
        es.alias("es"),
        (es - es % 3600).alias("txn_s"),
        "event_id",
    )
    wp = Window.partitionBy("event_type", "txn_s")
    w = wp.orderBy("es", "event_id")
    r = base.select(
        "event_type",
        "txn_s",
        "es",
        F.row_number().over(w).alias("rn"),
        F.min("es").over(wp).alias("t0"),
    )
    trip_timeout = F.when(
        F.col("es") - F.col("t0") > _TXNW_TIMEOUT_S, F.col("rn")
    )
    trip_overflow = F.when(F.col("rn") == _TXNW_MAXSIZE, F.col("rn"))
    t = r.groupBy("event_type", "txn_s").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("es") - F.min("es")).alias("span_s"),
        F.min(trip_timeout).alias("trip_timeout_rn"),
        F.min(trip_overflow).alias("trip_overflow_rn"),
    )
    trip = F.least(
        F.coalesce(F.col("trip_timeout_rn"), F.lit(None).cast("long")),
        F.coalesce(F.col("trip_overflow_rn"), F.lit(None).cast("long")),
    )
    # least() skips nulls, so trip = min of whichever trips exist
    big = F.lit(9223372036854775807)
    return t.select(
        "event_type",
        "txn_s",
        "n_events",
        "span_s",
        trip.isNull().alias("buffered_fully"),
        (F.coalesce(F.col("trip_overflow_rn"), big) <= F.coalesce(trip, F.lit(0)))
        .alias("overflowed"),
        (F.coalesce(F.col("trip_timeout_rn"), big) <= F.coalesce(trip, F.lit(0)))
        .alias("timed_out"),
        F.coalesce(trip, F.col("n_events")).alias("n_buffered"),
        (F.col("n_events") - F.coalesce(trip, F.col("n_events"))).alias(
            "n_streamed_through"
        ),
    )


# ---------------------------------------------------------------------------
# F36: quality stratification with exact count-based thresholds

#: quantile cut points (per-mille) for the strata
_STRATA_PM = (250, 500, 750, 900)


@register(
    "corpus_quality_strata",
    family="text",
    doc="Quality stratification (F36): split the corpus into strata "
    "at fixed quality-score quantiles — the curriculum/mix-planning "
    "step that samples high-quality docs at higher rates (composes "
    "with F16/F18/F33). The score is F2's integer signal family "
    "reduced to one int (token count capped + stopword hits); "
    "thresholds are EXACT percentile_disc computed from the score "
    "histogram (smallest score with cumulative count >= "
    "ceil(p*N/1000) — pure integer arithmetic, no engine quantile "
    "function, no cross-engine interpolation ambiguity). The "
    "histogram is score-grain (bounded by the score domain, "
    "metadata-sized), its cumulative window runs over that tiny "
    "table only, and docs bucket via a broadcast threshold join. "
    "Output: per stratum the doc count, token mass and score "
    "bounds.",
    oracle=f"""
        WITH sc AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS score
            FROM documents
        ),
        hist AS (SELECT score, count(*) AS c FROM sc GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM sc),
        cum AS (
            SELECT score,
                   sum(c) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
                       AS cum_c
            FROM hist
        ),
        thr AS (
            SELECT pm,
                   min(score) FILTER (
                       WHERE cum_c * 1000 >= pm * (SELECT n_docs FROM n)
                   ) AS cut
            FROM cum CROSS JOIN (
                SELECT unnest(ARRAY{list(_STRATA_PM)}) AS pm
            ) pms
            GROUP BY pm
        ),
        strata AS (
            SELECT sc.doc_id, sc.score,
                   (SELECT count(*) FROM thr WHERE sc.score > thr.cut)
                       AS stratum
            FROM sc
        )
        SELECT stratum,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(score) AS BIGINT) AS token_mass,
               min(score) AS min_score,
               max(score) AS max_score
        FROM strata GROUP BY 1
    """,
)
def corpus_quality_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    sc = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("score")
    )
    hist = sc.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    n = sc.agg(F.count(F.lit(1)).alias("n_docs"))
    # cumulative over the SCORE HISTOGRAM (score-domain-bounded,
    # metadata-sized — same deliberate note as the chunk catalog)
    wc = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select("score", F.sum("c").over(wc).alias("cum_c"))
    pms = docs.sparkSession.createDataFrame(
        [(pm,) for pm in _STRATA_PM], "pm int"
    )
    thr = (
        cum.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(pms))
        .filter(F.col("cum_c") * 1000 >= F.col("pm") * F.col("n_docs"))
        .groupBy("pm")
        .agg(F.min("score").alias("cut"))
    )
    cuts = thr.agg(
        F.collect_list(F.col("cut")).alias("cuts")
    )
    strata = sc.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "score",
        F.expr(
            "size(filter(cuts, c -> score > c))"
        ).cast("long").alias("stratum"),
    )
    return strata.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("score").alias("token_mass"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


# ---------------------------------------------------------------------------
# E21: IVF nprobe tuning sweep (recall/cost curve)

_SWEEP_NPROBES = (1, 2, 4, 8)
_SWEEP_K = 10
_SWEEP_STRIDE = 25
_SWEEP_QUERY = 1


def _sweep_oracle() -> str:
    """The E11 seeded-IVF SQL replayed once per nprobe, reduced to a
    (nprobe, candidates, recall) summary row each."""
    base = """
        e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        seeds AS (
            SELECT vec_id AS seed_id, v AS sv FROM e
            WHERE vec_id % {stride} = 0 AND vec_id < {stride} * 100
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
        q AS (SELECT v AS qv FROM e WHERE vec_id = {query}),
        n AS (SELECT count(*) AS n_vecs FROM e WHERE vec_id <> {query}),
        exact AS (
            SELECT vec_id
            FROM e CROSS JOIN q
            WHERE vec_id <> {query}
            ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id
            LIMIT {k}
        )
    """.format(stride=_SWEEP_STRIDE, query=_SWEEP_QUERY, k=_SWEEP_K)
    branches = []
    for np_ in _SWEEP_NPROBES:
        branches.append(
            """
        SELECT {np} AS nprobe,
               (SELECT count(*) FROM asg a
                WHERE a.vec_id <> {query} AND a.seed_id IN (
                    SELECT seed_id FROM seeds CROSS JOIN q
                    ORDER BY round(list_cosine_similarity(sv, qv), 6) DESC,
                             seed_id
                    LIMIT {np})) AS n_candidates,
               (SELECT round(count(*) * 1000000.0 // 1 / 1000000.0, 6)
                FROM (
                    SELECT a.vec_id
                    FROM asg a CROSS JOIN q
                    WHERE a.vec_id <> {query} AND a.seed_id IN (
                        SELECT seed_id FROM seeds CROSS JOIN q
                        ORDER BY round(list_cosine_similarity(sv, qv), 6)
                                 DESC, seed_id
                        LIMIT {np})
                    ORDER BY round(list_cosine_similarity(a.v, q.qv), 6)
                             DESC, a.vec_id
                    LIMIT {k}
                ) ap JOIN exact USING (vec_id)) / {k}.0 AS recall_at_k
            """.format(np=np_, query=_SWEEP_QUERY, k=_SWEEP_K)
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
    "ann_nprobe_sweep",
    family="ann",
    doc="IVF nprobe tuning sweep (E21): the recall-vs-cost curve an "
    "IVF deployment plots before fixing its probe budget — for "
    "nprobe in (1, 2, 4, 8), the candidate count, the scanned "
    "corpus fraction and recall@10 against the brute-force exact "
    "top-10, all on E11's deterministic seeded index so every point "
    "is oracle-checkable. The assignment (the expensive index "
    "build) is computed ONCE and persisted; each sweep point only "
    "re-probes (probe lists are metadata) and re-ranks its "
    "candidate slice, which is how a real tuning run amortizes the "
    "build. recall steps are exact 1/k decimals; scan_fraction "
    "renders integer-scale.",
    oracle=_sweep_oracle(),
)
def ann_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:

    from timescaledb_event_streamer_spark.operators.ann import cosine

    emb = load(spark, sf_dir, "embeddings")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = emb.repartition(n_shuffle).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = e.filter(
        (F.col("vec_id") % _SWEEP_STRIDE == 0)
        & (F.col("vec_id") < _SWEEP_STRIDE * 100)
    ).select(F.col("vec_id").alias("seed_id"), F.col("v").alias("sv"))
    scored = e.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "v",
        "seed_id",
        F.round(cosine(F.col("v"), F.col("sv")), 6).alias("c"),
    )
    asg = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("c"), (-F.col("seed_id")).alias("ns"))
            ).alias("m"),
            F.first("v").alias("v"),
        )
        .select("vec_id", "v", (-F.col("m.ns")).alias("seed_id"))
    )
    asg = scoped_persist(asg, "ann_nprobe_sweep.index")
    qv = e.filter(F.col("vec_id") == _SWEEP_QUERY).select(
        F.col("v").alias("qv")
    )
    n_vecs = e.filter(F.col("vec_id") != _SWEEP_QUERY).agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    probe_rank = (
        seeds.crossJoin(F.broadcast(qv))
        .select(
            "seed_id",
            F.round(cosine(F.col("sv"), F.col("qv")), 6).alias("qc"),
        )
    )
    exact = (
        e.filter(F.col("vec_id") != _SWEEP_QUERY)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("c")
        )
        .orderBy(F.col("c").desc(), "vec_id")
        .limit(_SWEEP_K)
        .select("vec_id")
    )
    rows = []
    for np_ in _SWEEP_NPROBES:
        probes = (
            probe_rank.orderBy(F.col("qc").desc(), "seed_id")
            .limit(np_)
            .select("seed_id")
        )
        cand = (
            asg.join(F.broadcast(probes), "seed_id")
            .filter(F.col("vec_id") != _SWEEP_QUERY)
        )
        topk = (
            cand.crossJoin(F.broadcast(qv))
            .select(
                "vec_id",
                F.round(cosine(F.col("v"), F.col("qv")), 6).alias("c"),
            )
            .orderBy(F.col("c").desc(), "vec_id")
            .limit(_SWEEP_K)
            .select("vec_id")
        )
        summary = cand.agg(
            F.count(F.lit(1)).alias("n_candidates")
        ).crossJoin(
            topk.join(exact, "vec_id").agg(
                (F.count(F.lit(1)) / float(_SWEEP_K)).alias("recall_at_k")
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
# B80: Heikin-Ashi candles (recursive smoothing over day order)


@register(
    "ts_heikin_ashi",
    family="timeseries",
    doc="Heikin-Ashi candles (B80): the RECURSIVE OHLC smoothing "
    "(ha_open(d) = (ha_open(d-1) + ha_close(d-1)) / 2 — each day "
    "depends on the previous day's OUTPUT, not its inputs, so no "
    "window function expresses it) charting stacks derive from "
    "candlestick_agg. Spark shape for an iterative-per-key "
    "operator: one parallel day-grain reduce, then each series "
    "folds its OWN day array sequentially in-row (array length is "
    "time-bounded — days per series — never corpus-bounded, so the "
    "fold is metadata work at any row count) and explodes back. "
    "The oracle is a genuine RECURSIVE CTE walking rn = rn + 1, so "
    "the hash certifies the recursion itself; both engines run the "
    "identical left-assoc double expressions in identical day "
    "order, scale-0 rendering.",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT event_type AS series,
                   CAST({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 86400 AS BIGINT)
                       AS day_s,
                   arg_min(value, event_id) AS o, max(value) AS h,
                   min(value) AS l, arg_max(value, event_id) AS c
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY series ORDER BY day_s
            ) AS rn
            FROM daily
        ),
        ha AS (
            SELECT series, day_s, rn, h, l,
                   (o + h + l + c) / 4.0 AS ha_close,
                   (o + c) / 2.0 AS ha_open
            FROM ranked WHERE rn = 1
            UNION ALL
            SELECT r.series, r.day_s, r.rn, r.h, r.l,
                   (r.o + r.h + r.l + r.c) / 4.0,
                   (ha.ha_open + ha.ha_close) / 2.0
            FROM ranked r
            JOIN ha ON r.series = ha.series AND r.rn = ha.rn + 1
        )
        SELECT series, day_s,
               round(ha_open * 1000000.0, 0) / 1000000.0 AS ha_open,
               round(ha_close * 1000000.0, 0) / 1000000.0 AS ha_close,
               round(greatest(h, ha_open, ha_close) * 1000000.0, 0)
                   / 1000000.0 AS ha_high,
               round(least(l, ha_open, ha_close) * 1000000.0, 0)
                   / 1000000.0 AS ha_low,
               ha_close > ha_open AS bullish
        FROM ha
    """,
)
def ts_heikin_ashi(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    es = F.expr("unix_micros(ts) div 1000000")
    daily = (
        events.withColumn("_es", es)
        .groupBy(
            F.col("event_type").alias("series"),
            (F.col("_es") - F.pmod(F.col("_es"), F.lit(86400))).alias(
                "day_s"
            ),
        )
        .agg(
            F.min_by("value", "event_id").alias("o"),
            F.max("value").alias("h"),
            F.min("value").alias("l"),
            F.max_by("value", "event_id").alias("c"),
        )
    )
    packed = daily.groupBy("series").agg(
        F.array_sort(
            F.collect_list(F.struct("day_s", "o", "h", "l", "c"))
        ).alias("ds")
    )
    init = F.struct(
        F.array()
        .cast(
            "array<struct<day_s:bigint,ha_open:double,ha_close:double,"
            "h:double,l:double>>"
        )
        .alias("arr"),
        F.lit(None).cast("double").alias("po"),
        F.lit(None).cast("double").alias("pc"),
    )

    def step(acc, x):
        hc = (x["o"] + x["h"] + x["l"] + x["c"]) / 4.0
        ho = F.when(
            acc["po"].isNull(), (x["o"] + x["c"]) / 2.0
        ).otherwise((acc["po"] + acc["pc"]) / 2.0)
        entry = F.struct(
            x["day_s"].alias("day_s"),
            ho.alias("ha_open"),
            hc.alias("ha_close"),
            x["h"].alias("h"),
            x["l"].alias("l"),
        )
        return F.struct(
            F.concat(acc["arr"], F.array(entry)).alias("arr"),
            ho.alias("po"),
            hc.alias("pc"),
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
    sc = lambda col: F.round(col * 1000000.0, 0) / 1000000.0  # noqa: E731
    return x.select(
        "series",
        "day_s",
        sc(F.col("ha_open")).alias("ha_open"),
        sc(F.col("ha_close")).alias("ha_close"),
        sc(F.greatest("h", "ha_open", "ha_close")).alias("ha_high"),
        sc(F.least("l", "ha_open", "ha_close")).alias("ha_low"),
        (F.col("ha_close") > F.col("ha_open")).alias("bullish"),
    )


# ---------------------------------------------------------------------------
# B81: state_agg's state_timeline accessor (compacted segments)


@register(
    "ts_state_timeline",
    family="timeseries",
    doc="state_timeline accessor over state_agg (B81, timescaledb-"
    "toolkit state_agg -> state_timeline): per user, the COMPACTED "
    "(state, enter, exit) segment list — consecutive same-state "
    "events collapse into one segment, exit = the next segment's "
    "enter (open-ended for the live segment), the per-key timeline "
    "B15's per-state totals aggregate away. Classic gaps-and-"
    "islands: lag + conditional running sum assigns segment ids, "
    "a keyed reduce folds each island, a second lead window "
    "attaches exits — every window partitioned by user (the "
    "state_agg key), so the plan holds at any corpus scale. All "
    "integer epoch arithmetic.",
    oracle=f"""
        WITH r AS (
            SELECT user_id, event_type AS state, {_SQL_EPOCH_S} AS es,
                   event_id,
                   CASE WHEN lag(event_type) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id
                        ) IS DISTINCT FROM event_type THEN 1 ELSE 0 END
                       AS new_seg
            FROM events
        ),
        seg AS (
            SELECT user_id, state, es, event_id,
                   sum(new_seg) OVER (
                       PARTITION BY user_id ORDER BY es, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS seg_id
            FROM r
        ),
        folded AS (
            SELECT user_id, seg_id, min(state) AS state,
                   min(es) AS enter_s,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM seg GROUP BY 1, 2
        )
        SELECT user_id, CAST(seg_id AS BIGINT) AS seg_id, state, enter_s,
               lead(enter_s) OVER (
                   PARTITION BY user_id ORDER BY seg_id
               ) AS exit_s,
               lead(enter_s) OVER (
                   PARTITION BY user_id ORDER BY seg_id
               ) - enter_s AS duration_s,
               n_events
        FROM folded
    """,
)
def ts_state_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    es = F.expr("unix_micros(ts) div 1000000")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = events.select(
        "user_id",
        F.col("event_type").alias("state"),
        es.alias("es"),
        "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("new_seg"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = r.withColumn("seg_id", F.sum("new_seg").over(ws).cast("long"))
    folded = seg.groupBy("user_id", "seg_id").agg(
        F.min("state").alias("state"),
        F.min("es").alias("enter_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("seg_id")
    exit_s = F.lead("enter_s").over(wl)
    return folded.select(
        "user_id",
        "seg_id",
        "state",
        "enter_s",
        exit_s.alias("exit_s"),
        (exit_s - F.col("enter_s")).alias("duration_s"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# F37: corpus mixture diversity summary


@register(
    "corpus_mixture_entropy",
    family="text",
    doc="Corpus mixture diversity (F37): the Shannon entropy of the "
    "source mixture (token-mass weighted), its exponential (the "
    "'effective number of sources' dataset cards report), and the "
    "same pair for the language mix — the one-row health summary a "
    "mix planner (F18) tracks across corpus versions: a diversity "
    "collapse shows up here before any per-source table makes it "
    "obvious. Exactness: shares are exact integer token counts over "
    "an exact total; entropy is a SORTED sequential fold over the "
    "(share, key)-ordered group list so the float sum is "
    "bit-identical cross-engine (the B60 harmonic-fold discipline); "
    "scale-0 rendering. Two keyed reduces to metadata-sized group "
    "tables, single-row output.",
    oracle="""
        WITH tok AS (
            SELECT source, lang,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        bysrc AS (
            SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t
            FROM tok GROUP BY 1
        ),
        bylang AS (
            SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t
            FROM tok GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM tok),
        hs AS (
            SELECT list_reduce(
                       list_prepend(CAST(0.0 AS DOUBLE),
                           list(-(t * 1.0 / total) * log2(t * 1.0 / total)
                                ORDER BY t, source)),
                       (a, b) -> a + b) AS h,
                   count(*) AS n
            FROM bysrc CROSS JOIN tot
        ),
        hl AS (
            SELECT list_reduce(
                       list_prepend(CAST(0.0 AS DOUBLE),
                           list(-(t * 1.0 / total) * log2(t * 1.0 / total)
                                ORDER BY t, lang)),
                       (a, b) -> a + b) AS h,
                   count(*) AS n
            FROM bylang CROSS JOIN tot
        )
        SELECT tot.total AS total_tokens,
               CAST(hs.n AS BIGINT) AS n_sources,
               round(hs.h * 1000000.0, 0) / 1000000.0 AS source_entropy_bits,
               round(pow(2.0, hs.h) * 1000000.0, 0) / 1000000.0
                   AS effective_sources,
               CAST(hl.n AS BIGINT) AS n_langs,
               round(hl.h * 1000000.0, 0) / 1000000.0 AS lang_entropy_bits,
               round(pow(2.0, hl.h) * 1000000.0, 0) / 1000000.0
                   AS effective_langs
        FROM hs CROSS JOIN hl CROSS JOIN tot
    """,
)
def corpus_mixture_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "source", "lang", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    tot = tok.agg(F.sum("n").alias("total"))

    def diversity(keycol: str, alias: str) -> DataFrame:
        grp = tok.groupBy(keycol).agg(F.sum("n").alias("t"))
        folded = grp.crossJoin(F.broadcast(tot)).groupBy("total").agg(
            F.count(F.lit(1)).alias(f"n_{alias}"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("t", keycol))),
                F.lit(0.0),
                lambda a, s: a
                - (s["t"] * 1.0 / F.col("total"))
                * F.log2(s["t"] * 1.0 / F.col("total")),
            ).alias(f"h_{alias}"),
        )
        return folded.drop("total")

    hs = diversity("source", "sources")
    hl = diversity("lang", "langs")
    sc = lambda c: F.round(c * 1000000.0, 0) / 1000000.0  # noqa: E731
    return (
        tot.crossJoin(F.broadcast(hs))
        .crossJoin(F.broadcast(hl))
        .select(
            F.col("total").alias("total_tokens"),
            "n_sources",
            sc(F.col("h_sources")).alias("source_entropy_bits"),
            sc(F.pow(F.lit(2.0), F.col("h_sources"))).alias(
                "effective_sources"
            ),
            "n_langs",
            sc(F.col("h_langs")).alias("lang_entropy_bits"),
            sc(F.pow(F.lit(2.0), F.col("h_langs"))).alias("effective_langs"),
        )
    )


# ---------------------------------------------------------------------------
# B82: Average True Range (Wilder's volatility, SMA form)

_ATR_WINDOW = 14  # days


@register(
    "ts_average_true_range",
    family="timeseries",
    doc="Average True Range (B82, the B72/B73 dashboard-volatility "
    "family): per series and day, true range = max(high - low, "
    "|high - prev_close|, |low - prev_close|) on EXACT integer "
    "cents (daily OHLC from one day-grain reduce), ATR = the 14-day "
    "simple moving average — an integer window sum, associative on "
    "both engines, divided once per row (Cutler-style SMA form, the "
    "same engine-exactness reasoning as ts_rsi; Wilder's recursive "
    "EMA form is B80's fold shape if needed). Day-grain windows per "
    "series, scale-0 rendering.",
    oracle=f"""
        WITH daily AS (
            SELECT event_type AS series,
                   CAST({_SQL_EPOCH_S} - {_SQL_EPOCH_S} % 86400 AS BIGINT)
                       AS day_s,
                   max(CAST(round(value * 100) AS BIGINT)) AS hc,
                   min(CAST(round(value * 100) AS BIGINT)) AS lc,
                   arg_max(CAST(round(value * 100) AS BIGINT), event_id)
                       AS cc
            FROM events GROUP BY 1, 2
        ),
        tr AS (
            SELECT series, day_s,
                   greatest(
                       hc - lc,
                       abs(hc - lag(cc) OVER w),
                       abs(lc - lag(cc) OVER w)
                   ) AS tr_c,
                   row_number() OVER w AS rn
            FROM daily
            WINDOW w AS (PARTITION BY series ORDER BY day_s)
        )
        SELECT series, day_s,
               CAST(tr_c AS BIGINT) AS true_range_cents,
               CASE WHEN rn >= {_ATR_WINDOW} THEN
                   round(CAST(sum(tr_c) OVER (
                             PARTITION BY series ORDER BY day_s
                             ROWS BETWEEN {_ATR_WINDOW - 1} PRECEDING
                                  AND CURRENT ROW
                         ) AS DOUBLE) * 10000.0 / {_ATR_WINDOW}, 0)
                       / 1000000.0
               END AS atr
        FROM tr
        WHERE tr_c IS NOT NULL
    """,
)
def ts_average_true_range(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            F.max(c).alias("hc"),
            F.min(c).alias("lc"),
            F.max_by(c, F.col("event_id")).alias("cc"),
        )
    )
    w = Window.partitionBy("series").orderBy("day_s")
    prev_c = F.lag("cc").over(w)
    tr = daily.select(
        "series",
        "day_s",
        F.greatest(
            F.col("hc") - F.col("lc"),
            F.abs(F.col("hc") - prev_c),
            F.abs(F.col("lc") - prev_c),
        ).alias("tr_c"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("tr_c").isNotNull())
    wa = w.rowsBetween(-(_ATR_WINDOW - 1), Window.currentRow)
    return tr.select(
        "series",
        "day_s",
        F.col("tr_c").alias("true_range_cents"),
        F.when(
            F.col("rn") >= _ATR_WINDOW,
            F.round(
                F.sum("tr_c").over(wa).cast("double")
                * 10000.0
                / _ATR_WINDOW,
                0,
            )
            / 1000000.0,
        ).alias("atr"),
    )
