"""Extension queries (SURVEY.md §2 additions, round-1 tail):

- ``q20_part_promotion`` — the last TPC-H plan shape (Q20) made
  explicit rather than folded into Q2/Q21: a correlated per-group
  threshold feeding a semi-join chain into supplier.
- ``ts_freq_agg`` — TimescaleDB toolkit ``freq_agg`` analog (heavy
  hitters / frequent values per partition).
- ``ann_radius_search`` — similarity search variant: all neighbors
  within a cosine radius (vs the fixed-k top-k of E1).
- ``cdc_sink_delivery_stats`` — per-sink/per-op delivery counters
  mirroring the reference's stats collector (internal/stats/).
- ``ts_counter_agg`` — toolkit ``counter_agg`` reset semantics (a
  drop in a monotonic counter is a restart, not a negative delta).
- ``text_ngram_freq`` — corpus-level bigram frequency table (the
  boilerplate/contamination-detection primitive).
- ``ts_cagg_invalidation`` — continuous-aggregate invalidation log
  (dirty buckets from CDC update/delete ops).
- ``pg_network_types`` — PG inet/cidr/macaddr wire-text round-trip.
- ``text_decontamination`` — per-doc benchmark n-gram overlap against
  a broadcast eval-set shingle set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.cdc.envelope import SOURCE_SCHEMA, derive_op, ts_ms
from timescaledb_event_streamer_spark.catalog.naming import event_topic
from timescaledb_event_streamer_spark.operators.ann import cosine
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load, spread


@register(
    "q20_part_promotion",
    family="olap",
    doc="TPC-H Q20 shape: suppliers in one nation who shipped >1.5x the "
    "part's average per-supplier 1997 quantity of LIKE-filtered parts. "
    "Correlated per-group threshold (avg per part over supplier groups) "
    "-> distinct suppkey -> semi-join into supplier; the inner agg and "
    "the per-part average reuse the same (suppkey, partkey) shuffle key, "
    "and part (post-LIKE) + nation broadcast.",
    oracle="""
        WITH sp AS (
            SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_name LIKE 'small%'
              AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1, 2
        ),
        pa AS (
            SELECT l_partkey, avg(qty) AS avg_qty FROM sp GROUP BY 1
        )
        SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          AND s.s_suppkey IN (
            SELECT sp.l_suppkey FROM sp JOIN pa USING (l_partkey)
            WHERE sp.qty > 1.5 * pa.avg_qty
          )
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    sp = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    # per-part average as a window over the grouped rows: rides the
    # existing shuffle instead of a second agg + self-join (plan
    # audit: 6 exchanges / 2 SMJ -> 4 exchanges / 0 SMJ)
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    hot = (
        sp.withColumn("avg_qty", F.avg("qty").over(w))
        .filter(F.col("qty") > 1.5 * F.col("avg_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(hot, s["s_suppkey"] == hot["l_suppkey"], how="left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@register(
    "ts_freq_agg",
    family="timeseries",
    doc="Toolkit freq_agg analog: per event_type, the heavy-hitter users "
    "whose event share is >= 0.8%. Exact two-level aggregate at test SF "
    "(the per-type totals table is tiny -> broadcast join, no window "
    "over a coarse key); at 100 TB the inner count swaps for a "
    "space-saving sketch merged per partition, same contract.",
    oracle="""
        WITH c AS (
            SELECT event_type, user_id, count(*) AS n_events
            FROM events GROUP BY 1, 2
        ),
        t AS (SELECT event_type, sum(n_events) AS total FROM c GROUP BY 1)
        SELECT c.event_type, c.user_id, c.n_events,
               round(c.n_events / t.total, 6) AS freq
        FROM c JOIN t USING (event_type)
        WHERE c.n_events / t.total >= 0.008
    """,
)
def ts_freq_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    c = events.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n_events"))
    t = c.groupBy("event_type").agg(F.sum("n_events").alias("total"))
    return (
        c.join(F.broadcast(t), "event_type")
        .filter(F.col("n_events") / F.col("total") >= 0.008)
        .select(
            "event_type",
            "user_id",
            "n_events",
            F.round(F.col("n_events") / F.col("total"), 6).alias("freq"),
        )
    )


@register(
    "ann_radius_search",
    family="ann",
    doc="Radius similarity search: every vector with cosine >= 0.3 vs "
    "the vec_id=0 query vector (includes the query itself at 1.0). "
    "Same single-scan codegen dot product as E1 but threshold-bounded "
    "instead of k-bounded — the shape used for dedup sweeps where k is "
    "unknowable a priori.",
    oracle="""
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
        )
        SELECT vec_id, label,
               round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                     (SELECT qv FROM q)), 6) AS cosine
        FROM embeddings
        WHERE round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
              (SELECT qv FROM q)), 6) >= 0.3
    """,
)
def ann_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    q = F.array(*[F.lit(float(v)) for v in qv])
    scored = emb.select(
        "vec_id",
        "label",
        F.round(cosine(F.col("embedding").cast("array<double>"), q), 6).alias("cosine"),
    )
    return scored.filter(F.col("cosine") >= 0.3)


@register(
    "cdc_sink_delivery_stats",
    family="cdc",
    doc="Per-sink delivery counters (reference internal/stats/): events, "
    "payload bytes, distinct keys, and high-water ts_ms per (topic, op). "
    "One shuffle on the topic/op pair; payload size is the wire BYTE "
    "length of the after-image: octet_length here matches DuckDB "
    "strlen, which counts bytes (not characters) -- the two stay in "
    "lockstep even for multi-byte UTF-8 payloads.",
    oracle="""
        SELECT 'timescaledb.public.' || event_type AS topic,
               CASE WHEN event_id % 10 = 0 THEN 'd'
                    WHEN event_id % 10 IN (1, 2) THEN 'u'
                    ELSE 'c' END AS op,
               count(*) AS n_events,
               CAST(sum(strlen(props)) AS BIGINT) AS n_bytes,
               count(DISTINCT user_id) AS n_keys,
               max(CAST(epoch_us(ts) // 1000 AS BIGINT)) AS last_ts_ms
        FROM events
        GROUP BY 1, 2
    """,
)
def cdc_sink_delivery_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.select(
            event_topic(F.lit(SOURCE_SCHEMA), F.col("event_type")).alias("topic"),
            derive_op(F.col("event_id")).alias("op"),
            "user_id",
            F.octet_length("props").alias("_bytes"),
            ts_ms(F.col("ts")).alias("_ts_ms"),
        )
        .groupBy("topic", "op")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_bytes").alias("n_bytes"),
            F.countDistinct("user_id").alias("n_keys"),
            F.max("_ts_ms").alias("last_ts_ms"),
        )
    )


@register(
    "ts_counter_agg",
    family="timeseries",
    doc="Toolkit counter_agg reset semantics: a value drop within a "
    "(event_type, user_id) series is a counter restart, so the "
    "corrected delta is the new value itself, not a negative step. "
    "Per-series lag window (shuffle keyed on the series -- uniform), "
    "then a map-side-partial rollup to event_type.",
    oracle="""
        WITH d AS (
            SELECT event_type,
                   value,
                   value - lag(value) OVER (
                       PARTITION BY event_type, user_id ORDER BY event_id
                   ) AS delta
            FROM events
        )
        SELECT event_type,
               count(*) AS n_deltas,
               count(*) FILTER (delta < 0) AS n_resets,
               round(sum(CASE WHEN delta < 0 THEN value ELSE delta END), 2)
                   AS total_increase
        FROM d
        WHERE delta IS NOT NULL
        GROUP BY event_type
    """,
)
def ts_counter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("event_id")
    d = events.select(
        "event_type",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )
    corrected = F.when(F.col("delta") < 0, F.col("value")).otherwise(F.col("delta"))
    return (
        d.filter(F.col("delta").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_deltas"),
            F.count(F.when(F.col("delta") < 0, 1)).alias("n_resets"),
            F.round(F.sum(corrected), 2).alias("total_increase"),
        )
    )


@register(
    "text_ngram_freq",
    family="text",
    doc="Corpus-level bigram frequency top-50 (boilerplate / "
    "contamination detection). Bigrams are built per-row inside one "
    "codegen projection (transform over the token array -- no join, "
    "no Python), then one shuffle keyed on the bigram with map-side "
    "partial counts absorbing hot n-grams; deterministic tie-break "
    "on the bigram string.",
    oracle="""
        WITH toks AS (
            SELECT string_split(text, ' ') AS t FROM documents
        ),
        bi AS (
            SELECT unnest(list_transform(
                       generate_series(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i + 1]
                   )) AS bigram
            FROM toks
        )
        SELECT bigram, count(*) AS n
        FROM bi
        GROUP BY 1
        ORDER BY n DESC, bigram
        LIMIT 50
    """,
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    toks = docs.select(F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))")
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


@register(
    "ts_cagg_invalidation",
    family="timeseries",
    doc="Continuous-aggregate invalidation log: every UPDATE/DELETE "
    "(derived CDC op) that touches an already-materialized hour "
    "bucket marks (hypertable, bucket) dirty; the refresh worker "
    "re-aggregates exactly these. Mirrors the reference ecosystem's "
    "per-relation invalidation tracking; one map-side-partial "
    "aggregate keyed on (relation, bucket) -- uniform in time, so no "
    "skew at 100 TB.",
    oracle="""
        SELECT event_type,
               ((epoch_us(ts) // 1000000) - (epoch_us(ts) // 1000000) % 3600)
                   AS bucket_s,
               count(*) AS n_invalidating,
               count(*) FILTER (event_id % 10 = 0) AS n_deletes,
               count(*) FILTER (event_id % 10 IN (1, 2)) AS n_updates
        FROM events
        WHERE event_id % 10 IN (0, 1, 2)
        GROUP BY 1, 2
    """,
)
def ts_cagg_invalidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.functions.timeseries import time_bucket_epoch

    events = load(spark, sf_dir, "events")
    op = derive_op(F.col("event_id"))
    return (
        events.withColumn("op", op)
        .filter(F.col("op").isin("u", "d"))
        .groupBy(
            "event_type", time_bucket_epoch(F.col("ts"), 3600).alias("bucket_s")
        )
        .agg(
            F.count(F.lit(1)).alias("n_invalidating"),
            F.count(F.when(F.col("op") == "d", 1)).alias("n_deletes"),
            F.count(F.when(F.col("op") == "u", 1)).alias("n_updates"),
        )
    )


@register(
    "pg_network_types",
    family="pgtypes",
    doc="PG network types (spi/pgtypes typemanager: inet/cidr/macaddr): "
    "round-trip inet wire text ('a.b.c.d/len') built from each event "
    "to the numeric address, mask length, network address (CIDR "
    "semantics), and subnet membership; macaddr normalized to "
    "colon-separated lowercase hex. All codegen string/arithmetic "
    "ops -- no UDFs.",
    oracle="""
        WITH w AS (
            SELECT event_id,
                   '10.' || CAST(user_id % 256 AS VARCHAR) || '.'
                         || CAST(event_id % 256 AS VARCHAR) || '.'
                         || CAST(CAST(round(value, 0) AS BIGINT) % 256 AS VARCHAR)
                         || '/24' AS inet_text,
                   lpad(lower(hex(event_id)), 12, '0') AS machex
            FROM events
        )
        SELECT event_id,
               inet_text,
               CAST(regexp_extract(inet_text, '^(\\d+)\\.', 1) AS BIGINT) * 16777216
                 + CAST(regexp_extract(inet_text, '^\\d+\\.(\\d+)\\.', 1) AS BIGINT) * 65536
                 + CAST(regexp_extract(inet_text, '^\\d+\\.\\d+\\.(\\d+)\\.', 1) AS BIGINT) * 256
                 + CAST(regexp_extract(inet_text, '\\.(\\d+)/', 1) AS BIGINT) AS addr_num,
               CAST(regexp_extract(inet_text, '/(\\d+)$', 1) AS BIGINT) AS masklen,
               (CAST(regexp_extract(inet_text, '^(\\d+)\\.', 1) AS BIGINT) * 16777216
                 + CAST(regexp_extract(inet_text, '^\\d+\\.(\\d+)\\.', 1) AS BIGINT) * 65536
                 + CAST(regexp_extract(inet_text, '^\\d+\\.\\d+\\.(\\d+)\\.', 1) AS BIGINT) * 256
                 + CAST(regexp_extract(inet_text, '\\.(\\d+)/', 1) AS BIGINT)) // 256 * 256
                   AS network_addr,
               ((CAST(regexp_extract(inet_text, '^(\\d+)\\.', 1) AS BIGINT) * 16777216
                 + CAST(regexp_extract(inet_text, '^\\d+\\.(\\d+)\\.', 1) AS BIGINT) * 65536
                 + CAST(regexp_extract(inet_text, '^\\d+\\.\\d+\\.(\\d+)\\.', 1) AS BIGINT) * 256
                 + CAST(regexp_extract(inet_text, '\\.(\\d+)/', 1) AS BIGINT)) >> 16)
                   = 10 * 256 + 8 AS in_net_10_8_16,
               substr(machex, 1, 2) || ':' || substr(machex, 3, 2) || ':'
                 || substr(machex, 5, 2) || ':' || substr(machex, 7, 2) || ':'
                 || substr(machex, 9, 2) || ':' || substr(machex, 11, 2) AS macaddr
        FROM w
    """,
)
def pg_network_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    inet_text = F.concat(
        F.lit("10."),
        (F.col("user_id") % 256).cast("string"),
        F.lit("."),
        (F.col("event_id") % 256).cast("string"),
        F.lit("."),
        (F.round("value", 0).cast("long") % 256).cast("string"),
        F.lit("/24"),
    )
    w = events.select("event_id", inet_text.alias("inet_text"),
                      F.lpad(F.lower(F.hex("event_id")), 12, "0").alias("machex"))
    o1 = F.regexp_extract("inet_text", r"^(\d+)\.", 1).cast("long")
    o2 = F.regexp_extract("inet_text", r"^\d+\.(\d+)\.", 1).cast("long")
    o3 = F.regexp_extract("inet_text", r"^\d+\.\d+\.(\d+)\.", 1).cast("long")
    o4 = F.regexp_extract("inet_text", r"\.(\d+)/", 1).cast("long")
    addr = o1 * 16777216 + o2 * 65536 + o3 * 256 + o4
    mac = F.concat_ws(
        ":", *[F.substring("machex", i, 2) for i in (1, 3, 5, 7, 9, 11)]
    )
    return w.select(
        "event_id",
        "inet_text",
        addr.alias("addr_num"),
        F.regexp_extract("inet_text", r"/(\d+)$", 1).cast("long").alias("masklen"),
        (F.floor(addr / 256) * 256).alias("network_addr"),
        (F.shiftright(addr, 16) == 10 * 256 + 8).alias("in_net_10_8_16"),
        mac.alias("macaddr"),
    )


@register(
    "text_decontamination",
    family="text",
    doc="Benchmark decontamination: per-document overlap of distinct "
    "word bigrams with the 'eval set' (docs with doc_id % 100 == 0 "
    "stand in for a held-out benchmark). The benchmark shingle set "
    "is eval-set-sized -- broadcast -- so the corpus side never "
    "shuffles for the membership probe; one agg shuffle on doc_id. "
    "Real pipelines use 8-13-gram shingles; the synthetic corpus' "
    "tiny vocabulary makes bigrams the equivalent signal.",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        s0 AS (
            SELECT doc_id, unnest(range(len(toks) - 1)) AS i, toks
            FROM t WHERE len(toks) >= 2
        ),
        sh AS (
            SELECT DISTINCT doc_id, array_to_string(toks[i + 1 : i + 2], ' ') AS s
            FROM s0
        ),
        bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 100 = 0)
        SELECT sh.doc_id,
               count(*) AS n_shingles,
               count(b.s) AS n_hits,
               round(count(b.s) * 1.0 / count(*), 6) AS contamination,
               count(b.s) * 1.0 / count(*) >= 0.3 AS flagged
        FROM sh LEFT JOIN bench b ON sh.s = b.s
        WHERE sh.doc_id % 100 != 0
        GROUP BY sh.doc_id
    """,
)
def text_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    bigrams = F.array_distinct(
        F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))")
    )
    sh = (
        docs.select(F.col("doc_id"), toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select("doc_id", F.explode(bigrams).alias("s"))
    )
    bench = sh.filter(F.col("doc_id") % 100 == 0).select("s").distinct()
    b = bench.withColumn("hit", F.lit(1))
    return (
        sh.filter(F.col("doc_id") % 100 != 0)
        .join(F.broadcast(b), "s", how="left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_hits"),
            F.round(F.count("hit") / F.count(F.lit(1)), 6).alias("contamination"),
            (F.count("hit") / F.count(F.lit(1)) >= 0.3).alias("flagged"),
        )
    )


@register(
    "dedup_exact_normalized",
    family="dedup",
    doc="Normalized exact dedup: case-fold + whitespace-collapse + trim "
    "before hashing, so trivially-reformatted copies land in the same "
    "group (the standard first pass before near-dup). Same one-shuffle "
    "hash-groupBy shape as dedup_exact.",
    oracle="""
        SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                   AS content_hash,
               min(doc_id) AS keep_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return (
        docs.select(F.md5(norm).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "text_length_histogram",
    family="text",
    doc="Corpus token-length histogram: 50-token-wide buckets with "
    "count and char stats per bucket -- the length-distribution "
    "diagnostic every corpus QA pass starts with. Single scan, "
    "map-side partials on a small uniform key.",
    oracle="""
        SELECT CAST(len(string_split(text, ' ')) // 50 * 50 AS BIGINT)
                   AS token_bucket,
               count(*) AS n_docs,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars,
               round(avg(n_chars), 6) AS avg_chars
        FROM documents
        GROUP BY 1
    """,
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    return (
        docs.select((F.floor(ntok / 50) * 50).alias("token_bucket"), "n_chars")
        .groupBy("token_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


@register(
    "text_repetition_ratio",
    family="text",
    doc="Per-document token repetition diagnostics (the Gopher-style "
    "repetition filter): top-token share and distinct-token ratio. "
    "explode -> per-(doc,token) count -> per-doc agg; both shuffles "
    "key on doc_id so the second is a no-op repartition at scale.",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        ),
        cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct_tokens,
               round(max(c) * 1.0 / sum(c), 6) AS top_token_share,
               round(count(*) * 1.0 / sum(c), 6) AS distinct_ratio
        FROM cnt
        GROUP BY doc_id
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    cnt = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_token_share"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("distinct_ratio"),
    )


@register(
    "text_gopher_quality",
    family="text",
    doc="Gopher-rule quality gate: word-count band, mean-word-length "
    "band, and alphabetic-token ratio evaluated per document in one "
    "codegen projection -- no shuffle at all (the cheapest possible "
    "100 TB pass).",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   string_split(text, ' ') AS toks
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_words,
                   round(list_aggregate(list_transform(toks, x -> len(x) * 1.0),
                                        'avg'), 6) AS mean_word_len,
                   round(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
                         * 1.0 / len(toks), 6) AS alpha_ratio
            FROM t
        )
        SELECT doc_id, n_words, mean_word_len, alpha_ratio,
               n_words BETWEEN 50 AND 100000
                   AND mean_word_len BETWEEN 3 AND 10
                   AND alpha_ratio >= 0.8 AS passes
        FROM m
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_words = F.size(toks).cast("long")
    mean_wl = F.round(
        F.aggregate(toks, F.lit(0.0), lambda acc, x: acc + F.length(x)) / n_words, 6
    )
    alpha_ratio = F.round(
        F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]"))) / n_words, 6
    )
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
    )
    return out.withColumn(
        "passes",
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("alpha_ratio") >= 0.8),
    )


@register(
    "ann_knn_graph",
    family="ann",
    doc="k-nearest-neighbor graph (k=5, cosine) over the embedding "
    "table -- the input shape for graph-based clustering and "
    "near-dup sweeps. Exact pairwise form at oracle SF; at 100 TB "
    "candidate generation swaps to the banded-LSH bucket join "
    "(cosine_pairs_lsh) with identical downstream ranking.",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        p AS (
            SELECT a.vec_id AS src, b.vec_id AS dst,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
            FROM e a JOIN e b ON a.vec_id <> b.vec_id
        )
        SELECT src, dst, cos_sim,
               CAST(row_number() OVER (
                   PARTITION BY src ORDER BY cos_sim DESC, dst) AS BIGINT)
                   AS rank
        FROM p QUALIFY rank <= 5
    """,
)
def ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.operators.ann import knn_pair_scores

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # blocked numpy scoring pass (r11): the nested-loop join scored
    # every directed pair through an interpreted aggregate fold
    # (~2.5s of the 2.5s query); knn_pair_scores replays the exact
    # fold arithmetic per block pair and emits raw ratios, so the
    # round + rank window below see bit-identical doubles
    pairs = knn_pair_scores(spread(emb), local_top=5).select(
        "src", "dst", F.round(F.col("ratio"), 6).alias("cos_sim")
    )
    w = Window.partitionBy("src").orderBy(F.col("cos_sim").desc(), "dst")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
    )


@register(
    "embedding_centroid_stats",
    family="ann",
    doc="Per-label centroid norm + mean vector magnitude (embedding-"
    "space QA: collapsed or mis-scaled clusters show up immediately). "
    "posexplode -> (label, pos) partial means -> per-label reduce; "
    "both shuffles key on label/pos, uniform by construction.",
    oracle="""
        WITH n AS (
            SELECT label,
                   CAST(count(*) AS BIGINT) AS n_vecs,
                   round(avg(sqrt(list_aggregate(
                       list_transform(embedding, x -> x * x * 1.0), 'sum'))), 6)
                       AS avg_norm
            FROM embeddings GROUP BY label
        ),
        u AS (
            SELECT label,
                   generate_subscripts(embedding, 1) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        c AS (SELECT label, pos, avg(v) AS m FROM u GROUP BY 1, 2),
        cn AS (
            SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm
            FROM c GROUP BY label
        )
        SELECT n.label, n.n_vecs, n.avg_norm, cn.centroid_norm
        FROM n JOIN cn USING (label)
    """,
)
def embedding_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    norm_d = F.sqrt(
        F.aggregate(
            "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    n = emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg(norm_d), 6).alias("avg_norm"),
    )
    u = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    c = u.groupBy("label", "pos").agg(F.avg(F.col("v").cast("double")).alias("m"))
    cn = c.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm")
    )
    return n.join(cn, "label").select("label", "n_vecs", "avg_norm", "centroid_norm")


@register(
    "embedding_quantize_int8",
    family="ann",
    doc="Symmetric per-vector int8 quantization: scale = max|v|/127, "
    "q = floor(v/scale + 0.5) clamped to [-127,127], with max "
    "reconstruction error per vector -- the storage path that cuts "
    "an embedding corpus 4x before ANN. One codegen projection, no "
    "shuffle; floor(x+0.5) keeps Spark and DuckDB rounding identical.",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        s AS (
            SELECT vec_id, v,
                   list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0
                       AS scale
            FROM e
        ),
        q AS (
            SELECT vec_id, v, scale,
                   list_transform(v, x -> CAST(greatest(least(
                       floor(x / scale + 0.5), 127), -127) AS BIGINT)) AS qv
            FROM s
        )
        SELECT vec_id,
               round(scale, 6) AS scale,
               qv[1] AS q_first,
               CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
               round(list_aggregate(
                   list_transform(range(1, len(v) + 1),
                                  i -> abs(v[i] - qv[i] * scale)), 'max'), 6)
                   AS max_abs_err
        FROM q
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    scale = (
        F.array_max(F.transform("v", lambda x: F.abs(x))) / F.lit(127.0)
    ).alias("scale")
    s = emb.select("vec_id", "v", scale)
    qv = F.transform(
        "v",
        lambda x: F.greatest(
            F.least(F.floor(x / F.col("scale") + F.lit(0.5)), F.lit(127)), F.lit(-127)
        ).cast("long"),
    )
    q = s.select("vec_id", "v", "scale", qv.alias("qv"))
    err = F.array_max(
        F.zip_with("v", "qv", lambda x, qx: F.abs(x - qx * F.col("scale")))
    )
    # err is materialized BEFORE the rounded alias shadows `scale`:
    # Spark 4 lateral column aliases would otherwise resolve the
    # zip_with's `scale` to the rounded output column
    scored = q.withColumn("max_abs_err", F.round(err, 6))
    return scored.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.col("qv")[0].alias("q_first"),
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        "max_abs_err",
    )


@register(
    "text_unicode_stats",
    family="text",
    doc="Per-source charset diagnostics: non-ASCII char ratio, digit "
    "ratio, and uppercase ratio -- the encoding-corruption and "
    "boilerplate signals a multilingual corpus QA pass reads first. "
    "One scan, map-side partials on the tiny source key.",
    oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(sum(len(regexp_replace(text, '[\\x00-\\x7F]', '', 'g'))
                         * 1.0) / sum(len(text)), 6) AS non_ascii_ratio,
               round(sum(len(regexp_replace(text, '[^0-9]', '', 'g'))
                         * 1.0) / sum(len(text)), 6) AS digit_ratio,
               round(sum(len(regexp_replace(text, '[^A-Z]', '', 'g'))
                         * 1.0) / sum(len(text)), 6) AS upper_ratio
        FROM documents
        GROUP BY source
    """,
)
def text_unicode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    n = F.length("text")
    per = docs.select(
        "source",
        n.alias("n_chars_total"),
        F.length(F.regexp_replace("text", r"[\x00-\x7F]", "")).alias("n_non_ascii"),
        F.length(F.regexp_replace("text", r"[^0-9]", "")).alias("n_digit"),
        F.length(F.regexp_replace("text", r"[^A-Z]", "")).alias("n_upper"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("n_non_ascii") / F.sum("n_chars_total"), 6).alias(
            "non_ascii_ratio"
        ),
        F.round(F.sum("n_digit") / F.sum("n_chars_total"), 6).alias("digit_ratio"),
        F.round(F.sum("n_upper") / F.sum("n_chars_total"), 6).alias("upper_ratio"),
    )


@register(
    "ts_max_n",
    family="timeseries",
    doc="Toolkit max_n/min_n analog: the top-3 values per event_type "
    "with their timestamps, one output row per rank. row_number over "
    "(value, event_id) -- deterministic under ties; at scale the "
    "window rides a single shuffle on the series key and AQE-local "
    "top-k (rank pushdown) keeps the sort partial.",
    oracle="""
        SELECT event_type, rank, value, lsn
        FROM (
            SELECT event_type,
                   CAST(row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY value DESC, event_id) AS BIGINT) AS rank,
                   value,
                   event_id AS lsn
            FROM events
        )
        WHERE rank <= 3
    """,
)
def ts_max_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        events.select(
            "event_type",
            F.row_number().over(w).cast("long").alias("rank"),
            "value",
            F.col("event_id").alias("lsn"),
        )
        .filter(F.col("rank") <= 3)
    )


@register(
    "dedup_cross_source",
    family="dedup",
    doc="Cross-source duplication matrix: for every exact-content "
    "match spanning two different sources, count the (source_a, "
    "source_b) pair -- the who-copies-whom diagnostic that decides "
    "source priority before dedup. Distinct (hash, source) first, so "
    "the within-hash self-join is bounded by source cardinality, not "
    "copy count. NOTE: the driver testdata plants no cross-source "
    "copies, so this row is legitimately 0-vs-0 against the oracle; "
    "the nonzero-matrix behavior is pinned by a planted-duplicate "
    "pytest (tests/test_dedup.py::test_cross_source_matrix_planted).",
    oracle="""
        WITH hs AS (
            SELECT DISTINCT md5(text) AS h, source FROM documents
        )
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS n_shared_docs
        FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2
    """,
)
def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.dedup import cross_source_matrix

    return cross_source_matrix(load(spark, sf_dir, "documents"))


@register(
    "text_token_entropy",
    family="text",
    doc="Per-document unigram (token) Shannon entropy in bits -- low "
    "entropy flags boilerplate/generated text, high entropy flags "
    "noise; the statistical cousin of the repetition filter. "
    "explode -> (doc, token) counts -> per-doc entropy reduce; both "
    "shuffles keyed on doc_id.",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        ),
        cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
        tot AS (
            SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM cnt
        )
        SELECT doc_id,
               CAST(max(n) AS BIGINT) AS n_tokens,
               round(-sum((c / n) * log2(c / n)), 6) AS token_entropy_bits
        FROM tot
        GROUP BY doc_id
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = spread(load(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    cnt = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").over(Window.partitionBy("doc_id"))
    tot = cnt.select("doc_id", "c", n.alias("n"))
    p = F.col("c") / F.col("n")
    return tot.groupBy("doc_id").agg(
        F.max("n").alias("n_tokens"),
        F.round(-F.sum(p * F.log2(p)), 6).alias("token_entropy_bits"),
    )
