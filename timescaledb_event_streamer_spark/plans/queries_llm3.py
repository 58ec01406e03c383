"""LLM-pipeline corpus QA, part 3 (SURVEY.md §2 D17-D18, F22):
segment-level (CCNet-style "paragraph") dedup, duplicated-substring
token coverage (the Lee et al. exact-substring dedup statistic on a
bounded window), and Bloom-filter benchmark decontamination — the
100 TB swap-in for the exact broadcast probe (F8).

Same discipline as queries_llm2: every plan is doc/segment/gram-keyed
DataFrame work in whole-stage codegen — no Python per row — and every
operator carries a DuckDB oracle that re-derives the result (the
Bloom filter is deterministic, so even the approximate probe is
value-exact across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load, spread

#: CCNet-analog segment width: the synthetic corpus is a flat token
#: stream (no newlines), so "paragraphs" are non-overlapping 12-token
#: blocks — the same deterministic segmentation text_chunk_windows
#: (F15) uses, narrowed so per-doc segment counts stay meaningful on
#: 10-110-token documents.
_SEG_TOKENS = 12

#: Duplicated-substring window: 10 tokens, the scaled-down stand-in
#: for the 50-token windows of Lee et al. 2021 ("Deduplicating
#: Training Data Makes Language Models Better").
_SUB_TOKENS = 10

#: Deterministic Bloom geometry: m = 2^16 bits, k = 3 hashes drawn
#: from disjoint 8-hex-char slices of md5 — both engines re-derive
#: identical bit positions, so the probe is value-exact, false
#: positives included.
_BLOOM_M = 65536


@register(
    "dedup_paragraphs",
    family="dedup",
    doc="Segment-level dedup (the CCNet paragraph-dedup analog, "
    "scaled to the corpus's flat token stream): each document splits "
    "into non-overlapping 12-token segments; a segment position is "
    "duplicated when its text also appears in at least one OTHER "
    "document. Per document: segment count, duplicated-position "
    "count, and the duplicated fraction — the removal plan a "
    "line/paragraph-level pass would execute. Plan shape: one corpus "
    "scan -> segment explode; the per-segment distinct-doc count and "
    "the position join both shuffle on the near-unique segment text "
    "(the dedup_common_shingles key discipline); the final fold "
    "shuffles on doc_id. No all-pairs path at any scale.",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        seg AS (
            SELECT doc_id, i,
                   array_to_string(toks[i + 1 : i + 12], ' ') AS g
            FROM t, unnest(range(0, len(toks), 12)) AS u(i)
        ),
        dc AS (SELECT g, count(DISTINCT doc_id) AS nd FROM seg GROUP BY g)
        SELECT doc_id,
               count(*) AS n_segments,
               CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_segments,
               round(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 6) AS dup_segment_fraction
        FROM seg JOIN dc USING (g)
        GROUP BY doc_id
    """,
)
def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return paragraph_dedup(spread(load(spark, sf_dir, "documents")))


def paragraph_dedup(docs: DataFrame) -> DataFrame:
    toks = F.split("text", " ")
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(_SEG_TOKENS))
    seg = docs.select(
        "doc_id", toks.alias("toks"), F.explode(starts).alias("i")
    ).select(
        "doc_id",
        "i",
        F.concat_ws(" ", F.slice("toks", F.col("i") + 1, _SEG_TOKENS)).alias("g"),
    )
    # distinct-doc count per segment text: near-unique key, one
    # segment-keyed shuffle; identical segments within one doc fold
    # to a single (g, doc) row before the count
    dc = (
        seg.select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    dup = F.sum(F.when(F.col("nd") >= 2, F.lit(1)).otherwise(F.lit(0)))
    return (
        seg.join(dc, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            dup.cast("long").alias("dup_segments"),
            F.round(dup / F.count(F.lit(1)), 6).alias("dup_segment_fraction"),
        )
    )


@register(
    "text_substring_dedup",
    family="dedup",
    doc="Duplicated-substring token coverage — the statistic exact-"
    "substring dedup (Lee et al. 2021) removes on, over a bounded "
    "10-token window: a token position is 'covered' when any sliding "
    "10-gram through it also occurs in another document. Per "
    "document: token count, covered-token count, coverage fraction. "
    "Plan: sliding position-stamped grams (one explode), distinct-doc "
    "count on the gram key, then ONLY the cross-doc-duplicated "
    "occurrences explode their 10 covered positions (bounded 10x on "
    "the dup subset, not the corpus) before a doc-keyed distinct "
    "fold. Documents shorter than the window are excluded on both "
    "sides.",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents
            WHERE len(string_split(text, ' ')) >= 10
        ),
        g AS (
            SELECT doc_id, i,
                   array_to_string(toks[i + 1 : i + 10], ' ') AS g
            FROM t, unnest(range(0, len(toks) - 9)) AS u(i)
        ),
        dc AS (SELECT g, count(DISTINCT doc_id) AS nd FROM g GROUP BY g),
        cov AS (
            SELECT DISTINCT doc_id, i + d AS pos
            FROM g JOIN dc USING (g), unnest(range(10)) AS w(d)
            WHERE nd >= 2
        ),
        base AS (SELECT doc_id, len(toks) AS n FROM t)
        SELECT base.doc_id,
               base.n AS n_tokens,
               CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_tokens,
               round(coalesce(c.covered, 0) * 1.0 / base.n, 6)
                   AS coverage_fraction
        FROM base
        LEFT JOIN (
            SELECT doc_id, count(*) AS covered FROM cov GROUP BY doc_id
        ) c USING (doc_id)
    """,
)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return substring_dedup(spread(load(spark, sf_dir, "documents")))


def substring_dedup(docs: DataFrame) -> DataFrame:
    toks = F.split("text", " ")
    t = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= _SUB_TOKENS
    )
    starts = F.sequence(F.lit(0), F.size("toks") - _SUB_TOKENS)
    g = t.select(
        "doc_id",
        F.explode(starts).alias("i"),
        F.col("toks"),
    ).select(
        "doc_id",
        "i",
        F.concat_ws(" ", F.slice("toks", F.col("i") + 1, _SUB_TOKENS)).alias("g"),
    )
    dc = (
        g.select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    # coverage explode happens on the duplicated subset only: the
    # worst case is 10x that subset, never 10x the corpus
    cov = (
        g.join(dc, "g")
        .filter(F.col("nd") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + _SUB_TOKENS - 1)
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("covered"))
    )
    base = t.select("doc_id", F.size("toks").alias("n_tokens"))
    covered = F.coalesce(F.col("covered"), F.lit(0))
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        covered.cast("long").alias("covered_tokens"),
        F.round(covered / F.col("n_tokens"), 6).alias("coverage_fraction"),
    )


def _bloom_positions(col):
    """The k=3 deterministic Bloom bit positions of a shingle: three
    disjoint 8-hex-char md5 slices mod m — reproducible in any engine
    with md5, which is what makes the approximate probe value-exact
    (same bitmap, same false positives)."""
    return [
        (
            F.conv(F.substring(F.md5(col), 1 + 8 * j, 8), 16, 10).cast("long")
            % _BLOOM_M
        )
        for j in range(3)
    ]


@register(
    "text_bloom_decontamination",
    family="text",
    doc="Bloom-filter benchmark decontamination — the 100 TB swap-in "
    "for text_decontamination's broadcast-set probe (F8): when the "
    "held-out benchmark's shingle set outgrows a raw broadcast, ship "
    "a fixed 64 Kbit bitmap instead (8 KiB regardless of benchmark "
    "size) and probe it per corpus shingle. The filter is "
    "deterministic (k=3 md5-slice hashes), so the oracle re-derives "
    "the identical bitmap and the result — false positives included "
    "— is value-exact across engines. Plan: the benchmark side folds "
    "its bit positions into ONE map row (a word-indexed int64 "
    "bitmap) broadcast to every executor; the corpus side computes 3 "
    "hashes per shingle and does 3 O(1) map lookups — no shuffle for "
    "the probe, one doc-keyed agg shuffle. bloom_hits >= the exact "
    "probe's hits by construction (pytest-asserted alongside the FP "
    "margin).",
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
        bits AS (
            SELECT DISTINCT
                   ('0x' || substr(md5(s), 1 + 8 * j, 8))::BIGINT % 65536 AS p
            FROM (SELECT DISTINCT s FROM sh WHERE doc_id % 100 = 0),
                 unnest([0, 1, 2]) AS k(j)
        )
        SELECT sh.doc_id,
               count(*) AS n_shingles,
               CAST(sum(CASE WHEN
                       ('0x' || substr(md5(s), 1, 8))::BIGINT % 65536
                           IN (SELECT p FROM bits)
                   AND ('0x' || substr(md5(s), 9, 8))::BIGINT % 65536
                           IN (SELECT p FROM bits)
                   AND ('0x' || substr(md5(s), 17, 8))::BIGINT % 65536
                           IN (SELECT p FROM bits)
                   THEN 1 ELSE 0 END) AS BIGINT) AS bloom_hits,
               round(sum(CASE WHEN
                       ('0x' || substr(md5(s), 1, 8))::BIGINT % 65536
                           IN (SELECT p FROM bits)
                   AND ('0x' || substr(md5(s), 9, 8))::BIGINT % 65536
                           IN (SELECT p FROM bits)
                   AND ('0x' || substr(md5(s), 17, 8))::BIGINT % 65536
                           IN (SELECT p FROM bits)
                   THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
                   AS bloom_contamination
        FROM sh
        WHERE sh.doc_id % 100 != 0
        GROUP BY sh.doc_id
    """,
)
def text_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bloom_decontamination(spread(load(spark, sf_dir, "documents")))


def _doc_shingles(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    bigrams = F.array_distinct(
        F.expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))")
    )
    return (
        docs.select(F.col("doc_id"), toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select("doc_id", F.explode(bigrams).alias("s"))
    )


def bloom_bitmap(bench_docs: DataFrame) -> DataFrame:
    """Benchmark side -> bit positions -> ONE row holding the bitmap
    as a word-indexed map of int64s (8 KiB at m=2^16, fixed size no
    matter how large the benchmark grows). Static by nature: in a
    live ingest pipeline this is the broadcast side of a
    stream-static probe (tests/test_streaming.py parity)."""
    bench = _doc_shingles(bench_docs).select("s").distinct()
    pos = bench.select(
        F.explode(F.array(*_bloom_positions(F.col("s")))).alias("p")
    ).distinct()
    bitmap = (
        pos.select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
    )
    return bitmap.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("bloom")
    )


def bloom_probe(docs: DataFrame, bloom: DataFrame) -> DataFrame:
    """Corpus side: 3 hashes per shingle, 3 O(1) map probes against
    the broadcast 1-row bitmap, one doc-keyed agg shuffle. ``docs``
    may be a streaming DataFrame (stream-static broadcast probe +
    complete-mode fold)."""
    p0, p1, p2 = _bloom_positions(F.col("s"))
    probed = (
        _doc_shingles(docs)
        .crossJoin(F.broadcast(bloom))
        .select(
            "doc_id",
            p0.alias("p0"),
            p1.alias("p1"),
            p2.alias("p2"),
            F.col("bloom"),
        )
    )
    hit = F.lit(True)
    for name in ("p0", "p1", "p2"):
        hit = hit & F.expr(
            f"coalesce(element_at(bloom, CAST({name} / 64 AS BIGINT)), 0L) "
            f"& shiftleft(1L, CAST({name} % 64 AS INT)) != 0"
        )
    hits = F.sum(F.when(hit, F.lit(1)).otherwise(F.lit(0)))
    return probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        hits.cast("long").alias("bloom_hits"),
        F.round(hits / F.count(F.lit(1)), 6).alias("bloom_contamination"),
    )


def bloom_decontamination(docs: DataFrame) -> DataFrame:
    bloom = bloom_bitmap(docs.filter(F.col("doc_id") % 100 == 0))
    return bloom_probe(docs.filter(F.col("doc_id") % 100 != 0), bloom)


@register(
    "embedding_matryoshka_topk",
    family="ann",
    doc="Matryoshka truncation audit (E15): rank the corpus against "
    "the vec_id=0 query by full-dimension cosine AND by cosine over "
    "the first half of the dimensions (the MRL serving trick: "
    "truncated prefixes as cheaper first-pass vectors), then full-"
    "outer-join the two top-10 lists — rows present in only one "
    "ranking expose exactly what truncation re-orders, and the "
    "carried cosine columns quantify by how much. Plan: each top-10 "
    "is a distributed ordered take over the scored projection (both "
    "similarities in one codegen stage, slice + fold, no Python; "
    "the two takes each re-scan the projected columns — a "
    "deployment wanting one physical scan persists `scored`), and "
    "the rank join touches 20 rows of metadata. No global window. "
    "The fold is a sequential left fold in double, the "
    "round-6 contract that keeps cosine bit-stable vs DuckDB's "
    "list_cosine_similarity.",
    oracle="""
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv,
                   CAST(embedding[1 : len(embedding) // 2] AS DOUBLE[]) AS qh
            FROM embeddings WHERE vec_id = 0
        ),
        s AS (
            SELECT vec_id, label,
                   round(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6)
                       AS cosine_full,
                   round(list_cosine_similarity(
                       CAST(embedding[1 : len(embedding) // 2] AS DOUBLE[]),
                       (SELECT qh FROM q)), 6) AS cosine_trunc
            FROM embeddings
        ),
        tf AS (
            SELECT *, CAST(row_number() OVER
                       (ORDER BY cosine_full DESC, vec_id) AS BIGINT)
                       AS rank_full
            FROM s QUALIFY rank_full <= 10
        ),
        tt AS (
            SELECT *, CAST(row_number() OVER
                       (ORDER BY cosine_trunc DESC, vec_id) AS BIGINT)
                       AS rank_trunc
            FROM s QUALIFY rank_trunc <= 10
        )
        SELECT coalesce(tf.vec_id, tt.vec_id) AS vec_id,
               coalesce(tf.label, tt.label) AS label,
               coalesce(tf.cosine_full, tt.cosine_full) AS cosine_full,
               coalesce(tf.cosine_trunc, tt.cosine_trunc) AS cosine_trunc,
               tf.rank_full,
               tt.rank_trunc
        FROM tf FULL JOIN tt ON tf.vec_id = tt.vec_id
    """,
)
def embedding_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ann import cosine
    from timescaledb_event_streamer_spark.plans.queries_llm import _query_vec

    qv = _query_vec(spark, sf_dir)
    qh = qv[: len(qv) // 2]
    emb = load(spark, sf_dir, "embeddings")
    half = F.floor(F.size("embedding") / 2).cast("int")
    scored = emb.select(
        "vec_id",
        "label",
        F.round(
            cosine(
                F.col("embedding").cast("array<double>"),
                F.array(*[F.lit(v) for v in qv]),
            ),
            6,
        ).alias("cosine_full"),
        F.round(
            cosine(
                F.slice(F.col("embedding"), F.lit(1), half).cast("array<double>"),
                F.array(*[F.lit(v) for v in qh]),
            ),
            6,
        ).alias("cosine_trunc"),
    )
    val_cols = ["vec_id", "label", "cosine_full", "cosine_trunc"]

    def _rank(df: DataFrame, by: str, rank_name: str) -> DataFrame:
        from pyspark.sql import Window

        # distributed ordered take first; the row_number window then
        # runs over 10 rows of metadata, not the corpus
        top = df.orderBy(F.col(by).desc(), "vec_id").limit(10)
        w = Window.orderBy(F.col(by).desc(), "vec_id")
        return top.withColumn(rank_name, F.row_number().over(w).cast("long"))

    tf = _rank(scored, "cosine_full", "rank_full")
    tt = _rank(scored, "cosine_trunc", "rank_trunc")
    joined = tf.alias("f").join(
        tt.alias("t"), F.col("f.vec_id") == F.col("t.vec_id"), "full_outer"
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"f.{c}"), F.col(f"t.{c}")).alias(c)
            for c in val_cols
        ],
        F.col("f.rank_full").alias("rank_full"),
        F.col("t.rank_trunc").alias("rank_trunc"),
    )


@register(
    "text_bigram_surprise",
    family="text",
    doc="Add-1-smoothed bigram cross-entropy in bits/bigram — the "
    "conditional-LM step past text_perplexity_proxy's unigram "
    "surprise (F19): p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V) over "
    "the corpus's own counts, so looping phrases score low and "
    "locally-novel transitions score high even when every unigram "
    "is common. Plan: one scan -> per-doc bigram counts; corpus "
    "bigram and left-unigram frequencies reduce from the same "
    "counts (map-side partials); V folds back as a 1-row broadcast; "
    "joins are keyed on the bigram and on w1 (AQE handles the "
    "stopword-skewed w1 key). Same round-6 normalized-bits contract "
    "as F19.",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        bg AS (
            SELECT doc_id, toks[i + 1] AS w1,
                   toks[i + 1] || ' ' || toks[i + 2] AS b
            FROM t, unnest(range(len(toks) - 1)) AS u(i)
            WHERE len(toks) >= 2
        ),
        cnt AS (SELECT doc_id, w1, b, count(*) AS c FROM bg GROUP BY 1, 2, 3),
        bf AS (SELECT b, CAST(sum(c) AS BIGINT) AS bf FROM cnt GROUP BY b),
        uf AS (SELECT w1, CAST(sum(c) AS BIGINT) AS uf FROM cnt GROUP BY w1),
        v AS (
            SELECT count(DISTINCT tok) AS v
            FROM (SELECT unnest(toks) AS tok FROM t)
        )
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_bigrams,
               round(-sum(c * log2((bf + 1.0) / (uf + v))) / sum(c), 6)
                   AS bigram_cross_entropy_bits
        FROM cnt JOIN bf USING (b) JOIN uf USING (w1), v
        GROUP BY doc_id
    """,
)
def text_bigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_surprise(spread(load(spark, sf_dir, "documents")))


def bigram_surprise(docs: DataFrame) -> DataFrame:
    toks = F.split("text", " ")
    bg = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2), "
                    "i -> struct(t[i] AS w1, concat(t[i], ' ', t[i + 1]) AS b))"
                )
            ).alias("x"),
        )
        .select("doc_id", "x.w1", "x.b")
    )
    cnt = bg.groupBy("doc_id", "w1", "b").agg(F.count(F.lit(1)).alias("c"))
    # bigram/left-unigram totals as partitioned count-windows over the
    # SAME cnt pass (r11, the training-corpus fuse): the join form fanned
    # cnt into three consumers — two aggregations plus the join-back —
    # re-running the explode+count subtree; the windows read it once.
    # Exact long sums either way -> identical rows (oracle-pinned).
    v = (
        docs.select(F.explode(toks).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )  # 1 row -> broadcast
    joined = (
        cnt.withColumn("bf", F.sum("c").over(Window.partitionBy("b")))
        .withColumn("uf", F.sum("c").over(Window.partitionBy("w1")))
        .crossJoin(F.broadcast(v))
    )
    bits = F.col("c") * F.log2((F.col("bf") + F.lit(1.0)) / (F.col("uf") + F.col("v")))
    return joined.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(-F.sum(bits) / F.sum("c"), 6).alias("bigram_cross_entropy_bits"),
    )


@register(
    "media_wav_pcm_stats",
    family="multimodal",
    doc="PCM signal statistics from WAV bytes (G6) — the one "
    "modality where FEATURE EXTRACTION (not just header probing, "
    "G4/G5) runs for real without a codec library: raw mono 16-bit "
    "PCM parses as fixed-offset LE integer reads, so peak / DC sum "
    "/ energy / zero-crossings come straight off the sample bytes "
    "in one narrow codegen projection per row, no shuffle, no "
    "Python — the audio-lake admission features (clipping, silence, "
    "DC offset) at any scale. Payloads synthesized as real WAV "
    "bytes (44-byte canonical header + data chunk) from events; the "
    "parse side sees ONLY the binary column, the fold is capped at "
    "1024 samples against hostile size fields, and the oracle "
    "re-derives every statistic from the generator formula, so a "
    "synth/parse bug cannot cancel out. All-integer arithmetic: "
    "exact at any summation order.",
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
               true AS is_pcm_wav,
               CAST(n AS BIGINT) AS n_samples,
               CAST(rate AS BIGINT) AS sample_rate,
               CAST(floor(n * 1000 / rate) AS BIGINT) AS duration_ms,
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
def media_wav_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.multimodal import (
        synthesize_wav_pcm,
        wav_pcm_stats,
    )

    events = load(spark, sf_dir, "events")
    return wav_pcm_stats(synthesize_wav_pcm(events))


@register(
    "ann_matryoshka_rerank",
    family="ann",
    doc="Two-stage Matryoshka serving (E16, composing E15 into the "
    "real MRL pattern): stage 1 ranks the corpus by HALF-dimension "
    "prefix cosine (half the fold cost per vector at scan time), "
    "stage 2 exactly re-ranks only the top-50 candidates at full "
    "dimension and returns the final top-10 with both scores and "
    "the stage-1 rank — cand_rank vs rank shows exactly how much "
    "the cheap pass misordered. Plan: one scored scan, a "
    "distributed ordered take for the 50-row candidate set, then "
    "windows over 50 rows of metadata. At 100 TB the full-dim fold "
    "runs on 50 rows instead of the corpus.",
    oracle="""
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv,
                   CAST(embedding[1 : len(embedding) // 2] AS DOUBLE[]) AS qh
            FROM embeddings WHERE vec_id = 0
        ),
        s AS (
            SELECT vec_id, label,
                   round(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6)
                       AS cosine_full,
                   round(list_cosine_similarity(
                       CAST(embedding[1 : len(embedding) // 2] AS DOUBLE[]),
                       (SELECT qh FROM q)), 6) AS cosine_trunc
            FROM embeddings
        ),
        cand AS (
            SELECT *, CAST(row_number() OVER
                       (ORDER BY cosine_trunc DESC, vec_id) AS BIGINT)
                       AS cand_rank
            FROM s QUALIFY cand_rank <= 50
        )
        SELECT CAST(row_number() OVER
                   (ORDER BY cosine_full DESC, vec_id) AS BIGINT) AS rank,
               vec_id, label, cosine_full, cosine_trunc, cand_rank
        FROM cand
        QUALIFY rank <= 10
    """,
)
def ann_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.operators.ann import cosine
    from timescaledb_event_streamer_spark.plans.queries_llm import _query_vec

    qv = _query_vec(spark, sf_dir)
    qh = qv[: len(qv) // 2]
    emb = load(spark, sf_dir, "embeddings")
    half = F.floor(F.size("embedding") / 2).cast("int")
    # stage 1 computes ONLY the half-dim cosine — the full-dim fold
    # must not run corpus-wide or the two-stage saving is fiction
    trunc_scored = emb.select(
        "vec_id",
        "label",
        F.round(
            cosine(
                F.slice(F.col("embedding"), F.lit(1), half).cast("array<double>"),
                F.array(*[F.lit(v) for v in qh]),
            ),
            6,
        ).alias("cosine_trunc"),
    )
    # distributed ordered take -> 50-row candidate set
    top_trunc = trunc_scored.orderBy(
        F.col("cosine_trunc").desc(), "vec_id"
    ).limit(50)
    # stage 2: join the candidate ids back to the vectors (broadcast
    # the 50-row side) so the full-dim fold runs on 50 rows only
    cand = emb.join(F.broadcast(top_trunc), ["vec_id", "label"]).select(
        "vec_id",
        "label",
        F.round(
            cosine(
                F.col("embedding").cast("array<double>"),
                F.array(*[F.lit(v) for v in qv]),
            ),
            6,
        ).alias("cosine_full"),
        "cosine_trunc",
    )
    w_cand = Window.orderBy(F.col("cosine_trunc").desc(), "vec_id")
    w_full = Window.orderBy(F.col("cosine_full").desc(), "vec_id")
    return (
        cand.withColumn("cand_rank", F.row_number().over(w_cand).cast("long"))
        .withColumn("rank", F.row_number().over(w_full).cast("long"))
        .filter(F.col("rank") <= 10)
        .select(
            "rank", "vec_id", "label", "cosine_full", "cosine_trunc", "cand_rank"
        )
    )


_SWEEP_THRESHOLDS = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)


#: calibration-sample target size: the sweep runs all-pairs on a
#: deterministic ~500-vector sample (every m-th id, m = floor(n/500)),
#: so its cost is CONSTANT in corpus size — the standard
#: calibrate-on-a-sample practice, and the reason this operator stays
#: off the all-pairs scaling cliff the naive form measured (74s at
#: sf0.1 before the sample stage was added)
_SWEEP_SAMPLE = 500


def _sweep_oracle() -> str:
    return """
        WITH m AS (
            SELECT greatest(CAST(floor(count(*) / 500.0) AS BIGINT), 1)
                AS m
            FROM embeddings
        ),
        e0 AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings, m
            WHERE vec_id % m = 0
        ),
        e AS (
            SELECT vec_id,
                   list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                       AS v
            FROM e0
        ),
        pairs AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_dot_product(a.v, b.v), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v), 6) >= 0.3
        ),
        sweep AS (
            SELECT t, vec_a, vec_b
            FROM pairs, unnest([0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS u(t)
            WHERE cosine >= t
        ),
        ex AS (SELECT t, unnest([vec_a, vec_b]) AS vec FROM sweep),
        agg AS (
            SELECT round(t, 1) AS threshold,
                   CAST(count(*) / 2 AS BIGINT) AS n_pairs,
                   CAST(count(DISTINCT vec) AS BIGINT) AS n_docs_involved
            FROM ex
            GROUP BY t
        )
        SELECT round(u.t, 1) AS threshold,
               coalesce(agg.n_pairs, 0) AS n_pairs,
               coalesce(agg.n_docs_involved, 0) AS n_docs_involved
        FROM unnest([0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS u(t)
        LEFT JOIN agg ON round(u.t, 1) = agg.threshold
    """


@register(
    "dedup_threshold_sweep",
    family="dedup",
    doc="Embedding-dedup threshold calibration (D19): pair counts "
    "and affected-document counts at every candidate cosine cutoff "
    "in ONE pass over the scored pairs — the sweep a pipeline runs "
    "before committing to a dedup threshold (too low merges "
    "distinct docs, too high keeps near-copies). Stage 1 is "
    "all-pairs over a DETERMINISTIC ~500-vector sample (every m-th "
    "id, m data-derived as a 1-row broadcast) — the standard "
    "calibrate-on-a-sample practice, making the sweep's cost "
    "constant in corpus size (the naive full all-pairs form "
    "measured 74s at sf0.1 and was scrapped; the committed "
    "threshold then runs via D6's LSH path). At oracle SF the "
    "sample is the whole set, so the 0.4 row equals D5 exactly "
    "(pytest). Each scored pair feeds every qualifying threshold "
    "via a literal-array explode; the fold is threshold-keyed "
    "metadata, zeros included.",
    oracle=_sweep_oracle(),
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ann import cosine_pairs

    emb = load(spark, sf_dir, "embeddings")
    m = emb.agg(
        F.greatest(
            F.floor(F.count(F.lit(1)) / _SWEEP_SAMPLE), F.lit(1)
        ).cast("long").alias("m")
    )
    sample = (
        emb.crossJoin(F.broadcast(m))
        .filter(F.col("vec_id") % F.col("m") == 0)
        .select("vec_id", "embedding")
    )
    pairs = cosine_pairs(sample, threshold=min(_SWEEP_THRESHOLDS))
    swept = pairs.select(
        F.explode(
            F.filter(
                F.array(*[F.lit(t) for t in _SWEEP_THRESHOLDS]),
                lambda t: F.col("cosine") >= t,
            )
        ).alias("threshold"),
        "vec_a",
        "vec_b",
    )
    agg = (
        swept.select(
            F.round("threshold", 1).alias("threshold"),
            F.explode(F.array("vec_a", "vec_b")).alias("vec"),
        )
        .groupBy("threshold")
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_pairs"),
            F.countDistinct("vec").alias("n_docs_involved"),
        )
    )
    # every candidate threshold appears in the sweep, zeros included —
    # the empty tail is exactly what tells the operator the cutoff is
    # already past the duplicate mass
    grid = pairs.sparkSession.range(1).select(
        F.explode(
            F.array(*[F.round(F.lit(t), 1) for t in _SWEEP_THRESHOLDS])
        ).alias("threshold")
    )
    return grid.join(F.broadcast(agg), "threshold", "left").select(
        "threshold",
        F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
        F.coalesce("n_docs_involved", F.lit(0)).alias("n_docs_involved"),
    )
