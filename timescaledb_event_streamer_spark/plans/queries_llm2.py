"""LLM-pipeline corpus QA, part 2 (SURVEY.md §2.F19-F21, D14-D15,
E12, G5): model-free perplexity proxy, within-doc duplicate-n-gram
fraction (the Gopher repetition rule family), cross-doc
shared-shingle boilerplate fraction, the composed training-corpus
admission ledger, the end-to-end near-dup dedup pipeline, filtered
similarity search, and the JPEG header probe registration.

Every operator is a DataFrame plan with shuffles keyed on
token/shingle/doc — no Python per row, no driver loops — and each
carries a DuckDB oracle that recomputes the result independently
from the raw inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.operators.textstats import shingles
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load, spread


@register(
    "text_perplexity_proxy",
    family="text",
    doc="Model-free perplexity proxy: per-document cross-entropy in "
    "bits/token under the corpus's own unigram distribution (the "
    "CCNet/Gopher-style 'how surprising is this document for this "
    "corpus' quality signal, without shipping an LM). Plan: one "
    "corpus scan -> per-doc token counts; token frequencies reduce "
    "from the same counts (map-side partials); the corpus total "
    "folds back as a 1-row broadcast; the frequency join is keyed on "
    "the token (AQE splits the stopword-skewed keys). Every doc's "
    "tokens exist in the corpus by construction, so the estimate "
    "needs no smoothing and the statistic is exact.",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        ),
        cnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
        cf AS (SELECT t, CAST(sum(c) AS BIGINT) AS cf FROM cnt GROUP BY t),
        tot AS (SELECT sum(cf) AS total FROM cf)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               round(-sum(c * log2(cf / total)) / sum(c), 6)
                   AS cross_entropy_bits
        FROM cnt JOIN cf USING (t), tot
        GROUP BY doc_id
    """,
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return perplexity_proxy(spread(load(spark, sf_dir, "documents")))


def perplexity_proxy(docs: DataFrame) -> DataFrame:
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    # per-doc counts first: the token-keyed join then moves one row
    # per (doc, distinct token), not one per occurrence
    cnt = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    cf = cnt.groupBy("t").agg(F.sum("c").alias("cf"))
    total = cf.agg(F.sum("cf").alias("total"))  # 1 row -> broadcast
    joined = cnt.join(cf, "t").crossJoin(F.broadcast(total))
    bits = F.col("c") * F.log2(F.col("cf") / F.col("total"))
    return joined.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.round(-F.sum(bits) / F.sum("c"), 6).alias("cross_entropy_bits"),
    )


@register(
    "text_dup_ngram_fraction",
    family="text",
    doc="Within-document duplicate 5-gram fraction — the Gopher "
    "repetition rule the top-token share (text_repetition_ratio) "
    "can't see: a document that loops a whole phrase has low "
    "top-token share but a high fraction of its 5-gram occurrences "
    "landing on repeated grams. Non-distinct shingles explode once; "
    "both the per-(doc, gram) count and the per-doc fold shuffle on "
    "the doc key. Documents shorter than the gram width drop out on "
    "both sides by construction.",
    oracle="""
        WITH grams AS (
            SELECT doc_id, g
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                 unnest(list_transform(
                     range(1, greatest(len(toks) - 3, 1)),
                     i -> array_to_string(list_slice(toks, i, i + 4), ' ')
                 )) AS u(g)
        ),
        cnt AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_grams,
               round(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) / sum(c), 6)
                   AS dup_gram_fraction
        FROM cnt
        GROUP BY doc_id
    """,
)
def text_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_ngram_fraction(spread(load(spark, sf_dir, "documents")))


def dup_ngram_fraction(docs: DataFrame) -> DataFrame:
    grams = docs.select(
        "doc_id",
        F.explode(shingles(F.col("text"), distinct=False)).alias("g"),
    )
    cnt = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    dup_occ = F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0)))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.round(dup_occ / F.sum("c"), 6).alias("dup_gram_fraction"),
    )


@register(
    "dedup_common_shingles",
    family="dedup",
    doc="Cross-document shared-shingle fraction: per document, the "
    "share of its distinct 5-gram shingles that occur in at least "
    "one OTHER document — the boilerplate detector that fires on "
    "template headers/footers pairwise Jaccard dilutes away. The "
    "per-shingle document count reduces on the near-unique shingle "
    "key (no pairwise join at all, unlike the D2/D11 candidate "
    "generators), then folds back per doc: two bounded shuffles, "
    "scale-independent of how many documents share a shingle.",
    oracle="""
        WITH sh AS (
            SELECT DISTINCT doc_id, s
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                 unnest(list_transform(
                     range(1, greatest(len(toks) - 3, 1)),
                     i -> array_to_string(list_slice(toks, i, i + 4), ' ')
                 )) AS u(s)
        ),
        df AS (SELECT s, count(*) AS n_docs FROM sh GROUP BY s)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_shared,
               round(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) / count(*), 6)
                   AS shared_fraction
        FROM sh JOIN df USING (s)
        GROUP BY doc_id
    """,
)
def dedup_common_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return common_shingle_fraction(spread(load(spark, sf_dir, "documents")))


def common_shingle_fraction(docs: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.operators.dedup import shingles

    # ONE linear chain (r11 rework, same shape as the composed
    # training-corpus ledger): distinct (doc, shingle) rows flow
    # through a shingle-partitioned count window (n_docs per shingle)
    # straight into the doc-grain reduce that emits the numerator and
    # denominator together. The old shape persisted the shingle table
    # and fanned it into three consumers (doc-count agg, semi join
    # back, per-doc size agg) — two joins and a cache the single-
    # consumer chain does not need; measured best-of-5 at sf0.1 the
    # fused window halves the branch. Same longs, same division, same
    # rounding -> identical rows.
    sh = spread(docs).select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("s")
    )
    nd = F.count(F.lit(1)).over(Window.partitionBy("s"))
    n_shared = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).cast("long")
    return (
        sh.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            n_shared.alias("n_shared"),
            F.round(n_shared / F.count(F.lit(1)), 6).alias("shared_fraction"),
        )
    )


@register(
    "media_jpeg_probe",
    family="multimodal",
    doc="Decoder-free JPEG frame geometry: unlike the fixed-offset "
    "PNG/WAV/GIF probes (media_header_probe), JPEG's SOF marker "
    "floats behind a variable-length APPn/COM segment chain, so the "
    "probe WALKS the chain — hopping marker-declared lengths until "
    "SOF0-SOF3, still pure whole-stage codegen with zero Python per "
    "row (the bounded walk runs UNROLLED since r12: the F.aggregate "
    "fold always interpreted, so the same step expression is applied "
    "as staged projections instead, pinned to the retained fold twin "
    "by a differential fuzz test). Synthesis "
    "varies the segment count and lengths per row and exposes only "
    "the bytes; the oracle re-derives geometry from the generating "
    "columns, so a walk bug cannot cancel out.",
    oracle="""
        SELECT event_id AS media_id,
               TRUE AS is_jpeg,
               event_id % 3 + 1 + CAST(event_id % 2 = 0 AS BIGINT)
                   AS n_header_segments,
               8 AS precision,
               event_id % 4000 + 8 AS height,
               user_id % 4000 + 8 AS width,
               3 AS n_components,
               user_id % 2 = 1 AS progressive,
               round((event_id % 4000 + 8) * (user_id % 4000 + 8) / 1e6, 6)
                   AS megapixels
        FROM events
    """,
)
def media_jpeg_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_jpeg_headers,
        synthesize_jpeg_headers,
    )

    return parse_jpeg_headers(synthesize_jpeg_headers(load(spark, sf_dir, "events")))


# oracle-side quality fragments: single source of truth in queries_llm
from timescaledb_event_streamer_spark.plans.queries_llm import (  # noqa: E402
    _SQL_PUNCT_RATIO,
    _SQL_STOP_RATIO,
)
_SQL_GRAMS = """
            SELECT doc_id, g
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                 unnest(list_transform(
                     range(1, greatest(len(toks) - 3, 1)),
                     i -> array_to_string(list_slice(toks, i, i + 4), ' ')
                 )) AS u(g)
"""


@register(
    "pipeline_training_corpus",
    family="text",
    doc="Training-corpus admission pipeline v2: the round-4 quality "
    "signals composed into one plan with a per-source drop LEDGER — "
    "language gate, composite quality score, repetition gate "
    "(within-doc duplicate 5-grams OR >=80% cross-doc shared "
    "shingles, the near-dup/template kill), and a corpus-surprise "
    "gate (unigram cross-entropy > 4.95 bits/token, ~top-3% of gate survivors). First failing gate "
    "claims the doc, so the ledger columns sum to the candidate "
    "count. Every per-doc signal reduces on doc/token/shingle keys "
    "before the doc-keyed assembly joins; the codegen feature scan "
    "runs once. The within-doc repetition branch never fires on the "
    "driver testdata (no looped docs are planted) — "
    "tests/test_llm2.py plants one and pins the gate.",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id, source,
                   CASE WHEN {_SQL_STOP_RATIO} >= 0.05
                        THEN 'en' ELSE 'other' END AS lang_pred,
                   floor((0.5 * {_SQL_STOP_RATIO}
                         + 0.4 * least(n_chars / 500.0, 1.0)
                         - 0.1 * {_SQL_PUNCT_RATIO}) * 1000000.0 + 0.5)
                       / 1000000.0 AS quality
            FROM documents
        ),
        gcnt AS (
            SELECT doc_id, g, count(*) AS c
            FROM ({_SQL_GRAMS}) GROUP BY 1, 2
        ),
        dng AS (
            SELECT doc_id,
                   round(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) / sum(c), 6)
                       AS dupf
            FROM gcnt GROUP BY doc_id
        ),
        sh AS (SELECT DISTINCT doc_id, g AS s FROM ({_SQL_GRAMS})),
        sdf AS (SELECT s, count(*) AS n_docs FROM sh GROUP BY s),
        csf AS (
            SELECT doc_id,
                   round(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)
                         / count(*), 6) AS sharedf
            FROM sh JOIN sdf USING (s) GROUP BY doc_id
        ),
        tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        ),
        tcnt AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
        cfreq AS (SELECT t, CAST(sum(c) AS BIGINT) AS cf FROM tcnt GROUP BY t),
        tot AS (SELECT sum(cf) AS total FROM cfreq),
        ppx AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                   round(-sum(c * log2(cf / total)) / sum(c), 6) AS ce
            FROM tcnt JOIN cfreq USING (t), tot GROUP BY doc_id
        ),
        led AS (
            SELECT f.source, p.n_tokens,
                   CASE WHEN f.lang_pred != 'en' THEN 'lang'
                        WHEN f.quality < 0.35 THEN 'quality'
                        WHEN coalesce(d.dupf, 0) > 0.2
                             OR coalesce(cs.sharedf, 0) >= 0.8 THEN 'repetition'
                        WHEN p.ce > 4.95 THEN 'surprise'
                        ELSE 'kept' END AS gate
            FROM feats f
            LEFT JOIN dng d USING (doc_id)
            LEFT JOIN csf cs USING (doc_id)
            JOIN ppx p USING (doc_id)
        )
        SELECT source,
               count(*) AS n_candidates,
               CAST(sum(CASE WHEN gate = 'lang' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_drop_lang,
               CAST(sum(CASE WHEN gate = 'quality' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_drop_quality,
               CAST(sum(CASE WHEN gate = 'repetition' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_drop_repetition,
               CAST(sum(CASE WHEN gate = 'surprise' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_drop_surprise,
               CAST(sum(CASE WHEN gate = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(sum(CASE WHEN gate = 'kept' THEN n_tokens ELSE 0 END)
                    AS BIGINT) AS kept_tokens
        FROM led
        GROUP BY source
    """,
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return training_corpus_ledger(spread(load(spark, sf_dir, "documents")))


def training_corpus_ledger(
    docs: DataFrame,
    *,
    quality_min: float = 0.35,
    rep_max: float = 0.2,
    shared_max: float = 0.8,
    surprise_bits: float = 4.95,
) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.textstats import (
        lang_pred,
        quality_score,
    )

    # NOTE: persisting the raw doc table does NOT pay here (measured
    # flat at sf0.1 — the shingle/token shuffles dominate), and at
    # 100 TB re-scanning parquet beats caching the whole corpus. The
    # repetition gate's two signals both need the 5-gram shingles;
    # they now come out of ONE linear chain (r11 rework): the
    # per-(doc, gram) count table flows through a gram-partitioned
    # count window (nd = how many docs carry the gram) straight into
    # the doc-grain reduce that emits the dup fraction, the distinct-
    # gram denominator AND the shared-gram numerator together. The
    # old shape persisted the count table and fanned it into three
    # consumers (doc reduce, gram doc-count agg, semi join back);
    # measured best-of-5 at sf0.1 the fused window halves the branch
    # (1.13s -> 0.52s) and the cache is pointless once the chain is
    # single-consumer, so the persist is gone too.
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.operators.dedup import shingles

    feats = docs.select(
        "doc_id",
        "source",
        lang_pred(F.col("text")).alias("lang_pred"),
        quality_score(F.col("text"), F.col("n_chars")).alias("quality"),
    )
    grams = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), distinct=False)).alias("g")
    )
    cnt = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    dup_occ = F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0)))
    # gram-partitioned (never unpartitioned) count window: nd is the
    # per-gram document count, read in the same pass that feeds the
    # doc-grain reduce — no second traversal, no join back
    nd = F.count(F.lit(1)).over(Window.partitionBy("g"))
    rep = (
        cnt.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.round(dup_occ / F.sum("c"), 6).alias("dup_gram_fraction"),
            F.count(F.lit(1)).alias("__n_grams"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("__n_shared"),
        )
    )
    ppx = perplexity_proxy(docs)

    j = feats.join(rep, "doc_id", "left").join(ppx, "doc_id")
    # shared_fraction from the fused reduce: NULL when the doc has no
    # grams (left-join miss, the gate coalesces it to 0 exactly as
    # before), 0.0 when it has grams but none shared
    shared_fraction = F.round(
        F.coalesce(F.col("__n_shared"), F.lit(0).cast("long"))
        / F.col("__n_grams"),
        6,
    )
    gate = (
        F.when(F.col("lang_pred") != "en", "lang")
        .when(F.col("quality") < quality_min, "quality")
        .when(
            (F.coalesce("dup_gram_fraction", F.lit(0.0)) > rep_max)
            | (F.coalesce(shared_fraction, F.lit(0.0)) >= shared_max),
            "repetition",
        )
        .when(F.col("cross_entropy_bits") > surprise_bits, "surprise")
        .otherwise("kept")
    )
    led = j.select("source", "n_tokens", gate.alias("gate"))

    def n_gate(g: str):
        return F.sum(F.when(F.col("gate") == g, 1).otherwise(0)).alias(f"n_drop_{g}")

    return led.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        n_gate("lang"),
        n_gate("quality"),
        n_gate("repetition"),
        n_gate("surprise"),
        F.sum(F.when(F.col("gate") == "kept", 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("gate") == "kept", F.col("n_tokens")).otherwise(F.lit(0)))
        .alias("kept_tokens"),
    )


@register(
    "ann_filtered_topk",
    family="ann",
    doc="Filtered similarity search (the vector-store 'metadata "
    "filter' shape): exact cosine top-10 vs the vec_id=0 query "
    "AMONG label=3 vectors only. The predicate applies BEFORE any "
    "vector math and reaches the parquet scan as a pushed filter "
    "(pytest-asserted), so at scale the scan prunes to the label's "
    "row groups / partitions first — filter-then-score, never "
    "score-then-filter.",
    oracle="""
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id = 0
        )
        SELECT vec_id,
               label,
               round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT qv FROM q)), 6) AS cosine
        FROM embeddings
        WHERE label = 3
        ORDER BY cosine DESC, vec_id
        LIMIT 10
    """,
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ann import brute_force_topk
    from timescaledb_event_streamer_spark.plans.queries_llm import _query_vec

    emb = load(spark, sf_dir, "embeddings").filter(F.col("label") == 3)
    return brute_force_topk(emb, _query_vec(spark, sf_dir), k=10)


@register(
    "pipeline_near_dedup",
    family="dedup",
    doc="End-to-end near-dup dedup pipeline: shingle-join candidate "
    "pairs (jaccard >= 0.3) -> connected components (min-label "
    "propagation; cluster_id IS the canonical keeper doc_id) -> keep "
    "one doc per cluster -> per-source retention ledger. The "
    "composition a production dedup actually ships: candidates, "
    "transitive closure, canonical selection, and the retention "
    "report in ONE plan. Shuffles stay on the shingle / doc / source "
    "keys; the oracle replays the whole pipeline via a recursive-CTE "
    "closure and aggregates by source.",
    oracle="""
        WITH RECURSIVE
    t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s0 AS (
        SELECT doc_id, unnest(range(len(toks) - 4)) AS i, toks
        FROM t WHERE len(toks) >= 5
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i + 1 : i + 5], ' ') AS s FROM s0
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT c.doc_a, c.doc_b,
               round(c.n_inter * 1.0 / (x.n + y.n - c.n_inter), 6) AS jaccard
        FROM cand c
        JOIN sz x ON c.doc_a = x.doc_id
        JOIN sz y ON c.doc_b = y.doc_id
    ),
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
        cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
        SELECT d.source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN cc.node IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_near_dup_docs,
               CAST(sum(CASE WHEN cc.node IS NOT NULL
                             AND cc.node != cc.cluster_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped,
               CAST(sum(CASE WHEN cc.node IS NULL OR cc.node = cc.cluster_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN cc.node IS NULL OR cc.node = cc.cluster_id
                             THEN d.n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
               round(sum(CASE WHEN cc.node IS NOT NULL
                              AND cc.node != cc.cluster_id THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6) AS drop_fraction
        FROM documents d
        LEFT JOIN cc ON d.doc_id = cc.node
        GROUP BY d.source
    """,
)
def pipeline_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.dedup import (
        dedup_clusters,
        shingle_pairs_jaccard,
    )

    docs = load(spark, sf_dir, "documents")
    eligible = docs.filter(F.size(F.split(F.col("text"), " ")) >= 5)
    pairs = shingle_pairs_jaccard(eligible).filter(F.col("jaccard") >= 0.3)
    cc = dedup_clusters(pairs).select("doc_id", "cluster_id")
    joined = docs.join(cc, "doc_id", "left")
    clustered = F.col("cluster_id").isNotNull()
    dropped = clustered & (F.col("doc_id") != F.col("cluster_id"))
    kept = ~dropped
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(clustered.cast("int")).alias("n_near_dup_docs"),
        F.sum(dropped.cast("int")).alias("n_dropped"),
        F.sum(kept.cast("int")).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(F.lit(0))).alias("kept_chars"),
        F.round(F.sum(dropped.cast("int")) / F.count(F.lit(1)), 6)
        .alias("drop_fraction"),
    )


@register(
    "dedup_cross_source_near",
    family="dedup",
    doc="Cross-source NEAR-duplication matrix: the who-copies-whom "
    "diagnostic (D9) upgraded from exact content hashes to jaccard "
    ">= 0.3 shingle similarity — the form that catches lightly-"
    "edited copies crossing source boundaries. Candidate pairs come "
    "from the same bounded shingle join as D2/D15; source attribution "
    "is two doc-keyed joins; the matrix reduce is metadata-sized "
    "(source-pair cardinality). Ordered (min, max) source pair so "
    "direction never depends on doc-id assignment.",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s0 AS (
        SELECT doc_id, unnest(range(len(toks) - 4)) AS i, toks
        FROM t WHERE len(toks) >= 5
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i + 1 : i + 5], ' ') AS s FROM s0
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT c.doc_a, c.doc_b,
               round(c.n_inter * 1.0 / (x.n + y.n - c.n_inter), 6) AS jaccard
        FROM cand c
        JOIN sz x ON c.doc_a = x.doc_id
        JOIN sz y ON c.doc_b = y.doc_id
    ),
    dup AS (
        SELECT s.doc_a, s.doc_b, s.jaccard, da.source AS sa, db.source AS sb
        FROM scored s
        JOIN documents da ON s.doc_a = da.doc_id
        JOIN documents db ON s.doc_b = db.doc_id
        WHERE s.jaccard >= 0.3
    )
    SELECT least(sa, sb) AS source_a,
           greatest(sa, sb) AS source_b,
           count(*) AS n_near_dup_pairs,
           round(avg(jaccard), 6) AS mean_jaccard
    FROM dup
    GROUP BY 1, 2
    """,
)
def dedup_cross_source_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.dedup import (
        shingle_pairs_jaccard,
    )

    docs = load(spark, sf_dir, "documents")
    eligible = docs.filter(F.size(F.split(F.col("text"), " ")) >= 5)
    pairs = shingle_pairs_jaccard(eligible).filter(F.col("jaccard") >= 0.3)
    src = docs.select("doc_id", "source")
    attributed = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
    )
    return (
        attributed.groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_near_dup_pairs"),
            F.round(F.avg("jaccard"), 6).alias("mean_jaccard"),
        )
    )


@register(
    "embedding_outlier_audit",
    family="ann",
    doc="Embedding-space outlier audit: per-vector L2 distance to the "
    "OWN label's centroid, flagged when beyond mean + 2 sigma of the "
    "label's distance distribution — the mislabeled/corrupted-vector "
    "QA gate that runs before any index build. Centroids reduce on "
    "(label, dim) with map-side partials (64-key-per-label shuffle), "
    "assemble into per-label arrays (metadata-sized, broadcast), and "
    "the distance pass is a zip_with fold — one more corpus scan, "
    "zero Python. All compared statistics are rounded to 6 decimals "
    "on BOTH engines before thresholding, so ulp-level summation "
    "differences cannot flip an outlier count.",
    oracle="""
        WITH u AS (
            SELECT label,
                   generate_subscripts(embedding, 1) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        c AS (SELECT label, pos, avg(v) AS m FROM u GROUP BY 1, 2),
        carr AS (SELECT label, list(m ORDER BY pos) AS cm FROM c GROUP BY label),
        d AS (
            SELECT e.label, e.vec_id,
                   round(sqrt(list_reduce(
                       list_transform(
                           range(1, len(e.embedding) + 1),
                           i -> (CAST(e.embedding[i] AS DOUBLE) - ca.cm[i])
                                * (CAST(e.embedding[i] AS DOUBLE) - ca.cm[i])),
                       (a, b) -> a + b)), 6) AS dist
            FROM embeddings e JOIN carr ca USING (label)
        ),
        st AS (
            SELECT label,
                   count(*) AS n_vecs,
                   round(avg(dist), 6) AS mean_dist,
                   round(max(dist), 6) AS max_dist,
                   round(avg(dist) + 2 * stddev_pop(dist), 6) AS cut
            FROM d GROUP BY label
        )
        SELECT st.label,
               CAST(st.n_vecs AS BIGINT) AS n_vecs,
               st.mean_dist,
               st.max_dist,
               CAST(sum(CASE WHEN d.dist > st.cut THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers
        FROM d JOIN st USING (label)
        GROUP BY st.label, st.n_vecs, st.mean_dist, st.max_dist
    """,
)
def embedding_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    u = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    c = u.groupBy("label", "pos").agg(F.avg(F.col("v").cast("double")).alias("m"))
    carr = c.groupBy("label").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
        .alias("cm")
    )
    d = emb.join(F.broadcast(carr), "label").select(
        "label",
        "vec_id",
        F.round(
            F.sqrt(
                F.expr(
                    "aggregate(zip_with(embedding, cm,"
                    " (x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)),"
                    " 0D, (a, b) -> a + b)"
                )
            ),
            6,
        ).alias("dist"),
    )
    st = d.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("dist"), 6).alias("mean_dist"),
        F.round(F.max("dist"), 6).alias("max_dist"),
        F.round(F.avg("dist") + 2 * F.stddev_pop("dist"), 6).alias("cut"),
    )
    return (
        d.join(F.broadcast(st), "label")
        .groupBy("label", "n_vecs", "mean_dist", "max_dist")
        .agg(
            F.sum(F.when(F.col("dist") > F.col("cut"), 1).otherwise(0))
            .alias("n_outliers")
        )
        .select("label", "n_vecs", "mean_dist", "max_dist", "n_outliers")
    )


@register(
    "ann_ivfpq_seeded",
    family="ann",
    doc="IVF-PQ with fully deterministic quantizers — the "
    "oracle-portable sibling of ann_ivfpq_topk (the E11/D12 'one fast "
    "engine-native form, one value-checkable form' pattern, applied "
    "to product quantization). Coarse cells = the E11 seed points; "
    "per-subspace codebooks = sub-slices of the unit-normalized "
    "corpus vectors at vec_id % 31 (16 codes x 8 subspaces); ADC "
    "table, PQ codes, probe list and both rankings are all "
    "re-derivable in SQL. Every float reduction is a sequential left "
    "fold on BOTH engines (the ASAP/B46 bit-exactness discipline), "
    "so even the encoding argmins agree bit-for-bit; ADC totals and "
    "cosines round to 6dp before every ordering. Candidates prune to "
    "~nprobe/|seeds| of the corpus and are scored by table lookup.",
    oracle="""
        WITH e AS (
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
            FROM eu WHERE vec_id % 31 = 0 AND vec_id < 496
        ),
        q AS (SELECT v AS qv, u AS qu FROM eu WHERE vec_id = 1),
        adc AS (
            SELECT list_transform(range(8), m ->
                       list_transform(range(16), j ->
                           list_reduce(list_transform(range(1, 9),
                               i -> q.qu[m * 8 + i] * cb.cbs[j + 1][m * 8 + i]),
                               (x, y) -> x + y))) AS adcl
            FROM q, cb
        ),
        seeds AS (
            SELECT vec_id AS seed_id, v AS sv FROM e
            WHERE vec_id % 25 = 0 AND vec_id < 2500
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
        asg AS (SELECT vec_id, v, u, seed_id FROM asg0 WHERE rn = 1),
        probes AS (
            SELECT seed_id FROM seeds CROSS JOIN q
            ORDER BY round(list_cosine_similarity(sv, qv), 6) DESC, seed_id
            LIMIT 8
        ),
        scoredc AS (
            SELECT a.vec_id, a.v,
                   round(list_reduce(list_transform(range(8), m ->
                       adc.adcl[m + 1][list_position(
                           list_transform(range(16), j ->
                               list_reduce(list_transform(range(1, 9),
                                   i -> (a.u[m * 8 + i]
                                         - cb.cbs[j + 1][m * 8 + i])
                                      * (a.u[m * 8 + i]
                                         - cb.cbs[j + 1][m * 8 + i])),
                                   (x, y) -> x + y)),
                           list_min(list_transform(range(16), j ->
                               list_reduce(list_transform(range(1, 9),
                                   i -> (a.u[m * 8 + i]
                                         - cb.cbs[j + 1][m * 8 + i])
                                      * (a.u[m * 8 + i]
                                         - cb.cbs[j + 1][m * 8 + i])),
                                   (x, y) -> x + y))))]),
                       (x, y) -> x + y), 6) AS approx_dot
            FROM asg a JOIN probes USING (seed_id), adc, cb
            WHERE a.vec_id <> 1
        ),
        ranked AS (
            SELECT vec_id, v, approx_dot FROM scoredc
            ORDER BY approx_dot DESC, vec_id LIMIT 100
        ),
        fin AS (
            SELECT vec_id, approx_dot,
                   round(list_cosine_similarity(v, q.qv), 6) AS cosine
            FROM ranked, q
        )
        SELECT vec_id, approx_dot, cosine,
               CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT)
                   AS rnk
        FROM fin ORDER BY rnk LIMIT 10
    """,
)
def ann_ivfpq_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ann import ivfpq_seeded_topk

    return ivfpq_seeded_topk(load(spark, sf_dir, "embeddings"))
