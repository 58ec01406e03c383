"""LLM-pipeline corpus QA, part 4 (SURVEY.md §2 F24-F26, D20):
lexical relevance and corpus-drift statistics — per-document TF-IDF
keyword extraction, BM25 retrieval scoring, pairwise Jensen-Shannon
divergence between per-source token distributions (the standard
domain-shift monitor for corpus mixing), and TF-IDF-weighted sparse
cosine near-dup pairs through an inverted-index join.

Same discipline as the earlier queries_llm files: every plan is
doc/token-keyed DataFrame work in whole-stage codegen — no Python per
row — and every operator carries a DuckDB oracle that re-derives the
result value-exactly (float chains are either fixed-order expressions
or sorted sequential folds, the repo's established exactness pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.operators.ranking import global_row_number
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load, spread

#: BM25 free parameters (Robertson et al., the universal defaults).
_BM25_K1 = 1.2
_BM25_B = 0.75

#: Fixed retrieval query for the registered BM25 entry: terms drawn
#: from the synthetic corpus vocabulary so every scale factor has
#: matches. A real deployment parameterizes this list; the operator
#: shape (per-term tf columns, one 1-row stats broadcast) is the same
#: for any bounded query length.
_BM25_TERMS = ("join", "hash", "scan", "vector", "spark")


@register(
    "text_tfidf_topk",
    family="text",
    doc="Per-document top-3 TF-IDF terms (smooth idf, the sklearn "
    "formulation: ln((1+N)/(1+df)) + 1) — the classic keyword-"
    "extraction / relevance primitive. tf is a (doc, token)-keyed "
    "count, df a token-keyed distinct-doc count joined back on the "
    "token key (vocabulary-grain, so the join shuffles dictionary-"
    "sized rows, never corpus-sized), N a 1-row broadcast. Ranking "
    "uses the 6-dp-rounded score with a token tie-break so both "
    "engines pick identical winners. Scales: every shuffle is keyed "
    "on doc_id or token; nothing is collected.",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        ),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   round(tf.tf * (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0),
                         6) AS tfidf
            FROM tf JOIN df USING (term), n
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
            FROM scored
        )
        SELECT doc_id, rk, term, tf, df, tfidf
        FROM ranked WHERE rk <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_topk(spread(load(spark, sf_dir, "documents")))


def tfidf_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf is already unique at (doc_id, term) grain, so a plain count
    # IS the distinct-doc count — skips the two-phase distinct agg
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("tfidf").desc(), F.col("term").asc()
        )
    )
    return (
        scored.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "rk", "term", "tf", "df", "tfidf")
    )


def _bm25_tf(term: str):
    """tf of one query term, computed scan-side: filter the token
    array instead of exploding — zero shuffle for the tf stage."""
    return F.size(F.filter(F.split("text", " "), lambda x: x == F.lit(term)))


@register(
    "text_bm25_search",
    family="text",
    doc="BM25 retrieval scoring (Robertson/Okapi, k1=1.2 b=0.75) of "
    "every document against a fixed 5-term query; top-20 by score. "
    "Per-term tf is computed scan-side with an array filter (no "
    "explode, no shuffle), so the whole tf stage is one codegen "
    "projection over the corpus; N / avgdl / per-term df reduce to "
    "ONE 1-row stats row broadcast back. The score is a fixed-order "
    "5-term expression sum (no float-sum reordering), so both "
    "engines produce bit-identical doubles. Scales: two corpus "
    "scans (tf projection, stats reduce) + a global top-20.",
    oracle=f"""
        WITH tfdoc AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS dl,
                   {", ".join(
                       "len(list_filter(string_split(text, ' '), "
                       f"x -> x = '{t}')) AS tf_{t}"
                       for t in _BM25_TERMS
                   )}
            FROM documents
        ),
        stats AS (
            SELECT count(*) AS n_docs,
                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
                   {", ".join(
                       f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
                       for t in _BM25_TERMS
                   )}
            FROM tfdoc
        ),
        scored AS (
            SELECT d.doc_id,
                   CAST({" + ".join(
                       f"(CASE WHEN d.tf_{t} > 0 THEN 1 ELSE 0 END)"
                       for t in _BM25_TERMS
                   )} AS BIGINT) AS n_terms_matched,
                   round({" + ".join(
                       f"(CASE WHEN d.tf_{t} > 0 THEN "
                       f"ln(1.0 + (s.n_docs - s.df_{t} + 0.5) / (s.df_{t} + 0.5))"
                       f" * (d.tf_{t} * ({_BM25_K1} + 1.0))"
                       f" / (d.tf_{t} + {_BM25_K1} * (1.0 - {_BM25_B}"
                       f" + {_BM25_B} * d.dl / s.avgdl)) ELSE 0.0 END)"
                       for t in _BM25_TERMS
                   )}, 6) AS bm25
            FROM tfdoc d, stats s
        )
        SELECT doc_id, n_terms_matched, bm25
        FROM scored
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT 20
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_search(spread(load(spark, sf_dir, "documents")))


def bm25_search(
    docs: DataFrame, terms: tuple[str, ...] = _BM25_TERMS, top_n: int = 20
) -> DataFrame:
    tfdoc = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        *[_bm25_tf(t).alias(f"tf_{t}") for t in terms],
    )
    stats = tfdoc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in terms
        ],
    )
    k1, b = _BM25_K1, _BM25_B

    def term_score(t: str):
        idf = F.log(
            1.0 + (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
        )
        tf = F.col(f"tf_{t}")
        return F.when(
            tf > 0,
            idf
            * (tf * (k1 + 1.0))
            / (tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        ).otherwise(F.lit(0.0))

    score = term_score(terms[0])
    for t in terms[1:]:
        score = score + term_score(t)
    matched = F.when(F.col(f"tf_{terms[0]}") > 0, 1).otherwise(0)
    for t in terms[1:]:
        matched = matched + F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)
    return (
        tfdoc.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            matched.cast("long").alias("n_terms_matched"),
            F.round(score, 6).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(top_n)
    )


@register(
    "corpus_js_divergence",
    family="text",
    doc="Pairwise Jensen-Shannon divergence (bits) between per-source "
    "unigram token distributions — the standard drift/contrast "
    "monitor when mixing corpus sources for training. Distributions "
    "are (source, token)-keyed integer counts (exact, order-free); "
    "the per-pair union of tokens comes from two equi-joins of the "
    "metadata-sized pair list against the distribution table (no "
    "non-equi data join), and the final JSD sum is a token-sorted "
    "sequential fold so both engines add in the identical IEEE "
    "order. Scales: the distribution table is |sources| x |vocab| "
    "(dictionary-grain); per-pair state is vocab-bounded — at very "
    "large vocabularies swap the fold for an associative sum and a "
    "tolerance check, or restrict to the top-V global tokens.",
    oracle="""
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS t
            FROM documents
        ),
        cnt AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
        tot AS (SELECT source, sum(c) AS n FROM cnt GROUP BY 1),
        dist AS (
            SELECT cnt.source, cnt.t, CAST(cnt.c AS DOUBLE) / tot.n AS p
            FROM cnt JOIN tot USING (source)
        ),
        srcs AS (SELECT DISTINCT source FROM dist),
        pairs AS (
            SELECT a.source AS sa, b.source AS sb
            FROM srcs a JOIN srcs b ON a.source < b.source
        ),
        sides AS (
            SELECT p.sa, p.sb, d.t, d.p AS pv, NULL::DOUBLE AS qv
            FROM pairs p JOIN dist d ON d.source = p.sa
            UNION ALL
            SELECT p.sa, p.sb, d.t, NULL::DOUBLE AS pv, d.p AS qv
            FROM pairs p JOIN dist d ON d.source = p.sb
        ),
        merged AS (
            SELECT sa, sb, t,
                   coalesce(max(pv), 0.0) AS p,
                   coalesce(max(qv), 0.0) AS q
            FROM sides GROUP BY 1, 2, 3
        ),
        contrib AS (
            SELECT sa, sb, t, p, q,
                   -(((p + q) / 2.0) * log2((p + q) / 2.0))
                   + (CASE WHEN p > 0 THEN 0.5 * p * log2(p) ELSE 0.0 END)
                   + (CASE WHEN q > 0 THEN 0.5 * q * log2(q) ELSE 0.0 END)
                       AS jc
            FROM merged
        )
        SELECT sa AS source_a, sb AS source_b,
               count(*) AS n_union_tokens,
               CAST(sum(CASE WHEN p > 0 AND q > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_shared_tokens,
               round(list_reduce(
                   list_prepend(0.0, list(jc ORDER BY t)),
                   (a, v) -> a + v), 6) AS jsd_bits
        FROM contrib
        GROUP BY 1, 2
    """,
)
def corpus_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return js_divergence(spread(load(spark, sf_dir, "documents")))


def js_divergence(docs: DataFrame) -> DataFrame:
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("t"))
    cnt = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    return js_divergence_from_counts(cnt)


def js_divergence_from_counts(cnt: DataFrame) -> DataFrame:
    """JSD matrix from a (source, t, c) token-count table.

    Split out so a LIVE drift monitor can maintain the counts as a
    streaming (complete-mode) aggregation — token counting is
    associative — and run this read on each trigger
    (tests/test_llm4.py streaming parity)."""
    # rename the grouping key: when cnt arrives as a sink view (the
    # streaming path) both join sides would otherwise carry the SAME
    # attribute id for "source" and the totals join fails to resolve
    tot = (
        cnt.groupBy("source")
        .agg(F.sum("c").alias("n"))
        .withColumnRenamed("source", "src_tot")
    )
    # eager localCheckpoint (the CC-convergence precedent): srcs,
    # side_a and side_b all read this dictionary-sized
    # (|sources| x |vocab|) table, and without a materialization
    # boundary each consumer re-scans and re-tokenizes the whole
    # corpus (audited at 4 corpus scans). Checkpoint beats persist
    # here: consumers reference a plan-stub LogicalRDD instead of
    # paying CacheManager plan-canonicalization on every fresh build
    # (measured ~0.9s vs ~1.35s per run at sf0.01).
    dist = (
        cnt.join(tot, F.col("source") == F.col("src_tot"))
        .select(
            "source", "t", (F.col("c").cast("double") / F.col("n")).alias("p")
        )
        .localCheckpoint(eager=True)
    )
    srcs = dist.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(F.broadcast(srcs.alias("b")), F.col("a.source") < F.col("b.source"))
        .select(F.col("a.source").alias("sa"), F.col("b.source").alias("sb"))
    )
    d = dist
    side_a = F.broadcast(pairs).join(d, F.col("source") == F.col("sa")).select(
        "sa", "sb", "t", F.col("p").alias("pv"), F.lit(None).cast("double").alias("qv")
    )
    side_b = F.broadcast(pairs).join(d, F.col("source") == F.col("sb")).select(
        "sa", "sb", "t", F.lit(None).cast("double").alias("pv"), F.col("p").alias("qv")
    )
    merged = (
        side_a.unionByName(side_b)
        .groupBy("sa", "sb", "t")
        .agg(
            F.coalesce(F.max("pv"), F.lit(0.0)).alias("p"),
            F.coalesce(F.max("qv"), F.lit(0.0)).alias("q"),
        )
    )
    p, q = F.col("p"), F.col("q")
    jc = (
        -(((p + q) / 2.0) * F.log2((p + q) / 2.0))
        + F.when(p > 0, 0.5 * p * F.log2(p)).otherwise(0.0)
        + F.when(q > 0, 0.5 * q * F.log2(q)).otherwise(0.0)
    )
    contrib = merged.select("sa", "sb", "t", "p", "q", jc.alias("jc"))
    return contrib.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).alias("n_union_tokens"),
        F.sum(F.when((p > 0) & (q > 0), 1).otherwise(0)).alias("n_shared_tokens"),
        F.round(
            # .jc on the sorted struct array is a NATIVE
            # GetArrayStructFields — one interpreted lambda per
            # element fewer than the transform() form, same order,
            # same doubles (r11)
            F.expr(
                "aggregate(array_sort(collect_list(struct(t, jc))).jc,"
                " 0D, (a, v) -> a + v)"
            ),
            6,
        ).alias("jsd_bits"),
    ).select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        "n_union_tokens",
        "n_shared_tokens",
        "jsd_bits",
    )


@register(
    "dedup_sparse_cosine",
    family="dedup",
    doc="Lexical near-dup pairs via TF-IDF-weighted SPARSE cosine "
    "(>= 0.9) computed through an inverted-index join — the "
    "scalable sparse-similarity technique: weights explode to "
    "(doc, term, w) rows, the self-join is keyed on TERM (candidate "
    "pairs only where vocabulary actually overlaps, never dense "
    "all-pairs), and per-pair dots/norms are token-sorted sequential "
    "folds so both engines produce bit-identical doubles. The "
    "quadratic blowup risk is per-term df (stopword-grade terms): "
    "sparse_cosine_pairs takes a max_df cap that drops those terms "
    "from candidate generation — they carry the least idf weight — "
    "pytest-planted. The synthetic 31-token vocabulary makes EVERY "
    "term stopword-grade (any useful cap empties the output), so "
    "the registered entry runs the exact form on a deterministic "
    "~500-doc calibration sample (every m-th doc_id, the D19 "
    "pattern): constant cost at any corpus scale — the open-cap "
    "form measured 400s/83x on the 10x step before this bound. At "
    "oracle SF the sample is the whole corpus, so the result equals "
    "the unsampled form exactly.",
    oracle="""
        WITH m AS (
            SELECT greatest(CAST(count(*) / 500 AS BIGINT), 1) AS m
            FROM documents
        ),
        sample AS (
            SELECT doc_id, text FROM documents, m WHERE doc_id % m.m = 0
        ),
        tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM sample
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM sample),
        w AS (
            SELECT tf.doc_id, tf.term,
                   tf.tf * (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0) AS w
            FROM tf JOIN df USING (term), n
        ),
        nrm AS (
            SELECT doc_id,
                   sqrt(list_reduce(
                       list_prepend(0.0, list(w * w ORDER BY term)),
                       (a, v) -> a + v)) AS nr
            FROM w GROUP BY doc_id
        ),
        dots AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS n_shared_terms,
                   list_reduce(
                       list_prepend(0.0, list(a.w * b.w ORDER BY a.term)),
                       (x, v) -> x + v) AS dot
            FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT doc_a, doc_b, n_shared_terms,
                   round(dot / (x.nr * y.nr), 6) AS cosine
            FROM dots
            JOIN nrm x ON doc_a = x.doc_id
            JOIN nrm y ON doc_b = y.doc_id
        )
        SELECT doc_a, doc_b, n_shared_terms, cosine
        FROM scored WHERE cosine >= 0.9
    """,
)
def dedup_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    m = docs.agg(
        F.greatest(F.floor(F.count(F.lit(1)) / 500), F.lit(1))
        .cast("long")
        .alias("m")
    )
    sample = (
        docs.crossJoin(F.broadcast(m))
        .filter(F.col("doc_id") % F.col("m") == 0)
        .select("doc_id", "text")
    )
    # short-vector regime (bounded sample, <=31-term unigram
    # vectors): the in-row dot fold wins — see _sparse_cosine_inrow
    return sparse_cosine_pairs(sample, inrow_dots=True)


@register(
    "dedup_sparse_cosine_capped",
    family="dedup",
    doc="The SCALE form of dedup_sparse_cosine (D21): TF-IDF sparse "
    "cosine >= 0.9 over word-3-gram shingle TERMS with the max_df "
    "cap live in the certified plan — UNSAMPLED over the whole "
    "documents table. Shingling fixes what kept the cap un-"
    "certifiable on D20: the synthetic 31-token unigram vocabulary "
    "makes every term stopword-grade, but its ~16k 3-gram vocabulary "
    "is Zipf-shaped, so the relative cap df <= max(ceil(N/100), 2) "
    "genuinely binds at certification SF (drops the 29 most common "
    "shingles of 16245 at sf0.01) while near-dup pairs survive. "
    "Integer-only cap arithmetic (no double ceil ties), and the "
    "per-term inverted-index join group is bounded by the cap — the "
    "property that keeps candidate generation from going quadratic "
    "on stopword-grade terms at 100 TB. Common-shingle df caps are "
    "the standard guard in shingle-based near-dup pipelines "
    "(SimHash/MinHash literature drops top-df shingles for the same "
    "reason).",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        s0 AS (
            SELECT doc_id, unnest(range(len(toks) - 2)) AS i, toks
            FROM t WHERE len(toks) >= 3
        ),
        tok AS (
            SELECT doc_id,
                   concat_ws('_', toks[i + 1], toks[i + 2], toks[i + 3]) AS term
            FROM s0
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (
            SELECT count(*) AS n_docs FROM t WHERE len(toks) >= 3
        ),
        w AS (
            SELECT tf.doc_id, tf.term,
                   tf.tf * (ln((1.0 + n.n_docs) / (1.0 + dfx.df)) + 1.0) AS w
            FROM tf JOIN dfx USING (term), n
            WHERE dfx.df <= greatest((n.n_docs + 99) // 100, 2)
        ),
        nrm AS (
            SELECT doc_id,
                   sqrt(list_reduce(
                       list_prepend(0.0, list(w * w ORDER BY term)),
                       (a, v) -> a + v)) AS nr
            FROM w GROUP BY doc_id
        ),
        dots AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS n_shared_terms,
                   list_reduce(
                       list_prepend(0.0, list(a.w * b.w ORDER BY a.term)),
                       (x, v) -> x + v) AS dot
            FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT doc_a, doc_b, n_shared_terms,
                   round(dot / (x.nr * y.nr), 6) AS cosine
            FROM dots
            JOIN nrm x ON doc_a = x.doc_id
            JOIN nrm y ON doc_b = y.doc_id
        )
        SELECT doc_a, doc_b, n_shared_terms, cosine
        FROM scored WHERE cosine >= 0.9
    """,
)
def dedup_sparse_cosine_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    shingled = (
        docs.withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.expr(
                "array_join(transform(sequence(0, size(toks) - 3),"
                " i -> concat_ws('_', toks[i], toks[i + 1], toks[i + 2])), ' ')"
            ).alias("text"),
        )
    )
    return sparse_cosine_pairs(shingled, threshold=0.9, max_df_denom=100)


def _tfidf_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, term, w) with w = tf * smooth-idf (unrounded)."""
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "df",
            "n_docs",
            (
                F.col("tf")
                * (F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0)
            ).alias("w"),
        )
    )


#: posting-list length up to which candidate pairs generate in-row
#: (per-row memory <= _INROW_DF structs, ~100 KB); longer lists fall
#: back to the distributed self-join
_INROW_DF = 4096


def sparse_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    max_df: int | None = None,
    max_df_denom: int | None = None,
    inrow_dots: bool = False,
) -> DataFrame:
    w = _tfidf_weights(docs)
    if max_df is not None:
        # the 100 TB knob: stopword-grade terms dominate the per-term
        # quadratic candidate cost while carrying the least idf
        # weight — cap df to keep every per-term join group bounded
        w = w.filter(F.col("df") <= max_df)
    if max_df_denom is not None:
        # relative form of the cap, resolved in-plan against the
        # already-broadcast corpus size: df <= max(ceil(N/denom), 2),
        # pure integer arithmetic so Spark and the SQL oracle agree
        # exactly at any N (no double ceil ties)
        w = w.filter(
            F.col("df")
            <= F.greatest(
                F.expr(f"(n_docs + {max_df_denom - 1}) div {max_df_denom}"),
                F.lit(2).cast("long"),
            )
        )
    w = w.drop("n_docs")
    # integer-keyed inverted index (r11): replace the term STRING in
    # every (doc, term) posting and every candidate-pair row with its
    # lexicographic rank — an order-preserving long. Every downstream
    # sorted fold orders by term only to fix float summation order,
    # and rank order == string order, so the folded doubles are
    # bit-identical; what changes is the physical cost: the pair
    # shuffle carries 8-byte longs instead of ~30-byte shingle
    # strings and the per-group array_sort compares longs. The rank
    # itself is the two-pass range-partitioned shape (vocab-grain,
    # never a single-partition window).
    vocab = global_row_number(
        w.select("term").distinct(),
        [F.col("term").asc()],
        col_name="term_id",
    )
    w = w.join(vocab, "term").select("doc_id", "term_id", "df", "w")
    # eager checkpoint = the materialized inverted index: norms and
    # both join sides read it, and without the boundary the whole
    # tokenize/tf/df/N pipeline (with its 1-row broadcasts) executes
    # three times (audited at 31 exchanges / 16 nested-loop joins).
    # Size is (doc, term_id) rows AFTER the df cap / sampling — the
    # bounded artifact an inverted index is supposed to be. df rides
    # along: it IS the posting-list length, so the small/big routing
    # below happens BEFORE any collect_list.
    w = w.localCheckpoint(eager=True)
    if inrow_dots:
        return _sparse_cosine_inrow(w, threshold)
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(
            # native .w extraction + squaring inside the fold lambda:
            # a + (v * v) is the same multiply-then-add per step as
            # the transform-to-squares form, one interpreted lambda
            # per element fewer (r11)
            F.expr(
                "aggregate(array_sort(collect_list(struct(term_id, w))).w,"
                " 0D, (a, v) -> a + v * v)"
            )
        ).alias("nr")
    )
    # candidate products, hybrid by posting-list length (r7, measured
    # 15% off the bench): terms whose posting list fits a row group
    # generate pairs IN-ROW — ONE term-keyed shuffle, then posexplode
    # anchors each doc against the tail of the sorted list, so
    # per-row memory is <= df structs (never df^2) and a term's pair
    # work spreads across its df rows, the same grain the self-join
    # had. Terms past _INROW_DF (degenerate stopword-grade lists that
    # survive only absurd caps) keep the distributed self-join. The
    # routing decision uses the df COLUMN (df == posting-list length
    # by construction: tf is doc x term grain), so it happens as a
    # codegen filter BEFORE any collect_list — a stopword-grade term
    # must never materialize its full posting list in one aggregation
    # task just to be told it is too big (r7 advice).
    gs = (
        w.filter(F.col("df") <= _INROW_DF)
        .groupBy("term_id")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "w"))).alias("ds"))
    )
    sm = (
        gs.select("term_id", "ds", F.posexplode("ds").alias("i", "x"))
        .select(
            "term_id",
            F.explode(
                F.expr(
                    "transform(slice(ds, i + 2, size(ds) - i - 1),"
                    " y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b,"
                    " x.w * y.w AS prod))"
                )
            ).alias("p"),
        )
        .select("term_id", "p.doc_a", "p.doc_b", "p.prod")
    )
    big = w.filter(F.col("df") > _INROW_DF).select("doc_id", "term_id", "w")
    a = big.alias("a")
    b = big.alias("b")
    bg = a.join(
        b,
        (F.col("a.term_id") == F.col("b.term_id"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.term_id").alias("term_id"),
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        (F.col("a.w") * F.col("b.w")).alias("prod"),
    )
    # hybrid dot fold, routed by shared-term count (r11). At sf0.1
    # 99.1% of candidate pairs share <= 2 terms (1.02M singletons +
    # 102k two-term groups of 1.13M pairs), and IEEE addition is
    # COMMUTATIVE (only associativity fails): a fold of one product
    # is that product, a fold of two is their unique binary sum in
    # either order, so a plain codegen F.sum — partial aggregation
    # and all — is bit-identical to the ordered fold for those
    # groups (pinned by the shuffle-vs-inrow parity pytest and the
    # oracle gates). Only the ~1% heavy tail (n >= 3, where
    # association order matters) needs term-ordered products; those
    # fold IN-ROW from the per-doc sorted vectors — the same walk
    # _sparse_cosine_inrow already proved bit-identical — attached
    # by a conditional equi-join that AQE broadcasts locally and
    # shuffles at scale. This retires the ObjectHashAggregate
    # collect+sort over every pair: best-of-6 interleaved at sf0.1
    # the full plan drops 1.83 -> 1.50s.
    pstat = (
        sm.unionByName(bg)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_terms"), F.sum("prod").alias("s"))
    )
    arrs = w.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("term_id", "w"))).alias("arr")
    )
    pa = arrs.select(F.col("doc_id").alias("pa_id"), F.col("arr").alias("arr_a"))
    pb = arrs.select(
        F.col("doc_id").alias("pb_id"), F.map_from_entries("arr").alias("mb")
    )
    tail = F.col("n_shared_terms") >= 3
    j = (
        pstat.join(pa, (F.col("doc_a") == F.col("pa_id")) & tail, "left")
        .drop("pa_id")
        .join(pb, (F.col("doc_b") == F.col("pb_id")) & tail, "left")
        .drop("pb_id")
    )
    # tail walk: multiply first (a missing term's element_at is NULL
    # and null-propagates through *), then drop nulls — products of
    # shared terms ascend in term rank, the ordered-fold contract
    dot = F.when(~tail, F.col("s")).otherwise(
        F.expr(
            "aggregate(filter(transform(arr_a,"
            " x -> x.w * element_at(mb, x.term_id)),"
            " v -> v IS NOT NULL), 0D, (a, v) -> a + v)"
        )
    )
    dots = j.select("doc_a", "doc_b", "n_shared_terms", dot.alias("dot"))
    nx = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nr").alias("na"))
    ny = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nr").alias("nb"))
    return (
        dots.join(nx, "doc_a")
        .join(ny, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared_terms",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _sparse_cosine_inrow(w: DataFrame, threshold: float) -> DataFrame:
    """Short-vector regime of the dot stage (r11): per-pair dots fold
    IN-ROW from per-doc sorted sparse vectors instead of shuffling a
    (doc_a, doc_b, term_id, prod) row per shared term and collecting
    it per pair.

    The candidate shuffle carries only (doc_a, doc_b) longs, the pair
    grain is a plain HashAggregate (distinct) instead of an
    ObjectHashAggregate over per-pair arrays, and ONE doc-grain
    aggregation yields both the norm and the vector. The fold walks
    doc_a's array in term_id order and multiplies where doc_b's map
    has the term — the same product sequence in the same (term-rank)
    order as the sorted fold it replaces, so the doubles are
    bit-identical (A/B-verified row-for-row at sf0.1 on top of the
    oracle gates).

    Regime choice, measured at sf0.1: the sampled unigram form
    (D20: 500 docs, <=31-term vectors, dense overlap) runs 2.1 ->
    1.7s here because the joined vectors are tiny and the object
    aggregation dominated; the shingled capped form (D21: ~98-term
    vectors, sparse overlap) runs 1.4 -> 10s+ because every candidate
    pair drags both full vectors through the join — the per-shared-
    term product shuffle moves strictly fewer bytes there. Callers
    pick via inrow_dots; the default stays the shuffle fold, which is
    also the 100 TB posture for long-document corpora."""
    arrs = w.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("term_id", "w"))).alias("arr")
    ).withColumn(
        "nr",
        F.sqrt(F.expr("aggregate(arr.w, 0D, (a, v) -> a + v * v)")),
    ).localCheckpoint(eager=True)
    gs = (
        w.filter(F.col("df") <= _INROW_DF)
        .groupBy("term_id")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
    )
    sm = (
        gs.select("ds", F.posexplode("ds").alias("i", "da"))
        .select(
            F.col("da").alias("doc_a"),
            F.explode(
                F.expr("slice(ds, i + 2, size(ds) - i - 1)")
            ).alias("doc_b"),
        )
    )
    big = w.filter(F.col("df") > _INROW_DF).select("doc_id", "term_id")
    a = big.alias("a")
    b = big.alias("b")
    bg = a.join(
        b,
        (F.col("a.term_id") == F.col("b.term_id"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
    )
    pairs = sm.unionByName(bg).distinct()
    pa = arrs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("arr").alias("arr_a"),
        F.col("nr").alias("na"),
    )
    pb = arrs.select(
        F.col("doc_id").alias("doc_b"),
        F.map_from_entries("arr").alias("mb"),
        F.col("nr").alias("nb"),
    )
    # per-pair walk: multiply FIRST (a missing term's element_at is
    # NULL and null-propagates through *), then drop nulls — ONE map
    # probe per element instead of probe-in-filter + probe-in-
    # transform. Products of shared terms are strictly positive, so
    # no genuine product is ever null. Predicate pushdown inlines
    # this walk into the join condition as well as the output
    # projection (2 evaluations/pair); an aggregation barrier was
    # tried and measured WORSE (first() over an array buffer falls
    # back to SortAggregate, which sorts the fat joined rows).
    return (
        pairs.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn(
            "prods",
            F.expr(
                "filter(transform(arr_a,"
                " x -> x.w * element_at(mb, x.term_id)),"
                " v -> v IS NOT NULL)"
            ),
        )
        .select(
            "doc_a",
            "doc_b",
            F.size("prods").cast("long").alias("n_shared_terms"),
            F.round(
                F.expr("aggregate(prods, 0D, (a, v) -> a + v)")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _recall_oracle() -> str:
    """Composes the brute-force and LSH-probe oracles: exact top-20
    ranked by (rounded cosine, vec_id), approx top-20 re-derived from
    the constant planes with the hamming<=3 multi-probe — then one
    summary row of recall@20. Every input to the aggregate is an
    independent DuckDB recomputation, not an echo of the Spark path."""
    from timescaledb_event_streamer_spark.operators.ann import _planes
    from timescaledb_event_streamer_spark.plans.queries_llm import _sql_plane_list

    planes = _planes(7, 8, 64)

    def bucket_sql(vec_expr: str) -> str:
        return " + ".join(
            f"CASE WHEN list_dot_product({vec_expr}, {_sql_plane_list(planes[j])}) > 0 "
            f"THEN {1 << j} ELSE 0 END"
            for j in range(8)
        )

    return f"""
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
        ),
        exact AS (
            SELECT vec_id,
                   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                                (SELECT qv FROM q)), 6) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id
            LIMIT 20
        ),
        exact_ranked AS (
            SELECT vec_id,
                   row_number() OVER (ORDER BY cosine DESC, vec_id) AS exact_rank
            FROM exact
        ),
        qb AS (SELECT {bucket_sql("qv")} AS qbucket FROM q),
        sig AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   {bucket_sql("CAST(embedding AS DOUBLE[])")} AS bucket
            FROM embeddings
        ),
        approx AS (
            SELECT vec_id
            FROM sig, qb
            WHERE bit_count(xor(bucket, qbucket)) <= 3
            ORDER BY round(list_cosine_similarity(v, (SELECT qv FROM q)), 6) DESC,
                     vec_id
            LIMIT 20
        ),
        hits AS (
            SELECT e.vec_id, e.exact_rank
            FROM exact_ranked e JOIN approx a ON e.vec_id = a.vec_id
        )
        SELECT CAST(20 AS BIGINT) AS k,
               count(*) AS n_hits,
               round(count(*) / 20.0, 6) AS recall,
               CAST(max(exact_rank) AS BIGINT) AS max_exact_rank_hit
        FROM hits
    """


@register(
    "ann_recall_eval",
    family="ann",
    doc="Recall@20 eval harness for the LSH-indexed ANN path: joins "
    "the partition-pruned multi-probe top-20 (ann_lsh_topk) against "
    "the brute-force top-20 (ann_bruteforce_topk) and emits ONE "
    "summary row — k, hits, recall, and the deepest exact rank the "
    "index still retrieved. This is the operator a user runs after "
    "re-tuning index geometry (bands/bits/probe radius) to decide "
    "whether the approximate path is still serving faithfully. Both "
    "inputs are existing certified plans (index probe + single-scan "
    "top-k); the eval adds a 20-row join and a 1-row aggregate, so "
    "its cost IS the two inputs' cost at any scale.",
    oracle=_recall_oracle(),
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ann import brute_force_topk
    from timescaledb_event_streamer_spark.plans.queries_llm import (
        _lsh_index,
        _query_vec,
    )
    from timescaledb_event_streamer_spark.operators.ann import lsh_topk_indexed

    emb = load(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    exact = brute_force_topk(emb, qv, k=20)
    exact_ranked = exact.select(
        "vec_id",
        F.row_number()
        .over(
            Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
            # 20-row input: the unpartitioned window ranks metadata,
            # not the corpus (same pattern as the matryoshka audits)
        )
        .cast("long")
        .alias("exact_rank"),
    )
    approx = lsh_topk_indexed(spark, _lsh_index(spark, sf_dir), qv, k=20).select(
        "vec_id"
    )
    hits = exact_ranked.join(approx, "vec_id")
    return hits.agg(
        F.lit(20).cast("long").alias("k"),
        F.count(F.lit(1)).alias("n_hits"),
        F.round(F.count(F.lit(1)) / 20.0, 6).alias("recall"),
        F.max("exact_rank").alias("max_exact_rank_hit"),
    )
