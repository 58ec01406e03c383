"""Training-data-pipeline queries (SURVEY.md §2.D/E/F): dedup,
similarity search, text analysis over `documents` / `embeddings`.

Oracle parity notes: every Spark-side rounded intermediate is
rounded identically in the DuckDB SQL; cosine math is forced to
double on both sides; jaccard division is explicit float division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.operators.ann import (
    brute_force_topk,
    build_ivf_index,
    build_lsh_index,
    cosine_pairs,
    cosine_pairs_lsh,
    ivf_topk_indexed,
    lsh_topk_indexed,
)
from timescaledb_event_streamer_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    shingle_pairs_jaccard,
    simhash_pairs,
)
from timescaledb_event_streamer_spark.operators.textstats import (
    lang_pred,
    n_tokens_bpe,
    n_tokens_ws,
    punct_ratio,
    quality_score,
    stopword_ratio,
)
from timescaledb_event_streamer_spark.operators.textstats import fingerprint as doc_fingerprint
from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load, spread

_STOP_SQL = r"\b(the|a|of|and|in|to|is)\b"
_WS_SQL = r"\S+"
_BPE_SQL = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_PUNCT_SQL = r"[^A-Za-z0-9\s]"

# floor(x*1e6 + 0.5)/1e6 matches operators.textstats.round_stable6
# bit-for-bit (engine-stable rounding; see that docstring)
_SQL_STOP_RATIO = (
    f"(floor((len(regexp_extract_all(text, '{_STOP_SQL}')) * 1.0 / "
    f"greatest(len(regexp_extract_all(text, '{_WS_SQL}')), 1)) * 1000000.0 + 0.5) / 1000000.0)"
)
_SQL_PUNCT_RATIO = (
    f"(floor((len(regexp_extract_all(text, '{_PUNCT_SQL}')) * 1.0 / "
    f"greatest(length(text), 1)) * 1000000.0 + 0.5) / 1000000.0)"
)


@register(
    "dedup_exact",
    family="dedup",
    doc="Exact dedup via content-hash groupBy: keep lowest doc_id per md5(text)",
    oracle="""
        SELECT md5(text) AS content_hash,
               min(doc_id) AS keep_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    family="dedup",
    doc="Near-dup pairs by word-5-gram Jaccard >= 0.3, candidates via shingle join",
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
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT p.doc_a, p.doc_b, p.n_inter,
                   round(p.n_inter * 1.0 / (x.n + y.n - p.n_inter), 6) AS jaccard
            FROM pairs p
            JOIN sz x ON p.doc_a = x.doc_id
            JOIN sz y ON p.doc_b = y.doc_id
        )
        SELECT doc_a, doc_b, n_inter, jaccard FROM scored WHERE jaccard >= 0.3
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 5
    )
    return shingle_pairs_jaccard(docs).filter(F.col("jaccard") >= 0.3)


@register(
    "dedup_minhash_lsh",
    family="dedup",
    doc="MinHash(32 perms) + 8-band LSH near-dup pairs, est. Jaccard >= 0.5 "
    "(rows-only: hash permutations are not SQL-portable; exactness vs "
    "true Jaccard asserted in tests/test_dedup.py)",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 5
    )
    return minhash_lsh_pairs(docs, threshold=0.5)


@register(
    "dedup_simhash",
    family="dedup",
    doc="64-bit SimHash near-dup pairs (hamming <= 3) via lossless 16-bit band "
    "bucketing (rows-only: bit-mix not SQL-portable)",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(load(spark, sf_dir, "documents"))


@register(
    "dedup_embedding_cosine",
    family="dedup",
    doc="Embedding near-dup pairs: cosine >= 0.4 (double math both sides)",
    oracle="""
        WITH
        e0 AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        e AS (
            SELECT vec_id,
                   list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                       AS v
            FROM e0
        ),
        scored AS (
            SELECT a.vec_id AS vec_a,
                   b.vec_id AS vec_b,
                   round(list_dot_product(a.v, b.v), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_pairs(load(spark, sf_dir, "embeddings"), threshold=0.4)


def _sql_plane_list(coords: list[float]) -> str:
    return "[" + ", ".join("1.0" if c > 0 else "-1.0" for c in coords) + "]"


def _embedding_lsh_oracle() -> str:
    """The banded-hyperplane candidate generation is fully
    deterministic (the LCG planes are constants), so the whole
    operator is SQL-expressible: re-derive every band's sign pattern
    with list_dot_product against the same plane literals, collide on
    any band, verify with exact cosine. The oracle recomputes the
    signs independently of Spark's zip_with/aggregate fold — a real
    cross-check of the bucketing, not an echo."""
    from timescaledb_event_streamer_spark.operators.ann import _planes

    n_bands, band_bits, dim = 16, 4, 64
    sign_cols, band_conds = [], []
    for bi in range(n_bands):
        for j, coords in enumerate(_planes(1000 + bi, band_bits, dim)):
            sign_cols.append(
                f"list_dot_product(v, {_sql_plane_list(coords)}) > 0 AS s{bi}_{j}"
            )
        band_conds.append(
            "(" + " AND ".join(f"a.s{bi}_{j} = b.s{bi}_{j}" for j in range(band_bits)) + ")"
        )
    signs = ",\n                   ".join(sign_cols)
    conds = "\n                OR ".join(band_conds)
    # signs are computed on the RAW vectors (scaling never flips a
    # sign); the verify step scores normalize-once-then-dot, the same
    # formula as cosine_pairs / dedup_embedding_cosine, so the
    # approx ⊆ exact containment holds bit-for-bit
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        sig AS (
            SELECT vec_id,
                   list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                       AS u,
                   {signs}
            FROM e
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_dot_product(a.u, b.u), 6) AS cosine
            FROM sig a JOIN sig b ON a.vec_id < b.vec_id
            WHERE {conds}
        )
        SELECT vec_a, vec_b, cosine FROM cand WHERE cosine >= 0.4
    """


@register(
    "dedup_embedding_lsh",
    family="dedup",
    doc="Embedding near-dup pairs via banded hyperplane LSH + exact cosine "
    "verify — the 100 TB path for dedup_embedding_cosine. The DuckDB "
    "oracle re-derives every band sign pattern from the same constant "
    "planes with list_dot_product, so candidate generation AND "
    "verification are value-exact checked (recall vs exact pairs "
    "additionally asserted in tests).",
    oracle=_embedding_lsh_oracle(),
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_pairs_lsh(load(spark, sf_dir, "embeddings"), threshold=0.4)


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    # fixed query point: embedding of vec_id=0 (driver-side scalar,
    # same role as a user-supplied query vector)
    row = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row[0]]


@register(
    "ann_bruteforce_topk",
    family="ann",
    doc="Exact cosine top-20 vs the vec_id=0 query vector (deterministic "
    "tiebreak on vec_id)",
    oracle="""
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
        )
        SELECT vec_id,
               label,
               round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6)
                   AS cosine
        FROM embeddings
        ORDER BY cosine DESC, vec_id
        LIMIT 20
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _query_vec(spark, sf_dir), k=20)


# One-off ANN index builds — the probe queries below read the
# bucketed/partitioned layout instead of re-hashing / re-fitting the
# corpus per call. On a cluster these are persistent warehouse tables;
# locally they live at a deterministic temp path so a fresh process
# (the driver runs each query cold) REUSES an index a prior process
# built instead of paying the k-means/bucketing cost again. The builds
# are deterministic (seeded), so a rare concurrent double-build
# converges to the same content; _SUCCESS markers gate reuse.
_ANN_INDEX_CACHE: dict[tuple[str, str], str] = {}


def _index_ready(path: str, *subdirs: str) -> bool:
    import os

    return all(
        os.path.isfile(os.path.join(path, sub, "_SUCCESS") if sub else os.path.join(path, "_SUCCESS"))
        for sub in (subdirs or ("",))
    )


def _index_path(sf_dir: str, layout: str) -> str:
    import hashlib
    import os
    import tempfile

    key = hashlib.md5(f"{os.path.abspath(sf_dir)}:{layout}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_index_{layout}_{key}")


def _ensure_index(spark, sf_dir: str, layout: str, build, *subdirs: str) -> str:
    key = (sf_dir, layout)
    if key not in _ANN_INDEX_CACHE:
        path = _index_path(sf_dir, layout)
        if not _index_ready(path, *subdirs):
            build(path)
        _ANN_INDEX_CACHE[key] = path
    return _ANN_INDEX_CACHE[key]


def _lsh_index(spark: SparkSession, sf_dir: str) -> str:
    return _ensure_index(
        spark, sf_dir, "lsh8",
        lambda p: build_lsh_index(load(spark, sf_dir, "embeddings"), p, n_planes=8),
    )


def _ivf_index(spark: SparkSession, sf_dir: str) -> str:
    return _ensure_index(
        spark, sf_dir, "ivf16",
        lambda p: build_ivf_index(load(spark, sf_dir, "embeddings"), p, n_centroids=16),
        "vectors", "centroids",
    )


def _ann_lsh_oracle() -> str:
    """Re-derives the 8-plane sign-pattern bucket of every vector AND
    of the query with list_dot_product against the same constant
    planes, applies the hamming<=3 multi-probe filter, and ranks by
    exact cosine — an independent recomputation of what the
    bucket-partitioned index + probe produce, so the index build, the
    driver-side query-bucket math, and the partition-pruned scan are
    all value-exact checked."""
    from timescaledb_event_streamer_spark.operators.ann import _planes

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
        qb AS (SELECT {bucket_sql("qv")} AS qbucket FROM q),
        sig AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
                   {bucket_sql("CAST(embedding AS DOUBLE[])")} AS bucket
            FROM embeddings
        )
        SELECT vec_id, label,
               round(list_cosine_similarity(v, (SELECT qv FROM q)), 6) AS cosine
        FROM sig, qb
        WHERE bit_count(xor(bucket, qbucket)) <= 3
        ORDER BY cosine DESC, vec_id
        LIMIT 20
    """


@register(
    "ann_lsh_topk",
    family="ann",
    doc="LSH-indexed ANN top-20: one-off bucket-partitioned index build "
    "(build_lsh_index), then a multi-probe scan of only the hamming<=3 "
    "bucket partitions (~36% of a worst-case uniform corpus via partition "
    "pruning, far less with real neighbor structure). The DuckDB oracle "
    "independently re-derives every bucket and the probe set from the "
    "same constant planes, so the index layout and probe math are "
    "value-exact checked; recall vs brute force + pruning proof "
    "additionally asserted in tests.",
    oracle=_ann_lsh_oracle(),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_topk_indexed(
        spark, _lsh_index(spark, sf_dir), _query_vec(spark, sf_dir), k=20
    )


@register(
    "ann_ivf_topk",
    family="ann",
    doc="IVF-indexed ANN top-20: one-off k-means build materialized as a "
    "cluster-partitioned table + centroid table (build_ivf_index), probe "
    "scans only nprobe=4 of 16 cluster partitions (~25% scan fraction, "
    "partition-pruned, no refit); recall + pruning proof in tests (rows-only)",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_topk_indexed(
        spark, _ivf_index(spark, sf_dir), _query_vec(spark, sf_dir), k=20, nprobe=4
    )


@register(
    "text_lang_id",
    family="text",
    doc="Stopword-profile language ID over documents",
    oracle=f"""
        SELECT doc_id,
               {_SQL_STOP_RATIO} AS stop_ratio,
               CASE WHEN {_SQL_STOP_RATIO} >= 0.05 THEN 'en' ELSE 'other' END AS lang_pred
        FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        stopword_ratio(F.col("text")).alias("stop_ratio"),
        lang_pred(F.col("text")).alias("lang_pred"),
    )


@register(
    "text_quality_score",
    family="text",
    doc="Composite quality score: stopword signal + length credit - punct noise",
    oracle=f"""
        SELECT doc_id,
               n_chars,
               {_SQL_STOP_RATIO} AS stop_ratio,
               {_SQL_PUNCT_RATIO} AS punct_ratio,
               floor((0.5 * {_SQL_STOP_RATIO}
                     + 0.4 * least(n_chars / 500.0, 1.0)
                     - 0.1 * {_SQL_PUNCT_RATIO}) * 1000000.0 + 0.5) / 1000000.0 AS quality
        FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "n_chars",
        stopword_ratio(F.col("text")).alias("stop_ratio"),
        punct_ratio(F.col("text")).alias("punct_ratio"),
        quality_score(F.col("text"), F.col("n_chars")).alias("quality"),
    )


@register(
    "text_token_count",
    family="text",
    doc="Whitespace + BPE-ish regex token counts per document and corpus totals",
    oracle=f"""
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(len(regexp_extract_all(text, '{_WS_SQL}'))) AS BIGINT) AS total_ws_tokens,
               CAST(sum(len(regexp_extract_all(text, '{_BPE_SQL}'))) AS BIGINT) AS total_bpe_tokens,
               round(avg(len(regexp_extract_all(text, '{_WS_SQL}'))), 6) AS avg_ws_tokens
        FROM documents
        GROUP BY source
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        n_tokens_ws(F.col("text")).alias("ws"),
        n_tokens_bpe(F.col("text")).alias("bpe"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws").alias("total_ws_tokens"),
        F.sum("bpe").alias("total_bpe_tokens"),
        F.round(F.avg("ws"), 6).alias("avg_ws_tokens"),
    )


@register(
    "text_fingerprint",
    family="text",
    doc="Rolling-hash fingerprint: min md5 over word-5-gram shingles "
    "(1-perm MinHash)",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        s AS (
            SELECT doc_id, unnest(range(len(toks) - 4)) AS i, toks
            FROM t WHERE len(toks) >= 5
        )
        SELECT doc_id, min(md5(array_to_string(toks[i + 1 : i + 5], ' '))) AS fingerprint
        FROM s
        GROUP BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents")).filter(
        F.size(F.split(F.col("text"), " ")) >= 5
    )
    return docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "pipeline_clean_corpus",
    family="text",
    doc="End-to-end training-corpus cleaning pipeline: language filter + "
    "quality threshold + token-length band + exact dedup (keep lowest "
    "doc_id per content hash), composed from the individual operators. "
    "One scan computes every text feature; the dedup groupBy is the only "
    "shuffle.",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id, source, text,
                   len(regexp_extract_all(text, '{_WS_SQL}')) AS n_ws_tokens,
                   CASE WHEN {_SQL_STOP_RATIO} >= 0.05 THEN 'en' ELSE 'other' END AS lang_pred,
                   floor((0.5 * {_SQL_STOP_RATIO}
                         + 0.4 * least(n_chars / 500.0, 1.0)
                         - 0.1 * {_SQL_PUNCT_RATIO}) * 1000000.0 + 0.5) / 1000000.0 AS quality
            FROM documents
        ),
        kept AS (
            SELECT * FROM feats
            WHERE lang_pred = 'en' AND quality >= 0.35
              AND n_ws_tokens BETWEEN 5 AND 10000
        ),
        canon AS (
            SELECT md5(text) AS h, min(doc_id) AS keep_id FROM kept GROUP BY 1
        )
        SELECT k.doc_id, k.source,
               CAST(k.n_ws_tokens AS BIGINT) AS n_ws_tokens,
               k.quality
        FROM kept k
        JOIN canon c ON k.doc_id = c.keep_id
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # spread: the regex feature pass is the expensive projection.
    # Dedup keeps the lowest doc_id per content hash via ONE window
    # over md5(text) — a single corpus scan and a single shuffle; the
    # earlier groupBy + semi-join form planned the whole regex chain
    # twice (once per join side).
    docs = spread(load(spark, sf_dir, "documents"))
    feats = docs.select(
        "doc_id",
        "source",
        "text",
        n_tokens_ws(F.col("text")).alias("n_ws_tokens"),
        lang_pred(F.col("text")).alias("lang_pred"),
        quality_score(F.col("text"), F.col("n_chars")).alias("quality"),
    )
    kept = feats.filter(
        (F.col("lang_pred") == "en")
        & (F.col("quality") >= 0.35)
        & F.col("n_ws_tokens").between(5, 10000)
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        kept.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "source", "n_ws_tokens", "quality")
    )


_SQL_JACCARD_CTES = """
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
    )
"""


@register(
    "dedup_clusters",
    family="dedup",
    doc="Near-dup CLUSTERS: connected components over the jaccard>=0.3 pair "
    "graph (min-reachable-doc_id labels via iterative label propagation; "
    "oracle: DuckDB recursive CTE transitive closure). Output is one row "
    "per clustered doc with its canonical cluster id and cluster size — "
    "the form a keep-one-per-group dedup actually consumes.",
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
        cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
        SELECT cc.node AS doc_id,
               cc.cluster_id,
               sz2.cluster_size
        FROM cc
        JOIN (SELECT cluster_id, count(*) AS cluster_size
              FROM cc GROUP BY 1) sz2 USING (cluster_id)
    """,
)
def dedup_clusters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.dedup import dedup_clusters

    docs = load(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 5
    )
    pairs = shingle_pairs_jaccard(docs).filter(F.col("jaccard") >= 0.3)
    return dedup_clusters(pairs)


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s]+"
_LONGNUM_RE = r"[0-9]{6,}"


@register(
    "text_pii_redaction",
    family="text",
    doc="PII scrubbing pass: emails / URLs / long digit runs replaced by "
    "typed placeholders, with per-doc redaction counts — single scan, "
    "pure codegen regex, the standard pre-training privacy filter.",
    oracle=f"""
        SELECT doc_id,
               md5(regexp_replace(regexp_replace(regexp_replace(text,
                   '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_URL_RE}', '<URL>', 'g'),
                   '{_LONGNUM_RE}', '<NUM>', 'g')) AS redacted_hash,
               CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text, '{_URL_RE}')) AS BIGINT) AS n_urls,
               CAST(len(regexp_extract_all(text, '{_LONGNUM_RE}')) AS BIGINT) AS n_longnums
        FROM documents
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _URL_RE,
            "<URL>",
        ),
        _LONGNUM_RE,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        F.md5(redacted).alias("redacted_hash"),
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(_URL_RE)).cast("long").alias("n_urls"),
        F.regexp_count("text", F.lit(_LONGNUM_RE)).cast("long").alias("n_longnums"),
    )


@register(
    "text_domain_mix",
    family="text",
    doc="Training-corpus mixing weights: per-source document/token "
    "counts and each source's share of all corpus tokens -- the "
    "table a data-mixing ablation starts from. One agg to source "
    "grain (tiny), then the total folded in via a broadcast scalar "
    "cross join: the 100 TB scan happens exactly once.",
    oracle=f"""
        WITH per_source AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(regexp_extract_all(text, '{_WS_SQL}'))) AS BIGINT)
                       AS n_tokens
            FROM documents
            GROUP BY source
        )
        SELECT source,
               n_docs,
               n_tokens,
               round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6) AS token_share
        FROM per_source
    """,
)
def text_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens_ws(F.col("text"))).alias("n_tokens"),
    )
    total = per_source.agg(F.sum("n_tokens").alias("tot"))
    return per_source.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("tot"), 6).alias("token_share"),
    )


@register(
    "corpus_mix_planner",
    family="text",
    doc="Training-mix sampling plan: flatten the corpus's natural "
    "language skew into an equal-share-per-language target under a "
    "global token budget (half the corpus). Emits, per (lang, source) "
    "bucket, the uniform within-language sampling rate and the "
    "expected token yield — the table a data-mixing run feeds "
    "straight into a Bernoulli sampler. Shape: ONE corpus scan to the "
    "(lang, source) grain with map-side partial aggregation; language "
    "totals and the global budget are re-aggregations of that tiny "
    "table folded back via broadcast joins, so nothing rescans the "
    "100 TB input.",
    oracle=f"""
        WITH b AS (
            SELECT lang, source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(regexp_extract_all(text, '{_WS_SQL}'))) AS BIGINT)
                       AS n_tokens
            FROM documents
            GROUP BY lang, source
        ),
        l AS (
            SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens
            FROM b GROUP BY lang
        ),
        g AS (
            SELECT CAST(sum(lang_tokens) AS BIGINT) AS total_tokens,
                   CAST(count(*) AS BIGINT) AS n_langs
            FROM l
        ),
        t AS (
            SELECT total_tokens,
                   CAST(floor(total_tokens / (2.0 * n_langs)) AS BIGINT)
                       AS target_tokens
            FROM g
        )
        SELECT b.lang,
               b.source,
               b.n_docs,
               b.n_tokens,
               l.lang_tokens,
               t.target_tokens,
               round(least(1.0, t.target_tokens * 1.0 / l.lang_tokens), 6)
                   AS sample_rate,
               CAST(floor(least(t.target_tokens, l.lang_tokens) * 1.0
                          * b.n_tokens / l.lang_tokens) AS BIGINT)
                   AS expected_tokens
        FROM b JOIN l USING (lang) CROSS JOIN t
    """,
)
def corpus_mix_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    bucket = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens_ws(F.col("text"))).alias("n_tokens"),
    )
    lang = bucket.groupBy("lang").agg(F.sum("n_tokens").alias("lang_tokens"))
    glob = lang.agg(
        F.sum("lang_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_langs"),
    ).select(
        "total_tokens",
        F.floor(F.col("total_tokens") / (F.col("n_langs") * 2.0))
        .cast("long")
        .alias("target_tokens"),
    )
    capped = F.least(F.col("target_tokens"), F.col("lang_tokens"))
    return (
        bucket.join(F.broadcast(lang), "lang")
        .crossJoin(F.broadcast(glob))
        .select(
            "lang",
            "source",
            "n_docs",
            "n_tokens",
            "lang_tokens",
            "target_tokens",
            F.round(
                F.least(
                    F.lit(1.0), F.col("target_tokens") * F.lit(1.0) / F.col("lang_tokens")
                ),
                6,
            ).alias("sample_rate"),
            F.floor(capped.cast("double") * F.col("n_tokens") / F.col("lang_tokens"))
            .cast("long")
            .alias("expected_tokens"),
        )
    )


@register(
    "ann_batch_topk",
    family="ann",
    doc="Batched ANN serving shape: top-5 neighbors for a SET of query "
    "vectors (vec_id < 4) in ONE corpus scan. Ranking is two-level: "
    "top-5 within (query, salt=pmod(vec_id,16)) first, then top-5 of "
    "the 16x5 survivors per query -- with few queries a single "
    "per-query window funnels the whole corpus through q reducers; "
    "salting keeps 16q-way parallelism and the final shuffle carries "
    "only 80 rows per query.",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 4),
        scored AS (
            SELECT q.query_id,
                   e.vec_id,
                   round(list_cosine_similarity(e.v, q.qv), 6) AS cosine
            FROM e JOIN q ON e.vec_id <> q.query_id
        ),
        ranked AS (
            SELECT query_id, vec_id, cosine,
                   CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine DESC, vec_id
                   ) AS BIGINT) AS rnk
            FROM scored
        )
        SELECT query_id, vec_id, cosine, rnk FROM ranked WHERE rnk <= 5
    """,
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timescaledb_event_streamer_spark.operators.ann import cosine

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cosine"),
        )
    )
    w_local = Window.partitionBy(
        "query_id", F.pmod(F.col("vec_id"), F.lit(16))
    ).orderBy(F.col("cosine").desc(), "vec_id")
    local5 = scored.withColumn("r", F.row_number().over(w_local)).filter(
        F.col("r") <= 5
    )
    w_global = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "vec_id"
    )
    return (
        local5.select(
            "query_id", "vec_id", "cosine",
            F.row_number().over(w_global).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


@register(
    "dedup_semantic_clusters",
    family="dedup",
    doc="SEMANTIC dedup clusters: connected components over the "
    "cosine>=0.4 embedding pair graph (same CC operator as the "
    "text-shingle clusters -- pair generators and the cluster "
    "builder compose). Oracle: recursive-CTE transitive closure.",
    oracle="""
        WITH RECURSIVE
        e0 AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        e AS (
            SELECT vec_id,
                   list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                       AS v
            FROM e0
        ),
        dup AS (
            SELECT a.vec_id AS va, b.vec_id AS vb
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.v, b.v), 6) >= 0.4
        ),
        edges AS (
            SELECT va AS src, vb AS dst FROM dup
            UNION SELECT vb, va FROM dup
        ),
        reach(node, lbl) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e2.dst, r.lbl FROM reach r JOIN edges e2 ON r.node = e2.src
        ),
        cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
        SELECT cc.node AS vec_id,
               cc.cluster_id,
               sz.cluster_size
        FROM cc
        JOIN (SELECT cluster_id, count(*) AS cluster_size
              FROM cc GROUP BY 1) sz USING (cluster_id)
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.dedup import dedup_clusters

    pairs = cosine_pairs(load(spark, sf_dir, "embeddings"), threshold=0.4)
    return dedup_clusters(pairs, src="vec_a", dst="vec_b").select(
        F.col("doc_id").alias("vec_id"), "cluster_id", "cluster_size"
    )


@register(
    "dedup_containment",
    family="dedup",
    doc="Asymmetric shingle containment |A∩B|/|A|: catches "
    "subset-copies (a doc quoted inside a larger one) that Jaccard "
    "misses. Same shingle-join candidate generation and scale "
    "posture as dedup_ngram_jaccard; keep pairs where either "
    "direction >= 0.5.",
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
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT p.doc_a, p.doc_b, p.n_inter,
                   round(p.n_inter * 1.0 / x.n, 6) AS containment_a,
                   round(p.n_inter * 1.0 / y.n, 6) AS containment_b
            FROM pairs p
            JOIN sz x ON p.doc_a = x.doc_id
            JOIN sz y ON p.doc_b = y.doc_id
        )
        SELECT doc_a, doc_b, n_inter, containment_a, containment_b
        FROM scored
        WHERE containment_a >= 0.5 OR containment_b >= 0.5
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.dedup import (
        shingle_pairs_containment,
    )

    docs = load(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 5
    )
    return shingle_pairs_containment(docs).filter(
        (F.col("containment_a") >= 0.5) | (F.col("containment_b") >= 0.5)
    )


@register(
    "text_chunk_windows",
    family="text",
    doc="Context-window chunking: split every document into 50-token "
    "windows with 10-token overlap (stride 40) -- the standard "
    "training-example preparation step. sequence+explode+slice, all "
    "codegen, one scan, no shuffle; chunk content is carried as an "
    "md5 so the output stays slim at corpus scale.",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        s AS (
            SELECT doc_id, toks,
                   unnest(range(0, greatest(len(toks) - 1, 0) + 1, 40)) AS start
            FROM t
        )
        SELECT doc_id,
               CAST(start // 40 AS BIGINT) AS chunk_idx,
               CAST(len(toks[start + 1 : start + 50]) AS BIGINT) AS chunk_tokens,
               md5(array_to_string(toks[start + 1 : start + 50], ' ')) AS chunk_hash
        FROM s
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(40))
    exploded = docs.select(
        "doc_id", toks.alias("toks"), F.explode(starts).alias("start")
    )
    chunk = F.slice("toks", F.col("start") + 1, F.lit(50))
    return exploded.select(
        "doc_id",
        (F.col("start") / 40).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


@register(
    "corpus_stratified_sample",
    family="text",
    doc="Deterministic stratified sampling + train/val split: per-source "
    "keep rates and a 10%-val holdout decided by salted md5 prefixes "
    "(hex-string compare == numeric compare at fixed width, so the "
    "decision is reproducible on any engine and any run -- the "
    "training-mix downsampling step of a 100 TB pipeline; pure "
    "projection, no shuffle, no RNG state).",
    oracle="""
        WITH keyed AS (
            SELECT doc_id, source,
                   substr(md5('sample:' || doc_id), 1, 4) AS sample_key,
                   substr(md5('split:' || doc_id), 1, 4) AS split_key
            FROM documents
        )
        SELECT doc_id, source, sample_key,
               CASE WHEN split_key < '1999' THEN 'val' ELSE 'train' END AS split
        FROM keyed
        WHERE source IN ('src0', 'src1', 'src2', 'src3') OR sample_key < '8000'
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    sample_key = F.substring(F.md5(F.concat(F.lit("sample:"), did)), 1, 4)
    split_key = F.substring(F.md5(F.concat(F.lit("split:"), did)), 1, 4)
    keep = F.col("source").isin("src0", "src1", "src2", "src3") | (
        sample_key < "8000"
    )
    return (
        docs.select(
            "doc_id",
            "source",
            sample_key.alias("sample_key"),
            F.when(split_key < "1999", "val").otherwise("train").alias("split"),
        )
        .filter(keep)
    )


def _ivfpq_index(spark: SparkSession, sf_dir: str) -> str:
    from timescaledb_event_streamer_spark.operators.ann import build_ivfpq_index

    return _ensure_index(
        spark, sf_dir, "ivfpq16x8",
        lambda p: build_ivfpq_index(load(spark, sf_dir, "embeddings"), p),
        "vectors", "centroids", "codebooks",
    )


@register(
    "ann_ivfpq_topk",
    family="ann",
    doc="IVF-PQ ANN top-20: one-off build quantizes L2-normalized "
    "vectors into 8 subspace codes (32x smaller than raw floats) in a "
    "cluster-partitioned layout; the probe scans nprobe=8 of 16 "
    "partition-pruned cells scoring rows by ADC table lookups (no "
    "per-row vector math), then exact-cosine re-ranks the top 200 "
    "candidates (rows-only; recall + pruning proof in tests)",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ann import ivfpq_topk

    return ivfpq_topk(
        spark, _ivfpq_index(spark, sf_dir), _query_vec(spark, sf_dir), k=20, nprobe=8
    )


@register(
    "text_pack_sequences",
    family="text",
    doc="Sequence packing for pretraining batches: assign documents to "
    "~1024-token bins by cumulative token count per source shard "
    "(window cumsum, one shuffle on source) -- the distributed form "
    "of greedy packing: deterministic, order-stable, no driver loop.",
    oracle="""
        WITH t AS (
            SELECT source, doc_id,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT *,
                   sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum
            FROM t
        )
        SELECT source, doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(floor((cum - n_tokens) / 1024) AS BIGINT) AS seq_bin
        FROM c
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(ntok).over(w)
    return docs.select(
        "source",
        "doc_id",
        ntok.alias("n_tokens"),
        F.floor((cum - ntok) / 1024).cast("long").alias("seq_bin"),
    )


@register(
    "embedding_dim_stats",
    family="ann",
    doc="Per-dimension corpus statistics over the embedding column "
    "(mean/std/min/max per dim) -- the whitening/QA pass that catches "
    "dead or exploding dimensions before indexing. posexplode -> one "
    "64-key shuffle with map-side partials; floor-form rounding keeps "
    "the float aggregates engine-stable.",
    oracle="""
        WITH d AS (
            SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
                   generate_subscripts(embedding, 1) - 1 AS dim
            FROM embeddings
        )
        SELECT CAST(dim AS INT) AS dim,
               floor(avg(x) * 1000000.0 + 0.5) / 1000000.0 AS mean_x,
               floor(stddev_samp(x) * 1000000.0 + 0.5) / 1000000.0 AS std_x,
               floor(min(x) * 1000000.0 + 0.5) / 1000000.0 AS min_x,
               floor(max(x) * 1000000.0 + 0.5) / 1000000.0 AS max_x
        FROM d
        GROUP BY 1
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )

    def stable6(c: F.Column) -> F.Column:
        return F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0

    return exploded.groupBy("dim").agg(
        stable6(F.avg("x")).alias("mean_x"),
        stable6(F.stddev_samp("x")).alias("std_x"),
        stable6(F.min("x")).alias("min_x"),
        stable6(F.max("x")).alias("max_x"),
    )


def _minhash_md5_oracle() -> str:
    """Full MinHash+LSH in DuckDB SQL: the md5 base hash is portable
    ('0x…'::BIGINT parse), the 32 Carter-Wegman permutations are the
    same _A/_B constants, bands collide as an OR of per-band row
    equality (equivalent to the band-bucket join), and est_jaccard is
    the exact fraction k/32 (5 decimal places, exactly representable —
    no rounding needed on either side)."""
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
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(MINHASH_PERMS)
    )
    return f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            WHERE len(string_split(text, ' ')) >= 5
        ),
        s0 AS (SELECT doc_id, unnest(range(len(toks) - 4)) AS i, toks FROM t),
        sh AS (
            SELECT doc_id,
                   ('0x' || substr(md5(array_to_string(toks[i + 1 : i + 5], ' ')), 1, 15))::BIGINT
                       % {_MERSENNE} AS h
            FROM s0
        ),
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
        )
        SELECT doc_a, doc_b, est_jaccard FROM cand WHERE est_jaccard >= 0.5
    """


@register(
    "dedup_minhash_md5",
    family="dedup",
    doc="MinHash(32 perms) + 8-band LSH with an md5-derived base hash — "
    "functionally identical to dedup_minhash_lsh but SQL-portable, so "
    "the ENTIRE operator (shingling, permutations, banding, signature "
    "agreement) is verified value-exact against the DuckDB oracle; the "
    "xxhash64 variant stays as the faster production path.",
    oracle=_minhash_md5_oracle(),
)
def dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.dedup import _MERSENNE

    docs = load(spark, sf_dir, "documents").filter(
        F.size(F.split(F.col("text"), " ")) >= 5
    )
    md5_base = lambda s: (  # noqa: E731
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % _MERSENNE
    )
    return minhash_lsh_pairs(docs, threshold=0.5, base_hash=md5_base)


def _simhash_md5_oracle() -> str:
    """Full 60-bit SimHash in DuckDB SQL: md5-derived token hash
    ('0x…'::BIGINT, 15 hex chars = 60 bits so the parse never exceeds
    signed-64), 60 per-bit conditional sums, sign -> fingerprint,
    4x15-bit band collision (lossless for hamming <= 3), exact
    bit_count(xor) verify."""
    n_bits, band_bits = 60, 15
    sums = ",\n               ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS w{j}"
        for j in range(n_bits)
    )
    fp = " + ".join(
        f"CASE WHEN w{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(n_bits)
    )
    band_conds = "\n               OR ".join(
        f"((a.sh >> {band_bits * bi}) & {(1 << band_bits) - 1}) = "
        f"((b.sh >> {band_bits * bi}) & {(1 << band_bits) - 1})"
        for bi in range(4)
    )
    return f"""
        WITH t AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ),
        h AS (
            SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM t
        ),
        w AS (
            SELECT doc_id,
               {sums}
            FROM h GROUP BY doc_id
        ),
        sig AS (SELECT doc_id, CAST({fp} AS BIGINT) AS sh FROM w),
        cand AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE {band_conds}
        )
        SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 3
    """


@register(
    "dedup_simhash_md5",
    family="dedup",
    doc="60-bit SimHash (hamming <= 3, 4x15-bit lossless bands) with an "
    "md5-derived token hash — functionally identical to dedup_simhash "
    "but SQL-portable, so the ENTIRE operator (per-bit weighting, sign "
    "fingerprint, banding, hamming verify) is verified value-exact "
    "against the DuckDB oracle; the 64-bit xxhash64 variant stays as "
    "the faster production path.",
    oracle=_simhash_md5_oracle(),
)
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    md5_base = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")  # noqa: E731
    return simhash_pairs(docs, base_hash=md5_base, n_bits=60)


@register(
    "media_header_probe",
    family="multimodal",
    doc="Container-header metadata probe on BINARY media payloads "
    "without any decoder: PNG IHDR dimensions (big-endian), WAV "
    "RIFF/fmt audio geometry (little-endian channels/rate/duration), "
    "GIF logical-screen size — all fixed-offset integer reads as one "
    "narrow codegen projection over the binary column (the shape that "
    "lets a 100 TB media lake filter by resolution / duration before "
    "scheduling a single decode job). Payloads synthesized as real "
    "container bytes from events; the parse side sees ONLY the "
    "binary column, and the oracle re-derives every field from the "
    "source rows, so a synth/parse bug cannot cancel out.",
    oracle="""
        WITH src AS (
            SELECT event_id,
                   event_id % 3 AS fmt,
                   user_id % 2048 + 16 AS png_w,
                   CAST(floor(event_id / 3) AS BIGINT) % 2048 + 16 AS png_h,
                   event_id % 2 + 1 AS ch,
                   CASE user_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                        ELSE 44100 END AS rate,
                   (event_id % 100000 + 1000) * (event_id % 2 + 1) * 2
                       AS data_size,
                   user_id % 4096 + 1 AS gif_w,
                   event_id % 4096 + 1 AS gif_h
            FROM events
        )
        SELECT event_id AS media_id,
               CASE fmt WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'gif' END
                   AS container,
               CASE fmt WHEN 0 THEN png_w WHEN 2 THEN gif_w END AS width,
               CASE fmt WHEN 0 THEN png_h WHEN 2 THEN gif_h END AS height,
               CASE fmt WHEN 1 THEN ch END AS n_channels,
               CASE fmt WHEN 1 THEN rate END AS sample_rate,
               CASE fmt WHEN 0 THEN 8 WHEN 1 THEN 16 END AS bit_depth,
               CASE fmt WHEN 1 THEN
                   CAST(floor(data_size * 1000 / (rate * ch * 2)) AS BIGINT)
               END AS duration_ms,
               CASE fmt WHEN 0 THEN round(png_w * png_h / 1000000.0, 6)
                        WHEN 2 THEN round(gif_w * gif_h / 1000000.0, 6)
               END AS megapixels,
               CASE fmt WHEN 0 THEN
                       floor(png_w * 1000000.0 / png_h + 0.5) / 1000000.0
                        WHEN 2 THEN
                       floor(gif_w * 1000000.0 / gif_h + 0.5) / 1000000.0
               END AS aspect_ratio,
               CASE fmt WHEN 0 THEN 33 WHEN 1 THEN 44 ELSE 13 END
                   AS header_bytes
        FROM src
    """,
)
def media_header_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.multimodal import (
        parse_media_headers,
        synthesize_media_headers,
    )

    return parse_media_headers(
        synthesize_media_headers(load(spark, sf_dir, "events"))
    )


@register(
    "ann_ivf_seeded",
    family="ann",
    doc="IVF-flat top-k with DETERMINISTIC seed centroids (vec_id % 25 "
    "== 0) — the oracle-portable sibling of ann_ivf_topk's k-means "
    "path, following the md5-MinHash precedent: identical algorithmic "
    "shape (assign -> probe nprobe lists -> exact re-rank), every step "
    "re-derivable in SQL. Cosines round to 6dp before every "
    "comparison so assignment and ranking tie-break identically "
    "across engines. Broadcast seed/query tables; candidate scan "
    "prunes to ~nprobe/|seeds| of the corpus.",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        seeds AS (
            SELECT vec_id AS seed_id, v AS sv FROM e
            WHERE vec_id % 25 = 0 AND vec_id < 2500
        ),
        asg0 AS (
            SELECT e.vec_id, e.v, s.seed_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(e.v, s.sv), 6) DESC,
                                s.seed_id
                   ) AS rn
            FROM e CROSS JOIN seeds s
        ),
        asg AS (SELECT vec_id, v, seed_id FROM asg0 WHERE rn = 1),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
        probes AS (
            SELECT seed_id
            FROM seeds CROSS JOIN q
            ORDER BY round(list_cosine_similarity(sv, qv), 6) DESC, seed_id
            LIMIT 8
        ),
        cand AS (
            SELECT a.vec_id,
                   round(list_cosine_similarity(a.v, q.qv), 6) AS cosine
            FROM asg a JOIN probes USING (seed_id) CROSS JOIN q
            WHERE a.vec_id <> 1
        )
        SELECT vec_id, cosine,
               CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT)
                   AS rnk
        FROM cand
        ORDER BY rnk LIMIT 10
    """,
)
def ann_ivf_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timescaledb_event_streamer_spark.operators.ann import ivf_seeded_topk

    return ivf_seeded_topk(load(spark, sf_dir, "embeddings"))
