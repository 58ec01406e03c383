"""Deduplication operators (SURVEY.md §2.D): exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine.

Scale design: every near-dup variant is *bucketed* — candidate pairs
are only generated inside shared-signature buckets (shingle, LSH
band, simhash band, or cosine-LSH bucket), so the shuffle is keyed
on uniformly-distributed hashes and the quadratic compare is bounded
per bucket. Nothing here does a full cross join at scale; the
brute-force paths exist only as small-SF oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.caching import scoped_persist
from timescaledb_event_streamer_spark.operators.textstats import shingles
from timescaledb_event_streamer_spark.sources.tables import spread

# deterministic MinHash parameters (Carter-Wegman style over xxhash64)
MINHASH_PERMS = 32
MINHASH_BANDS = 8  # 8 bands x 4 rows
# 31-bit Mersenne prime keeps (h % p) * a inside 64-bit long range
_MERSENNE = (1 << 31) - 1
_A = [((2 * i + 1) * 0x9E3779B9) % _MERSENNE or 1 for i in range(MINHASH_PERMS)]
_B = [(i * 0xC2B2AE3D + 1) % _MERSENNE for i in range(MINHASH_PERMS)]


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one shuffle on md5(text), keep the
    lowest id per group (hash-groupBy — the 100 TB-safe shape)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def cross_source_matrix(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix: for every exact-content match
    spanning two different sources, count the (source_a, source_b)
    pair — the who-copies-whom diagnostic that decides source priority
    before dedup.

    Distinct (hash, source) FIRST, so the within-hash self-join is
    bounded by source cardinality (tens), not copy count — a content
    hash shared by a million rows across 3 sources joins 3x3, not
    10^12. One shuffle for the distinct, one hash-keyed self-join.
    """
    hs = docs.select(
        F.md5(F.col(text_col)).alias("h"), F.col(source_col).alias("source")
    ).distinct()
    a, b = hs.alias("a"), hs.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_docs"))
    )


def _shingle_table(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Distinct (doc_id, shingle) rows, persisted: every consumer
    (pair join sides, size aggregation) reuses ONE computation of the
    split/explode/distinct chain instead of re-deriving it from the
    raw corpus per plan branch."""

    tbl = (
        spread(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingles(F.col(text_col))).alias("s"),
        )
    )
    return scoped_persist(tbl, "dedup._shingle_table")


def _shingle_pair_counts(sh: DataFrame) -> DataFrame:
    """Per-pair shared-shingle counts via a shuffled hash self-join on
    the shingle key — the only join strategy that survives when the
    exploded corpus outgrows any broadcast threshold."""
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )


def shingle_pairs_jaccard(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Candidate pairs sharing >=1 word-5-gram shingle, with exact
    Jaccard over distinct shingle sets.

    The pair generation joins on the shingle value — equivalent to
    LSH with one band per shingle. Common shingles explode pair
    counts; at scale the MinHash path (minhash_signatures) bounds
    this, and hot shingles can additionally be dropped by a frequency
    cap before the self-join.

    The shingle table is persisted and the self-join is forced to a
    shuffled hash join on the shingle key: at 100 TB the exploded
    corpus can never broadcast, and locally the auto-broadcast both
    recomputed the split/explode/distinct chain per join side and sat
    right at the 10 MB threshold (high-variance plans). The shingle
    key is near-unique (df <= 4 in the testdata), so the shuffle has
    no skew by construction.
    """
    sh = _shingle_table(docs, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = _shingle_pair_counts(sh)
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            F.round(
                F.col("n_inter")
                / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    base_hash=None,
) -> DataFrame:
    """MinHash signatures as explode(shingle) -> hash -> groupBy(doc)
    with 32 min-aggregates.

    This shape matters twice over: (1) it is the classic scale form —
    one shuffle keyed on doc_id, map-side partial mins, no quadratic
    anything; (2) the aggregation is an optimizer barrier, so the
    signature is computed exactly once (a pure-projection variant
    gets inlined by CollapseProject into every downstream reference —
    measured 40x slower at sf0.1).
    """
    # hash each shingle while still inside the array so the explode
    # materializes 8-byte longs, not ~50-byte 5-gram strings
    # (measured ~15% faster at sf0.1, identical signatures).
    # base_hash swaps the shingle hash: default xxhash64 (fastest,
    # Spark-only); the md5 variant is SQL-portable so the whole
    # operator becomes DuckDB-oracle-checkable (dedup_minhash_md5).
    base_hash = base_hash or (lambda s: F.abs(F.xxhash64(s)) % _MERSENNE)
    h_arr = F.transform(shingles(F.col(text_col), distinct=False), base_hash)
    h = spread(docs).select(F.col(id_col).alias("doc_id"), F.explode(h_arr).alias("h"))
    aggs = [
        F.min((F.col("h") * _A[i] + _B[i]) % _MERSENNE).alias(f"mh{i}")
        for i in range(MINHASH_PERMS)
    ]
    wide = h.groupBy("doc_id").agg(*aggs)
    return wide.select(
        "doc_id", F.array(*[F.col(f"mh{i}") for i in range(MINHASH_PERMS)]).alias("sig")
    )


def shingle_pairs_containment(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Asymmetric shingle containment C(A,B) = |S(A)∩S(B)| / |S(A)|.

    Jaccard misses subset-copies: a paragraph quoted inside a much
    larger document has low Jaccard but containment ≈ 1 for the
    smaller side. Same shingle-join candidate generation (persisted
    shingle table + shuffled hash self-join — see
    :func:`shingle_pairs_jaccard` for the scale rationale) — only the
    normalization differs, so both directions come from one pair
    aggregation.
    """
    sh = _shingle_table(docs, text_col, id_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = _shingle_pair_counts(sh)
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            F.round(F.col("n_inter") / F.col("sa.n_shingles"), 6).alias("containment_a"),
            F.round(F.col("n_inter") / F.col("sb.n_shingles"), 6).alias("containment_b"),
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    base_hash=None,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs.

    bands of r=MINHASH_PERMS/MINHASH_BANDS rows; a pair collides when
    any band hash matches; collisions are verified with the estimated
    Jaccard (signature agreement). The shuffle key is the band hash —
    uniform by construction, so no skew at 100 TB.

    The band rows are FAT: each carries its signature through the
    self-join, so Jaccard is estimated directly on the colliding pair
    and the whole operator plans the signature chain exactly twice
    (once per join side). The earlier slim form (bands only, sigs
    re-attached after pair dedup) planned the signature aggregation
    FOUR times — the asymmetric broadcast self-join defeats Spark's
    exchange reuse — which at 100 TB means four full corpus scans.
    Estimation precedes the pair dedup, so dropDuplicates runs on the
    post-threshold survivors (tiny) instead of every band collision.

    The signature table itself is persisted before the self-join:
    it is doc-grain (one row of 32 longs per document — ~0.3% of a
    text corpus's bytes), and both join sides read it, so caching
    turns TWO full corpus scans + shingle/hash/agg chains into ONE.
    The broadcast side otherwise recomputes everything because
    BroadcastExchange never matches a shuffle exchange for reuse.
    """
    rows = MINHASH_PERMS // MINHASH_BANDS

    sig = scoped_persist(
        minhash_signatures(docs, text_col, id_col, base_hash=base_hash),
        "dedup.minhash_lsh_pairs.sig",
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
                                    F.col("sig")[bi * rows + ri].cast("string")
                                    for ri in range(rows)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(MINHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    est = F.round(
        F.size(
            F.filter(
                F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(float(MINHASH_PERMS)),
        6,
    )
    return (
        cand.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            est.alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def dedup_clusters(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair graph → one cluster
    id (the min doc_id reachable) per document, plus cluster size.
    This turns pairwise dedup output into actionable *groups* (keep
    one canonical doc per cluster).

    Iterative min-label propagation: each round joins labels to
    edges (one shuffle keyed on node id) and keeps the per-node min;
    `localCheckpoint` truncates the plan lineage each round so the
    iteration count never shows up in planning time. Rounds needed =
    graph diameter — near-dup graphs are shallow (dup groups are
    cliques-ish), so this converges in a handful of rounds; at
    extreme scale swap the loop body for the large-star/small-star
    alternation (Kiveris et al., "Connected Components in MapReduce"),
    which keeps the same join-per-round shape but contracts paths
    exponentially.
    """
    fwd = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    edges = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct().withColumn("lbl", F.col("node"))
    )
    # Convergence test: labels only ever decrease under min-propagation,
    # so the label sum strictly decreases until the fixpoint. Comparing
    # sums is ONE tiny aggregate over the just-checkpointed labels —
    # the join+filter+count alternative re-shuffles two label tables
    # every round just to learn "did anything change".
    prev_sum: int | None = None
    for _ in range(max_iter):
        prop = edges.join(labels.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"), "lbl"
        )
        new_labels = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        cur_sum = new_labels.agg(F.sum("lbl")).first()[0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "lbl").select(
        F.col("node").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        "cluster_size",
    )


def simhash64(text_col: Column) -> Column:
    """64-bit SimHash over whitespace tokens as one codegen
    expression. Prefer :func:`simhash_signatures` (explode+groupBy)
    for DataFrame-scale use; this column form suits small inputs."""
    toks = F.split(text_col, " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def bit_weight(j: int):
        def merge(acc, h):
            return acc + F.when(
                F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate(hashes, F.lit(0), merge)

    out = F.lit(0).cast("long")
    # unrolled over static bit positions (shift amounts must be
    # literals); still one codegen expression per row
    for j in range(64):
        mask = (1 << j) - (1 << 64) if j == 63 else (1 << j)  # signed-long wrap for bit 63
        out = out.bitwiseOR(
            F.when(bit_weight(j) > 0, F.lit(mask)).otherwise(F.lit(0)).cast("long")
        )
    return out


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    base_hash=None, n_bits: int = 64,
) -> DataFrame:
    """SimHash via explode(token) -> groupBy(doc) with n_bits
    conditional sums: one shuffle on doc_id, map-side partials, and
    the agg barrier keeps the hash computed once (same rationale as
    minhash_signatures). base_hash/n_bits swap the token hash: default
    xxhash64/64 (fastest, Spark-only); the md5/60-bit variant is
    SQL-portable (dedup_simhash_md5)."""
    base_hash = base_hash or (lambda t: F.xxhash64(t))
    h_arr = F.transform(F.split(F.col(text_col), " "), base_hash)
    h = spread(docs).select(F.col(id_col).alias("doc_id"), F.explode(h_arr).alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"w{j}")
        for j in range(n_bits)
    ]
    wide = h.groupBy("doc_id").agg(*aggs)
    out = F.lit(0).cast("long")
    for j in range(n_bits):
        mask = (1 << j) - (1 << 64) if j == 63 else (1 << j)
        out = out.bitwiseOR(
            F.when(F.col(f"w{j}") > 0, F.lit(mask)).otherwise(F.lit(0)).cast("long")
        )
    return wide.select("doc_id", out.alias("sh"))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    base_hash=None,
    n_bits: int = 64,
) -> DataFrame:
    """SimHash near-dup pairs via 4-band buckets of n_bits/4 bits each
    (any pair at hamming distance <= 3 shares at least one exact band,
    so bucketing is lossless for the threshold)."""
    band_bits = n_bits // 4
    band_mask = (1 << band_bits) - 1
    sh = simhash_signatures(docs, text_col, id_col, base_hash=base_hash, n_bits=n_bits)
    banded = sh.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("sh"), band_bits * bi)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("bucket"),
                    )
                    for bi in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def hamming_band_pairs(
    sigs: DataFrame,
    sig_col: str,
    id_col: str = "doc_id",
    n_bands: int = 8,
    n_bits: int = 64,
    max_hamming: int = 6,
) -> DataFrame:
    """Generic banded hamming-LSH candidate join over an n_bits signed
    signature (r8 — generalizes the 4-band SimHash join to any band
    count): by pigeonhole, a pair at hamming distance <= n_bands - 1
    shares at least one exact band, so bucketing is LOSSLESS for
    max_hamming <= n_bands - 1 (asserted). Candidates join band+bucket
    (never all-pairs), then the exact bit_count verify filters to the
    threshold. Returns (id_a, id_b, hamming)."""
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"bucketing loses pairs: max_hamming {max_hamming} needs "
            f"at least {max_hamming + 1} bands, got {n_bands}"
        )
    if n_bits % n_bands:
        raise ValueError(f"{n_bits} bits not divisible into {n_bands} bands")
    band_bits = n_bits // n_bands
    band_mask = (1 << band_bits) - 1
    sig = F.col(sig_col)
    banded = sigs.select(
        F.col(id_col).alias("_id"),
        sig.alias("_sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftrightunsigned(sig, band_bits * bi)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("bucket"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_sig", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sig").alias("sig_a"),
            F.col("b._sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
