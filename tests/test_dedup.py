"""Dedup / similarity operator quality: the LSH variants must find
the same near-dup pairs the exact (oracle) computations find."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from timescaledb_event_streamer_spark.operators.ann import brute_force_topk, lsh_topk
from timescaledb_event_streamer_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    shingle_pairs_jaccard,
    simhash_pairs,
)
from timescaledb_event_streamer_spark.sources.tables import load


@pytest.fixture(scope="module")
def docs(spark, sf_mid):
    return load(spark, sf_mid, "documents")


@pytest.fixture(scope="module")
def true_pairs(docs):
    """Exact Jaccard >= 0.5 pairs — ground truth for the sketches."""
    rows = shingle_pairs_jaccard(docs).filter(F.col("jaccard") >= 0.5).collect()
    return {(r["doc_a"], r["doc_b"]) for r in rows}


def test_exact_dedup_partitions_corpus(docs):
    ded = exact_dedup(docs)
    total = ded.agg(F.sum("n_copies")).collect()[0][0]
    assert total == docs.count()
    assert ded.count() == docs.select("text").distinct().count()


def test_minhash_lsh_finds_true_near_dups(docs, true_pairs):
    assert true_pairs, "testdata should contain planted near-dups"
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    recall = len(true_pairs & got) / len(true_pairs)
    assert recall >= 0.9, f"minhash recall {recall}: {true_pairs - got}"


def test_minhash_estimates_track_true_jaccard(docs):
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    true = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in shingle_pairs_jaccard(docs).filter(F.col("jaccard") >= 0.5).collect()
    }
    errs = [abs(est[p] - true[p]) for p in true if p in est]
    assert errs, "no overlap between estimated and true pairs"
    assert sum(errs) / len(errs) < 0.25


def test_simhash_finds_planted_dups(docs, true_pairs):
    got = {(r["doc_a"], r["doc_b"]) for r in simhash_pairs(docs, max_hamming=3).collect()}
    strong = true_pairs  # jaccard >= 0.5 pairs should mostly be close in hamming
    recall = len(strong & got) / len(strong)
    assert recall >= 0.5, f"simhash recall {recall}"


def test_ann_lsh_recall_vs_brute_force(spark, sf_mid):
    from timescaledb_event_streamer_spark.operators.ann import lsh_bucket

    emb = load(spark, sf_mid, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()}
    approx = {r["vec_id"] for r in lsh_topk(emb, qv, k=10, probe_hamming=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ann recall {recall}"
    # and the probe must actually prune: candidate set well under the corpus
    total = emb.count()
    q_bucket = lsh_bucket(F.array(*[F.lit(v) for v in qv])).cast("long")
    candidates = emb.filter(
        F.bit_count(lsh_bucket(F.col("embedding")).bitwiseXOR(q_bucket)) <= 4
    ).count()
    assert candidates < 0.35 * total, f"probe scans {candidates}/{total} — not pruning"


def test_cosine_pairs_blocked_scorer_matches_join_reference(spark, sf_small):
    """The r11 blocked numpy scorer (block-pair fan-out, cumsum
    sequential-fold dots, JVM-side round + threshold) must reproduce
    the nested-loop-join + aggregate-fold reference bit-for-bit —
    pair set AND rounded cosines, at a threshold of 0.0 so negative
    cosines and both cross-block orientations are exercised."""
    from timescaledb_event_streamer_spark.operators.ann import (
        cosine_pairs,
        dot,
        unit_vectors,
    )

    emb = load(spark, sf_small, "embeddings")
    unit = unit_vectors(emb)
    a, b = unit.alias("a"), unit.alias("b")
    ref = (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round(dot(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.0)
    )
    got = sorted(map(tuple, cosine_pairs(emb, 0.0).collect()))
    want = sorted(map(tuple, ref.collect()))
    assert got == want and len(got) > 0


def test_embedding_lsh_recall_vs_exact_pairs(spark, sf_small):
    from timescaledb_event_streamer_spark.operators.ann import cosine_pairs, cosine_pairs_lsh

    emb = load(spark, sf_small, "embeddings")
    exact = {(r["vec_a"], r["vec_b"]) for r in cosine_pairs(emb, 0.4).collect()}
    approx = {(r["vec_a"], r["vec_b"]) for r in cosine_pairs_lsh(emb, 0.4).collect()}
    assert approx <= exact  # exact-verify step admits no false positives
    recall = len(exact & approx) / max(len(exact), 1)
    assert recall >= 0.7, f"embedding LSH recall {recall} over {len(exact)} pairs"


def test_dedup_clusters_invariants(spark):
    """Pairs (1-2, 2-3) and (5-6) must yield clusters {1,2,3} and
    {5,6} labeled by their min member; endpoints of every input pair
    land in the same cluster."""
    from timescaledb_event_streamer_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 8), (8, 9), (9, 1)], ["doc_a", "doc_b"]
    )
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in dedup_clusters(pairs).collect()}
    # chain 1-2-3 merges with 7-8-9 through the 9-1 edge
    assert {k for k, v in got.items() if v[0] == 1} == {1, 2, 3, 7, 8, 9}
    assert all(v == (1, 6) for k, v in got.items() if k in {1, 2, 3, 7, 8, 9})
    assert got[5] == (5, 2) and got[6] == (5, 2)


def test_shingles_short_docs_yield_empty_set(spark):
    """Documents with fewer tokens than the shingle width must not
    crash (a descending F.sequence produced negative slice starts
    before the clamp) — they contribute an empty shingle set."""
    from timescaledb_event_streamer_spark.operators.textstats import (
        SHINGLE_WIDTH,
        fingerprint,
        shingles,
    )

    df = spark.createDataFrame(
        [("a",), ("one two",), ("exactly five tokens right here",),
         ("one two three four five six seven eight nine ten",)],
        ["text"],
    )
    rows = df.select(
        F.size(shingles(F.col("text"))).alias("n"),
        fingerprint(F.col("text")).alias("fp"),
    ).collect()
    n_toks = [1, 2, 5, 10]
    for r, nt in zip(rows, n_toks):
        expected = max(0, nt - SHINGLE_WIDTH + 1)
        assert r["n"] == expected, (nt, r["n"])
        assert (r["fp"] is None) == (expected == 0)


def test_cross_source_matrix_planted(spark):
    """The driver testdata plants no cross-source copies (the registered
    dedup_cross_source row is legitimately 0-vs-0 there); this pins the
    nonzero who-copies-whom matrix on a synthetic corpus."""
    from timescaledb_event_streamer_spark.operators.dedup import cross_source_matrix

    docs = spark.createDataFrame(
        [
            # "alpha" copied by web + books + wiki; within-source repeat
            # in web must NOT inflate the pair count (distinct-first)
            (1, "web", "alpha text"),
            (2, "web", "alpha text"),
            (3, "books", "alpha text"),
            (4, "wiki", "alpha text"),
            # "beta" copied web -> wiki only
            (5, "web", "beta text"),
            (6, "wiki", "beta text"),
            # unique docs contribute nothing
            (7, "web", "gamma text"),
            (8, "books", "delta text"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r["source_a"], r["source_b"]): r["n_shared_docs"]
        for r in cross_source_matrix(docs).collect()
    }
    assert got == {
        ("books", "web"): 1,
        ("books", "wiki"): 1,
        ("web", "wiki"): 2,  # alpha + beta
    }
