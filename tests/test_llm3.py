"""Planted-corpus tests for the round-5 additions in
plans/queries_llm3.py (segment dedup, duplicated-substring coverage,
Bloom decontamination) and the snapshot-mode semantics operator
(plans/queries_cdc.py cdc_snapshot_modes)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.queries_llm3 import (
    bloom_decontamination,
    paragraph_dedup,
    substring_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


_BLOCK_A = " ".join(f"a{i}" for i in range(12))  # one full shared segment
_BLOCK_B = " ".join(f"b{i}" for i in range(12))  # unique filler


def test_paragraph_dedup_flags_shared_segment_positions(spark):
    """Docs sharing one aligned 12-token block are flagged exactly on
    that segment position; unique blocks stay clean."""
    docs = _docs(
        spark,
        [
            _BLOCK_A + " " + _BLOCK_B,  # seg0 shared, seg1 unique
            _BLOCK_A,                    # seg0 shared
            _BLOCK_B.replace("b", "c"),  # fully unique
        ],
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert out[0]["n_segments"] == 2
    assert out[0]["dup_segments"] == 1
    assert out[0]["dup_segment_fraction"] == 0.5
    assert out[1]["n_segments"] == 1 and out[1]["dup_segments"] == 1
    assert out[2]["dup_segments"] == 0


def test_paragraph_dedup_within_doc_repeat_is_not_cross_doc(spark):
    """A segment repeated only WITHIN one document is not a
    duplicate — the distinct-doc count, not the occurrence count,
    drives the flag (the CCNet cross-doc rule)."""
    docs = _docs(spark, [_BLOCK_A + " " + _BLOCK_A, _BLOCK_B])
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert out[0]["n_segments"] == 2
    assert out[0]["dup_segments"] == 0


def test_substring_coverage_counts_tokens_under_dup_windows(spark):
    """A 10-token run shared across docs covers exactly those token
    positions; the unique remainder stays uncovered, and overlapping
    dup windows don't double-count positions."""
    shared = " ".join(f"s{i}" for i in range(11))  # 11 shared tokens
    tail = " ".join(f"t{i}" for i in range(9))     # 9 unique tokens
    docs = _docs(
        spark,
        [
            shared + " " + tail,  # 20 tokens, first 11 covered
            shared,               # 11 tokens, all covered
            " ".join(f"u{i}" for i in range(15)),  # unique, 0 covered
        ],
    )
    out = {r["doc_id"]: r for r in substring_dedup(docs).collect()}
    # doc 0: two overlapping dup 10-grams (at 0 and 1) cover 11
    # distinct positions, not 20
    assert out[0]["n_tokens"] == 20
    assert out[0]["covered_tokens"] == 11
    assert out[0]["coverage_fraction"] == 0.55
    assert out[1]["covered_tokens"] == 11
    assert out[2]["covered_tokens"] == 0


def test_substring_coverage_excludes_short_docs(spark):
    docs = _docs(spark, ["a b c", " ".join(f"x{i}" for i in range(10))])
    out = substring_dedup(docs).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_bloom_superset_of_exact_probe(spark, sf_small):
    """The Bloom probe can only over-approximate the exact broadcast
    probe: per doc, bloom_hits >= exact n_hits, shingle totals agree,
    and on this corpus the aggregate false-positive margin stays
    small (m=2^16, k=3 over a few hundred set bits)."""
    from timescaledb_event_streamer_spark.plans.queries_ext import (
        text_decontamination,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    docs = load(spark, sf_small, "documents")
    bloom = {r["doc_id"]: r for r in bloom_decontamination(docs).collect()}
    exact = {
        r["doc_id"]: r for r in text_decontamination(spark, sf_small).collect()
    }
    assert set(bloom) == set(exact)
    fp = 0
    total = 0
    for doc_id, b in bloom.items():
        e = exact[doc_id]
        assert b["n_shingles"] == e["n_shingles"]
        assert b["bloom_hits"] >= e["n_hits"], doc_id
        fp += b["bloom_hits"] - e["n_hits"]
        total += b["n_shingles"]
    # expected FP rate ~ (1 - e^{-kn/m})^k: a few hundred bench
    # shingles -> well under 1e-4; allow 1% as the hard ceiling
    assert fp <= max(1, total * 0.01)


def _events(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (lsn, base + datetime.timedelta(minutes=lsn), lsn % 3, "metrics")
        for lsn in range(1, 11)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_snapshot_modes_gate_tiers(spark, tmp_path):
    """replicationchannel.go:199-226 gating: 'always' emits both
    tiers, 'never' only rows past the slot LSN, 'initial_only' only
    the snapshot tier — and the tier boundary is the data-derived
    slot LSN (floor(0.6 * max))."""
    from timescaledb_event_streamer_spark.plans.queries_cdc import (
        cdc_snapshot_modes,
    )

    path = str(tmp_path / "sf")
    _events(spark).write.parquet(path + "/events.parquet")
    out = {
        r["snapshot_mode"]: r
        for r in cdc_snapshot_modes(spark, path).collect()
    }
    # max lsn 10 -> slot_lsn 6: snapshot tier 1..6, stream tier 7..10
    assert out["always"]["n_snapshot"] == 6
    assert out["always"]["n_stream"] == 4
    assert out["always"]["n_emitted"] == 10
    assert (out["always"]["lsn_min"], out["always"]["lsn_max"]) == (1, 10)
    assert out["never"]["n_snapshot"] == 0
    assert out["never"]["n_emitted"] == 4
    assert (out["never"]["lsn_min"], out["never"]["lsn_max"]) == (7, 10)
    assert out["initial_only"]["n_stream"] == 0
    assert out["initial_only"]["n_emitted"] == 6
    assert (
        out["initial_only"]["lsn_min"],
        out["initial_only"]["lsn_max"],
    ) == (1, 6)


def test_bloom_bitmap_is_fixed_size(spark, sf_small):
    """The broadcast side is a single map row bounded by m/64 = 1024
    words — the property that makes the Bloom probe the 100 TB
    swap-in for the raw broadcast set."""
    from timescaledb_event_streamer_spark.plans.queries_llm3 import (
        _doc_shingles,
        bloom_bitmap,
    )
    from timescaledb_event_streamer_spark.sources.tables import load

    docs = load(spark, sf_small, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 0)
    assert _doc_shingles(bench).count() > 0  # probe has content
    rows = bloom_bitmap(bench).collect()
    assert len(rows) == 1  # ONE row no matter the benchmark size
    bitmap = rows[0]["bloom"]
    assert 0 < len(bitmap) <= 1024  # m/64 words at most
    assert all(0 <= w < 1024 for w in bitmap)  # word indices in range


def test_matryoshka_self_rank_and_overlap(spark, sf_mid):
    """The query vector ranks itself first under BOTH metrics
    (cosine(q, q) == 1 at full and half dims), every rank list is a
    dense 1..10, and carried cosines are present for every row of
    the union."""
    from timescaledb_event_streamer_spark.plans.queries_llm3 import (
        embedding_matryoshka_topk,
    )

    rows = embedding_matryoshka_topk(spark, sf_mid).collect()
    by_id = {r["vec_id"]: r for r in rows}
    assert by_id[0]["rank_full"] == 1 and by_id[0]["rank_trunc"] == 1
    assert by_id[0]["cosine_full"] == 1.0 and by_id[0]["cosine_trunc"] == 1.0
    full_ranks = sorted(
        r["rank_full"] for r in rows if r["rank_full"] is not None
    )
    trunc_ranks = sorted(
        r["rank_trunc"] for r in rows if r["rank_trunc"] is not None
    )
    assert full_ranks == list(range(1, 11))
    assert trunc_ranks == list(range(1, 11))
    for r in rows:
        assert r["cosine_full"] is not None and r["cosine_trunc"] is not None


def _ref_paragraph_dedup(docs):
    """Pure-Python reference for paragraph_dedup: segment -> distinct
    doc count -> per-doc duplicated-position tally."""
    segs = {}  # doc_id -> [segment text per position]
    for doc_id, text in docs:
        toks = text.split(" ")
        segs[doc_id] = [
            " ".join(toks[i : i + 12]) for i in range(0, len(toks), 12)
        ]
    nd = {}
    for doc_id, ss in segs.items():
        for s in set(ss):
            nd[s] = nd.get(s, 0) + 1
    out = {}
    for doc_id, ss in segs.items():
        dup = sum(1 for s in ss if nd[s] >= 2)
        out[doc_id] = (len(ss), dup, round(dup / len(ss), 6))
    return out


def _ref_substring_dedup(docs):
    """Pure-Python reference for substring_dedup coverage."""
    grams = {}  # doc -> [(i, gram)]
    for doc_id, text in docs:
        toks = text.split(" ")
        if len(toks) < 10:
            continue
        grams[doc_id] = [
            (i, " ".join(toks[i : i + 10])) for i in range(len(toks) - 9)
        ]
    nd = {}
    for doc_id, gs in grams.items():
        for g in {g for _, g in gs}:
            nd[g] = nd.get(g, 0) + 1
    out = {}
    for doc_id, gs in grams.items():
        covered = set()
        for i, g in gs:
            if nd[g] >= 2:
                covered.update(range(i, i + 10))
        n = len(gs) + 9
        out[doc_id] = (n, len(covered), round(len(covered) / n, 6))
    return out


def test_paragraph_and_substring_dedup_property(spark):
    """Property: on arbitrary corpora (random token streams with
    planted exact/partial copies), both dedup statistics match a
    pure-Python reference computation exactly. Examples are
    generated up front and token-namespaced per example so ONE Spark
    run covers them all without cross-example gram collisions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = st.integers(min_value=0, max_value=6).map(lambda i: f"t{i}")
    doc = st.lists(tok, min_size=1, max_size=30).map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=6)

    collected = []

    @settings(max_examples=15, deadline=None)
    @given(corpus, st.integers(min_value=0, max_value=5))
    def gen(docs, dup_idx):
        # plant an exact copy of one doc so duplication is exercised
        docs = list(docs) + [docs[dup_idx % len(docs)]]
        collected.append(docs)

    gen()

    rows = [
        # token-level namespacing isolates the examples from one
        # another inside the single shared corpus
        (ex * 1000 + j, " ".join(f"e{ex}_{t}" for t in text.split(" ")))
        for ex, docs in enumerate(collected)
        for j, text in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got_p = {
        r["doc_id"]: (
            r["n_segments"],
            r["dup_segments"],
            r["dup_segment_fraction"],
        )
        for r in paragraph_dedup(df).collect()
    }
    assert got_p == _ref_paragraph_dedup(rows)

    got_s = {
        r["doc_id"]: (
            r["n_tokens"],
            r["covered_tokens"],
            r["coverage_fraction"],
        )
        for r in substring_dedup(df).collect()
    }
    assert got_s == _ref_substring_dedup(rows)


def test_bigram_surprise_matches_hand_computation(spark):
    """Planted corpus: the add-1-smoothed conditional bits match an
    exact hand computation, and a looping phrase scores LOWER than
    novel transitions over the same unigrams."""
    import math

    from timescaledb_event_streamer_spark.plans.queries_llm3 import (
        bigram_surprise,
    )

    docs = _docs(
        spark,
        [
            "a b a b a b",  # looping: only (a b) and (b a)
            "a c b a",      # novel transitions over shared unigrams
        ],
    )
    out = {r["doc_id"]: r for r in bigram_surprise(docs).collect()}
    # corpus: V = 3 (a, b, c); bigram counts: doc0 has ab=3, ba=2;
    # doc1 adds ac=1, cb=1, ba=1 -> totals ab=3, ba=3, ac=1, cb=1
    # left-unigram counts: a=4 (ab*3 + ac*1), b=3, c=1
    def bits(pairs):
        bf = {"a b": 3, "b a": 3, "a c": 1, "c b": 1}
        uf = {"a": 4, "b": 3, "c": 1}
        v = 3
        s = sum(-math.log2((bf[p] + 1.0) / (uf[p.split()[0]] + v)) for p in pairs)
        return round(s / len(pairs), 6)

    assert out[0]["n_bigrams"] == 5
    assert out[0]["bigram_cross_entropy_bits"] == bits(
        ["a b", "b a", "a b", "b a", "a b"]
    )
    assert out[1]["n_bigrams"] == 3
    assert out[1]["bigram_cross_entropy_bits"] == bits(["a c", "c b", "b a"])
    assert (
        out[0]["bigram_cross_entropy_bits"] < out[1]["bigram_cross_entropy_bits"]
    )


def test_matryoshka_rerank_recall_and_ordering(spark, sf_mid):
    """E16: the final ranking is exactly the full-dim ordering of the
    candidate set (self at rank 1), and the two-stage result recalls
    most of the TRUE full-dim top-10 (the half-dim prefix carries
    most of the signal on this corpus)."""
    from timescaledb_event_streamer_spark.plans.queries_llm3 import (
        ann_matryoshka_rerank,
    )
    from timescaledb_event_streamer_spark.plans.registry import all_queries

    rows = sorted(
        ann_matryoshka_rerank(spark, sf_mid).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, 11))
    assert rows[0]["vec_id"] == 0  # self-similarity 1.0 survives both stages
    # final order is non-increasing in full cosine
    fulls = [r["cosine_full"] for r in rows]
    assert fulls == sorted(fulls, reverse=True)
    # every kept row passed stage 1
    assert all(1 <= r["cand_rank"] <= 50 for r in rows)

    exact = {
        r["vec_id"]
        for r in all_queries()["ann_bruteforce_topk"](spark, sf_mid)
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
        .collect()
    }
    got = {r["vec_id"] for r in rows}
    assert len(got & exact) >= 7  # recall >= 0.7 vs the exact top-10


def test_threshold_sweep_monotone_with_zero_tail(spark, sf_mid):
    """D19: pair and doc counts are non-increasing in the threshold,
    every candidate threshold appears (zeros included), and — the
    oracle-SF sample being the whole set (m=1 at 500 vectors) — the
    0.4 row agrees exactly with the fixed-threshold operator (D5)."""
    from timescaledb_event_streamer_spark.plans.queries_llm3 import (
        dedup_threshold_sweep,
    )
    from timescaledb_event_streamer_spark.plans.registry import all_queries

    rows = sorted(
        dedup_threshold_sweep(spark, sf_mid).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in rows] == [
        0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9
    ]
    pairs = [r["n_pairs"] for r in rows]
    docs = [r["n_docs_involved"] for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    assert pairs[0] > 0  # the sweep actually saw duplicate mass
    d5 = all_queries()["dedup_embedding_cosine"](spark, sf_mid).count()
    assert next(r for r in rows if r["threshold"] == 0.4)["n_pairs"] == d5
