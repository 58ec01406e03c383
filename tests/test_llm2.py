"""Planted-corpus tests for the round-4 corpus-QA operators
(plans/queries_llm2.py): perplexity proxy, within-doc duplicate
n-gram fraction, cross-doc shared-shingle fraction."""

from __future__ import annotations

import math

from timescaledb_event_streamer_spark.plans.queries_llm2 import (
    common_shingle_fraction,
    dup_ngram_fraction,
    perplexity_proxy,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_perplexity_rare_tokens_score_higher(spark):
    """A document of corpus-rare tokens carries more bits/token than
    one made of the corpus's dominant token."""
    docs = _docs(
        spark,
        [
            "the the the the the the the the",  # common
            "zyx qwv kjh plm",                  # each token unique
            "the the the the",                  # more mass on 'the'
        ],
    )
    out = {r["doc_id"]: r for r in perplexity_proxy(docs).collect()}
    assert out[1]["cross_entropy_bits"] > out[0]["cross_entropy_bits"]
    # exact: 'the' occurs 12/16 -> doc 0 entropy = -log2(12/16)
    assert out[0]["cross_entropy_bits"] == round(-math.log2(12 / 16), 6)
    # each rare token occurs 1/16
    assert out[1]["cross_entropy_bits"] == round(-math.log2(1 / 16), 6)
    assert out[1]["n_tokens"] == 4


def test_dup_ngram_fraction_flags_looped_phrase(spark):
    """A doc that loops one phrase has every 5-gram occurrence on a
    repeated gram; a doc of distinct tokens has none."""
    loop = " ".join(["a b c"] * 5)        # 15 tokens, cyclic 5-grams
    clean = " ".join(f"t{i}" for i in range(15))
    out = {r["doc_id"]: r for r in dup_ngram_fraction(_docs(spark, [loop, clean])).collect()}
    assert out[0]["n_grams"] == 11 and out[1]["n_grams"] == 11
    assert out[0]["dup_gram_fraction"] > 0.8
    assert out[1]["dup_gram_fraction"] == 0.0


def test_dup_ngram_short_docs_drop_out(spark):
    out = dup_ngram_fraction(_docs(spark, ["a b c", "one two three four"])).collect()
    assert out == []


def test_common_shingles_boilerplate_detected(spark):
    """Two docs sharing a template header show a nonzero shared
    fraction; an unrelated doc shows zero."""
    header = "terms of service apply here"
    docs = _docs(
        spark,
        [
            header + " alpha beta gamma delta",
            header + " epsilon zeta eta theta",
            "totally unrelated content with unique words only",
        ],
    )
    out = {r["doc_id"]: r for r in common_shingle_fraction(docs).collect()}
    assert out[0]["n_shared"] >= 1 and out[1]["n_shared"] >= 1
    assert out[0]["shared_fraction"] > 0
    assert out[2]["n_shared"] == 0 and out[2]["shared_fraction"] == 0.0
    # the shared grams are exactly the header's 5-grams (header has 5
    # tokens -> 1 shingle)
    assert out[0]["n_shared"] == 1


def _ledger_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, source string, n_chars long",
    )


def _interleaved(base: int, n: int = 40) -> str:
    """Stopword-heavy English text with UNIQUE filler tokens: passes
    the lang + quality gates while producing no repeated 5-grams."""
    stops = ["the", "a", "of", "and", "in", "to", "is"]
    return " ".join(f"{stops[i % 7]} w{base + i}xx" for i in range(n))


def test_training_ledger_gates_and_precedence(spark):
    """Each planted doc is claimed by its intended gate, in precedence
    order; the ledger columns sum to the candidate count. The surprise
    threshold is raised out of the way — the tiny fixture corpus makes
    every unique token corpus-rare (see the dedicated surprise test)."""
    from timescaledb_event_streamer_spark.plans.queries_llm2 import (
        training_corpus_ledger,
    )

    rows = [
        # 0: non-en (no stopwords) -> lang gate, even though it would
        #    also fail later gates
        ("s1", "zz yy xx ww vv uu tt ss " * 10),
        # 1: en but terrible quality (tiny, punct-heavy)
        ("s1", "the a of !!! ??? ;;; ::: !!!"),
        # 2: en + quality, loops one phrase -> within-doc repetition
        ("s1", _interleaved(100, 30) + " " + ("alpha beta gamma delta epsilon " * 8)),
        # 3+4: en + quality, identical docs -> cross-doc repetition
        ("s2", _interleaved(200)),
        ("s2", _interleaved(200)),
        # 5: clean keeper: unique fillers, no gram collisions
        ("s2", _interleaved(300)),
    ]
    out = {
        r["source"]: r
        for r in training_corpus_ledger(
            _ledger_docs(spark, rows), surprise_bits=50.0
        ).collect()
    }
    s1, s2 = out["s1"], out["s2"]
    assert s1["n_candidates"] == 3 and s2["n_candidates"] == 3
    assert s1["n_drop_lang"] == 1
    assert s1["n_drop_quality"] == 1
    assert s1["n_drop_repetition"] == 1  # the looped-phrase doc
    assert s2["n_drop_repetition"] == 2  # the identical pair
    assert s2["n_kept"] == 1 and s2["kept_tokens"] > 0
    for r in (s1, s2):
        gates = (r["n_drop_lang"] + r["n_drop_quality"]
                 + r["n_drop_repetition"] + r["n_drop_surprise"] + r["n_kept"])
        assert gates == r["n_candidates"]


def test_training_ledger_surprise_gate(spark):
    """The corpus-surprise gate fires on the rare-token doc and spares
    the common-token doc (cross-entropy separates them by >3 bits in
    this fixture); repetition is disabled so the stopword-only doc's
    repeated grams don't shadow the gate under test."""
    from timescaledb_event_streamer_spark.plans.queries_llm2 import (
        training_corpus_ledger,
    )

    rows = [
        # common-token doc: every token is corpus-frequent -> low CE
        ("s", "the a of and in to is " * 10),
        # rare-token doc: mostly unique tokens (1/N corpus mass each),
        # with enough stopwords to pass the lang gate
        ("s", _interleaved(500)),
    ]
    [r] = training_corpus_ledger(
        _ledger_docs(spark, rows), rep_max=1.1, shared_max=1.1, surprise_bits=4.0
    ).collect()
    assert r["n_candidates"] == 2
    assert r["n_drop_surprise"] == 1
    assert r["n_kept"] == 1


def test_filtered_topk_pushes_label_to_scan(spark, sf_small):
    """The metadata filter must reach the parquet scan as a pushed
    filter — filter-then-score, never score-then-filter."""
    from timescaledb_event_streamer_spark.plans.registry import all_queries

    df = all_queries()["ann_filtered_topk"](spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "EqualTo(label,3)" in plan, plan[plan.index("PushedFilters"):][:300]


def test_near_dedup_pipeline_keeps_one_per_cluster(spark, tmp_path):
    """Three near-identical docs collapse to one keeper (the lowest
    doc_id); the unrelated doc survives untouched."""
    from timescaledb_event_streamer_spark.plans.queries_llm2 import (
        pipeline_near_dedup,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        ("a", base),
        ("a", base + " extra"),
        ("b", base + " other tail"),
        ("b", " ".join(f"u{i}word" for i in range(12))),
    ]
    docs = spark.createDataFrame(
        [(i, t, s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, source string, n_chars long",
    )
    d = f"{tmp_path}/documents.parquet"
    docs.write.mode("overwrite").parquet(d)
    out = {r["source"]: r for r in pipeline_near_dedup(spark, str(tmp_path)).collect()}
    a, b = out["a"], out["b"]
    # docs 0,1,2 cluster together; canonical = doc 0 (source a)
    assert a["n_near_dup_docs"] == 2 and a["n_dropped"] == 1 and a["n_kept"] == 1
    assert b["n_near_dup_docs"] == 1 and b["n_dropped"] == 1 and b["n_kept"] == 1
    assert b["kept_chars"] == len(rows[3][1])


def test_embedding_outlier_audit_flags_planted_vector(spark, tmp_path):
    """A vector far from its label's tight cluster is flagged; the
    clean label reports zero outliers."""
    import random

    from timescaledb_event_streamer_spark.plans.registry import all_queries

    rng = random.Random(7)
    rows = []
    vid = 0
    for label in (0, 1):
        base = [1.0 if i % 10 == label else 0.0 for i in range(16)]
        for _ in range(30):
            rows.append((vid, [v + rng.uniform(-0.01, 0.01) for v in base], label))
            vid += 1
    rows.append((vid, [9.0] * 16, 0))  # planted outlier in label 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = {r["label"]: r
           for r in all_queries()["embedding_outlier_audit"](spark, str(tmp_path)).collect()}
    assert out[0]["n_outliers"] >= 1 and out[0]["n_vecs"] == 31
    # a clean cluster may still flag a couple of >2-sigma tail points
    # (that's what a z-threshold does); the PLANTED vector dominates
    # the distance range only in its own label
    assert out[1]["n_outliers"] <= 2
    assert out[0]["max_dist"] > 10 * out[1]["max_dist"]
