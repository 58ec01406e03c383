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
