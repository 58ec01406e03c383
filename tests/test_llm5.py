"""Tests for plans/queries_llm5.py (the WAV-silence operator's byte
fold is tested in test_multimodal.py; here: PMI co-occurrence)."""

from __future__ import annotations

import math


def _docs(spark, tmp_path, texts):
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_cooccurrence_pmi_hand_computed(spark, tmp_path):
    """Corpus: 'a b a b' and 'a c', window 3.
    Pairs doc1 (i<j, j-i<=3, canonical): (a,b)x4, (a,a), (b,b);
    doc2: (a,c). Marginals a=3 b=2 c=1, T=6 tokens, P=7 pairs.
    PMI(a,b) = log2((4/7) / ((3/6)*(2/6)))."""
    from timescaledb_event_streamer_spark.plans.queries_llm5 import (
        text_cooccurrence_pmi,
    )

    sf = _docs(spark, tmp_path, ["a b a b", "a c"])
    rows = {(r["w1"], r["w2"]): r for r in text_cooccurrence_pmi(spark, sf).collect()}
    assert rows[("a", "b")]["pair_count"] == 4
    assert rows[("a", "a")]["pair_count"] == 1
    assert rows[("b", "b")]["pair_count"] == 1
    assert rows[("a", "c")]["pair_count"] == 1
    assert rows[("a", "b")]["w1_count"] == 3 and rows[("a", "b")]["w2_count"] == 2
    expect = round(math.log2((4 / 7) / ((3 / 6) * (2 / 6))), 6)
    assert rows[("a", "b")]["pmi_bits"] == expect
    # rare-but-together pair scores HIGHER pmi than the frequent pair
    assert rows[("a", "c")]["pmi_bits"] > 0


def test_cooccurrence_window_bound(spark, tmp_path):
    """Tokens 4 positions apart never pair (window is 3)."""
    from timescaledb_event_streamer_spark.plans.queries_llm5 import (
        text_cooccurrence_pmi,
    )

    sf = _docs(spark, tmp_path, ["x p q r y"])
    rows = {(r["w1"], r["w2"]) for r in text_cooccurrence_pmi(spark, sf).collect()}
    assert ("x", "y") not in rows  # distance 4
    assert ("r", "x") in rows  # distance 3
