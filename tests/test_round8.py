"""Round-8 operators: BPE apply (F38/F39).

The load-bearing claim is that one ``replace()`` on the bracket-
encoded symbol string IS a left-to-right non-overlapping BPE merge
pass. That is pinned two ways: planted adjacency/order cases, and
EXACT parity against an independent pure-Python encoder using rules
LEARNED from the corpus by F31 (not the pinned plan literals) — so
the equivalence holds for arbitrary rule lists, not just the
registered constants.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from timescaledb_event_streamer_spark.plans.queries_round8 import (
    _BPE_RULES,
    bpe_apply_tokens,
)
from timescaledb_event_streamer_spark.sources.tables import load


def _py_bpe_apply(word: str, rules: list[tuple[str, str, str]]) -> list[str]:
    """Reference encoder: chars + '</w>', then for each rule in order
    one left-to-right non-overlapping pass, merged tokens finalized
    immediately (Sennrich et al. 2016 semantics — matches F31's fold
    step)."""
    syms = list(word) + ["</w>"]
    for left, right, merged in rules:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_apply_planted_semantics(spark):
    cases = [
        # non-overlap: aaaa -> [aa, aa], aaa -> [aa, a]
        ("aaaa", [("a", "a", "aa")]),
        ("aaa", [("a", "a", "aa")]),
        # merged token finalized immediately: no re-merge in one pass
        ("aaaa", [("a", "a", "aa"), ("aa", "aa", "aaaa")]),
        # order dependence: n merges into n</w> BEFORE i+n can fire
        ("in", [("n", "</w>", "n</w>"), ("i", "n", "in")]),
        # rule that never fires
        ("xyz", [("q", "q", "qq")]),
        # single char + end marker merge
        ("x", [("x", "</w>", "x</w>")]),
    ]
    df = spark.createDataFrame([(w,) for w, _ in cases], "w string")
    row = df.select(
        "w",
        *[
            F.when(F.col("w") == word, bpe_apply_tokens(F.col("w"), rules))
            .otherwise(F.lit(None))
            .alias(f"t{i}")
            for i, (word, rules) in enumerate(cases)
        ],
    ).collect()
    by_word = {r["w"]: r for r in row}
    for i, (word, rules) in enumerate(cases):
        got = by_word[word][f"t{i}"]
        assert got == _py_bpe_apply(word, rules), (word, rules)


def test_bpe_apply_parity_with_learned_rules(spark, sf_small):
    """Every word type in the corpus, tokenized with 20 rules LEARNED
    by F31 at this SF, must match the pure-Python encoder exactly —
    token for token."""
    from timescaledb_event_streamer_spark.plans.queries_llm5 import bpe_learn

    docs = load(spark, sf_small, "documents")
    learned = [
        (r["left"], r["right"], r["merged"])
        for r in bpe_learn(docs, n_merges=20).collect()
    ]
    assert len(learned) == 20
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
    )
    got = {
        r["w"]: r["toks"]
        for r in vocab.select(
            "w", bpe_apply_tokens(F.col("w"), learned).alias("toks")
        ).collect()
    }
    # the synthetic corpus has a ~31-word-type vocabulary (SCALING.md)
    assert len(got) >= 25
    for word, toks in got.items():
        assert toks == _py_bpe_apply(word, learned), word
    # and at least one multi-char merge actually fired somewhere
    assert any(any(len(t.replace("</w>", "x")) > 1 for t in v) for v in got.values())


def test_bpe_apply_roundtrip_reconstructs_word(spark, sf_small):
    """Tokens concatenate back to word + '</w>' for every word type —
    the merge passes may regroup but never drop or duplicate bytes."""
    docs = load(spark, sf_small, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
    )
    bad = (
        vocab.select(
            "w",
            F.array_join(
                bpe_apply_tokens(F.col("w"), _BPE_RULES), ""
            ).alias("glued"),
        )
        .filter(F.col("glued") != F.concat(F.col("w"), F.lit("</w>")))
        .count()
    )
    assert bad == 0


def test_bpe_registered_queries_share_one_scan(spark, sf_small):
    """Plan audit: text_domain_mix_bpe scans the documents parquet
    once (tokenization at the word-type grain, no per-doc re-scan)."""
    from timescaledb_event_streamer_spark.plans.registry import all_queries

    plan = (
        all_queries()["text_domain_mix_bpe"](spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("documents.parquet") <= 1


@pytest.mark.parametrize("name", ["text_bpe_apply", "text_domain_mix_bpe"])
def test_bpe_queries_return_rows(spark, sf_small, name):
    from timescaledb_event_streamer_spark.plans.registry import all_queries

    rows = all_queries()[name](spark, sf_small).collect()
    assert len(rows) > 0
    if name == "text_bpe_apply":
        # multi-char merged tokens must appear in the top tokens
        assert any(len(r["token"].replace("</w>", "")) > 1 for r in rows)
