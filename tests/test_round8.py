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


# ---------------------------------------------------------------------------
# image near-duplicate dedup (G8)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_image_hash_invariances():
    """dHash/aHash over the exact-area grid: invariant to uniform
    brightness shift; IDENTICAL across block-upscale and box-mean
    downsample of the same content (the resolution-independence the
    exact fractional-area grid buys — integer-floored grids alias)."""
    import numpy as np

    from timescaledb_event_streamer_spark.operators.multimodal import (
        ahash64,
        dhash64,
    )

    content12 = (np.add.outer(np.arange(12) * 7, np.arange(12) * 5) % 97).astype(
        np.uint8
    )
    base = np.kron((content12 * 2 + 30).astype(np.uint8), np.ones((2, 2), np.uint8))
    d0, a0 = dhash64(base), ahash64(base)
    # brightness shift
    shifted = np.clip(base.astype(int) + 25, 0, 255).astype(np.uint8)
    assert dhash64(shifted) == d0
    assert ahash64(shifted) == a0
    # block upscale 3x carries identical cell means (exact-area grid)
    up = np.kron(base, np.ones((3, 3), dtype=np.uint8))
    assert dhash64(up) == d0 and ahash64(up) == a0
    # 2x box-mean downsample of BLOCK-ALIGNED content is exact too —
    # this is the planted-variant path the G8 query relies on
    down = base.astype(np.float64).reshape(12, 2, 12, 2).mean(axis=(1, 3))
    assert dhash64(down) == d0 and ahash64(down) == a0
    # a downsample that cuts through varying content is only NEAR:
    # the operational claim is hamming <= threshold, not identity
    hi_freq = (np.add.outer(np.arange(24) * 7, np.arange(24) * 5) % 97 * 2 + 30).astype(
        np.uint8
    )
    down_hf = hi_freq.astype(np.float64).reshape(12, 2, 12, 2).mean(axis=(1, 3))
    assert _hamming(dhash64(hi_freq), dhash64(down_hf)) <= 6


def test_image_hash_cross_format_reencode_matches():
    """The same pixels re-encoded across containers (JPEG->PNG,
    GIF->PNG — the G2 re-encode path) hash identically through the
    REAL decoders."""
    from pathlib import Path

    import numpy as np

    from timescaledb_event_streamer_spark.operators.multimodal import (
        _real_decode_image,
        dhash64,
    )
    from timescaledb_event_streamer_spark.operators.png_codec import png_encode

    golden = Path(__file__).resolve().parent / "golden"
    for sub, name in [("jpeg", "color_420"), ("jpeg", "gray_20x13"), ("gif", "interlaced")]:
        payload = (golden / sub / f"{name}.{ 'jpg' if sub == 'jpeg' else 'gif'}").read_bytes()
        expected = np.load(golden / sub / f"{name}_expected.npy")
        png = png_encode(expected.astype(np.uint8))
        assert _hamming(
            dhash64(_real_decode_image(payload)), dhash64(_real_decode_image(png))
        ) == 0, name


def test_hamming_band_pairs_lossless_vs_bruteforce(spark):
    """Pigeonhole: 8-band bucketing over 64 bits finds EVERY pair at
    hamming <= 7 — compare against the brute-force pair set on a
    crafted signature table, including pairs above the threshold that
    must be absent."""
    import itertools

    from timescaledb_event_streamer_spark.operators.dedup import (
        hamming_band_pairs,
    )

    sigs = [
        ("base", 0x0123456789ABCDEF),
        ("ham1", 0x0123456789ABCDEE),  # 1 bit
        ("ham6", 0x0123456789AB5BEF ^ 0),  # several bits off base
        ("far", -0x0123456789ABCDF0),
    ]
    # give every entry a numeric id, compute expected pairs in python
    rows = [(i, v) for i, (_, v) in enumerate(sigs)]
    df = spark.createDataFrame(rows, "media_id LONG, sig LONG")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_band_pairs(
            df, "sig", id_col="media_id", n_bands=8, max_hamming=7
        ).collect()
    }
    want = {}
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        h = _hamming(a, b)
        if h <= 7:
            want[(min(i, j), max(i, j))] = h
    assert got == want
    # and the guard refuses a lossy configuration
    import pytest as _pytest

    with _pytest.raises(ValueError, match="loses pairs"):
        hamming_band_pairs(df, "sig", n_bands=4, max_hamming=7)


def test_dedup_image_near_catches_every_planted_variant(spark, sf_small):
    """The registered G8 query must catch 100% of its planted
    resize+brightness re-encodes (the G2 path) — one planted pair per
    sampled doc with doc_id % 5 == 0 — and report them at dhash
    hamming <= 6 with the planted flag set."""
    from timescaledb_event_streamer_spark.plans.queries_round8 import (
        _IMG_SAMPLE_TARGET,
        _IMG_VARIANT_OFFSET,
    )
    from timescaledb_event_streamer_spark.plans.registry import all_queries
    from timescaledb_event_streamer_spark.sources.tables import load

    rows = all_queries()["dedup_image_near"](spark, sf_small).collect()
    assert rows, "no pairs at all"
    planted = {
        (r["media_a"], r["media_b"]) for r in rows if r["planted"]
    }
    # replicate the sample predicate to get the expected variant set
    docs = load(spark, sf_small, "documents")
    n = docs.count()
    m = max(n // _IMG_SAMPLE_TARGET, 1)
    expected = {
        (r["doc_id"], r["doc_id"] + _IMG_VARIANT_OFFSET)
        for r in docs.select("doc_id", "text")
        .where(F.pmod(F.xxhash64("text"), F.lit(m)) == 0)
        .where(F.col("doc_id") % 5 == 0)
        .collect()
    }
    assert expected, "test corpus produced no planted variants"
    assert planted == expected
    for r in rows:
        assert r["dhash_hamming"] <= 6
