"""Round-8 additions: BPE tokenization with learned merge rules
(F38/F39) — the APPLY side of the F31 trainer.

F31 (``text_bpe_learn``) learns merge rules; until now nothing
applied them, so every token-count operator (F14/F18/F35/F17) counted
whitespace tokens. These operators tokenize with a merge-rule list:

- the pass for ONE rule is a left-to-right non-overlapping rewrite of
  adjacent symbol pairs, finalized immediately (no re-merge within the
  pass) — exactly the semantics of F31's fold step
  (plans/queries_llm5.py) and of the reference Sennrich re.sub loop;
- encoding each symbol as ``\\x02 sym \\x03`` makes that pass a single
  ``replace()`` call: occurrences of ``<l><r>`` are character-disjoint
  (brackets close each symbol), so the engine's standard
  non-overlapping scan IS the BPE pass — whole-stage codegen on the
  Spark side, plain ``replace()`` chains on the DuckDB side, bit-exact
  on both (pytest additionally pins exact parity against a pure-Python
  encoder on arbitrary LEARNED rules, not just the pinned list);
- application happens at the word-TYPE grain (Heaps-law sublinear in
  corpus size: the distinct-word table of a 100 TB corpus is ~10M
  rows), then joins back to documents by word — the same grain F31
  trains at. Per-doc work never re-tokenizes a word twice.

The registered queries pin the first `_N_RULES` rules learned from the
dev corpus (reproduce with ``bpe_learn(load(...,'documents'), 12)``)
as plan literals so the DuckDB oracle replays the identical fold —
the B48/B80 sequential-fold-as-SQL precedent. Arbitrary-rule
application is pytest-parity-tested (tests/test_round8.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from timescaledb_event_streamer_spark.plans.registry import register
from timescaledb_event_streamer_spark.sources.tables import load, spread

#: symbol brackets — control chars that cannot appear in whitespace-
#: split corpus words, so a bracketed pair match can never straddle a
#: symbol boundary or match inside a longer symbol
_B = "\x02"
_E = "\x03"

#: the first 12 merge rules bpe_learn() produces on the sf0.01 dev
#: corpus (regenerate with bpe_learn(load(..., 'documents'), 12) at
#: /root/testdata/sf0.01). Pinned as plan literals — rule PROVENANCE
#: is fixed, like any production tokenizer shipped with its model;
#: both the Spark plan and the oracle replay this exact list, so
#: certification is value-exact at every SF. (left, right, merged),
#: applied in this order.
_BPE_RULES: list[tuple[str, str, str]] = [
    ("e", "r", "er"),
    ("e", "</w>", "e</w>"),
    ("n", "</w>", "n</w>"),
    ("er", "</w>", "er</w>"),
    ("o", "w", "ow"),
    ("ow", "</w>", "ow</w>"),
    ("o", "r", "or"),
    ("s", "t", "st"),
    ("h", "</w>", "h</w>"),
    ("a", "t", "at"),
    ("l", "u", "lu"),
    ("i", "n", "in"),
]


def bpe_apply_tokens(word: Column, rules: list[tuple[str, str, str]]) -> Column:
    """word -> array<string> of BPE tokens after applying `rules` in
    order. Pure codegen: bracket-encode the symbol sequence
    (chars + '</w>'), one replace() per rule (== one left-to-right
    non-overlapping merge pass), split back."""
    enc = F.concat(
        F.array_join(
            F.transform(
                F.filter(F.split(word, ""), lambda c: c != ""),
                lambda c: F.concat(F.lit(_B), c, F.lit(_E)),
            ),
            "",
        ),
        F.lit(_B + "</w>" + _E),
    )
    for left, right, merged in rules:
        enc = F.replace(
            enc,
            F.lit(_B + left + _E + _B + right + _E),
            F.lit(_B + merged + _E),
        )
    # strip the outer brackets, split on the inter-symbol boundary
    stripped = enc.substr(F.lit(2), F.length(enc) - 2)
    return F.split(stripped, _E + _B)


def _sql_lit(sym: str) -> str:
    """A bracketed symbol as a DuckDB expression (control chars via
    chr(), text via plain literals)."""
    return f"chr(2) || '{sym}' || chr(3)"


def _sql_bpe_tokens(expr: str) -> str:
    """The DuckDB replica of bpe_apply_tokens: encode, one replace()
    per pinned rule, strip, split."""
    enc = (
        f"array_to_string(list_transform(string_split({expr}, ''), "
        "c -> chr(2) || c || chr(3)), '') || chr(2) || '</w>' || chr(3)"
    )
    for left, right, merged in _BPE_RULES:
        pat = f"chr(2) || '{left}' || chr(3) || chr(2) || '{right}' || chr(3)"
        rep = f"chr(2) || '{merged}' || chr(3)"
        enc = f"replace({enc}, {pat}, {rep})"
    return (
        f"string_split(substr({enc}, 2, length({enc}) - 2), chr(3) || chr(2))"
    )


@register(
    "text_bpe_apply",
    family="text",
    doc="BPE TOKENIZATION with learned merge rules (F38) — the apply "
    "side of the F31 trainer: corpus token-frequency table after "
    "applying the pinned 12-rule merge list in order. Application "
    "runs at the word-TYPE grain (Heaps-law sublinear in corpus "
    "size) and each merge pass is ONE whole-stage-codegen replace() "
    "on a bracket-encoded symbol string — occurrences are character-"
    "disjoint, so the engine's standard non-overlapping scan IS the "
    "left-to-right BPE pass (same semantics as F31's fold step; "
    "exact-parity pytest vs a pure-Python encoder on arbitrary "
    "learned rules). The DuckDB oracle replays the identical "
    "replace() chain, so every merge decision is value-checked — "
    "the B48/B80 sequential-fold precedent.",
    oracle=f"""
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ),
        wf AS (
            SELECT w, CAST(count(*) AS BIGINT) AS freq
            FROM words WHERE length(w) > 0 GROUP BY w
        ),
        toks AS (
            SELECT freq, unnest({_sql_bpe_tokens('w')}) AS token FROM wf
        )
        SELECT token, CAST(sum(freq) AS BIGINT) AS n_occurrences
        FROM toks
        GROUP BY token
        ORDER BY n_occurrences DESC, token
        LIMIT 40
    """,
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    toks = wf.select(
        "freq",
        F.explode(bpe_apply_tokens(F.col("w"), _BPE_RULES)).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(F.sum("freq").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(40)
    )


@register(
    "text_domain_mix_bpe",
    family="text",
    doc="Training-corpus mixing weights in LEARNED-TOKENIZER units "
    "(F39): the F14 table with BPE token counts instead of "
    "whitespace counts — mixing ablations weight sources by what "
    "the model actually consumes. Tokenization cost stays at the "
    "word-type grain: (source, word) counts shuffle once, join the "
    "per-type BPE token length (type-grain both sides), aggregate "
    "to source; the corpus text is scanned exactly once and no "
    "word is re-tokenized.",
    oracle=f"""
        WITH words AS (
            SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        sw AS (
            SELECT source, w, CAST(count(*) AS BIGINT) AS n_occ
            FROM words WHERE length(w) > 0 GROUP BY source, w
        ),
        wtok AS (
            SELECT w, CAST(len({_sql_bpe_tokens('w')}) AS BIGINT) AS n_bpe
            FROM (SELECT DISTINCT w FROM sw)
        ),
        per_source AS (
            SELECT source,
                   CAST(sum(n_occ) AS BIGINT) AS n_ws_tokens,
                   CAST(sum(n_occ * n_bpe) AS BIGINT) AS n_bpe_tokens
            FROM sw JOIN wtok USING (w)
            GROUP BY source
        )
        SELECT source,
               n_ws_tokens,
               n_bpe_tokens,
               round(n_bpe_tokens * 1.0 / sum(n_bpe_tokens) OVER (), 6)
                   AS bpe_token_share
        FROM per_source
    """,
)
def text_domain_mix_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents"))
    sw = (
        docs.select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        # both the vocab branch and the join read sw — the eager
        # checkpoint (source x word-type grain, Heaps-law bounded)
        # keeps the corpus tokenize/count to ONE scan instead of two
        .localCheckpoint(eager=True)
    )
    wtok = (
        sw.select("w")
        .distinct()
        .select(
            "w",
            F.size(bpe_apply_tokens(F.col("w"), _BPE_RULES)).cast("long").alias(
                "n_bpe"
            ),
        )
    )
    per_source = (
        sw.join(wtok, "w")
        .groupBy("source")
        .agg(
            F.sum("n_occ").alias("n_ws_tokens"),
            F.sum(F.col("n_occ") * F.col("n_bpe")).alias("n_bpe_tokens"),
        )
    )
    total = per_source.agg(F.sum("n_bpe_tokens").alias("tot"))
    return per_source.crossJoin(F.broadcast(total)).select(
        "source",
        "n_ws_tokens",
        "n_bpe_tokens",
        F.round(F.col("n_bpe_tokens") / F.col("tot"), 6).alias(
            "bpe_token_share"
        ),
    )


# ---------------------------------------------------------------------------
# image near-duplicate dedup (G8): the multimodal x dedup bridge


#: variant media ids live C above their original's doc_id
_IMG_VARIANT_OFFSET = 1_000_000_000
#: bound the decode workload: ~this many docs render regardless of SF
_IMG_SAMPLE_TARGET = 200


@register(
    "dedup_image_near",
    family="multimodal",
    doc="Image near-duplicate detection over REAL pixels (G8, r8): "
    "documents render to deterministic PNG 'visual fingerprints' "
    "(one bright dot per 3-gram shingle, so lexically-near docs "
    "yield visually-near images); every 5th sampled doc ALSO emits "
    "a resized + brightness-shifted RE-ENCODED variant (the G2 "
    "path). The detector dHash/aHashes decoded pixels (area-mean "
    "8x9/8x8 grids — resize/brightness invariant by construction), "
    "then joins candidates through 8-band 64-bit hamming LSH "
    "(lossless for hamming <= 7, pigeonhole) and verifies with "
    "exact bit_count — never all-pairs, the D4/D13 machinery "
    "generalized. Output: pairs at dhash hamming <= 6 with both "
    "hamming distances and the planted flag. Rows-only by design "
    "(no SQL engine decodes PNG); the planted goldens + a "
    "brute-force-equality pytest adjudicate correctness (the D4 "
    "pattern), and every planted re-encode MUST be caught — "
    "pytest-pinned.",
)
def dedup_image_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib as _hl

    import numpy as np
    import pandas as pd

    from timescaledb_event_streamer_spark.operators.dedup import (
        hamming_band_pairs,
    )
    from timescaledb_event_streamer_spark.operators.multimodal import (
        image_hashes,
    )

    docs = spread(load(spark, sf_dir, "documents"))
    m = docs.agg(
        F.greatest(
            F.floor(F.count(F.lit(1)) / _IMG_SAMPLE_TARGET), F.lit(1)
        )
        .cast("long")
        .alias("m")
    )
    # sample by TEXT hash so duplicate/near-dup groups stay together
    sample = (
        docs.crossJoin(F.broadcast(m))
        .filter(F.pmod(F.xxhash64("text"), F.col("m")) == 0)
        .select("doc_id", "text")
    )

    def render(batches):
        from timescaledb_event_streamer_spark.operators.png_codec import (
            png_encode,
        )

        def box3(a):
            p = np.pad(a, 1, mode="edge")
            return (
                sum(
                    p[r : r + a.shape[0], c : c + a.shape[1]]
                    for r in range(3)
                    for c in range(3)
                )
                / 9.0
            )

        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in str(text).split(" ") if t]
                # minhash-style SPARSE fingerprint: only the 10
                # smallest-hashed shingles render (near-dup texts
                # share their minimal shingles, saturation never
                # washes the image out), each as a 3x3 dot, blurred
                # and rounded ONCE at the 12-grid, then block-scaled
                # to 48x48 — so a box-downsampled variant carries
                # bit-identical cell content
                digs = sorted(
                    {
                        _hl.md5(" ".join(toks[i : i + 3]).encode()).digest()
                        for i in range(len(toks) - 2)
                    }
                )[:10]
                img = np.full((12, 12), 32.0)
                for d in digs:
                    img[d[0] % 12 : d[0] % 12 + 3, d[1] % 12 : d[1] % 12 + 3] = 224.0
                smooth = np.rint(box3(img))
                big = np.clip(np.kron(smooth, np.ones((4, 4))), 0, 255).astype(
                    np.uint8
                )
                ids.append(int(doc_id))
                payloads.append(png_encode(big))
                if doc_id % 5 == 0:
                    # the planted near-dup: 2x box-mean downsample
                    # (mass-preserving), brightness-shifted,
                    # re-encoded (decode->resize->encode, the G2
                    # path); every one of these MUST be caught —
                    # pytest-pinned
                    var = (
                        big.astype(np.float64)
                        .reshape(24, 2, 24, 2)
                        .mean(axis=(1, 3))
                        + 8.0
                    )
                    ids.append(int(doc_id) + _IMG_VARIANT_OFFSET)
                    payloads.append(
                        png_encode(np.clip(np.rint(var), 0, 255).astype(np.uint8))
                    )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = sample.mapInPandas(render, schema="media_id LONG, payload BINARY")
    hashes = image_hashes(media, decoder="real").localCheckpoint(eager=True)
    pairs = hamming_band_pairs(
        hashes, "dhash", id_col="media_id", n_bands=8, max_hamming=6
    )
    ah_a = hashes.select(
        F.col("media_id").alias("id_a"), F.col("ahash").alias("ah_a")
    )
    ah_b = hashes.select(
        F.col("media_id").alias("id_b"), F.col("ahash").alias("ah_b")
    )
    return (
        pairs.join(ah_a, "id_a")
        .join(ah_b, "id_b")
        .select(
            F.col("id_a").alias("media_a"),
            F.col("id_b").alias("media_b"),
            F.col("hamming").alias("dhash_hamming"),
            F.bit_count(F.col("ah_a").bitwiseXOR(F.col("ah_b"))).alias(
                "ahash_hamming"
            ),
            (F.col("id_b") - F.col("id_a") == _IMG_VARIANT_OFFSET).alias(
                "planted"
            ),
        )
        .orderBy("media_a", "media_b")
    )
