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
