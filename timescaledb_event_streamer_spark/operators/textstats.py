"""Text-analysis operators for training-data pipelines (SURVEY.md
§2.F): language-ID heuristic, quality scoring, token counting,
document fingerprinting.

All pure JVM column expressions (regexp_count / higher-order array
functions) — whole-stage codegen end to end, no Python in the row
path, so these scan-shaped ops run at parquet speed at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# English function words as the language-ID signal (the classic
# stopword-profile heuristic; fancier n-gram profiles slot in the
# same way).
STOPWORD_RE = r"\b(the|a|of|and|in|to|is)\b"
WS_TOKEN_RE = r"\S+"
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^A-Za-z0-9\s]"
SHINGLE_WIDTH = 5


def round_stable6(col: Column) -> Column:
    """Engine-stable 6-decimal rounding: floor(x*1e6 + 0.5)/1e6 in
    IEEE doubles. Spark's round() goes through an exact BigDecimal
    expansion while DuckDB's uses C float math, and the two disagree
    on which side of a decimal midpoint a binary double lies (seen at
    sf0.1: 16/5000 quality scores off in the last digit, in both
    directions). This expression performs the same double ops on both
    engines, so identical inputs give bit-identical results. The
    matching SQL fragment is floor((x) * 1000000.0 + 0.5) / 1000000.0."""
    return F.floor(col * 1000000.0 + F.lit(0.5)) / 1000000.0


def n_tokens_ws(text: Column) -> Column:
    return F.regexp_count(text, F.lit(WS_TOKEN_RE)).cast("long")


def n_tokens_bpe(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("long")


def stopword_ratio(text: Column) -> Column:
    return round_stable6(
        F.regexp_count(text, F.lit(STOPWORD_RE)) / F.greatest(n_tokens_ws(text), F.lit(1))
    )


def punct_ratio(text: Column) -> Column:
    return round_stable6(
        F.regexp_count(text, F.lit(PUNCT_RE)) / F.greatest(F.length(text), F.lit(1))
    )


def lang_pred(text: Column, threshold: float = 0.05) -> Column:
    """Stopword-profile language ID: English iff the function-word
    ratio clears the threshold."""
    return F.when(stopword_ratio(text) >= threshold, F.lit("en")).otherwise(F.lit("other"))


def quality_score(text: Column, n_chars: Column) -> Column:
    """Composite [0,1] quality: stopword signal + length credit -
    punctuation-noise penalty (the usual pre-training filter shape)."""
    len_credit = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    return round_stable6(
        F.lit(0.5) * stopword_ratio(text)
        + F.lit(0.4) * len_credit
        - F.lit(0.1) * punct_ratio(text)
    )


def shingles(text: Column, width: int = SHINGLE_WIDTH, distinct: bool = True) -> Column:
    """Word 5-gram shingles as an array column (input to
    fingerprinting / MinHash / Jaccard). ``distinct=False`` skips the
    quadratic array_distinct — correct for any min-over-shingles
    consumer (MinHash, fingerprint), where duplicates can't change
    the minimum; Jaccard set arithmetic needs the distinct form.

    Documents with fewer than ``width`` tokens yield an empty shingle
    set (a descending F.sequence would otherwise produce negative
    slice starts and crash at runtime)."""
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(0), F.size(toks) - width)
    grams = F.when(
        F.size(toks) >= width,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, width))),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams) if distinct else grams


def fingerprint(text: Column) -> Column:
    """Rolling-hash document fingerprint: min md5 over word-5-gram
    shingles (a 1-permutation MinHash; stable under reordering of
    identical content windows)."""
    return F.array_min(
        F.transform(shingles(text, distinct=False), lambda s: F.md5(s))
    )
