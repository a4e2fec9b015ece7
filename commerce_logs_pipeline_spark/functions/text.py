"""Text-analysis functions for large-scale training-data pipelines:
token counting, language ID, quality scoring, document fingerprinting,
shingling. All pure Column expressions (JVM codegen, no Python in the hot
path) and each designed to be expressible in ANSI SQL for oracle parity.

These extend the reference's CLI analysis surface
(/root/reference/cli/scripts/explore_raw_logs.py:480-555 rollups) with the
document-level operations a 100 TB corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword marker sets for the n-gram/stopword language
# heuristic. Deterministic + SQL-expressible (no model, no external data).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "los", "que", "de"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "est"],
}

STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
]


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text; empty string -> empty array."""
    t = F.regexp_replace(F.regexp_replace(col, r"^\s+", ""), r"\s+$", "")
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish token estimate: count word/number/punct pieces with a regex
    (the classic 'GPT-2-ish' pre-tokenizer shape, public knowledge)."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"(\w+|[^\w\s])"), 0)
    )


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """fraction of characters that are punctuation (quality signal)."""
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(F.length(col) > 0, n_punct / F.length(col)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = tokens(F.lower(col))
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_sw / F.size(toks)).otherwise(F.lit(0.0))


def mean_word_length(col: Column) -> Column:
    toks = tokens(col)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t).cast("long")) / F.size(toks),
    ).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1]: length band + low punct + some
    stopwords (the standard cheap pretraining-quality heuristics)."""
    n = token_count(col)
    len_ok = F.when((n >= 10) & (n <= 100_000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) < 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    sw_ok = F.when(stopword_ratio(col) > 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    return len_ok + punct_ok + sw_ok


LANG_PRIORITY = ["en", "es", "de", "fr"]  # deterministic tie-break order


def lang_marker_score(col: Column, lang: str) -> Column:
    marr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(
        F.filter(tokens(F.lower(col)), lambda t: F.array_contains(marr, t))
    )


def lang_id(col: Column) -> Column:
    """Stopword-marker language heuristic: most marker hits wins; ties
    break by LANG_PRIORITY; zero hits -> 'und'. Deterministic and exactly
    SQL-portable (greatest + CASE chain)."""
    scores = {lang: lang_marker_score(col, lang) for lang in LANG_PRIORITY}
    m = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        out = F.when(scores[lang] == m, F.lit(lang)).otherwise(out)
    return F.when(m == 0, F.lit("und")).otherwise(out)


def fingerprint(col: Column) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the
    whitespace-normalized, lowercased text (rolling-hash analog; used for
    exact dedup groups). U5 deterministic-ID discipline
    (docs/trace-model.md:50-57): no randomness, replay-stable."""
    normalized = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.xxhash64(normalized)


def content_md5(col: Column) -> Column:
    """Portable content hash (md5 hex) — identical in DuckDB for oracles."""
    normalized = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.md5(normalized)


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-token shingles (n-grams joined by single space), distinct, from a
    PRE-MATERIALIZED token array column.

    Pass a real column reference, not an inline ``tokens(...)`` expression:
    a lambda body inlines its argument subtree and re-evaluates it per
    element — an inline tokenizer would re-run the regex split once per
    shingle (measured 8x slower over a 5k-doc corpus).
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
            )
        )
    )


def shingles(col: Column, k: int = 3) -> Column:
    """Convenience wrapper: tokenize + shingle in one expression. For hot
    paths prefer ``withColumn("_toks", tokens(lower(col)))`` followed by
    ``shingles_from_tokens(F.col("_toks"), k)`` (see that docstring)."""
    return shingles_from_tokens(tokens(F.lower(col)), k)
