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


def _shifted_zip(arr: Column, k: int) -> Column:
    """arrays_zip of k shifted slices: element i holds (arr[i..i+k-1]) as a
    struct with fields "0".."k-1". The sliding-window backbone for both
    shingle builders. Collapse-safe BY CONSTRUCTION: the downstream
    transform's lambda touches only its own struct element, never the
    source array — so even when Catalyst inlines this expression into a
    consumer (a Generate input, a pushed-down filter), no per-element
    re-evaluation of the source subtree can occur. The earlier index-based
    formulation (transform over a position sequence with element_at/slice
    reads of the token array inside the lambda) went O(n^2) whenever the
    array ref was inlined — measured 3-6x the whole operator."""
    m = F.greatest(F.size(arr) - (k - 1), F.lit(0))
    return F.arrays_zip(*[F.slice(arr, j + 1, m) for j in range(k)])


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-token shingles (n-grams joined by single space), distinct, from a
    PRE-MATERIALIZED token array column (pass a column ref, not an inline
    tokens(...) expression — see _shifted_zip on inlining)."""
    n = F.size(toks)
    z = _shifted_zip(toks, k)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                z, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)])
            )
        )
    )


def hashed_tokens(toks: Column) -> Column:
    """One xxhash64 per token. Materialize the result as its OWN column
    before shingling (same discipline as the token array itself — a lambda
    body inlines its argument subtree, so an inline hash pass would re-run
    over the whole array per element)."""
    return F.transform(toks, lambda t: F.xxhash64(t))


def hashed_shingles_from_hashed_tokens(th: Column, k: int = 3) -> Column:
    """64-bit shingle KEYS without ever materializing shingle strings:
    combine each window of k token hashes (from a PRE-MATERIALIZED
    ``hashed_tokens`` column) with one native xxhash64(long, ..., long)
    call over a shifted-slice zip — no per-shingle string allocation, and
    the downstream explode/join/shuffle carries 8-byte keys instead of
    k-word strings. Native hash composition also sidesteps ANSI overflow
    (no arithmetic mixing). Distinct, like the string form. Production
    twin of ``shingles_from_tokens`` (the portable/oracle path)."""
    n = F.size(th)
    z = _shifted_zip(th, k)
    return F.when(n < k, F.array().cast("array<long>")).otherwise(
        F.array_distinct(
            F.transform(z, lambda s: F.xxhash64(*[s[str(j)] for j in range(k)]))
        )
    )


def shingles(col: Column, k: int = 3) -> Column:
    """Convenience wrapper: tokenize + shingle in one expression. For hot
    paths prefer ``withColumn("_toks", tokens(lower(col)))`` followed by
    ``shingles_from_tokens(F.col("_toks"), k)`` (see that docstring)."""
    return shingles_from_tokens(tokens(F.lower(col)), k)


# --- PII scan / redaction (training-data scrubbing surface) ----------------
# Patterns are deliberately portable across regex engines (Java regex in
# Spark, RE2 in DuckDB/Go): no backreferences, no lookaround, greedy
# quantifiers whose match set is identical under backtracking and NFA
# simulation. Keep them in sync with any external oracle verbatim.
EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RX = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RX = r"\+\d[\d ]{6,16}\d"  # up to ~15 digits + separators (E.164)
# 13-19 digits with optional single space/dash separators, word-bounded:
# any digit run longer than 19 fails the trailing \b in BOTH leftmost-first
# engines (Java backtracking and RE2 agree — no match, not a partial one)
CC_RX = r"\b\d(?:[ -]?\d){12,18}\b"
SSN_RX = r"\b\d{3}-\d{2}-\d{4}\b"  # US-style national id (structured)


def luhn_valid(cand: Column) -> Column:
    """Luhn checksum over a candidate string (separators allowed) as a
    pure Column expression, written the portable way — digit array +
    index aggregate — so an external SQL engine reproduces it verbatim:
    strip non-digits, reverse, double every 2nd digit (9-fold wrap), sum
    % 10 == 0. Everything runs on the (<=25 char) candidate itself, so
    the per-element inlining of nested lambda bodies stays O(len^2) on a
    tiny string — no outer-column recompute trap."""
    r = F.reverse(F.regexp_replace(cand, r"[^0-9]", ""))
    total = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length(r)),
            lambda i: F.when(
                i % 2 == 0,
                F.when(
                    F.substring(r, i, 1).cast("int") * 2 > 9,
                    F.substring(r, i, 1).cast("int") * 2 - 9,
                ).otherwise(F.substring(r, i, 1).cast("int") * 2),
            ).otherwise(F.substring(r, i, 1).cast("int")),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return total % 10 == 0


def pii_counts(col: Column) -> Column:
    """struct(n_email, n_ip, n_phone, n_ssn, n_cc) — per-document PII
    pattern counts, the scan half of a scrubbing pass (decide/sample/
    route on counts before paying for rewrites). n_cc counts only
    Luhn-VALID card-shaped candidates (shape alone false-positives on
    any long digit run); the redaction pass still scrubs every candidate
    conservatively."""
    return F.struct(
        F.regexp_count(col, F.lit(EMAIL_RX)).alias("n_email"),
        F.regexp_count(col, F.lit(IPV4_RX)).alias("n_ip"),
        F.regexp_count(col, F.lit(PHONE_RX)).alias("n_phone"),
        F.regexp_count(col, F.lit(SSN_RX)).alias("n_ssn"),
        F.size(
            F.filter(
                F.regexp_extract_all(col, F.lit(CC_RX), 0),
                lambda c: luhn_valid(c),
            )
        ).alias("n_cc"),
    )


def redact_pii(col: Column) -> Column:
    """Replace every email/IPv4/SSN/card-shaped/phone match with a typed
    placeholder. Order matters and is part of the contract (email first —
    addresses can embed digit runs; then IP; then SSN before CC — 9
    digits can never be a 13+-digit card but keep the typed tag; then
    card-shaped runs BEFORE phone so a 13+-digit sequence gets the <CC>
    tag; then phone) — external oracles must apply the same patterns in
    the same order. Card redaction is shape-based (no Luhn gate): a
    scrubbing pass must never keep a candidate because its checksum
    failed."""
    out = F.regexp_replace(col, EMAIL_RX, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RX, "<IP>")
    out = F.regexp_replace(out, SSN_RX, "<SSN>")
    out = F.regexp_replace(out, CC_RX, "<CC>")
    return F.regexp_replace(out, PHONE_RX, "<PHONE>")
