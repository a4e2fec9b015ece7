"""Corpus-curation operators beyond dedup: intra-document repetition
metrics (the Gopher/MassiveText repetition-filter family) and benchmark
n-gram decontamination (the GPT-3/PaLM 13-gram overlap protocol).

The reference has no training-data curation surface (its analysis CLI
stops at rollups, cli/scripts/explore_raw_logs.py:480-555); these are the
Spark-native operators a 100 TB pretraining pipeline needs on top of the
dedup family (operators/dedup.py).

Scale posture, both operators:
- n-gram universes are built with the shifted-slice zip backbone
  (functions/text._shifted_zip) — collapse-safe pure Column expressions,
  no Python in the hot path;
- the exploded gram table carries 8-byte xxhash64 keys (production
  default), never gram strings, so the shuffle moves ~#tokens x 8 bytes;
- repetition needs one (doc, gram) hash-aggregate (map-side partial
  collapses repeated grams before the shuffle) + one per-doc rollup;
- decontamination broadcasts the benchmark gram set (benchmarks are
  KB-MB vs TB corpora) so the corpus side is a map-only semi/left probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import _shifted_zip, tokens


def ngram_occurrences(toks: Column, k: int, hashed: bool = True) -> Column:
    """NON-distinct k-token gram occurrences from a pre-materialized token
    array column (pass a column ref — a lambda body inlines its argument
    subtree, see _shifted_zip). hashed=True emits one xxhash64 per window
    (8-byte keys, no per-gram string allocation — the production path);
    hashed=False emits space-joined gram strings (the portable/oracle
    twin; counts are identical under either representation because both
    preserve gram equality classes)."""
    n = F.size(toks)
    z = _shifted_zip(toks, k)
    if hashed:
        gram = lambda s: F.xxhash64(*[s[str(j)] for j in range(k)])  # noqa: E731
        empty = F.array().cast("array<long>")
    else:
        gram = lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)])  # noqa: E731
        empty = F.array().cast("array<string>")
    return F.when(n < k, empty).otherwise(F.transform(z, gram))


def repetition_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    hashed: bool = True,
) -> DataFrame:
    """Per-document repetition metrics (Gopher table A1 family):

    - ``total_ngrams``: number of n-gram slots (len(tokens) - n + 1);
    - ``top_ngram_count``: occurrences of the single most frequent n-gram;
    - ``dup_ngram_occurrences``: occurrences belonging to any n-gram seen
      more than once in the doc;
    - ``top_ngram_frac`` / ``dup_ngram_frac``: the two as fractions of
      total slots (6 dp) — the values MassiveText-style filters threshold
      on (e.g. drop when dup_ngram_frac(3) > 0.18).

    Documents shorter than n tokens are kept with zero counts
    (explode_outer + conditional aggregates — no join-back pass).

    Plan: materialized token/gram columns -> explode_outer ->
    groupBy(id, gram) with map-side partial -> groupBy(id). Two shuffles,
    both on hashed keys; gram rows ~= corpus token count.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("_toks"),
    )
    grams = toks.select(
        "doc_id", F.explode_outer(ngram_occurrences(F.col("_toks"), n, hashed)).alias("g")
    )
    counts = grams.groupBy("doc_id", "g").agg(
        F.count(F.col("g")).alias("c")  # count(col) skips the null of explode_outer
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("total_ngrams"),
        F.max("c").alias("top_ngram_count"),
        F.coalesce(
            F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
        ).alias("dup_ngram_occurrences"),
    )
    nz = F.col("total_ngrams") > 0
    return per_doc.select(
        "doc_id",
        "total_ngrams",
        "top_ngram_count",
        "dup_ngram_occurrences",
        F.when(nz, F.round(F.col("top_ngram_count") / F.col("total_ngrams"), 6))
        .otherwise(F.lit(0.0))
        .alias("top_ngram_frac"),
        F.when(nz, F.round(F.col("dup_ngram_occurrences") / F.col("total_ngrams"), 6))
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_frac"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
    hashed: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, how many of its
    distinct n-token grams appear anywhere in the benchmark corpus, plus
    a ``contaminated`` flag (>=1 hit) — the published 13-gram overlap
    protocol for scrubbing eval sets out of training data.

    The benchmark gram set is deduped and EXPLICITLY broadcast: eval sets
    are small by construction, so the corpus-side probe is map-only (no
    corpus shuffle before the per-doc count). Documents with no hit (or
    shorter than n tokens) are kept with matched_ngrams = 0 via the left
    join of per-doc hit counts back onto the id spine; that join shuffles
    only (id, count) pairs, never text.
    """
    bench_grams = (
        benchmark.select(
            tokens(F.lower(F.col(bench_text_col))).alias("_toks")
        )
        .select(F.explode(ngram_occurrences(F.col("_toks"), n, hashed)).alias("g"))
        .distinct()
    )
    doc_grams = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            tokens(F.lower(F.col(text_col))).alias("_toks"),
        )
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(ngram_occurrences(F.col("_toks"), n, hashed))
            ).alias("g"),
        )
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("matched_ngrams"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("matched_ngrams"), F.lit(0)).alias("matched_ngrams"),
            (F.coalesce(F.col("matched_ngrams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
