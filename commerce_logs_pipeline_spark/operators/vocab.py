"""Corpus vocabulary statistics: document frequency and per-document
TF-IDF top terms — the lexical-analysis layer of the training-data family
(language-id and quality scoring live in functions/text.py; this module
adds the corpus-global term view).

The reference's analysis CLI stops at field-frequency profiling over JSON
paths (cli/scripts/explore_raw_logs.py:480-555); term-level corpus
statistics are the text-corpus analog.

Scale posture:
- one explode of per-doc DISTINCT terms feeds document frequency (the
  (term, doc) universe collapses map-side before the term shuffle);
- term frequency is a (doc, term) hash agg over the same exploded scan —
  Spark reuses one shuffle per agg, sized by corpus token count, the same
  budget as the dedup shingle pass (operators/dedup.py);
- the corpus doc count N is a driver scalar (one count job) embedded as a
  literal — never a row-space crossJoin;
- top-k per doc delegates to operators/windows.topk_per_group.

TF-IDF uses the smoothed textbook form tf * (ln((N+1)/(df+1)) + 1),
rounded to 6 dp before ranking so rank order (with the term-asc tiebreak)
is reproducible across engines from the same doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens
from .windows import topk_per_group


def _doc_terms(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("_toks"),
    ).select("doc_id", F.explode("_toks").alias("term"))


def doc_frequency(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, df_count) — number of distinct documents containing each
    term. Exploding ``array_distinct`` of the token array (instead of
    distinct-ing the exploded rows) removes within-doc repeats before the
    explode, so the shuffle carries each (doc, term) once."""
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(tokens(F.lower(F.col(text_col))))
        ).alias("term"),
    )
    return per_doc.groupBy("term").agg(F.count("*").alias("df_count"))


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF:
    ``round(tf * (ln((N+1)/(df+1)) + 1), 6)``, rank ties broken by term
    ascending. Returns (doc_id, rank, term, tf, tfidf)."""
    n_docs = docs.count()  # driver scalar, embedded as a literal below
    tf = (
        _doc_terms(docs, text_col, id_col)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # ONE corpus scan (r6): df is derivable from the TF frame for free —
    # tf holds exactly one row per (doc, term), so tf.groupBy(term).count()
    # IS the distinct-doc count. The second tokenize+explode pass
    # (doc_frequency) re-scanned the most expensive column (text) for the
    # same number. tf is materialized (eager localCheckpoint — exchange
    # reuse between the two consumers was measured NOT to fire under AQE
    # here) so text is scanned+tokenized exactly once and both consumers
    # read the narrow (doc_id, term, tf) rows. Trade-off: a lost executor
    # loses checkpoint blocks (no lineage) — at cluster scale prefer a
    # reliable checkpoint dir or accept the rerun, both cheaper than
    # re-tokenizing the text corpus per consumer.
    tf = tf.localCheckpoint(eager=True)
    df_counts = tf.groupBy("term").agg(F.count("*").alias("df_count"))
    scored = tf.join(df_counts, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf")
            * (F.log((F.lit(n_docs) + 1.0) / (F.col("df_count") + 1.0)) + 1.0),
            6,
        ).alias("tfidf"),
    )
    top = topk_per_group(
        scored, ["doc_id"], "tfidf", k, ascending=False, tiebreak="term"
    )
    w_rank = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    )
    return top.select("doc_id", w_rank.alias("rank"), "term", "tf", "tfidf")


def build_vocab(
    docs: DataFrame,
    size: int = 32768,
    text_col: str = "text",
    id_col: str = "doc_id",
    reserved: int = 1,
) -> DataFrame:
    """Frequency-ranked token vocabulary: the ``size`` most frequent
    terms, ids assigned by (count desc, term asc) so the mapping is
    deterministic for a given corpus. Ids start at ``reserved`` (0 stays
    free for <unk> by default). Returns (term, token_id, n_occurrences).

    One token-count shuffle + one global top-k; the ranking window runs
    over at most ``size``-bounded survivors via a two-phase count
    (partial per-partition counts combine map-side)."""
    counts = (
        _doc_terms(docs, text_col, id_col)
        .groupBy("term")
        .agg(F.count("*").alias("n_occurrences"))
    )
    ranked = (
        counts.orderBy(F.desc("n_occurrences"), F.asc("term"))
        .limit(size)
        .withColumn(
            "token_id",
            F.row_number().over(
                Window.orderBy(F.desc("n_occurrences"), F.asc("term"))
            )
            + F.lit(reserved - 1),
        )
    )
    return ranked.select("term", "token_id", "n_occurrences")


def encode_docs(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = 0,
) -> DataFrame:
    """Encode each document's token stream into vocabulary ids — the
    tokenize step between packing (operators/packing.py) and batch
    writing. Out-of-vocabulary terms map to ``unk_id``.

    Shape: posexplode the token array, broadcast-join the vocab (a
    training vocabulary is broadcast-sized by construction: 32k-256k
    short strings), then rebuild the sequence with an order-preserving
    collect over (pos, id) structs. The per-token rows never carry text
    beyond the term itself, and the rebuild shuffle is keyed by doc —
    uniform, token-count-proportional, no skew beyond document length.

    Returns (doc_id, n_tokens, token_ids array<int>). A document whose
    text tokenizes to zero tokens (empty/whitespace/null text) is KEPT
    as (doc_id, 0, []): ``posexplode_outer`` emits one null-pos row for
    the empty array, the aggregate counts only non-null positions, and
    the collect skips the null sentinel — so the output spine equals the
    input spine with no extra join.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(
            tokens(F.lower(F.col(text_col)))
        ).alias("pos", "term"),
    )
    mapped = toks.join(F.broadcast(vocab.select("term", "token_id")),
                       "term", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("token_id"), F.lit(unk_id)).cast("int").alias("tid"),
    )
    # collect_list drops null ENTRIES (not null fields), so wrapping the
    # struct in when(pos is not null) excludes the empty-doc sentinel row
    seq = F.array_sort(
        F.collect_list(
            F.when(F.col("pos").isNotNull(), F.struct("pos", "tid"))
        )
    )
    return (
        mapped.groupBy("doc_id")
        .agg(seq.alias("_seq"), F.count("pos").alias("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            F.transform("_seq", lambda s: s["tid"]).alias("token_ids"),
        )
    )
