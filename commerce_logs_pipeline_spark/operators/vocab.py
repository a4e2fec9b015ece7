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
    scored = tf.join(doc_frequency(docs, text_col, id_col), "term").select(
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
