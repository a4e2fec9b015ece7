"""Approximate-nearest-neighbor search over embedding columns.

- brute_force_topk: exact cosine top-k — the correctness baseline. The
  scored cross product is map-side (queries broadcast); the top-k reduction
  uses the two-phase partial top-k from operators/windows.py so shuffle
  volume is O(partitions * k) per query, not O(corpus).
- lsh_topk: random-hyperplane LSH bucketing (deterministic seeded planes)
  restricts scoring to same-bucket candidates — the sub-linear scale path;
  recall < 1.0 by construction, multiprobe widens it.

At 100 TB the brute-force path stays viable only for small query batches
(cost = corpus scan per batch); the LSH path is the default for bulk
similarity joins (see also operators/dedup.py embedding_dups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine, dot, plane_matrix
from .windows import topk_per_group


def _score(corpus: DataFrame, queries: DataFrame,
           vec_col: str, id_col: str, q_id_col: str) -> DataFrame:
    q = queries.select(
        F.col(q_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    return (
        c.crossJoin(F.broadcast(q))
        .withColumn("cos", F.round(cosine(F.col("_cv"), F.col("_qv")), 4))
        .select("query_id", "neighbor_id", "cos")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector."""
    scored = _score(corpus, queries, vec_col, id_col, q_id_col)
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    return topk_per_group(
        scored, ["query_id"], "cos", k, ascending=False, tiebreak="neighbor_id"
    )


def hyperplane_bucket(vec, planes: list[list[float]]):
    """Deterministic hyperplane LSH bucket id: sign pattern of dot products
    against md5-seeded ±1 LITERAL planes (similarity.plane_matrix) — zero
    per-row hash cost, reproducible in any engine."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(s) for s in plane])
        bucket = bucket + F.when(
            dot(vec, lit_plane) >= 0, F.lit(2 ** p)
        ).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "vec_id",
    n_planes: int = 8,
    dim: int = 64,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: only same-LSH-bucket candidates are scored.

    Equi-join on bucket replaces the cross join — at scale this is a
    shuffle join on a low-cardinality key with ~corpus/2^planes candidates
    per query.
    """
    planes = plane_matrix(n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).withColumn("bucket", hyperplane_bucket(F.col("_cv"), planes))
    q = queries.select(
        F.col(q_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("bucket", hyperplane_bucket(F.col("_qv"), planes))
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .withColumn("cos", F.round(cosine(F.col("_cv"), F.col("_qv")), 4))
        .select("query_id", "neighbor_id", "cos")
    )
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    return topk_per_group(
        scored, ["query_id"], "cos", k, ascending=False, tiebreak="neighbor_id"
    )
