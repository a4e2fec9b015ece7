"""Approximate-nearest-neighbor search over embedding columns.

- brute_force_topk: exact cosine top-k — the correctness baseline. The
  scored cross product is map-side (queries broadcast); the top-k reduction
  uses the two-phase partial top-k from operators/windows.py so shuffle
  volume is O(partitions * k) per query, not O(corpus).
- lsh_topk: random-hyperplane LSH bucketing (deterministic seeded planes)
  restricts scoring to same-bucket candidates — the sub-linear scale path;
  recall < 1.0 by construction. ``probes`` > 0 turns on multiprobe: each
  query also probes the buckets reached by flipping its weakest
  (smallest-margin) plane bits, lifting recall toward exact at
  (probes+1)x candidate cost with the same plan shape.
- ivf_topk: IVF(flat) — a coarse quantizer assigns corpus vectors to
  centroid cells (inverted lists); queries score only their nprobe
  nearest cells. Data-adaptive where hyperplanes are oblivious.
- recall_at_k: measured approximation quality — per-query overlap of an
  approximate top-k with the exact one.

At 100 TB the brute-force path stays viable only for small query batches
(cost = corpus scan per batch); the LSH path is the default for bulk
similarity joins (see also operators/dedup.py embedding_dups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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


def query_probe_buckets(vec, planes: list[list[float]], probes: int):
    """Array of LSH buckets a query should probe: its own bucket first,
    then the buckets reached by flipping each of the ``probes`` weakest
    plane bits (smallest |margin| = the plane the vector most nearly
    straddles — the classic multiprobe heuristic). Margins are rounded to
    6 dp before ranking so the probe order is reproducible bit-for-bit in
    an external SQL oracle (double ULP noise cannot flip an argmin at
    1e-6 granularity; the ordering itself is physically meaningless at
    that scale). Ties break on the plane bit, matching array_sort struct
    ordering."""
    margins = [
        F.round(F.abs(dot(vec, F.array(*[F.lit(s) for s in plane]))), 6)
        for plane in planes
    ]
    base = hyperplane_bucket(vec, planes)
    if probes <= 0:
        return F.array(base)
    ranked = F.array_sort(
        F.array(*[
            F.struct(m.alias("m"), F.lit(2 ** p).alias("bit"))
            for p, m in enumerate(margins)
        ])
    )
    flips = F.slice(ranked, 1, probes)
    return F.concat(
        F.array(base),
        F.transform(flips, lambda s: base.bitwiseXOR(s["bit"])),
    )


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
    probes: int = 0,
) -> DataFrame:
    """Approximate top-k: only same-LSH-bucket candidates are scored.

    Equi-join on bucket replaces the cross join — at scale this is a
    shuffle join on a low-cardinality key with ~corpus/2^planes candidates
    per query. ``probes`` > 0 explodes each query into its multiprobe
    bucket set (query side only — the corpus keeps ONE bucket per vector,
    so the index size is unchanged); candidates reached through several
    probes are deduped before scoring.
    """
    planes = plane_matrix(n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).withColumn("bucket", hyperplane_bucket(F.col("_cv"), planes))
    q = queries.select(
        F.col(q_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    if probes <= 0:
        # no Generate in the single-probe plan (the r4 explode-of-a-
        # 1-element-array shape measured ~+0.3 s of fixed overhead at
        # sf0.1 — BENCH/NOTES.md r5 adjudication)
        q = q.withColumn("bucket", hyperplane_bucket(F.col("_qv"), planes))
    else:
        # withColumn (not inline-in-explode): the probe array is an
        # expensive multi-ref intermediate, which CollapseProject leaves
        # materialized instead of re-inlining into the Generate
        q = (
            q.withColumn(
                "_probes", query_probe_buckets(F.col("_qv"), planes, probes)
            )
            .withColumn("bucket", F.explode("_probes"))
            .drop("_probes")
        )
    cand = c.join(F.broadcast(q), on="bucket")
    if probes > 0:
        # a neighbor reachable through several probe buckets scores once
        cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.withColumn(
        "cos", F.round(cosine(F.col("_cv"), F.col("_qv")), 4)
    ).select("query_id", "neighbor_id", "cos")
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    return topk_per_group(
        scored, ["query_id"], "cos", k, ascending=False, tiebreak="neighbor_id"
    )


def sq_dist(a, b):
    """Squared L2 via the dot-product identity |a-b|^2 =
    (a.a - 2 a.b) + b.b — written EXACTLY this way (left-assoc) so an
    external SQL oracle using the same identity over the same doubles
    reproduces it bit-for-bit."""
    return dot(a, a) - F.lit(2.0) * dot(a, b) + dot(b, b)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "vec_id",
    n_cells: int = 16,
    nprobe: int = 2,
    exclude_self: bool = True,
    centroids: list[tuple[int, list[float]]] | None = None,
    use_numpy: bool = True,
) -> DataFrame:
    """IVF(flat) approximate top-k: a coarse quantizer assigns every
    corpus vector to its nearest centroid CELL (the inverted lists);
    each query scores only the vectors in its ``nprobe`` nearest cells.
    The other scale path next to hyperplane LSH (lsh_topk): cells adapt
    to the data distribution where hyperplanes are oblivious, at the
    cost of a quantizer.

    ``centroids`` defaults to the corpus vectors with the n_cells
    smallest ids — a deterministic data-sampled quantizer with no Lloyd
    refinement (at real scale the quantizer is trained offline once and
    passed in; the plan shape is identical). Distances round to 6 dp
    before ranking (same cross-engine argmin discipline as
    query_probe_buckets).

    Quantizer-size scaling: the Column path embeds centroids as plan
    LITERALS (pure Column assignment, zero extra shuffle) — right for
    the small quantizers an external SQL oracle can re-derive, wrong
    past a few hundred cells (expression/codegen size grows with
    n_cells). The numpy path ships the centroid matrix inside the UDF
    closure instead, so it scales to the 4k-64k-cell quantizers a real
    100 TB corpus wants — use_numpy=True is the production default
    posture, the Column twin exists for bit-exact oracle checks.
    """
    if centroids is None:
        rows = (
            corpus.select(id_col, vec_col).orderBy(id_col).limit(n_cells)
            .collect()
        )
        centroids = [(i, list(r[vec_col])) for i, r in enumerate(rows)]

    if use_numpy:
        # production path: Arrow-batched numpy assignment — one
        # (batch x dim) @ (dim x cells) matmul per Arrow batch instead of
        # n_cells interpreted higher-order dots per row (~10x at 64 dims
        # x 16 cells). Distance VALUES can differ from the Column path in
        # the last ulp (BLAS blocked summation), so the oracle-checked
        # portable twin stays the Column path — same twin discipline as
        # dedup's hash_shingles.
        C = np.array([c for _, c in centroids], dtype=np.float64)
        cc = (C * C).sum(axis=1)

        def _d2(s):
            M = np.stack(s.to_numpy())
            d2 = ((M * M).sum(1)[:, None] - 2.0 * (M @ C.T)) + cc[None, :]
            # same 6 dp ranking granularity + stable cell-asc tie-break
            # as the Column twin, so both paths probe identical cells.
            # HALF_UP like F.round (np.round is half-to-even, which could
            # rank a distance landing exactly on a representable .5 at
            # 1e-6 granularity differently across the two paths)
            return np.floor(d2 * 1e6 + 0.5) / 1e6

        @pandas_udf("int")
        def nearest_cell(s: pd.Series) -> pd.Series:
            return pd.Series(_d2(s).argmin(1).astype("int32"))

        @pandas_udf("array<int>")
        def probe_cells(s: pd.Series) -> pd.Series:
            order = np.argsort(_d2(s), axis=1, kind="stable")[:, :nprobe]
            return pd.Series(list(order.astype("int32")))

        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
        ).withColumn("cell", nearest_cell(F.col("_cv")))
        q = (
            queries.select(
                F.col(q_id_col).alias("query_id"),
                F.col(vec_col).alias("_qv"),
            )
            .withColumn("cell", F.explode(probe_cells(F.col("_qv"))))
        )
        cand = c.join(F.broadcast(q), on="cell")
        scored = cand.withColumn(
            "cos", F.round(cosine(F.col("_cv"), F.col("_qv")), 4)
        ).select("query_id", "neighbor_id", "cos")
        if exclude_self:
            scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
        return topk_per_group(
            scored, ["query_id"], "cos", k, ascending=False,
            tiebreak="neighbor_id",
        )

    def ranked_cells(vec):
        # (v.v - 2 v.c) + c.c with c.c PRE-FOLDED in Python (a per-row
        # interpreted 64-element aggregate per centroid otherwise —
        # measured ~2x assignment cost); Python's in-order sum is the
        # same left-assoc summation as the engines' dot products, so the
        # value is bit-identical to computing it in-plan
        vv = dot(vec, vec)
        return F.array_sort(
            F.array(*[
                F.struct(
                    F.round(
                        vv
                        - F.lit(2.0)
                          * dot(vec, F.array(*[F.lit(x) for x in cvec]))
                        + F.lit(float(sum(x * x for x in cvec))),
                        6,
                    ).alias("d"),
                    F.lit(ci).alias("cell"),
                )
                for ci, cvec in centroids
            ])
        )

    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
        )
        .withColumn("_rc", ranked_cells(F.col("_cv")))
        .withColumn("cell", F.col("_rc")[0]["cell"])
        .drop("_rc")
    )
    q = (
        queries.select(
            F.col(q_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
        .withColumn("_rc", F.slice(ranked_cells(F.col("_qv")), 1, nprobe))
        .withColumn("cell", F.explode(F.transform("_rc", lambda s: s["cell"])))
        .drop("_rc")
    )
    cand = c.join(F.broadcast(q), on="cell")
    scored = cand.withColumn(
        "cos", F.round(cosine(F.col("_cv"), F.col("_qv")), 4)
    ).select("query_id", "neighbor_id", "cos")
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    return topk_per_group(
        scored, ["query_id"], "cos", k, ascending=False, tiebreak="neighbor_id"
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iterations: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init: list[tuple[int, list[float]]] | None = None,
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd refinement for the IVF coarse quantizer —
    turns ivf_topk's deterministic data-sampled centroids into trained
    ones (lower quantization error => higher recall at equal nprobe).

    Each iteration is ONE distributed job: an Arrow ``mapInPandas`` pass
    does the numpy matmul assignment (centroid matrix in the closure —
    same kernel as ivf_topk's production path) AND accumulates the
    per-cell (count, per-dimension sum) partials across every batch of
    its task, emitting at most n_cells rows per TASK (r6; previously the
    per-row cell ids crossed back into the JVM and a 64-column hash
    aggregate reduced them — the JVM re-walked every vector element via
    element_at and the plan carried dim SUM expressions, seconds of
    analysis+codegen per iteration). The driver merges the task partials
    (tasks x n_cells rows — metadata-sized, same class as the existing
    centroid collects) and never holds more than the n_cells x dim
    matrix. Empty cells keep their previous centroid (standard Lloyd
    convention).

    Deterministic init and assignment: init defaults to the same
    n_cells-smallest-id sample ivf_topk uses and ties break on the lower
    cell id (argmin). Per-cell sums are floating-point adds whose order
    follows task/batch order — exactly as order-undefined as the prior
    JVM hash aggregate (double addition was never associative-stable
    across partitionings in either form).
    Intended use at scale: train once offline on a sample or the full
    corpus, persist the centroid list, pass it to ivf_topk(centroids=).
    """
    from collections.abc import Iterator

    if init is None:
        rows = (
            corpus.select(id_col, vec_col).orderBy(id_col).limit(n_cells)
            .collect()
        )
        C = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    else:
        C = np.array([c for _, c in init], dtype=np.float64)
    dim = C.shape[1]
    n = len(C)
    vecs = corpus.select(F.col(vec_col).alias("_v"))
    schema = "cell int, n long, sums array<double>"
    for _ in range(iterations):
        Cb, cc = C, (C * C).sum(axis=1)

        def partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            counts = np.zeros(n, dtype=np.int64)
            sums = np.zeros((n, dim), dtype=np.float64)
            for pdf in it:
                M = np.stack(pdf["_v"].to_numpy())
                d2 = (M * M).sum(1)[:, None] - 2.0 * (M @ Cb.T) + cc[None, :]
                cells = d2.argmin(1)
                counts += np.bincount(cells, minlength=n)
                np.add.at(sums, cells, M)
            hit = np.flatnonzero(counts)
            yield pd.DataFrame(
                {
                    "cell": hit.astype("int32"),
                    "n": counts[hit],
                    "sums": [sums[i] for i in hit],
                }
            )

        stats = vecs.mapInPandas(partials, schema).collect()
        counts = np.zeros(n, dtype=np.int64)
        sums = np.zeros((n, dim), dtype=np.float64)
        for r in stats:
            counts[r["cell"]] += r["n"]
            sums[r["cell"]] += np.asarray(r["sums"])
        C = C.copy()
        for i in np.flatnonzero(counts):
            C[i] = sums[i] / counts[i]
    return [(i, [float(x) for x in C[i]]) for i in range(len(C))]


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Measured approximation quality: per-query |approx ∩ exact| /
    |exact| over two top-k result frames (columns query_id, neighbor_id).
    One broadcast-sized join — both inputs are O(queries * k)."""
    a = approx.select("query_id", "neighbor_id")
    e = exact.select("query_id", "neighbor_id")
    hits = (
        a.join(e, on=["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        e.groupBy("query_id")
        .agg(F.count("*").alias("n_exact"))
        .join(hits, on="query_id", how="left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)) / F.col("n_exact"), 4
            ).alias("recall"),
        )
    )
