"""Deduplication operators for training-data pipelines.

Five strategies, each with a distinct scale/recall profile:

- exact_dedup: hash-groupBy on a normalized content hash. One shuffle on
  the hash; at 100 TB this is the cheapest full-corpus pass.
- ngram_jaccard_pairs: exact Jaccard over shingle sets via an
  explode->self-join-on-shingle->count inverted-index plan (only documents
  sharing at least one shingle are ever paired — no cross join).
- minhash_lsh_pairs: MinHash signatures banded into LSH buckets; candidate
  pairs from bucket joins, optionally verified with exact Jaccard. The
  standard sub-quadratic near-dup plan (Broder; see PAPERS.md).
- simhash_dups: 64-bit SimHash; near-dups = pairs within hamming distance d,
  found by banding the fingerprint into 4 x 16-bit blocks (pigeonhole: any
  pair with d<=3 shares at least one exact block).
- embedding_dups: cosine-similar pairs over embedding vectors (see also
  operators/ann.py for top-k search).

Scale notes: every strategy avoids O(n^2): inverted index / LSH buckets /
block keys bound the candidate set. Bucket-join skew (a hot shingle shared
by everything) is capped with a max-bucket-size filter, the same hot-key
discipline as operators/skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import (
    hamming64,
    minhash_signature,
    portable_hash64,
    simhash64,
)
from ..functions.text import content_md5, shingles, tokens


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id representative of each exact (normalized) text.

    groupBy on content hash -> min(id): one shuffle, fully parallel,
    skew-free (hash keys are uniform).
    """
    h = content_md5(F.col(text_col))
    return (
        df.withColumn("_h", h)
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("_h").orderBy(id_col)),
        )
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(content_hash, n_dups, keep_id) for groups with >1 member."""
    return (
        df.withColumn("content_hash", content_md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard >= threshold pairs via shingle inverted index.

    Plan: explode shingles -> (shingle -> [ids]) -> self-join on shingle
    -> count common shingles per pair -> jaccard = common/(|A|+|B|-common).
    Only pairs sharing >=1 shingle are materialized. ``max_bucket`` drops
    degenerate ubiquitous shingles (stopword-like), the skew guard.
    """
    sh = (
        df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
        .filter(F.col("n_sh") > 0)
    )
    exploded = sh.select("id", "n_sh", F.explode("sh").alias("shingle"))
    # skew guard: drop shingles present in too many docs
    bucket_sizes = exploded.groupBy("shingle").agg(F.count("*").alias("bn"))
    exploded = exploded.join(
        bucket_sizes.filter(F.col("bn") <= max_bucket).select("shingle"),
        on="shingle",
    )
    a = exploded.select(
        F.col("shingle"),
        F.col("id").alias("id_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = exploded.select(
        F.col("shingle"),
        F.col("id").alias("id_b"),
        F.col("n_sh").alias("n_b"),
    )
    pairs = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("common"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("n_a") + F.col("n_b") - F.col("common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float | None = 0.7,
    max_bucket: int = 200,
) -> DataFrame:
    """MinHash+LSH candidate pairs (optionally verified with exact Jaccard).

    signature(16 hashes) -> 4 bands x 4 rows -> band-hash buckets ->
    self-join within buckets. Sub-quadratic: cost ~ sum over buckets of
    bucket^2, bounded by ``max_bucket``.
    """
    rows_per_band = n_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), k).alias("sh"),
    ).filter(F.size("sh") > 0)
    sig = base.withColumn("sig", minhash_signature(F.col("sh"), n_hashes))

    # portable band key: md5 of the comma-joined signature slice, so the
    # DuckDB oracle can reproduce buckets exactly (F.hash is Spark-only)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("bucket"),
        )
        for bi in range(bands)
    ]
    banded = sig.select(
        "id", "sh", F.explode(F.array(*band_cols)).alias("bb")
    ).select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("bn"))
    banded = banded.join(
        sizes.filter(F.col("bn") <= max_bucket).select("band", "bucket"),
        on=["band", "bucket"],
    )
    left = banded.select("band", "bucket", F.col("id").alias("id_a"),
                         F.col("sh").alias("sh_a"))
    right = banded.select("band", "bucket", F.col("id").alias("id_b"),
                          F.col("sh").alias("sh_b"))
    cand = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    if verify_threshold is None:
        return cand.select("id_a", "id_b")
    from ..functions.similarity import jaccard

    return (
        cand.withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4))
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 500,
) -> DataFrame:
    """Near-dup pairs by SimHash within ``max_hamming`` bits.

    Pigeonhole banding: split the 64-bit fingerprint into 4 x 16-bit
    blocks; any pair within hamming distance 3 agrees exactly on >=1 block,
    so block equality is a complete candidate generator.
    """
    fp = df.select(
        F.col(id_col).alias("id"),
        simhash64(tokens(F.lower(F.col(text_col)))).alias("fp"),
    )
    blocks = [
        F.struct(
            F.lit(bi).alias("block"),
            F.shiftright(F.col("fp"), bi * 16).bitwiseAND(F.lit(0xFFFF))
            .alias("key"),
        )
        for bi in range(4)
    ]
    banded = fp.select("id", "fp", F.explode(F.array(*blocks)).alias("b")).select(
        "id", "fp", F.col("b.block").alias("block"), F.col("b.key").alias("key")
    )
    sizes = banded.groupBy("block", "key").agg(F.count("*").alias("bn"))
    banded = banded.join(
        sizes.filter(F.col("bn") <= max_bucket).select("block", "key"),
        on=["block", "key"],
    )
    l = banded.select("block", "key", F.col("id").alias("id_a"), F.col("fp").alias("fp_a"))
    r = banded.select("block", "key", F.col("id").alias("id_b"), F.col("fp").alias("fp_b"))
    return (
        l.join(r, on=["block", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
) -> DataFrame:
    """Embedding near-dups: random-hyperplane LSH buckets (deterministic
    seeded planes via portable hashes of dimension index) then exact cosine
    within buckets. For the brute-force/top-k path see operators/ann.py."""
    from ..functions.similarity import cosine

    # deterministic pseudo-planes: sign pattern from hash(dim, plane)
    b = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    dim = F.size(F.col("v"))
    plane_bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col("v"),
                F.transform(
                    F.sequence(F.lit(0), dim - 1),
                    lambda j: F.when(
                        F.pmod(F.xxhash64(j.cast("string"), F.lit(p)), 2) == 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)),
                ),
                lambda v, s: v * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        plane_bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2 ** p))
    bucket = sum(plane_bits[1:], plane_bits[0])
    b = b.withColumn("bucket", bucket)
    l = b.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    r = b.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        l.join(r, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("v_a"), F.col("v_b")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
