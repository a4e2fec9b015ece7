"""Vector / set similarity primitives, Column-first.

- cosine / dot product over array<float> with F.aggregate + F.zip_with
  (JVM-side; no UDF)
- portable 64-bit hash family built from md5 (identical results in DuckDB
  for oracle parity); MinHash uses a universal-hash family over ONE md5
  base hash per shingle (Broder-style (a*x+b) mod p minwise hashing), so
  the md5 cost is paid once regardless of signature width
- SimHash with one hash per token: per-bit counts accumulate in a single
  aggregate pass over a cached hash array
- deterministic ±1 hyperplane matrices for embedding LSH, generated as
  PYTHON literals (md5-seeded) so the plan ships constants instead of
  hashing per row, and any SQL engine can embed the same literals

Scale notes: everything here is a per-row expression (map-side); the
expensive parts of dedup/ANN (joins over candidates) live in
operators/dedup.py and operators/ann.py where the shuffle shape is chosen.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Universal-hash moduli: base hashes live in [0, 2^31-1), outputs in
# [0, 2^61-1). a*x + b stays < 2^62 — no int64 overflow in Spark (ANSI) or
# DuckDB (BIGINT), and the identical arithmetic reproduces bit-for-bit.
UH_P1 = 2_147_483_647
UH_P2 = 2_305_843_009_213_693_951


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def portable_hash64(col: Column, seed: int) -> Column:
    """Deterministic 64-bit-ish hash identical in Spark and DuckDB:
    first 15 hex chars of md5(seed:value) parsed base-16 (fits in int64).

    Used wherever an external SQL oracle must recompute hashes exactly;
    xxhash64 would be Spark-only.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), col))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def minhash_consts(n_hashes: int) -> list[tuple[int, int]]:
    """Fixed (a, b) universal-hash constants (LCG-derived, reproducible —
    the oracle SQL embeds the same literals)."""
    x, out = 12345, []
    for _ in range(n_hashes):
        x = (1103515245 * x + 12345) % UH_P1
        a = x or 1
        x = (1103515245 * x + 12345) % UH_P1
        out.append((a, x))
    return out


def minhash_signature(
    shingle_arr: Column, n_hashes: int = 16, portable: bool = False
) -> Column:
    """MinHash signature in ONE pass: hash each shingle once (base hash,
    mod 2^31-1), then fold the hash array accumulating per-seed minima of
    (a_s*x + b_s) mod (2^61-1). Empty shingle set -> all-P2 sentinel
    (callers filter empties upstream).

    portable=False (production default): xxhash64 base — pure JVM, no
    string materialization. portable=True: md5-derived base so an external
    SQL oracle reproduces signatures bit-for-bit (same flag discipline as
    with_simhash). Both families give statistically equivalent minwise
    estimates; they just generate different (valid) candidate sets."""
    consts = minhash_consts(n_hashes)
    ab = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in consts
        ]
    )
    if portable:
        base = lambda t: portable_hash64(t, 0) % UH_P1  # noqa: E731
    else:
        base = lambda t: F.pmod(F.xxhash64(t), F.lit(UH_P1))  # noqa: E731
    return _minwise_fold(F.transform(shingle_arr, base), ab, n_hashes)


def minhash_signature_from_hashes(hash_arr: Column, n_hashes: int = 16) -> Column:
    """MinHash signature over PRE-HASHED 64-bit shingle keys (the
    text.hashed_shingles_from_hashed_tokens production path): fold the
    key array directly, reducing each key into [0, 2^31) with pmod —
    zero additional hashing."""
    consts = minhash_consts(n_hashes)
    ab = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in consts
        ]
    )
    xs = F.transform(hash_arr, lambda h: F.pmod(h, F.lit(UH_P1)))
    return _minwise_fold(xs, ab, n_hashes)


def _minwise_fold(xs: Column, ab: Column, n_hashes: int) -> Column:
    init = F.array_repeat(F.lit(UH_P2).cast("long"), n_hashes)
    return F.aggregate(
        xs,
        init,
        lambda acc, x: F.zip_with(
            acc, ab, lambda m, c: F.least(m, (c["a"] * x + c["b"]) % UH_P2)
        ),
    )


def with_simhash(
    df: DataFrame,
    token_col: Column,
    out: str = "fp",
    portable: bool = False,
    n_bits: int = 64,
) -> DataFrame:
    """Append a 64-bit SimHash fingerprint column (per-bit majority vote of
    token hashes).

    One hash per token: a transform builds each token's bit vector, a
    single aggregate pass sums them into per-bit counts, and the packed
    fingerprint reads the count array 64 times. The three steps live in
    separate projections on purpose — the optimizer does not collapse
    expensive intermediates referenced more than once, so the counts are
    computed once per row (the naive one-expression form re-hashes every
    token 64 times).

    portable=True uses the md5-derived hash (DuckDB-reproducible; its top
    4 bits are always 0, so fingerprint bits 60-63 are identically 0 on
    both sides — harmless for hamming distances).
    """
    if portable:
        def hash_fn(t):
            return portable_hash64(t, 0)
    else:
        hash_fn = F.xxhash64

    def bit_vec(h):
        return F.array(
            *[
                F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("long")
                for b in range(n_bits)
            ]
        )

    hashed = F.transform(token_col, lambda t: bit_vec(hash_fn(t)))
    counts = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0).cast("long"), n_bits),
        lambda acc, bv: F.zip_with(acc, bv, lambda c, x: c + x),
    )
    df = df.withColumn("_shc", counts).withColumn("_shn", F.size(token_col))
    fp = F.lit(0).cast("long")
    for b in range(n_bits):
        weight = (1 << b) if b < 63 else -(1 << 63)  # two's-complement top bit
        fp = fp.bitwiseOR(
            F.when(
                F.element_at("_shc", b + 1) * 2 > F.col("_shn"),
                F.lit(weight).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    return df.withColumn(out, fp).drop("_shc", "_shn")


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two string arrays (distinct elements)."""
    inter = F.size(F.array_intersect(a, b))
    uni = F.size(F.array_union(a, b))
    return F.when(uni > 0, inter / uni).otherwise(F.lit(0.0))


def plane_matrix(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign of md5(p:j). Generated ONCE in
    Python and embedded as plan literals — zero per-row hash cost, and the
    oracle SQL embeds the identical literals."""
    return [
        [
            1.0
            if int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:15], 16) % 2
            == 0
            else -1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]
