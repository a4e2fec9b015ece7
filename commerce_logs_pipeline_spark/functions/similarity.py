"""Vector / set similarity primitives, Column-first.

- cosine / dot product over array<float> with F.aggregate + F.zip_with
  (JVM-side; no UDF)
- portable 64-bit hash family built from md5 (identical results in DuckDB
  for oracle parity) used by MinHash
- SimHash over token sets

Scale notes: everything here is a per-row expression (map-side); the
expensive parts of dedup/ANN (joins over candidates) live in
operators/dedup.py and operators/ann.py where the shuffle shape is chosen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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

    Used for MinHash signatures so the DuckDB oracle can recompute them
    exactly; xxhash64 would be Spark-only.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), col))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def minhash_signature(shingle_arr: Column, n_hashes: int = 16) -> Column:
    """MinHash signature: for each seed, min over shingles of
    portable_hash64(shingle). Empty shingle set -> nulls."""
    sigs = []
    for s in range(n_hashes):
        hashed = F.transform(shingle_arr, lambda x: portable_hash64(x, s))
        sigs.append(F.array_min(hashed).alias(f"mh{s}"))
    return F.array(*sigs)


def simhash64(token_arr: Column) -> Column:
    """64-bit SimHash over tokens: per-bit majority vote of token hashes.

    Expressed as pure Column ops: for each bit b, count tokens whose
    xxhash64 has bit b set; bit is 1 if count*2 > n_tokens.
    """
    n = F.size(token_arr)
    bits = []
    for b in range(64):
        cnt = F.size(
            F.filter(
                token_arr,
                lambda t: F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1,
            )
        )
        bits.append(F.when(cnt * 2 > n, F.lit(1).cast("long")).otherwise(F.lit(0)))
    out = F.lit(0).cast("long")
    for b, bit in enumerate(bits):
        out = out.bitwiseOR(F.shiftleft(bit, b))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two string arrays (distinct elements)."""
    inter = F.size(F.array_intersect(a, b))
    uni = F.size(F.array_union(a, b))
    return F.when(uni > 0, inter / uni).otherwise(F.lit(0.0))
