"""Deterministic dataset sampling: train/val/test splits, per-stratum
hash sampling, and downsample-to-target-mixture — the dataset-assembly
operators a pretraining pipeline runs after curation (operators/dedup.py,
operators/curation.py) and before tokenization.

The reference has no dataset-assembly surface (its pipeline ends at typed
sinks + rollups, pipeline/ingest/internal/service/worker.go:229-258);
these extend the training-data family the same way operators/curation.py
does.

Everything here is HASH-GATED, never RNG-gated, which is the only correct
posture at cluster scale:

- ``rand()`` is re-evaluated when Spark retries or speculatively re-runs
  a task, so an RNG-sampled row set is not stable under failure — two
  attempts of the same partition sample different rows (a real
  train/test-contamination bug, not a style preference). A pure function
  of (id, salt) is idempotent under any retry/replay schedule.
- Membership is reproducible later from the id alone: "which split did
  doc X land in" never requires re-running the job that assigned it.
- No shuffle: every gate is a scan-local Column predicate; assignment
  and sampling parallelize linearly with input splits. The only
  aggregation in this module is ``resample_to_mix``'s per-domain count
  (one map-side-partial hash agg over a low-cardinality key).

Hash families (same convention as operators/dedup.py): production path
uses xxhash64 (native, 8-byte); ``portable=True`` switches to the
md5-derived 60-bit family (functions/similarity.portable_hash64) so an
external SQL engine can reproduce membership bit-for-bit. Thresholds are
computed in EXACT INTEGER arithmetic against the hash space (Python
bigints driver-side; a HUGEINT-capable oracle re-derives them from the
same counts), so there is no float-rounding seam between engines.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import portable_hash64

# The portable hash family yields 15 hex chars = uniform on [0, 16^15).
HASH_SPACE = 16**15  # 2^60


def _unit_hash(
    id_col: Column, seed: int, portable: bool
) -> tuple[Column, int, Callable[[int], Column]]:
    """A uniform integer hash of (seed, id), the size of its space, and a
    converter from an unsigned threshold in [0, space] to a comparable
    literal. Gates are ``hash < to_lit(threshold)`` with thresholds
    computed in exact integer math by the caller."""
    s = id_col.cast("string")
    if portable:
        return portable_hash64(s, seed), HASH_SPACE, lambda t: F.lit(t)

    # xxhash64 is uniform SIGNED int64; keep the comparison in signed
    # space (threshold - 2^63) instead of shifting the column — literals
    # stay within long range and the scan gate stays codegen-friendly.
    # fraction=1.0 clamps to int64 max, excluding only the single hash
    # value 2^63-1 (2^-64 of the space); both sides of any A/B use the
    # same rule so membership is still deterministic.
    def to_lit(t: int) -> Column:
        return F.lit(min(t - 2**63, 2**63 - 1))

    return F.xxhash64(F.lit(f"{seed}:"), s), 2**64, to_lit


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    seed: int = 101,
    portable: bool = False,
    out_col: str = "split",
) -> DataFrame:
    """Append a deterministic split label: row -> the first split whose
    cumulative hash threshold exceeds hash(seed, id).

    Thresholds are ``(space * cum_numerator) // denominator`` on the
    integer hash space — splits like 80/10/10 are EXACT rationals, not
    float approximations, so an external engine re-derives identical
    membership. Fraction dict order is the band order (insertion order);
    fractions must sum to 1 (the last band is closed at the space top so
    no row is ever unassigned).
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    # exact rational cumsum: scale each fraction to an integer numerator
    # over a common denominator (1e-6 resolution is far finer than any
    # split anyone specifies; the sum is validated)
    denom = 1_000_000
    nums = {k: round(v * denom) for k, v in fractions.items()}
    if sum(nums.values()) != denom:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    h, space, to_lit = _unit_hash(F.col(id_col), seed, portable)
    expr: Column | None = None
    cum = 0
    names = list(nums)
    for name in names[:-1]:
        cum += nums[name]
        thr = to_lit((space * cum) // denom)
        expr = (
            F.when(h < thr, F.lit(name))
            if expr is None
            else expr.when(h < thr, F.lit(name))
        )
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 202,
    portable: bool = False,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    hash(seed, id) < fraction[stratum] * space. Unlike
    ``DataFrame.sampleBy`` this is stable under task retries and
    re-derivable from ids (see module docstring). Strata missing from
    ``fractions`` get ``default_fraction``. Scan-local — no shuffle."""
    h, space, to_lit = _unit_hash(F.col(id_col), seed, portable)
    denom = 1_000_000
    thr: Column = to_lit((space * round(default_fraction * denom)) // denom)
    for k, v in fractions.items():
        thr = F.when(
            F.col(strata_col) == k,
            to_lit((space * round(v * denom)) // denom),
        ).otherwise(thr)
    return df.filter(h < thr)


def mix_thresholds(
    counts: dict[str, int], weights: dict[str, int], space: int = HASH_SPACE
) -> tuple[int, dict[str, int]]:
    """Exact downsample-to-mixture plan: given per-domain counts and
    integer target weights w_d (final corpus proportions n_d : w_d), the
    largest achievable total is N* = min_d floor(count_d * W / w_d) and
    each domain keeps hash < (w_d * N* * space) // (W * count_d).

    Pure integer arithmetic end-to-end (Python bigints here; HUGEINT in a
    SQL oracle) — zero float seam, so the kept row SET is exactly
    reproducible across engines. Returns (N*, thresholds)."""
    missing = set(counts) - set(weights)
    if missing:
        raise ValueError(f"weights missing for domains: {sorted(missing)}")
    W = sum(weights[d] for d in counts)
    n_star = min(counts[d] * W // weights[d] for d in counts)
    thr = {
        d: (weights[d] * n_star * space) // (W * counts[d]) for d in counts
    }
    return n_star, thr


def resample_to_mix(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, int],
    id_col: str = "doc_id",
    seed: int = 202,
    portable: bool = False,
) -> DataFrame:
    """Downsample a corpus so domain proportions match integer target
    weights (e.g. web:code:wiki = 5:3:2) at the largest total the data
    allows — the standard domain-mixing step before pretraining.

    One small aggregation (per-domain counts over a low-cardinality key,
    map-side partial) is collected to the driver to compute exact integer
    thresholds (see ``mix_thresholds``); the filter itself is scan-local.
    Domain cardinality is assumed driver-sized (it is the number of
    CORPORA, not rows)."""
    counts = {r[0]: r[1] for r in df.groupBy(domain_col).count().collect()}
    h, space, to_lit = _unit_hash(F.col(id_col), seed, portable)
    _, thr = mix_thresholds(counts, weights, space)
    gate: Column = to_lit(0)
    for d, t in thr.items():
        gate = F.when(F.col(domain_col) == d, to_lit(t)).otherwise(gate)
    return df.filter(h < gate)
