"""Sequence packing: assemble curated documents into fixed token-budget
training sequences — the step a pretraining pipeline runs after
curation/splitting (operators/curation.py, operators/sampling.py) and
immediately before tokenized-batch writing.

The reference pipeline ends at typed sinks and rollups (it has no
dataset-assembly surface); this module extends the training-data family
the same way operators/sampling.py does.

Semantics (greedy sequential first-fit, the standard "concat until the
next document would overflow" packing used for LLM pretraining batches):

- Documents are **deterministically shuffled** by a hash of
  ``(seed, id)`` — never ``rand()``, so the ordering (and therefore every
  pack assignment) is idempotent under task retries/speculation and
  re-derivable later from the ids alone.
- The shuffled stream is range-sharded by the same hash; each shard is
  packed independently with a linear greedy scan: a document that would
  push the running token total past ``capacity`` starts a new pack. A
  document longer than ``capacity`` on its own gets a pack to itself
  (never split, never dropped — the caller's curation stage is the place
  to drop oversize docs).

Scale posture (100 TB): the only shuffle is the hash-partition by shard;
the per-shard scan is O(rows) with O(1) state carried across Arrow
batches inside ``mapInPandas`` (r6 — previously ``applyInPandas``
materialized a whole shard per task, a per-task OOM cliff when
``n_shards`` under-estimated the corpus; now memory is bounded by the
Arrow batch size regardless of shard size). Shards remain the unit of
parallelism; pack ids are globalized as ``shard * 2^40 + local_pack`` so
they are unique without any driver-side coordination or second pass.

Hash families follow operators/sampling.py: xxhash64 in production,
``portable=True`` switches to the md5-derived 60-bit family so an
external SQL engine (the DuckDB oracle, via a recursive CTE that replays
the same greedy scan) reproduces every pack assignment bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions.similarity import portable_hash64

# local pack counter lives in the low 40 bits; shard in the bits above —
# unique global ids with zero coordination (2^40 packs/shard headroom)
_PACK_SHARD_SHIFT = 40


def _pack_schema() -> StructType:
    return StructType(
        [
            StructField("doc_id", LongType()),
            StructField("shard", IntegerType()),
            StructField("pack_id", LongType()),
            StructField("pack_pos", IntegerType()),
            StructField("n_tokens", LongType()),
            StructField("pack_fill", LongType()),
        ]
    )


def pack_greedy(
    docs: DataFrame,
    tokens_col: str,
    id_col: str = "doc_id",
    capacity: int = 2048,
    n_shards: int = 64,
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Assign every document to a (pack_id, pack_pos) under a greedy
    token-budget scan of the hash-shuffled corpus.

    Returns one row per document: ``doc_id, shard, pack_id, pack_pos,
    n_tokens, pack_fill`` where ``pack_fill`` is the running token total
    of the pack after this document (so the last position's fill is the
    pack's final length — handy for padding-efficiency metrics without a
    second aggregation).
    """
    if portable:
        h = portable_hash64(F.col(id_col).cast("string"), seed)
    else:
        h = F.xxhash64(F.lit(seed), F.col(id_col).cast("string"))

    slim = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("_ord"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )

    # Bounded-memory scan (r6): hash-partition by shard + in-partition
    # sort + a mapInPandas that streams Arrow batches carrying O(1)
    # (pack, pos, acc) state across batch and shard boundaries. The
    # previous groupBy().applyInPandas loaded a WHOLE shard's rows into
    # one pandas frame, making a mis-sized ``n_shards`` a per-task OOM
    # cliff at corpus scale; this shape keeps the same single shuffle and
    # the same deterministic (shard, _ord, doc_id) scan order — pack
    # assignments are bit-identical (pinned by the sequential-reference
    # property test) — with memory bounded by the Arrow batch size.
    # Several shards may hash into one partition (and some partitions may
    # be empty): rows arrive shard-contiguous because shard leads the
    # sort key, so state resets at each shard transition.
    from collections.abc import Iterator

    def scan_stream(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_shard = None
        pack, pos, acc = -1, 0, 0
        for pdf in it:
            n = len(pdf)
            shards = pdf["shard"].to_numpy()
            toks = pdf["n_tokens"].to_numpy()
            # Precondition check (cheap vectorized pass): a null token
            # count arrives as NaN (nullable long -> float64) and a
            # negative one (e.g. size(null)=-1 upstream) would silently
            # corrupt pack_fill/capacity accounting — refuse both.
            if pdf["n_tokens"].isna().any() or (toks < 0).any():
                raise ValueError(
                    "pack_greedy: null or negative token count in "
                    f"tokens_col (batch doc_ids e.g. "
                    f"{pdf['doc_id'].head(3).tolist()}); filter or fix "
                    "upstream — capacity accounting requires counts >= 0"
                )
            packs = [0] * n
            poss = [0] * n
            fills = [0] * n
            for i in range(n):
                s = int(shards[i])
                t = int(toks[i])
                if s != cur_shard:
                    cur_shard, pack, pos, acc = s, -1, 0, 0
                if pack < 0 or acc + t > capacity:
                    pack, pos, acc = pack + 1, 0, t
                else:
                    pos, acc = pos + 1, acc + t
                packs[i] = (s << _PACK_SHARD_SHIFT) + pack
                poss[i] = pos
                fills[i] = acc
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "shard": pdf["shard"],
                    "pack_id": packs,
                    "pack_pos": poss,
                    "n_tokens": pdf["n_tokens"],
                    "pack_fill": fills,
                }
            )

    return (
        slim.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ord", "doc_id")
        .mapInPandas(scan_stream, schema=_pack_schema())
        .select("doc_id", "shard", "pack_id", "pack_pos", "n_tokens",
                "pack_fill")
    )


def pack_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Padding-efficiency rollup over ``pack_greedy`` output: per shard,
    the pack count, mean fill, and utilization = filled/(packs*capacity).
    One map-side-partial aggregation; drives the "how much compute is
    padding" number every packing run should report."""
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.max("pack_fill").alias("fill"),
        F.count("*").alias("n_docs"),
    )
    return per_pack.groupBy("shard").agg(
        F.count("*").alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.round(F.avg("fill"), 2).alias("avg_fill"),
        F.round(
            F.sum("fill") / (F.count("*") * F.lit(capacity)), 6
        ).alias("utilization"),
    )


def assemble_packs(
    docs: DataFrame,
    packed: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Materialize ``pack_greedy`` assignments into training sequences:
    one row per pack with its documents' text concatenated in pack_pos
    order. The group-collect is safe at any scale because a pack is
    capacity-bounded by construction (collect_list holds at most
    capacity/min_doc_tokens short strings, never a whole partition);
    the single shuffle hashes on (shard, pack_id) — uniform by the
    hash-shuffle ordering, so no skew mitigation is needed."""
    j = packed.join(
        docs.select(F.col(id_col).cast("long").alias("doc_id"), text_col),
        "doc_id",
    )
    parts = F.array_sort(
        F.collect_list(F.struct("pack_pos", F.col(text_col).alias("t")))
    )
    return (
        j.groupBy("shard", "pack_id")
        .agg(
            parts.alias("_parts"),
            F.max("pack_fill").alias("n_tokens"),
            F.count("*").alias("n_docs"),
        )
        .select(
            "shard",
            "pack_id",
            "n_docs",
            "n_tokens",
            F.concat_ws(
                sep, F.transform("_parts", lambda p: p["t"])
            ).alias(text_col),
        )
    )
