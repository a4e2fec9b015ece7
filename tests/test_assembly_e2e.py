"""Capstone integration: the full training-data assembly chain over the
documents table — curate (quality + repetition + decontamination) →
dedup (exact + near-dup clusters, keep-one) → split (hash-gated) →
resample to a source mixture → pack (greedy token budget) → assemble
(concatenated sequences) — composed from the same operators the contract
queries check individually. Pins the cross-operator invariants a real
pretraining pipeline depends on: no eval contamination survives, no
duplicate cluster contributes two docs, split membership is preserved
through packing, every surviving doc lands in exactly one assembled
sequence, and the whole chain is deterministic end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from commerce_logs_pipeline_spark.functions import text as TX
from commerce_logs_pipeline_spark.operators import (
    curation,
    dedup,
    packing,
    sampling,
)

SF = "/root/testdata/sf0.001"


def _chain(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # --- curate: quality gate + repetition gate + decontamination -------
    scored = docs.withColumn("q", TX.quality_score(F.col("text"))).filter(
        F.col("q") >= 0.3
    )
    rep = curation.repetition_scores(scored, n=3)
    scored = scored.join(rep, "doc_id").filter(
        (F.col("top_ngram_frac") < 0.2) | F.col("top_ngram_frac").isNull()
    )
    # benchmark = a handful of docs treated as an eval set: their exact
    # 13-grams must be scrubbed
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    decon = curation.decontaminate(scored, bench, n=13)
    kept = scored.join(
        decon.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )

    # --- dedup: exact + simhash near-dup clusters, keep min id ---------
    with dedup.released_after():
        pairs = dedup.simhash_dups(
            kept, max_hamming=6, max_bucket=50, portable=False
        )
        clusters = dedup.dup_clusters(
            pairs, all_ids=kept.select("doc_id")
        )
        survivors = (
            kept.join(
                clusters.withColumnRenamed("id", "doc_id"), "doc_id"
            )
            .filter(F.col("doc_id") == F.col("cluster_id"))
            .drop("cluster_id")
        )

        # --- split + mixture ------------------------------------------
        mixed = sampling.resample_to_mix(
            survivors, "source",
            {s: 1 for s in [r[0] for r in
                            survivors.select("source").distinct().collect()]},
            seed=3,
        )
        split = sampling.split_assign(
            mixed, fractions={"train": 0.9, "val": 0.1}, seed=4
        )
        train = split.filter(F.col("split") == "train").withColumn(
            "n_tokens", TX.token_count(F.col("text"))
        )

        # --- pack + assemble ------------------------------------------
        packed = packing.pack_greedy(
            train, "n_tokens", capacity=512, n_shards=4, seed=9
        )
        seqs = packing.assemble_packs(train, packed, sep="\n\n")
        return (
            kept.count(),
            sorted(r.doc_id for r in survivors.select("doc_id").collect()),
            sorted(r.doc_id for r in train.select("doc_id").collect()),
            sorted(map(tuple, packed.collect())),
            sorted(
                map(tuple, seqs.select("pack_id", "n_docs", "n_tokens")
                    .collect())
            ),
        )


def test_assembly_chain_invariants(spark):
    n_kept, survivors, train, packed, seqs = _chain(spark)

    # curation kept a meaningful corpus and dedup never grows it
    assert n_kept > 100
    assert 0 < len(survivors) <= n_kept
    # split is a subset of survivors; packing covers train exactly once
    assert set(train) <= set(survivors)
    assert sorted(p[0] for p in packed) == train
    # every pack's doc count sums back to the train set
    assert sum(n for _, n, _ in seqs) == len(train)
    # no assembled sequence exceeds capacity unless it is a lone oversize
    for _, n_docs, n_tokens in seqs:
        assert n_tokens <= 512 or n_docs == 1


def test_assembly_chain_is_deterministic(spark):
    a = _chain(spark)
    b = _chain(spark)
    assert a == b
