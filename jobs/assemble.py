"""spark-submit entry point for the training-data assembly chain:
curate (quality + repetition gates, optional 13-gram benchmark
decontamination) -> near-dup dedup (simhash pairs -> connected
components, keep one doc per cluster) -> hash-gated split -> greedy
token-budget packing -> optional vocabulary build + token-id encoding ->
parquet outputs.

Usage (local sandbox; on a cluster drop --cpus and let spark-submit set
the master):

    spark-submit --py-files clp.zip jobs/assemble.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/assembled [--cpus 8] [--capacity 2048] \
        [--benchmark eval_docs.parquet] [--vocab-size 32768] [--no-encode]

Outputs under --out:
    packed/          one row per training sequence (pack_id, n_docs,
                     n_tokens, text), partitioned by split
    assignments/     per-doc (doc_id, split, shard, pack_id, pack_pos)
    vocab/           (term, token_id, n_occurrences)   [unless --no-encode]
    encoded/         (doc_id, n_tokens, token_ids)     [unless --no-encode]
    one JSON summary line on stdout (counts per stage + pack utilization).

Every gate is hash-based (never rand()), so reruns over the same input
produce byte-identical assignments — safe under task retries and
reproducible for audits.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents parquet (doc_id, text[, source])")
    ap.add_argument("--out", required=True, help="output base path")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--benchmark", default=None,
                    help="eval-set parquet to decontaminate against (text)")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--max-top-ngram-frac", type=float, default=0.2)
    ap.add_argument("--capacity", type=int, default=2048,
                    help="token budget per packed sequence")
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--train-frac", type=float, default=0.9)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--vocab-size", type=int, default=32768)
    ap.add_argument("--no-encode", action="store_true",
                    help="skip vocabulary build + token-id encoding")
    return ap


def run(args, spark) -> int:
    from pyspark.sql import functions as F

    from commerce_logs_pipeline_spark.functions import text as TX
    from commerce_logs_pipeline_spark.operators import (
        curation,
        dedup,
        packing,
        sampling,
        vocab,
    )
    docs = spark.read.parquet(args.input)
    n_input = docs.count()

    # --- curate ---------------------------------------------------
    kept = docs.withColumn("_q", TX.quality_score(F.col("text"))).filter(
        F.col("_q") >= args.min_quality
    )
    rep = curation.repetition_scores(kept, n=3)
    kept = kept.join(rep.select("doc_id", "top_ngram_frac"), "doc_id").filter(
        (F.col("top_ngram_frac") < args.max_top_ngram_frac)
        | F.col("top_ngram_frac").isNull()
    )
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        decon = curation.decontaminate(kept, bench, n=13)
        kept = kept.join(
            decon.filter(~F.col("contaminated")).select("doc_id"),
            "doc_id",
        )
    kept = kept.drop("_q", "top_ngram_frac")

    with dedup.released_after():
        n_curated = kept.count()

        # --- dedup: keep one doc per near-dup cluster --------------
        pairs = dedup.simhash_dups(kept, max_hamming=6)
        clusters = dedup.dup_clusters(
            pairs, all_ids=kept.select("doc_id")
        ).withColumnRenamed("id", "doc_id")
        survivors = (
            kept.join(clusters, "doc_id")
            .filter(F.col("doc_id") == F.col("cluster_id"))
            .drop("cluster_id")
        )

        # --- split + pack -----------------------------------------
        split = sampling.split_assign(
            survivors,
            fractions={"train": args.train_frac,
                       "val": round(1 - args.train_frac, 6)},
            seed=args.seed,
        ).withColumn("n_tokens", TX.token_count(F.col("text")))
        # pack each split INDEPENDENTLY: pack ids are only unique
        # within one pack_greedy call (shard<<40 + local counter), so
        # a union across splits would collide ids and assemble mixed
        # train/val sequences. Each split gets its own pack space,
        # written into its split= partition.
        n_packs, fill_sum = 0, 0.0
        for name in ("train", "val"):
            part = split.filter(F.col("split") == name)
            asg = packing.pack_greedy(
                part, "n_tokens", capacity=args.capacity,
                n_shards=args.n_shards, seed=args.seed,
            ).localCheckpoint(eager=True)  # reused 3x below
            (asg.withColumn("split", F.lit(name))
             .write.mode("overwrite")
             .parquet(f"{args.out}/assignments/split={name}"))
            (packing.assemble_packs(part, asg)
             .write.mode("overwrite")
             .parquet(f"{args.out}/packed/split={name}"))
            u = packing.pack_stats(asg, capacity=args.capacity).agg(
                F.sum("n_packs").alias("p"),
                F.sum(F.col("avg_fill") * F.col("n_packs")).alias("f"),
            ).first()
            n_packs += int(u["p"] or 0)
            fill_sum += float(u["f"] or 0.0)
        utilization = (
            round(fill_sum / (n_packs * args.capacity), 4)
            if n_packs else 0.0
        )

        # --- tokenize ---------------------------------------------
        n_encoded = 0
        if not args.no_encode:
            train_docs = split.filter(F.col("split") == "train")
            v = vocab.build_vocab(train_docs, size=args.vocab_size)
            v.write.mode("overwrite").parquet(f"{args.out}/vocab")
            enc = vocab.encode_docs(
                split, spark.read.parquet(f"{args.out}/vocab")
            )
            enc.write.mode("overwrite").parquet(f"{args.out}/encoded")
            n_encoded = spark.read.parquet(
                f"{args.out}/encoded"
            ).count()

        summary = {
            "input_docs": n_input,
            "curated_docs": n_curated,
            "survivor_docs": survivors.count(),
            "packs": n_packs,
            "pack_utilization": utilization,
            "encoded_docs": n_encoded,
            "out": args.out,
        }
    print(json.dumps(summary))
    return 0


def main_with_spark(argv, spark) -> int:
    return run(build_parser().parse_args(argv), spark)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from commerce_logs_pipeline_spark.session import build_session

    master = f"local[{args.cpus}]" if args.cpus else None
    spark = build_session(
        app_name="clp-assemble", master=master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        return run(args, spark)
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
