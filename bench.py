"""Benchmark harness. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

- Headline operator queries run at $SPARK_GRAFT_SF_DIR (default
  /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; each timed to full
  materialization via the noop sink (no collect cost, no disk cost).
- The transcript pipeline (parse -> enrich -> route -> aggregate; the
  BASELINE.json target metric) is timed end-to-end over a pre-materialized
  parquet input (input generation is excluded from the timing), reported
  as pipeline_sec + turns_per_sec.

For the N-vs-4N scaling evidence see tools/bench_scaling.py which runs this
pipeline at two parallelism levels and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "pricing_summary",
    "filter_pushdown_revenue",
    "shipping_priority_top10",
    "region_revenue",
    "latest_order_per_customer",
    "topk_per_group",
    "error_rate_by_user",
    "sessionize_events",
    "windowed_rolling_avg",
    "range_correlate",
    "asof_join_prior_signup",
    "doc_quality_scores",
    "lang_id_confusion",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_dups",
    "near_dup_clusters",
    "embedding_topk_bruteforce",
    "embedding_topk_lsh",
    "embedding_topk_ivf",
    "embedding_topk_ivf_trained",
    "embedding_dups_lsh",
    "ann_recall_at_k",
    "doc_curation_flags",
    "dataset_split_mix",
    "tfidf_topk_terms",
    "dataset_pack",
    "exact_dup_groups",
    "doc_fingerprints",
    "selector_classified_counts",
    "transcript_status_class",
    "value_percentiles_by_type",
    "partition_stats",
    "media_features",
]

PIPELINE_TURNS = int(os.environ.get("SPARK_GRAFT_PIPELINE_TURNS", "4000000"))
PIPELINE_DAYS = int(os.environ.get("SPARK_GRAFT_PIPELINE_DAYS", "6"))


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _prod_overrides():
    """Production-configuration variants for ops whose registry queries pin
    the md5-portable hash family (needed only so the DuckDB oracle can
    reproduce values). The bench measures the path a real deployment runs:
    xxhash64 base + hashed shingle keys. Same operators, same parameters,
    same sub-quadratic plans — only the hash family differs (statistically
    equivalent candidate generation)."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F
    from commerce_logs_pipeline_spark.operators import ann, dedup

    def _emb(spark, sf):
        return E._t(spark, sf, "embeddings").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )

    return {
        "ngram_jaccard_pairs": lambda spark, sf: dedup.ngram_jaccard_pairs(
            E._t(spark, sf, "documents"), k=3, threshold=0.18,
            max_bucket=E._NGRAM_MAX_BUCKET, hash_shingles=True,
        ),
        "minhash_lsh_pairs": lambda spark, sf: dedup.minhash_lsh_pairs(
            E._t(spark, sf, "documents"), k=3, n_hashes=8, bands=4,
            verify_threshold=0.15, max_bucket=E._MH_BUCKET, portable=False,
        ),
        "simhash_dups": lambda spark, sf: dedup.simhash_dups(
            E._t(spark, sf, "documents"), max_hamming=6,
            max_bucket=E._SH_BUCKET, portable=False,
        ),
        "embedding_topk_ivf": lambda spark, sf: ann.ivf_topk(
            _emb(spark, sf), _emb(spark, sf).filter("vec_id < 20"),
            k=5, n_cells=16, nprobe=2, use_numpy=True,
        ),
        # trained variant: the timing includes the distributed Lloyd
        # refinement (4 assignment+mean jobs) — the full quantizer
        # build-and-query cost, not just the probe
        "embedding_topk_ivf_trained": lambda spark, sf: ann.ivf_topk(
            _emb(spark, sf), _emb(spark, sf).filter("vec_id < 20"),
            k=5, n_cells=16, nprobe=2, use_numpy=True,
            centroids=ann.train_ivf_centroids(
                _emb(spark, sf), n_cells=16, iterations=4
            ),
        ),
        "near_dup_clusters": lambda spark, sf: dedup.dup_clusters(
            dedup.simhash_dups(
                E._t(spark, sf, "documents"), max_hamming=6,
                max_bucket=E._SH_BUCKET, portable=False,
            ),
            all_ids=E._t(spark, sf, "documents").select("doc_id"),
        ),
    }


def prepare_pipeline_input(spark, turns: int, path: str,
                           n_days: int = PIPELINE_DAYS) -> None:
    from commerce_logs_pipeline_spark.synth import generate_transcripts

    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return
    # explicit partition count: the input's file/split layout must not
    # inherit the GENERATING session's core count, or a small session
    # would write few big row groups and cap read parallelism for every
    # later consumer (measured: a 2-core generator halved 8-core runs)
    generate_transcripts(spark, turns, n_days=n_days, partitions=64).write.mode(
        "overwrite"
    ).parquet(path)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as E
    from commerce_logs_pipeline_spark.plans.pipeline import run_pipeline
    from commerce_logs_pipeline_spark.session import build_session

    spark = build_session(app_name="clp-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    # registry-retired queries (driver window holds 50; oracle parity for
    # these lives in tests/test_entry_queries.py) stay in the bench time
    # series — resolve them straight from their functions
    qs["shipping_priority_top10"] = E.q_shipping_priority
    qs.update(_prod_overrides())
    timings: dict[str, float] = {}
    # untimed JVM/codegen warm-up: one trivial scan-agg-write so the first
    # MEASURED query doesn't carry whole-stage-codegen compiler start-up
    # (~4-5 s, previously booked against pricing_summary)
    _force(
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .groupBy("r_name").count()
    )
    t_total0 = time.monotonic()
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        _force(qs[name](spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)
        # dedup/ANN ops persist intermediates (candidate bases, banded
        # frames); drop them between queries so repeated invocations in
        # this long-lived session don't accumulate executor storage
        spark.catalog.clearCache()

    # --- transcript pipeline end-to-end (the authoritative metric) --------
    input_path = f"/dev/shm/clp_bench_input_{PIPELINE_TURNS}_d{PIPELINE_DAYS}"
    prepare_pipeline_input(spark, PIPELINE_TURNS, input_path)
    transcripts = spark.read.parquet(input_path)
    # best of 2 (same convention as tools/bench_scaling.py): the first run
    # pays JIT/codegen warm-up for the pipeline path
    pipeline_sec, report = None, None
    for i in range(2):
        out_path = f"/tmp/clp_bench_out_{cpus}_{int(time.time())}_{i}"
        t0 = time.monotonic()
        rep = run_pipeline(
            spark, transcripts, out_path, resume=False, write_aggregates=True
        )
        sec = round(time.monotonic() - t0, 3)
        if pipeline_sec is None or sec < pipeline_sec:
            pipeline_sec, report = sec, rep
    timings["pipeline_end_to_end"] = pipeline_sec

    total = round(time.monotonic() - t_total0, 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "cpus": int(cpus),
                "pipeline_turns": report.rows_in,
                "turns_per_sec": round(report.rows_in / pipeline_sec, 1),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
