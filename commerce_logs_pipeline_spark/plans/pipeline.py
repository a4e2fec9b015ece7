"""End-to-end batch pipeline: scan -> parse -> enrich -> route -> aggregate,
with per-partition lineage checkpointing and idempotent resume.

This is the Spark job equivalent of the reference's service topology
(/root/reference: blob-monitor -> ingest -> extraction -> sinks; SURVEY §3):
one DataFrame DAG per run instead of long-running Kafka consumers.

Execution shape (exactly two passes over the data):

  PASS 1 (map-only + one write):
    input (day/bucket partitioned)
      -> anti-join closed partitions from the lineage manifest   [resume]
      -> vectorized parse kernel (no shuffle)                    [parse]
      -> broadcast joins with role/tool dims (no shuffle)        [enrich]
      -> ONE write partitioned by (category, day, bucket)        [route]

  PASS 2 (columnar, pruned):
    read back the routed parquet — scans touch only the few columns each
    aggregate needs (ReadSchema pruning), not the wide text payloads —
      -> routed counts + conservation check                      [metrics]
      -> grouped/window aggregates                               [aggregate]
      -> per-(day,bucket) completion events -> manifest append   [checkpoint]

Rationale at 100 TB: caching the wide parsed frame for K sink writes (the
obvious design) spills heavily and re-reads text columns for every
aggregate; writing once and re-reading pruned columnar data is strictly
cheaper past trivial scale, and the routed table IS the product anyway.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parse import parse_transcripts
from ..schemas import CATEGORIES
from ..util import ensure_min_partitions
from ..operators.router import (
    DEFAULT_SINKS,
    check_conservation,
    route,
    routed_counts,
    with_partition_cols,
    write_sinks,
    write_sinks_single_pass,
)
from .aggregate import (
    conv_turn_counts,
    hourly_error_rollup,
    per_tool_call_rates,
)
from .checkpoint import ManifestStore, completion_events, new_run_id
from .enrich import enrich_with_default_dims


@dataclass
class PipelineReport:
    run_id: str
    rows_in: int
    counts: dict[str, int]
    sink_paths: dict[str, str]
    elapsed_sec: float
    turns_per_sec: float
    resumed_partitions_skipped: bool = False
    extras: dict = field(default_factory=dict)


def _counts_from_by_cat(by_cat: dict[str, int],
                        sinks: dict[str, list[str]]) -> dict[str, int]:
    total = sum(by_cat.values())
    out = {f"sink:{name}": sum(by_cat.get(c, 0) for c in cats)
           for name, cats in sinks.items()}
    out["skipped"] = by_cat.get("skipped", 0)
    out["total"] = total
    routed = sum(out[f"sink:{n}"] for n in sinks)
    if routed + out["skipped"] != total:
        raise AssertionError(
            f"router conservation violated: {by_cat} routed={routed}"
        )
    return out


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    base_path: str,
    run_id: str | None = None,
    resume: bool = True,
    write_aggregates: bool = True,
    use_pandas_grok: bool = True,
    single_pass_router: bool = True,
    close_partitions: bool = True,
    pass2_persist: bool = True,
) -> PipelineReport:
    """Run the full pipeline over ``transcripts``; outputs under ``base_path``.

    Idempotence contract: the routed write uses dynamic partition overwrite
    keyed by (category, day, bucket); completion events append with a
    run_id that the manifest fold dedupes — a crashed run re-executed on
    the same inputs converges to the same state (X3/X9/X10 in SURVEY §4).
    """
    t0 = time.monotonic()
    # Self-contained runs record the instant they started reading their
    # source as the supersession boundary (see ManifestStore.visible_runs):
    # a chunk that commits while this full reprocess is running stays
    # visible rather than being hidden by the later commit timestamp.
    read_asof = datetime.now(timezone.utc)
    # resume=False reprocesses WHOLE partitions, so its rows overlap any
    # earlier commits of the same partitions: the auto-generated run id
    # carries the "full" self-contained prefix (checkpoint.
    # SELF_CONTAINED_PREFIXES) so incremental readers and compaction take
    # this run as the partition's complete row set instead of unioning it
    # with the runs it superseded. Caller-supplied run_ids declare their
    # own intent (streaming batch-N replays are chunk appends).
    run_id = run_id or (new_run_id() if resume else "full" + new_run_id())
    manifest = ManifestStore(f"{base_path}/_manifest")

    # Feed and BALANCE every core: compressed text inputs can collapse to
    # few read splits, and real inputs are Zipf-skewed by conversation — a
    # round-robin repartition to 2x cores evens both. Empirical rule, now
    # confirmed twice: 2.3x faster parse at 32 cores on a skewed
    # 33-partition input (r1), and 1.9x faster pass-1 at 4x8 executors on
    # a BALANCED 52-split input (1.6 ragged waves -> 2 clean waves; a
    # 1.25-wave threshold was tried and cost 2x, so low-wave-count
    # raggedness matters as much as skew). No-op at real scale where
    # inputs carry balanced >= 2x-cores splits.
    cores = spark.sparkContext.defaultParallelism
    transcripts = ensure_min_partitions(transcripts, cores * 2)

    part_input = with_partition_cols(transcripts)
    todo = (
        manifest.pending(
            spark, part_input, routed_path=f"{base_path}/sinks/routed"
        )
        if resume
        else part_input
    )

    if resume:
        # cheap pre-flight: which (day, bucket) partitions does this run
        # own? (columnar scan of two small columns; no parse). Empty ->
        # resume no-op without touching the parse kernel at all.
        pend = todo.select("day", "bucket").distinct()
        pending_parts = pend.collect()
        if not pending_parts:
            return PipelineReport(
                run_id=run_id, rows_in=0, counts={}, sink_paths={},
                elapsed_sec=time.monotonic() - t0, turns_per_sec=0.0,
                resumed_partitions_skipped=True,
            )
    else:
        pend = None

    parsed = parse_transcripts(todo, use_pandas_grok=use_pandas_grok)
    enriched = enrich_with_default_dims(parsed)

    phases: dict[str, float] = {}
    if single_pass_router:
        # PASS 1: one partitioned write into this run's snapshot dir, with
        # router counts attached as OBSERVED METRICS on the same job (A4
        # metrics-collector analog, factories.go:112-139) — zero extra
        # jobs/scans for the conservation check.
        from pyspark.sql import Observation

        obs = Observation(f"router_counts_{run_id}")
        observed = enriched.observe(
            obs,
            *[
                F.sum(F.when(F.col("category") == c, 1).otherwise(0)).alias(c)
                for c in CATEGORIES
            ],
        )
        tp = time.monotonic()
        sink_paths = write_sinks_single_pass(
            observed, f"{base_path}/sinks", run_id=run_id
        )
        phases["pass1_parse_route_write"] = round(time.monotonic() - tp, 2)
        tp = time.monotonic()
        by_cat = {c: n for c, n in obs.get.items() if n}
        # PASS 2: aggregates + manifest read only the slim column set from
        # this run's snapshot dir (no manifest needed for our own data).
        slim_cols = ["conv_id", "turn_idx", "role", "ts", "category",
                     "tool_name", "tool_status", "tool_latency_ms",
                     "day", "bucket"]
        # pass2_persist: the 4 pass-2 consumers (3 aggregates + completion
        # events) share one cached slim scan. A/B on the standalone 4x8
        # cluster (12M turns, both orders): persist wins summed
        # aggregates+manifest 4.3-5.6 s vs 6.5-13.2 s — the cache store
        # pays for itself by the 3rd consumer even on tmpfs storage.
        # The knob exists because the margin inverts if pass 2 ever has a
        # single consumer (memory pressure buys nothing then).
        routed = (
            spark.read.option("basePath", f"{base_path}/sinks/routed")
            .parquet(f"{base_path}/sinks/routed/runid={run_id}")
            .select(*slim_cols)
        )
        if pass2_persist:
            routed = routed.persist()
        phases["pass2_read_counts"] = round(time.monotonic() - tp, 2)
        rows_in = sum(by_cat.values())
        if rows_in == 0:
            return PipelineReport(
                run_id=run_id, rows_in=0, counts={}, sink_paths={},
                elapsed_sec=time.monotonic() - t0, turns_per_sec=0.0,
                resumed_partitions_skipped=True,
            )
        counts = _counts_from_by_cat(by_cat, DEFAULT_SINKS)
        agg_source = routed
    else:
        result = route(enriched, DEFAULT_SINKS, persist=True)
        rows_in = result.parsed.count()
        if rows_in == 0:
            return PipelineReport(
                run_id=run_id, rows_in=0, counts={}, sink_paths={},
                elapsed_sec=time.monotonic() - t0, turns_per_sec=0.0,
                resumed_partitions_skipped=True,
            )
        counts = check_conservation(result.parsed, DEFAULT_SINKS)
        sink_paths = write_sinks(result, f"{base_path}/sinks")
        agg_source = result.parsed

    tp = time.monotonic()
    if write_aggregates:
        # The three aggregates are independent consumers of the same
        # (persisted) slim scan: submit them from a small thread pool so
        # each job's straggler tail is back-filled by the next job's
        # tasks (guide §2.6 overlap-independent-jobs; Spark's scheduler
        # is fully concurrent, actions were only sequential because this
        # loop called them sequentially). Cache fill is safe under
        # concurrency — BlockManager serializes per-partition computes.
        # Job descriptions are thread-local, so the UI stays labeled.
        from concurrent.futures import ThreadPoolExecutor

        def _write_agg(item):
            name, frame = item
            ta = time.monotonic()
            frame.write.mode("overwrite").parquet(f"{base_path}/agg/{name}")
            return name, round(time.monotonic() - ta, 2)

        with ThreadPoolExecutor(max_workers=3) as pool:
            for name, sec in pool.map(
                _write_agg,
                [
                    ("conv_turn_counts", conv_turn_counts(agg_source)),
                    ("tool_rates", per_tool_call_rates(agg_source)),
                    ("hourly_errors", hourly_error_rollup(agg_source)),
                ],
            ):
                phases[f"agg_{name}"] = sec
    phases["aggregates"] = round(time.monotonic() - tp, 2)

    tp = time.monotonic()
    # close_partitions=False records OPEN events with the chunk's turn
    # watermark: the next resume continues MID-PARTITION from turn > w
    # (the growing-blob tail model, processor.go:86-116); the final chunk
    # closes the latch.
    events = completion_events(
        with_partition_cols(agg_source), run_id,
        status="closed" if close_partitions else "open",
    )
    if not resume:  # self-contained full reprocess: stamp read boundary
        events = events.withColumn(
            "superseded_asof", F.lit(read_asof).cast("timestamp")
        )
    manifest.append(events)
    phases["manifest"] = round(time.monotonic() - tp, 2)
    agg_source.unpersist()

    elapsed = time.monotonic() - t0
    return PipelineReport(
        run_id=run_id,
        rows_in=rows_in,
        counts=counts,
        sink_paths=sink_paths,
        elapsed_sec=elapsed,
        turns_per_sec=rows_in / elapsed if elapsed > 0 else 0.0,
        extras={"phases": phases},
    )
