"""End-to-end batch pipeline: scan -> parse -> enrich -> route -> aggregate,
with per-partition lineage checkpointing and idempotent resume.

This is the Spark job equivalent of the reference's service topology
(/root/reference: blob-monitor -> ingest -> extraction -> sinks; SURVEY §3):
one DataFrame DAG per run instead of long-running Kafka consumers. The
multi-stage structure is:

  input (day/bucket partitioned)
    -> anti-join closed partitions from the lineage manifest   [resume]
    -> vectorized parse kernel (map-only, no shuffle)          [parse]
    -> broadcast joins with role/tool dims (no shuffle)        [enrich]
    -> persist once; K filtered partitioned sink writes        [route]
    -> grouped/window aggregates + manifest completion events  [aggregate]

Scale notes: the only shuffles are the aggregates and the per-partition
completion rollup; sink writes reuse one persisted parse. AQE handles
runtime coalescing; hot conversations go through operators/skew.py salting
for the per-conv aggregate when requested.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..functions.parse import parse_transcripts
from ..operators.router import (
    DEFAULT_SINKS,
    RouteResult,
    check_conservation,
    route,
    with_partition_cols,
    write_sinks,
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


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    base_path: str,
    run_id: str | None = None,
    resume: bool = True,
    write_aggregates: bool = True,
    use_pandas_grok: bool = True,
) -> PipelineReport:
    """Run the full pipeline over ``transcripts``; outputs under ``base_path``.

    Idempotence contract: sink writes use dynamic partition overwrite keyed
    by (day, bucket); completion events append with a run_id that the
    manifest fold dedupes — so a crashed run re-executed with the same
    inputs converges to the same state (X3/X9/X10 in SURVEY §4).
    """
    t0 = time.monotonic()
    run_id = run_id or new_run_id()
    manifest = ManifestStore(f"{base_path}/_manifest")

    part_input = with_partition_cols(transcripts)
    if resume:
        todo = manifest.pending(spark, part_input)
    else:
        todo = part_input

    parsed = parse_transcripts(todo, use_pandas_grok=use_pandas_grok)
    enriched = enrich_with_default_dims(parsed)

    result: RouteResult = route(enriched, DEFAULT_SINKS, persist=True)
    rows_in = result.parsed.count()
    if rows_in == 0:
        return PipelineReport(
            run_id=run_id, rows_in=0, counts={}, sink_paths={},
            elapsed_sec=time.monotonic() - t0, turns_per_sec=0.0,
            resumed_partitions_skipped=True,
        )

    counts = check_conservation(result.parsed, DEFAULT_SINKS)
    sink_paths = write_sinks(result, f"{base_path}/sinks")

    if write_aggregates:
        conv_turn_counts(result.parsed).write.mode("overwrite").parquet(
            f"{base_path}/agg/conv_turn_counts"
        )
        per_tool_call_rates(result.parsed).write.mode("overwrite").parquet(
            f"{base_path}/agg/tool_rates"
        )
        hourly_error_rollup(result.parsed).write.mode("overwrite").parquet(
            f"{base_path}/agg/hourly_errors"
        )

    manifest.append(completion_events(result.parsed, run_id))
    result.parsed.unpersist()

    elapsed = time.monotonic() - t0
    return PipelineReport(
        run_id=run_id,
        rows_in=rows_in,
        counts=counts,
        sink_paths=sink_paths,
        elapsed_sec=elapsed,
        turns_per_sec=rows_in / elapsed if elapsed > 0 else 0.0,
    )
