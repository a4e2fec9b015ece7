"""Per-partition lineage manifest with idempotent resume.

Reference parity: the compacted ``Ingestion.BlobState`` topic + fold logic
(/root/reference/pipeline/blob-monitor/internal/service/
blob_state_processor.go:163-375 and configs/kafka_topics.yaml:5-9) and the
worker's resume-from-state loop (pipeline/ingest/internal/service/
worker.go:307-413). Semantics preserved:

- the manifest is an APPEND-ONLY event log of per-(day, bucket) completion
  events; current state = fold of the log (exactly how the reference replays
  the compacted topic into its in-memory map, :289-375);
- watermark is MONOTONIC — ``max`` over events, "never go backwards"
  (worker.go:378-385);
- counts are summed (totalLinesIngested accumulation, :255);
- the open->closed status latch never reopens (:195-198, :224);
- duplicate deliveries are idempotent: events are deduped on
  (day, bucket, run_id) before folding (at-least-once + idempotent keys,
  docs/trace-model.md:50-57).

Scale notes: the manifest holds one row per (day, bucket) partition — for a
10^12-turn table with days(ts) x bucket(16) that is thousands of rows, so
fold + anti-join are trivially broadcastable; the data-side writes stay
partition-parallel and the driver never touches row-level data.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from ..schemas import MANIFEST_SCHEMA

KEY = ["day", "bucket"]


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


class ManifestStore:
    """Append-only lineage manifest over a parquet directory."""

    def __init__(self, path: str):
        self.path = path

    def append(self, events: DataFrame) -> None:
        """Append completion events (schema = MANIFEST_SCHEMA)."""
        events.select([f.name for f in MANIFEST_SCHEMA.fields]).write.mode(
            "append"
        ).parquet(self.path)

    def _read_log(self, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)
        except AnalysisException:
            return spark.createDataFrame([], MANIFEST_SCHEMA)

    def current_state(self, spark: SparkSession) -> DataFrame:
        """Fold the event log into latest state per (day, bucket)."""
        return fold_manifest(self._read_log(spark))

    def committed_runs(self, spark: SparkSession) -> DataFrame:
        """Every committed (day, bucket, run_id) triple in the log —
        the full snapshot lineage (incremental/streaming visibility)."""
        return self._read_log(spark).select(*KEY, "run_id").dropDuplicates()

    def closed_partitions(self, spark: SparkSession) -> DataFrame:
        return self.current_state(spark).filter(F.col("status") == "closed").select(*KEY)

    def pending(
        self,
        spark: SparkSession,
        partitioned_input: DataFrame,
        turn_col: str = "turn_idx",
    ) -> DataFrame:
        """Rows still needing ingestion — TWO granularities, mirroring the
        reference's resume ladder (worker.go:346-351 partition skip +
        processor.go:86-116 mid-blob offset resume):

        - CLOSED (day, bucket) partitions drop entirely (anti-join);
        - OPEN partitions with a recorded watermark resume MID-PARTITION:
          only rows with ``turn_col > max_turn_watermark`` flow. The
          watermark contract is the append-only tail model — a committed
          chunk contains every turn with turn_idx <= w for all
          conversations in the partition (the analog of a blob's
          lastIngestedOffset: new lines only ever append);
        - unseen partitions flow whole.

        Both manifest sides are tiny (one row per partition) -> broadcast.
        """
        state = self.current_state(spark)
        closed = state.filter(F.col("status") == "closed").select(*KEY)
        open_wm = (
            state.filter(
                (F.col("status") == "open")
                & F.col("max_turn_watermark").isNotNull()
            )
            .select(*KEY, F.col("max_turn_watermark").alias("_wm"))
        )
        out = partitioned_input.join(F.broadcast(closed), on=KEY, how="left_anti")
        return (
            out.join(F.broadcast(open_wm), on=KEY, how="left")
            .filter(F.col("_wm").isNull() | (F.col(turn_col) > F.col("_wm")))
            .drop("_wm")
        )


def fold_manifest(log: DataFrame) -> DataFrame:
    """Pure fold of a completion-event log into latest state per
    (day, bucket) — the compacted-topic replay semantics
    (blob_state_processor.go:163-375): status latch (closed never reopens),
    MONOTONIC watermark (max; worker.go:378-385 "never go backwards"),
    summed counters, first/last observed, latest-wins run metadata.
    Duplicate deliveries dedup on (day, bucket, run_id) first
    (at-least-once + idempotent keys)."""
    log = log.dropDuplicates(KEY + ["run_id"])
    return log.groupBy(*KEY).agg(
        # status latch: closed wins and never reopens
        F.when(F.max(F.when(F.col("status") == "closed", 1).otherwise(0)) == 1,
               F.lit("closed")).otherwise(F.lit("open")).alias("status"),
        F.max("max_turn_watermark").alias("max_turn_watermark"),  # monotonic
        F.sum("rows_processed").alias("rows_processed"),
        F.sum("rows_routed").alias("rows_routed"),
        F.sum("rows_skipped").alias("rows_skipped"),
        F.sum("rows_error").alias("rows_error"),
        F.min("first_processed_ts").alias("first_processed_ts"),
        F.max("last_processed_ts").alias("last_processed_ts"),
        F.max_by("run_id", "updated_at").alias("run_id"),  # latest-wins meta
        F.max("updated_at").alias("updated_at"),
    )


def completion_events(
    parsed_with_parts: DataFrame, run_id: str, status: str = "closed"
) -> DataFrame:
    """Per-(day,bucket) completion events from one processed batch —
    BlobCompletionEvent analog (events/blob.go:46-54: fromOffset/toOffset/
    linesSent -> watermark/counts)."""
    return (
        parsed_with_parts.groupBy(*KEY)
        .agg(
            F.max("turn_idx").cast("long").alias("max_turn_watermark"),
            F.count("*").alias("rows_processed"),
            F.sum(
                F.when(~F.col("category").isin("skipped"), 1).otherwise(0)
            ).alias("rows_routed"),
            F.sum(F.when(F.col("category") == "skipped", 1).otherwise(0)).alias(
                "rows_skipped"
            ),
            F.sum(
                F.when(F.col("category").isin("error", "parse_error"), 1).otherwise(0)
            ).alias("rows_error"),
            F.min("ts").alias("first_processed_ts"),
            F.max("ts").alias("last_processed_ts"),
        )
        .withColumn("status", F.lit(status))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("updated_at", F.current_timestamp())
    )
