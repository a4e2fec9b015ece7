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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from ..schemas import MANIFEST_SCHEMA

KEY = ["day", "bucket"]

# Run-id prefixes that declare a run SELF-CONTAINED: it holds its
# partitions' ENTIRE row set, superseding every run committed before it
# ("compact" = maintenance snapshot from compact_routed, "full" = forced
# whole-partition reprocess). Everything else is a CHUNK (disjoint append:
# resume tails, streaming batch-N micro-batches). The distinction is what
# lets incremental readers and compaction union chunk runs without double
# counting overlapping whole-partition runs.
SELF_CONTAINED_PREFIXES = ("compact", "full")


def is_self_contained(run_col: Column) -> Column:
    """Column predicate: does this run_id declare a self-contained run?"""
    cond = F.lit(False)
    for p in SELF_CONTAINED_PREFIXES:
        cond = cond | run_col.startswith(p)
    return cond


def new_run_id() -> str:
    """Letter-prefixed so the id can NEVER be number-like. run_id is a
    partition directory value (``runid=<id>``), and Spark's partition-value
    type inference parses bare values: an all-digit hex id silently infers
    as LONG (string comparisons in read_routed then match nothing), and a
    ``<digits>e<digits>`` id parses as scientific notation whose
    Decimal(10^huge) materialization livelocks the driver for hours
    (observed: runid with exponent 8e8 pinned a driver core >45 min in
    BigInteger.pow). ~1 in 130 uuid-hex 12-char prefixes hits one of the
    two. The leading letter forces string inference."""
    return "r" + uuid.uuid4().hex[:11]


class ManifestStore:
    """Append-only lineage manifest over a parquet directory."""

    def __init__(self, path: str):
        self.path = path

    def append(self, events: DataFrame) -> None:
        """Append completion events (schema = MANIFEST_SCHEMA; optional
        trailing fields like ``superseded_asof`` are null-filled so
        chunk-event producers don't have to carry them)."""
        for f in MANIFEST_SCHEMA.fields:
            if f.name not in events.columns:
                events = events.withColumn(f.name, F.lit(None).cast(f.dataType))
        events.select([f.name for f in MANIFEST_SCHEMA.fields]).write.mode(
            "append"
        ).parquet(self.path)

    def _read_log(self, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)
        except AnalysisException:
            return spark.createDataFrame([], MANIFEST_SCHEMA)

    def _log_asof(self, spark: SparkSession, asof=None) -> DataFrame:
        """The event log, optionally truncated to commits at or before
        ``asof`` — an append-only log makes time travel a filter."""
        log = self._read_log(spark)
        if asof is not None:
            log = log.filter(F.col("updated_at") <= F.lit(asof))
        return log

    def current_state(self, spark: SparkSession, asof=None) -> DataFrame:
        """Fold the event log into latest state per (day, bucket).
        ``asof`` (datetime) folds only events committed at or before that
        instant — the table state as a past reader saw it."""
        return fold_manifest(self._log_asof(spark, asof))

    def committed_runs(self, spark: SparkSession) -> DataFrame:
        """Every committed (day, bucket, run_id) triple in the log —
        the full snapshot lineage (includes superseded runs; most readers
        want ``visible_runs``)."""
        return self._read_log(spark).select(*KEY, "run_id").dropDuplicates()

    def visible_runs(self, spark: SparkSession, asof=None) -> DataFrame:
        """(day, bucket, run_id) triples that together hold each
        partition's complete current row set, under the supersede
        convention: the LATEST self-contained run (``compact``/``full``
        prefix — see SELF_CONTAINED_PREFIXES) anchors the partition and
        hides every run committed before it; chunk runs committed after
        the anchor still append; with no anchor, every committed chunk is
        visible (disjoint appends). This is what incremental reads and
        compaction must union — ``committed_runs`` would double-count
        partitions that carry overlapping whole-partition runs (a forced
        reprocess, or a compaction whose superseded chunks have not been
        vacuumed yet).

        Supersession ordering: a self-contained run hides only what it
        actually consolidated — its boundary is ``superseded_asof`` (the
        wall-clock instant it READ its sources, recorded by
        compact_routed / full reprocess) falling back to commit time for
        pre-r5 events. A chunk that commits while a compaction is in
        flight therefore stays visible (its commit time is after the
        compactor's read boundary) instead of being lost to the anchor
        and then vacuum-deleted. Residual caveat: two concurrent
        MAINTENANCE writers are still undefined (single maintenance
        writer at a time; normal chunk writers are safe).

        ``asof`` (datetime) evaluates visibility against only the events
        committed at or before that instant — snapshot time travel (the
        Iceberg TIMESTAMP AS OF analog): runs committed later do not
        exist, later anchors do not supersede, vacuumed-away history is
        of course gone (retention = what vacuum has not yet reclaimed).

        Scale: manifest-sized frames throughout (one row per partition
        per run); the anchor join is broadcast."""
        per_run = (
            self._log_asof(spark, asof)
            .groupBy(*KEY, "run_id")
            .agg(
                F.max("updated_at").alias("_ts"),
                F.min("superseded_asof").alias("_asof"),
            )
            .withColumn("_sc", is_self_contained(F.col("run_id")))
            .withColumn("_b", F.coalesce("_asof", "_ts"))
        )
        anchor = (
            per_run.filter(F.col("_sc"))
            .groupBy(*KEY)
            .agg(
                F.max(
                    F.struct(F.col("_b"), F.col("run_id").alias("_rid"))
                ).alias("_a")
            )
            .select(
                *KEY,
                F.col("_a._b").alias("_ab"),
                F.col("_a._rid").alias("_arid"),
            )
        )
        return (
            per_run.join(F.broadcast(anchor), on=KEY, how="left")
            .filter(
                F.col("_ab").isNull()
                | (F.col("run_id") == F.col("_arid"))
                | ((~F.col("_sc")) & (F.col("_ts") > F.col("_ab")))
            )
            .select(*KEY, "run_id")
        )

    def seal_partitions(
        self, spark: SparkSession, before_day: str | None = None
    ) -> list[tuple[str, int]]:
        """Seal open partitions: append a pure status latch (closed, NULL
        counts, no data directory) for every currently-open (day, bucket)
        — all of them, or only days strictly before ``before_day``. The
        streaming operational loop is: tail appends chunk runs -> seal
        days that have ended -> compact_routed consolidates the sealed
        partitions -> vacuum_superseded reclaims the chunks. Without
        sealing, chunk-committed partitions stay open forever and are
        never compactable (compact_routed only touches closed ones).

        The latch never reopens, so sealing is idempotent; a seal event
        carries NULL counts so fold_manifest's latest-wins run resolution
        ignores it (batch reads keep resolving the last DATA run). Late
        chunks arriving after the seal are the operator's contract to
        avoid — batch resume anti-joins sealed partitions, and the
        streaming writer appends regardless (the same close-latch
        semantics as the reference's blob state processor).

        Returns the (day, bucket) pairs sealed.
        """
        open_parts = self.current_state(spark).filter(
            F.col("status") == "open"
        )
        if before_day is not None:
            open_parts = open_parts.filter(F.col("day") < before_day)
        todo = [(r["day"], r["bucket"]) for r in
                open_parts.select(*KEY).collect()]
        if not todo:
            return []
        run_id = f"seal{new_run_id()[:8]}"
        events = spark.createDataFrame(
            [(d, b, "closed", run_id) for d, b in todo],
            "day string, bucket int, status string, run_id string",
        ).withColumn("updated_at", F.current_timestamp())
        self.append(events)
        return todo

    def closed_partitions(self, spark: SparkSession) -> DataFrame:
        return self.current_state(spark).filter(F.col("status") == "closed").select(*KEY)

    def pending(
        self,
        spark: SparkSession,
        partitioned_input: DataFrame,
        turn_col: str = "turn_idx",
        routed_path: str | None = None,
        stream_col: str = "conv_id",
    ) -> DataFrame:
        """Rows still needing ingestion — TWO granularities, mirroring the
        reference's resume ladder (worker.go:346-351 partition skip +
        processor.go:86-116 mid-blob offset resume):

        - CLOSED (day, bucket) partitions drop entirely (anti-join);
        - OPEN partitions resume MID-PARTITION at PER-CONVERSATION
          granularity when ``routed_path`` is given: the committed output
          of the open partitions is scanned (two slim columns, partition-
          pruned to the open tail) for each conversation's max ingested
          ``turn_col``, and only rows beyond their own conversation's
          watermark flow. This is the exact analog of the reference's
          per-blob ``lastIngestedOffset`` (one offset per stream, not per
          partition): conversations that advance unevenly within one
          (day, bucket) partition never lose rows to a partition-wide max.
        - with ``routed_path=None`` the coarser partition-level watermark
          applies (``turn_col > max_turn_watermark``) — safe only under a
          uniform-tail contract where every committed chunk carries all
          conversations of the partition to the same turn depth;
        - unseen partitions / unseen conversations flow whole.

        Scale: the manifest sides are tiny (one row per partition) ->
        broadcast; the per-conversation watermark frame is one row per
        conversation in the OPEN partitions only (the recent tail, a sliver
        of the table) and joins distributed — never collected.
        """
        state = self.current_state(spark)
        closed = state.filter(F.col("status") == "closed").select(*KEY)
        out = partitioned_input.join(F.broadcast(closed), on=KEY, how="left_anti")

        open_rows = state.filter(F.col("status") == "open").select(*KEY).collect()
        if not open_rows:
            return out
        if routed_path is None:
            open_wm = (
                state.filter(
                    (F.col("status") == "open")
                    & F.col("max_turn_watermark").isNotNull()
                )
                .select(*KEY, F.col("max_turn_watermark").alias("_wm"))
            )
            return (
                out.join(F.broadcast(open_wm), on=KEY, how="left")
                .filter(F.col("_wm").isNull() | (F.col(turn_col) > F.col("_wm")))
                .drop("_wm")
            )

        # per-conversation watermarks from the committed snapshot dirs of
        # the open partitions (manifest-sized driver data selects the dirs;
        # the scan itself reads only (stream, turn) + partition columns)
        open_set = {(r["day"], r["bucket"]) for r in open_rows}
        triples = [
            f"{r['run_id']}\x1f{r['day']}\x1f{r['bucket']}"
            for r in self.visible_runs(spark).collect()
            if (r["day"], r["bucket"]) in open_set
        ]
        if not triples:
            return out
        try:
            routed = spark.read.parquet(routed_path)
        except AnalysisException:
            return out  # nothing ever written: everything is pending
        rkey = F.concat_ws(
            "\x1f", F.col("runid"), F.col("day"), F.col("bucket").cast("string")
        )
        conv_wm = (
            routed.filter(rkey.isin(triples))
            .groupBy(*KEY, stream_col)
            .agg(F.max(turn_col).alias("_cwm"))
        )
        return (
            out.join(conv_wm, on=KEY + [stream_col], how="left")
            .filter(F.col("_cwm").isNull() | (F.col(turn_col) > F.col("_cwm")))
            .drop("_cwm")
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
        # latest-wins run meta over DATA-CARRYING events only: pure latch
        # events (seal_partitions appends status=closed with NULL counts)
        # must flip the status without hijacking the authoritative run_id
        # — batch reads resolve rows by this run_id, and a seal run has
        # no data directory. max_by skips rows whose ordering key is null.
        F.max_by(
            "run_id",
            F.when(F.col("rows_processed").isNotNull(), F.col("updated_at")),
        ).alias("run_id"),
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
