"""Rule-driven multi-sink router with count reconciliation.

Reference parity: the extraction service's type dispatch + per-topic fan-out
(/root/reference/pipeline/extraction/internal/service/service.go:312-344,
proxy_service.go:280-313, error sink :405-444) and the ingest topic chooser
(processor.go:36-41). Spark has no native multi-output write, so the router
is K filtered appends over ONE persisted parsed frame (SURVEY §4 item 4),
with a conservation invariant  Σ sinks + skips = input  mirroring the
reference's success-counting of silent skips (service.go:232-235).

Scale notes: the parsed frame is persisted once (MEMORY_AND_DISK) so the K
sink writes each reuse the same parse work instead of re-scanning 100 TB;
each sink write is partitioned by (day, bucket(conv_id)) — the Iceberg
``days(ts), bucket(16, conv_id)`` layout — so downstream reads prune.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from ..schemas import CATEGORIES

# Sink name -> categories routed into it (FIXTURES.md §4 routed_counts).
DEFAULT_SINKS: dict[str, list[str]] = {
    "errors": ["error", "parse_error"],
    "tool_calls": ["tool_call"],
    "proxy_logs": ["proxy"],
    "http_logs": ["http"],
    "app_logs": ["app", "container"],
    "user_turns": ["user_turn"],
    "assistant_turns": ["assistant_turn"],
}
# "skipped" is deliberately not a sink: silently dropped but counted
# (service.go:232-235 semantics).

N_BUCKETS = 16


def with_partition_cols(df: DataFrame, n_buckets: int = N_BUCKETS) -> DataFrame:
    """Add Iceberg-style partition transforms: days(ts) + bucket(conv_id)."""
    return df.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


@dataclass
class RouteResult:
    parsed: DataFrame
    sink_frames: dict[str, DataFrame]
    counts: dict[str, int] = field(default_factory=dict)


def route(
    parsed: DataFrame,
    sinks: dict[str, list[str]] | None = None,
    persist: bool = True,
) -> RouteResult:
    """Split the parsed frame into per-sink frames (lazy; no action run)."""
    sinks = sinks or DEFAULT_SINKS
    known = {c for cats in sinks.values() for c in cats} | {"skipped"}
    unknown = [c for c in known if c not in CATEGORIES]
    if unknown:
        raise ValueError(f"unknown categories in sink spec: {unknown}")
    if persist:
        parsed = parsed.persist(StorageLevel.MEMORY_AND_DISK)
    frames = {
        name: parsed.filter(F.col("category").isin(cats))
        for name, cats in sinks.items()
    }
    return RouteResult(parsed=parsed, sink_frames=frames)


def routed_counts(parsed: DataFrame) -> DataFrame:
    """(category, n) — one job computes every sink/skip count at once."""
    return parsed.groupBy("category").agg(F.count("*").alias("n"))


def check_conservation(parsed: DataFrame, sinks: dict[str, list[str]] | None = None
                       ) -> dict[str, int]:
    """Assert rows(input) == Σ rows(sinks) + rows(skipped); return counts.

    Uses the single grouped count — not one action per sink — so the check
    is O(one pass) even at full scale.
    """
    sinks = sinks or DEFAULT_SINKS
    by_cat = {r["category"]: r["n"] for r in routed_counts(parsed).collect()}
    total = sum(by_cat.values())
    routed = sum(
        by_cat.get(c, 0) for cats in sinks.values() for c in cats
    )
    skipped = by_cat.get("skipped", 0)
    unrouted = total - routed - skipped
    if unrouted != 0:
        raise AssertionError(
            f"router conservation violated: total={total} routed={routed} "
            f"skipped={skipped} unrouted={unrouted} by_cat={by_cat}"
        )
    out = {f"sink:{name}": sum(by_cat.get(c, 0) for c in cats)
           for name, cats in sinks.items()}
    out["skipped"] = skipped
    out["total"] = total
    return out


def write_sinks_single_pass(
    parsed: DataFrame,
    base_path: str,
    run_id: str = "run0",
    sinks: dict[str, list[str]] | None = None,
    n_buckets: int = N_BUCKETS,
    write_salts: int = 4,
    sort_cols: tuple[str, ...] | None = None,
) -> dict[str, str]:
    """ONE write job, partitioned by (category, day, bucket): every sink
    lands in its category partition directories in a single pass over the
    parsed frame — the multi-output write the reference does with K Kafka
    producers (S5), collapsed into one Spark job.

    Snapshot discipline (Iceberg-commit analog without the runtime jar):
    each run writes into its OWN ``runid={run_id}`` directory with a fast
    task-side commit; the lineage manifest append afterwards is the atomic
    commit point. Dynamic partition overwrite is deliberately NOT used —
    its job commit renames every partition dir serially on the driver
    (~45 ms/dir; measured 45 s for 960 dirs), a hard scaling ceiling.
    Readers resolve the authoritative run per (day, bucket) from the
    manifest (``read_routed``), so uncommitted/crashed run dirs are simply
    never visible — replays converge without overwrites.

    A "sink" is the union of its category partitions; read one with
    ``read_sink``. category='skipped' rows are written too (their
    partition is NOT any sink — silent-drop-but-counted semantics,
    service.go:232-235) so counts/manifest/aggregates all derive from the
    written output without re-parsing or caching the wide frame.
    """
    sinks = sinks or DEFAULT_SINKS
    if not (run_id and run_id[0].isalpha()):
        # runid is a partition directory value; a number-like id trips
        # Spark partition-value type inference (all-digits -> LONG column
        # that breaks string matching; <digits>e<digits> -> scientific
        # notation whose Decimal expansion livelocks the driver). See
        # checkpoint.new_run_id.
        raise ValueError(
            f"run_id must start with a letter (got {run_id!r}): number-like "
            "partition values break Spark's partition type inference"
        )
    run_path = f"{base_path}/routed/runid={run_id}"
    spark = parsed.sparkSession

    def _apply_sort_cols(d: DataFrame) -> DataFrame:
        # A typo in sort_cols must not silently produce UNCLUSTERED files
        # (defeating the point-read layout the caller asked for): fail
        # loudly instead of skipping the sort.
        if not sort_cols:
            return d
        missing = [c for c in sort_cols if c not in d.columns]
        if missing:
            raise ValueError(
                f"sort_cols {missing} not in frame columns; "
                "ingest-time clustering would be silently skipped"
            )
        return d.sortWithinPartitions("category", "day", "bucket", *sort_cols)
    # Write-task count sized by shuffle partitioning, floored at the core
    # count: fewer tasks than shuffle.partitions makes each task sort its
    # whole slice of the run in memory (dynamic-partition writes sort by
    # partition cols) and spill — measured 3x slower pass1 at 8 cores.
    n_tasks = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    (
        with_partition_cols(parsed, n_buckets)
        # hash-distribute on the partition keys before the write (the
        # Iceberg write.distribution-mode=hash analog): each task owns a
        # small set of (day, bucket, salt) units and writes at most
        # write_salts files per partition dir instead of every task
        # spraying files into every dir. The conv-hash salt matters at
        # scale: with tasks >> distinct (day,bucket) groups, hash
        # collisions otherwise leave straggler tasks holding 2-3 whole
        # groups while other cores idle (measured as the pass-1 tail at
        # 4x8 executors).
        .withColumn(
            "_wsalt", F.pmod(F.xxhash64("conv_id"), F.lit(write_salts))
        )
        .repartition(n_tasks, F.col("day"), F.col("bucket"), F.col("_wsalt"))
        .drop("_wsalt")
        # Optional ingest-time file clustering (sort_cols): extends the
        # writer's required partition-column sort with e.g. (conv_id,
        # turn_idx) for parquet row-group min/max skipping on point
        # reads. OFF by default — the wider sort key measured ~10% on
        # pass-1 wall time (interleaved A/B at 4M turns: 27.0/29.2 s
        # sorted vs 25.8/25.4 unsorted), and the Iceberg posture is to
        # cluster at COMPACTION, not ingest: compact_routed applies this
        # sort when it rewrites closed partitions, so maintained tables
        # get the clustered layout without taxing the hot path.
        .transform(_apply_sort_cols)
        .write.mode("overwrite")
        # static overwrite of this run's own dir (v2 task-side commit);
        # NEVER the serial dynamic-partition staging path
        .option("partitionOverwriteMode", "static")
        .partitionBy("category", "day", "bucket")
        .parquet(run_path)
    )
    # Hadoop-glob paths: each sink reads exactly its category partitions
    # (read via read_sink(), which sets basePath for partition discovery)
    return {
        name: f"{run_path}/category={{{','.join(cats)}}}"
        for name, cats in sinks.items()
    }


def read_sink(spark, sink_path: str) -> DataFrame:
    """Read a sink written by write_sinks_single_pass (glob of category
    partition dirs inside one run dir). basePath points at the routed root
    so runid/day/bucket/category partition columns resolve and partition
    pruning applies."""
    base = sink_path.split("/runid=")[0]
    return spark.read.option("basePath", base).parquet(sink_path)


def read_routed(
    spark, pipeline_base: str, incremental: bool = False, asof=None
) -> DataFrame:
    """Authoritative snapshot read of the routed table — the reader-side
    half of the Iceberg-style commit protocol. Uncommitted run dirs
    (crashed before their manifest append) are never visible.

    - incremental=False (batch ownership): per (day, bucket), the LATEST
      committed run's rows win — correct when runs own whole partitions
      (the resume anti-join guarantees disjointness; a forced reprocess
      supersedes the old snapshot).
    - asof (datetime): TIME TRAVEL — resolve the snapshot a reader saw
      at that instant (the Iceberg TIMESTAMP AS OF analog; an append-only
      manifest makes this a filter on commit time). History reaches back
      as far as vacuum has not yet reclaimed superseded run dirs.
    - incremental=True (streaming appends): rows of every VISIBLE
      committed run — chunk runs append disjoint row sets (batch_id-keyed
      run dirs make replays overwrite themselves, so no duplicates), and a
      self-contained run (``compact``/``full`` prefix) supersedes all runs
      committed before it, so compacted-but-not-yet-vacuumed partitions
      and forced reprocesses read exactly once.

    Scale: the manifest holds one row per (day, bucket[, run]); the
    authoritative triple set is collected (thousands of rows) into an isin
    filter on partition columns, so file-index pruning drops
    non-authoritative run dirs before any data IO.
    """
    from ..plans.checkpoint import ManifestStore

    manifest = ManifestStore(f"{pipeline_base}/_manifest")
    if incremental:
        auth = manifest.visible_runs(spark, asof=asof)
    else:
        auth = manifest.current_state(spark, asof=asof).select(
            "day", "bucket", "run_id"
        )
    triples = [
        f"{r['run_id']}\x1f{r['day']}\x1f{r['bucket']}" for r in auth.collect()
    ]
    routed = spark.read.parquet(f"{pipeline_base}/sinks/routed")
    key = F.concat_ws(
        "\x1f", F.col("runid"), F.col("day"), F.col("bucket").cast("string")
    )
    return routed.filter(key.isin(triples))


def read_conversation(
    spark,
    pipeline_base: str,
    conv_id: str,
    incremental: bool = False,
) -> DataFrame:
    """Point read of one conversation from the routed table — the layout's
    fast path, exercising both pruning tiers the writer set up:

    1. **Partition pruning**: bucket is a pure function of conv_id
       (``pmod(xxhash64(conv_id), N_BUCKETS)``, with_partition_cols), so
       recomputing it here turns the read into an equality filter on a
       partition column — the file index drops every other bucket dir
       before any data IO (1/N_BUCKETS of the files, per category/day).
    2. **Row-group skipping**: on compacted partitions (compact_routed
       clusters each file by (conv_id, turn_idx); ingest-time clustering
       is available via write_sinks_single_pass sort_cols), the pushed
       conv_id equality prunes on tight parquet min/max footer stats —
       the scan decodes only the row groups holding this conversation.
       Uncompacted chunk files still benefit from the pushed filter, just
       with looser stats.

    At 100 TB this is the difference between a full-bucket scan and a
    few-MB read; no index structure to maintain, just layout.
    """
    # recompute the writer's bucket transform on the executor-side hash
    # (a 1-row local job; F.lit keeps arbitrary conv_id values safe)
    bucket = (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(conv_id)), F.lit(N_BUCKETS))
            .cast("int")
            .alias("b")
        )
        .first()["b"]
    )
    routed = read_routed(spark, pipeline_base, incremental=incremental)
    return routed.filter(
        (F.col("bucket") == bucket) & (F.col("conv_id") == conv_id)
    ).orderBy("turn_idx")


def vacuum_uncommitted(
    spark, pipeline_base: str, min_age_seconds: int = 3600
) -> list[str]:
    """Delete run dirs never referenced by any manifest commit — the
    expire-orphan-snapshots maintenance op (Iceberg expire_snapshots
    analog). All listing/deletion goes through the Hadoop FileSystem API,
    so it runs against any store the cluster can reach (S3/HDFS/ABFS),
    not just the local filesystem.

    ``min_age_seconds`` (default 1 h) protects IN-FLIGHT writes: a run
    dir with no manifest commit is indistinguishable from a job that is
    mid-write and has simply not reached its commit point yet, so only
    subtrees whose newest file mtime is older than the threshold are
    reclaimed (same rationale as Iceberg's
    remove_orphan_files(older_than)). Pass 0 only when no writer can be
    live (tests, single-writer cron gaps). Returns removed paths."""
    import time

    from ..plans.checkpoint import ManifestStore
    from ..util import fs_delete, fs_glob, fs_newest_mtime_ms

    manifest = ManifestStore(f"{pipeline_base}/_manifest")
    committed = {
        r["run_id"] for r in manifest.committed_runs(spark).collect()
    }
    cutoff_ms = (time.time() - min_age_seconds) * 1000
    removed = []
    root = f"{pipeline_base}/sinks/routed"
    for d in fs_glob(spark, f"{root}/runid=*"):
        rid = d.rstrip("/").rsplit("/", 1)[-1].split("=", 1)[1]
        if rid not in committed and fs_newest_mtime_ms(spark, d) <= cutoff_ms:
            fs_delete(spark, d)
            removed.append(d)
    return removed


def compact_routed(
    spark,
    pipeline_base: str,
    run_id: str | None = None,
) -> dict:
    """Rewrite-small-files / consolidate-snapshots maintenance op — the
    Iceberg ``rewrite_data_files`` analog (SURVEY §4 X9) on the
    snapshot-dir protocol. Incremental ingestion legitimately fragments a
    partition: every committed chunk is its own ``runid=`` dir, so a
    (day, bucket) closed after N chunk commits carries N small file sets
    (and is only readable via the incremental union). This op rewrites
    each such CLOSED partition's full committed row set (union across its
    chunk runs) into a fresh run dir with ONE file per
    (category, day, bucket) dir, then commits via a zero-count manifest
    event: fold sums stay exact, the null watermark keeps the monotonic
    max, the closed latch stays closed, and latest-wins run metadata flips
    authoritative BATCH reads to the compacted copy — after which batch
    reads are correct for chunk-committed partitions too, not just
    whole-partition runs. Open partitions are skipped (tails still grow).

    Selection: a closed partition compacts when its committed rows span
    >1 run dir, or any of its partition dirs holds >1 file. Already-minimal
    partitions are untouched (idempotent).

    Commit safety is inherited from the write protocol: a crash before the
    manifest append leaves an orphan run dir that ``vacuum_uncommitted``
    removes; readers never see it. The superseded chunk dirs stay on disk
    (incremental readers of OTHER partitions are unaffected; incremental
    reads of compacted partitions would double-count) — reclaim them with
    ``vacuum_superseded(spark, base, run_id)``, after which batch and
    incremental reads agree.

    Scale: one shuffle of the compacted partitions' rows, hash-distributed
    on the partition key so each (category, day, bucket) group lands in
    exactly one task => exactly one output file; the driver only ever
    handles manifest-sized partition lists and file metadata.

    Returns {"run_id", "partitions", "files_before", "files_after"}.
    """
    from ..plans.checkpoint import ManifestStore, new_run_id
    from ..util import fs_glob

    if run_id is not None and not run_id.startswith("compact"):
        raise ValueError(
            f"compaction run_id must carry the reserved 'compact' prefix "
            f"(got {run_id!r}) — it marks the snapshot as self-contained "
            "for later maintenance passes"
        )
    manifest = ManifestStore(f"{pipeline_base}/_manifest")
    # Supersession boundary: everything this compaction consolidates was
    # committed BEFORE this instant; a chunk that commits after it (while
    # the rewrite below runs) is not in the source set and must stay
    # visible — visible_runs orders supersession by this read-asof, not
    # by the compact commit's wall clock.
    read_asof = datetime.now(timezone.utc)
    state = manifest.current_state(spark)
    closed = {
        (r["day"], r["bucket"])
        for r in state.filter(F.col("status") == "closed").collect()
    }
    root = f"{pipeline_base}/sinks/routed"
    # The COMPLETE row set of a closed partition is the manifest's VISIBLE
    # run set (checkpoint.ManifestStore.visible_runs): the latest
    # self-contained run — a "compact" snapshot OR a "full" forced
    # reprocess — plus chunk runs committed after it; all chunk runs when
    # no self-contained run exists. Unioning ALL committed runs instead
    # would permanently duplicate every row of partitions carrying
    # overlapping whole-partition runs (forced reprocess over earlier
    # commits, or re-compaction before vacuum_superseded ran).
    visible: dict[tuple, set[str]] = {}
    for r in manifest.visible_runs(spark).collect():
        visible.setdefault((r["day"], r["bucket"]), set()).add(r["run_id"])

    def files_in(runs: set[str], day: str, bucket) -> tuple[int, int]:
        files = [
            p
            for rid in runs
            for p in fs_glob(
                spark,
                f"{root}/runid={rid}/category=*/day={day}/"
                f"bucket={bucket}/*.parquet",
            )
        ]
        return len(files), len({p.rsplit("/", 1)[0] for p in files})

    todo: dict[tuple, set[str]] = {}
    files_before = 0
    for day, bucket in closed:
        source_runs = visible.get((day, bucket), set())
        n_files, n_dirs = files_in(source_runs, day, bucket)
        if len(source_runs) > 1 or n_files > n_dirs:
            todo[(day, bucket)] = source_runs
            files_before += n_files
    if not todo:
        return {"run_id": None, "partitions": 0, "files_before": 0,
                "files_after": 0}

    run_id = run_id or f"compact{new_run_id()[:8]}"
    triples = [
        f"{rid}\x1f{d}\x1f{b}"
        for (d, b), runs in todo.items()
        for rid in runs
    ]
    routed = spark.read.parquet(f"{root}")
    rkey = F.concat_ws(
        "\x1f", F.col("runid"), F.col("day"), F.col("bucket").cast("string")
    )
    (
        routed.filter(rkey.isin(triples))
        # runid is a PATH-derived partition column of the source read;
        # carrying it into the new files would bake a stale data column
        # that shadows under the new runid= dir
        .drop("runid")
        # one task per (category, day, bucket) group -> one file per dir
        .repartition(F.col("category"), F.col("day"), F.col("bucket"))
        # table sort order applied at compaction (the Iceberg posture —
        # ingest stays unsorted/fast): cluster each rewritten file by
        # (conv_id, turn_idx) so conv point reads (read_conversation)
        # skip row groups on tight min/max stats, and co-located conv
        # rows dictionary/RLE-compress better. Same single task sort the
        # partitioned write needs anyway, wider key.
        .sortWithinPartitions(
            "category", "day", "bucket", "conv_id", "turn_idx"
        )
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("category", "day", "bucket")
        .parquet(f"{root}/runid={run_id}")
    )
    events = spark.createDataFrame(
        [(d, b, "closed", None, 0, 0, 0, 0, None, None, run_id, read_asof)
         for d, b in todo],
        "day string, bucket int, status string, max_turn_watermark long, "
        "rows_processed long, rows_routed long, rows_skipped long, "
        "rows_error long, first_processed_ts timestamp, "
        "last_processed_ts timestamp, run_id string, "
        "superseded_asof timestamp",
    ).withColumn("updated_at", F.current_timestamp())
    manifest.append(events)
    files_after = len(
        fs_glob(
            spark,
            f"{root}/runid={run_id}/category=*/day=*/bucket=*/*.parquet",
        )
    )
    return {"run_id": run_id, "partitions": len(todo),
            "files_before": files_before, "files_after": files_after}


def vacuum_superseded(spark, pipeline_base: str, compacted_run_id: str
                      ) -> list[str]:
    """Delete the (runid, day, bucket) subtrees that a committed
    SELF-CONTAINED run superseded — the remove-orphan-files half of
    snapshot maintenance. Deliberately scoped to partitions whose
    AUTHORITATIVE run is ``compacted_run_id``, and that run must carry a
    self-contained prefix (``compact`` snapshot or ``full`` reprocess):
    only such runs are guaranteed to contain a partition's complete row
    set, so deleting other runs' subtrees there can never lose rows (an
    unscoped "delete non-authoritative dirs" would destroy earlier chunks
    of chunk-committed partitions). After this, batch and incremental
    reads of those partitions resolve identically. Returns removed
    paths."""
    from ..plans.checkpoint import (
        SELF_CONTAINED_PREFIXES,
        ManifestStore,
    )
    from ..util import fs_delete, fs_glob

    if not compacted_run_id.startswith(SELF_CONTAINED_PREFIXES):
        raise ValueError(
            f"vacuum_superseded requires a self-contained run id "
            f"({'/'.join(SELF_CONTAINED_PREFIXES)} prefix), got "
            f"{compacted_run_id!r}: only such runs hold a partition's "
            "complete row set, so scoping deletion to anything else could "
            "destroy live chunk data"
        )

    manifest = ManifestStore(f"{pipeline_base}/_manifest")
    owned = {
        (r["day"], r["bucket"])
        for r in manifest.current_state(spark)
        .filter(
            (F.col("status") == "closed")
            & (F.col("run_id") == compacted_run_id)
        )
        .collect()
    }
    removed = []
    root = f"{pipeline_base}/sinks/routed"
    for d in fs_glob(spark, f"{root}/runid=*/category=*/day=*/bucket=*"):
        parts = d.rstrip("/").split("/")
        rid = parts[-4].split("=", 1)[1]
        day = parts[-2].split("=", 1)[1]
        bucket = int(parts[-1].split("=", 1)[1])
        if rid != compacted_run_id and (day, bucket) in owned:
            fs_delete(spark, d)
            removed.append(d)
    return removed


def write_sinks(
    result: RouteResult,
    base_path: str,
    mode: str = "overwrite",
    n_buckets: int = N_BUCKETS,
) -> dict[str, str]:
    """Write each sink frame as parquet partitioned by (day, bucket).

    With ``spark.sql.sources.partitionOverwriteMode=dynamic`` an overwrite
    only replaces partitions present in the incoming frame — the parquet
    stand-in for an Iceberg partition-level commit (idempotent re-runs).
    """
    paths: dict[str, str] = {}
    for name, frame in result.sink_frames.items():
        path = f"{base_path}/{name}"
        (
            with_partition_cols(frame, n_buckets)
            .write.mode(mode)
            .partitionBy("day", "bucket")
            .parquet(path)
        )
        paths[name] = path
    return paths


def partition_file_stats(
    spark, pipeline_base: str, incremental: bool = False
) -> DataFrame:
    """Physical A8 stats for the routed layout: per (day, bucket) row,
    FILE, and BYTE counts straight from the parquet scan's ``_metadata``
    hidden column (file_path/file_size) — no driver-side filesystem
    listing, fully distributed, and partition-pruned like any other read.
    The per-file grouping happens first so file sizes are counted once,
    not once per row. MANIFEST-GATED exactly like ``read_routed`` (same
    incremental switch): orphaned/uncommitted run dirs and snapshots
    superseded by a compaction never inflate the counts."""
    df = read_routed(spark, pipeline_base, incremental=incremental).select(
        "day",
        "bucket",
        F.col("_metadata.file_path").alias("_fp"),
        F.col("_metadata.file_size").alias("_fs"),
    )
    per_file = df.groupBy("day", "bucket", "_fp", "_fs").agg(
        F.count("*").alias("_rows")
    )
    return per_file.groupBy("day", "bucket").agg(
        F.sum("_rows").alias("n_rows"),
        F.count("*").alias("n_files"),
        F.sum("_fs").alias("total_bytes"),
    )
