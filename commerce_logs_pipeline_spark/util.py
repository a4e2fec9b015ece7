"""Plan-level sizing helpers shared by pipeline and dedup operators."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def parse_bytes(s: str) -> int:
    """'16m' / '134217728' / '1g' -> bytes (Spark conf byte-string grammar)."""
    s = s.strip().lower()
    for suffix, mult in _UNITS.items():
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(s)


def estimated_scan_partitions(df: DataFrame, cap: int) -> int:
    """Estimate how many input splits a file-backed scan yields, without
    converting the plan to an RDD (``df.rdd.getNumPartitions()`` forces
    plan-to-RDD conversion — needless work on a column-pruned scan, and it
    pins the exact partitioning when only "enough splits?" is asked).

    Counts ``df.inputFiles()`` and, only when the file count alone is below
    ``cap``, stats those few files driver-side to add per-file splits at
    spark.sql.files.maxPartitionBytes granularity. Returns a value >= cap
    as soon as the estimate reaches it (callers only branch on < cap).
    Returns 0 for non-file-backed frames (local relations, shuffled plans)
    — callers should treat those as "unknown, repartition" (they are
    test-sized in practice; every real input is a file scan).
    """
    try:
        files = df.inputFiles()
    except Exception:
        return 0
    if not files:
        return 0
    if len(files) >= cap:
        return len(files)
    spark = df.sparkSession
    try:
        mpb = parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        jvm = spark._jvm
        jconf = spark.sparkContext._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            size = p.getFileSystem(jconf).getFileStatus(p).getLen()
            total += max(1, math.ceil(size / mpb))
            if total >= cap:
                return total
        return total
    except Exception:
        # Spark Connect / exotic filesystems: fall back to file count
        return len(files)


def ensure_min_partitions(df: DataFrame, min_parts: int) -> DataFrame:
    """Round-robin repartition iff the scan is under-split for ``min_parts``
    parallel tasks. File-backed scans that already carry enough splits pass
    through untouched (no shuffle — the normal case at real scale);
    non-file-backed frames repartition unconditionally (unknown and
    test-sized)."""
    if estimated_scan_partitions(df, min_parts) >= min_parts:
        return df
    return df.repartition(min_parts)
