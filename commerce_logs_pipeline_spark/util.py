"""Plan-level sizing helpers shared by pipeline and dedup operators."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

_UNITS = {
    "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40,
    "p": 1 << 50,
}


def parse_bytes(s: str) -> int:
    """'16m' / '128MB' / '134217728' / '1g' -> bytes (Spark conf byte-string
    grammar: bare number, one-letter unit, or two-letter kb/mb/gb/tb/pb)."""
    s = s.strip().lower()
    if s.endswith("b") and len(s) >= 2 and s[-2] in "kmgtp":
        s = s[:-1]  # 'mb' -> 'm' etc; plain '128b' keeps its 'b'
    if s and s[-1] in _UNITS:
        return int(float(s[:-1]) * _UNITS[s[-1]])
    return int(s)


def hadoop_fs(spark, path: str):
    """(FileSystem, Path) for ``path`` via the Hadoop FileSystem API —
    resolves the right implementation for ANY supported URI scheme
    (file://, hdfs://, s3a://, abfs://...), unlike pathlib/shutil which
    silently only work on the local filesystem. This is the same JVM
    surface estimated_scan_partitions already uses for file stats."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def fs_glob(spark, pattern: str) -> list[str]:
    """Fully-qualified URI strings matching a Hadoop glob pattern
    (supports * and {a,b} segments). Empty list when nothing matches or
    the parent does not exist."""
    fs, jpath = hadoop_fs(spark, pattern)
    statuses = fs.globStatus(jpath)
    if statuses is None:
        return []
    return [s.getPath().toString() for s in statuses]


def fs_delete(spark, path: str) -> bool:
    """Recursive delete through the Hadoop FileSystem API."""
    fs, jpath = hadoop_fs(spark, path)
    return bool(fs.delete(jpath, True))


def fs_newest_mtime_ms(spark, path: str) -> int:
    """Newest modification time (epoch ms) of ``path`` or any file under
    it, via the Hadoop FS recursive listing; 0 if the path is absent.
    Used by age-gated maintenance: a subtree still being written has a
    recent mtime."""
    fs, jpath = hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return 0
    newest = fs.getFileStatus(jpath).getModificationTime()
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        newest = max(newest, it.next().getModificationTime())
    return int(newest)


_STAT_LIMIT = 512  # driver-side FS stats are ~ms each; sample beyond this


def estimated_scan_partitions(df: DataFrame) -> int:
    """Estimate how many scan partitions a file-backed read yields, without
    converting the plan to an RDD (``df.rdd.getNumPartitions()`` forces
    plan-to-RDD conversion — needless work on a column-pruned scan, and it
    pins the exact partitioning when only "enough splits?" is asked).

    Emulates FilePartition packing: maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, totalBytes / defaultParallelism)) and files are
    BIN-PACKED into splits of that size — a raw file count both overcounts
    (many small files pack into one partition) and undercounts (one big
    file splits). partitions ≈ (totalBytes + nFiles*openCost) /
    maxSplitBytes. File sizes come from driver-side FS stats (up to
    ``_STAT_LIMIT`` files; average-extrapolated beyond — metadata calls,
    no data IO). Returns 0 for non-file-backed frames (local relations,
    shuffled plans) — callers should treat those as "unknown, repartition"
    (they are test-sized in practice; every real input is a file scan).
    """
    try:
        files = df.inputFiles()
    except Exception:
        return 0
    if not files:
        return 0
    spark = df.sparkSession
    try:
        mpb = parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        open_cost = parse_bytes(
            spark.conf.get("spark.sql.files.openCostInBytes")
        )
        parallelism = spark.sparkContext.defaultParallelism
        jvm = spark._jvm
        jconf = spark.sparkContext._jsc.hadoopConfiguration()
        sample = files[:_STAT_LIMIT]
        sampled_bytes = 0
        for f in sample:
            p = jvm.org.apache.hadoop.fs.Path(f)
            sampled_bytes += p.getFileSystem(jconf).getFileStatus(p).getLen()
        total = sampled_bytes * len(files) // max(1, len(sample))
        padded = total + len(files) * open_cost
        max_split = min(mpb, max(open_cost, padded // max(1, parallelism)))
        return max(1, math.ceil(padded / max(1, max_split)))
    except Exception:
        # Spark Connect / exotic filesystems: fall back to file count
        return len(files)


def ensure_min_partitions(df: DataFrame, min_parts: int) -> DataFrame:
    """Round-robin repartition iff the scan is under-split for ``min_parts``
    parallel tasks. File-backed scans that already carry enough splits pass
    through untouched (no shuffle — the normal case at real scale);
    non-file-backed frames repartition unconditionally (unknown and
    test-sized)."""
    if estimated_scan_partitions(df) >= min_parts:
        return df
    return df.repartition(min_parts)
