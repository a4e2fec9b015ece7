"""Field-frequency profiler — P-M analog
(/root/reference/cli/scripts/explore_raw_logs.py:85-158): sample messages,
count field presence including nested JSON paths, rank fields present in
more than a threshold fraction of rows.

Spark shape: explode json object keys (two levels deep) over a sample and
aggregate presence counts — one job, no driver-side row iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_json_fields(
    df: DataFrame,
    text_col: str = "text",
    sample_rows: int = 1000,
    min_presence: float = 0.0,
) -> DataFrame:
    """(path, n_present, presence) for top-level and second-level JSON keys
    over the first ``sample_rows`` PARSEABLE rows — the parse filter runs
    before the limit, so a table whose leading rows are non-JSON (nulls,
    tool calls, chat) still yields a full-size sample, exactly like the
    reference's "keep reading until N messages profiled" loop."""
    # parse each line as map<string, raw-json-string>: keys are the
    # top-level fields, values keep nested JSON text for level-2 keys
    as_map = F.from_json(F.col(text_col), "map<string,string>")
    sample = (
        df.select(text_col)
        .withColumn("_m", as_map)
        .filter(F.col("_m").isNotNull())
        .limit(sample_rows)
    )
    # LIMIT without ORDER BY is not stable across jobs; freeze the sampled
    # row set once so the denominator and the per-path counts are computed
    # over the SAME rows (presence <= 1 guaranteed)
    sample = sample.localCheckpoint()
    total = sample.count()
    if total == 0:
        return df.sparkSession.createDataFrame(
            [], "path string, n_present long, presence double"
        )
    kv = sample.select(F.explode("_m").alias("path", "_v"))
    nested = kv.select(
        F.col("path").alias("parent"),
        F.explode(F.json_object_keys("_v")).alias("child"),
    ).select(F.concat_ws(".", "parent", "child").alias("path"))
    all_paths = kv.select("path").unionByName(nested)
    out = (
        all_paths.groupBy("path")
        .agg(F.count("*").alias("n_present"))
        .withColumn("presence", F.round(F.col("n_present") / total, 4))
        .filter(F.col("presence") >= min_presence)
        .orderBy(F.desc("n_present"), "path")
    )
    return out
