"""Table loading/registration for the driver-provided parquet testdata
(/root/testdata/sf*/ — see TESTDATA.md) and for engine outputs.

The reference's source layer is blob listing + gzip range scans
(/root/reference/pipeline/blob-monitor, pipeline/ingest); here sources are
parquet/Iceberg scans where listing, pruning, and pushdown come from the
format (SURVEY §4 X1/X2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a BUCKETED (and optionally sorted) managed parquet table
    — the co-located-join layout. Two tables bucketed the same way on the
    join key sort-merge-join with ZERO exchanges (each bucket pair joins
    in place), the Spark analog of the reference's FNV%12 co-partitioned
    Kafka topics (processor.go:29-33): pay the partitioning once at write
    time, reuse it for every subsequent join/aggregate on that key.
    pinned by tests/test_plan_shapes.py."""
    w = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").mode("overwrite").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: with bucketing
    enabled (default) the planner emits an exchange-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
