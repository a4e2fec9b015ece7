"""DDL module — topic-bootstrap analog (S9).

Reference parity: tools/kafka-init/main.go:28-158 creates topics with
partition counts + cleanup policies from configs/kafka_topics.yaml:1-25.
Here each "topic" is a table; partition counts become Iceberg partition
transforms and the compacted-topic cleanup policy becomes the lineage
manifest's fold semantics (plans/checkpoint.py).

When the iceberg-spark-runtime jar is present (session.iceberg_jar_available)
the DDL below runs verbatim; in this sandbox (no jar) the same layout is
realized as hive-partitioned parquet (day=/bucket=) by operators/router.py
— identical pruning behavior for day/bucket predicates.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..session import iceberg_jar_available

# Sink tables, mirroring configs/kafka_topics.yaml topic list: raw/extracted
# app + proxy, errors, state (-> manifest), now per-category transcript sinks.
SINK_TABLES = [
    "errors", "tool_calls", "proxy_logs", "http_logs",
    "app_logs", "user_turns", "assistant_turns",
]


def transcripts_ddl(catalog: str = "local", db: str = "clp") -> str:
    return f"""
        CREATE TABLE IF NOT EXISTS {catalog}.{db}.transcripts (
            conv_id string NOT NULL,
            turn_idx int NOT NULL,
            role string NOT NULL,
            text string,
            tool string,
            ts timestamp NOT NULL
        ) USING iceberg
        PARTITIONED BY (days(ts), bucket(16, conv_id))
        TBLPROPERTIES (
            'write.distribution-mode' = 'hash',
            'write.target-file-size-bytes' = '536870912'
        )
    """


def sink_ddl(name: str, catalog: str = "local", db: str = "clp") -> str:
    return f"""
        CREATE TABLE IF NOT EXISTS {catalog}.{db}.{name} (
            conv_id string NOT NULL,
            turn_idx int NOT NULL,
            role string,
            category string,
            ts timestamp
        ) USING iceberg
        PARTITIONED BY (days(ts), bucket(16, conv_id))
    """


def manifest_merge_sql(catalog: str = "local", db: str = "clp") -> str:
    """Iceberg MERGE upsert for the lineage manifest — the X9 compaction
    analog when a real catalog is available (batch path uses the
    append-log fold in plans/checkpoint.py instead)."""
    return f"""
        MERGE INTO {catalog}.{db}.manifest t
        USING updates u
        ON t.day = u.day AND t.bucket = u.bucket
        WHEN MATCHED THEN UPDATE SET
            t.status = CASE WHEN t.status = 'closed' THEN 'closed'
                            ELSE u.status END,
            t.max_turn_watermark = GREATEST(t.max_turn_watermark,
                                            u.max_turn_watermark),
            t.rows_processed = t.rows_processed + u.rows_processed,
            t.updated_at = u.updated_at
        WHEN NOT MATCHED THEN INSERT *
    """


def create_all(spark: SparkSession, catalog: str = "local", db: str = "clp") -> bool:
    """Run the DDL if Iceberg is available; returns whether it ran."""
    if not iceberg_jar_available():
        return False
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{db}")
    spark.sql(transcripts_ddl(catalog, db))
    for name in SINK_TABLES:
        spark.sql(sink_ddl(name, catalog, db))
    return True
