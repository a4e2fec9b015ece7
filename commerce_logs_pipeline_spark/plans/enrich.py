"""Broadcast-hash-join enrichment stage.

Reference parity: source-metadata attach from message headers
(/root/reference/pipeline/extraction/internal/service/service.go:284-309)
and the selector->service registry lookup (processor.go:36-41,
selectors.go:199-206). Both are key-addressed lookups against tiny dims —
in Spark that is exactly a broadcast hash join (no shuffle of the fact
side), which is what the north rule mandates for this stage.

Scale notes: role_dim is 4 rows and tool_dim single digits — broadcast is
forced with ``F.broadcast`` so Catalyst never falls back to a sort-merge
join even if stats are missing. The fact side keeps its partitioning; the
enrich stage adds zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import synth
from ..functions.parse import service_from_pod


def enrich(parsed: DataFrame, role_dim: DataFrame, tool_dim: DataFrame) -> DataFrame:
    """Attach role/tool metadata + derived service column.

    - role_class / is_billable from role_dim (J1 analog)
    - tool_category / service_name / timeout_ms from tool_dim (J2 analog),
      joined on the *parsed* tool name with the declared ``tool`` column as
      fallback (header-propagation analog)
    - service derived from pod_name (extractor.go:173-185)
    """
    join_tool = F.coalesce(parsed["tool_name"], parsed["tool"])
    out = (
        parsed.withColumn("_join_tool", join_tool)
        .join(F.broadcast(role_dim), on="role", how="left")
        .join(
            F.broadcast(tool_dim.withColumnRenamed("tool", "_join_tool")),
            on="_join_tool",
            how="left",
        )
        .drop("_join_tool")
        .withColumn(
            "service",
            F.coalesce(service_from_pod(F.col("pod_name")), F.col("service_name")),
        )
    )
    return out


def enrich_with_default_dims(parsed: DataFrame) -> DataFrame:
    spark = parsed.sparkSession
    return enrich(parsed, synth.role_dim(spark), synth.tool_dim(spark))
