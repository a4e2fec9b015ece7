"""Skew handling: salted repartition + salted two-phase aggregation.

The reference has no skew mitigation — a hot blob simply serializes on its
Kafka partition (SURVEY §4 X6, absence). The north rule requires explicit
handling for hot conversations, so this module provides:

- ``salted_repartition``: spreads a hot key across ``n_salts`` sub-keys for
  map-side balance (the write/parse path fix);
- ``salted_agg``: two-phase aggregation — partial agg on (key, salt), final
  agg on key — so a conv_id with millions of turns is reduced by all cores
  instead of one task (the aggregate path fix). Algebraic re-composition:
  count = sum(partial counts), sum = sum(partial sums), min/max = min/max
  of partials.

AQE's skew-join splitting covers the JOIN case; this covers groupBy, which
AQE does not rebalance. Salts are deterministic (hash of turn_idx), so runs
are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(n_salts: int, *cols: str) -> Column:
    """Deterministic salt in [0, n_salts) from the given columns."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_repartition(
    df: DataFrame, key: str, n_partitions: int, n_salts: int = 8,
    salt_from: str = "turn_idx",
) -> DataFrame:
    """repartition(n, key, salt) — hot keys spread over n_salts tasks."""
    return df.withColumn("_salt", salt_col(n_salts, salt_from)).repartition(
        n_partitions, F.col(key), F.col("_salt")
    ).drop("_salt")


# (agg_name, output_col, input_expr) specs supported by salted_agg
def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str, Column]],
    n_salts: int = 8,
    salt_from: str = "turn_idx",
) -> DataFrame:
    """Two-phase salted groupBy.

    ``aggs`` entries: (fn, out_name, input_col) with fn in
    {count, sum, min, max, sum_double}. Example::

        salted_agg(parsed, "conv_id", [
            ("count", "n_turns", F.lit(1)),
            ("max", "max_turn_idx", F.col("turn_idx")),
        ])
    """
    partial_exprs = []
    final_exprs = []
    for fn, out, col in aggs:
        p = f"_p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn in ("sum", "sum_double"):
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"unsupported salted agg fn: {fn}")
    salted = df.withColumn("_salt", salt_col(n_salts, salt_from))
    partial = salted.groupBy(key, "_salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def conv_turn_counts_salted(parsed: DataFrame, n_salts: int = 8) -> DataFrame:
    """Salted version of plans.aggregate.conv_turn_counts (same result)."""
    err = F.when(F.col("category").isin("error", "parse_error"), 1).otherwise(0)
    tool = F.when(F.col("category") == "tool_call", 1).otherwise(0)
    return salted_agg(
        parsed,
        "conv_id",
        [
            ("count", "n_turns", F.lit(1)),
            ("max", "max_turn_idx", F.col("turn_idx")),
            ("sum", "n_errors", err),
            ("sum", "n_tool_calls", tool),
            ("min", "first_ts", F.col("ts")),
            ("max", "last_ts", F.col("ts")),
        ],
        n_salts=n_salts,
    )
