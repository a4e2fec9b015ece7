"""Window/ordering/top-k/pagination/session operators (SURVEY §2.6/§2.8).

Generic, key-parameterized versions of the aggregate-stage specials:

- latest_per_key: compaction semantics (Kafka compacted topic replay,
  /root/reference/.../blob_state_processor.go:289-375 + kafka_topics.yaml:5-9)
- topk_per_group: newest-first top-N (cli/scripts/list_blobs.py:42-50) with
  an exact two-phase implementation that avoids shuffling the full input:
  partial top-k per input partition, then merge — shuffle volume is
  O(partitions * k) instead of O(rows).
- paginate: skip/limit (explore_raw_logs.py:367-374)
- sessionize: inactivity-gap sessions (blob close timeout,
  blob_closing_processor.go:68-92) as a batch window computation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """Last-write-wins row per key (W2). order_by: descending priority."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _invertible_sort_key(
    col: Column, dtype: str, ascending: bool
) -> Column | None:
    """A numeric key whose ordering matches the requested direction of the
    type's natural order, or None when no safe mapping exists.

    Descending integral keys use bitwise NOT (~x = -x-1): an order-
    inverting bijection on int64 with NO overflow — arithmetic negation
    raises ARITHMETIC_OVERFLOW for Long.MIN_VALUE under ANSI. Descending
    float/double returns None (window fallback): NaN negates to NaN, so a
    negated two-phase sort would put NaN last while the window path's
    F.desc puts NaN first. Ascending float/double is safe — Spark orders
    NaN greatest in both sort_array and window sorts.
    """
    if dtype in ("float", "double"):
        return col if ascending else None
    if dtype.startswith("decimal"):
        # decimal ranges are symmetric: negation never overflows
        return col if ascending else -col
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        key = col.cast("long")
    elif dtype == "timestamp":
        key = F.unix_micros(col)
    elif dtype == "date":
        key = F.datediff(col, F.to_date(F.lit("1970-01-01"))).cast("long")
    elif dtype == "boolean":
        key = col.cast("long")
    else:
        return None
    return key if ascending else F.bitwise_not(key)


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak: str | None = None,
    two_phase: bool = True,
) -> DataFrame:
    """Exact top-k rows per group; both paths match the window-function
    reference semantics (asc -> nulls first, desc -> nulls last; ascending
    tiebreak). ``tiebreak`` should be a non-null column.

    two_phase=True: per-(group, input-partition) partial top-k via
    sort_array over collect_list, then a final per-group merge. One hash
    shuffle of packed rows (no per-group global sort — the win over the
    window path, whose sort dominates for wide groups) and the final merge
    touches only O(groups * partitions * k) rows. Hot-group map memory is
    bounded by input-partition size, not group size. Descending order is
    expressed by an order-inverting numeric key (bitwise NOT for integral
    types — overflow-free); types without a safe mapping (strings,
    descending float/double where NaN breaks inversion) fall back to the
    window path automatically.
    two_phase=False: plain window row_number (full shuffle + per-group
    sort).
    """
    if not two_phase:
        order = [F.asc(order_col) if ascending else F.desc(order_col)]
        if tiebreak:
            order.append(F.asc(tiebreak))
        w = Window.partitionBy(*group_cols).orderBy(*order)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )

    oc = F.col(order_col)
    directed_key = _invertible_sort_key(
        oc, dict(df.dtypes)[order_col], ascending
    )
    if directed_key is None:
        return topk_per_group(
            df, group_cols, order_col, k, ascending, tiebreak, two_phase=False
        )
    # null ordering parity with the window path: asc -> nulls first,
    # desc -> nulls last. Struct-field ordering of null values is not
    # relied on: a leading rank field separates nulls, and the key is a
    # constant for null rows.
    null_rank = F.when(
        oc.isNull(), F.lit(0 if ascending else 1)
    ).otherwise(F.lit(1 if ascending else 0))
    keyval = F.when(oc.isNull(), F.lit(0)).otherwise(directed_key)

    data_cols = [c for c in df.columns if c not in group_cols]
    packed = F.struct(
        null_rank.alias("_n"),
        keyval.alias("_k"),
        *(
            [F.col(tiebreak).alias("_t")] if tiebreak else []
        ),
        F.struct(*[F.col(c) for c in data_cols]).alias("row"),
    )
    partial = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy(*group_cols, "_pid")
        .agg(
            F.slice(F.sort_array(F.collect_list(packed)), 1, k).alias("_top")
        )
    )
    merged = (
        partial.select(*group_cols, F.explode("_top").alias("_p"))
        .groupBy(*group_cols)
        .agg(F.slice(F.sort_array(F.collect_list("_p")), 1, k).alias("_top"))
        .select(*group_cols, F.explode("_top").alias("_p"))
        .select(*group_cols, "_p.row.*")
    )
    return merged


def paginate(
    df: DataFrame, order_by: list[Column], skip: int, limit: int
) -> DataFrame:
    """Deterministic skip/limit (W5). Spark >=3.4 offset().limit()."""
    return df.orderBy(*order_by).offset(skip).limit(limit)


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    gap_seconds: int = 300,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Assign inactivity-gap session ids per key (T1 analog: a blob
    closes after 5 idle minutes). New session when the gap from the
    previous event exceeds ``gap_seconds``; session_id = cumulative count
    of session starts. One window shuffle on the key. ``tiebreak`` makes
    ordering total when timestamps can collide."""
    w = Window.partitionBy(key).orderBy(ts_col, *(tiebreak or []))
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("_new", is_new).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new")


def session_stats(
    df: DataFrame, key: str, ts_col: str = "ts", gap_seconds: int = 300,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Per-session aggregates over sessionized rows."""
    s = sessionize(df, key, ts_col, gap_seconds, tiebreak)
    return s.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col)))
        .alias("duration_sec"),
    )
