"""Time-tolerance (as-of / range) correlation joins.

Reference parity: the *designed* app<->proxy request correlation
(/root/reference/docs/pipeline_design.md:66-70 — match by IPs + request
metadata within a time window) and thread-based correlation (:60-64).
The reference never implemented these (correlators are future work);
here they are real Spark joins.

Scale notes: a naive range join is O(n*m) per key. We bucket both sides
into time bins of width = tolerance so each left row joins at most 2 bins
(its own + neighbor), turning the theta-join into an equi-join on
(key, bin) that Spark executes as a hash join; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_correlate(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_sec: int = 60,
    suffix: str = "_r",
) -> DataFrame:
    """Equi-join on ``on`` with |left_ts - right_ts| <= tolerance.

    Implemented as a bin-bucketed equi-join: both sides get
    bin = floor(epoch/tolerance); the left side explodes to (bin-1, bin,
    bin+1) so every in-tolerance pair shares a (key, bin) — then the exact
    predicate filters. Join key cardinality stays high -> parallel.
    """
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / tolerance_sec)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / tolerance_sec)

    r_cols = [
        F.col(c).alias(c + suffix) if c in left.columns else F.col(c)
        for c in right.columns
        if c not in on
    ]
    right_b = right.select(
        *[F.col(c) for c in on], *r_cols, rb.alias("_bin")
    )
    left_b = left.withColumn(
        "_bin", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    rts = right_ts + suffix if right_ts in left.columns else right_ts
    joined = left_b.join(right_b, on=on + ["_bin"]).filter(
        F.abs(
            F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(rts))
        )
        <= tolerance_sec
    )
    return joined.drop("_bin")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_sec: int = 3600,
    direction: str = "backward",
    tiebreak: list[str] | None = None,
    left_id: str | list[str] | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single nearest right row at or
    before (backward) / after (forward) its timestamp, within tolerance.

    Built as range_correlate + per-left-row argmin — all Column ops.
    ``tiebreak``: right-side columns that make the argmin total when two
    right rows sit at the same distance.

    ``left_id``: column(s) uniquely identifying a left row. Prefer passing
    one: the argmin then groups on a NATURAL key that survives plan
    re-optimization and stage retries. Without it the row identity falls
    back to monotonically_increasing_id, which is a function of partition
    layout — stable for a materialized input, but an AQE re-plan between
    the join and the argmin could in principle renumber rows.
    """
    if left_id is not None:
        id_cols = [left_id] if isinstance(left_id, str) else list(left_id)
        tagged = left
    else:
        id_cols = ["_lid"]
        tagged = left.withColumn("_lid", F.monotonically_increasing_id())
    joined = range_correlate(
        tagged, right, on, left_ts, right_ts, tolerance_sec
    )
    rts = right_ts + "_r" if right_ts in left.columns else right_ts
    delta = F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(rts))
    if direction == "backward":
        joined = joined.filter(delta >= 0)
    elif direction == "forward":
        joined = joined.filter(delta <= 0)
    joined = joined.withColumn("_gap", F.abs(delta))
    from .windows import latest_per_key

    order = [F.asc("_gap"), F.asc(rts)] + [F.asc(c) for c in (tiebreak or [])]
    best = latest_per_key(joined, id_cols, order)
    drop = ["_gap"] + (["_lid"] if left_id is None else [])
    return best.drop(*drop)
