"""Oracle parity for registry-RETIRED contract queries.

The driver's correctness window holds at most 50 entries, so redundant
queries get retired from __spark_entry__._REGISTRY to make room (r5:
``pagination``, ``union_group_count``). Retirement must not drop their
correctness signal — this suite runs each retired query through the SAME
protocol the driver uses (DuckDB oracle, order-insensitive value hash)
at sf0.001.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_oracle import table_hash  # noqa: E402

SF = "/root/testdata/sf0.001"

RETIRED = [
    "pagination",
    "union_group_count",
    "shipping_priority_top10",
    "hourly_rollup",
    "anti_join_customers",
]


def _retired_pairs():
    import __spark_entry__ as E

    return {
        "pagination": (E.q_pagination, E.SQL_PAGINATION),
        "union_group_count": (E.q_union_parties, E.SQL_UNION),
        "shipping_priority_top10": (E.q_shipping_priority, E.SQL_SHIPPING),
        "hourly_rollup": (E.q_hourly_rollup, E.SQL_HOURLY),
        "anti_join_customers": (E.q_anti_join, E.SQL_ANTI),
    }


@pytest.mark.parametrize("name", RETIRED)
def test_retired_query_matches_oracle(spark, name):
    if not os.path.isdir(SF):
        pytest.skip("driver testdata not present")
    fn, sql = _retired_pairs()[name]
    sdf = fn(spark, SF)
    s_hash, s_rows = table_hash(sdf.columns, [tuple(r) for r in sdf.collect()])

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    o_hash, o_rows = table_hash(cols, cur.fetchall())

    assert sorted(sdf.columns) == sorted(cols)
    assert s_rows == o_rows
    assert s_hash == o_hash


def test_registry_fits_driver_window():
    """The driver checks only the FIRST 50 queries() entries; anything past
    the cap silently loses its correctness signal (the r4 media-family
    incident). Pin the invariant."""
    import __spark_entry__ as E

    q = E.queries()
    assert len(q) <= 50
    assert set(E.oracle_sql()) <= set(q)
