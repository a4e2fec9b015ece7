"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry at sf0.01 on Spark AND its oracle_sql() in
DuckDB; compare row count, column names, and an order-insensitive value
hash (columns sorted by name, rows sorted, values canonicalized).

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--only name]
"""

from __future__ import annotations

import argparse
import datetime as dt
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def canon(v) -> str:
    import decimal

    if v is None:
        return "∅"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # normalize -0.0 and represent with fixed precision
        if v == 0:
            v = 0.0
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--cpus", default="8")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", args.cpus)
    import __spark_entry__ as E
    from commerce_logs_pipeline_spark.session import build_session

    spark = build_session(app_name="oracle-check", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = E.queries()
    sqls = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if args.only and name != args.only:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, args.sf)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        spark_elapsed = time.monotonic() - t0
        if name not in sqls:
            print(f"rows  {name}: {len(rows)} rows (no oracle) "
                  f"[{spark_elapsed:.1f}s]")
            if len(rows) == 0 and name != "exact_dup_groups":
                print(f"  WARN {name}: zero rows")
            continue
        try:
            res = con.execute(sqls[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        if sorted(cols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(cols)} vs {sorted(ocols)}")
            failures.append(name)
            continue
        h1, n1 = table_hash(cols, rows)
        h2, n2 = table_hash(ocols, orows)
        ok = (h1 == h2) and (n1 == n2)
        status = "OK  " if ok else "FAIL"
        print(f"{status}  {name}: spark={n1} oracle={n2} "
              f"hash={'match' if h1 == h2 else f'{h1}!={h2}'} "
              f"[{spark_elapsed:.1f}s]")
        if not ok:
            failures.append(name)
            # show first differing rows for debugging
            s1 = set("\x1f".join(canon(v) for v in r) for r in rows)
            s2 = set("\x1f".join(canon(v) for v in r) for r in orows)
            only_s = list(s1 - s2)[:3]
            only_o = list(s2 - s1)[:3]
            for x in only_s:
                print(f"    spark-only: {x[:200]}")
            for x in only_o:
                print(f"    oracle-only: {x[:200]}")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
