"""Capture .explain("formatted") for bench queries into plans/<tag>/.

Usage: python tools/capture_plans.py --out plans/r06 --suffix _after q1 q2 ...
Run from ANY repo root (the round-start worktree for _before, the live
tree for _after); plans are always written under --out (absolute or
relative to CWD).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench as B
    import __spark_entry__ as E
    from commerce_logs_pipeline_spark.session import build_session

    spark = build_session(app_name="plan-capture", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    qs["shipping_priority_top10"] = E.q_shipping_priority
    qs.update(B._prod_overrides())

    os.makedirs(args.out, exist_ok=True)
    for name in args.queries:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path, file=sys.stderr)
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
