"""Round-6 optimization harness (bench.py stays FROZEN for measurement).

Per-query isolated timing with the noop sink, N repeats in one session,
plus .explain("formatted") capture for plans/r06/. Mirrors bench.py's
methodology (same session builder, same query resolution incl. the
_prod_overrides family) so numbers are comparable, but runs any subset:

    python bench_extra.py near_dup_clusters media_features --repeats 3
    python bench_extra.py --all --repeats 1
    python bench_extra.py near_dup_clusters --explain plans/r06/near_dup_clusters_before.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="write explain('formatted') of the (single) query here")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import bench as B
    import __spark_entry__ as E
    from commerce_logs_pipeline_spark.session import build_session

    spark = build_session(app_name="clp-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    qs["shipping_priority_top10"] = E.q_shipping_priority
    qs.update(B._prod_overrides())

    names = B.BENCH_QUERIES if args.all else args.queries
    unknown = [n for n in names if n not in qs and n != "pipeline_end_to_end"]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    if not args.no_warmup:
        _force(
            spark.read.parquet(f"{sf_dir}/region.parquet")
            .groupBy("r_name").count()
        )

    out: dict[str, list[float]] = {}
    for name in names:
        if name == "pipeline_end_to_end":
            from commerce_logs_pipeline_spark.plans.pipeline import run_pipeline
            input_path = (
                f"/dev/shm/clp_bench_input_{B.PIPELINE_TURNS}_d{B.PIPELINE_DAYS}"
            )
            B.prepare_pipeline_input(spark, B.PIPELINE_TURNS, input_path)
            transcripts = spark.read.parquet(input_path)
            samples = []
            for i in range(args.repeats):
                out_path = f"/tmp/clp_bx_out_{int(time.time())}_{i}"
                t0 = time.monotonic()
                rep = run_pipeline(spark, transcripts, out_path,
                                   resume=False, write_aggregates=True)
                samples.append(round(time.monotonic() - t0, 3))
                print(f"  {name} run{i}: {samples[-1]}  phases="
                      f"{rep.extras.get('phases')}", file=sys.stderr)
            out[name] = samples
            continue
        spark.sparkContext.setJobDescription(name)
        if args.explain and len(names) == 1:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(args.explain, "w") as f:
                f.write(txt)
            spark.catalog.clearCache()
        samples = []
        for i in range(args.repeats):
            t0 = time.monotonic()
            _force(qs[name](spark, sf_dir))
            samples.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
        out[name] = samples
        print(f"  {name}: {samples}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
