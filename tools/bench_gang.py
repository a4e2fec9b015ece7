"""Hardware-ceiling control for the N-vs-4N scaling evidence.

Question it answers: when the measured 1-executor -> 4-executor scaling
efficiency on this single 32-core box falls short of the target, is the
ENGINE failing to scale, or is the BOX failing to scale?

Method: run the full pipeline as FOUR COMPLETELY INDEPENDENT single-driver
processes (local[8] each) over four disjoint quarters of the input,
simultaneously — zero shuffles shared, zero coordination, zero Spark
cross-talk. Whatever efficiency THAT achieves is the hardware's own ceiling
for this workload at 8 -> 32 busy cores (DRAM bandwidth + all-core clocks);
no distributed engine can beat embarrassingly-parallel processes on one
box. Engine-attributable efficiency = measured_cluster_eff / gang_eff.

Usage: python tools/bench_gang.py   (expects $SPARK_GRAFT_GANG_INPUT — the
pre-materialized bench input under /dev/shm — and creates the quarter
splits if missing). Results persist to BENCH/gang.json, from which
tools/bench_scaling.py renders the control section of BENCH/BASELINE.md on
every regeneration.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INPUT = os.environ.get(
    "SPARK_GRAFT_GANG_INPUT", "/dev/shm/clp_bench_input_8000000_d6"
)
N_WAY = 4

PREP = r'''
import sys
sys.path.insert(0, %(repo)r)
from commerce_logs_pipeline_spark.session import build_session
from pyspark.sql import functions as F
spark = build_session(app_name="gang-prep", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(%(input)r)
q = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(%(n)d))
for i in range(%(n)d):
    df.filter(q == i).write.mode("overwrite").parquet(
        f"/dev/shm/clp_quarter_%(tag)s_{i}")
spark.stop()
'''

WORKER = r'''
import sys, time, json, shutil
sys.path.insert(0, %(repo)r)
qi = sys.argv[1]
from commerce_logs_pipeline_spark.session import build_session
from commerce_logs_pipeline_spark.plans.pipeline import run_pipeline
spark = build_session(
    app_name=f"gang{qi}", master="local[8]", shuffle_partitions=32,
    extra_conf={"spark.driver.memory": "12g", "spark.ui.enabled": "false"},
)
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(f"/dev/shm/clp_quarter_%(tag)s_{qi}")
out = f"/dev/shm/clp_gang_out_{qi}"
shutil.rmtree(out, ignore_errors=True)
t0 = time.monotonic()
rep = run_pipeline(spark, df, out, resume=False, write_aggregates=True)
print(json.dumps({"q": qi, "sec": round(time.monotonic() - t0, 2),
                  "rows": rep.rows_in}))
shutil.rmtree(out, ignore_errors=True)
spark.stop()
'''


def _hash_work(n_mb: int) -> None:
    h = hashlib.md5()
    block = b"x" * (1 << 20)
    for _ in range(n_mb):
        h.update(block)


def _cpu_gang_time(n_procs: int, mb_per_proc: int) -> float:
    t0 = time.monotonic()
    procs = [
        mp.Process(target=_hash_work, args=(mb_per_proc,))
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    return time.monotonic() - t0


def pure_cpu_ceiling(per_proc_mb: int = 6000) -> dict:
    """This host's own multiprocess scaling ceiling for pure CPU work:
    time(8 concurrent hash workers) vs time(32), identical per-proc work.
    Perfect scaling => equal times; the ratio is the efficiency no engine
    on this box can exceed at 8 -> 32 busy cores."""
    t8 = _cpu_gang_time(8, per_proc_mb)
    t32 = _cpu_gang_time(32, per_proc_mb)
    return {
        "procs_8_sec": round(t8, 2),
        "procs_32_sec": round(t32, 2),
        "pure_cpu_8to32_efficiency": round(t8 / t32, 3),
    }


def main() -> int:
    tag = os.path.basename(INPUT)
    if not os.path.exists(f"/dev/shm/clp_quarter_{tag}_{N_WAY - 1}/_SUCCESS"):
        subprocess.run(
            [sys.executable, "-c",
             PREP % {"repo": REPO, "input": INPUT, "n": N_WAY, "tag": tag}],
            check=True, capture_output=True,
        )
    worker = WORKER % {"repo": REPO, "tag": tag}

    def run_one(qi: str) -> dict:
        out = subprocess.run([sys.executable, "-c", worker, qi],
                             capture_output=True, text=True)
        return json.loads(
            [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        )

    single = run_one("0")
    procs = [
        subprocess.Popen([sys.executable, "-c", worker, str(i)],
                         stdout=subprocess.PIPE, text=True)
        for i in range(N_WAY)
    ]
    gang = [
        json.loads([l for l in p.communicate()[0].splitlines()
                    if l.startswith("{")][-1])
        for p in procs
    ]
    gmax = max(r["sec"] for r in gang)
    result = {
        "input": INPUT,
        "single_local8_sec": single["sec"],
        "gang_of_4_max_sec": gmax,
        "gang_members": gang,
        "host_4x_ceiling_efficiency": round(single["sec"] / gmax, 3),
        "pure_cpu_control": pure_cpu_ceiling(),
    }
    print(json.dumps(result))
    # persist so bench_scaling.py renders the control section into
    # BENCH/BASELINE.md on EVERY regeneration (the evidence must survive
    # end-of-round re-runs)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "gang.json"), "w") as f:
        json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
