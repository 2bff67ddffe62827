"""N->4N cells for the round-7 join/encoder operators: range_join and
decayed_past_mean over ``synth.events`` at row counts the fixed testdata
doesn't reach (default 4M events, 10% on one hot user — the planted-skew
convention). Fresh JVM per (cpus, rep), reps interleaved across
parallelism levels, min-of-N, same protocol as tools/bench_scaling.py.

Usage: python tools/bench_join_encode.py [N] [repeat] [n_events]
Appends raw rows to BENCH/raw_rjoin_{cpus}.json / raw_dmean_{cpus}.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[v] = "1"
cpus = int(os.environ["SPARK_GRAFT_CPUS"])
n_events = int(os.environ["BENCH_N_EVENTS"])
cell = os.environ["BENCH_CELL"]
from pyspark.sql import functions as F
from powershap_spark.session import get_spark
from powershap_spark import synth
from powershap_spark.operators.encode import decayed_past_mean
from powershap_spark.operators.rangejoin import range_join

spark = get_spark(app_name=f"{cell}{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
e = synth.events(spark, n_events=n_events, n_partitions=cpus).persist()
e.count()

def run_rjoin():
    probes = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("probe_id"))
    ctx = e.select("user_id", "ts", "event_id", "event_type")
    out = range_join(probes, ctx, "user_id", before=1800.0, after=0.0)
    return out.count()

def run_dmean():
    out = decayed_past_mean(
        e, key="user_id", label="value", ts="ts", half_life_s=172800.0)
    return out.agg(F.sum("dm_mean"), F.sum("dm_cnt")).collect()[0][1]

def run_dmeanc():
    # skew-safe path: grouped (key, ts) partials + salted_cumsum chunks,
    # so the hot user's window never serializes one task
    out = decayed_past_mean(
        e, key="user_id", label="value", ts="ts", half_life_s=172800.0,
        grouped=True, chunk_size=100_000)
    return out.agg(F.sum("dm_mean"), F.sum("dm_cnt")).collect()[0][1]

fn = {"rjoin": run_rjoin, "dmean": run_dmean, "dmeanc": run_dmeanc}[cell]
fn()  # warm codegen + exchange paths
t0 = time.perf_counter(); n = fn(); wall = time.perf_counter() - t0
print("RESULT " + json.dumps({
    "cpus": cpus, "rows": n_events, "out": int(n),
    "sec": round(wall, 2), "rows_per_sec": round(n_events / wall, 1),
}))
"""


_N_EVENTS = 4_000_000  # set by main(); raw caches are per size


def _raw(cell, cpus):
    sfx = "" if _N_EVENTS == 4_000_000 else f"_n{_N_EVENTS}"
    return os.path.join(ROOT, "BENCH", f"raw_{cell}{sfx}_{cpus}.json")


def _append(cell, cpus, rec):
    rows = json.load(open(_raw(cell, cpus))) if os.path.exists(_raw(cell, cpus)) else []
    rows.append(rec)
    json.dump(rows, open(_raw(cell, cpus), "w"), indent=1)


def _best(cell, cpus):
    rows = json.load(open(_raw(cell, cpus)))
    b = dict(min(rows, key=lambda r: r["sec"]))
    b["all"] = [r["sec"] for r in rows]
    return b


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_events = int(sys.argv[3]) if len(sys.argv) > 3 else 4_000_000
    global _N_EVENTS
    _N_EVENTS = n_events
    for rep in range(repeat):
        for cpus in (n, 4 * n):
            for cell in ("rjoin", "dmean", "dmeanc"):
                env = dict(
                    os.environ, SPARK_GRAFT_CPUS=str(cpus),
                    BENCH_N_EVENTS=str(n_events), BENCH_CELL=cell,
                    SPARK_DRIVER_MEM="48g",
                )
                out = subprocess.run(
                    [sys.executable, "-c", CHILD], capture_output=True,
                    text=True, env=env, cwd=ROOT, timeout=1800,
                )
                rec = None
                for line in out.stdout.splitlines():
                    if line.startswith("RESULT "):
                        rec = json.loads(line[len("RESULT "):])
                if rec is None:
                    raise RuntimeError(
                        f"{cell} child failed rc={out.returncode}:\n"
                        f"{out.stderr[-1200:]}"
                    )
                _append(cell, cpus, rec)
                print(f"rep{rep} {cell} cpus={cpus}: {rec['sec']}s "
                      f"out={rec['out']}", flush=True)
    for cell in ("rjoin", "dmean", "dmeanc"):
        s, l = _best(cell, n), _best(cell, 4 * n)
        print(json.dumps({
            "cell": cell, f"local[{n}]": s["sec"], f"local[{4*n}]": l["sec"],
            "out_rows": s["out"],
            "scaling_efficiency": round(s["sec"] / (4 * l["sec"]), 3),
        }))


if __name__ == "__main__":
    main()
