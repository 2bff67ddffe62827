"""Clean single-measurement pipeline profile: fresh JVM, transcript input
read from parquet (written once per sf), one tiny warmup job to start
python workers / codegen, then ONE timed full pipeline run.

Usage: python tools/profile_pipeline.py CPUS SF MODE [ITS]
  MODE: plain | salted | auto
Prints: RESULT {json}
"""

import json
import os
import sys
import time

for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[v] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1])
    sf = float(sys.argv[2])
    mode = sys.argv[3]
    its = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    skew = {"plain": False, "salted": True, "auto": "auto"}[mode]

    from powershap_spark.session import get_spark
    from powershap_spark.pipeline import select_features
    from bench import build_transcripts

    shuffle = int(os.environ.get("BENCH_SHUFFLE", cpus))
    # BENCH_MASTER overrides the master: local-cluster[W,C,MEM] gives
    # process-isolated executor JVMs (the north rule's N->4N *executors*)
    master = os.environ.get("BENCH_MASTER", f"local[{cpus}]")
    extra = {}
    if master.startswith("local-cluster"):
        extra = {
            "spark.executorEnv.PYTHONPATH": os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            )
        }
    if os.environ.get("BENCH_CODEC"):
        extra["spark.io.compression.codec"] = os.environ["BENCH_CODEC"]
    spark = get_spark(
        app_name=f"prof{cpus}", master=master, shuffle_partitions=shuffle,
        extra_conf=extra,
    )

    # BENCH_HOT_FRAC overrides the planted hot-conversation share (default
    # 0.10 per FIXTURES.md); a near-zero value is the no-straggler control
    # cell that separates the Amdahl effect from memory-bandwidth limits
    hot_frac = float(os.environ.get("BENCH_HOT_FRAC", "0.10"))
    suffix = "" if hot_frac == 0.10 else f"_h{hot_frac}"
    base = f"/tmp/bench_input_sf{sf}{suffix}"
    if not os.path.exists(base + "/transcripts/_SUCCESS"):
        t, p = build_transcripts(spark, sf, hot_frac=hot_frac)
        t.write.mode("overwrite").parquet(base + "/transcripts")
        p.write.mode("overwrite").parquet(base + "/probes")
    t = spark.read.parquet(base + "/transcripts")
    p = spark.read.parquet(base + "/probes")
    n_turns = t.count()

    # warmup: python workers + codegen on a consistent small slice
    from pyspark.sql import functions as F

    wk = F.col("conv_id") < "conv_00000060"
    ws = t.filter(wk & (F.col("conv_id") > "conv_00000000")).cache()
    wp = p.filter(wk & (F.col("conv_id") > "conv_00000000")).cache()
    ws.count(), wp.count()
    select_features(ws, wp, power_iterations=2, n_parts=8, probe_mode="keyed", skew_safe=False)
    ws.unpersist(), wp.unpersist()

    def cpu_now():
        """CPU-seconds burned by this process SUBTREE (driver + local-mode
        JVM + python workers) via /proc — a contention-robust companion to
        wall clock (getrusage only sees reaped children; the JVM is live)."""
        hz = os.sysconf("SC_CLK_TCK")
        ppid_map, cpu = {}, {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    tail = f.read().rsplit(")", 1)[1].split()
                ppid_map[int(pid)] = int(tail[1])
                cpu[int(pid)] = (int(tail[11]) + int(tail[12])) / hz
            except Exception:
                pass
        mine, total = {os.getpid()}, 0.0
        grew = True
        while grew:
            grew = False
            for pid, pp in ppid_map.items():
                if pp in mine and pid not in mine:
                    mine.add(pid)
                    grew = True
        return sum(cpu.get(p, 0.0) for p in mine)

    c0 = cpu_now()
    t0 = time.perf_counter()
    sel, _ = select_features(
        t, p, power_iterations=its, n_parts=32, probe_mode="keyed", skew_safe=skew
    )
    wall = time.perf_counter() - t0
    cpu_s = cpu_now() - c0
    print(
        "RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "sf": sf,
                "mode": mode,
                "its": its,
                "n_turns": n_turns,
                "sec": round(wall, 2),
                "turns_per_sec": round(n_turns / wall, 1),
                "cpu_s": round(cpu_s, 2),
                "cpu_us_per_turn": round(cpu_s / n_turns * 1e6, 3),
                "n_selected": len(sel.selected_features_),
            }
        )
    )


if __name__ == "__main__":
    main()
