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
    spark = get_spark(
        app_name=f"prof{cpus}", master=f"local[{cpus}]", shuffle_partitions=shuffle
    )

    base = f"/tmp/bench_input_sf{sf}"
    if not os.path.exists(base + "/transcripts/_SUCCESS"):
        t, p = build_transcripts(spark, sf)
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

    t0 = time.perf_counter()
    sel, _ = select_features(
        t, p, power_iterations=its, n_parts=32, probe_mode="keyed", skew_safe=skew
    )
    wall = time.perf_counter() - t0
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
                "n_selected": len(sel.selected_features_),
            }
        )
    )


if __name__ == "__main__":
    main()
