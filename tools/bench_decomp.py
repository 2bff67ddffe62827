"""Two-point decomposition of the selection batch + multi-batch overhead.

Splits an explain batch's wall time into FIXED overhead (per-batch job
launch + Arrow transfer + block prepare; before round 6 also a full
matrix shuffle + sort) and PER-ITERATION cost, by timing explain(10) and
explain(40) in the same session:  t(I) = F + c*I  =>  c = (t40-t10)/30,
F = t10 - 10c.  Then times four consecutive explain(5) batches — the
automatic-mode increment pattern — where the fixed overhead is paid per
BATCH, so any fixed-cost cut compounds.

Usage: python tools/bench_decomp.py CPUS [SF] [REPEAT]
Appends one JSON line per repeat to BENCH/raw_decomp_{cpus}.json.
Interleave repeats across cpu levels yourself (host noise: see
BENCH/ANALYSIS_r05 — never compare single runs).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[v] = "1"


def main():
    cpus = int(sys.argv[1])
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    from pyspark.sql import functions as F

    from bench import build_transcripts
    from powershap_spark.engine import SparkExplainBackend
    from powershap_spark.pipeline import FEATURE_COLS, point_in_time_matrix, turn_features
    from powershap_spark.session import get_spark

    spark = get_spark(
        app_name=f"decomp{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    base = f"/tmp/bench_input_sf{sf}"
    if not os.path.exists(base + "/transcripts/_SUCCESS"):
        t, p = build_transcripts(spark, sf)
        t.write.mode("overwrite").parquet(base + "/transcripts")
        p.write.mode("overwrite").parquet(base + "/probes")
    t = spark.read.parquet(base + "/transcripts")
    p = spark.read.parquet(base + "/probes")
    mat = point_in_time_matrix(turn_features(t, skew_safe=False), p, skew_safe=False).filter(
        F.col("feature_ts").isNotNull()
    )
    t_init0 = time.perf_counter()
    be = SparkExplainBackend(
        mat, FEATURE_COLS, "label", n_parts=128, probe_mode="keyed",
        sort_cols=["conv_id", "ts"],
    )
    init_s = time.perf_counter() - t_init0  # includes the ONE-TIME shuffle+cache
    n = be.df.count()
    be.explain(5, 0)  # warm python workers + codegen

    t0 = time.perf_counter(); be.explain(10, 100); t10 = time.perf_counter() - t0
    t0 = time.perf_counter(); be.explain(40, 200); t40 = time.perf_counter() - t0
    c = (t40 - t10) / 30.0
    fixed = t10 - 10.0 * c

    # automatic-mode increment pattern: 4 batches of 5 iterations — fixed
    # overhead is paid once per BATCH here
    t0 = time.perf_counter()
    for k in range(4):
        be.explain(5, 300 + 10 * k)
    multi = time.perf_counter() - t0

    rec = {
        "cpus": cpus, "sf": sf, "rows": int(n),
        "t10_s": round(t10, 3), "t40_s": round(t40, 3),
        "per_iter_ms": round(c * 1000.0, 1), "fixed_s": round(fixed, 3),
        "multi4x5_s": round(multi, 3), "init_s": round(init_s, 3),
    }
    out = os.path.join(os.path.dirname(__file__), "..", "BENCH",
                       f"raw_decomp_{cpus}.json")
    rows = []
    if os.path.exists(out):
        rows = json.load(open(out))
    rows.append(rec)
    json.dump(rows, open(out, "w"), indent=1)
    print("RESULT " + json.dumps(rec))


if __name__ == "__main__":
    main()
