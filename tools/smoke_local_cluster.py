"""Smoke test: can this sandbox run Spark's local-cluster master (separate
executor JVMs — the closest single-box stand-in for multi-executor N->4N
scaling)? Runs a tiny shuffle + an applyInPandas job and prints RESULT json.

Usage: python tools/smoke_local_cluster.py [workers] [cores] [mem_mb]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    workers = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mem = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    from powershap_spark.session import get_spark

    t0 = time.perf_counter()
    spark = get_spark(
        app_name="smoke_lc",
        master=f"local-cluster[{workers},{cores},{mem}]",
        shuffle_partitions=workers * cores,
        extra_conf={
            "spark.executorEnv.PYTHONPATH": ROOT,
            "spark.python.worker.reuse": "true",
        },
    )
    startup = time.perf_counter() - t0

    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.range(0, 100_000, 1, workers * cores).withColumn(
        "k", (F.col("id") % 7).cast("int")
    )
    agg = df.groupBy("k").count().orderBy("k").collect()
    n_shuffle = sum(r["count"] for r in agg)

    def fn(key, pdf):
        return pd.DataFrame({"k": [int(key[0])], "s": [float(pdf["id"].sum())]})

    res = (
        df.groupBy("k")
        .applyInPandas(fn, schema="k int, s double")
        .agg(F.sum("s"))
        .collect()[0][0]
    )
    execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    print(
        "RESULT "
        + json.dumps(
            {
                "workers": workers,
                "cores": cores,
                "startup_s": round(startup, 1),
                "n_shuffle": n_shuffle,
                "pandas_udf_sum": res,
                "executors_incl_driver": execs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
