"""Measure the bucketed-write ("pay the 100-TB shuffle once") strategy on
the bench pipeline itself — VERDICT r4 item #3.

The window-feature build's one big exchange (hash by conv_id) disappears
when the transcript table is STORED bucketed by conv_id and sorted by
(conv_id, turn_idx): the bucketed scan's HashPartitioning satisfies the
window's required distribution, and with exactly one file per bucket the
on-disk sort order satisfies the window's required ordering, so the whole
turn-features block plans ZERO Exchange and (files permitting) zero Sort.
That is the standing answer to repeated feature builds over a stable
100-TB transcript store: shuffle+sort once at ingest, every downstream
window/feature pass is embarrassingly parallel per bucket.

This tool materializes the SAME synthetic transcript table two ways —
plain parquet vs bucketed+sorted metastore table (one file per bucket via
a pre-repartition on the bucket key) — and times the identical
turn_features -> as-of matrix pipeline over each, interleaved min-of-N
(this host's wall clock is 2-5x noisy), printing exchange/sort counts
straight from the executed plans.

Usage: python tools/bench_bucketed.py [cpus] [sf] [repeat]
Writes raw runs to BENCH/raw_bucketed_<sf>.json (incremental cache, like
bench_scaling.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_BUCKETS = 128


def count_ops(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "sorts": plan.count("+- Sort ") + plan.count("   Sort "),
    }


def build_once(spark, sf: float, base: str):
    """Materialize the synthetic transcripts both ways (idempotent)."""
    from bench import build_transcripts
    from powershap_spark.sources.tableio import write_bucketed

    plain = f"{base}/transcripts_plain"
    probes = f"{base}/probes"
    done = f"{base}/.done_sf{sf}"
    if not os.path.exists(done):
        t, p = build_transcripts(spark, sf)
        t.write.mode("overwrite").parquet(plain)
        p.write.mode("overwrite").parquet(probes)
        # one file per bucket: pre-repartition on the bucket key with the
        # same Murmur3 hash partitioning bucketBy uses, so every write task
        # holds exactly one bucket — required for the scan to expose the
        # sort order
        t2 = spark.read.parquet(plain).repartition(N_BUCKETS, "conv_id")
        write_bucketed(
            t2,
            "bench_transcripts_bucketed",
            ["conv_id"],
            n_buckets=N_BUCKETS,
            sort_cols=["conv_id", "turn_idx"],
            path=f"{base}/transcripts_bucketed",
        )
        with open(done, "w") as f:
            f.write("ok")
    # skew-bounded variant (own marker: added in round 6, so a prebuilt
    # r5 dir gains it without rebuilding plain/bucketed): hot conversations
    # split out of the bucketed table into a sub-chunked side table; bound
    # ~= a cold conversation's size x 1000 so ONLY the planted hot key
    # crosses it
    done_sb = f"{base}/.done_sb_sf{sf}"
    if not os.path.exists(done_sb):
        from powershap_spark.sources.tableio import write_bucketed_skew_bounded

        write_bucketed_skew_bounded(
            spark.read.parquet(plain),
            "bench_transcripts_sb",
            key="conv_id",
            order_col="turn_idx",
            n_buckets=N_BUCKETS,
            sort_cols=["conv_id", "turn_idx"],
            path=f"{base}/transcripts_sb",
            rows_per_key_bound=25_000,
        )
        with open(done_sb, "w") as f:
            f.write("ok")
    # saveAsTable registers in the SESSION-LOCAL in-memory catalog (no
    # Hive metastore in this sandbox), so re-register the existing files
    # by DDL on every run
    if not spark.catalog.tableExists("bench_transcripts_bucketed"):
        spark.sql(f"""
            CREATE TABLE bench_transcripts_bucketed (
              conv_id STRING, turn_idx INT, role STRING, text STRING,
              tool STRING, ts TIMESTAMP)
            USING PARQUET
            CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx)
            INTO {N_BUCKETS} BUCKETS
            LOCATION '{base}/transcripts_bucketed'
        """)
    if not spark.catalog.tableExists("bench_transcripts_sb"):
        spark.sql(f"""
            CREATE TABLE bench_transcripts_sb (
              conv_id STRING, turn_idx INT, role STRING, text STRING,
              tool STRING, ts TIMESTAMP)
            USING PARQUET
            CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx)
            INTO {N_BUCKETS} BUCKETS
            LOCATION '{base}/transcripts_sb'
        """)
    return plain, probes


def run_variant(spark, src, probes_path, label: str) -> dict:
    from pyspark.sql import functions as F

    from powershap_spark.pipeline import point_in_time_matrix, turn_features

    p = spark.read.parquet(probes_path)
    if isinstance(src, tuple):
        # skew-bounded store: cold bucketed table -> plain zero-exchange
        # window build; hot sub-chunked side table -> salted two-phase
        cold, hot = src
        feats = turn_features(cold, skew_safe=False).unionByName(
            turn_features(hot, skew_safe=True)
        )
    else:
        feats = turn_features(src, skew_safe=False)
    mat = point_in_time_matrix(feats, p, skew_safe=False).filter(
        F.col("feature_ts").isNotNull()
    )
    t0 = time.perf_counter()
    n = mat.count()
    wall = time.perf_counter() - t0
    # plan shape of the features block alone (the part bucketing targets)
    shape = count_ops(feats)
    return {"label": label, "rows": n, "sec": round(wall, 2), **shape}


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))

    from powershap_spark.session import get_spark

    base = f"/tmp/bench_bucketed_sf{sf}"
    raw_path = os.path.join(ROOT, "BENCH", f"raw_bucketed_{sf}.json")
    runs = []
    if os.path.exists(raw_path):
        runs = json.load(open(raw_path))["runs"]

    spark = get_spark(
        app_name="bench_bucketed",
        master=f"local[{cpus}]",
        shuffle_partitions=N_BUCKETS,
        extra_conf={"spark.sql.warehouse.dir": f"{base}/warehouse"},
    )
    plain, probes = build_once(spark, sf, base)
    spark.sql("select 1").collect()

    sb_hot = spark.read.parquet(f"{base}/transcripts_sb_hot")
    have = len(runs) // 3
    for r in range(have, repeat):
        for label, src in [
            ("plain", spark.read.parquet(plain)),
            ("bucketed", spark.table("bench_transcripts_bucketed")),
            ("subbucketed", (spark.table("bench_transcripts_sb"), sb_hot)),
        ]:
            res = run_variant(spark, src, probes, label)
            res["round"] = r
            runs.append(res)
            print("RUN " + json.dumps(res), flush=True)
            json.dump({"sf": sf, "cpus": cpus, "runs": runs}, open(raw_path, "w"))

    summary = {}
    for label in ("plain", "bucketed", "subbucketed"):
        rs = [x for x in runs if x["label"] == label]
        summary[label] = {
            "min_sec": min(x["sec"] for x in rs),
            "runs": [x["sec"] for x in rs],
            "exchanges": rs[-1]["exchanges"],
            "sorts": rs[-1]["sorts"],
        }
    print("RESULT " + json.dumps({"sf": sf, "cpus": cpus, **summary}))


if __name__ == "__main__":
    main()
