"""Round-8 optimization harness (guide §1.4): noop-sink isolation of each
bench query plus sub-phase breakdowns of the flagship pipeline. bench.py is
FROZEN for the driver's measurement; all exploratory numbers cited in
OPTIMIZATION_r08.md come from here.

Usage:
  python bench_extra.py [piece ...]        # default: all pieces
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS.

Each piece is forced with df.write.format("noop") so every column of every
row is computed (count() lets Catalyst prune aggressively), and labelled
via setJobDescription for the UI.
"""

from __future__ import annotations

import json
import os
import sys
import time


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "1"))
    only = set(sys.argv[1:])

    from powershap_spark.session import get_spark

    spark = get_spark(
        app_name="bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    sc = spark.sparkContext

    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from powershap_spark import synth
    from bench import build_transcripts, _sf_of

    sf = _sf_of(sf_dir)
    timings: dict[str, list[float]] = {}

    def timed(name, fn, warm_first=False):
        if only and name not in only:
            return
        for r in range(reps + (1 if warm_first else 0)):
            sc.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            fn()
            dt = round(time.perf_counter() - t0, 3)
            if warm_first and r == 0:
                continue
            timings.setdefault(name, []).append(dt)
        sc.setJobDescription(None)

    # --- session warmup (mirrors bench.py) ---------------------------------
    _wt = synth.transcripts(spark, n_conv=50, mean_turns=10)
    _wt.count()
    import pandas as _pd

    spark.createDataFrame(_pd.DataFrame({"a": [1, 2]})).groupBy("a").applyInPandas(
        lambda pdf: pdf, schema="a long"
    ).count()

    # --- flagship sub-phases ----------------------------------------------
    t, p = build_transcripts(spark, sf)

    timed("synth_transcripts_noop", lambda: noop(t))
    timed("synth_probes_noop", lambda: noop(p))

    t_cached = t.cache()
    sc.setJobDescription("materialize transcript cache")
    n_turns = t_cached.count()

    from powershap_spark.pipeline import (
        FEATURE_COLS,
        point_in_time_matrix,
        select_features,
        turn_features,
    )

    timed(
        "turn_features_noop",
        lambda: noop(turn_features(t_cached, skew_safe="auto")),
    )
    timed(
        "turn_features_plain_noop",
        lambda: noop(turn_features(t_cached, skew_safe=False)),
    )

    def _mat():
        feats = turn_features(t_cached, skew_safe="auto")
        mat = point_in_time_matrix(feats, p, skew_safe="auto").filter(
            F.col("feature_ts").isNotNull()
        )
        noop(mat)

    timed("feature_matrix_noop", _mat)

    def _sel():
        sel, m = select_features(
            t_cached,
            p,
            power_iterations=10,
            n_parts=cpus,
            probe_mode="keyed",
            skew_safe="auto",
        )
        return sel

    timed("powershap_selection", _sel)

    # --- operator headliners (noop-forced) ---------------------------------
    timed("pit_matrix_events", lambda: noop(em.q_pit_matrix_events(spark, sf_dir)))
    timed("asof_join_events", lambda: noop(em.q_asof_join_events(spark, sf_dir)))
    timed(
        "asof_join_bucketed_events",
        lambda: noop(em.q_asof_join_bucketed_events(spark, sf_dir)),
    )
    timed(
        "rolling_strict_past", lambda: noop(em.q_rolling_strict_past(spark, sf_dir))
    )
    timed(
        "session_gap_sessionize",
        lambda: noop(em.q_session_gap_sessionize(spark, sf_dir)),
    )
    timed("pricing_summary", lambda: noop(em.q_pricing_summary(spark, sf_dir)))

    from powershap_spark.operators.dedup import minhash_dedup

    timed(
        "minhash_dedup_documents",
        lambda: noop(
            minhash_dedup(
                em._read(spark, sf_dir, "documents"),
                "text",
                "doc_id",
                num_hashes=16,
                bands=4,
                threshold=0.7,
                hash_family="xxhash",
            )
        ),
    )
    timed("embedding_topk", lambda: noop(em.q_embedding_topk(spark, sf_dir)))
    timed(
        "fingerprint_documents",
        lambda: noop(em.q_fingerprint_documents(spark, sf_dir)),
    )

    out = {
        "sf": sf,
        "cpus": cpus,
        "reps": reps,
        "timings": timings,
        "min": {k: min(v) for k, v in timings.items()},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
