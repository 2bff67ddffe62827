"""Measured evidence for incremental MinHash dedup vs full re-dedup.

The daily-ingest scenario: a corpus of B documents already deduplicated
with its signature store persisted; a new shard of S documents arrives.
Compare:

  full       minhash_dedup over base ∪ shard — what a pipeline WITHOUT a
             signature store must run (re-shingles + re-hashes the whole
             corpus), then filter to shard ids;
  incremental incremental_minhash_dedup(shard, store) — shingles only the
             shard, joins its bands against the persisted (id, band) rows;
  bucketed   incremental_minhash_dedup_bucketed(shard, prefix) — same join
             against a write_banded_signature_store layout: the store's
             band rows are PRE-bucketed by (band_id, band_hash), so the
             store side of the daily join needs zero Exchange (the 10^12-id
             property; at bench scale the banding work it skips is small,
             so expect ≈parity here and read the plan assertion in
             test_text_dedup_sim.py for the scale claim).

Also reports store-build wall (the one-off cost the incremental path
amortizes) and asserts the kept sets are IDENTICAL (the oracle contract,
re-checked here so the timing compares equal work).

Interleaved min-of-R per the host-noise rule (BENCH/ANALYSIS).

Usage: python tools/bench_incremental_dedup.py [sf_dir|synth:N] [repeat]

``synth:N`` generates an N-doc corpus via ``synth.documents`` (planted
near-dups, deterministic) — the fixed testdata tops out at 5,000 docs
where per-job fixed overhead (~1 s) swamps both arms; the incremental
operator's win is a CORPUS-size effect, so it needs a corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    shard_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2

    from powershap_spark.session import get_spark
    from powershap_spark.operators.dedup import (
        build_minhash_signature_store,
        incremental_minhash_dedup,
        incremental_minhash_dedup_bucketed,
        minhash_dedup,
        write_banded_signature_store,
    )

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    if sf_dir.startswith("synth:"):
        from powershap_spark import synth

        n = int(sf_dir.split(":", 1)[1])
        # materialize to parquet: both arms read the same on-disk table,
        # as a real pipeline would — generation cost is out of the timings
        synth_path = f"/tmp/bench_docs_{n}.parquet"
        if not os.path.exists(synth_path):
            synth.documents(spark, n_docs=n).write.mode("overwrite").parquet(
                synth_path
            )
        docs = spark.read.parquet(synth_path)
    else:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    cut = int(n_docs * (1.0 - shard_frac))  # doc_id dense from 0: base first
    base = docs.filter(F.col("doc_id") < cut)
    shard = docs.filter(F.col("doc_id") >= cut)
    n_shard = shard.count()

    # one-off: persist the base signature store to parquet (as a real
    # pipeline would) so the incremental arm reads signatures, not text
    store_path = "/tmp/bench_sig_store.parquet"
    t0 = time.monotonic()
    base_sigs = build_minhash_signature_store(base)
    base_sigs.write.mode("overwrite").parquet(store_path)
    store_build_s = time.monotonic() - t0

    prefix = "bench_banded_store"
    for t in (f"{prefix}_bands", f"{prefix}_sigs"):
        spark.sql(f"drop table if exists {t}")
    t0 = time.monotonic()
    write_banded_signature_store(
        spark.read.parquet(store_path), prefix, path=f"/tmp/{prefix}"
    )
    banded_store_build_s = time.monotonic() - t0

    full_walls, inc_walls, bkt_walls = [], [], []
    kept_full = kept_inc = kept_bkt = None
    for _ in range(repeat):  # interleaved: noise hits both arms equally
        # cold rounds: minhash_dedup tracked-persists its signatures and
        # Spark's CacheManager matches identical logical plans, so without
        # this the 2nd+ rounds of BOTH arms read cached signatures and the
        # min measures warm-cache replay, not the daily-run cost
        spark.catalog.clearCache()
        t0 = time.monotonic()
        full = minhash_dedup(docs)
        kept_full = set(
            r[0] for r in full.filter(F.col("doc_id") >= cut).select("doc_id").collect()
        )
        full_walls.append(time.monotonic() - t0)

        store = spark.read.parquet(store_path)
        t0 = time.monotonic()
        kept_new, _sigs = incremental_minhash_dedup(shard, store)
        kept_inc = set(r[0] for r in kept_new.select("doc_id").collect())
        inc_walls.append(time.monotonic() - t0)

        spark.catalog.clearCache()
        t0 = time.monotonic()
        kept_b, _sigs_b = incremental_minhash_dedup_bucketed(shard, spark, prefix)
        kept_bkt = set(r[0] for r in kept_b.select("doc_id").collect())
        bkt_walls.append(time.monotonic() - t0)

    assert kept_full == kept_inc == kept_bkt, (
        f"contract violated: full-restricted {len(kept_full)} != "
        f"incremental {len(kept_inc)} / bucketed {len(kept_bkt)}"
    )

    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_shard": n_shard,
        "store_build_s": round(store_build_s, 2),
        "banded_store_build_s": round(banded_store_build_s, 2),
        "full_min_s": round(min(full_walls), 2),
        "incremental_min_s": round(min(inc_walls), 2),
        "bucketed_min_s": round(min(bkt_walls), 2),
        "speedup": round(min(full_walls) / min(inc_walls), 2),
        "kept_of_shard": len(kept_inc),
        "full_raw": [round(w, 2) for w in full_walls],
        "incremental_raw": [round(w, 2) for w in inc_walls],
        "bucketed_raw": [round(w, 2) for w in bkt_walls],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
