"""Two-parallelism throughput evidence for the round-6 text operators
(dedup_ngram_spans / lm_perplexity / tfidf_keywords) — the shuffle-heavy
corpus ops added late in round 6, measured at a corpus size where the
shuffles (not per-job fixed overhead) dominate.

Same protocol as bench_scaling.py: the SAME job on the SAME input at
local[N] and local[4N] in fresh JVMs, interleaved min-of-REPEAT (host
wall noise is 2-5x), efficiency = T(N) / (4 * T(4N)). The corpus is
synth.documents written ONCE to a shared parquet dir so every cell reads
identical bytes.

Usage: python tools/bench_text_ops.py [n_docs] [N] [repeat]
Defaults: 400000 docs, N=8 (so 8 vs 32), repeat 3.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
cpus = int(os.environ["BENCH_CPUS"])
op = os.environ["BENCH_OP"]
path = os.environ["BENCH_CORPUS"]
from powershap_spark.session import get_spark
spark = get_spark(app_name=f"bench_text_{op}_{cpus}",
                  master=f"local[{cpus}]", shuffle_partitions=cpus)
d = spark.read.parquet(path)

from powershap_spark.operators.text import (
    dedup_ngram_spans, lm_perplexity, tfidf_keywords)
OPS = {
    "spans": lambda: dedup_ngram_spans(d, k=5, min_count=2),
    "ppl": lambda: lm_perplexity(d),
    "tfidf": lambda: tfidf_keywords(d, k=5),
}

def run():
    # noop write: materializes EVERY output column (a bare count() lets
    # Catalyst prune the aggregates and measures a hollowed-out plan)
    OPS[op]().write.format("noop").mode("overwrite").save()

run()  # warm: JIT + codegen + file index (steady-state is what scales)
t0 = time.perf_counter(); run(); wall = time.perf_counter() - t0
print(json.dumps({"op": op, "cpus": cpus, "wall": round(wall, 3)}))
"""


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    corpus = f"/tmp/bench_text_ops_{n_docs}"

    if not os.path.exists(corpus):
        from powershap_spark.session import get_spark
        from powershap_spark import synth

        spark = get_spark(app_name="bench_text_prep", master="local[16]",
                          shuffle_partitions=16)
        synth.documents(spark, n_docs=n_docs, vocab_size=1000,
                        n_partitions=64).write.parquet(corpus)
        spark.stop()

    ops = ["spans", "ppl", "tfidf"]
    cells = {(op, c): [] for op in ops for c in (n, 4 * n)}
    env_base = {**os.environ, "BENCH_CORPUS": corpus,
                "OMP_NUM_THREADS": "1", "OPENBLAS_NUM_THREADS": "1"}
    for r in range(repeat):
        for op in ops:
            for cpus in (n, 4 * n):
                env = {**env_base, "BENCH_OP": op, "BENCH_CPUS": str(cpus)}
                out = subprocess.run(
                    [sys.executable, "-c", CHILD], cwd=ROOT, env=env,
                    capture_output=True, text=True, timeout=3600)
                lines = [l for l in out.stdout.splitlines()
                         if l.startswith("{")]
                if out.returncode != 0 or not lines:
                    raise RuntimeError(
                        f"bench child {op} local[{cpus}] failed "
                        f"(rc={out.returncode}):\n{out.stderr[-3000:]}"
                    )
                rec = json.loads(lines[-1])
                cells[(op, cpus)].append(rec["wall"])
                print(f"round {r} {op} local[{cpus}]: {rec['wall']}s",
                      flush=True)

    print("\n| op | local[%d] min (s) | local[%d] min (s) | efficiency | raw |"
          % (n, 4 * n))
    print("|---|---|---|---|---|")
    for op in ops:
        t1, t4 = min(cells[(op, n)]), min(cells[(op, 4 * n)])
        eff = t1 / (4 * t4)
        print(f"| {op} | {t1} | {t4} | {eff:.3f} | "
              f"{cells[(op, n)]} / {cells[(op, 4 * n)]} |")


if __name__ == "__main__":
    main()
