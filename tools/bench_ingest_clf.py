"""Two-parallelism throughput evidence for the ingest + gate operators
added late in round 6: WARC record parsing (the splittability claim —
lineSep record splitting must scale with cores on ONE uncompressed
file set), HTML -> text extraction (pure mapper pass), and the
quality-classifier trainer (featurize shuffles + per-epoch grouped-map
gradient partials).

Same protocol as bench_text_ops.py: the SAME job on the SAME input at
local[N] and local[4N] in fresh JVMs, interleaved min-of-REPEAT (host
wall noise is 2-5x), efficiency = T(N) / (4 * T(4N)). Inputs are built
ONCE under /tmp so every cell reads identical bytes:

- warc:  n_docs response records, HTML payloads, spread over 16
         uncompressed .warc files (each file still splits further via
         the delimiter scan);
- html:  parquet of the SAME pages as a column, isolating extraction
         from container parsing;
- clf:   the standard synth.documents corpus; featurize (dim 4096,
         n_parts = cores) + 3 full-batch GD epochs.

Usage: python tools/bench_ingest_clf.py [n_docs] [N] [repeat] [ops]
Defaults: 400000 docs, N=8 (so 8 vs 32), repeat 3, ops warc,html,clf
(ops also accepts "vocab" — build_vocab + tokens_to_ids over the same
corpus).
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
from powershap_spark.session import get_spark
spark = get_spark(app_name=f"bench_ingest_{op}_{cpus}",
                  master=f"local[{cpus}]", shuffle_partitions=cpus)

def run():
    if op == "warc":
        from powershap_spark.sources.warc import read_warc
        from pyspark.sql import functions as F
        df = read_warc(spark, os.environ["BENCH_WARC"])
        df.filter(~F.col("_warc_malformed")).write.format("noop") \
          .mode("overwrite").save()
    elif op == "html":
        from powershap_spark.operators.scrub import extract_html_text
        d = spark.read.parquet(os.environ["BENCH_HTML"])
        d.select("doc_id", extract_html_text("html").alias("text")) \
         .write.format("noop").mode("overwrite").save()
    elif op == "clf":
        from powershap_spark.operators.classifier import (
            featurize_hashed, train_logreg)
        from pyspark.sql import functions as F
        d = spark.read.parquet(os.environ["BENCH_CORPUS"]).select(
            "doc_id", "text",
            (F.length("text") % 2).cast("int").alias("label"))
        feat = featurize_hashed(d, label_col="label", dim=4096,
                                n_parts=cpus)
        train_logreg(feat, dim=4096, epochs=3, lr=1.0, n_parts=cpus)
    elif op == "vocab":
        from powershap_spark.operators.text import (
            _tokens, build_vocab, tokens_to_ids)
        d = spark.read.parquet(os.environ["BENCH_CORPUS"])
        vocab = build_vocab(d, size=4096)
        toks = d.select("doc_id", _tokens("text").alias("tokens"))
        tokens_to_ids(toks, vocab).write.format("noop") \
            .mode("overwrite").save()
    else:
        raise SystemExit(f"unknown op {op}")

run()  # warm: JIT + codegen + file index (steady-state is what scales)
t0 = time.perf_counter(); run(); wall = time.perf_counter() - t0
print(json.dumps({"op": op, "cpus": cpus, "wall": round(wall, 3)}))
"""


def _prepare(n_docs: int, corpus: str, html_dir: str, warc_dir: str) -> None:
    from powershap_spark import synth
    from powershap_spark.session import get_spark

    spark = get_spark(app_name="bench_ingest_prep", master="local[16]",
                      shuffle_partitions=16)
    if not os.path.exists(corpus):
        synth.documents(spark, n_docs=n_docs, vocab_size=1000,
                        n_partitions=64).write.parquet(corpus)
    if not os.path.exists(html_dir):
        # the ONE page template: __spark_entry__'s inject expression, so
        # the bench measures extraction over exactly the page shape the
        # oracle query pins (no drift between copies)
        import __spark_entry__ as em

        d = spark.read.parquet(corpus).select("doc_id", "text")
        d.select("doc_id", em._inject_html_expr().alias("html")) \
            .write.parquet(html_dir)
    if not os.path.exists(warc_dir):
        os.makedirs(warc_dir)
        # WARC payloads are the SAME pages (read back from html_dir)
        pdf = spark.read.parquet(html_dir).toPandas()
        n_files = 16
        handles = [
            open(os.path.join(warc_dir, f"shard{i:02d}.warc"), "wb")
            for i in range(n_files)
        ]
        try:
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                payload = html.encode()
                rec = (
                    b"WARC/1.0\r\n"
                    b"WARC-Type: response\r\n"
                    + f"WARC-Target-URI: https://x/{doc_id}\r\n".encode()
                    + b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                    + f"WARC-Record-ID: <urn:uuid:{doc_id}>\r\n".encode()
                    + f"Content-Length: {len(payload)}\r\n".encode()
                    + b"\r\n" + payload + b"\r\n\r\n"
                )
                handles[int(doc_id) % n_files].write(rec)
        finally:
            for h in handles:
                h.close()
    spark.stop()


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    corpus = f"/tmp/bench_text_ops_{n_docs}"  # shared with bench_text_ops
    html_dir = f"/tmp/bench_html_{n_docs}"
    warc_dir = f"/tmp/bench_warc_{n_docs}"
    _prepare(n_docs, corpus, html_dir, warc_dir)

    ops = (
        sys.argv[4].split(",") if len(sys.argv) > 4 else ["warc", "html", "clf"]
    )
    cells = {(op, c): [] for op in ops for c in (n, 4 * n)}
    env_base = {**os.environ, "BENCH_CORPUS": corpus,
                "BENCH_HTML": html_dir, "BENCH_WARC": warc_dir,
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
