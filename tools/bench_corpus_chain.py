"""Crawl-to-tensors chain benchmark (VERDICT r6 #5): wall-clock + per-stage
breakdown + N->4N scaling for the full LLM-corpus pipeline every stage of
which ships individually —

  WARC ingest -> HTML extract -> PII scrub -> exact dedup ->
  LM-perplexity filter -> BPE encode -> vocab ids -> contiguous packing ->
  deterministic epoch shuffle

Input: a deterministic synthetic crawl written ONCE to /tmp — sf0.1
documents text wrapped in HTML response records, replicated xREPL with
hash-keyed mutation and an 8% exact-duplicate plant, across SHARDS .warc
files (splittable ingest). Same measurement discipline as
tools/bench_scaling.py: fresh JVM per (cpus, rep), reps interleaved across
parallelism levels, min-of-N per cell, efficiency = T(N) / (4 * T(4N)).

Usage: python tools/bench_corpus_chain.py [N] [repeat]
Appends raw rows to BENCH/raw_chain_{cpus}.json and prints the cell table
(paste into BENCH/ANALYSIS_r07.md / BASELINE.md).
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REPL = 64  # 5k sf0.1 docs -> 320k pages (~56M whitespace tokens)
SHARDS = 64
CRAWL_DIR = f"/tmp/bench_crawl_x{REPL}"


def build_crawl():
    if os.path.exists(os.path.join(CRAWL_DIR, "_DONE")):
        return
    import duckdb

    os.makedirs(CRAWL_DIR, exist_ok=True)
    rows = duckdb.sql(
        "SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.1/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    shard_bufs = [[] for _ in range(SHARDS)]
    pid = 0
    for rep in range(REPL):
        for doc_id, text in rows:
            # deterministic variation: mutate one word per replica via a
            # cheap hash; every 12th page within rep 1 duplicates rep 0's
            # page body EXACTLY (dedup fodder, ~8%)
            if rep >= 1 and pid % 12 == 0:
                body = text  # exact duplicate of the rep-0 page
            else:
                h = int(hashlib.md5(f"{rep}:{doc_id}".encode()).hexdigest()[:8], 16)
                words = text.split()
                if words and rep:
                    words[h % len(words)] = f"v{h % 997}"
                body = " ".join(words)
            html = (
                f"<html><head><title>p{pid}</title></head><body>"
                f"<h1>page {pid}</h1><p>{body}</p>"
                f"<script>var x=1;</script></body></html>"
            )
            payload = html.encode()
            rec = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: https://crawl.test/{pid}\r\n".encode()
                + f"WARC-Record-ID: <urn:uuid:{pid}>\r\n".encode()
                + f"Content-Length: {len(payload)}\r\n".encode()
                + b"\r\n"
                + payload
                + b"\r\n\r\n"
            )
            shard_bufs[pid % SHARDS].append(rec)
            pid += 1
    for s, recs in enumerate(shard_bufs):
        with open(os.path.join(CRAWL_DIR, f"shard{s:03d}.warc"), "wb") as f:
            f.write(b"".join(recs))
    with open(os.path.join(CRAWL_DIR, "_DONE"), "w") as f:
        f.write(str(pid))
    print(f"crawl built: {pid} pages over {SHARDS} shards")


CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[v] = "1"
cpus = int(os.environ["SPARK_GRAFT_CPUS"])
crawl = os.environ["BENCH_CRAWL_DIR"]
from pyspark.sql import functions as F
from powershap_spark.session import get_spark
from powershap_spark.sources.warc import read_warc
from powershap_spark.operators.scrub import extract_html_text, scrub_pii
from powershap_spark.operators.dedup import exact_dedup
from powershap_spark.operators.text import (
    bpe_encode, build_vocab, lm_perplexity, tokens_to_ids, token_count,
)
from powershap_spark.operators.sharding import (
    deterministic_shuffle_shards, pack_contiguous,
)
from __spark_entry__ import _BPE_RULES

spark = get_spark(app_name=f"chain{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)

stages = {}
def timed(name, make):
    t0 = time.perf_counter()
    df = make().persist()
    n = df.count()
    stages[name] = round(time.perf_counter() - t0, 2)
    return df, n

# 1. ingest + extract + scrub: one fused projection over the records
def s1():
    return (
        read_warc(spark, crawl)
        .filter(~F.col("_warc_malformed") & (F.col("warc_type") == "response"))
        .select(
            F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("long").alias("doc_id"),
            extract_html_text("payload", min_words=3).alias("text"),
        )
        .transform(lambda d: scrub_pii(d).drop("text")
                   .withColumnRenamed("text_scrubbed", "text"))
        .select("doc_id", "text")
    )
docs, n_pages = timed("ingest_extract_scrub", s1)

# 2. exact dedup (normalized text, min-id representative)
dd, n_dedup = timed("exact_dedup", lambda: exact_dedup(docs))

# 3. CCNet-style perplexity gate: drop the worst 5% transitions.
# ppl is consumed twice (quantile action + semi join) -> persist it,
# exactly as a production chain would checkpoint its scores table.
def s3():
    ppl = lm_perplexity(dd).persist()
    q = ppl.approxQuantile("ppl", [0.95], 0.001)
    thr = q[0] if q else float("inf")
    out = dd.join(
        ppl.filter((F.col("n_scored") == 0) | (F.col("ppl") <= thr))
           .select("doc_id"),
        "doc_id", "left_semi")
    return out
filt, n_filt = timed("ppl_filter", s3)

# 4. tokenize: BPE encode (shipped 12-rule table) -> vocab -> input ids.
# the encoded tokens feed BOTH the vocab count and the id mapping ->
# persist the encode output instead of re-running the replace chain.
def s4():
    # method="dict": the 100-TB path — the replace chain runs once per
    # DISTINCT word (this corpus: ~1k words), not once per corpus token;
    # the inline projection variant measured ALLOCATION-BOUND at 32
    # threads on this single-JVM host (negative scaling, ANALYSIS_r07 #3)
    flat = (
        bpe_encode(filt, _BPE_RULES, method="dict")
        .select("doc_id", "tokens").persist()
    )
    vocab = build_vocab(flat, size=1024, text_col="tokens")
    return tokens_to_ids(flat, vocab)
ids, n_tok = timed("bpe_encode_vocab_ids", s4)
n_tokens = ids.select(F.sum(F.size("input_ids"))).collect()[0][0]

# 5. contiguous packing into 512-token blocks (over the filtered text)
packed, n_spans = timed(
    "pack_contiguous", lambda: pack_contiguous(filt, 512))

# 6. deterministic epoch shuffle of the packed blocks
def s6():
    blocks = packed.groupBy("block_id").agg(F.count("*").alias("n_docs"))
    return deterministic_shuffle_shards(blocks, "block_id", n_shards=64)
shuf, n_blocks = timed("epoch_shuffle", s6)

total = round(sum(stages.values()), 2)
print("RESULT " + json.dumps({
    "cpus": cpus, "sec": total, "stages": stages,
    "pages": n_pages, "after_dedup": n_dedup, "after_filter": n_filt,
    "tokens": int(n_tokens), "blocks": n_blocks,
    "tokens_per_sec": round(n_tokens / total, 1),
}))
"""


def _raw_path(cpus):
    return os.path.join(ROOT, "BENCH", f"raw_chain_{cpus}.json")


def _append(cpus, rec):
    rows = []
    if os.path.exists(_raw_path(cpus)):
        rows = json.load(open(_raw_path(cpus)))
    rows.append(rec)
    json.dump(rows, open(_raw_path(cpus), "w"), indent=1)


def _best(cpus):
    if not os.path.exists(_raw_path(cpus)):
        return None
    rows = json.load(open(_raw_path(cpus)))
    best = dict(min(rows, key=lambda r: r["sec"]))
    best["all_secs"] = [r["sec"] for r in rows]
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    build_crawl()
    for rep in range(repeat):
        for cpus in (n, 4 * n):  # interleaved across parallelism levels
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(cpus),
                BENCH_CRAWL_DIR=CRAWL_DIR,
                SPARK_DRIVER_MEM="48g",
            )
            out = subprocess.run(
                [sys.executable, "-c", CHILD],
                capture_output=True, text=True, env=env, cwd=ROOT, timeout=1800,
            )
            rec = None
            for line in out.stdout.splitlines():
                if line.startswith("RESULT "):
                    rec = json.loads(line[len("RESULT "):])
            if rec is None:
                raise RuntimeError(
                    f"chain child failed rc={out.returncode}:\n{out.stderr[-1500:]}"
                )
            _append(cpus, rec)
            print(f"rep{rep} cpus={cpus}: {rec['sec']}s "
                  f"{rec['tokens_per_sec']} tok/s {rec['stages']}", flush=True)
    s, l = _best(n), _best(4 * n)
    eff = s["sec"] / (4 * l["sec"])
    print(json.dumps({
        "cell": "crawl_to_tensors_chain",
        f"local[{n}]": s["sec"], f"local[{4*n}]": l["sec"],
        "tokens": s["tokens"],
        f"tok_per_sec_{n}": round(s["tokens"] / s["sec"], 1),
        f"tok_per_sec_{4*n}": round(l["tokens"] / l["sec"], 1),
        "scaling_efficiency": round(eff, 3),
        "stages_min_4n": l["stages"],
    }, indent=1))


if __name__ == "__main__":
    main()
