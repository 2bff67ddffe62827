"""Measure this host's DRAM bandwidth ceiling and its N->4N scaling —
the hardware bound behind the scaling-efficiency table.

A barrier-synchronized multiprocess STREAM-style triad (c = 1.5*b + a on
200 MB float32 arrays, far beyond LLC; numpy out= ops, one process per
worker like Spark's Python workers / executor task threads). Reports the
aggregate bandwidth at 1 / N / 4N processes. The quotient
agg(4N) / (4 * agg(N)) is the efficiency ANY bandwidth-bound phase can at
best achieve scaling N->4N cores on this box — the window cells of
BENCH/BASELINE.md sit at that bound; the selection cells exceed it via
arithmetic intensity (GEMMs reuse cached operands).

Usage: python tools/bench_stream.py [N]   (default 8; also runs 1 and 4N)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

N_ELTS = 50_000_000  # 200 MB per array, three arrays per process
ITERS = 5
BYTES_PER_ELT = 16  # read a + read b + write-allocate+write c, two passes


def triad(q, barrier):
    a = np.ones(N_ELTS, dtype=np.float32)
    b = np.full(N_ELTS, 2.0, dtype=np.float32)
    c = np.zeros(N_ELTS, dtype=np.float32)
    barrier.wait()  # synchronized timed section (exclude fork + init)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.multiply(b, 1.5, out=c)
        np.add(c, a, out=c)
    q.put(time.perf_counter() - t0)


def run(procs: int) -> dict:
    q = mp.Queue()
    barrier = mp.Barrier(procs)
    ps = [mp.Process(target=triad, args=(q, barrier)) for _ in range(procs)]
    for p in ps:
        p.start()
    times = [q.get() for _ in ps]
    for p in ps:
        p.join()
    span = max(times)
    gb = procs * ITERS * N_ELTS * BYTES_PER_ELT / 1e9
    return {"procs": procs, "span_s": round(span, 2), "agg_GBps": round(gb / span, 1)}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = [run(1), run(n), run(4 * n)]
    eff = rows[2]["agg_GBps"] / (4 * rows[1]["agg_GBps"])
    print(json.dumps({"rows": rows, "stream_eff_N_to_4N": round(eff, 3)}))


if __name__ == "__main__":
    main()
