"""Memory-bandwidth saturation microbenchmark (STREAM-triad-style).

Substantiates the scaling-grid analysis in BENCH/BASELINE.md: if the
box's aggregate memory bandwidth stops growing with process count, then
ANY bandwidth-bound job measured as local[N] vs local[4N] on this box is
capped below 4x regardless of engine design — the ceiling belongs to the
host, not the plan.

P independent OS processes (no shared GIL, no Spark) each run numpy
triad a = b + s*c over arrays far larger than L3, and we report the
aggregate GB/s per P.  Usage: python BENCH/membw.py [sizes...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


N = 40_000_000  # 3 arrays x 320 MB double = ~1 GB working set per process


def _triad(q, barrier) -> None:
    import numpy as np

    a = np.zeros(N)
    b = np.ones(N)
    c = np.full(N, 2.0)
    # warm page-in
    a[:] = b + 1.5 * c
    # synchronize: all P processes enter the timed region together, else
    # start skew lets slower procs run partially alone and the summed
    # per-process rates overstate the true aggregate bandwidth
    barrier.wait()
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        a[:] = b + 1.5 * c
    dt = time.time() - t0
    # triad moves 3 arrays x 8 bytes per element per rep (2 reads + 1 write)
    q.put(reps * 3 * 8 * N / dt / 1e9)


def run(p: int) -> float:
    q = mp.Queue()
    barrier = mp.Barrier(p)
    procs = [mp.Process(target=_triad, args=(q, barrier)) for _ in range(p)]
    for pr in procs:
        pr.start()
    rates = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    return round(sum(rates), 1)


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    out = {}
    for p in sizes:
        out[str(p)] = run(p)
        print(f"P={p}: aggregate {out[str(p)]} GB/s", flush=True)
    print(json.dumps({"triad_gbps_by_procs": out}))


if __name__ == "__main__":
    main()
