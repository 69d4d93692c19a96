"""Memory-bandwidth ceiling microbenchmark (scaling-gate evidence).

Runs N worker processes, each streaming copies over a 256 MB numpy array
(far beyond L3, pure memory traffic), and reports aggregate GB/s at each
worker count. If aggregate bandwidth from 2 -> 8 workers rises only ~Kx,
then NO memory-bound stage (shuffle write/read, string materialization,
hash-agg probe) can exceed ~Kx speedup from local[2] -> local[8] on this
box, regardless of plan quality — the hardware ceiling that executor
scale-out (each executor owning its own memory subsystem) removes.

Usage: python tools/membw.py [workers ...]   (default: 1 2 8)
Prints one JSON line: {"levels": {"1": gbps, ...}, "ceiling_2_to_8": x}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

ARR_MB = 256
SECONDS = 6.0


def _worker(q: mp.Queue, barrier) -> None:
    import numpy as np

    src = np.random.RandomState(0).bytes(ARR_MB * 1024 * 1024)
    a = np.frombuffer(src, dtype=np.uint8).copy()
    b = np.empty_like(a)
    barrier.wait()
    t0 = time.time()
    n = 0
    while time.time() - t0 < SECONDS:
        np.copyto(b, a)
        a, b = b, a
        n += 1
    dt = time.time() - t0
    # each copy reads ARR_MB and writes ARR_MB -> 2x traffic
    q.put(2.0 * n * ARR_MB / 1024.0 / dt)


def measure(workers: int) -> float:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(workers)
    procs = [mp.Process(target=_worker, args=(q, barrier)) for _ in range(workers)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return round(total, 2)


if __name__ == "__main__":
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 8]
    out = {"levels": {}}
    for w in levels:
        out["levels"][str(w)] = measure(w)
    if "2" in out["levels"] and "8" in out["levels"]:
        out["ceiling_2_to_8"] = round(out["levels"]["8"] / out["levels"]["2"], 3)
    print(json.dumps(out))
