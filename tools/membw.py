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


def _scatter_worker(q: mp.Queue, barrier) -> None:
    """Hash-aggregation proxy: random scatter-add into a 64 MB table —
    the memory access pattern of a shuffle-side hash agg (random cache-line
    touches over a working set larger than an L3 share)."""
    import numpy as np

    rng = np.random.RandomState(1)
    table = np.zeros(8 * 1024 * 1024, dtype=np.int64)  # 64 MB
    idx = rng.randint(0, len(table), 4 * 1024 * 1024).astype(np.int64)
    vals = np.ones_like(idx)
    barrier.wait()
    t0 = time.time()
    n = 0
    while time.time() - t0 < SECONDS:
        table[idx] = table[idx] + vals  # gather + scatter, random lines
        n += len(idx)
    dt = time.time() - t0
    q.put(n / dt / 1e6)  # M updates/s


def measure(workers: int, fn=_worker) -> float:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(workers)
    procs = [mp.Process(target=fn, args=(q, barrier)) for _ in range(workers)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return round(total, 2)


if __name__ == "__main__":
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 8]
    out = {"stream_gbps": {}, "scatter_mups": {}}
    for w in levels:
        out["stream_gbps"][str(w)] = measure(w, _worker)
    for w in levels:
        out["scatter_mups"][str(w)] = measure(w, _scatter_worker)
    for k in ("stream_gbps", "scatter_mups"):
        if "2" in out[k] and "8" in out[k]:
            out[f"{k}_ceiling_2_to_8"] = round(out[k]["8"] / out[k]["2"], 3)
    print(json.dumps(out))
