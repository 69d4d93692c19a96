"""Pinned-core scaling probe for non-KG jobs (multi-domain evidence for the
N -> 4N gate; companion to bench.py --scaling-pinned).

    python tools/scaling_probe.py --job minhash --cpus 8   # one child
    python tools/scaling_probe.py --job minhash --pinned   # 2 vs 8 sweep

Jobs:
- minhash: dedup_minhash_lsh over the sf0.1 documents table (shuffle-heavy:
  shingle distinct, 64-way minhash agg, LSH self-join, CC).
- curation: the full plans/curate.py stack (mixed scan/filter/shuffle/write).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_child(job: str, cpus: int) -> dict:
    from ckg_spark.session import get_spark

    spark = get_spark(f"probe_{job}_{cpus}", cpus=cpus,
                      shuffle_partitions=max(8, 2 * cpus))
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.count()  # warm the scan
    t0 = time.time()
    if job == "minhash":
        from ckg_spark.operators.dedup import dedup_minhash_lsh

        n = dedup_minhash_lsh(docs).count()
    elif job == "curation":
        from ckg_spark.plans.curate import run_curation_pipeline

        out = os.path.join(tempfile.gettempdir(), f"probe_curate_{cpus}")
        shutil.rmtree(out, ignore_errors=True)
        n = run_curation_pipeline(
            spark, docs, out,
            gopher_kwargs={"min_words": 50, "min_stopword_hits": 1},
        ).corpus.count()
    else:
        raise SystemExit(f"unknown job {job}")
    wall = time.time() - t0
    spark.stop()
    return {"job": job, "cpus": cpus, "rows": n, "wall_s": round(wall, 2)}


def run_pinned_sweep(job: str, levels=(2, 8), trials: int = 3) -> dict:
    results: dict[int, list] = {c: [] for c in levels}
    for _ in range(trials):
        for c in levels:
            cmd = ["taskset", "-c", f"0-{c - 1}", sys.executable, __file__,
                   "--job", job, "--cpus", str(c)]
            p = subprocess.run(cmd, capture_output=True, text=True,
                               cwd=os.path.dirname(os.path.dirname(
                                   os.path.abspath(__file__))))
            results[c].append(json.loads(p.stdout.strip().splitlines()[-1]))
    best = {c: min(r["wall_s"] for r in rs) for c, rs in results.items()}
    rows = {c: rs[0]["rows"] for c, rs in results.items()}
    assert len(set(rows.values())) == 1, f"output drift across levels: {rows}"
    speedup = best[levels[0]] / best[levels[-1]]
    return {
        "job": job, "pinned": True, "rows": rows[levels[0]],
        "all_trials": {str(c): [r["wall_s"] for r in rs]
                       for c, rs in results.items()},
        "best": best,
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / (levels[-1] / levels[0]), 3),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--job", default="minhash")
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--pinned", action="store_true")
    a = ap.parse_args()
    if a.pinned:
        print(json.dumps(run_pinned_sweep(a.job)))
    else:
        print(json.dumps(run_child(a.job, a.cpus or 8)))
