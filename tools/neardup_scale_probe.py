"""Scale probe for incremental near-dup sync (round 5):

Claim under test (PLANS.md): per-sync shuffle work is O(delta + touched
buckets), never O(index) — growing the indexed corpus 10x must not grow
the per-delta sync wall 10x.

Method: build a docs snapshot table of H distinct docs (deterministic
JVM-side token streams, no Python datagen), index it with one initial
sync, then append the SAME fixed 1,000-doc delta (with a handful of
planted near-dups of early docs) and time the delta sync at H and 10H.
Reports both walls, the found-pair counts (identical — the planted dups),
and the empirical exponent log10(T10/T1).

Usage: python tools/neardup_scale_probe.py [--cpus 32] [--h 20000]
Prints one JSON line; paste into BENCH.md §c9.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_docs(spark, lo, n, dup_srcs=()):
    """Docs lo..lo+n-1: 40 tokens UNIQUE to the doc (injective in id, so
    the only near-dups are the planted ones); plus near-dup copies of the given source ids with the
    first token edited (jaccard ~ 0.95)."""
    from pyspark.sql import functions as F
    base = (spark.range(lo, lo + n)
            .select(F.col("id").alias("doc_id"),
                    F.expr("array_join(transform(sequence(0, 39), "
                           "j -> concat('t', id, '_', j)), ' ')"
                           ).alias("text")))
    if not dup_srcs:
        return base
    dups = (spark.createDataFrame([(int(s),) for s in dup_srcs], "id long")
            .select((F.col("id") + 5_000_000).alias("doc_id"),
                    F.expr("concat('zz ', array_join(transform("
                           "sequence(1, 39), "
                           "j -> concat('t', id, '_', j)), ' '))"
                           ).alias("text")))
    return base.unionByName(dups)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--h", type=int, default=20_000)
    ap.add_argument("--delta", type=int, default=1000)
    args = ap.parse_args()

    from ckg_spark.plans import neardup as N
    from ckg_spark.plans import table as T
    from ckg_spark.session import get_spark
    spark = get_spark("neardup_scale_probe", cpus=args.cpus,
                      shuffle_partitions=args.cpus)

    out = {"delta_docs": args.delta, "cpus": args.cpus}
    walls = {}
    for label, h in (("h1", args.h), ("h10", args.h * 10)):
        d = tempfile.mkdtemp(prefix="nd_probe_")
        try:
            ddir, idx = os.path.join(d, "docs"), os.path.join(d, "idx")
            T.append(make_docs(spark, 0, h), ddir)
            t0 = time.time()
            N.sync_neardup(spark, ddir, idx, threshold=0.6)
            index_wall = time.time() - t0
            # fixed delta: 1,000 fresh docs + 5 near-dups of docs 0..4
            T.append(make_docs(spark, 10_000_000, args.delta,
                               dup_srcs=range(5)), ddir)
            t0 = time.time()
            rep, pairs = N.sync_neardup(spark, ddir, idx, threshold=0.6)
            wall = time.time() - t0
            walls[label] = wall
            out[label] = {"index_docs": h,
                          "initial_index_wall_s": round(index_wall, 2),
                          "delta_sync_wall_s": round(wall, 3),
                          "pairs_found": rep.n_pairs}
        finally:
            shutil.rmtree(d, ignore_errors=True)
    out["exponent_vs_index"] = round(
        math.log10(max(walls["h10"], 1e-9) / max(walls["h1"], 1e-9)), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
