"""Scale probe for incremental canonicalization (round 5):

Claim under test (PLANS.md round-5d): per-sync SHUFFLE work is
O(delta + touched membership), never O(history) — growing the prior
mapping 10x must NOT grow the sync wall 10x when the delta is fixed.

Method: synthesize a prior mapping of H idents in H/10 ten-member
components deterministically JVM-side (spark.range arithmetic, no
Python datagen), apply the SAME fixed delta (D edges merging D pairs of
adjacent components, touching 2D components = 20D prior rows), and time
`incremental_canonical_mapping` at H and 10H. Reports both walls, the
empirical exponent log10(T10/T1) (1.0 = linear in history, ~0 = flat),
and output checksums proving the two runs did equivalent work per
touched component. Also times the plans/canon.py snapshot-table sync at
both H (append-only delta commit) for the end-to-end number.

Usage: python tools/canon_scale_probe.py [--cpus 32] [--h 200000]
       [--delta 1000]
Prints one JSON line; paste into BENCH.md §c8.
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


def make_mapping(spark, h):
    """H idents i00000000.. in H/10 components of 10; canon = the member
    with index % 10 == 0 (the lexicographic min of the group)."""
    from pyspark.sql import functions as F
    ident = F.concat(F.lit("i"), F.lpad(F.col("id").cast("string"), 9, "0"))
    canon = F.concat(F.lit("i"), F.lpad(
        ((F.col("id") / 10).cast("long") * 10).cast("string"), 9, "0"))
    return (spark.range(h)
            .select(ident.alias("ident"), canon.alias("canonical_id"))
            .localCheckpoint(eager=True))


def make_delta(spark, d):
    """D edges merging component 20k with component 20k+10 (adjacent
    groups) — touches 2D components, all inside the FIRST 20D ids, so the
    delta footprint is identical at any history size."""
    from pyspark.sql import functions as F
    a = F.concat(F.lit("i"), F.lpad(
        (F.col("id") * 20 + 3).cast("string"), 9, "0"))
    b = F.concat(F.lit("i"), F.lpad(
        (F.col("id") * 20 + 17).cast("string"), 9, "0"))
    return (spark.range(d)
            .select(a.alias("ident_a"), b.alias("ident_b"))
            .localCheckpoint(eager=True))


def run_operator(spark, prev, delta):
    from pyspark.sql import functions as F
    from ckg_spark.operators.canonicalize import incremental_canonical_mapping
    t0 = time.time()
    mapping, remaps = incremental_canonical_mapping(prev, delta)
    agg = mapping.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(ident, canonical_id))").alias("ck")).first()
    nr = remaps.count()
    return time.time() - t0, int(agg["n"]), int(agg["ck"]), nr


def run_table_sync(spark, prev, delta):
    from ckg_spark.plans import canon as C
    from ckg_spark.plans import table as T
    d = tempfile.mkdtemp(prefix="canon_probe_")
    try:
        mdir = os.path.join(d, "mapping")
        # seed the table with the prior mapping as version 1
        from pyspark.sql import functions as F
        T.append(prev.withColumn("map_version", F.lit(1).cast("int")), mdir)
        t0 = time.time()
        rep = C.sync_canonical_mapping(spark, mdir, delta)
        wall = time.time() - t0
        return wall, rep.n_changed, rep.n_remaps
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--h", type=int, default=200_000)
    ap.add_argument("--delta", type=int, default=1000)
    args = ap.parse_args()

    from ckg_spark.session import get_spark
    spark = get_spark("canon_scale_probe", cpus=args.cpus,
                      shuffle_partitions=args.cpus)

    delta = make_delta(spark, args.delta)
    out = {"delta_edges": args.delta, "cpus": args.cpus}
    walls = {}
    for label, h in (("h1", args.h), ("h10", args.h * 10)):
        prev = make_mapping(spark, h)
        # warm once (JIT/codegen), measure second
        run_operator(spark, prev, delta)
        w, n, ck, nr = run_operator(spark, prev, delta)
        tw, tn, tnr = run_table_sync(spark, prev, delta)
        walls[label] = w
        out[label] = {"history_rows": h, "operator_wall_s": round(w, 3),
                      "mapping_rows": n, "checksum": ck, "remaps": nr,
                      "table_sync_wall_s": round(tw, 3),
                      "rows_appended": tn}
    out["exponent_vs_history"] = round(
        math.log10(max(walls["h10"], 1e-9) / max(walls["h1"], 1e-9)), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
