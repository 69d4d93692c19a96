"""Scale probe for the temporal family (round 5): session_stats,
asof_join, asof_join_bucketed.

Synthesizes an event stream deterministically JVM-side (spark.range +
xxhash64 scatter — no external data, no Python in datagen), then:

1. data-scale: runs session_stats and asof_join at N and 10N rows and
   reports the empirical exponent log10(T10/T1) (1.0 = linear);
2. hot-key: one key holds the ENTIRE stream — the plain per-key window
   serializes into one task while the bucketed variant spreads the same
   work across (key, time-bucket) partitions; reports both walls and
   asserts equal output checksums.

Usage: python tools/temporal_scale_probe.py [--cpus 32] [--n 2000000]
Prints one JSON line; paste into BENCH.md §c7.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_events(spark, n, n_keys):
    from pyspark.sql import functions as F
    # hash-scattered but deterministic: ts spread over ~n seconds so gap
    # structure (and session count) stays scale-free; ~5% purchase markers
    return (spark.range(n)
            .select(F.col("id").alias("event_id"),
                    (F.xxhash64("id") % n_keys).alias("user_id"),
                    F.timestamp_micros(
                        (F.abs(F.xxhash64("id", F.lit(1))) % (n * 1_000_000))
                    ).alias("ts"),
                    (F.abs(F.xxhash64("id", F.lit(2))) % 3 == 0).alias("hit"))
            .localCheckpoint(eager=True))


def run_session(spark, ev):
    from ckg_spark.operators import temporal as T
    t0 = time.time()
    n = T.session_stats(ev, "user_id", "ts", 30.0, tiebreak="event_id").count()
    return time.time() - t0, n


def run_asof(spark, ev, bucketed=None):
    from pyspark.sql import functions as F
    from ckg_spark.operators import temporal as T
    right = ev.where("hit").select("user_id", F.col("ts").alias("pts"),
                                   F.col("event_id").alias("pid"))
    t0 = time.time()
    if bucketed:
        out = T.asof_join_bucketed(ev, right, "user_id", "ts", "pts",
                                   bucket_s=bucketed, tiebreak="pid")
    else:
        out = T.asof_join(ev, right, "user_id", "ts", "pts", tiebreak="pid")
    chk = out.agg(F.sum(F.coalesce("r_pid", F.lit(-1))),
                  F.count(F.lit(1))).collect()[0]
    return time.time() - t0, (int(chk[0]), int(chk[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--n", type=int, default=2_000_000)
    args = ap.parse_args()

    from ckg_spark.session import get_spark
    spark = get_spark("temporal_probe", cpus=args.cpus)
    res = {"n": args.n, "cpus": args.cpus}

    for label, n in (("1x", args.n), ("10x", 10 * args.n)):
        ev = make_events(spark, n, n_keys=max(1000, n // 1000))
        res[f"session_{label}_s"], res[f"session_{label}_rows"] = \
            run_session(spark, ev)
        res[f"asof_{label}_s"], _ = run_asof(spark, ev)
        ev.unpersist()
    res["session_exponent"] = round(math.log10(
        res["session_10x_s"] / res["session_1x_s"]), 3)
    res["asof_exponent"] = round(math.log10(
        res["asof_10x_s"] / res["asof_1x_s"]), 3)

    # hot key: everything on ONE key; time span ~n seconds -> bucket so
    # ~cpus*8 buckets carry the stream
    ev_hot = make_events(spark, args.n, n_keys=1)
    bucket_s = args.n / (args.cpus * 8)
    res["hot_plain_s"], chk_p = run_asof(spark, ev_hot)
    res["hot_bucketed_s"], chk_b = run_asof(spark, ev_hot, bucketed=bucket_s)
    res["hot_equal"] = chk_p == chk_b
    res["hot_speedup"] = round(res["hot_plain_s"] / res["hot_bucketed_s"], 2)

    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
