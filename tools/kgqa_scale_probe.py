"""Data-scale probe for the round-5g KG-QA family: run triangle_counts,
schema_violations + negative_triples, and mention_contexts at a base size
and at 10x in the same local[32] session, and report the empirical scaling
exponent per operator:

    exponent = log10(T_10x / T_1x)        (1.0 = perfectly linear)

Inputs are synthesized deterministically (house pattern, no external
data):
- graph: circulant graph over n nodes with offsets {1..6} — exactly 6n
  edges and 15n triangles at ANY n, so density and triangle rate are
  scale-invariant by construction and the probe measures scale, not a
  drifting graph shape (the count also self-checks the operator at both
  sizes: corner count must equal 45n);
- corpus: synthesized doc rows with one planted mention each for
  mention_contexts; positives = every 20th circulant edge, pool = 50k
  entities for negative_triples.

A warm-up pass at the base size runs first and is DISCARDED (JIT/codegen
warm-up otherwise makes the 10x leg look faster than 1x).

Usage: python tools/kgqa_scale_probe.py [--cpus 32] [--base-nodes 1000000]
Prints one JSON line; paste the numbers into BENCH.md §c10.
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


def circulant(spark, n_nodes: int):
    """Offsets {1..6}: 6n edges, exactly 15n triangles, 45n corners
    (pairs a,b >= 1 with a+b <= 6: 5+4+3+2+1 = 15 triangles per base node)."""
    from pyspark.sql import functions as F

    ids = spark.range(0, n_nodes).repartition(32)
    return ids.select(
        F.col("id").alias("subj"),
        F.explode(F.array(*[
            ((F.col("id") + d) % n_nodes) for d in range(1, 7)])).alias("obj"))


def synth_corpus(spark, n_docs: int):
    from pyspark.sql import functions as F

    return spark.range(0, n_docs).repartition(32).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("tok"), (F.col("id") * 17 % 1000).cast("string")),
            F.lit("alpha beta entity gamma delta"),
            F.concat(F.lit("tok"), (F.col("id") * 31 % 1000).cast("string")),
            F.lit("filler words around the mention site"),
        ).alias("text"),
    )


def run_once(spark, out: dict, n_nodes: int, n_docs: int, tag: str) -> None:
    from ckg_spark.operators.graph_algos import triangle_counts
    from ckg_spark.operators.kg_qa import negative_triples, schema_violations
    from ckg_spark.operators.extract import mention_contexts
    from pyspark.sql import functions as F

    g = circulant(spark, n_nodes)
    t0 = time.time()
    tri = triangle_counts(g)
    corners = tri.agg(F.sum("triangles")).first()[0] or 0
    out[f"triangles_{tag}_sec"] = round(time.time() - t0, 2)
    out[f"triangles_{tag}_corners"] = int(corners)
    assert corners == 45 * n_nodes, (corners, 45 * n_nodes)  # self-check

    types = spark.range(0, n_nodes).select(
        F.col("id").alias("id"), (F.col("id") % 5).cast("string").alias("type"))
    rules = spark.createDataFrame(
        [("R", str(a), str(b)) for a in range(5) for b in range(5)
         if (a + b) % 5 < 3],
        ["pred", "subj_type", "obj_type"])
    edges = g.select("subj", F.lit("R").alias("pred"), "obj")
    t0 = time.time()
    n_viol = schema_violations(edges, types, rules).count()
    out[f"validate_{tag}_sec"] = round(time.time() - t0, 2)
    out[f"validate_{tag}_violations"] = int(n_viol)

    pos = edges.where(F.col("subj") % 20 == 0).select(
        F.col("subj").cast("string").alias("subj"), "pred",
        F.col("obj").cast("string").alias("obj"))
    pool = spark.range(0, 50_000).select(F.col("id").cast("string").alias("id"))
    t0 = time.time()
    n_neg = negative_triples(pos, pool, k=2, seed="probe").count()
    out[f"negsample_{tag}_sec"] = round(time.time() - t0, 2)
    out[f"negsample_{tag}_rows"] = int(n_neg)

    docs = synth_corpus(spark, n_docs)
    mentions = docs.select("doc_id", F.lit("entity").alias("term"))
    t0 = time.time()
    n_ctx = mention_contexts(mentions, docs, 40).count()
    out[f"contexts_{tag}_sec"] = round(time.time() - t0, 2)
    out[f"contexts_{tag}_rows"] = int(n_ctx)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--base-nodes", type=int, default=1_000_000)
    ap.add_argument("--base-docs", type=int, default=1_000_000)
    args = ap.parse_args()

    from ckg_spark.session import get_spark

    spark = get_spark("kgqa_scale_probe", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    out: dict = {"metric": "kgqa_scale_probe", "cpus": args.cpus,
                 "base_nodes": args.base_nodes, "base_docs": args.base_docs}

    run_once(spark, {}, args.base_nodes // 2, args.base_docs // 2, "warm")
    run_once(spark, out, args.base_nodes, args.base_docs, "1x")
    run_once(spark, out, args.base_nodes * 10, args.base_docs * 10, "10x")

    for op in ("triangles", "validate", "negsample", "contexts"):
        r = out[f"{op}_10x_sec"] / max(out[f"{op}_1x_sec"], 1e-9)
        out[f"{op}_exponent"] = round(math.log10(max(r, 1e-9)), 3)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
