"""10x scale probe (round-3 verdict item 8): run the three headline
pipelines — kg_pipeline, curation, minhash near-dup — at the bench scale
(600k turns / 5k docs, the sf0.1-equivalent) AND at 10x (6M turns / 50k
docs, the sf1-equivalent) in the same local[32] session, and report the
empirical scaling exponent per pipeline:

    exponent = log10(T_10x / T_1x)        (1.0 = perfectly linear)

Inputs are synthesized deterministically (no external data, per the round
brief): transcripts via ten seed-disjoint gen_transcripts chunks (conv_id
embeds the seed, so chunks never collide); documents via ten salted
replicas of the sf0.1 documents table — every 7th token of replica i is
rewritten to "r{i}tok", which keeps each replica's INTERNAL near-dup
structure identical to sf0.1 while pushing cross-replica Jaccard far below
the 0.8 threshold (so the minhash workload grows 10x in docs, not in
degenerate cluster mass).

Usage: python tools/scale_probe_10x.py [--cpus 32] [--skip-10x]
Prints one JSON line; paste the numbers into BENCH.md §c.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ensure_transcripts_10x(vocab, base_dir: str) -> str:
    """Ten seed-disjoint 600k-turn chunks -> one parquet directory."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ckg_spark.datagen import gen_transcripts

    out = os.path.join(base_dir, "transcripts_bench10x.parquet")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    for i in range(10):
        part = os.path.join(out, f"part-{i:02d}.parquet")
        if os.path.exists(part):
            continue
        pdf = gen_transcripts(600_000, vocab=vocab, seed=42 + i)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), part)
        print(f"  transcripts chunk {i}: {len(pdf)} rows", file=sys.stderr)
    open(done, "w").write("ok")
    return out


def ensure_docs_10x(spark, sf_dir: str, base_dir: str) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(base_dir, "documents_10x.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps = None
    for i in range(10):
        salted = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t, j: F.when(j % 7 == F.lit(i % 7), F.lit(f"r{i}tok"))
                                  .otherwise(t),
                ), " ").alias("text"),
            "lang", "source", "n_chars",
        )
        reps = salted if reps is None else reps.unionByName(salted)
    reps.write.mode("overwrite").parquet(out)
    return out


def time_kg(spark, vocab, tpath):
    import bench

    t0 = time.time()
    out = bench.run_kg_pipeline(spark, vocab, tpath)
    out["wall"] = round(time.time() - t0, 2)
    return out


def time_curation(spark, docs_path):
    from ckg_spark.plans.curate import run_curation_pipeline

    out_dir = os.path.join(tempfile.gettempdir(), "ckg_scale_probe_curate")
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = spark.read.parquet(docs_path)
    n_in = docs.count()
    t0 = time.time()
    cur = run_curation_pipeline(
        spark, docs, out_dir,
        gopher_kwargs={"min_words": 50, "min_stopword_hits": 1},
        minhash_threshold=0.8)
    n_out = cur.corpus.count()
    return {"wall": round(time.time() - t0, 2), "docs_in": n_in, "docs_out": n_out}


def time_minhash(spark, docs_path):
    from ckg_spark.operators.dedup import dedup_minhash_lsh

    docs = spark.read.parquet(docs_path)
    t0 = time.time()
    n = dedup_minhash_lsh(docs, threshold=0.8).count()
    return {"wall": round(time.time() - t0, 2), "cluster_rows": n}


def time_bpe(spark, docs_path):
    """BPE train (150 merges, min_freq 2) + apply over the corpus — the
    round-4b tokenizer surface; merge count is fixed so the 10x run does
    strictly more counting work over strictly more words."""
    from pyspark.sql import functions as F

    from ckg_spark.operators.bpe import apply_bpe, learn_bpe

    docs = spark.read.parquet(docs_path)
    t0 = time.time()
    merges = learn_bpe(docs, n_merges=150, min_freq=2)
    toks = apply_bpe(docs, merges).agg(F.sum("bpe_token_count").alias("t")).collect()[0]["t"]
    return {"wall": round(time.time() - t0, 2),
            "merges": len(merges), "tokens_out": int(toks)}


def _child(pipeline: str, scale: str, cpus: int, sf_dir: str):
    """One measurement in a FRESH JVM (session-state contamination made a
    shared-session sequential sweep overstate 1x walls by up to 70% — see
    the bench-noise methodology notes in BENCH.md §a)."""
    from ckg_spark.datagen import ensure_transcripts
    from ckg_spark.session import get_spark
    from ckg_spark.vocab import build_vocab

    vocab = build_vocab(n_entities=6000, seed=7)
    base = os.path.join(REPO, "data")
    spark = get_spark(f"scale_probe_{pipeline}_{scale}", cpus=cpus)
    if pipeline == "kg":
        path = (ensure_transcripts("bench", vocab=vocab, base_dir=base)
                if scale == "1x" else ensure_transcripts_10x(vocab, base))
        out = time_kg(spark, vocab, path)
    else:
        path = (os.path.join(sf_dir, "documents.parquet") if scale == "1x"
                else ensure_docs_10x(spark, sf_dir, base))
        out = {"curation": time_curation, "minhash": time_minhash,
               "bpe": time_bpe}[pipeline](spark, path)
    print("CHILD_RESULT " + json.dumps(out))
    spark.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--child", nargs=2, metavar=("PIPELINE", "SCALE"))
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--pipelines", default="kg,curation,minhash",
                    help="comma list from kg,curation,minhash,bpe")
    args = ap.parse_args()
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

    if args.child:
        _child(args.child[0], args.child[1], args.cpus, args.sf_dir)
        return

    # warm the cached inputs once (generation excluded from timings)
    from ckg_spark.datagen import ensure_transcripts
    from ckg_spark.session import get_spark
    from ckg_spark.vocab import build_vocab

    vocab = build_vocab(n_entities=6000, seed=7)
    base = os.path.join(REPO, "data")
    ensure_transcripts("bench", vocab=vocab, base_dir=base)
    ensure_transcripts_10x(vocab, base)
    warm = get_spark("scale_probe_warm", cpus=args.cpus)
    ensure_docs_10x(warm, args.sf_dir, base)
    warm.stop()

    def run_child(pipeline, scale):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", pipeline, scale, "--cpus", str(args.cpus),
             "--sf-dir", args.sf_dir],
            capture_output=True, text=True, timeout=3600)
        for line in p.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                return json.loads(line[len("CHILD_RESULT "):])
        raise RuntimeError(f"{pipeline}/{scale} child failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")

    res = {"cpus": args.cpus, "trials": args.trials, "pipelines": {}}
    for name in args.pipelines.split(","):
        runs = {"1x": [], "10x": []}
        for _ in range(args.trials):          # interleaved best-of
            for scale in ("1x", "10x"):
                r = run_child(name, scale)
                runs[scale].append(r)
                print(f"  {name} {scale}: {r['wall']}s", file=sys.stderr)
        best1 = min(runs["1x"], key=lambda r: r["wall"])
        best10 = min(runs["10x"], key=lambda r: r["wall"])
        exp = math.log10(best10["wall"] / best1["wall"])
        res["pipelines"][name] = {
            "t_1x_sec": best1["wall"], "t_10x_sec": best10["wall"],
            "exponent": round(exp, 3),
            "all_1x": [r["wall"] for r in runs["1x"]],
            "all_10x": [r["wall"] for r in runs["10x"]],
            "r1": best1, "r10": best10,
        }
        print(f"  {name}: best 1x={best1['wall']}s 10x={best10['wall']}s "
              f"exp={exp:.3f}", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
