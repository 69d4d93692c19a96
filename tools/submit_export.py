"""spark-submit entry point for the training-data export plan
(curation -> mixture -> packing; plans/export.py).

Deployment form (same --py-files shape as tools/submit_pipeline.py):

    zip -r ckg_spark.zip ckg_spark/
    spark-submit --py-files ckg_spark.zip tools/submit_export.py \
        --documents s3://bucket/documents \
        --out       s3://bucket/export \
        --targets web=0.6,code=0.25,books=0.15 --seq-len 4096

Sandbox form over local parquet:

    python tools/submit_export.py \
        --documents /root/testdata/sf0.01/documents.parquet \
        --out /tmp/export --targets src0=0.5,src1=0.5 --seq-len 128

Resume: rerunning with the same --out skips committed stages; changing
the recipe (targets/seq_len/...) against an existing --out is refused.

Incremental form (release cadence — documents live in a plans.table
snapshot table; each run packs only the files appended since the last):

    python tools/submit_export.py \
        --documents-table /data/docs_table --out /data/export \
        --targets src0=0.5,src1=0.5 --seq-len 2048 --minhash-threshold 0

Idle rerun prints up_to_date=true and commits nothing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_targets(s: str | None) -> dict[str, float] | None:
    if not s:
        return None
    out = {}
    for part in s.split(","):
        k, _, v = part.partition("=")
        out[k.strip()] = float(v)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--documents", help="documents parquet path (batch export)")
    g.add_argument("--documents-table",
                   help="snapshot documents table dir (plans.table) — "
                        "incremental sync: process only files appended "
                        "since the last sync of this --out")
    ap.add_argument("--out", required=True,
                    help="output dir for export stages + lineage")
    ap.add_argument("--targets", default=None,
                    help="source=frac comma list (omit to keep all curated)")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--budget", type=float, default=None,
                    help="cap on total exported tokens")
    ap.add_argument("--seed", default="mix")
    ap.add_argument("--tokenizer", choices=("ws", "bpe-ish"), default="ws")
    ap.add_argument("--languages", default="en")
    ap.add_argument("--minhash-threshold", type=float, default=0.8,
                    help="near-dup jaccard threshold; 0 disables the stage")
    ap.add_argument("--min-words", type=int, default=50)
    ap.add_argument("--min-stopword-hits", type=int, default=2)
    ap.add_argument("--line-filter", action="store_true")
    ap.add_argument("--cpus", type=int, default=None, help="local mode cores")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ckg_spark.operators import textstats as T
    from ckg_spark.plans.export import (run_training_export,
                                        sync_training_export)
    from ckg_spark.session import get_spark

    spark = get_spark("training_export", cpus=args.cpus)
    if args.documents_table:
        if args.budget is not None:
            ap.error("--budget applies to batch exports only (an "
                     "incremental sync cannot cap a growing corpus)")
        if not (args.minhash_threshold or 0) == 0:
            ap.error("--minhash-threshold must be 0 for incremental sync "
                     "(near-dup LSH is corpus-wide; batch-only)")
        rep = sync_training_export(
            spark, args.documents_table, args.out,
            targets=_parse_targets(args.targets),
            seq_len=args.seq_len, seed=args.seed,
            token_counter=(T.token_count if args.tokenizer == "ws"
                           else T.bpe_ish_token_count),
            languages=tuple(args.languages.split(",")),
            gopher_kwargs={"min_words": args.min_words,
                           "min_stopword_hits": args.min_stopword_hits},
            line_filter=args.line_filter,
        )
        print(json.dumps({
            "synced_from_version": rep.from_version,
            "synced_to_version": rep.to_version,
            "n_files": rep.n_files,
            "n_segments": rep.n_segments,
            "segments_version": rep.segments_version,
            "healed": rep.healed,
            "up_to_date": rep.segments_version is None and rep.n_files == 0,
            "out": args.out,
        }))
        return 0
    docs = spark.read.parquet(args.documents)
    res = run_training_export(
        spark, docs, args.out,
        targets=_parse_targets(args.targets),
        seq_len=args.seq_len, budget=args.budget, seed=args.seed,
        token_counter=(T.token_count if args.tokenizer == "ws"
                       else T.bpe_ish_token_count),
        languages=tuple(args.languages.split(",")),
        minhash_threshold=args.minhash_threshold or None,
        gopher_kwargs={"min_words": args.min_words,
                       "min_stopword_hits": args.min_stopword_hits},
        line_filter=args.line_filter,
    )
    tot = res.segments.agg(
        F.sum("n_tokens").alias("tok"),
        (F.max("seq_id") + 1).alias("seqs")).collect()[0]
    print(json.dumps({
        "run_id": res.run_id,
        "resumed_stages": res.resumed_stages,
        "stage_counts": res.stage_counts,
        "realized_mix": res.realized_mix,
        "total_tokens": int(tot["tok"] or 0),
        "n_sequences": int(tot["seqs"] or 0),
        "seq_len": args.seq_len,
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
