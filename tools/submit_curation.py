"""spark-submit entry point for the corpus-curation pipeline.

Deployment form (same --py-files shape as tools/submit_pipeline.py):

    zip -r ckg_spark.zip ckg_spark/
    spark-submit --py-files ckg_spark.zip tools/submit_curation.py \
        --documents s3://bucket/documents \
        --out       s3://bucket/curated \
        --languages en,es --minhash-threshold 0.8 --line-filter

Sandbox form over local parquet:

    python tools/submit_curation.py \
        --documents /root/testdata/sf0.01/documents.parquet --out /tmp/curated

Resume: rerunning with the same --out skips committed stages (lineage).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--documents", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="output dir for curated corpus + lineage")
    ap.add_argument("--languages", default="en", help="comma list of language codes to keep")
    ap.add_argument("--minhash-threshold", type=float, default=0.8,
                    help="near-dup jaccard threshold; 0 disables the minhash stage")
    ap.add_argument("--min-words", type=int, default=50)
    ap.add_argument("--min-stopword-hits", type=int, default=2)
    ap.add_argument("--line-filter", action="store_true",
                    help="apply the C4 line cleaner before document rules")
    ap.add_argument("--cpus", type=int, default=None, help="local mode cores")
    args = ap.parse_args()

    from ckg_spark.plans.curate import run_curation_pipeline
    from ckg_spark.session import get_spark

    spark = get_spark("corpus_curation", cpus=args.cpus)
    docs = spark.read.parquet(args.documents)
    res = run_curation_pipeline(
        spark, docs, args.out,
        languages=tuple(args.languages.split(",")),
        minhash_threshold=args.minhash_threshold or None,
        gopher_kwargs={"min_words": args.min_words,
                       "min_stopword_hits": args.min_stopword_hits},
        line_filter=args.line_filter,
    )
    print(json.dumps({
        "run_id": res.run_id,
        "resumed_stages": res.resumed_stages,
        "stage_counts": res.stage_counts,
        "curated_docs": res.corpus.count(),
        "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
