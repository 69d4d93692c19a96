"""spark-submit entry point for INCREMENTAL benchmark decontamination.

Two subcommands in one flat CLI (mirrors the plans/decontam.py split):

    sync:   bring the corpus gram-hash index up to date with the docs
            snapshot table's append delta (work proportional to new docs)
    probe:  contamination report for a benchmark parquet against the
            index — no corpus re-read, zero sync work per benchmark

Deployment form:

    spark-submit --py-files ckg_spark.zip tools/submit_decontam.py sync \
        --docs-table s3://bucket/docs_tbl --index s3://bucket/gram_idx
    spark-submit --py-files ckg_spark.zip tools/submit_decontam.py probe \
        --index s3://bucket/gram_idx --benchmark s3://bucket/benchmark.parquet \
        --min-hits 1 --out s3://bucket/contaminated_ids

Sandbox form: same flags with local paths.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["sync", "probe"])
    ap.add_argument("--docs-table", help="docs snapshot table dir (sync)")
    ap.add_argument("--index", required=True,
                    help="gram-hash index table dir")
    ap.add_argument("--benchmark",
                    help="benchmark parquet with (doc_id, text) (probe)")
    ap.add_argument("--k", type=int, default=13)
    ap.add_argument("--min-hits", type=int, default=1,
                    help="probe: contamination threshold for the summary")
    ap.add_argument("--out", default=None,
                    help="probe: optionally write the full report parquet")
    ap.add_argument("--cpus", type=int, default=None, help="local mode cores")
    args = ap.parse_args()

    from ckg_spark.plans import decontam as DX
    from ckg_spark.session import get_spark

    spark = get_spark("decontam", cpus=args.cpus)
    if args.mode == "sync":
        if not args.docs_table:
            ap.error("sync requires --docs-table")
        rep = DX.sync_decontam_index(spark, args.docs_table, args.index,
                                     k=args.k)
        print(json.dumps({
            "from_version": rep.from_version,
            "to_version": rep.to_version,
            "n_docs": rep.n_docs,
            "index_version": rep.index_version,
            "up_to_date": rep.index_version is None,
        }))
        return 0

    if not args.benchmark:
        ap.error("probe requires --benchmark")
    bench = spark.read.parquet(args.benchmark)
    report = DX.probe_benchmark(spark, args.index, bench, k=args.k)
    if args.out:
        report.write.mode("overwrite").parquet(args.out)
    n_docs = report.count()
    n_bad = report.where(f"n_contaminated >= {args.min_hits}").count()
    print(json.dumps({
        "docs_indexed": n_docs,
        "contaminated": n_bad,
        "min_hits": args.min_hits,
        "report": args.out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
