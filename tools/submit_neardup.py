"""spark-submit entry point for INCREMENTAL near-dup detection.

Brings the LSH band-bucket index up to date with the append delta of a
docs snapshot table (plans/neardup.py) — work proportional to new docs,
not corpus size — and optionally folds the verified pairs into a
canonical-mapping table so every doc's CURRENT near-dup cluster id is
one read away (plans/canon.read_canonical_mapping).

Deployment form:

    spark-submit --py-files ckg_spark.zip tools/submit_neardup.py \
        --docs-table  s3://bucket/docs_tbl \
        --index       s3://bucket/neardup_idx \
        --mapping-table s3://bucket/neardup_clusters \
        --threshold 0.8

Sandbox form (same code, local paths):

    python tools/submit_neardup.py --docs-table /tmp/docs \
        --index /tmp/idx --threshold 0.6

Safe on a schedule: an up-to-date index is a no-op, and the high-water
mark lives in committed snapshot properties (crash-replay safe).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs-table", required=True,
                    help="docs snapshot table dir (plans.table layout)")
    ap.add_argument("--index", required=True,
                    help="LSH index snapshot table dir (created on first sync)")
    ap.add_argument("--mapping-table", default=None,
                    help="also fold verified pairs into this canonical-"
                         "mapping table (cluster id per doc)")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--bucket-cap", type=int, default=200)
    ap.add_argument("--cpus", type=int, default=None, help="local mode cores")
    args = ap.parse_args()

    from ckg_spark.plans import neardup as N
    from ckg_spark.session import get_spark

    spark = get_spark("neardup_sync", cpus=args.cpus)
    rep, pairs = N.sync_neardup(
        spark, args.docs_table, args.index,
        mapping_table_dir=args.mapping_table,
        threshold=args.threshold, bucket_cap=args.bucket_cap)
    print(json.dumps({
        "from_version": rep.from_version,
        "to_version": rep.to_version,
        "n_docs": rep.n_docs,
        "n_pairs": rep.n_pairs,
        "index_version": rep.index_version,
        "up_to_date": rep.index_version is None,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
