"""Snapshot-table manifest scale probe (round-4 verdict item 7).

Pins the module's 100-TB posture claim with numbers: a manifest holding
~100k file entries (the 25-TB-equivalent at 256 MB/file; 400k ~ 100 TB)
is a driver-side JSON of tens of MB, and every manifest operation the
read/commit path performs stays sub-second. Synthesizes a manifest with
N file entries carrying realistic per-file min/max stats + hive partition
values, then times:

  - _commit (serialize + atomic link + pointer swap)
  - read_manifest (load + parse)
  - _skip_by_stats with a selective range_filter (data skipping)
  - partition-group construction (the read() pruning path)
  - an incremental append commit on top (parent merge + serialize)

No Spark session: these are exactly the driver-side file-planning steps;
the executors only ever see the pruned file list.

Usage: python tools/manifest_scale_probe.py [n_files] [out_json]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ckg_spark.plans import table as T  # noqa: E402


def build_entries(n: int, prefix: str):
    files, fparts, fstats = [], {}, {}
    for i in range(n):
        pred = f"PRED_{i % 8}"
        path = (f"{prefix}/data/s{i // 1000:04d}/pred={pred}/"
                f"part-{i:06d}-c000.snappy.parquet")
        files.append(path)
        fparts[path] = {"pred": pred}
        lo = i * 1000
        fstats[path] = {
            "doc_id": [lo, lo + 999],
            "score": [0.0, 1.0],
            "text": [f"aaa{i:06d}", f"zzz{i:06d}"],
        }
    return files, fparts, fstats


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    d = tempfile.mkdtemp(prefix="manifest_probe_")
    try:
        files, fparts, fstats = build_entries(n, d)
        extra = {"schema": [["doc_id", "bigint"], ["score", "double"],
                            ["text", "string"], ["pred", "string"]],
                 "partition_by": ["pred"], "file_partitions": fparts,
                 "partition_types": {"pred": "string"},
                 "file_stats": fstats}

        t0 = time.perf_counter()
        T._commit(d, files, "append", n * 1000, None, "probe0", None, extra)
        commit_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        m = T.read_manifest(d)
        load_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        kept = T._skip_by_stats(m, {"doc_id": (5_000_000, 5_050_000)})
        skip_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        fp = m["file_partitions"]
        groups: dict = {}
        for f in m["files"]:
            vals = fp.get(f, {})
            if vals.get("pred") != "PRED_3":
                continue
            groups.setdefault(vals["pred"], []).append(f)
        prune_s = time.perf_counter() - t0

        # incremental append on top: parent merge dominated by reserialize
        add_files, add_parts, add_stats = build_entries(1000, d + "/inc")
        extra2 = dict(extra)
        extra2["file_partitions"] = {**fparts, **add_parts}
        extra2["file_stats"] = {**fstats, **add_stats}
        t0 = time.perf_counter()
        T._commit(d, files + add_files, "append", (n + 1000) * 1000,
                  1, "probe1", None, extra2)
        append_s = time.perf_counter() - t0

        size_mb = os.path.getsize(T._manifest_path(d, 1)) / 1e6
        result = {
            "n_files": n,
            "manifest_mb": round(size_mb, 1),
            "commit_s": round(commit_s, 3),
            "load_s": round(load_s, 3),
            "skip_by_stats_s": round(skip_s, 3),
            "skipped_to": len(kept),
            "partition_prune_s": round(prune_s, 3),
            "pruned_to": sum(len(v) for v in groups.values()),
            "incremental_append_s": round(append_s, 3),
        }
        print(json.dumps(result))
        if out_path:
            with open(out_path, "w") as f:
                json.dump(result, f, indent=1)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
