"""Snapshot-table substrate: Iceberg-style commit semantics over parquet.

The north star materializes graph tables "as partitioned Iceberg tables".
On a deployment that is literally Iceberg; this module keeps the part of
the table format the pipeline's correctness depends on — and keeps it
behind one small API so the swap is local (same stance as
``plans/lineage.py`` for the stage store):

- **immutable data files + manifest commits**: every write lands data
  files under a fresh ``data/s<id>/`` prefix, then commits a JSON manifest
  (``meta/v<N>.json``) listing the COMPLETE live file set. Readers only
  ever see files named by a committed manifest, so a writer crashing
  mid-write leaves the table exactly at its previous snapshot (the
  half-written data prefix is unreferenced garbage, removed by
  ``expire_snapshots``).
- **atomic snapshot pointer**: ``meta/_latest`` is swapped with an
  os.replace (atomic on POSIX), the local-FS rendition of Iceberg's
  metadata-pointer swap in the catalog.
- **append / overwrite**: append commits parent's files + new files;
  overwrite commits only the new files. Both record operation, row count,
  file count and parent id — the snapshot log.
- **time travel**: ``read(spark, dir, version=N)`` plans the scan from
  manifest N's file list (``spark.read.parquet(*files)``), so any
  historical snapshot stays queryable until expired; ``rollback`` commits
  a new manifest that re-points to an old snapshot's file set (never
  rewrites data).

Scale note: a manifest holds file PATHS (one line per data file, not per
row). At 100 TB with ~256 MB files that is ~400k entries — a driver-side
JSON of tens of MB, the same order Iceberg's avro manifests handle; data
never moves through the driver. Readers get normal parquet scans —
predicate pushdown / column pruning / partition pruning all apply
unchanged, because the manifest only decides WHICH files are in the scan.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "meta")


def _latest_path(table_dir: str) -> str:
    return os.path.join(_meta_dir(table_dir), "_latest")


def current_version(table_dir: str) -> int | None:
    try:
        with open(_latest_path(table_dir)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_meta_dir(table_dir), f"v{version}.json")


def read_manifest(table_dir: str, version: int | None = None) -> dict:
    v = current_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    with open(_manifest_path(table_dir, v)) as f:
        m = json.load(f)
    m["version"] = v
    return m


def _list_parquet_files(prefix: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(prefix):
        for fn in files:
            if fn.endswith(".parquet"):
                out.append(os.path.join(root, fn))
    return sorted(out)


def _commit(table_dir: str, files: list[str], operation: str, rows: int,
            parent: int | None, snapshot_id: str,
            properties: dict | None = None) -> int:
    """Write manifest v<N+1> then atomically swap the _latest pointer."""
    os.makedirs(_meta_dir(table_dir), exist_ok=True)
    version = (parent if parent is not None else 0) + 1
    manifest = {
        "snapshot_id": snapshot_id,
        "operation": operation,
        "parent_version": parent,
        "committed_at": time.time(),
        "row_count": rows,
        "file_count": len(files),
        "properties": properties or {},
        "files": files,
    }
    mp = _manifest_path(table_dir, version)
    if os.path.exists(mp):
        raise RuntimeError(
            f"concurrent commit detected: {mp} already exists "
            "(optimistic concurrency: retry from the new latest)")
    tmp = mp + f".tmp-{snapshot_id}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mp)
    ptr_tmp = _latest_path(table_dir) + f".tmp-{snapshot_id}"
    with open(ptr_tmp, "w") as f:
        f.write(str(version))
    os.replace(ptr_tmp, _latest_path(table_dir))
    return version


def _write_snapshot_files(df: DataFrame, table_dir: str) -> tuple[list[str], int, str]:
    sid = uuid.uuid4().hex[:12]
    prefix = os.path.join(table_dir, "data", f"s{sid}")
    df.write.mode("overwrite").parquet(prefix)
    files = _list_parquet_files(prefix)
    spark = df.sparkSession
    rows = spark.read.parquet(prefix).count() if files else 0
    return files, rows, sid


def overwrite(df: DataFrame, table_dir: str,
              properties: dict | None = None) -> int:
    """Replace the table contents in a new snapshot; returns the version."""
    files, rows, sid = _write_snapshot_files(df, table_dir)
    return _commit(table_dir, files, "overwrite", rows,
                   current_version(table_dir), sid, properties)


def append(df: DataFrame, table_dir: str,
           properties: dict | None = None) -> int:
    """Append df as a new snapshot (parent files + new files).
    ``properties`` land in the manifest — e.g. a streaming sink records
    its micro-batch id there to make replayed batches skippable."""
    parent = current_version(table_dir)
    base_files, base_rows = [], 0
    if parent is not None:
        m = read_manifest(table_dir, parent)
        base_files, base_rows = m["files"], m["row_count"]
    files, rows, sid = _write_snapshot_files(df, table_dir)
    return _commit(table_dir, base_files + files, "append",
                   base_rows + rows, parent, sid, properties)


def rollback(table_dir: str, version: int) -> int:
    """Commit a NEW snapshot whose file set is that of an old version —
    history is never rewritten, so the rolled-back state is itself
    time-travelable."""
    m = read_manifest(table_dir, version)
    return _commit(table_dir, m["files"], f"rollback[v{version}]",
                   m["row_count"], current_version(table_dir),
                   uuid.uuid4().hex[:12])


def read(spark: SparkSession, table_dir: str,
         version: int | None = None) -> DataFrame:
    """Scan the table at a snapshot (default: latest). The manifest only
    selects files; the result is a plain parquet scan with full pushdown."""
    m = read_manifest(table_dir, version)
    if not m["files"]:
        raise FileNotFoundError(f"snapshot v{m['version']} has no data files")
    return spark.read.parquet(*m["files"])


def snapshots(table_dir: str) -> list[dict]:
    """Snapshot log, oldest first (version, operation, rows, files, parent)."""
    out = []
    v = 1
    while os.path.exists(_manifest_path(table_dir, v)):
        m = read_manifest(table_dir, v)
        out.append({k: m.get(k) for k in
                    ("version", "snapshot_id", "operation", "parent_version",
                     "committed_at", "row_count", "file_count",
                     "properties")})
        v += 1
    return out


def expire_snapshots(table_dir: str, keep_last: int = 1) -> list[str]:
    """Drop manifests older than the last ``keep_last`` and delete data
    files no committed manifest references any more. Returns removed paths."""
    latest = current_version(table_dir)
    if latest is None:
        return []
    keep_versions = set(range(max(1, latest - keep_last + 1), latest + 1))
    live: set = set()
    for v in keep_versions:
        live.update(read_manifest(table_dir, v)["files"])
    removed = []
    v = 1
    while os.path.exists(_manifest_path(table_dir, v)):
        if v not in keep_versions:
            os.remove(_manifest_path(table_dir, v))
            removed.append(_manifest_path(table_dir, v))
        v += 1
    data_root = os.path.join(table_dir, "data")
    for f in _list_parquet_files(data_root) if os.path.isdir(data_root) else []:
        if f not in live:
            os.remove(f)
            removed.append(f)
    # prune empty snapshot dirs
    if os.path.isdir(data_root):
        for d in sorted(os.listdir(data_root)):
            p = os.path.join(data_root, d)
            if os.path.isdir(p) and not _list_parquet_files(p):
                import shutil

                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
    return removed
