"""Remote fetch (SURVEY.md S7) + archive/backup (K7).

Reference analogs:
- ``fetch_dataset`` ~ builder_utils.downloadDB:455 (wget/requests/ftp to a
  local databases directory). Here: stdlib urllib with atomic tmp-rename,
  checksum capture, and a skip-if-present marker — driver-side by design
  (the reference's downloads are dictionary/ontology-scale; bulk data
  arrives as already-landed parquet/Iceberg, never through this path).
- ``archive_stage`` / ``restore_stage`` ~ builder_utils.compress_directory
  :793 (tar -zcf backup of the import directory). Here: tar.gz of a
  materialized stage directory with a JSON manifest (row count + file list
  + sha256) and a restore that verifies the manifest. On an Iceberg
  deployment this is snapshot export / time travel; kept behind this module
  so that swap is local.
"""

from __future__ import annotations

import hashlib
import json
import os
import tarfile
import urllib.request


def fetch_dataset(url: str, directory: str, file_name: str | None = None,
                  overwrite: bool = False, timeout: float = 60.0) -> str:
    """Download ``url`` into ``directory`` (atomic: tmp + rename); returns
    the local path. Skips the fetch when the file and its ``.fetched``
    marker already exist (the reference re-downloads unconditionally;
    lineage-gated skip matches the rest of this engine's resume posture).

    Supports any scheme urllib handles (http/https/ftp/file). file:// makes
    the function testable offline."""
    if file_name is None:
        file_name = url.split("/")[-1].replace("?", "_").replace("=", "_")
    os.makedirs(directory, exist_ok=True)
    dest = os.path.join(directory, file_name)
    marker = dest + ".fetched"
    if not overwrite and os.path.exists(dest) and os.path.exists(marker):
        return dest
    tmp = dest + ".part"
    h = hashlib.sha256()
    with urllib.request.urlopen(url, timeout=timeout) as r, open(tmp, "wb") as out:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
            out.write(chunk)
    os.replace(tmp, dest)
    with open(marker, "w") as f:
        json.dump({"url": url, "sha256": h.hexdigest(),
                   "bytes": os.path.getsize(dest)}, f)
    return dest


def _dir_manifest(stage_dir: str) -> dict:
    files = {}
    for root, _, names in os.walk(stage_dir):
        for n in sorted(names):
            p = os.path.join(root, n)
            rel = os.path.relpath(p, stage_dir)
            with open(p, "rb") as f:
                files[rel] = hashlib.sha256(f.read()).hexdigest()
    return files


def archive_stage(out_dir: str, stage: str, archive_dir: str) -> str:
    """tar.gz snapshot of a materialized stage + sha256 manifest (K7).

    Returns the archive path. The manifest travels inside the tar so a
    restore is self-verifying."""
    src = os.path.join(out_dir, stage)
    if not os.path.isdir(src):
        raise FileNotFoundError(f"stage dir not found: {src}")
    os.makedirs(archive_dir, exist_ok=True)
    manifest = {"stage": stage, "files": _dir_manifest(src)}
    mpath = os.path.join(src, "_ARCHIVE_MANIFEST.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    dest = os.path.join(archive_dir, f"{stage}.tar.gz")
    tmp = dest + ".part"
    with tarfile.open(tmp, "w:gz") as tar:
        tar.add(src, arcname=stage)
    os.replace(tmp, dest)
    os.remove(mpath)
    return dest


def restore_stage(archive_path: str, out_dir: str) -> str:
    """Restore an ``archive_stage`` snapshot into ``out_dir`` and verify
    every file's sha256 against the embedded manifest."""
    os.makedirs(out_dir, exist_ok=True)
    with tarfile.open(archive_path, "r:gz") as tar:
        tar.extractall(out_dir, filter="data")
    stage = os.path.basename(archive_path).replace(".tar.gz", "")
    dest = os.path.join(out_dir, stage)
    mpath = os.path.join(dest, "_ARCHIVE_MANIFEST.json")
    with open(mpath) as f:
        manifest = json.load(f)
    os.remove(mpath)
    got = _dir_manifest(dest)
    if got != manifest["files"]:
        missing = set(manifest["files"]) ^ set(got)
        raise IOError(f"restore verification failed for {stage}: {missing or 'hash mismatch'}")
    return dest
