"""Incrementally-synced canonical-entity mapping over snapshot tables.

North-rule surface: canonicalization must keep up with a growing
transcript corpus without re-running connected components over all
history, and downstream graph tables must be patchable after component
merges. Reference parity: CKG rebuilds its full entity mapping per import
run (ckg/graphdb_builder/mapping.py — batch dump + reload); here the
mapping is a snapshot table brought up to date per delta with
``operators.canonicalize.incremental_canonical_mapping``, exact vs the
batch recompute (q93 oracle + tests/test_canon_sync.py).

Storage layout (merge-on-read, same stance as plans/incremental.py):
- ``<dir>``          mapping deltas: (ident, canonical_id, map_version);
                     read = latest row per ident. Append-only per sync;
                     ``compact_mapping`` folds to one row per ident.
- ``<dir>_remaps``   merge log: (old_canonical_id, new_canonical_id,
                     map_version). Dictionary-scale (one row per absorbed
                     component); ``read_remap_log`` resolves cross-sync
                     chains (old -> mid -> final) so a consumer patches an
                     edge table with ONE broadcast join however many syncs
                     it lags behind.

At 10^12-turn scale the mapping table is entity-dictionary-sized — orders
below the corpus — so the latest-per-ident window and the compaction
rewrite are cheap relative to any extraction sync they accompany.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.canonicalize import incremental_canonical_mapping
from . import table as T

_MAP_SCHEMA = "ident string, canonical_id string, map_version int"
_REMAP_SCHEMA = ("old_canonical_id string, new_canonical_id string, "
                 "map_version int")


def _remap_dir(mapping_table_dir: str) -> str:
    return mapping_table_dir.rstrip("/") + "_remaps"


@dataclass
class CanonSyncReport:
    mapping_version: int | None  # None when the delta was a no-op
    n_changed: int
    n_remaps: int


def read_canonical_mapping(spark: SparkSession, mapping_table_dir: str,
                           version: int | None = None) -> DataFrame:
    """Merge-on-read view: latest (ident, canonical_id) per ident."""
    m = T.read(spark, mapping_table_dir, version=version)
    w = Window.partitionBy("ident").orderBy(F.desc("map_version"))
    return (m.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("ident", "canonical_id"))


def sync_canonical_mapping(
    spark: SparkSession,
    mapping_table_dir: str,
    new_edges: DataFrame,
    new_idents: DataFrame | None = None,
    properties: dict | None = None,
) -> CanonSyncReport:
    """Fold one delta of identity edges into the mapping table.

    Appends ONLY the changed/new rows (merge-on-read keeps reads exact),
    plus the (old -> new) canon pairs to the remap side table. Safe to
    call with an empty delta (no commit)."""
    exists = T.current_version(mapping_table_dir) is not None
    prev = (read_canonical_mapping(spark, mapping_table_dir)
            if exists else None)
    mapping, remaps = incremental_canonical_mapping(
        prev, new_edges, new_idents=new_idents)

    if prev is not None:
        # changed = rows whose canonical differs from or are absent in prev
        delta = mapping.join(
            prev.withColumnRenamed("canonical_id", "_old"),
            on="ident", how="left",
        ).where(
            F.col("_old").isNull() | (F.col("_old") != F.col("canonical_id"))
        ).select("ident", "canonical_id")
    else:
        delta = mapping

    next_v = (T.current_version(mapping_table_dir) or 0) + 1
    delta = delta.withColumn("map_version", F.lit(next_v).cast("int"))
    n_changed = delta.count()
    if n_changed == 0 and exists:
        return CanonSyncReport(None, 0, 0)
    mv = T.append(delta, mapping_table_dir, properties=properties or {})

    remaps = remaps.withColumn("map_version", F.lit(mv).cast("int"))
    n_remaps = remaps.count()
    if n_remaps or T.current_version(_remap_dir(mapping_table_dir)) is None:
        if n_remaps == 0:
            remaps = spark.createDataFrame([], _REMAP_SCHEMA)
        T.append(remaps, _remap_dir(mapping_table_dir))
    return CanonSyncReport(mv, n_changed, n_remaps)


def read_remap_log(spark: SparkSession, mapping_table_dir: str,
                   since_version: int | None = None) -> DataFrame:
    """(old_canonical_id, new_canonical_id) pairs with cross-sync chains
    RESOLVED: a canon absorbed in sync 2 whose absorber was itself
    absorbed in sync 5 maps straight to the final canon, so one broadcast
    join patches an edge table regardless of how many syncs it lags.

    Chain folding runs driver-side over the collected log — the log is
    one row per merged component (dictionary scale by construction)."""
    rd = _remap_dir(mapping_table_dir)
    if T.current_version(rd) is None:
        return spark.createDataFrame([], _REMAP_SCHEMA.rsplit(",", 1)[0])
    rows = T.read(spark, rd).orderBy("map_version").collect()
    final: dict[str, str] = {}
    for r in rows:
        tgt = r["new_canonical_id"]
        tgt = final.get(tgt, tgt)
        # repoint every chain already ending at the absorbed canon
        for k, v in list(final.items()):
            if v == r["old_canonical_id"]:
                final[k] = tgt
        final[r["old_canonical_id"]] = tgt
    if since_version is not None:
        keep = {r["old_canonical_id"] for r in rows
                if r["map_version"] > since_version}
        final = {k: v for k, v in final.items() if k in keep}
    out = [(k, v) for k, v in sorted(final.items()) if k != v]
    return spark.createDataFrame(
        out, "old_canonical_id string, new_canonical_id string")


def compact_mapping(spark: SparkSession, mapping_table_dir: str) -> int:
    """Fold accumulated deltas to one row per ident in a single overwrite
    commit (read amplification resets; history stays time-travelable
    until expire_snapshots). Re-stamps nothing: the mapping's high-water
    semantics live in the caller's properties, mirrored from the source
    table like plans/incremental.compact_merged."""
    cur = T.read_manifest(mapping_table_dir)
    props = {k: v for k, v in cur.get("properties", {}).items()}
    merged = read_canonical_mapping(spark, mapping_table_dir).withColumn(
        "map_version", F.lit(cur["version"]).cast("int"))
    return T.overwrite(merged, mapping_table_dir, properties=props)
