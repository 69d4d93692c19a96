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

from ..operators.canonicalize import (incremental_canonical_mapping,
                                      incremental_canonical_parts)
from ..operators.ckpt import checkpoint_reset_stats as _ckpt
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
    parts = incremental_canonical_parts(prev, new_edges,
                                        new_idents=new_idents)
    remaps = parts["remaps"]
    # diff changed-vs-PRIOR over the affected rows only (O(touched), never
    # an O(history) join): a changed row is new to the table unless its
    # prior canon in the affected set already matches
    delta = parts["changed"].join(
        parts["affected_prev"].withColumnRenamed("canonical_id", "_old"),
        on="ident", how="left",
    ).where(
        F.col("_old").isNull() | (F.col("_old") != F.col("canonical_id"))
    ).select("ident", "canonical_id").unionByName(parts["isolated"])

    next_v = (T.current_version(mapping_table_dir) or 0) + 1
    delta = delta.withColumn("map_version", F.lit(next_v).cast("int"))
    # materialize once: count + append + the writer's own recount would
    # otherwise re-run the anti-join/window plan three times
    delta = _ckpt(delta)
    n_changed = delta.count()
    if n_changed == 0 and exists:
        return CanonSyncReport(None, 0, 0)
    mv = T.append(delta, mapping_table_dir, properties=properties or {})

    remaps = _ckpt(remaps.withColumn("map_version", F.lit(mv).cast("int")))
    n_remaps = remaps.count()
    if n_remaps or T.current_version(_remap_dir(mapping_table_dir)) is None:
        if n_remaps == 0:
            remaps = spark.createDataFrame([], _REMAP_SCHEMA)
        T.append(remaps, _remap_dir(mapping_table_dir))
    return CanonSyncReport(mv, n_changed, n_remaps)


def read_remap_log(spark: SparkSession, mapping_table_dir: str,
                   since_version: int | None = None,
                   through_version: int | None = None) -> DataFrame:
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
    if through_version is not None:
        rows = [r for r in rows if r["map_version"] <= through_version]
    final: dict[str, str] = {}
    rev: dict[str, set] = {}  # target -> olds currently mapped to it (O(R))
    for r in rows:
        old = r["old_canonical_id"]
        tgt = final.get(r["new_canonical_id"], r["new_canonical_id"])
        # repoint every chain already ending at the absorbed canon
        for k in rev.pop(old, set()):
            final[k] = tgt
            rev.setdefault(tgt, set()).add(k)
        final[old] = tgt
        rev.setdefault(tgt, set()).add(old)
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


# ---------------------------------------------------------------------------
# Composed: incremental KG sync under an EVOLVING canonicalization
# ---------------------------------------------------------------------------


def sync_graph(
    spark: SparkSession,
    transcripts_table_dir: str,
    vocab_tables: dict,
    edges_table_dir: str,
    mapping_table_dir: str,
    identity_edges: DataFrame | None = None,
    to_version: int | None = None,
) -> "object":
    """One sync tick of the full incremental KG: fold this tick's identity
    edges (new ontology xrefs) into the canonical mapping, then extract ->
    link -> canonicalize ONLY the new transcript files with the updated
    mapping (plans/incremental.sync_mention_edges).

    Already-written edges are NOT rewritten when a merge happens — the
    remap log fixes them at read time (`read_graph_edges`), which is what
    keeps each tick O(delta) at 10^12-turn scale. Every vocab ident is
    registered in the mapping on first contact so any FUTURE merge of an
    ident that already emitted edges is guaranteed a remap-log row
    (otherwise an ident that was never a mapping row could silently change
    canon with no patch record)."""
    from . import incremental as I

    idents = vocab_tables["aliases"].select("ident").distinct()
    if identity_edges is None:
        identity_edges = spark.createDataFrame(
            [], "ident_a string, ident_b string")
    sync_canonical_mapping(spark, mapping_table_dir, identity_edges,
                           new_idents=idents)
    cmap = read_canonical_mapping(spark, mapping_table_dir)
    return I.sync_mention_edges(spark, transcripts_table_dir, vocab_tables,
                                edges_table_dir, canonical=cmap,
                                to_version=to_version)


def read_graph_edges(spark: SparkSession, edges_table_dir: str,
                     mapping_table_dir: str,
                     comention: bool = False,
                     _through: int | None = None) -> DataFrame:
    """Merge-on-read view of a `sync_graph` edge table that is EXACT under
    canonicalization drift: resolved remap log patches subj (one broadcast
    join — old canons are a dictionary-scale set, turn-key objs never
    collide with them), then per-edge re-aggregation folds rows merged by
    the patch. With ``comention=True`` the CO_MENTIONED_WITH family is
    DERIVED from the patched mention edges (per-turn distinct-subject
    pairs) rather than read from storage: entity merges can collapse two
    co-mentioned entities into one, and only re-derivation keeps the
    turn-count score exact (summing stored partials would double-count a
    turn whose pair set shrank). Batch equivalence is pinned by
    tests/test_canon_sync.py::test_sync_graph_matches_batch*.

    If the edge table was compacted with ``compact_graph_edges``, only
    remaps committed AFTER the folded-through mapping version are applied
    (the manifest records ``remaps_folded_through``); the patch join
    shrinks with every maintenance pass."""
    from . import incremental as I
    from ..operators.canonicalize import apply_remaps

    # patch the RAW rows first (broadcast join, no exchange), then ONE
    # EDGE_KEY aggregation folds both the stored partials and the rows the
    # patch merged — summation is associative, so this equals the naive
    # read_merged_edges -> patch -> re-agg at half the shuffle cost
    raw = T.read(spark, edges_table_dir)
    # max across SNAPSHOTS, not the current manifest: every sync append
    # after a compaction commits a manifest without the property, and
    # reading only the head would silently re-apply the whole log forever
    folded = T.last_stamped_version(edges_table_dir, "remaps_folded_through")
    remaps = read_remap_log(spark, mapping_table_dir, since_version=folded,
                            through_version=_through)
    raw = apply_remaps(raw, remaps, cols=("subj",))
    mentions = (
        raw.groupBy(*I.EDGE_KEY).agg(F.sum("score").alias("score"))
        .select("subj", "pred", "obj", "source", "score", "evidence_type")
    )
    if not comention:
        return mentions
    sets = (
        mentions.where(F.col("pred") == "MENTIONED_IN_TURN")
        .groupBy("obj")
        .agg(F.sort_array(F.collect_set("subj")).alias("es"))
        .where(F.size("es") >= 2)
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(es)-1), "
                "i -> transform(sequence(0, i-1), "
                "j -> named_struct('subj', es[j], 'obj', es[i]))))"
            )
        ).alias("p")
    ).select(F.col("p.subj").alias("subj"), F.col("p.obj").alias("obj"))
    com = (
        pairs.groupBy("subj", "obj")
        .agg(F.count(F.lit(1)).cast("double").alias("score"))
        .select("subj", F.lit("CO_MENTIONED_WITH").alias("pred"), "obj",
                F.lit("tagger").alias("source"), "score",
                F.lit("co_occurrence").alias("evidence_type"))
    )
    return mentions.unionByName(com)


def compact_graph_edges(spark: SparkSession, edges_table_dir: str,
                        mapping_table_dir: str) -> int:
    """Maintenance pass for a `sync_graph` edge table: fold the stored
    partials AND the remap log into storage in one overwrite commit —
    every row's subj becomes its current canon, merged rows collapse.
    The commit records ``remaps_folded_through`` (the mapping version
    whose remaps are now physically applied) and re-stamps the sync
    high-water mark, so subsequent `read_graph_edges` calls patch with
    only the remaps committed SINCE, and `sync_graph` keeps consuming
    source deltas where it left off. History stays time-travelable until
    expire_snapshots; co-mentions stay derived-at-read (storing them
    would re-open the drift double-count)."""
    from . import incremental as I

    mark = I.last_synced_version(edges_table_dir)
    # capture the mapping version BEFORE folding and bound the fold to it:
    # a concurrent mapping sync committing mid-fold would otherwise land
    # remaps recorded as folded but never physically applied
    mv = T.current_version(mapping_table_dir)
    folded = read_graph_edges(spark, edges_table_dir, mapping_table_dir,
                              _through=mv)
    props = {"remaps_folded_through": mv}
    if mark is not None:
        props["transcripts_version"] = mark
    return T.overwrite(folded, edges_table_dir, properties=props)


def expire_remap_log(spark: SparkSession, mapping_table_dir: str,
                     through_version: int) -> int:
    """Drop remap rows with map_version <= ``through_version`` in one
    overwrite commit — bounded retention for the merge log.

    SOUND ONLY when every edge table reading this mapping has folded
    through that version (`compact_graph_edges` records
    ``remaps_folded_through`` per table; pass the MINIMUM across
    consumers): a row's old canon is then physically absent from all
    storage, and chain resolution among the surviving rows is
    self-contained (each row's target was a final label at its commit
    time, so later rows never reference an expired old canon as a
    target... except as a chain HEAD, which only matters if storage
    still holds the expired old — it does not, by precondition)."""
    rd = _remap_dir(mapping_table_dir)
    if T.current_version(rd) is None:
        return 0
    keep = T.read(spark, rd).where(F.col("map_version") > through_version)
    return T.overwrite(keep, rd)
