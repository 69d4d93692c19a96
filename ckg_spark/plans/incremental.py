"""Incremental KG construction over a snapshot transcript table.

The north rule's input is an Iceberg table of transcripts at 10^12-turn
scale — at that size you NEVER reprocess the corpus. This module is the
batch companion to ``streaming/ingest.py``: where the stream processes
micro-batches as files arrive, ``sync_mention_edges`` processes the
APPEND DELTA between two committed snapshots of a ``plans.table``
transcript table (Iceberg's incremental append scan, here a manifest
diff — ``table.incremental_files``) and appends the resulting
MENTIONED_IN_TURN edges to the edges snapshot table in one commit that
records the source version it consumed.

Why the delta is EXACT (not approximate): mention edges are per-turn —
each output row is a function of a single transcript row plus the static
(vocab-derived) alias/canonical tables — so edges(all rows) is the
disjoint union of edges(per snapshot delta). No cross-file state exists
to lose (a turn is one transcript row; it is never split across files).

Co-mention edges aggregate ACROSS turns (score = number of co-mentioning
turns), but the aggregation is a SUM of per-turn indicators — additive
over turn-disjoint deltas. ``comention=True`` therefore appends PARTIAL
counts per sync, and ``read_merged_edges`` is the merge-on-read view
(groupBy edge identity, sum score) — Iceberg's merge-on-read move: the
write path stays append-only and cheap at any scale, the periodic
``compact_merged`` folds partials into one row per edge (a single
overwrite commit that preserves the sync high-water mark). Per-turn
MENTIONED_IN_TURN rows pass through the same view unchanged (each
(subj, turn) key lives in exactly one delta, so its sum is itself).

Exactly-once: each sync commit stamps ``transcripts_version`` in the edge
table's snapshot properties. A crash AFTER the edge commit but BEFORE the
caller records success is replay-safe: the next sync reads the high-water
mark from the committed properties and starts past it. A non-append
snapshot (compact/overwrite/rollback) in the source range fails the
manifest diff with instructions to re-baseline (``table.incremental_files``).

Reference analog: CKG rebuilds its Neo4j import TSVs from scratch per
release (full loader, importer.py); a 10^12-turn corpus needs this
append-delta form instead.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..operators import extract as X
from ..operators import link as L
from ..operators import materialize as M
from ..streaming.ingest import _batch_linked
from . import table as T


@dataclass
class SyncReport:
    from_version: int | None
    to_version: int
    n_files: int
    n_edges: int
    edge_table_version: int | None  # None when nothing to do


def last_synced_version(edges_table_dir: str) -> int | None:
    """High-water mark: the largest transcripts_version recorded in the
    edge table's LIVE snapshot log (survives manifest expiry gaps)."""
    return T.last_stamped_version(edges_table_dir, "transcripts_version")


def sync_mention_edges(
    spark: SparkSession,
    transcripts_table_dir: str,
    vocab_tables: dict,
    edges_table_dir: str,
    canonical=None,
    to_version: int | None = None,
    comention: bool = False,
) -> SyncReport:
    """Bring the mention-edge snapshot table up to date with the
    transcript snapshot table: read ONLY the files appended since the last
    sync, run the per-turn extract -> link -> canonicalize -> edge
    composition (identical code path to the streaming sink), and commit
    one edges snapshot stamped with the consumed source version.

    Safe to call repeatedly (no-op when up to date) and after crashes
    (the high-water mark lives in committed snapshot properties)."""
    cur = T.read_manifest(transcripts_table_dir, to_version)["version"]
    done = last_synced_version(edges_table_dir)
    if done is not None and done >= cur:
        return SyncReport(done, cur, 0, 0, None)

    new_files = T.incremental_files(transcripts_table_dir, done, cur)
    if not new_files:
        # empty append (files unchanged): advance the mark with an empty
        # commit in the EDGE table's own schema so the next sync doesn't
        # re-diff the range; if no edge table exists yet there is nothing
        # to stamp — the next sync re-derives the same empty diff cheaply
        if T.current_version(edges_table_dir) is None:
            return SyncReport(done, cur, 0, 0, None)
        ev = T.append(T.read(spark, edges_table_dir).limit(0),
                      edges_table_dir,
                      properties={"transcripts_version": cur})
        return SyncReport(done, cur, 0, 0, ev)

    alias_grams = X.prepare_alias_grams(vocab_tables["aliases"])
    alias_table = L.prepare_alias_table(vocab_tables["aliases"])
    delta = spark.read.parquet(*new_files)
    linked = _batch_linked(delta, alias_grams, alias_table,
                           vocab_tables.get("stoplist"), canonical)
    edges = M.mention_edges(linked)
    if comention:
        # PARTIAL co-mention counts for this delta; exact totals come
        # from read_merged_edges (merge-on-read sum over syncs)
        edges = edges.unionByName(M.comention_edges(linked))
    ev = T.append(edges, edges_table_dir,
                  properties={"transcripts_version": cur},
                  partition_by=None)
    n = T.read_manifest(edges_table_dir, ev)["row_count"] - (
        T.read_manifest(edges_table_dir, ev - 1)["row_count"]
        if ev > 1 and _manifest_exists(edges_table_dir, ev - 1) else 0)
    return SyncReport(done, cur, len(new_files), n, ev)


def _manifest_exists(table_dir: str, version: int) -> bool:
    import os

    return os.path.exists(T._manifest_path(table_dir, version))


EDGE_KEY = ["subj", "pred", "obj", "source", "evidence_type"]


def read_merged_edges(spark: SparkSession, edges_table_dir: str,
                      version: int | None = None):
    """Merge-on-read view of an incrementally-synced edge table: one row
    per edge identity with the summed score. Exact for both edge families
    (per-turn rows sum to themselves; co-mention partials sum to the
    full-corpus count). One map-side-combined groupBy over the table."""
    e = T.read(spark, edges_table_dir, version=version)
    return e.groupBy(*EDGE_KEY).agg(F.sum("score").alias("score")).select(
        "subj", "pred", "obj", "source", "score", "evidence_type")


def compact_merged(spark: SparkSession, edges_table_dir: str) -> int:
    """Fold accumulated partials into one row per edge in a single
    overwrite commit. Preserves the sync high-water mark by re-stamping
    ``transcripts_version`` on the compacted snapshot (plain
    ``table.compact`` would drop the properties and reset the mark after
    expiry). History stays time-travelable until expire_snapshots."""
    mark = last_synced_version(edges_table_dir)
    merged = read_merged_edges(spark, edges_table_dir)
    props = {} if mark is None else {"transcripts_version": mark}
    return T.overwrite(merged, edges_table_dir, properties=props)


def validate_edges_delta(spark: SparkSession, edges_table_dir: str,
                         node_types: DataFrame, rules: DataFrame,
                         from_version: int | None = None,
                         to_version: int | None = None) -> DataFrame:
    """Delta-only schema validation of a snapshot edge table — the
    incremental form of the KG-QA pass (``kg_qa.schema_violations``):
    validates ONLY the files appended between two snapshot versions
    (`table.incremental_files` manifest diff), so a release-cadence QA
    gate costs O(delta), never O(graph). Same O(delta) contract as the
    rest of the incremental subsystem (plans/incremental.py); non-append
    history in the range raises there — re-baseline by validating with
    ``from_version=None`` (the full current file set).

    Returns the violation summary for the delta (empty = the delta is
    schema-clean; pair it with the full-table `queries.catalog`
    'dangling_endpoints' check at re-baseline cadence)."""
    from ..operators.kg_qa import schema_violations, violation_summary

    files = T.incremental_files(edges_table_dir, from_version, to_version)
    if not files:
        schema = T.read(spark, edges_table_dir).schema
        empty = spark.createDataFrame([], schema)
        return violation_summary(schema_violations(empty, node_types, rules))
    # read_files, NOT spark.read.parquet: hive-partitioned columns (e.g.
    # partition_by=["pred"]) live in the manifest and would be silently
    # dropped by a raw path read, breaking the rules join
    delta = T.read_files(spark, edges_table_dir, files, to_version)
    return violation_summary(schema_violations(delta, node_types, rules))
