"""Incremental KG sync over a snapshot transcript table (plans/incremental):
manifest-diff append scan -> per-turn mention edges -> stamped edge commits.
The delta is exact because mention edges are per-turn functions of a single
transcript row + static vocab tables."""

import pandas as pd
import pytest

from ckg_spark.datagen import gen_transcripts
from ckg_spark.plans import incremental as I
from ckg_spark.plans import table as T
from ckg_spark.streaming.ingest import _batch_edges
from ckg_spark.operators import extract as X
from ckg_spark.operators import link as L
from ckg_spark.vocab import build_vocab, vocab_to_spark


@pytest.fixture(scope="module")
def vocab_tables(spark):
    return vocab_to_spark(spark, build_vocab(n_entities=40, seed=5))


def _chunk(spark, n, seed):
    pdf = gen_transcripts(n, vocab=build_vocab(n_entities=40, seed=5),
                          seed=seed)
    return spark.createDataFrame(pdf)


def _edge_set(df):
    return sorted(map(tuple, df.select(
        "subj", "pred", "obj", "score").collect()))


def test_sync_matches_full_batch(spark, tmp_path, vocab_tables):
    tdir = str(tmp_path / "transcripts")
    edir = str(tmp_path / "edges")
    chunks = [_chunk(spark, 120, seed) for seed in (1, 2, 3)]

    # interleave appends and syncs: each sync consumes exactly the delta
    reports = []
    for i, ch in enumerate(chunks):
        T.append(ch, tdir)
        r = I.sync_mention_edges(spark, tdir, vocab_tables, edir)
        reports.append(r)
        assert r.to_version == i + 1
        assert r.n_files > 0
    assert [r.from_version for r in reports] == [None, 1, 2]

    # the union of delta edges == edges of a single full-batch run
    alias_grams = X.prepare_alias_grams(vocab_tables["aliases"])
    alias_table = L.prepare_alias_table(vocab_tables["aliases"])
    full = _batch_edges(T.read(spark, tdir), alias_grams, alias_table,
                        vocab_tables["stoplist"], None)
    assert _edge_set(T.read(spark, edir)) == _edge_set(full)
    # every edge commit is stamped with the source version it consumed
    stamps = [s["properties"].get("transcripts_version")
              for s in T.snapshots(edir)]
    assert stamps == [1, 2, 3]


def test_sync_is_idempotent_and_crash_safe(spark, tmp_path, vocab_tables):
    tdir = str(tmp_path / "transcripts")
    edir = str(tmp_path / "edges")
    T.append(_chunk(spark, 100, seed=7), tdir)
    r1 = I.sync_mention_edges(spark, tdir, vocab_tables, edir)
    n = T.read(spark, edir).count()
    assert r1.n_edges == n and n > 0
    # replay (crash between commit and caller ack): no-op, no double edges
    r2 = I.sync_mention_edges(spark, tdir, vocab_tables, edir)
    assert r2.edge_table_version is None and r2.n_files == 0
    assert T.read(spark, edir).count() == n


def test_sync_refuses_non_append_history(spark, tmp_path, vocab_tables):
    tdir = str(tmp_path / "transcripts")
    edir = str(tmp_path / "edges")
    T.append(_chunk(spark, 60, seed=9), tdir)
    I.sync_mention_edges(spark, tdir, vocab_tables, edir)
    T.append(_chunk(spark, 60, seed=10), tdir)
    T.compact(spark, tdir)  # rewrites the file set
    with pytest.raises(ValueError, match="re-baseline"):
        I.sync_mention_edges(spark, tdir, vocab_tables, edir)


def test_sync_survives_source_expiry_within_append_history(
        spark, tmp_path, vocab_tables):
    """Expiring OLD transcript snapshots keeps the sync working as long as
    the high-water-mark version's manifest survives (keep_last covers it);
    expiring past the mark raises FileNotFoundError instead of silently
    reprocessing everything."""
    tdir = str(tmp_path / "transcripts")
    edir = str(tmp_path / "edges")
    for seed in (11, 12, 13):
        T.append(_chunk(spark, 60, seed), tdir)
    I.sync_mention_edges(spark, tdir, vocab_tables, edir)  # mark = 3
    T.append(_chunk(spark, 60, seed=14), tdir)             # v4
    T.expire_snapshots(tdir, keep_last=2)                  # keeps v3, v4
    r = I.sync_mention_edges(spark, tdir, vocab_tables, edir)
    assert (r.from_version, r.to_version) == (3, 4) and r.n_edges > 0
    T.append(_chunk(spark, 60, seed=15), tdir)             # v5
    T.expire_snapshots(tdir, keep_last=1)                  # drops v4 (mark)
    with pytest.raises(FileNotFoundError):
        I.sync_mention_edges(spark, tdir, vocab_tables, edir)


def test_empty_append_advances_mark(spark, tmp_path, vocab_tables):
    tdir = str(tmp_path / "transcripts")
    edir = str(tmp_path / "edges")
    T.append(_chunk(spark, 60, seed=21), tdir)
    I.sync_mention_edges(spark, tdir, vocab_tables, edir)
    # schema-compatible empty append: zero new rows
    empty = _chunk(spark, 60, seed=21).limit(0)
    T.append(empty, tdir)
    r = I.sync_mention_edges(spark, tdir, vocab_tables, edir)
    assert r.n_edges == 0
    assert I.last_synced_version(edir) == 2


def test_comention_partials_merge_to_exact_totals(spark, tmp_path,
                                                  vocab_tables):
    """Co-mention scores are sums of per-turn indicators — additive over
    deltas. Appending PARTIAL counts per sync and summing on read must
    equal a single full-batch run; compact_merged folds partials without
    changing the view or losing the sync high-water mark."""
    from ckg_spark.operators import materialize as MZ
    from ckg_spark.streaming.ingest import _batch_linked

    tdir = str(tmp_path / "transcripts")
    edir = str(tmp_path / "edges")
    for seed in (31, 32, 33):
        T.append(_chunk(spark, 100, seed), tdir)
        I.sync_mention_edges(spark, tdir, vocab_tables, edir,
                             comention=True)

    alias_grams = X.prepare_alias_grams(vocab_tables["aliases"])
    alias_table = L.prepare_alias_table(vocab_tables["aliases"])
    linked = _batch_linked(T.read(spark, tdir), alias_grams, alias_table,
                           vocab_tables["stoplist"], None)
    full = MZ.mention_edges(linked).unionByName(MZ.comention_edges(linked))

    merged = I.read_merged_edges(spark, edir)
    assert _edge_set(merged) == _edge_set(full)
    # partials really exist pre-compaction (co-mention rows duplicated
    # across syncs), and compaction folds them without changing the view
    raw_n = T.read(spark, edir).count()
    assert raw_n > merged.count()
    I.compact_merged(spark, edir)
    assert T.read(spark, edir).count() == merged.count()
    assert _edge_set(I.read_merged_edges(spark, edir)) == _edge_set(full)
    assert I.last_synced_version(edir) == 3
    # sync continues normally after compaction
    T.append(_chunk(spark, 100, seed=34), tdir)
    r = I.sync_mention_edges(spark, tdir, vocab_tables, edir,
                             comention=True)
    assert r.from_version == 3 and r.n_edges > 0
    linked4 = _batch_linked(T.read(spark, tdir), alias_grams, alias_table,
                            vocab_tables["stoplist"], None)
    full4 = MZ.mention_edges(linked4).unionByName(MZ.comention_edges(linked4))
    assert _edge_set(I.read_merged_edges(spark, edir)) == _edge_set(full4)
