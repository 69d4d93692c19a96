"""Incremental near-dup sync (plans/neardup.py): union-of-syncs pairs ==
batch LSH pairs, incremental cluster ids == dedup_minhash_lsh, flood
guard, idempotence."""

import pytest
from pyspark.sql import functions as F

from ckg_spark.operators import dedup as D
from ckg_spark.plans import canon as C
from ckg_spark.plans import neardup as N
from ckg_spark.plans import table as T


def _docs(seed_lo, seed_hi, dup_of=None):
    """Deterministic docs; optionally near-dup copies of earlier ids."""
    rows = []
    for i in range(seed_lo, seed_hi):
        base = " ".join(f"w{(i * 7 + j) % 31:02d}" for j in range(40))
        rows.append((i, base))
        if dup_of and i in dup_of:
            # near-dup of doc (i - dup_of[i]): same text with 2 tokens edited
            src = i - dup_of[i]
            toks = [f"w{(src * 7 + j) % 31:02d}" for j in range(40)]
            toks[0], toks[-1] = "xx", "yy"
            rows.append((i + 10_000, " ".join(toks)))
    return rows


def _pair_set(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_union_of_syncs_equals_batch_pairs(spark, tmp_path):
    idx = str(tmp_path / "idx")
    found = set()
    # interleave corpus appends with sync ticks (real incremental drive)
    d2 = str(tmp_path / "docs2")
    chunks = [
        _docs(0, 40),
        _docs(40, 80, dup_of={45: 40, 50: 45}),
        _docs(80, 120, dup_of={85: 80, 90: 60}),
    ]
    for ch in chunks:
        T.append(spark.createDataFrame(ch, "doc_id long, text string"), d2)
        rep, pairs = N.sync_neardup(spark, d2, idx, threshold=0.6,
                                    bucket_cap=10_000)
        found |= _pair_set(pairs)
    # idle re-sync: no-op, no pairs
    rep, pairs = N.sync_neardup(spark, d2, idx, threshold=0.6,
                                bucket_cap=10_000)
    assert rep.index_version is None and pairs.count() == 0

    full = T.read(spark, d2)
    sh = D.shingles(full).localCheckpoint(eager=True)
    cands = D.lsh_candidate_pairs(D.minhash_signatures(sh),
                                  bucket_cap=10_000)
    batch = _pair_set(D.exact_jaccard(cands, sh)
                      .where(F.col("jaccard") >= 0.6))
    assert found == batch and len(batch) >= 4  # incl. the cross-delta dup


def test_incremental_clusters_equal_batch_dedup(spark, tmp_path):
    d2, idx, mdir = (str(tmp_path / p) for p in ("docs", "idx", "map"))
    chunks = [
        _docs(0, 40),
        _docs(40, 80, dup_of={45: 40, 50: 45}),
        _docs(80, 120, dup_of={85: 80, 90: 60}),
    ]
    for ch in chunks:
        T.append(spark.createDataFrame(ch, "doc_id long, text string"), d2)
        N.sync_neardup(spark, d2, idx, mapping_table_dir=mdir,
                       threshold=0.6, bucket_cap=10_000)
    got = {r["ident"]: r["canonical_id"]
           for r in C.read_canonical_mapping(spark, mdir).collect()}
    want = {r["doc_id"]: r["canonical_id"]
            for r in D.dedup_minhash_lsh(T.read(spark, d2),
                                         threshold=0.6).collect()}
    # batch emits rows only for docs in near-dup components; incremental
    # registers every doc (self-mapped when isolated) — compare clustered
    # docs exactly and isolated docs by self-mapping
    for k, v in want.items():
        assert got[str(k)] == str(v), k
    clustered = {str(k) for k in want}
    for k, v in got.items():
        if k not in clustered:
            assert k == v


def test_flood_guard_bounds_join(spark, tmp_path):
    # 60 identical docs flood one bucket; cap 5 drops it at sync time
    d2, idx = str(tmp_path / "docs"), str(tmp_path / "idx")
    same = " ".join(f"t{j}" for j in range(30))
    T.append(spark.createDataFrame([(i, same) for i in range(60)],
                                   "doc_id long, text string"), d2)
    rep, pairs = N.sync_neardup(spark, d2, idx, threshold=0.6, bucket_cap=5)
    assert rep.n_pairs == 0  # every bucket flooded past the cap
