"""Deterministic sampling / mixture weighting (operators/sampling.py) and
fixed-length sequence packing (operators/packing.py)."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ckg_spark.operators import packing as P
from ckg_spark.operators import sampling as S


def _docs(spark, n=400, sources=4):
    pdf = pd.DataFrame({
        "doc_id": range(n),
        "source": [f"s{i % sources}" for i in range(n)],
        "n_tokens": [(i * 37) % 90 + 10 for i in range(n)],
    })
    return spark.createDataFrame(pdf)


# -- hash_uniform / deterministic_sample -------------------------------------

def test_hash_uniform_matches_reference_md5(spark):
    df = _docs(spark, 50).select(
        "doc_id", S.hash_uniform("doc_id", seed="t").alias("u"))
    for r in df.collect():
        exp = int(hashlib.md5(f"t:{r['doc_id']}".encode()).hexdigest()[:8],
                  16) / 2**32
        assert r["u"] == exp


def test_sample_reproducible_across_parallelism(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in
         S.deterministic_sample(df, 0.3, seed="a").collect()}
    b = {r["doc_id"] for r in
         S.deterministic_sample(df.repartition(17), 0.3, seed="a").collect()}
    assert a == b and 0 < len(a) < 400
    # different seed -> a genuinely different (independent) selection
    c = {r["doc_id"] for r in
         S.deterministic_sample(df, 0.3, seed="b").collect()}
    assert c != a
    # rate monotonicity: a larger rate strictly contains a smaller one
    d = {r["doc_id"] for r in
         S.deterministic_sample(df, 0.6, seed="a").collect()}
    assert a < d


# -- mixture_rates / mixture_sample ------------------------------------------

def test_mixture_rates_solver():
    avail = {"web": 1000.0, "code": 100.0, "books": 300.0}
    rates = S.mixture_rates(avail, {"web": 0.5, "code": 0.25, "books": 0.25})
    # binding source: code (100 / 0.25 = 400 = smallest feasible budget)
    assert rates["code"] == 1.0
    assert rates["web"] == pytest.approx(0.5 * 400 / 1000)
    assert rates["books"] == pytest.approx(0.25 * 400 / 300)
    # explicit budget below feasibility scales every rate down
    half = S.mixture_rates(avail, {"web": 0.5, "code": 0.25, "books": 0.25},
                           budget=200)
    assert half["code"] == pytest.approx(0.5)
    assert all(half[s] == pytest.approx(rates[s] / 2) for s in rates)


def test_mixture_sample_hits_targets(spark):
    df = _docs(spark, 4000, sources=4)
    targets = {"s0": 0.5, "s1": 0.3, "s2": 0.2}  # s3 dropped entirely
    out = S.mixture_sample(df, targets, weight_col="n_tokens").collect()
    assert not [r for r in out if r["source"] == "s3"]
    got = {}
    for r in out:
        got[r["source"]] = got.get(r["source"], 0) + r["n_tokens"]
    tot = sum(got.values())
    # realized mix concentrates around the target fractions
    for s, f in targets.items():
        assert abs(got[s] / tot - f) < 0.08, (s, got[s] / tot, f)
    # binding source (s0: needs the largest share) is kept ~in full
    all_s0 = sum(r["n_tokens"] for r in df.where("source = 's0'").collect())
    assert got["s0"] / all_s0 > 0.9


def test_mixture_sample_rates_exact_vs_solver(spark):
    """The sampled set is exactly {doc: u < rate[source]} for the solver's
    rates — no hidden randomness."""
    df = _docs(spark, 1000, sources=3)
    targets = {"s0": 0.6, "s1": 0.4}
    avail = {r["source"]: float(r["w"]) for r in
             df.where(F.col("source").isin(*targets))
             .groupBy("source").agg(F.sum("n_tokens").alias("w")).collect()}
    rates = S.mixture_rates(avail, targets)
    exp = {r["doc_id"] for r in
           df.withColumn("u", S.hash_uniform("doc_id")).collect()
           if r["source"] in rates and r["u"] < rates[r["source"]]}
    got = {r["doc_id"] for r in S.mixture_sample(
        df, targets, weight_col="n_tokens").collect()}
    assert got == exp


def test_mixture_sample_refuses_absent_target_source(spark):
    """A positive target for a source with no corpus weight must raise —
    silently dropping it would let the other sources fill its share."""
    df = _docs(spark, 100, sources=2)  # only s0, s1 exist
    with pytest.raises(ValueError, match="nope"):
        S.mixture_sample(df, {"s0": 0.5, "nope": 0.5})
    # a zero-fraction entry for an absent source is harmless
    out = S.mixture_sample(df, {"s0": 1.0, "nope": 0.0}).collect()
    assert out and all(r["source"] == "s0" for r in out)


# -- pack_sequences ----------------------------------------------------------

def _segments_ref(rows, L):
    """Driver reference: concatenate in doc_id order, cut every L tokens."""
    out, start = [], 0
    for did, t in sorted(rows):
        end = start + t
        for seq in range(start // L, (end - 1) // L + 1):
            s0, s1 = max(start, seq * L), min(end, (seq + 1) * L)
            out.append((seq, did, s0 - start, s0 - seq * L, s1 - s0))
        start = end
    return sorted(out)


def test_pack_sequences_matches_reference(spark):
    df = _docs(spark, 300)
    rows = [(r["doc_id"], r["n_tokens"]) for r in df.collect()]
    got = sorted(map(tuple, P.pack_sequences(df, 128).collect()))
    assert got == _segments_ref(rows, 128)


def test_pack_sequences_invariants(spark):
    df = _docs(spark, 500)
    segs = P.pack_sequences(df, 256)
    total = sum(r["n_tokens"] for r in df.collect())
    stats = {r["seq_id"]: (r["fill"], r["n_docs"])
             for r in P.sequence_stats(segs).collect()}
    n_seq = (total + 255) // 256
    assert set(stats) == set(range(n_seq))
    for sid, (fill, n_docs) in stats.items():
        assert n_docs >= 1
        assert fill == (256 if sid < n_seq - 1 else total - 256 * (n_seq - 1))
    # per-doc segments reassemble the doc: offsets contiguous from 0
    by_doc = {}
    for r in segs.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["doc_offset"], r["n_tokens"]))
    toks = {r["doc_id"]: r["n_tokens"] for r in df.collect()}
    for did, parts in by_doc.items():
        parts.sort()
        pos = 0
        for off, n in parts:
            assert off == pos and n > 0
            pos += n
        assert pos == toks[did]


def test_pack_sequences_parallelism_invariant_and_edge_cases(spark):
    df = _docs(spark, 200)
    a = sorted(map(tuple, P.pack_sequences(df, 64).collect()))
    b = sorted(map(tuple, P.pack_sequences(df.repartition(13), 64).collect()))
    assert a == b
    # zero-token docs are dropped; doc longer than seq_len spans many seqs
    pdf = pd.DataFrame({"doc_id": [1, 2, 3],
                        "n_tokens": [0, 300, 5]})
    segs = sorted(map(tuple, P.pack_sequences(
        spark.createDataFrame(pdf), 100).collect()))
    assert segs == [(0, 2, 0, 0, 100), (1, 2, 100, 0, 100),
                    (2, 2, 200, 0, 100), (3, 3, 0, 0, 5)]
    with pytest.raises(ValueError):
        P.pack_sequences(df, 0)


def test_pack_incremental_two_deltas_equal_full(spark, tmp_path):
    from ckg_spark.plans import table as T

    df = _docs(spark, 300)
    d1, d2 = df.where("doc_id < 180"), df.where("doc_id >= 180")
    tdir = str(tmp_path / "segs")
    v1 = P.pack_sequences_incremental(spark, d1, 128, tdir)
    v2 = P.pack_sequences_incremental(spark, d2, 128, tdir)
    assert (v1, v2) == (1, 2)
    got = sorted(map(tuple, T.read(spark, tdir).collect()))
    full = sorted(map(tuple, P.pack_sequences(df, 128).collect()))
    assert got == full
    # the boundary sequence is shared across the two commits (real splice)
    s1 = {r["seq_id"] for r in T.read(spark, tdir, version=1).collect()}
    s2 = {r["seq_id"] for r in
          T.read(spark, tdir, version=2).collect()} - s1
    assert max(s1) in {r["seq_id"] for r in T.read(spark, tdir, version=2)
                       .collect()} or not s2


def test_pack_incremental_guards(spark, tmp_path):
    from ckg_spark.plans import table as T

    df = _docs(spark, 100)
    tdir = str(tmp_path / "segs")
    P.pack_sequences_incremental(spark, df.where("doc_id < 60"), 64, tdir)
    # replayed / interleaving delta refused (no double-pack)
    with pytest.raises(ValueError, match="high-water"):
        P.pack_sequences_incremental(spark, df.where("doc_id < 60"), 64, tdir)
    # seq_len drift refused
    with pytest.raises(ValueError, match="seq_len"):
        P.pack_sequences_incremental(spark, df.where("doc_id >= 60"), 128,
                                     tdir)
    # empty delta is a clean no-op
    assert P.pack_sequences_incremental(
        spark, df.where("doc_id > 1000"), 64, tdir) is None
    assert T.current_version(tdir) == 1


def test_pack_incremental_refuses_lost_high_water_mark(spark, tmp_path):
    """If every stamped snapshot is destroyed (e.g. a property-dropping
    rewrite), base=0 would silently double-assign token offsets — the
    function must refuse instead."""
    from ckg_spark.plans import table as T

    df = _docs(spark, 100)
    tdir = str(tmp_path / "segs")
    P.pack_sequences_incremental(spark, df.where("doc_id < 60"), 64, tdir)
    T.overwrite(T.read(spark, tdir), tdir)  # drops the properties
    T.expire_snapshots(tdir, keep_last=1)
    with pytest.raises(ValueError, match="total_tokens"):
        P.pack_sequences_incremental(spark, df.where("doc_id >= 60"), 64,
                                     tdir)


def test_pack_sequences_shuffled_deterministic(spark):
    """shuffle_seed packs in seeded-hash order: reproducible under any
    parallelism, genuinely different from id order, same totals."""
    import hashlib

    df = _docs(spark, 300)
    a = sorted(map(tuple, P.pack_sequences(
        df, 64, shuffle_seed="ep0").collect()))
    b = sorted(map(tuple, P.pack_sequences(
        df.repartition(17), 64, shuffle_seed="ep0").collect()))
    assert a == b
    plain = sorted(map(tuple, P.pack_sequences(df, 64).collect()))
    assert a != plain
    # identical token mass and fill invariant either way
    assert sum(t[4] for t in a) == sum(t[4] for t in plain)
    fills = {r["seq_id"]: r["fill"] for r in P.sequence_stats(
        P.pack_sequences(df, 64, shuffle_seed="ep0")).collect()}
    last = max(fills)
    assert all(f == 64 for s, f in fills.items() if s != last)
    # matches the driver reference run in hash order
    rows = [(r["doc_id"], r["n_tokens"]) for r in df.collect()]
    u = {d: int(hashlib.md5(f"ep0:{d}".encode()).hexdigest()[:8], 16)
         for d, _ in rows}
    out, start = [], 0
    for did, t in sorted(rows, key=lambda x: (u[x[0]], x[0])):
        if t <= 0:
            continue
        end = start + t
        for seq in range(start // 64, (end - 1) // 64 + 1):
            s0, s1 = max(start, seq * 64), min(end, (seq + 1) * 64)
            out.append((seq, did, s0 - start, s0 - seq * 64, s1 - s0))
        start = end
    assert a == sorted(out)
    # different epoch seed -> different layout
    c = sorted(map(tuple, P.pack_sequences(
        df, 64, shuffle_seed="ep1").collect()))
    assert c != a
