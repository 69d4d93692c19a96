"""Composed training-export plan (plans/export.py): curation -> mixture
-> packing with the lineage/resume contract."""

import pytest
from pyspark.sql import functions as F

from ckg_spark.operators import packing as PK
from ckg_spark.operators import sampling as SA
from ckg_spark.plans.export import run_training_export

SF_DIR = "/root/testdata/sf0.001"
GOPHER = {"min_words": 50, "min_stopword_hits": 1}


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_export_end_to_end_and_resume(spark, tmp_path):
    out = str(tmp_path / "exp")
    targets = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    res = run_training_export(
        spark, _docs(spark), out, targets=targets, seq_len=64,
        minhash_threshold=None, gopher_kwargs=GOPHER)
    segs = res.segments.collect()
    assert segs and not res.resumed_stages
    # stage accounting is monotone: curated >= tokens >= sampled
    c = res.stage_counts
    assert c["20_tokens"] == c["10_curation/40_language"]
    assert c["30_mixture"] <= c["20_tokens"]
    # every sequence but the last fills to exactly seq_len
    fills = {r["seq_id"]: r["fill"]
             for r in PK.sequence_stats(res.segments).collect()}
    last = max(fills)
    assert all(f == 64 for s, f in fills.items() if s != last)
    assert 0 < fills[last] <= 64
    # realized mix sums to 1 over exactly the target sources
    assert set(res.realized_mix) == set(targets)
    assert sum(res.realized_mix.values()) == pytest.approx(1.0)
    # the binding source's share cannot exceed its target (no upsampling)
    # and the plan equals the direct operator composition
    toks = res.corpus
    direct = PK.pack_sequences(toks, 64, token_col="n_tokens").collect()
    assert sorted(map(tuple, segs)) == sorted(map(tuple, direct))

    # rerun: every stage resumes, identical segments, same realized mix
    res2 = run_training_export(
        spark, _docs(spark), out, targets=targets, seq_len=64,
        minhash_threshold=None, gopher_kwargs=GOPHER)
    assert set(res2.resumed_stages) >= {"20_tokens", "30_mixture",
                                        "40_segments"}
    assert any(s.startswith("10_curation/") for s in res2.resumed_stages)
    assert sorted(map(tuple, res2.segments.collect())) == \
        sorted(map(tuple, segs))
    assert res2.realized_mix == res.realized_mix


def test_export_no_targets_keeps_all_curated(spark, tmp_path):
    out = str(tmp_path / "exp_all")
    res = run_training_export(
        spark, _docs(spark), out, targets=None, seq_len=128,
        minhash_threshold=None, gopher_kwargs=GOPHER)
    assert res.corpus.count() == res.stage_counts["20_tokens"]
    assert "30_mixture" not in res.stage_counts
    assert res.segments.count() > 0
    assert sum(res.realized_mix.values()) == pytest.approx(1.0)


def test_export_refuses_recipe_drift(spark, tmp_path):
    out = str(tmp_path / "exp_drift")
    run_training_export(spark, _docs(spark), out, targets={"src0": 1.0},
                        seq_len=64, minhash_threshold=None,
                        gopher_kwargs=GOPHER)
    with pytest.raises(ValueError, match="different recipe"):
        run_training_export(spark, _docs(spark), out, targets={"src0": 1.0},
                            seq_len=128, minhash_threshold=None,
                            gopher_kwargs=GOPHER)
    with pytest.raises(ValueError, match="different recipe"):
        run_training_export(spark, _docs(spark), out,
                            targets={"src0": 0.5, "src1": 0.5},
                            seq_len=64, minhash_threshold=None,
                            gopher_kwargs=GOPHER)


def test_export_budget_caps_tokens(spark, tmp_path):
    docs = _docs(spark)
    out_full = str(tmp_path / "full")
    out_cap = str(tmp_path / "cap")
    targets = {"src0": 0.5, "src1": 0.5}
    full = run_training_export(spark, docs, out_full, targets=targets,
                               seq_len=64, minhash_threshold=None,
                               gopher_kwargs=GOPHER)
    full_tok = full.corpus.agg(F.sum("n_tokens")).collect()[0][0]
    cap = run_training_export(spark, docs, out_cap, targets=targets,
                              seq_len=64, budget=full_tok / 2,
                              minhash_threshold=None, gopher_kwargs=GOPHER)
    cap_tok = cap.corpus.agg(F.sum("n_tokens")).collect()[0][0]
    assert cap_tok < full_tok
    # capped selection is a subset of the full one (same seed, lower rates)
    full_ids = {r["doc_id"] for r in full.corpus.collect()}
    cap_ids = {r["doc_id"] for r in cap.corpus.collect()}
    assert cap_ids < full_ids
    # sampling stays the exact rate filter (no hidden randomness)
    rates = SA.mixture_rates(
        {s: float(r["w"]) for s, r in
         ((row["source"], row) for row in
          full.corpus.sparkSession.read.parquet(f"{out_cap}/20_tokens")
          .groupBy("source").agg(F.sum("n_tokens").alias("w")).collect())
         if s in targets},
        targets, budget=full_tok / 2)
    assert all(0 < v <= 1 for v in rates.values())
