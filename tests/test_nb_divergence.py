"""Naive Bayes classifier + token-distribution divergence."""

import math

import numpy as np
import pytest

from ckg_spark.operators import textstats as TS


def test_nb_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "good good fine", 1), (1, "bad ugly", 0),
         (2, "good bad", 1), (3, "", 0), (4, "extra", 0)],
        "doc_id long, text string, lab int")
    out = {r["doc_id"]: r for r in TS.nb_train_score(docs, "lab").collect()}
    # c1: good3 fine1 bad1 (n1=5); c0: bad1 ugly1 extra1 (n0=3); v=5
    # d1=11, d0=9; prior=ln((2+1)/(3+1))
    prior = math.log(3 / 4)
    s = {"good": math.log(4 / 11) - math.log(1 / 9),
         "fine": math.log(2 / 11) - math.log(1 / 9),
         "bad": math.log(2 / 11) - math.log(2 / 9),
         "ugly": math.log(1 / 11) - math.log(2 / 9)}
    assert out[0]["log_odds"] == pytest.approx(
        prior + 2 * s["good"] + s["fine"])
    assert out[1]["log_odds"] == pytest.approx(prior + s["bad"] + s["ugly"])
    # empty doc: prior only, n_tokens 0
    assert out[3]["n_tokens"] == 0
    assert out[3]["log_odds"] == pytest.approx(prior)
    assert out[0]["pred"] is True and out[1]["pred"] is False


def test_nb_separates_held_out_vocabularies(spark):
    """Train on half the docs of two disjoint-vocabulary classes; the
    held-out half must classify correctly (the seed-set filter pattern)."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, f"alpha beta gamma w{i % 7}", 1))
        else:
            rows.append((i, f"zork quux blarg w{i % 7}", 0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lab int")
    model = docs.where("doc_id < 20")
    held = {r["doc_id"]: r["pred"] for r in
            TS.nb_train_score(docs.where("doc_id >= 20"), "lab",
                              model_df=model).collect()}
    assert all(held[i] == (i % 2 == 0) for i in held)


def _np_divergence(groups):
    """Reference KL/JS over explicit token lists."""
    from collections import Counter
    allc = Counter()
    for toks in groups.values():
        allc.update(toks)
    vocab = sorted(allc)
    v, n = len(vocab), sum(allc.values())
    p = np.array([(allc[w] + 1) / (n + v) for w in vocab])
    out = {}
    for g, toks in groups.items():
        c = Counter(toks)
        ng = len(toks)
        pg = np.array([(c[w] + 1) / (ng + v) for w in vocab])
        m = (pg + p) / 2
        out[g] = (float((pg * np.log(pg / p)).sum()),
                  float(((pg * np.log(pg / m)).sum()
                         + (p * np.log(p / m)).sum()) / 2))
    return out


def test_divergence_hand_computed(spark):
    df = spark.createDataFrame(
        [("a", "x x y"), ("b", "x z"), ("b", "z z")],
        "source string, text string")
    got = {r["source"]: r for r in TS.token_divergence(df).collect()}
    exp = _np_divergence({"a": ["x", "x", "y"], "b": ["x", "z", "z", "z"]})
    for g in ("a", "b"):
        assert got[g]["kl"] == pytest.approx(exp[g][0], abs=1e-12)
        assert got[g]["js"] == pytest.approx(exp[g][1], abs=1e-12)
    assert got["a"]["n_tokens"] == 3 and got["b"]["n_tokens"] == 4


def test_divergence_single_group_is_zero(spark):
    """One group == the corpus -> P_g == P exactly -> KL = JS = 0."""
    df = spark.createDataFrame([("only", "p q r p")],
                               "source string, text string")
    r = TS.token_divergence(df).collect()[0]
    assert r["kl"] == 0.0 and r["js"] == 0.0


def test_divergence_vocab_cap_matches_full_when_uncut(spark):
    df = spark.createDataFrame(
        [("a", "x x y"), ("b", "x z"), ("b", "z z")],
        "source string, text string")
    full = {r["source"]: (r["kl"], r["js"])
            for r in TS.token_divergence(df).collect()}
    capped = {r["source"]: (r["kl"], r["js"])
              for r in TS.token_divergence(df, vocab_size=10).collect()}
    for g in full:
        assert capped[g][0] == pytest.approx(full[g][0], abs=1e-12)


def test_divergence_vocab_cap_residual(spark):
    """Cap below V folds the tail into one residual token: distributions
    stay proper (finite KL), identical groups stay symmetric, and a
    concentrated group diverges far more. (Identical groups do NOT reach
    exactly 0 — add-one smoothing at different totals shifts mass — so
    the assertion is ordering, not zero.)"""
    uni = " ".join(f"t{i}" for i in range(30)) + " "
    rows = [("a", uni * 20), ("b", uni * 20), ("c", "t0 " * 600)]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in
           TS.token_divergence(df, vocab_size=5).collect()}
    for g in ("a", "b", "c"):
        assert math.isfinite(out[g]["kl"])
    assert out["a"]["kl"] == pytest.approx(out["b"]["kl"], abs=1e-12)
    # c is 1/3 of the corpus, so the corpus mixture is pulled toward it;
    # still, the concentrated group must diverge strictly more than the
    # uniform ones.
    assert out["c"]["kl"] > 2 * out["a"]["kl"]


def test_divergence_partitioning_invariance(spark):
    rows = [("s%d" % (i % 3), f"w{i % 11} w{(i * 5) % 13} w{i % 2}")
            for i in range(60)]
    df = spark.createDataFrame(rows, "source string, text string")
    a = {r["source"]: (round(r["kl"], 12), round(r["js"], 12))
         for r in TS.token_divergence(df.repartition(1)).collect()}
    b = {r["source"]: (round(r["kl"], 12), round(r["js"], 12))
         for r in TS.token_divergence(df.repartition(13)).collect()}
    for g in a:
        assert a[g][0] == pytest.approx(b[g][0], abs=1e-10)
        assert a[g][1] == pytest.approx(b[g][1], abs=1e-10)
