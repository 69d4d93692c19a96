"""Calibration table + per-source PMI fingerprints."""

import math

import pytest

from pyspark.sql import functions as F

from ckg_spark.operators import textstats as TS


def test_calibration_hand_computed(spark):
    # scores 0..9, labels = score >= 5; 10 bins over range [0, 9]
    rows = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "s double, lab int")
    out = {r["bin"]: r for r in
           TS.calibration_table(df, "s", "lab", n_bins=10).collect()}
    # bin = clamp(floor((s-0)/9*10), 0, 9): s=0->0, 1->1, ..., 8->8, 9->9
    assert len(out) == 10
    for i in range(10):
        b = min(math.floor(i / 9 * 10), 9)
        assert out[b]["n"] == 1
        assert out[b]["n_pos"] == (1 if i >= 5 else 0)
        assert out[b]["mean_score"] == pytest.approx(float(i))
    assert out[0]["frac_pos"] == 0.0 and out[9]["frac_pos"] == 1.0


def test_calibration_degenerate_range(spark):
    df = spark.createDataFrame([(2.5, 1), (2.5, 0), (2.5, 1)],
                               "s double, lab int")
    out = TS.calibration_table(df, "s", "lab", n_bins=10).collect()
    assert len(out) == 1 and out[0]["bin"] == 0
    assert out[0]["n"] == 3 and out[0]["n_pos"] == 2
    assert out[0]["frac_pos"] == pytest.approx(2 / 3)


def test_calibration_monotone_for_perfect_scores(spark):
    # label sampled deterministically with prob = rank/n: frac_pos must be
    # non-decreasing across bins for a monotone score.
    n = 400
    rows = [(float(i), 1 if (i * 2654435761 % 997) / 997.0 < i / n else 0)
            for i in range(n)]
    df = spark.createDataFrame(rows, "s double, lab int")
    out = sorted(TS.calibration_table(df, "s", "lab", n_bins=4).collect(),
                 key=lambda r: r["bin"])
    fps = [r["frac_pos"] for r in out]
    assert all(b >= a - 0.15 for a, b in zip(fps, fps[1:]))
    assert fps[-1] > fps[0]


def test_fingerprints_hand_computed(spark):
    # group a: "x x y"; group b: "y z z". N=6.
    # PMI(x,a)=ln((2/3)/(2/6))=ln 2; PMI(y,a)=ln((1/3)/(2/6))=0
    df = spark.createDataFrame([("a", "x x y"), ("b", "y z z")],
                               "source string, text string")
    out = {(r["source"], r["token"]): r for r in
           TS.source_fingerprints(df, top_k=5, min_count=1).collect()}
    assert out[("a", "x")]["pmi"] == pytest.approx(math.log(2))
    assert out[("a", "y")]["pmi"] == pytest.approx(0.0)
    assert out[("b", "z")]["pmi"] == pytest.approx(math.log(2))
    assert out[("a", "x")]["rank"] == 1 and out[("b", "z")]["rank"] == 1
    assert out[("a", "x")]["cg"] == 2


def test_fingerprints_min_count_floor(spark):
    df = spark.createDataFrame(
        [("a", "rare common common common"), ("b", "common common")],
        "source string, text string")
    out = TS.source_fingerprints(df, top_k=5, min_count=2).collect()
    assert all(r["token"] != "rare" for r in out)


def test_fingerprints_top_k_and_tiebreak(spark):
    # every token unique to its group -> identical PMI; ties break by
    # token asc, and only top_k survive.
    df = spark.createDataFrame(
        [("a", "d c b a e f g"), ("b", "q r s t u v w")],
        "source string, text string")
    out = [r for r in TS.source_fingerprints(
        df, top_k=3, min_count=1).collect() if r["source"] == "a"]
    assert sorted(out, key=lambda r: r["rank"]) == sorted(
        out, key=lambda r: r["token"])
    assert [r["token"] for r in sorted(out, key=lambda r: r["rank"])] == \
        ["a", "b", "c"]


def test_fingerprints_partitioning_invariance(spark):
    rows = [("s%d" % (i % 3), f"w{i % 7} w{(i * 3) % 11} w{i % 2}")
            for i in range(90)]
    df = spark.createDataFrame(rows, "source string, text string")
    a = {(r["source"], r["rank"]): (r["token"], round(r["pmi"], 10))
         for r in TS.source_fingerprints(df.repartition(1)).collect()}
    b = {(r["source"], r["rank"]): (r["token"], round(r["pmi"], 10))
         for r in TS.source_fingerprints(df.repartition(17)).collect()}
    assert a == b
