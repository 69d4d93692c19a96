"""SNF: distributed distances vs numpy; fusion recovers cross-omics clusters."""

import numpy as np
from pyspark.sql import functions as F

from ckg_spark.operators import snf as SNF


def _two_cluster_omics(rng, subjects, dim, signal):
    rows = []
    for s in subjects:
        mu = signal if s.startswith("x") else -signal
        for f in range(dim):
            rows.append((s, f"f{f}", float(rng.normal(mu, 1.0))))
    return rows


def test_pairwise_sq_distances_match_numpy(spark):
    rng = np.random.RandomState(2)
    subs = [f"s{i}" for i in range(6)]
    vals = {s: rng.normal(0, 1, 4) for s in subs}
    rows = [(s, f"f{i}", float(v)) for s in subs for i, v in enumerate(vals[s])]
    df = spark.createDataFrame(rows, "subject string, feature string, value double")
    got = {(r["subj_a"], r["subj_b"]): r["d2"]
           for r in SNF.pairwise_sq_distances(df).collect()}
    for a in subs:
        for b in subs:
            exp = float(((vals[a] - vals[b]) ** 2).sum())
            assert abs(got[(a, b)] - exp) < 1e-9


def test_snf_recovers_consistent_clusters(spark):
    rng = np.random.RandomState(7)
    subjects = [f"x{i}" for i in range(8)] + [f"y{i}" for i in range(8)]
    # both omics carry the SAME two-cluster structure, different features
    d1 = spark.createDataFrame(
        _two_cluster_omics(rng, subjects, dim=6, signal=2.0),
        "subject string, feature string, value double")
    d2 = spark.createDataFrame(
        _two_cluster_omics(rng, subjects, dim=4, signal=1.5),
        "subject string, feature string, value double")
    fused, labels = SNF.run_snf({"omics1": d1, "omics2": d2},
                                n_clusters=2, k=4, iterations=8)
    lab = {r["subject"]: r["cluster"] for r in labels.collect()}
    x_labels = {lab[s] for s in subjects if s.startswith("x")}
    y_labels = {lab[s] for s in subjects if s.startswith("y")}
    assert len(x_labels) == 1 and len(y_labels) == 1 and x_labels != y_labels
    # within-cluster fused affinity must dominate cross-cluster affinity
    w = {(r["subj_a"], r["subj_b"]): r["weight"] for r in fused.collect()}
    within = [v for (a, b), v in w.items() if a[0] == b[0]]
    across = [v for (a, b), v in w.items() if a[0] != b[0]]
    assert np.mean(within) > 2 * np.mean(across)


def test_snf_common_subject_intersection(spark):
    rng = np.random.RandomState(5)
    d1 = spark.createDataFrame(
        _two_cluster_omics(rng, ["x0", "x1", "y0", "y1"], 3, 1.0),
        "subject string, feature string, value double")
    d2 = spark.createDataFrame(
        _two_cluster_omics(rng, ["x0", "x1", "y0"], 3, 1.0),  # y1 missing
        "subject string, feature string, value double")
    fused, labels = SNF.run_snf({"a": d1, "b": d2}, n_clusters=2, k=2, iterations=3)
    subs = {r["subject"] for r in labels.collect()}
    assert subs == {"x0", "x1", "y0"}
