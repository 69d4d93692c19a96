"""ComBat batch correction vs an independent numpy transcription of the
published sva/pycombat algorithm (Johnson et al. 2007, parametric EB, no
covariates) — matrix form, written separately from the Spark decomposition."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ckg_spark.operators.analytics import combat_batch_correction


def _numpy_combat(X: np.ndarray, batches: np.ndarray, conv=1e-4):
    """X: features x samples. Returns corrected matrix (parametric EB)."""
    levels = sorted(set(batches))
    n_array = X.shape[1]
    n_b = {b: int((batches == b).sum()) for b in levels}
    # batch means per feature, weighted grand mean, pooled variance (ddof=0)
    ghat = np.column_stack([X[:, batches == b].mean(axis=1) for b in levels])
    stand_mean = ghat @ np.array([n_b[b] / n_array for b in levels])
    var_pooled = ((X - stand_mean[:, None]) ** 2).mean(axis=1)
    s = (X - stand_mean[:, None]) / np.sqrt(var_pooled)[:, None]
    out = np.empty_like(X)
    for j, b in enumerate(levels):
        sb = s[:, batches == b]
        gh = sb.mean(axis=1)
        dh = sb.var(axis=1, ddof=1)
        gbar, t2 = gh.mean(), gh.var(ddof=1)
        m, s2 = dh.mean(), dh.var(ddof=1)
        a = (2 * s2 + m ** 2) / s2
        bb = (m * s2 + m ** 3) / s2
        n = float(n_b[b])
        g_old, d_old = gh.copy(), dh.copy()
        for _ in range(500):
            g_new = (t2 * n * gh + d_old * gbar) / (t2 * n + d_old)
            sum2 = ((sb - g_new[:, None]) ** 2).sum(axis=1)
            d_new = (0.5 * sum2 + bb) / (n / 2.0 + a - 1.0)
            change = max(np.max(np.abs(g_new - g_old) / np.abs(g_old + 1e-30)),
                         np.max(np.abs(d_new - d_old) / np.abs(d_old + 1e-30)))
            g_old, d_old = g_new, d_new
            if change < conv:
                break
        out[:, batches == b] = ((sb - g_old[:, None]) / np.sqrt(d_old)[:, None]
                                * np.sqrt(var_pooled)[:, None]
                                + stand_mean[:, None])
    return out


@pytest.fixture(scope="module")
def batch_data():
    rng = np.random.RandomState(21)
    n_feat, n1, n2, n3 = 30, 8, 10, 6
    base = rng.normal(10, 2, (n_feat, n1 + n2 + n3))
    # additive + multiplicative batch effects
    base[:, :n1] += rng.normal(1.5, 0.3, (n_feat, 1))
    base[:, n1:n1 + n2] *= 1.15
    batches = np.array(["b1"] * n1 + ["b2"] * n2 + ["b3"] * n3)
    return base, batches


def test_combat_matches_independent_numpy(spark, batch_data):
    X, batches = batch_data
    n_feat, n_samp = X.shape
    rows = [
        (str(batches[s]), f"s{s}", f"f{f}", float(X[f, s]))
        for f in range(n_feat) for s in range(n_samp)
    ]
    df = spark.createDataFrame(rows, "batch string, subject string, feature string, value double")
    got = combat_batch_correction(df).toPandas().set_index(["feature", "subject"])["value"]
    exp = _numpy_combat(X, batches)
    for f in range(n_feat):
        for s in range(n_samp):
            assert abs(got.loc[(f"f{f}", f"s{s}")] - exp[f, s]) < 1e-6, (f, s)


def test_combat_shrinks_batch_separation(spark, batch_data):
    X, batches = batch_data
    n_feat, n_samp = X.shape
    rows = [
        (str(batches[s]), f"s{s}", f"f{f}", float(X[f, s]))
        for f in range(n_feat) for s in range(n_samp)
    ]
    df = spark.createDataFrame(rows, "batch string, subject string, feature string, value double")
    corrected = combat_batch_correction(df)
    # per-feature spread of batch means must shrink vs raw
    def spread(d):
        bm = d.groupBy("feature", "batch").agg(F.avg("value").alias("m"))
        return (bm.groupBy("feature").agg(
            (F.max("m") - F.min("m")).alias("gap")).agg(F.avg("gap")).collect()[0][0])
    # residual gap after correction is sampling noise (SE of a batch mean at
    # n=8 is ~0.7 here), so expect a large but not total reduction
    assert spread(corrected) < 0.5 * spread(df)


def test_combat_preserves_schema_and_rowcount(spark, batch_data):
    X, batches = batch_data
    rows = [
        (str(batches[s]), f"s{s}", f"f{f}", float(X[f, s]))
        for f in range(X.shape[0]) for s in range(X.shape[1])
    ]
    df = spark.createDataFrame(rows, "batch string, subject string, feature string, value double")
    out = combat_batch_correction(df)
    assert out.columns == df.columns
    assert out.count() == df.count()
