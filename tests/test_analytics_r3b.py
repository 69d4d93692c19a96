"""Round-3b analytics: assumption checks, pairwise post-hoc t-tests,
mixed imputation, small reference helpers."""

import numpy as np
import pandas as pd
import pytest

from ckg_spark.functions import stats as ST
from ckg_spark.operators import analytics as A


def _long(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["group", "subject", "feature", "value"]))


def test_levene_matches_manual():
    """Brown-Forsythe W recomputed from the definition."""
    rng = np.random.default_rng(1)
    gs = [rng.normal(0, 1, 30), rng.normal(0, 3, 25), rng.normal(0, 1, 20)]
    w, p = ST.levene_test(gs)
    zs = [np.abs(g - np.median(g)) for g in gs]
    n = sum(len(z) for z in zs)
    k = 3
    zbar = np.concatenate(zs).mean()
    num = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs)
    den = sum(((z - z.mean()) ** 2).sum() for z in zs)
    w_manual = (n - k) / (k - 1) * num / den
    assert abs(w - w_manual) < 1e-12
    assert p < 0.01  # sd 3 vs 1 must reject


def test_dagostino_k2_calibration():
    rng = np.random.default_rng(7)
    rej = sum(ST.dagostino_k2(rng.normal(0, 1, 100))[1] < 0.05
              for _ in range(300)) / 300
    assert 0.01 <= rej <= 0.12  # ~alpha under H0
    assert all(ST.dagostino_k2(rng.exponential(1, 100))[1] < 1e-2
               for _ in range(10))  # power on skewed data


def test_check_equal_variances_spark(spark):
    rng = np.random.default_rng(3)
    rows = []
    for g, sd in [("a", 1.0), ("b", 4.0)]:
        for s in range(25):
            rows.append((g, f"{g}{s}", "het", float(rng.normal(0, sd))))
            rows.append((g, f"{g}{s}", "hom", float(rng.normal(0, 1.0))))
    out = {r["identifier"]: r
           for r in A.check_equal_variances(_long(spark, rows)).collect()}
    assert out["het"]["passed"] is False and out["het"]["pvalue"] < 0.05
    assert out["hom"]["passed"] is True


def test_check_normality_spark(spark):
    rng = np.random.default_rng(4)
    rows = []
    for s in range(60):
        rows.append(("a", f"s{s}", "gauss", float(rng.normal())))
        rows.append(("a", f"s{s}", "skewed", float(rng.exponential())))
    out = {r["identifier"]: r
           for r in A.check_normality(_long(spark, rows)).collect()}
    assert out["skewed"]["passed"] is False
    assert out["gauss"]["pvalue"] > 0.001


def test_pairwise_ttest_matches_manual(spark):
    rng = np.random.default_rng(5)
    data = {g: rng.normal(mu, 1.0, 12)
            for g, mu in [("a", 0.0), ("b", 1.0), ("c", 0.4)]}
    rows = [(g, f"{g}{i}", "f1", float(v))
            for g, vs in data.items() for i, v in enumerate(vs)]
    out = A.run_pairwise_ttest(_long(spark, rows)).toPandas()
    assert sorted(zip(out["group1"], out["group2"])) == [
        ("a", "b"), ("a", "c"), ("b", "c")]
    row = out[(out["group1"] == "a") & (out["group2"] == "b")].iloc[0]
    t, dof, p = ST.welch_ttest(data["a"], data["b"])
    assert abs(row["t"] - t) < 1e-12 and abs(row["pvalue"] - p) < 1e-12
    d = ST.cohens_d(data["a"], data["b"])
    n = 24
    assert abs(row["effsize"] - d * (1 - 3 / (4 * n - 9))) < 1e-12
    assert abs(row["fc"] - (data["a"].mean() - data["b"].mean())) < 1e-12


def test_pairwise_ttest_bh_correction(spark):
    rng = np.random.default_rng(6)
    rows = [(g, f"{g}{i}", "f1", float(rng.normal(mu, 1.0)))
            for g, mu in [("a", 0.0), ("b", 2.0), ("c", 0.1)] for i in range(10)]
    out = A.run_pairwise_ttest(_long(spark, rows), correction="bh").toPandas()
    ps = out.sort_values("pvalue")
    m = len(ps)
    exp = (ps["pvalue"] * m / np.arange(1, m + 1))[::-1].cummin()[::-1].clip(upper=1.0)
    np.testing.assert_allclose(
        ps["padj"].to_numpy(), exp.to_numpy(), rtol=1e-12)


def test_impute_mixed(spark):
    rng = np.random.default_rng(8)
    rows = []
    for g in ("a", "b"):
        for s in range(6):
            # dense feature: one missing value -> KNN-imputable
            rows.append((g, f"{g}{s}", "dense",
                         None if (g, s) == ("a", 0) else float(rng.normal(5, 1))))
            # sparse feature: mostly missing -> normal fill
            rows.append((g, f"{g}{s}", "sparse",
                         float(rng.normal(0, 1)) if s < 2 else None))
    out = A.impute_mixed(_long(spark, rows), cutoff=0.6).toPandas()
    assert out["value"].notna().all()
    dense_fill = out[(out["feature"] == "dense") & (out["subject"] == "a0")]["value"].iloc[0]
    # KNN fill lands near the dense feature's scale, not the shifted tail
    assert 2.0 < dense_fill < 8.0
    sparse_fill = out[(out["feature"] == "sparse")]["value"]
    # normal fills sit well below the observed mean (MNAR downshift)
    assert sparse_fill.min() < -0.5


def test_small_helpers(spark):
    rows = [("a", "s1", "f", 1.0), ("a", "s2", "f", 2.0),
            ("b", "s1", "f", 3.0), ("b", "s2", "f", 4.0)]
    df = _long(spark, rows)
    assert "group" not in A.remove_group(df).columns
    # 4 subjects-in-groups: 4! / (2! 2!) = 6
    assert A.get_max_permutations(df) == 6.0
    assert A.check_is_paired(df) is True
    rows_unpaired = rows + [("b", "s3", "f", 5.0)]
    assert A.check_is_paired(_long(spark, rows_unpaired)) is False


def test_two_way_anova_effect_sizes(spark):
    """eta^2 / omega^2 columns match manual recomputation (reference
    eta_squared/omega_squared decorations)."""
    rng = np.random.default_rng(10)
    rows = []
    for a in ("a1", "a2"):
        for b in ("b1", "b2"):
            mu = (a == "a2") * 2.0 + (b == "b2") * 0.5
            for s in range(8):
                rows.append((a, f"{a}{b}{s}", "f1", float(rng.normal(mu, 1.0))))
    pdf = pd.DataFrame(rows, columns=["group", "subject", "feature", "value"])
    pdf["subject_group"] = [("b1" if "b1" in s else "b2") for s in pdf["subject"]]
    df = spark.createDataFrame(pdf)
    out = A.run_two_way_anova(df).toPandas().iloc[0]
    res = ST.anova_two_way(pdf["value"].to_numpy(), pdf["group"].to_numpy(),
                           pdf["subject_group"].to_numpy())
    for k in ("eta_a", "omega_a", "eta_ab", "omega_ab"):
        assert abs(out[k] - res[k]) < 1e-12
    assert 0 < out["eta_a"] < 1


def test_pairwise_ttest_with_covariates(spark):
    """Covariate-free run agrees with plain ANCOVA F = t^2; a confounded
    covariate changes the conclusion."""
    rng = np.random.default_rng(11)
    rows, covs = [], []
    for gi, g in enumerate(("a", "b")):
        for s in range(15):
            age = 30 + gi * 20 + rng.normal(0, 2)
            # value driven entirely by age -> adjusting kills the effect
            rows.append((g, f"{g}{s}", "f1", float(age * 0.5 + rng.normal(0, 0.3))))
            covs.append((f"{g}{s}", float(age)))
    long = spark.createDataFrame(
        pd.DataFrame(rows, columns=["group", "subject", "feature", "value"]))
    cov_df = spark.createDataFrame(pd.DataFrame(covs, columns=["subject", "age"]))
    out = A.run_pairwise_ttest_with_covariates(long, cov_df, ["age"]).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    # unadjusted means differ hugely, adjusted test must NOT reject
    assert abs(row["fc"]) > 5 and row["pvalue"] > 0.05
