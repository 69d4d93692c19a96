"""Round-3 analytics additions: reference-literal dispatch strings,
merge_for_polar, power_analysis."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ckg_spark.operators import analytics as A
from ckg_spark.operators import analytics_factory as AF
from ckg_spark.functions import stats as ST


def test_reference_dispatch_strings_never_keyerror():
    """Every analysis_type string the reference's factory dispatches
    (ckg/analytics_core/analytics_factory.py:82-679) must either resolve to
    an operator or raise the documented NotImplementedError — a verbatim
    reference report config must never KeyError (round-2 verdict item 2)."""
    for s in AF.REFERENCE_ANALYSIS_TYPES:
        assert s in AF._DISPATCH or s in AF._UNSUPPORTED, s
    for s in AF._UNSUPPORTED:
        with pytest.raises(NotImplementedError):
            AF.generate_result(s, None)
    with pytest.raises(KeyError):
        AF.generate_result("definitely_not_an_analysis", None)


def test_reference_alias_spellings_dispatch_same_operator():
    assert AF._DISPATCH["qcmarkers"] is not None
    assert AF._DISPATCH["up_down_enrichment"] is not None
    assert AF._DISPATCH["regulation_site_enrichment"] is not None
    assert AF._DISPATCH["merge_for_polar"] is not None


def _polar_pandas(long_pdf, regulators_pdf, aggr="mean", normalize=True):
    """Independent pandas rendition of reference merge_for_polar
    (analytics.py:2934) over the long data model."""
    df = long_pdf.copy()
    if normalize:
        mu = df.groupby("feature")["value"].transform("mean")
        sd = df.groupby("feature")["value"].transform(lambda s: s.std(ddof=1))
        df["value"] = np.where(sd > 0, (df["value"] - mu) / sd, np.nan)
    agg = {"mean": "mean", "median": "median", "sum": "sum"}[aggr]
    per_group = df.groupby(["group", "feature"], as_index=False)["value"].agg(agg)
    j = per_group.merge(regulators_pdf, on="feature")
    return (
        j.groupby(["group", "modifier"], as_index=False)["value"]
        .agg(agg)
        .sort_values(["group", "modifier"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def polar_data(spark):
    rng = np.random.default_rng(11)
    rows = []
    for g in ["g1", "g2", "g3"]:
        for f_ in [f"prot{i}" for i in range(8)]:
            for s in range(5):
                rows.append((g, f"{g}_s{s}", f_, float(rng.normal(loc=len(f_), scale=2))))
    long_pdf = pd.DataFrame(rows, columns=["group", "subject", "feature", "value"])
    reg_pdf = pd.DataFrame(
        {"feature": [f"prot{i}" for i in range(8)],
         "modifier": ["kinaseA" if i % 2 == 0 else "kinaseB" for i in range(8)]}
    )
    return long_pdf, reg_pdf


@pytest.mark.parametrize("aggr", ["mean", "median", "sum"])
def test_merge_for_polar_matches_pandas(spark, polar_data, aggr):
    long_pdf, reg_pdf = polar_data
    out = (
        A.merge_for_polar(
            spark.createDataFrame(long_pdf), spark.createDataFrame(reg_pdf),
            aggr_func=aggr, normalize=True)
        .toPandas().sort_values(["group", "modifier"]).reset_index(drop=True)
    )
    exp = _polar_pandas(long_pdf, reg_pdf, aggr=aggr, normalize=True)
    assert list(out["group"]) == list(exp["group"])
    assert list(out["modifier"]) == list(exp["modifier"])
    np.testing.assert_allclose(out["value"], exp["value"], rtol=1e-9, atol=1e-12)


def test_merge_for_polar_no_normalize(spark, polar_data):
    long_pdf, reg_pdf = polar_data
    out = (
        A.merge_for_polar(
            spark.createDataFrame(long_pdf), spark.createDataFrame(reg_pdf),
            aggr_func="sum", normalize=False)
        .toPandas().sort_values(["group", "modifier"]).reset_index(drop=True)
    )
    exp = _polar_pandas(long_pdf, reg_pdf, aggr="sum", normalize=False)
    np.testing.assert_allclose(out["value"], exp["value"], rtol=1e-9)


def test_merge_for_polar_bad_aggr(spark, polar_data):
    long_pdf, reg_pdf = polar_data
    with pytest.raises(ValueError):
        A.merge_for_polar(
            spark.createDataFrame(long_pdf), spark.createDataFrame(reg_pdf),
            aggr_func="max")


# -- power analysis -----------------------------------------------------------

def test_ncf_power_against_monte_carlo():
    """ftest_anova_power vs direct noncentral-F simulation (independent of
    the betainc series implementation)."""
    rng = np.random.default_rng(3)
    for es, nobs, k in [(0.5, 60, 3), (0.3, 100, 4), (0.8, 30, 2)]:
        df1, df2, nc = k - 1, nobs - k, es * es * nobs
        crit = ST.f_isf(0.05, df1, df2)
        n = 400_000
        f = (rng.noncentral_chisquare(df1, nc, n) / df1) / (rng.chisquare(df2, n) / df2)
        mc = (f > crit).mean()
        got = ST.ftest_anova_power(es, nobs, 0.05, k)
        assert abs(got - mc) < 0.005, (es, nobs, k, got, mc)


def test_solve_power_roundtrip():
    for es, k in [(0.4, 3), (0.25, 2)]:
        n = ST.solve_ftest_anova_nobs(es, 0.05, 0.8, k)
        assert abs(ST.ftest_anova_power(es, n, 0.05, k) - 0.8) < 1e-6


def test_cohens_d_matches_reference_formula():
    """cohens_d == the reference cohens_d (analytics.py:2574-2587), the
    form power_analysis calls with ddof=1: pooled-by-group sd, NO
    small-sample correction."""
    rng = np.random.default_rng(11)
    x, y = rng.normal(0, 1, 12), rng.normal(0.8, 1.2, 15)
    n1, n2 = len(x), len(y)
    pooled = math.sqrt(((n1 - 1) * np.var(x, ddof=1) + (n2 - 1) * np.var(y, ddof=1))
                       / (n1 + n2 - 2))
    exp = (np.mean(x) - np.mean(y)) / pooled
    assert abs(ST.cohens_d(x, y) - exp) < 1e-12
    # no n<50 correction anywhere
    xl, yl = rng.normal(0, 1, 5), rng.normal(0.5, 1, 6)
    pl = math.sqrt((4 * np.var(xl, ddof=1) + 5 * np.var(yl, ddof=1)) / 9)
    assert abs(ST.cohens_d(xl, yl) - (np.mean(xl) - np.mean(yl)) / pl) < 1e-12


def test_hedges_g_matches_reference_formula():
    """hedges_g == the reference hedges_g (analytics.py:2589-2637 — NOT
    the effect size power_analysis uses): concatenated-sample std, ddof=1,
    small-sample correction for n < 50."""
    rng = np.random.default_rng(5)
    x, y = rng.normal(0, 1, 12), rng.normal(0.8, 1.2, 15)
    sd = np.nanstd(np.concatenate([x, y]), ddof=1)
    n = len(x) + len(y)
    exp = ((np.nanmean(x) - np.nanmean(y)) / sd) * ((n - 3) / (n - 2.25)) * math.sqrt((n - 2) / n)
    assert abs(ST.hedges_g(x, y) - exp) < 1e-12
    # large-sample: no correction
    xl, yl = rng.normal(0, 1, 40), rng.normal(0.5, 1, 40)
    sdl = np.nanstd(np.concatenate([xl, yl]), ddof=1)
    assert abs(ST.hedges_g(xl, yl) - (np.mean(xl) - np.mean(yl)) / sdl) < 1e-12


def test_run_power_analysis_matches_numpy_rendition(spark):
    """Spark JVM effect-size aggregation == per-pair numpy cohens_d (the
    reference's power_analysis effect size, ddof=1 pooled sd); power
    curve values match driver recomputation (reference power_analysis,
    analytics.py:2635-2672)."""
    rng = np.random.default_rng(9)
    rows = []
    for gi, g in enumerate(["a", "b", "c"]):
        for f_ in ["f1", "f2", "f3", "f4"]:
            for s in range(8):
                rows.append((g, f"{g}{s}", f_, float(rng.normal(gi * 0.7, 1.0))))
    pdf = pd.DataFrame(rows, columns=["group", "subject", "feature", "value"])
    sample_size, power_df = A.run_power_analysis(
        spark.createDataFrame(pdf), alpha=0.05, power=0.8, min_n=3, max_n=40)
    got = power_df.toPandas()

    # independent effect-size set
    es = set()
    for f_ in pdf["feature"].unique():
        sub = pdf[pdf["feature"] == f_]
        for g1, g2 in [("a", "b"), ("a", "c"), ("b", "c")]:
            es.add(abs(ST.cohens_d(
                sub.loc[sub["group"] == g1, "value"].to_numpy(),
                sub.loc[sub["group"] == g2, "value"].to_numpy())))
    es = sorted(es)
    summary = [np.percentile(es, 25), np.mean(es), np.percentile(es, 50),
               np.percentile(es, 75)]
    names = ["25% qtl es", "mean es", "50% qtl es", "75% qtl es"]
    assert set(got["label"]) == {"%s = %4.2F" % (n_, e) for n_, e in zip(names, summary)}
    # spot-check curve values for the mean-es label
    lbl = "%s = %4.2F" % ("mean es", summary[1])
    sub = got[got["label"] == lbl].set_index("n_samples")
    for n in (5, 20, 39):
        assert abs(sub.loc[n, "power"] - ST.ftest_anova_power(summary[1], n, 0.05, 3)) < 1e-9
    assert abs(sample_size - ST.solve_ftest_anova_nobs(summary[1], 0.05, 0.8, 3)) < 1e-6
