"""Analytics operators + scipy-free stats kernel."""

import math
import random

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ckg_spark.functions import stats as ST
from ckg_spark.operators import analytics as A


# ---- distribution functions vs numerical integration ------------------------

def _t_pdf(x, df):
    return (
        math.gamma((df + 1) / 2)
        / (math.sqrt(df * math.pi) * math.gamma(df / 2))
        * (1 + x * x / df) ** (-(df + 1) / 2)
    )


@pytest.mark.parametrize("t,df", [(2.0, 10), (0.5, 30), (3.7, 5)])
def test_t_sf_vs_integration(t, df):
    xs = np.linspace(t, t + 60, 400_000)
    tail = np.trapz([_t_pdf(x, df) for x in xs], xs)
    assert abs(ST.t_sf(t, df) - 2 * tail) < 1e-4


def test_t_sf_edges():
    assert abs(ST.t_sf(0.0, 7) - 1.0) < 1e-12
    assert abs(ST.t_sf(1.0, 1) - 0.5) < 1e-9  # Cauchy: P(|X|>1) = 0.5


def test_f_sf_median_of_f11():
    assert abs(ST.f_sf(1.0, 1, 1) - 0.5) < 1e-9


def test_fisher_total_mass():
    # summing the greater-tail from the minimum a gives 1
    row1, col1, n = 10, 14, 24
    lo = max(0, row1 + col1 - n)
    p = ST.fisher_exact_greater(lo, row1 - lo, col1 - lo, n - row1 - col1 + lo)
    assert abs(p - 1.0) < 1e-9


def test_welch_known_example():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    y = np.array([2.0, 4.0, 6.0, 8.0])
    t, df, p = ST.welch_ttest(x, y)
    # hand-computed: mean diff -2.5, se = sqrt(vx/4 + vy/4) = sqrt(25/12)
    assert abs(t + 2.5 / math.sqrt(25 / 12)) < 1e-9
    assert 0 < p < 1


# ---- long-format fixture -----------------------------------------------------

@pytest.fixture(scope="module")
def long_df(spark):
    rng = random.Random(4)
    rows = []
    for feat_i in range(12):
        shift = 2.0 if feat_i < 3 else 0.0  # features 0-2 differ between groups
        for g, base in (("A", 0.0), ("B", shift)):
            for s in range(8):
                rows.append((g, f"{g}{s}", f"f{feat_i:02d}",
                             base + rng.gauss(0, 1)))
    # some missing values for f11 in group B
    rows = [r for r in rows if not (r[2] == "f11" and r[0] == "B" and r[1] in ("B0", "B1", "B2", "B3", "B4"))]
    return spark.createDataFrame(rows, "group string, subject string, feature string, value double").cache()


def test_wide_long_roundtrip(spark, long_df):
    wide = A.to_wide(long_df.where("group = 'A'"))
    back = A.to_long(wide)
    orig = long_df.where("group = 'A'").select("subject", "feature", "value")
    assert back.where("value is not null").exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


def test_missing_stats_and_filter(spark, long_df):
    ms = A.missing_stats(long_df).toPandas()
    # f11 has 3 of 8 B-subjects (we dropped 5): pct present rows only — the
    # long table simply lacks rows; missing_stats counts nulls, so inject them
    withnulls = long_df.withColumn(
        "value", F.when(~((F.col("feature") == "f00") & (F.col("group") == "A")), F.col("value"))
    )
    ms2 = A.missing_stats(withnulls).toPandas().set_index(["group", "feature"])
    assert ms2.loc[("A", "f00"), "n_missing"] == 8
    kept = A.filter_by_missingness(withnulls, max_missing=0.5)
    assert kept.where("feature = 'f00'").count() == 0


def test_zscore(spark, long_df):
    z = A.normalize_zscore(long_df)
    agg = z.groupBy("feature").agg(F.avg("value").alias("m"), F.stddev_samp("value").alias("s")).toPandas()
    assert (agg["m"].abs() < 1e-9).all()
    assert ((agg["s"] - 1).abs() < 1e-9).all()


def test_quantile_normalization_matches_pandas(spark, long_df):
    got = A.normalize_quantile(long_df).toPandas()
    pdf = long_df.toPandas()
    wide = pdf.pivot_table(index="feature", columns="subject", values="value")
    ranked = wide.rank(method="first")
    rank_means = {}
    for col in wide.columns:
        s = wide[col].dropna().sort_values()
        for i, v in enumerate(s.values, start=1):
            rank_means.setdefault(i, []).append(v)
    means = {k: np.mean(v) for k, v in rank_means.items()}
    # spot-check one subject: its sorted values map to rank means
    subj = "A0"
    exp = sorted(means[i] for i in range(1, int(wide[subj].count()) + 1))
    gotv = sorted(got.loc[got["subject"] == subj, "value"])
    assert np.allclose(gotv, exp)


def test_ttest_and_bh(spark, long_df):
    res = A.run_ttest(long_df, "A", "B").toPandas().set_index("feature")
    # shifted features should be the 3 smallest p-values
    smallest = set(res["pvalue"].nsmallest(3).index)
    assert smallest == {"f00", "f01", "f02"}
    # verify one p against numpy oracle
    pdf = long_df.toPandas()
    x = pdf[(pdf.group == "A") & (pdf.feature == "f00")]["value"].to_numpy()
    y = pdf[(pdf.group == "B") & (pdf.feature == "f00")]["value"].to_numpy()
    t, dof, p = ST.welch_ttest(x, y)
    assert abs(res.loc["f00", "pvalue"] - p) < 1e-12

    sdf = spark.createDataFrame(
        [("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005)], "feature string, pvalue double"
    )
    adj = A.bh_correction(sdf).toPandas().set_index("feature")["padj"]
    assert abs(adj["d"] - 0.02) < 1e-12
    assert abs(adj["a"] - 0.02) < 1e-12
    assert abs(adj["c"] - 0.04) < 1e-12
    assert abs(adj["b"] - 0.04) < 1e-12


def test_anova_matches_ttest_for_two_groups(spark, long_df):
    an = A.run_anova(long_df.where("feature = 'f00'")).toPandas().iloc[0]
    tt = A.run_ttest(long_df.where("feature = 'f00'"), "A", "B").toPandas().iloc[0]
    # for 2 balanced groups, F = t^2 (pooled t; Welch differs slightly) —
    # sanity: p-values agree to ~1e-2 on near-equal variances
    assert abs(an["pvalue"] - tt["pvalue"]) < 0.05


def test_fold_change(spark, long_df):
    fc = A.fold_change(long_df, "B", "A").toPandas().set_index("feature")
    assert fc.loc["f00", "log_fc"] > 1.0
    assert abs(fc.loc["f05", "log_fc"]) < 1.0


def test_pairwise_correlation(spark):
    rows = []
    rng = random.Random(9)
    for s in range(30):
        base = rng.gauss(0, 1)
        rows.append(("g", f"s{s}", "fa", base))
        rows.append(("g", f"s{s}", "fb", base * 2 + rng.gauss(0, 0.01)))
        rows.append(("g", f"s{s}", "fc", rng.gauss(0, 1)))
    df = spark.createDataFrame(rows, "group string, subject string, feature string, value double")
    got = A.pairwise_correlation(df).toPandas().set_index(["fa", "fb"])
    assert got.loc[("fa", "fb"), "corr"] > 0.99
    assert abs(got.loc[("fa", "fc"), "corr"]) < 0.5


def test_enrichment_planted(spark):
    # universe of 100 features; annotation "hot" covers exactly the hit set
    hits = spark.createDataFrame([(f"f{i}",) for i in range(10)], "feature string")
    ann_rows = [(f"f{i}", "hot") for i in range(10)]
    ann_rows += [(f"f{i}", "cold") for i in range(40, 100)]
    ann_rows += [(f"f{i}", "mixed") for i in range(5, 60)]
    anns = spark.createDataFrame(ann_rows, "feature string, annotation string")
    res = A.run_enrichment(hits, anns, universe_size=100).toPandas().set_index("annotation")
    assert res.loc["hot", "pvalue"] < res.loc["mixed", "pvalue"] < res.loc["cold", "pvalue"]
    assert res.loc["hot", "pvalue"] < 1e-6


def test_ks_test(spark, long_df):
    res = A.run_ks_test(long_df, "A", "B").toPandas().set_index("feature")
    smallest = set(res["pvalue"].nsmallest(3).index)
    assert smallest == {"f00", "f01", "f02"}
    # identical distributions -> D from same data = 0
    same = A.run_ks_test(
        long_df.where("group = 'A'").union(
            long_df.where("group = 'A'").withColumn("group", F.lit("B"))
        ), "A", "B",
    ).toPandas()
    assert (same["ks_d"] == 0).all()


def test_ks_asymptotic_p_sane():
    import numpy as np
    from ckg_spark.functions.stats import ks_2samp
    rng = np.random.default_rng(3)
    x, y = rng.normal(0, 1, 200), rng.normal(0, 1, 200)
    d, p = ks_2samp(x, y)
    assert p > 0.05  # same distribution
    d2, p2 = ks_2samp(x, rng.normal(2, 1, 200))
    assert p2 < 1e-6  # shifted distribution


def test_two_way_anova(spark):
    import random
    rng = random.Random(8)
    rows = []
    for feat in ["fx", "fy"]:
        for ga in ["A", "B"]:
            for gb in ["M", "N"]:
                for i in range(10):
                    base = 3.0 if (feat == "fx" and ga == "B") else 0.0
                    rows.append((ga, gb, f"s{ga}{gb}{i}", feat,
                                 base + rng.gauss(0, 1)))
    df = spark.createDataFrame(
        rows, "group string, subject_group string, subject string, feature string, value double"
    )
    res = A.run_two_way_anova(df).toPandas().set_index("feature")
    assert res.loc["fx", "p_a"] < 0.001      # factor A matters for fx
    assert res.loc["fy", "p_a"] > 0.01       # not for fy
    assert res.loc["fx", "p_b"] > 0.01       # factor B never matters


def test_analytics_factory_dispatch(spark, long_df):
    from ckg_spark.operators import analytics_factory as AF

    res = AF.generate_result("ttest", long_df, group_a="A", group_b="B").toPandas()
    assert {"feature", "pvalue"} <= set(res.columns)
    summ = AF.generate_result("summary", long_df)
    assert summ.count() > 0
    import pytest as _pytest
    with _pytest.raises(KeyError):
        AF.generate_result("nope", long_df)
    assert "anova" in AF.available()
