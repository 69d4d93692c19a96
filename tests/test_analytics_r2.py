"""Round-2 analytics additions: THSD, ANCOVA, repeated-measures / mixed
ANOVA, regulation-enrichment wrappers, multi-dataset correlation, and the
scale-safe two-pass global rank / BH correction.

Validation strategy: closed-form statistical identities (F = t^2 families),
published studentized-range table values, and independent numpy
recomputation — never the operator's own code path.
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ckg_spark.functions import stats as ST
from ckg_spark.operators import analytics as A


# ---------------------------------------------------------------------------
# studentized range SF vs published critical tables
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("q,k,df", [
    (3.877, 3, 10), (3.958, 4, 20), (2.888, 2, 30), (3.977, 5, 60),
])
def test_tukey_sf_published_critical_values(q, k, df):
    # alpha=0.05 critical values from standard studentized-range tables
    assert abs(ST.tukey_sf(q, k, df)[0] - 0.05) < 5e-4


def test_tukey_sf_monotone_and_bounded():
    qs = np.array([0.5, 1.0, 2.0, 3.0, 5.0, 8.0])
    p = ST.tukey_sf(qs, 3, 12)
    assert np.all(np.diff(p) < 0)
    assert np.all((p >= 0) & (p <= 1))


# ---------------------------------------------------------------------------
# THSD: with k=2 groups, Tukey p == pooled two-sided t-test p (Q = sqrt(2)|t|)
# ---------------------------------------------------------------------------

def test_thsd_two_groups_equals_pooled_ttest(spark):
    rng = np.random.RandomState(3)
    rows = []
    x = rng.normal(10, 2, 8)
    y = rng.normal(12, 2, 10)
    for i, v in enumerate(x):
        rows.append(("a", f"s{i}", "F1", float(v)))
    for i, v in enumerate(y):
        rows.append(("b", f"t{i}", "F1", float(v)))
    df = spark.createDataFrame(rows, "group string, subject string, feature string, value double")
    out = A.run_thsd(df).collect()[0]
    # pooled t
    sp = math.sqrt(((len(x) - 1) * x.var(ddof=1) + (len(y) - 1) * y.var(ddof=1))
                   / (len(x) + len(y) - 2))
    t = (x.mean() - y.mean()) / (sp * math.sqrt(1 / len(x) + 1 / len(y)))
    p_t = ST.t_sf(abs(t), len(x) + len(y) - 2)  # two-sided by construction
    assert abs(out["qstat"] - math.sqrt(2) * abs(t)) < 1e-9
    assert abs(out["pvalue"] - p_t) < 1e-4
    assert abs(out["log2fc"] - (x.mean() - y.mean())) < 1e-9
    assert abs(out["fc"] - 2 ** (x.mean() - y.mean())) < 1e-9


def test_thsd_three_groups_all_pairs(spark):
    rng = np.random.RandomState(11)
    rows = []
    for g, mu in [("a", 10.0), ("b", 10.5), ("c", 14.0)]:
        for i, v in enumerate(rng.normal(mu, 1.0, 6)):
            rows.append((g, f"{g}{i}", "F1", float(v)))
    df = spark.createDataFrame(rows, "group string, subject string, feature string, value double")
    out = {(r["group1"], r["group2"]): r for r in A.run_thsd(df).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    # big separation (a,c) must be far more significant than (a,b)
    assert out[("a", "c")]["pvalue"] < 0.01 < out[("a", "b")]["pvalue"]
    r = out[("a", "c")]
    assert abs(ST.tukey_sf(r["qstat"], 3, 15)[0] - r["pvalue"]) < 1e-9


# ---------------------------------------------------------------------------
# ANCOVA: F matches explicit normal-equation OLS in the test
# ---------------------------------------------------------------------------

def test_ancova_matches_manual_ols(spark):
    rng = np.random.RandomState(5)
    n = 24
    groups = np.repeat(["a", "b", "c"], 8)
    cov = rng.normal(0, 1, n)
    y = 0.7 * cov + np.where(groups == "c", 1.2, 0.0) + rng.normal(0, 1, n)
    rows = [(str(g), f"s{i}", "F1", float(v)) for i, (g, v) in enumerate(zip(groups, y))]
    df = spark.createDataFrame(rows, "group string, subject string, feature string, value double")
    covs = spark.createDataFrame(
        [(f"s{i}", float(c)) for i, c in enumerate(cov)], "subject string, age double")
    out = A.run_ancova(df, covs, ["age"]).collect()[0]
    # manual OLS F-test
    X = np.column_stack([np.ones(n), (groups == "a").astype(float),
                         (groups == "b").astype(float), cov])
    Xr = np.column_stack([np.ones(n), cov])
    bf = np.linalg.solve(X.T @ X, X.T @ y)
    br = np.linalg.solve(Xr.T @ Xr, Xr.T @ y)
    rss_f = ((y - X @ bf) ** 2).sum()
    rss_r = ((y - Xr @ br) ** 2).sum()
    f_manual = ((rss_r - rss_f) / 2) / (rss_f / (n - 4))
    assert abs(out["f"] - f_manual) < 1e-8
    assert out["df1"] == 2.0 and out["df2"] == float(n - 4)
    assert abs(out["pvalue"] - ST.f_sf(f_manual, 2, n - 4)) < 1e-10


# ---------------------------------------------------------------------------
# RM-ANOVA: k=2 conditions -> F == paired-t^2, p == two-sided paired-t p
# ---------------------------------------------------------------------------

def test_rm_anova_paired_t_identity(spark):
    rng = np.random.RandomState(7)
    n = 12
    a = rng.normal(10, 2, n)
    b = a + rng.normal(0.8, 1.0, n)
    rows = [("c1", f"s{i}", "F1", float(v)) for i, v in enumerate(a)]
    rows += [("c2", f"s{i}", "F1", float(v)) for i, v in enumerate(b)]
    df = spark.createDataFrame(rows, "group string, subject string, feature string, value double")
    out = A.run_rm_anova(df).collect()[0]
    d = b - a
    t = d.mean() / (d.std(ddof=1) / math.sqrt(n))
    assert abs(out["f"] - t * t) < 1e-8
    assert abs(out["pvalue"] - ST.t_sf(abs(t), n - 1)) < 1e-10
    assert out["df1"] == 1.0 and out["df2"] == float(n - 1)


def test_rm_anova_incomplete_design_is_null(spark):
    rows = [("c1", "s1", "F1", 1.0), ("c2", "s1", "F1", 2.0), ("c1", "s2", "F1", 3.0)]
    df = spark.createDataFrame(rows, "group string, subject string, feature string, value double")
    out = A.run_rm_anova(df).collect()[0]
    assert out["pvalue"] is None or math.isnan(out["pvalue"])


# ---------------------------------------------------------------------------
# mixed ANOVA: k=2, g=2 -> interaction F == two-sample t^2 on subject diffs
# ---------------------------------------------------------------------------

def test_mixed_anova_interaction_t_identity(spark):
    rng = np.random.RandomState(9)
    n1, n2 = 8, 9
    a1 = rng.normal(5, 1, n1); b1 = a1 + rng.normal(1.0, 0.7, n1)
    a2 = rng.normal(5, 1, n2); b2 = a2 + rng.normal(0.2, 0.7, n2)
    rows = []
    for i in range(n1):
        rows += [("t1", f"g1s{i}", "G1", "F1", float(a1[i])),
                 ("t2", f"g1s{i}", "G1", "F1", float(b1[i]))]
    for i in range(n2):
        rows += [("t1", f"g2s{i}", "G2", "F1", float(a2[i])),
                 ("t2", f"g2s{i}", "G2", "F1", float(b2[i]))]
    df = spark.createDataFrame(
        rows, "group string, subject string, subject_group string, feature string, value double")
    out = A.run_mixed_anova(df).collect()[0]
    d1, d2 = b1 - a1, b2 - a2
    sp = math.sqrt(((n1 - 1) * d1.var(ddof=1) + (n2 - 1) * d2.var(ddof=1)) / (n1 + n2 - 2))
    t = (d1.mean() - d2.mean()) / (sp * math.sqrt(1 / n1 + 1 / n2))
    assert abs(out["f"] - t * t) < 1e-8
    assert abs(out["pvalue"] - ST.t_sf(abs(t), n1 + n2 - 2)) < 1e-9
    assert out["df1"] == 1.0 and out["df2"] == float(n1 + n2 - 2)


# ---------------------------------------------------------------------------
# regulation enrichment wrappers
# ---------------------------------------------------------------------------

def _regulation_fixture(spark):
    # 8 features; f1,f2 up (padj<=.05, lfc>=1); f3 down; rest null results
    rows = [
        ("f1", 0.01, 2.0, True), ("f2", 0.02, 1.5, True), ("f3", 0.01, -2.2, True),
        ("f4", 0.50, 0.1, False), ("f5", 0.60, -0.2, False), ("f6", 0.90, 0.0, False),
        ("f7", 0.04, 0.3, True), ("f8", 0.70, 1.9, False),
    ]
    reg = spark.createDataFrame(rows, "feature string, padj double, log2fc double, rejected boolean")
    ann = spark.createDataFrame(
        [("f1", "pathA"), ("f2", "pathA"), ("f3", "pathA"), ("f4", "pathA"),
         ("f1", "pathB"), ("f5", "pathB"), ("f6", "pathB"), ("f7", "pathB"),
         ("f9", "pathC")],  # f9 not in universe -> dropped
        "feature string, annotation string")
    return reg, ann


def test_regulation_enrichment_counts_and_fisher(spark):
    reg, ann = _regulation_fixture(spark)
    out = {r["annotation"]: r for r in
           A.run_regulation_enrichment(reg, ann).collect()}
    assert "pathC" not in out  # annotation outside the universe
    # foreground = {f1,f2,f3,f7}; pathA members {f1..f4}: a=3, ann=4
    assert out["pathA"]["hits"] == 3 and out["pathA"]["ann_size"] == 4
    assert out["pathB"]["hits"] == 2 and out["pathB"]["ann_size"] == 4
    # Fisher one-sided computed from first principles (universe=8, hits=4)
    p_a = ST.fisher_exact_greater(3, 1, 1, 3)
    assert abs(out["pathA"]["pvalue"] - p_a) < 1e-12
    assert 0 <= out["pathA"]["padj"] <= 1


def test_up_down_enrichment_directions(spark):
    reg, ann = _regulation_fixture(spark)
    out = A.run_up_down_regulation_enrichment(reg, ann, alpha=0.05, lfc_cutoff=1.0)
    pdf = out.toPandas()
    assert set(pdf["direction"]) == {"upregulated", "downregulated"}
    up = pdf[(pdf.direction == "upregulated") & (pdf.annotation == "pathA")].iloc[0]
    # up-hits = {f1,f2} (f7 lfc 0.3 excluded, f8 padj .7 excluded): pathA a=2
    assert up["hits"] == 2
    down = pdf[(pdf.direction == "downregulated") & (pdf.annotation == "pathA")].iloc[0]
    assert down["hits"] == 1  # f3


def test_site_enrichment_collapses_sites(spark):
    rows = [
        ("GENE1~P1_S10-p", 0.01, 2.0, True), ("GENE1~P1_S22-p", 0.02, 1.1, True),
        ("GENE2~P2_T5-p", 0.50, 0.0, False), ("GENE3~P3", 0.01, 1.0, True),
    ]
    reg = spark.createDataFrame(rows, "feature string, padj double, log2fc double, rejected boolean")
    ann = spark.createDataFrame(
        [("GENE1~P1", "pathX"), ("GENE2~P2", "pathX"), ("GENE3~P3", "pathY")],
        "feature string, annotation string")
    out = {r["annotation"]: r for r in
           A.run_site_regulation_enrichment(reg, ann).collect()}
    # GENE1 sites collapse to one feature, still rejected -> pathX a=1 of 2
    assert out["pathX"]["hits"] == 1 and out["pathX"]["ann_size"] == 2
    assert out["pathY"]["hits"] == 1 and out["pathY"]["ann_size"] == 1


# ---------------------------------------------------------------------------
# multi-dataset correlation vs pandas
# ---------------------------------------------------------------------------

def test_multi_correlation_vs_pandas(spark):
    rng = np.random.RandomState(13)
    subs = [f"s{i}" for i in range(10)]
    prot = pd.DataFrame({"subject": subs, "P1": rng.normal(size=10), "P2": rng.normal(size=10)})
    clin = pd.DataFrame({"subject": subs, "C1": prot["P1"] * 2 + rng.normal(0, .1, 10)})
    d1 = spark.createDataFrame(prot.melt("subject", var_name="feature", value_name="value"))
    d2 = spark.createDataFrame(clin.melt("subject", var_name="feature", value_name="value"))
    out = A.run_multi_correlation({"prot": d1, "clin": d2}).toPandas()
    got = out.set_index(["fa", "fb"])["corr"].to_dict()
    merged = prot.merge(clin, on="subject")
    expect = merged[["P1", "P2", "C1"]].corr()
    assert abs(got[("clin:C1", "prot:P1")] - expect.loc["P1", "C1"]) < 1e-9
    assert abs(got[("prot:P1", "prot:P2")] - expect.loc["P1", "P2"]) < 1e-9
    assert len(got) == 3  # all unordered pairs across the union


# ---------------------------------------------------------------------------
# two-pass global rank + BH: equivalence with independent numpy BH
# ---------------------------------------------------------------------------

def test_with_global_rank_matches_sort_order(spark):
    rng = np.random.RandomState(17)
    vals = rng.permutation(500).astype(float)
    df = spark.createDataFrame([(f"id{i}", float(v)) for i, v in enumerate(vals)],
                               "id string, p double")
    out = A.with_global_rank(df, [F.col("p").asc(), F.col("id").asc()], "rk").toPandas()
    out = out.sort_values("p")
    assert list(out["rk"]) == list(range(1, 501))


def test_bh_correction_vs_numpy(spark):
    rng = np.random.RandomState(19)
    ps = np.concatenate([rng.uniform(0, 0.01, 20), rng.uniform(0, 1, 180)])
    df = spark.createDataFrame([(f"f{i}", float(p)) for i, p in enumerate(ps)],
                               "feature string, pvalue double")
    out = A.bh_correction(df, tiebreak=["feature"]).toPandas().set_index("feature")
    # independent BH (statsmodels fdr_bh formulation)
    order = np.argsort(ps, kind="mergesort")
    n = len(ps)
    raw = ps[order] * n / np.arange(1, n + 1)
    cummin = np.minimum.accumulate(raw[::-1])[::-1]
    padj = np.minimum(cummin, 1.0)
    for rank_pos, idx in enumerate(order):
        assert abs(out.loc[f"f{idx}", "padj"] - padj[rank_pos]) < 1e-12


def test_bh_ties_get_equal_padj(spark):
    rows = [("a", 0.02), ("b", 0.02), ("c", 0.02), ("d", 0.5)]
    df = spark.createDataFrame(rows, "feature string, pvalue double")
    out = A.bh_correction(df).toPandas()
    tied = out[out.pvalue == 0.02]["padj"].unique()
    assert len(tied) == 1


# ---------------------------------------------------------------------------
# plan audit: no empty-PARTITION BY window on the BH data path
# ---------------------------------------------------------------------------

def test_bh_plan_has_no_global_window(spark):
    df = spark.createDataFrame([(f"f{i}", i / 100.0) for i in range(100)],
                               "feature string, pvalue double")
    plan = A.bh_correction(df, tiebreak=["feature"])._jdf.queryExecution() \
        .optimizedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            # every window spec must name a partition column before the sort spec
            spec = line.split("windowspecdefinition(")[1]
            assert not spec.lstrip().startswith("pvalue"), \
                f"global (unpartitioned) window found: {line.strip()}"
            assert "_pid" in spec.split(",")[0], \
                f"window not partitioned by _pid: {line.strip()}"


def test_analytics_factory_new_entries(spark):
    from ckg_spark.operators import analytics_factory as AF
    for name in ("ancova", "repeated_measurements_anova", "mixed_anova",
                 "thsd", "up_down_regulation_enrichment",
                 "site_regulation_enrichment", "multi_correlation"):
        assert name in AF.available()


# ---------------------------------------------------------------------------
# two-stage (BKY) FDR vs an independent numpy rendition of the published
# two-stage linear step-up procedure (Benjamini-Krieger-Yekutieli 2006)
# ---------------------------------------------------------------------------

def _bh_padj_np(p):
    n = len(p)
    order = np.argsort(p)
    ranked = p[order] * n / np.arange(1, n + 1)
    ranked = np.minimum.accumulate(ranked[::-1])[::-1]
    out = np.empty(n)
    out[order] = np.minimum(ranked, 1.0)
    return out


def _twostage_np(p, alpha=0.05, method="bky"):
    fact = 1.0 + alpha if method == "bky" else 1.0
    ap = alpha / fact
    padj1 = _bh_padj_np(p)
    r1 = int((padj1 <= ap).sum())
    m = len(p)
    m0 = (m - r1) if 0 < r1 < m else m
    padj = np.minimum(padj1 * fact * m0 / m, 1.0)
    return padj, padj <= alpha


@pytest.mark.parametrize("method", ["bky", "bh"])
def test_twostage_fdr_matches_numpy(spark, method):
    rng = np.random.RandomState(7)
    # mix of strong signal and uniform nulls so stage 1 rejects some
    p = np.concatenate([rng.uniform(1e-6, 1e-3, 12), rng.uniform(0, 1, 88)])
    df = spark.createDataFrame(
        [(f"f{i}", float(v)) for i, v in enumerate(p)], "feature string, pvalue double")
    out = {r["feature"]: r for r in
           A.twostage_fdr_correction(df, method=method, tiebreak=["feature"]).collect()}
    exp_padj, exp_rej = _twostage_np(p, method=method)
    for i in range(len(p)):
        r = out[f"f{i}"]
        assert abs(r["padj"] - exp_padj[i]) < 1e-9, (i, r["padj"], exp_padj[i])
        assert r["rejected"] == bool(exp_rej[i])


def test_twostage_fdr_no_rejections_edge(spark):
    # all-null p-values: r1 == 0 path (padj = BH padj * fact, capped at 1)
    p = np.linspace(0.5, 0.99, 20)
    df = spark.createDataFrame(
        [(f"f{i}", float(v)) for i, v in enumerate(p)], "feature string, pvalue double")
    out = A.twostage_fdr_correction(df, tiebreak=["feature"]).collect()
    exp_padj, _ = _twostage_np(p)
    got = {r["feature"]: r["padj"] for r in out}
    for i in range(len(p)):
        assert abs(got[f"f{i}"] - exp_padj[i]) < 1e-9
    assert not any(r["rejected"] for r in out)


# ---------------------------------------------------------------------------
# permutation FDR: q-value formula recomputed from the operator's own
# permutation pool via independent numpy counting; determinism; signal sanity
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def perm_long_df(spark):
    rng = np.random.RandomState(42)
    rows = []
    for gi, g in enumerate(["a", "b", "c"]):
        for si in range(6):
            subj = f"{g}{si}"
            for fi in range(12):
                # features f0/f1 carry real group signal, rest are null
                mu = gi * 3.0 if fi < 2 else 5.0
                rows.append((g, subj, f"f{fi:02d}", float(rng.normal(mu, 1.0))))
    return spark.createDataFrame(
        rows, "group string, subject string, feature string, value double")


def test_permutation_fdr_formula_vs_numpy(spark, perm_long_df):
    n_perm = 8
    out = A.permutation_fdr(perm_long_df, permutations=n_perm, seed=1).toPandas()
    # rebuild the rand p-value pool exactly as the operator defines it
    pdf = perm_long_df.toPandas()
    subj_groups = sorted(set(zip(pdf["subject"], pdf["group"])))
    subjects = [s for s, _ in subj_groups]
    groups = [g for _, g in subj_groups]
    rand_pool = []
    for pi in range(n_perm):
        prng = np.random.default_rng((1, pi))
        perm = prng.permutation(len(groups))
        gmap = {subjects[i]: groups[perm[i]] for i in range(len(subjects))}
        shuffled = pdf.assign(group=pdf["subject"].map(gmap))
        for _, fgrp in shuffled.groupby("feature"):
            gs = [g["value"].to_numpy(float) for _, g in fgrp.groupby("group")]
            rand_pool.append(ST.anova_oneway(gs)[3])
    rand_pool = np.array([p for p in rand_pool if not np.isnan(p)])
    obs = out.set_index("feature")["pvalue"]
    for feat, p in obs.items():
        a = (rand_pool <= p).sum() + 1e-13
        b = (obs <= p).sum()
        q = a / b / n_perm
        got = float(out.set_index("feature").loc[feat, "padj"])
        assert abs(got - q) < 1e-9, (feat, got, q)


def test_permutation_fdr_deterministic_and_signal(spark, perm_long_df):
    o1 = A.permutation_fdr(perm_long_df, permutations=6, seed=3).toPandas() \
        .sort_values("feature").reset_index(drop=True)
    o2 = A.permutation_fdr(perm_long_df, permutations=6, seed=3).toPandas() \
        .sort_values("feature").reset_index(drop=True)
    pd.testing.assert_frame_equal(o1, o2)
    byf = o1.set_index("feature")
    # the two signal features must get the smallest q-values
    assert set(byf["padj"].nsmallest(2).index) == {"f00", "f01"}
    assert bool(byf.loc["f00", "rejected"]) and bool(byf.loc["f01", "rejected"])


def test_factory_fdr_entries(spark):
    from ckg_spark.operators import analytics_factory as AF
    assert "pvalue_correction_twostage" in AF.available()
    assert "pvalue_correction_permutation" in AF.available()


# ---------------------------------------------------------------------------
# Kaplan-Meier + logrank: exact manual product-limit computation in the test
# ---------------------------------------------------------------------------

def _km_manual(durations, events):
    """Product-limit estimator computed directly: {t: (n_at_risk, d, S)}."""
    order = np.argsort(durations)
    durations, events = np.asarray(durations)[order], np.asarray(events)[order]
    out, s, n = {}, 1.0, len(durations)
    for t in sorted(set(durations)):
        at = (durations >= t).sum()
        d = int(events[durations == t].sum())
        if d > 0:
            s *= 1.0 - d / at
        out[t] = (at, d, s)
    return out


def test_kaplan_meier_matches_manual(spark):
    rng = np.random.RandomState(13)
    rows, manual = [], {}
    for g in ["a", "b"]:
        dur = rng.randint(1, 15, 30)
        ev = (rng.rand(30) < 0.7).astype(int)
        manual[g] = _km_manual(dur, ev)
        rows += [(g, int(t), int(e)) for t, e in zip(dur, ev)]
    df = spark.createDataFrame(rows, "group string, duration int, event int")
    got = A.run_kaplan_meier(df).collect()
    assert len(got) == sum(len(m) for m in manual.values())
    for r in got:
        at, d, s = manual[r["group"]][r["duration"]]
        assert (r["n_at_risk"], r["d"]) == (at, d)
        assert abs(r["survival"] - s) < 1e-9


def test_kaplan_meier_hits_zero_when_all_fail(spark):
    rows = [("a", t, 1) for t in (1, 2, 3)]
    df = spark.createDataFrame(rows, "group string, duration int, event int")
    got = {r["duration"]: r["survival"] for r in A.run_kaplan_meier(df).collect()}
    assert got[3] == 0.0 and got[1] > 0


def _logrank_manual(rows):
    """Exact multivariate logrank recomputed independently (k groups)."""
    groups = sorted({g for g, _, _ in rows})
    times = sorted({t for _, t, _ in rows})
    k = len(groups)
    d = np.zeros((len(times), k)); c = np.zeros((len(times), k))
    for g, t, e in rows:
        d[times.index(t), groups.index(g)] += e
        c[times.index(t), groups.index(g)] += 1
    n_g = c.sum(axis=0)
    at = n_g - np.vstack([np.zeros(k), np.cumsum(c, axis=0)[:-1]])
    Z = np.zeros(k); V = np.zeros((k, k))
    for i in range(len(times)):
        n_t, d_t = at[i].sum(), d[i].sum()
        if n_t <= 1 or d_t == 0:
            continue
        frac = at[i] / n_t
        Z += d[i] - d_t * frac
        V += (np.diag(frac) - np.outer(frac, frac)) * d_t * (n_t - d_t) / (n_t - 1)
    chi2 = float(Z[:-1] @ np.linalg.solve(V[:-1, :-1], Z[:-1]))
    return chi2


def test_logrank_matches_manual_and_separates(spark):
    rng = np.random.RandomState(21)
    rows = []
    for g, scale in [("a", 5.0), ("b", 15.0), ("c", 15.5)]:
        for _ in range(25):
            rows.append((g, int(rng.exponential(scale)) + 1,
                         int(rng.rand() < 0.8)))
    df = spark.createDataFrame(rows, "group string, duration int, event int")
    chi2, dof, p = A.logrank_test(df)
    assert dof == 2
    assert abs(chi2 - _logrank_manual(rows)) < 1e-9
    assert p < 0.01  # group a clearly separates
    # identical groups -> no signal
    same = [("a", t, e) for _, t, e in rows] + [("b", t, e) for _, t, e in rows]
    df2 = spark.createDataFrame(same, "group string, duration int, event int")
    chi2b, _, pb = A.logrank_test(df2)
    assert chi2b < 1e-9 and pb > 0.99


def test_factory_kaplan_meier_entry(spark):
    from ckg_spark.operators import analytics_factory as AF
    assert "kaplan_meier" in AF.available()
    assert "kaplan_meier" not in AF._UNSUPPORTED


# ---------------------------------------------------------------------------
# ssGSEA: closed-form aggregation vs the literal Barbie running-sum walk
# ---------------------------------------------------------------------------

def _ssgsea_naive(values_by_feature, gene_set, alpha=0.25):
    """Literal running-sum ssGSEA for one sample (Barbie et al. 2009)."""
    feats = sorted(values_by_feature, key=lambda f: (-values_by_feature[f], f))
    n = len(feats)
    in_set = [f in gene_set for f in feats]
    w = [(n - i) ** alpha for i in range(n)]  # rank r=i+1 -> (n-r+1)^alpha
    w_s = sum(wi for wi, h in zip(w, in_set) if h)
    n_miss = n - sum(in_set)
    es, p_hit, p_miss = 0.0, 0.0, 0.0
    for i in range(n):
        if in_set[i]:
            p_hit += w[i] / w_s
        else:
            p_miss += 1.0 / n_miss
        es += p_hit - p_miss
    return es


def test_ssgsea_matches_naive_walk(spark):
    rng = np.random.RandomState(17)
    feats = [f"g{i:02d}" for i in range(20)]
    sets = {"S1": set(feats[:5]), "S2": {feats[3], feats[9], feats[15]}}
    rows, expected = [], {}
    for subj in ["s1", "s2", "s3"]:
        vals = {f: float(rng.normal(0, 1)) for f in feats}
        rows += [(subj, f, v) for f, v in vals.items()]
        for sname, members in sets.items():
            expected[(subj, sname)] = _ssgsea_naive(vals, members)
    df = spark.createDataFrame(rows, "subject string, feature string, value double")
    ann = spark.createDataFrame(
        [(f, s) for s, ms in sets.items() for f in ms], "feature string, annotation string")
    got = A.run_ssgsea(df, ann, min_size=2).collect()
    assert len(got) == len(expected)
    es_vals = [r["es"] for r in got]
    rng_es = max(es_vals) - min(es_vals)
    for r in got:
        exp = expected[(r["subject"], r["annotation"])]
        assert abs(r["es"] - exp) < 1e-9, (r["subject"], r["annotation"], r["es"], exp)
        assert abs(r["nes"] - exp / rng_es) < 1e-9


def test_ssgsea_size_filter_and_signal(spark):
    # a set loaded with the top-expressed features must out-score a random one
    feats = [f"g{i:02d}" for i in range(30)]
    rows = [("s1", f, float(30 - i)) for i, f in enumerate(feats)]
    df = spark.createDataFrame(rows, "subject string, feature string, value double")
    ann_rows = [(f, "top") for f in feats[:5]] + [(f, "bottom") for f in feats[-5:]] \
        + [(feats[0], "tiny")]
    ann = spark.createDataFrame(ann_rows, "feature string, annotation string")
    got = {r["annotation"]: r["es"] for r in A.run_ssgsea(df, ann, min_size=2).collect()}
    assert "tiny" not in got  # size filter
    assert got["top"] > 0 > got["bottom"]


# ---------------------------------------------------------------------------
# repeated-measures correlation: identity checked against an independent
# numpy rendition of the ANCOVA definition (center within subject, Pearson,
# dof = N - k - 1, one-sided p)
# ---------------------------------------------------------------------------

def _rm_corr_naive(x, y, subjects):
    x, y, subjects = np.asarray(x, float), np.asarray(y, float), np.asarray(subjects)
    xc, yc = x.copy(), y.copy()
    for s in set(subjects):
        m = subjects == s
        xc[m] -= x[m].mean()
        yc[m] -= y[m].mean()
    r = np.corrcoef(xc, yc)[0, 1]
    dof = len(x) - len(set(subjects)) - 1
    t = r * math.sqrt(dof / (1 - r * r))
    return r, dof, 0.5 * ST.t_sf(abs(t), dof)


def test_rm_correlation_matches_naive(spark):
    rng = np.random.RandomState(8)
    rows = []
    data = {}
    for s in ["s1", "s2", "s3", "s4"]:
        base = rng.normal(0, 5)  # strong subject effect
        for m in range(6):
            smp = f"{s}_m{m}"
            common = rng.normal(0, 1)
            vals = {"fA": base + common + rng.normal(0, 0.3),
                    "fB": base + common + rng.normal(0, 0.3),
                    "fC": base + rng.normal(0, 1)}
            for f, v in vals.items():
                rows.append((s, smp, f, float(v)))
                data.setdefault(f, []).append((s, v))
    df = spark.createDataFrame(
        rows, "subject string, sample string, feature string, value double")
    got = {(r["node1"], r["node2"]): r for r in A.run_rm_correlation(df).collect()}
    assert set(got) == {("fA", "fB"), ("fA", "fC"), ("fB", "fC")}
    for (f1, f2), r in got.items():
        subs = [s for s, _ in data[f1]]
        exp_r, exp_dof, exp_p = _rm_corr_naive(
            [v for _, v in data[f1]], [v for _, v in data[f2]], subs)
        assert abs(r["weight"] - exp_r) < 1e-9
        assert r["dof"] == exp_dof
        assert abs(r["pvalue"] - exp_p) < 1e-9
    # the deliberately coupled pair must dominate
    assert got[("fA", "fB")]["weight"] > 0.7
    assert got[("fA", "fB")]["padj"] < 0.05 and bool(got[("fA", "fB")]["rejected"])


def test_with_global_cumsum_matches_numpy(spark):
    rng = np.random.RandomState(31)
    vals = rng.rand(500)
    df = spark.createDataFrame(
        [(float(v), i) for i, v in enumerate(vals)], "v double, i long")
    out = A.with_global_cumsum(df, [F.col("v").asc(), F.col("i").asc()],
                               "v", "csum").toPandas().sort_values(["v", "i"])
    exp = np.cumsum(np.array(sorted(vals)))
    np.testing.assert_allclose(out["csum"].to_numpy(), exp, rtol=1e-12)


def test_coexpression_modules_recover_blocks(spark):
    rng = np.random.RandomState(12)
    rows = []
    # two latent factors drive two disjoint feature blocks; f_noise floats free
    for si in range(20):
        l1, l2 = rng.normal(0, 1), rng.normal(0, 1)
        for f, base in [("a1", l1), ("a2", l1), ("a3", l1),
                        ("b1", l2), ("b2", l2)]:
            rows.append((f"s{si}", f, float(base + rng.normal(0, 0.1))))
        rows.append((f"s{si}", "f_noise", float(rng.normal(0, 1))))
    df = spark.createDataFrame(rows, "subject string, feature string, value double")
    mods = {r["feature"]: r["module"] for r in
            A.coexpression_modules(df, beta=6.0, adjacency_threshold=0.5).collect()}
    assert mods.get("a1") == mods.get("a2") == mods.get("a3") == "a1"
    assert mods.get("b1") == mods.get("b2") == "b1"
    assert "f_noise" not in mods  # singleton filtered


# ---------------------------------------------------------------------------
# SAM: q-value formula recomputed from the operator's own permutation pool
# ---------------------------------------------------------------------------

def test_samr_matches_independent_recompute(spark):
    rng = np.random.RandomState(6)
    rows = []
    for g in ["a", "b"]:
        for si in range(6):
            subj = f"{g}{si}"
            for fi in range(10):
                mu = 3.0 if (fi < 2 and g == "a") else 0.0
                rows.append((g, subj, f"f{fi}", float(rng.normal(mu, 1))))
    df = spark.createDataFrame(
        rows, "group string, subject string, feature string, value double")
    n_perm = 10
    out = A.run_samr(df, "a", "b", permutations=n_perm, seed=2).toPandas()

    # independent pandas recomputation of d, s0, the permutation pool and q
    pdf = df.toPandas()

    def d_stats(frame, s0):
        out_ = {}
        for f, g in frame.groupby("feature"):
            xa = g.loc[g["group"] == "a", "value"].to_numpy(float)
            xb = g.loc[g["group"] == "b", "value"].to_numpy(float)
            if len(xa) < 2 or len(xb) < 2:
                continue
            vp = ((len(xa)-1)*xa.var(ddof=1) + (len(xb)-1)*xb.var(ddof=1)) \
                / (len(xa)+len(xb)-2)
            se = math.sqrt(vp * (1/len(xa) + 1/len(xb)))
            out_[f] = (xa.mean() - xb.mean()) / (se + s0), se
        return out_

    s0 = float(np.median([se for _, se in d_stats(pdf, 0.0).values()]))
    obs = {f: d for f, (d, _) in d_stats(pdf, s0).items()}
    subj_groups = sorted(set(zip(pdf["subject"], pdf["group"])))
    subjects = [s for s, _ in subj_groups]
    groups = [g for _, g in subj_groups]
    pool = []
    for p in range(n_perm):
        prng = np.random.default_rng((2, p))
        perm = prng.permutation(len(groups))
        gmap = {subjects[i]: groups[perm[i]] for i in range(len(subjects))}
        shuffled = pdf.assign(group=pdf["subject"].map(gmap))
        pool += [abs(d) for f, (d, _) in d_stats(shuffled, s0).items()]
    pool = np.array(pool)
    got = out.set_index("feature")
    for f, d in obs.items():
        assert abs(got.loc[f, "d"] - d) < 1e-9
        q = min(((pool >= abs(d)).sum() / n_perm)
                / sum(1 for v in obs.values() if abs(v) >= abs(d)), 1.0)
        assert abs(got.loc[f, "qvalue"] - q) < 1e-9, (f, got.loc[f, "qvalue"], q)
    # the two true signals get the smallest q
    assert set(got["qvalue"].nsmallest(2).index) == {"f0", "f1"}


def test_bootstrap_effect_sizes_cover_truth(spark):
    rng = np.random.RandomState(15)
    rows = []
    for g, mu in [("a", 10.0), ("b", 7.0)]:
        for si in range(12):
            subj = f"{g}{si}"
            for fi in range(4):
                shift = 3.0 if fi == 0 else 0.0
                rows.append((g, subj, f"f{fi}",
                             float(rng.normal(mu if fi == 0 else 5.0, 0.5))))
    df = spark.createDataFrame(
        rows, "group string, subject string, feature string, value double")
    out = {r["feature"]: r for r in
           A.bootstrap_effect_sizes(df, "a", "b", n_boot=100, seed=3).collect()}
    f0 = out["f0"]
    assert 2.0 < f0["mean_diff"] < 4.0
    assert f0["ci_low"] > 1.5 and f0["ci_high"] < 4.5
    assert f0["ci_low"] < f0["mean_diff"] < f0["ci_high"]
    # null features: CI straddles zero
    f1 = out["f1"]
    assert f1["ci_low"] < 0 < f1["ci_high"]
    # deterministic for fixed seed
    again = {r["feature"]: r for r in
             A.bootstrap_effect_sizes(df, "a", "b", n_boot=100, seed=3).collect()}
    assert again["f0"]["ci_low"] == f0["ci_low"]
