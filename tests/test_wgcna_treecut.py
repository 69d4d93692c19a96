"""WGCNA treecut path (analytics.coexpression_modules(method='treecut')):
TOM formula hand-checks + module recovery on a correlated-block fixture."""

import numpy as np
import pandas as pd
import pytest

from ckg_spark.operators import analytics as A


def test_tom_similarity_hand_computed():
    """Path graph b-a-c with a_ab = a_ac = 0.5, a_bc = 0:
    TOM_ab = (0 + 0.5)/(min(1, .5) + 1 - .5) = 0.5
    TOM_bc = (0.25 + 0)/(min(.5, .5) + 1 - 0) = 1/6 (shared neighbor a)."""
    Adj = np.array([[0.0, 0.5, 0.5],
                    [0.5, 0.0, 0.0],
                    [0.5, 0.0, 0.0]])
    tom = A.tom_similarity(Adj)
    assert tom[0, 1] == pytest.approx(0.5)
    assert tom[0, 2] == pytest.approx(0.5)
    assert tom[1, 2] == pytest.approx(1.0 / 6.0)
    assert np.allclose(np.diag(tom), 1.0)
    assert np.allclose(tom, tom.T)


def test_tom_isolated_node_zero_division_safe():
    Adj = np.zeros((2, 2))
    tom = A.tom_similarity(Adj)
    assert tom[0, 1] == 0.0 and tom[0, 0] == 1.0


def test_average_linkage_cut_respects_height():
    """Two tight pairs at distance 0.1, 0.9 apart: cut at 0.5 keeps the
    pairs separate; cut at 1.0 merges everything."""
    D = np.array([
        [0.0, 0.1, 0.9, 0.9],
        [0.1, 0.0, 0.9, 0.9],
        [0.9, 0.9, 0.0, 0.1],
        [0.9, 0.9, 0.1, 0.0]])
    low = A._average_linkage_cut(D, 0.5)
    assert sorted(map(tuple, low)) == [(0, 1), (2, 3)]
    high = A._average_linkage_cut(D, 1.0)
    assert sorted(map(tuple, high)) == [(0, 1, 2, 3)]


def _block_long(spark):
    """Two blocks of 3 co-regulated features + 1 noise feature over 10
    subjects (deterministic)."""
    rng = np.random.RandomState(21)
    base1, base2 = rng.randn(10) * 3, rng.randn(10) * 3
    rows = []
    for s in range(10):
        sid = f"s{s:02d}"
        for f in range(3):
            rows.append((sid, f"g1_f{f}", float(base1[s] + 0.01 * rng.randn())))
            rows.append((sid, f"g2_f{f}", float(base2[s] + 0.01 * rng.randn())))
        rows.append((sid, "noise", float(rng.randn())))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["subject", "feature", "value"]))


def test_treecut_recovers_blocks(spark):
    df = _block_long(spark)
    out = A.coexpression_modules(
        df, beta=6.0, method="treecut", cut_height=0.5,
        min_module_size=3).toPandas()
    mods = out.groupby("module")["feature"].apply(sorted).to_dict()
    assert sorted(map(tuple, mods.values())) == [
        ("g1_f0", "g1_f1", "g1_f2"), ("g2_f0", "g2_f1", "g2_f2")]
    assert "noise" not in set(out["feature"])          # grey: unassigned
    assert set(out["module_size"]) == {3}
    # deterministic across runs
    out2 = A.coexpression_modules(
        df, beta=6.0, method="treecut", cut_height=0.5,
        min_module_size=3).toPandas()
    pd.testing.assert_frame_equal(out, out2)


def test_treecut_guard(spark, monkeypatch):
    monkeypatch.setattr(A, "DRIVER_TOM_MAX_FEATURES", 2)
    with pytest.raises(ValueError, match="TOM"):
        A.coexpression_modules(_block_long(spark), method="treecut")


def test_factory_wgcna_treecut(spark):
    from ckg_spark.operators import analytics_factory as AF
    out = AF.generate_result("wgcna", _block_long(spark), method="treecut",
                             cut_height=0.5, min_module_size=3)
    assert out.count() == 6


def test_module_eigengenes_track_module_signal(spark):
    """Each module's eigengene must correlate almost perfectly with the
    shared base signal driving that module's features."""
    rng = np.random.RandomState(21)
    base1, base2 = rng.randn(10) * 3, rng.randn(10) * 3
    rows = []
    for s in range(10):
        sid = f"s{s:02d}"
        for f in range(3):
            rows.append((sid, f"g1_f{f}", float(base1[s] + 0.01 * rng.randn())))
            rows.append((sid, f"g2_f{f}", float(base2[s] + 0.01 * rng.randn())))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["subject", "feature", "value"]))
    mods = A.coexpression_modules(df, method="treecut", cut_height=0.5,
                                  min_module_size=3)
    mes = A.module_eigengenes(df, mods).toPandas()
    assert set(mes["module"]) == {"g1_f0", "g2_f0"}
    for module, base in (("g1_f0", base1), ("g2_f0", base2)):
        e = (mes[mes["module"] == module]
             .sort_values("subject")["eigengene"].to_numpy())
        r = np.corrcoef(e, base)[0, 1]
        assert abs(r) > 0.999
    # sign convention: aligned with average standardized expression
    # (deterministic across runs)
    mes2 = A.module_eigengenes(df, mods).toPandas()
    pd.testing.assert_frame_equal(
        mes.sort_values(["module", "subject"]).reset_index(drop=True),
        mes2.sort_values(["module", "subject"]).reset_index(drop=True))


def test_merge_close_modules(spark):
    """Two modules driven by the SAME signal merge; the independent one
    survives on its own."""
    rng = np.random.RandomState(5)
    shared, indep = rng.randn(12) * 3, rng.randn(12) * 3
    rows = []
    for s in range(12):
        sid = f"s{s:02d}"
        for f in range(2):
            rows.append((sid, f"a_f{f}", float(shared[s] + 0.01 * rng.randn())))
            rows.append((sid, f"b_f{f}", float(shared[s] + 0.01 * rng.randn())))
            rows.append((sid, f"c_f{f}", float(indep[s] + 0.01 * rng.randn())))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["subject", "feature", "value"]))
    mods = spark.createDataFrame(
        pd.DataFrame({"feature": ["a_f0", "a_f1", "b_f0", "b_f1",
                                  "c_f0", "c_f1"],
                      "module": ["a_f0", "a_f0", "b_f0", "b_f0",
                                 "c_f0", "c_f0"],
                      "module_size": [2] * 6}))
    merged = A.merge_close_modules(df, mods, me_diss_thres=0.25).toPandas()
    out = merged.groupby("module")["feature"].apply(sorted).to_dict()
    assert sorted(map(tuple, out.values())) == [
        ("a_f0", "a_f1", "b_f0", "b_f1"), ("c_f0", "c_f1")]
    sizes = merged.set_index("feature")["module_size"].to_dict()
    assert sizes["a_f0"] == 4 and sizes["c_f0"] == 2


def test_pick_soft_threshold_prefers_low_power_on_modular_net(spark):
    """Block-structured data reaches a scale-free-ish fit at a finite
    power; the returned power is one of the candidates and deterministic."""
    df = _block_long(spark)
    p = A.pick_soft_threshold(df, r2_cut=0.8)
    assert 1 <= p <= 19
    assert A.pick_soft_threshold(df, r2_cut=0.8) == p
    # an absurd cut falls back to the max candidate power
    assert A.pick_soft_threshold(df, r2_cut=2.0) == 19


def test_tune_s0_flattens_spread_and_matches_naive():
    """samr's s0 tuning: construct features whose d-spread depends on se
    when s0=0; the tuned s0 must (a) equal a naive reimplementation of the
    percentile/CV algorithm, (b) give a lower CV of binned d-MADs than
    s0=0."""
    rng = np.random.RandomState(9)
    n = 400
    se = np.exp(rng.randn(n) * 0.8)        # wide range of noise levels
    # d = r/(se + s0) has se-independent spread exactly at s0 = 0.5, so
    # the tuner should pick a candidate near 0.5, never 0
    r = rng.randn(n) * (se + 0.5) * 2.0
    s0 = A.tune_s0(r, se)
    assert 0.0 < s0 <= se.max()

    def cv_at(c):
        d = r / (se + c)
        qs = np.quantile(se, np.linspace(0, 1, 81))
        qs[-1] += 1e-12
        b = np.clip(np.searchsorted(qs, se, side="right") - 1, 0, 79)
        mads = np.array([
            np.median(np.abs(d[b == i] - np.median(d[b == i]))) / 0.64
            for i in range(80) if (b == i).sum() >= 2])
        return mads.std(ddof=1) / mads.mean()

    # naive independent recomputation of the selection over candidates
    cands = np.percentile(se, np.arange(0, 101, 5))
    n_bins = min(100, max(2, n // 5))
    qs = np.quantile(se, np.linspace(0, 1, n_bins + 1)); qs[-1] += 1e-12
    bin_of = np.clip(np.searchsorted(qs, se, side="right") - 1, 0, n_bins - 1)
    best, bestcv = cands[0], np.inf
    for c in cands:
        d = r / (se + c)
        mads = np.array([
            np.median(np.abs(d[bin_of == i] - np.median(d[bin_of == i]))) / 0.64
            for i in range(n_bins) if (bin_of == i).sum() >= 2])
        if mads.size < 2 or mads.mean() == 0:
            continue
        cv = mads.std(ddof=1) / mads.mean()
        if cv < bestcv - 1e-12:
            bestcv, best = cv, c
    assert s0 == pytest.approx(float(best))
    assert cv_at(s0) < cv_at(0.0)


def test_run_samr_tuned_s0(spark):
    rng = np.random.RandomState(3)
    rows = []
    for f in range(30):
        noise = float(np.exp(rng.randn() * 0.5))
        shift = 8.0 if f < 5 else 0.0
        for s in range(6):
            rows.append((f"f{f:02d}", f"sa{s}", "A",
                         float(shift + rng.randn() * noise)))
            rows.append((f"f{f:02d}", f"sb{s}", "B",
                         float(rng.randn() * noise)))
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["feature", "subject", "group", "value"]))
    out = A.run_samr(df, "A", "B", permutations=20, s0="tune").toPandas()
    assert len(out) == 30
    shifted = {f"f{i:02d}" for i in range(5)}
    q = out.set_index("feature")["qvalue"]
    # every shifted feature beats (or ties) every unshifted one
    assert q[list(shifted)].max() <= q[[f for f in q.index
                                        if f not in shifted]].min()


def test_samr_delta_table_matches_naive(spark):
    """samr's order-statistic delta banding (the previously declared-out
    piece of run_samr) against a from-scratch numpy recompute of
    samr.compute.delta.table + detec.slab: same sorted-d / expected-order-
    statistic slab cuts, called counts, permutation false counts and
    pi0-scaled FDRs at every delta in the grid."""
    rng = np.random.RandomState(17)
    n_feat, n_per, B, s0 = 40, 5, 15, 0.2
    rows = []
    for f in range(n_feat):
        shift = 5.0 if f < 6 else 0.0
        for s in range(n_per):
            rows.append((f"f{f:02d}", f"sa{s}", "A", float(shift + rng.randn())))
            rows.append((f"f{f:02d}", f"sb{s}", "B", float(rng.randn())))
    pdf = pd.DataFrame(rows, columns=["feature", "subject", "group", "value"])
    df = spark.createDataFrame(pdf)
    got = A.samr_delta_table(df, "A", "B", permutations=B, seed=4, s0=s0,
                             n_deltas=12).toPandas()
    assert len(got) == 12

    # ---- independent naive recompute ------------------------------------
    subj_groups = sorted({(r.subject, r.group) for r in pdf.itertuples()})
    subjects = [s for s, _ in subj_groups]
    groups = [g for _, g in subj_groups]
    wide = pdf.pivot(index="feature", columns="subject", values="value")
    wide = wide[subjects]
    feats = list(wide.index)
    vals = wide.to_numpy()

    def dstats(assign):
        a = np.array([g == "A" for g in assign])
        b = np.array([g == "B" for g in assign])
        ma, mb = vals[:, a].mean(1), vals[:, b].mean(1)
        va, vb = vals[:, a].var(1, ddof=1), vals[:, b].var(1, ddof=1)
        na, nb = a.sum(), b.sum()
        vp = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
        se = np.sqrt(vp * (1.0 / na + 1.0 / nb))
        return (ma - mb) / (se + s0)

    d_obs = dstats(groups)
    order = np.lexsort((feats, d_obs))
    d_sorted = d_obs[order]
    perm_d = []
    for p in range(B):
        prng = np.random.default_rng((4, p))
        perm = prng.permutation(len(groups))
        dp = dstats([groups[i] for i in perm])
        perm_d.append(dp)
        del dp
    perm_sorted = np.stack([
        dp[np.lexsort((feats, dp))] for dp in perm_d])
    dbar = perm_sorted.mean(axis=0)
    diff = d_sorted - dbar
    m = n_feat
    allperm = np.concatenate(perm_d)
    q25, q75 = np.percentile(allperm, [25, 75])
    pi0 = min(1.0, ((d_obs > q25) & (d_obs < q75)).sum() / (0.5 * m))
    deltas = np.linspace(0, np.abs(diff).max(), 12)
    for k, dl in enumerate(deltas):
        row = got.iloc[k]
        assert row["delta"] == pytest.approx(dl, abs=1e-9)
        upq = np.where((diff > dl) & (dbar > 0))[0]
        loq = np.where((dbar - d_sorted > dl) & (dbar < 0))[0]
        cutup = d_sorted[upq[0]] if len(upq) else None
        cutlow = d_sorted[loq[-1]] if len(loq) else None
        n_called = (m - upq[0] if len(upq) else 0) + (loq[-1] + 1 if len(loq) else 0)
        assert int(row["n_called"]) == n_called, (k, dl)
        if cutup is None:
            assert pd.isna(row["cutup"])
        else:
            assert row["cutup"] == pytest.approx(cutup, abs=1e-12)
        if cutlow is None:
            assert pd.isna(row["cutlow"])
        else:
            assert row["cutlow"] == pytest.approx(cutlow, abs=1e-12)
        nf = []
        for dp in perm_d:
            c = 0
            if cutup is not None:
                c += (dp > cutup).sum()
            if cutlow is not None:
                c += (dp < cutlow).sum()
            nf.append(float(c))
        assert row["n_false_med"] == pytest.approx(np.percentile(nf, 50), abs=1e-9)
        assert row["n_false_90"] == pytest.approx(np.percentile(nf, 90), abs=1e-9)
        want_fdr = pi0 * np.percentile(nf, 50) / n_called if n_called else 0.0
        assert row["fdr_med"] == pytest.approx(want_fdr, abs=1e-9)
        assert row["pi0"] == pytest.approx(pi0, abs=1e-12)
    # banding is monotone-ish: larger delta never calls more features
    assert (np.diff(got["n_called"].to_numpy()) <= 0).all()
