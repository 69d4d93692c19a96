"""Distribution functions for the analytics operators (scipy-free).

The reference leans on scipy/statsmodels for t-tests/ANOVA/FDR
(ckg/analytics_core/analytics/analytics.py:1470-2260). This container has no
scipy, so the p-value plumbing is implemented here directly:

- regularized incomplete beta I_x(a,b) via the Lentz continued fraction
  (Numerical Recipes §6.4 formulation, public algorithm),
- Student-t and F survival functions in terms of I_x,
- Fisher exact (hypergeometric tail) via log-gamma sums.

All pure numpy/math on driver- or Arrow-batch-scale data (the per-feature
grouped UDFs), never per-row on the corpus.
"""

from __future__ import annotations

import math

import numpy as np


def _betacf(a: float, b: float, x: float, max_iter: int = 200,
            eps: float = 3e-12) -> float:
    """Continued fraction for the incomplete beta function."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < 1e-300:
        d = 1e-300
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < eps:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf(t: float, df: float) -> float:
    """Two-sided p-value for a Student-t statistic."""
    if df <= 0 or not math.isfinite(t):
        return float("nan")
    x = df / (df + t * t)
    return betainc(df / 2.0, 0.5, x)


def f_sf(f: float, df1: float, df2: float) -> float:
    """Upper-tail p-value for an F statistic."""
    if f <= 0 or df1 <= 0 or df2 <= 0:
        return 1.0
    x = df2 / (df2 + df1 * f)
    return betainc(df2 / 2.0, df1 / 2.0, x)


def welch_ttest(x: np.ndarray, y: np.ndarray) -> tuple[float, float, float]:
    """Welch two-sample t-test: (t, df, two-sided p)."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    x, y = x[~np.isnan(x)], y[~np.isnan(y)]
    nx, ny = len(x), len(y)
    if nx < 2 or ny < 2:
        return (float("nan"),) * 3
    vx, vy = x.var(ddof=1), y.var(ddof=1)
    sx, sy = vx / nx, vy / ny
    denom = math.sqrt(sx + sy)
    if denom == 0:
        return (float("nan"),) * 3
    t = (x.mean() - y.mean()) / denom
    df = (sx + sy) ** 2 / (sx**2 / (nx - 1) + sy**2 / (ny - 1))
    return t, df, t_sf(t, df)


def anova_oneway(groups: list[np.ndarray]) -> tuple[float, float, float, float]:
    """One-way ANOVA: (F, df_between, df_within, p)."""
    groups = [np.asarray(g, dtype=float) for g in groups]
    groups = [g[~np.isnan(g)] for g in groups]
    groups = [g for g in groups if len(g) > 0]
    k = len(groups)
    n = sum(len(g) for g in groups)
    if k < 2 or n <= k:
        return (float("nan"),) * 4
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    df1, df2 = k - 1, n - k
    if ssw == 0:
        return (float("inf"), df1, df2, 0.0)
    f = (ssb / df1) / (ssw / df2)
    return f, float(df1), float(df2), f_sf(f, df1, df2)


def _ln_comb(n: int, k: int) -> float:
    return math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)


def fisher_exact_greater(a: int, b: int, c: int, d: int) -> float:
    """One-sided (enrichment) Fisher exact p for table [[a,b],[c,d]]:
    P(X >= a) under hypergeometric with margins fixed."""
    n = a + b + c + d
    row1, col1 = a + b, a + c
    lo = max(0, row1 + col1 - n)
    hi = min(row1, col1)
    denom = _ln_comb(n, col1)
    p = 0.0
    for x in range(a, hi + 1):
        p += math.exp(_ln_comb(row1, x) + _ln_comb(n - row1, col1 - x) - denom)
    return min(p, 1.0)


def cohens_d(x: np.ndarray, y: np.ndarray) -> float:
    """Cohen's d with pooled std (reference: analytics.py:2522-2634)."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    x, y = x[~np.isnan(x)], y[~np.isnan(y)]
    nx, ny = len(x), len(y)
    if nx < 2 or ny < 2:
        return float("nan")
    pooled = math.sqrt(((nx - 1) * x.var(ddof=1) + (ny - 1) * y.var(ddof=1))
                       / (nx + ny - 2))
    if pooled == 0:
        return float("nan")
    return (x.mean() - y.mean()) / pooled


def ks_2samp(x: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """Two-sample Kolmogorov-Smirnov: (D, asymptotic p).

    p from the Kolmogorov distribution series Q(lambda) = 2 sum (-1)^(k-1)
    exp(-2 k^2 lambda^2) with the Stephens effective-n correction — the
    classic asymptotic form (reference analog: run_kolmogorov_smirnov,
    analytics.py:2256 via scipy).
    """
    x = np.sort(np.asarray(x, dtype=float))
    y = np.sort(np.asarray(y, dtype=float))
    nx, ny = len(x), len(y)
    if nx == 0 or ny == 0:
        return float("nan"), float("nan")
    data = np.concatenate([x, y])
    cdf_x = np.searchsorted(x, data, side="right") / nx
    cdf_y = np.searchsorted(y, data, side="right") / ny
    d = float(np.max(np.abs(cdf_x - cdf_y)))
    en = math.sqrt(nx * ny / (nx + ny))
    lam = (en + 0.12 + 0.11 / en) * d
    p = 0.0
    for k in range(1, 101):
        term = 2 * (-1) ** (k - 1) * math.exp(-2 * k * k * lam * lam)
        p += term
        if abs(term) < 1e-10:
            break
    return d, min(max(p, 0.0), 1.0)


def anova_two_way(values: np.ndarray, fa: np.ndarray, fb: np.ndarray):
    """Two-way ANOVA (balanced or mildly unbalanced, type-I SS on a
    factor-A-then-B ordering): returns dict of F/p for A, B, interaction
    (reference: run_two_way_anova, analytics.py:2894)."""
    values = np.asarray(values, dtype=float)
    fa = np.asarray(fa)
    fb = np.asarray(fb)
    ok = ~np.isnan(values)
    values, fa, fb = values[ok], fa[ok], fb[ok]
    n = len(values)
    la, lb = np.unique(fa), np.unique(fb)
    a, b = len(la), len(lb)
    if n == 0 or a < 2 or b < 2:
        return None
    grand = values.mean()
    ss_a = sum(
        (values[fa == l].mean() - grand) ** 2 * (fa == l).sum() for l in la
    )
    ss_b = sum(
        (values[fb == l].mean() - grand) ** 2 * (fb == l).sum() for l in lb
    )
    ss_w = 0.0
    ss_cells = 0.0
    for u in la:
        for v in lb:
            cell = values[(fa == u) & (fb == v)]
            if len(cell) == 0:
                continue
            ss_w += ((cell - cell.mean()) ** 2).sum()
            ss_cells += len(cell) * (cell.mean() - grand) ** 2
    ss_ab = max(ss_cells - ss_a - ss_b, 0.0)
    df_a, df_b = a - 1, b - 1
    df_ab = df_a * df_b
    df_w = n - a * b
    if df_w <= 0 or ss_w == 0:
        return None
    ms_w = ss_w / df_w
    ss_total = ss_a + ss_b + ss_ab + ss_w
    out = {}
    for name, ss, dfx in (("a", ss_a, df_a), ("b", ss_b, df_b),
                          ("ab", ss_ab, df_ab)):
        f = (ss / dfx) / ms_w if dfx > 0 else float("nan")
        out[f"f_{name}"] = f
        out[f"p_{name}"] = f_sf(f, dfx, df_w)
        # effect sizes appended the way the reference's eta_squared /
        # omega_squared decorate the aov table (analytics.py:2860-2876)
        out[f"eta_{name}"] = ss / ss_total if ss_total > 0 else float("nan")
        out[f"omega_{name}"] = (
            (ss - dfx * ms_w) / (ss_total + ms_w)
            if ss_total + ms_w > 0 else float("nan"))
    return out


# -- studentized range (Tukey HSD) --------------------------------------------

def _norm_pdf(z: np.ndarray) -> np.ndarray:
    return np.exp(-0.5 * z * z) / math.sqrt(2.0 * math.pi)


def _norm_cdf(z: np.ndarray) -> np.ndarray:
    return 0.5 * (1.0 + np.vectorize(math.erf)(z / math.sqrt(2.0)))


def _range_cdf(w: np.ndarray, k: int, z_nodes: int = 96) -> np.ndarray:
    """P(range of k iid N(0,1) <= w) = k * int phi(z) [Phi(z)-Phi(z-w)]^(k-1) dz.

    Gauss-Legendre over z in [-8, 8] (public formulation, cf. Gleason 1999 /
    the classical ptukey algorithm AS 190)."""
    x, wt = np.polynomial.legendre.leggauss(z_nodes)
    z = 8.0 * x  # scale [-1,1] -> [-8,8]
    phi = _norm_pdf(z)
    Phi = _norm_cdf(z)
    w = np.atleast_1d(np.asarray(w, dtype=float))
    inner = Phi[None, :] - _norm_cdf(z[None, :] - w[:, None])
    inner = np.clip(inner, 0.0, 1.0)
    vals = k * phi[None, :] * inner ** (k - 1)
    return np.clip((vals * wt[None, :]).sum(axis=1) * 8.0, 0.0, 1.0)


def tukey_sf(q, k: int, df: float, u_nodes: int = 64) -> np.ndarray:
    """Survival function of the studentized range Q(k, df): P(Q > q).

    Outer integral over the scale u = s/sigma with density
    f(u) = C * u^(df-1) exp(-df u^2 / 2), C = (df/2)^(df/2) * 2 / Gamma(df/2),
    evaluated by Gauss-Legendre on [0, u_max]; vectorized over q.
    """
    q = np.atleast_1d(np.asarray(q, dtype=float))
    if not np.isfinite(df) or df > 2000:
        return 1.0 - _range_cdf(q, k)
    # chi/sqrt(df) density: mode at sqrt((df-1)/df) <= 1; mass within ~[0, 1+8/sqrt(df)]
    u_max = 1.0 + 10.0 / math.sqrt(max(df, 1.0))
    x, wt = np.polynomial.legendre.leggauss(u_nodes)
    u = 0.5 * u_max * (x + 1.0)
    wu = 0.5 * u_max * wt
    log_c = 0.5 * df * math.log(df / 2.0) + math.log(2.0) - math.lgamma(df / 2.0)
    dens = np.exp(log_c + (df - 1.0) * np.log(u) - 0.5 * df * u * u)
    # cdf(q) = int f(u) * RangeCdf(q*u) du
    cdf = np.zeros_like(q)
    for ui, di, wi in zip(u, dens, wu):
        cdf += di * wi * _range_cdf(q * ui, k)
    out = np.clip(1.0 - cdf, 0.0, 1.0)
    out[~np.isfinite(q) | (q <= 0)] = 1.0
    return out


# -- ANCOVA / repeated-measures / mixed ANOVA kernels -------------------------

def _ols_rss(y: np.ndarray, X: np.ndarray) -> tuple[float, int]:
    """Residual sum of squares + model rank via lstsq."""
    beta, res, rank, _ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    return float(resid @ resid), int(rank)


def ancova_oneway(y: np.ndarray, groups: np.ndarray,
                  covs: np.ndarray) -> tuple[float, float, float, float] | None:
    """One-way ANCOVA: F-test of the group factor adjusting for covariates.

    Full model: intercept + group dummies + covariates; reduced: intercept +
    covariates. F = ((RSS_r - RSS_f)/(k-1)) / (RSS_f/(n - rank_f)).
    (Reference run_ancova, analytics.py:1774, fits the same linear model via
    pingouin/statsmodels OLS.)
    """
    y = np.asarray(y, dtype=float)
    ok = np.isfinite(y)
    if covs.ndim == 1:
        covs = covs[:, None]
    ok &= np.all(np.isfinite(covs), axis=1)
    y, groups, covs = y[ok], np.asarray(groups)[ok], covs[ok]
    n = len(y)
    levels = np.unique(groups)
    k = len(levels)
    if n < k + covs.shape[1] + 1 or k < 2:
        return None
    dummies = (groups[:, None] == levels[None, :-1]).astype(float)
    ones = np.ones((n, 1))
    X_full = np.hstack([ones, dummies, covs])
    X_red = np.hstack([ones, covs])
    rss_f, rank_f = _ols_rss(y, X_full)
    rss_r, _ = _ols_rss(y, X_red)
    df1 = k - 1
    df2 = n - rank_f
    if df2 <= 0 or rss_f <= 0:
        return None
    f = ((rss_r - rss_f) / df1) / (rss_f / df2)
    return f, float(df1), float(df2), f_sf(f, df1, df2)


def rm_anova(y: np.ndarray, subject: np.ndarray,
             within: np.ndarray) -> tuple[float, float, float, float] | None:
    """One-way repeated-measures ANOVA (balanced complete design).

    SS decomposition: total = subjects + conditions + error;
    F = MS_cond / MS_error, df = (k-1), (k-1)(n-1).
    (Reference calculate_repeated_measures_anova, analytics.py:1721, via
    pingouin.rm_anova.)
    """
    y = np.asarray(y, dtype=float)
    subject = np.asarray(subject)
    within = np.asarray(within)
    ok = np.isfinite(y)
    y, subject, within = y[ok], subject[ok], within[ok]
    subs, conds = np.unique(subject), np.unique(within)
    n, k = len(subs), len(conds)
    if n < 2 or k < 2 or len(y) != n * k:
        return None  # incomplete design: reference drops those features too
    grand = y.mean()
    ss_subj = k * sum((y[subject == s].mean() - grand) ** 2 for s in subs)
    ss_cond = n * sum((y[within == c].mean() - grand) ** 2 for c in conds)
    ss_tot = ((y - grand) ** 2).sum()
    ss_err = max(ss_tot - ss_subj - ss_cond, 0.0)
    df1 = k - 1
    df2 = (k - 1) * (n - 1)
    ms_err = ss_err / df2 if df2 > 0 else 0.0
    if ms_err <= 0:
        return None
    f = (ss_cond / df1) / ms_err
    return f, float(df1), float(df2), f_sf(f, df1, df2)


def mixed_anova_interaction(y: np.ndarray, subject: np.ndarray, within: np.ndarray,
                            between: np.ndarray) -> tuple[float, float, float, float] | None:
    """Split-plot (mixed) ANOVA, interaction term (balanced complete design).

    F_inter = MS(within x between) / MS(within x subject-within-group),
    df = (k-1)(g-1), (k-1)(N-g) with k within levels, g groups, N subjects.
    (Reference calculate_mixed_anova, analytics.py:1741, keeps only the
    'Interaction' source row — same here.)
    """
    y = np.asarray(y, dtype=float)
    subject, within, between = (np.asarray(a) for a in (subject, within, between))
    ok = np.isfinite(y)
    y, subject, within, between = y[ok], subject[ok], within[ok], between[ok]
    subs, conds, grps = np.unique(subject), np.unique(within), np.unique(between)
    N, k, g = len(subs), len(conds), len(grps)
    if N < 2 or k < 2 or g < 2 or len(y) != N * k:
        return None
    grand = y.mean()
    # cell means: (group, condition)
    ss_cells = 0.0
    ss_b = sum((y[between == gr].mean() - grand) ** 2 * (between == gr).sum()
               for gr in grps)
    ss_w = sum((y[within == c].mean() - grand) ** 2 * (within == c).sum()
               for c in conds)
    for gr in grps:
        for c in conds:
            cell = y[(between == gr) & (within == c)]
            if len(cell):
                ss_cells += len(cell) * (cell.mean() - grand) ** 2
    ss_inter = max(ss_cells - ss_b - ss_w, 0.0)
    # error: within x subject(group) = total - subjects(between-cells) - within - inter
    ss_subj = k * sum((y[subject == s].mean() - grand) ** 2 for s in subs)
    ss_tot = ((y - grand) ** 2).sum()
    ss_err = max(ss_tot - ss_subj - ss_w - ss_inter, 0.0)
    df1 = (k - 1) * (g - 1)
    df2 = (k - 1) * (N - g)
    if df2 <= 0:
        return None
    ms_err = ss_err / df2
    if ms_err <= 0:
        return None
    f = (ss_inter / df1) / ms_err
    return f, float(df1), float(df2), f_sf(f, df1, df2)


def _gammainc_q(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) via the classic series /
    continued-fraction split (Numerical-Recipes-style gammq; public
    algorithm, reimplemented)."""
    if x < 0 or a <= 0:
        return float("nan")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        # series for P(a,x); Q = 1 - P
        ap, summ, delt = a, 1.0 / a, 1.0 / a
        for _ in range(500):
            ap += 1.0
            delt *= x / ap
            summ += delt
            if abs(delt) < abs(summ) * 3e-14:
                break
        p = summ * math.exp(-x + a * math.log(x) - math.lgamma(a))
        return 1.0 - p
    # continued fraction for Q(a,x) (modified Lentz)
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < 3e-14:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def chi2_sf(x: float, df: float) -> float:
    """Upper-tail p-value of a chi-square statistic."""
    if not math.isfinite(x) or x < 0 or df <= 0:
        return float("nan")
    return _gammainc_q(df / 2.0, x / 2.0)


def cohens_d(x: np.ndarray, y: np.ndarray, ddof: int = 1) -> float:
    """The reference's ``cohens_d`` — the form ``power_analysis`` actually
    calls with ddof=1 (reference analytics.py:2574-2587, 2646): mean
    difference over the classic POOLED-BY-GROUP standard deviation
    sqrt(((n1-1)*var1 + (n2-1)*var2) / (n1+n2-2)) with var(ddof=1), and NO
    small-sample correction. Reimplemented from the published formula."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    x, y = x[~np.isnan(x)], y[~np.isnan(y)]
    n1, n2 = len(x), len(y)
    if n1 + n2 < 3 or n1 == 0 or n2 == 0:
        return float("nan")
    num = (n1 - 1) * float(np.var(x, ddof=1)) + (n2 - 1) * float(np.var(y, ddof=ddof))
    sd = math.sqrt(num / (n1 + n2 - 2))
    if sd == 0 or not math.isfinite(sd):
        return float("nan")
    return float((x.mean() - y.mean()) / sd)


def hedges_g(x: np.ndarray, y: np.ndarray, ddof: int = 1) -> float:
    """The reference's ``hedges_g`` function (reference analytics.py:2589-
    2637 — NOT the effect size power_analysis uses; that is ``cohens_d``
    above): effect size with the std of the CONCATENATED sample
    (``np.nanstd(concat, ddof)``, not the classic pooled-by-group form) and
    the small-sample Hedges bias correction applied when n1 + n2 < 50.
    Reimplemented from the published formula."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    x, y = x[~np.isnan(x)], y[~np.isnan(y)]
    n1, n2 = len(x), len(y)
    if n1 == 0 or n2 == 0:
        return float("nan")
    sd = float(np.concatenate([x, y]).std(ddof=ddof))
    if sd == 0 or not math.isfinite(sd):
        return float("nan")
    g = (float(x.mean()) - float(y.mean())) / sd
    n = n1 + n2
    if n < 50:
        g *= ((n - 3) / (n - 2.25)) * math.sqrt((n - 2) / n)
    return float(g)


def ncf_sf(x: float, df1: float, df2: float, nc: float) -> float:
    """Noncentral-F survival function via the Poisson-weighted
    incomplete-beta series:

        P(F <= x) = sum_j Pois(j; nc/2) * I_q(df1/2 + j, df2/2),
        q = df1*x / (df1*x + df2)

    Weights are evaluated in log space over the +-10-sigma window around the
    Poisson mode, so large noncentralities neither underflow nor truncate
    (tail mass outside the window < 1e-12)."""
    if x <= 0:
        return 1.0
    if nc <= 0:
        return f_sf(x, df1, df2)
    lam = nc / 2.0
    q = df1 * x / (df1 * x + df2)
    half = 10.0 * math.sqrt(lam) + 10.0
    j_lo = max(0, int(lam - half))
    j_hi = int(lam + half) + 1
    sf = 0.0
    for j in range(j_lo, j_hi + 1):
        lw = -lam + j * math.log(lam) - math.lgamma(j + 1)
        sf += math.exp(lw) * (1.0 - betainc(df1 / 2.0 + j, df2 / 2.0, q))
    return min(max(sf, 0.0), 1.0)


def f_isf(alpha: float, df1: float, df2: float) -> float:
    """Inverse survival function of the central F distribution (critical
    value), by bisection on ``f_sf`` (monotone decreasing)."""
    lo, hi = 0.0, 1.0
    for _ in range(200):
        if f_sf(hi, df1, df2) < alpha:
            break
        hi *= 2.0
    for _ in range(100):
        mid = (lo + hi) / 2.0
        if f_sf(mid, df1, df2) > alpha:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def ftest_anova_power(effect_size: float, nobs: float, alpha: float,
                      k_groups: int) -> float:
    """Power of the one-way ANOVA F test (the FTestAnovaPower.power
    contract the reference's power_analysis calls, analytics.py:2656):
    df1 = k-1, df2 = nobs-k, noncentrality = effect_size^2 * nobs."""
    df1 = k_groups - 1
    df2 = nobs - k_groups
    if df1 <= 0 or df2 <= 0:
        return float("nan")
    crit = f_isf(alpha, df1, df2)
    return ncf_sf(crit, df1, df2, effect_size * effect_size * nobs)


def solve_ftest_anova_nobs(effect_size: float, alpha: float, power: float,
                           k_groups: int) -> float:
    """Continuous total-sample-size solution of ftest_anova_power == power
    (the reference's ``analysis.solve_power`` call, analytics.py:2668);
    bisection — power is monotone increasing in nobs."""
    lo = float(k_groups) + 1e-6
    hi = float(k_groups) + 2.0
    for _ in range(60):
        if ftest_anova_power(effect_size, hi, alpha, k_groups) >= power:
            break
        hi *= 2.0
        if hi > 1e8:
            return float("inf")
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if ftest_anova_power(effect_size, mid, alpha, k_groups) < power:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def _norm_sf_scalar(z: float) -> float:
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def levene_test(groups: list, center: str = "median") -> tuple[float, float]:
    """Levene's test for equal variances (Brown-Forsythe with
    center='median', the scipy default the reference's
    check_equal_variances calls at analytics.py:861-871). Returns (W, p)."""
    zs = []
    for g in groups:
        g = np.asarray(g, dtype=float)
        g = g[~np.isnan(g)]
        if len(g) == 0:
            continue
        c = np.median(g) if center == "median" else g.mean()
        zs.append(np.abs(g - c))
    k = len(zs)
    n = sum(len(z) for z in zs)
    if k < 2 or n - k <= 0:
        return float("nan"), float("nan")
    zbar = np.concatenate(zs).mean()
    zbars = [z.mean() for z in zs]
    num = sum(len(z) * (zb - zbar) ** 2 for z, zb in zip(zs, zbars))
    den = sum(((z - zb) ** 2).sum() for z, zb in zip(zs, zbars))
    if den <= 0:
        return float("nan"), float("nan")
    w = (n - k) / (k - 1) * num / den
    return float(w), f_sf(w, k - 1, n - k)


def dagostino_k2(x: np.ndarray) -> tuple[float, float]:
    """D'Agostino-Pearson K^2 omnibus normality test: combined
    skewness (D'Agostino 1970) and kurtosis (Anscombe-Glynn 1983) z
    statistics, K^2 ~ chi2(2) under normality. Published closed forms,
    reimplemented; requires n >= 20.

    NOTE (documented divergence): the reference's check_normality
    (analytics.py:874-882) uses the Shapiro-Wilk statistic via scipy; this
    engine tests the same null hypothesis with the K^2 statistic (no W
    lookup tables needed) — p-values differ numerically, pass/fail
    decisions agree except near the boundary. Calibration is MC-verified
    in tests (uniform p under H0, power on skewed alternatives)."""
    x = np.asarray(x, dtype=float)
    x = x[~np.isnan(x)]
    n = len(x)
    if n < 20:
        return float("nan"), float("nan")
    m = x.mean()
    d = x - m
    m2 = (d ** 2).mean()
    if m2 <= 0:
        return float("nan"), float("nan")
    g1 = (d ** 3).mean() / m2 ** 1.5
    b2 = (d ** 4).mean() / m2 ** 2
    # skewness z (D'Agostino)
    y = g1 * math.sqrt(((n + 1) * (n + 3)) / (6.0 * (n - 2)))
    beta2 = (3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
             / ((n - 2.0) * (n + 5) * (n + 7) * (n + 9)))
    w2 = -1.0 + math.sqrt(2.0 * (beta2 - 1.0))
    delta = 1.0 / math.sqrt(0.5 * math.log(w2))
    alpha = math.sqrt(2.0 / (w2 - 1.0))
    y = y / alpha
    zs = delta * math.log(y + math.sqrt(y * y + 1.0))
    # kurtosis z (Anscombe-Glynn)
    eb2 = 3.0 * (n - 1) / (n + 1)
    vb2 = 24.0 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    xk = (b2 - eb2) / math.sqrt(vb2)
    sqrtbeta1 = (6.0 * (n * n - 5 * n + 2) / ((n + 7.0) * (n + 9))
                 * math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2.0) * (n - 3))))
    a = 6.0 + 8.0 / sqrtbeta1 * (2.0 / sqrtbeta1
                                 + math.sqrt(1.0 + 4.0 / sqrtbeta1 ** 2))
    term1 = 1.0 - 2.0 / (9.0 * a)
    denom = 1.0 + xk * math.sqrt(2.0 / (a - 4.0))
    term2 = math.copysign(abs((1.0 - 2.0 / a) / abs(denom)) ** (1.0 / 3.0), denom)
    zk = (term1 - term2) / math.sqrt(2.0 / (9.0 * a))
    k2 = zs * zs + zk * zk
    return float(k2), chi2_sf(k2, 2.0)
