"""Similarity Network Fusion (reference run_snf, analytics.py:3030, via
snfpy; algorithm: Wang et al., Nature Methods 2014 — reimplemented from the
published method, not the library).

Work split (same contract as logrank/ssGSEA): the data-scale part — pairwise
subject distances per omics over all features — runs distributed (one
self-join on feature + one aggregation per dataset); the fusion iterations
operate on S x S subject-affinity matrices (S = #samples, dictionary-scale
by definition of a cohort) on the driver with numpy, exactly where the
reference's snfpy runs them.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def pairwise_sq_distances(df: DataFrame) -> DataFrame:
    """(subj_a, subj_b, d2): squared-euclidean distance over shared features.

    Distributed: self-join on feature (one shuffle), algebraic sum
    aggregation per subject pair — never materializes per-subject vectors.
    """
    a = df.select("subject", "feature", F.col("value").alias("_va"))
    b = df.select(F.col("subject").alias("subj_b"), "feature",
                  F.col("value").alias("_vb"))
    return (
        a.withColumnRenamed("subject", "subj_a")
        .join(b, on="feature")
        .groupBy("subj_a", "subj_b")
        .agg(F.sum((F.col("_va") - F.col("_vb")) ** 2).alias("d2"))
    )


def _affinity(D: np.ndarray, k: int, mu: float) -> np.ndarray:
    """Scaled-exponential kernel with kNN-adaptive bandwidth (Wang 2014
    eq. 2-3): eps_ij = (mean d(i, kNN_i) + mean d(j, kNN_j) + d_ij) / 3."""
    n = D.shape[0]
    d = np.sqrt(np.maximum(D, 0.0))
    sorted_d = np.sort(d, axis=1)
    # mean distance to the k nearest OTHER subjects (col 0 is self = 0)
    kk = min(k, n - 1)
    mean_knn = sorted_d[:, 1:kk + 1].mean(axis=1)
    eps = (mean_knn[:, None] + mean_knn[None, :] + d) / 3.0
    eps = np.maximum(eps, 1e-12)
    W = np.exp(-(d ** 2) / (2.0 * (mu * eps) ** 2))
    return (W + W.T) / 2.0


def _full_kernel(W: np.ndarray) -> np.ndarray:
    """P: row-normalized full kernel with 1/2 self-mass (eq. 4)."""
    off = W - np.diag(np.diag(W))
    rs = off.sum(axis=1, keepdims=True)
    rs[rs == 0] = 1.0
    P = off / (2.0 * rs)
    np.fill_diagonal(P, 0.5)
    return P


def _knn_kernel(W: np.ndarray, k: int) -> np.ndarray:
    """S: row-normalized kNN-sparsified kernel (eq. 5)."""
    n = W.shape[0]
    S = np.zeros_like(W)
    kk = min(k, n - 1)
    for i in range(n):
        order = np.argsort(W[i])[::-1]
        nbrs = [j for j in order if j != i][:kk]
        S[i, nbrs] = W[i, nbrs]
    rs = S.sum(axis=1, keepdims=True)
    rs[rs == 0] = 1.0
    return S / rs


def snf_fuse(affinities: list[np.ndarray], k: int = 5, t: int = 10) -> np.ndarray:
    """Cross-diffusion fusion (eq. 6-7): P_v <- S_v @ mean(P_w, w!=v) @ S_v^T."""
    Ps = [_full_kernel(W) for W in affinities]
    Ss = [_knn_kernel(W, k) for W in affinities]
    m = len(Ps)
    for _ in range(t):
        new = []
        for v in range(m):
            others = (sum(Ps) - Ps[v]) / max(m - 1, 1)
            Pv = Ss[v] @ others @ Ss[v].T
            new.append((Pv + Pv.T) / 2.0)
        Ps = new
    fused = sum(Ps) / m
    # final row normalization + symmetrization, as the published method does
    fused = _full_kernel(fused)
    return (fused + fused.T) / 2.0


def _spectral_labels(A: np.ndarray, n_clusters: int, seed: int = 4) -> np.ndarray:
    """Normalized spectral clustering (Ng-Jordan-Weiss) + seeded k-means."""
    d = A.sum(axis=1)
    d[d == 0] = 1.0
    Dm = np.diag(1.0 / np.sqrt(d))
    L = Dm @ A @ Dm
    vals, vecs = np.linalg.eigh(L)
    X = vecs[:, -n_clusters:]
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    X = X / norms
    rng = np.random.default_rng(seed)
    centers = X[rng.choice(len(X), n_clusters, replace=False)]
    for _ in range(50):
        labels = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(-1).argmin(1)
        new_centers = np.array([
            X[labels == c].mean(axis=0) if (labels == c).any() else centers[c]
            for c in range(n_clusters)
        ])
        if np.allclose(new_centers, centers):
            break
        centers = new_centers
    return labels


def run_snf(dfs: dict[str, DataFrame], n_clusters: int = 2, k: int = 5,
            mu: float = 0.5, iterations: int = 10):
    """SNF over multiple long-format omics tables sharing subjects.

    Returns (fused_edges DataFrame (subj_a, subj_b, weight), labels
    DataFrame (subject, cluster)). Only subjects present in EVERY dataset
    participate (reference common_samples semantics, run_snf:3047).
    """
    spark = next(iter(dfs.values())).sparkSession
    common = None
    for d in dfs.values():
        s = d.select("subject").distinct()
        common = s if common is None else common.join(s, on="subject")
    subjects = sorted(r["subject"] for r in common.collect())
    si = {s: i for i, s in enumerate(subjects)}
    n = len(subjects)

    affinities = []
    for name in sorted(dfs):
        d = dfs[name].join(F.broadcast(common), on="subject")
        rows = pairwise_sq_distances(d).collect()
        D = np.zeros((n, n))
        for r in rows:
            D[si[r["subj_a"]], si[r["subj_b"]]] = r["d2"]
        affinities.append(_affinity(D, k, mu))

    fused = snf_fuse(affinities, k=k, t=iterations)
    labels = _spectral_labels(fused, n_clusters)

    edge_rows = [
        (subjects[i], subjects[j], float(fused[i, j]))
        for i in range(n) for j in range(i + 1, n)
    ]
    fused_df = spark.createDataFrame(
        edge_rows, "subj_a string, subj_b string, weight double")
    labels_df = spark.createDataFrame(
        [(subjects[i], int(labels[i])) for i in range(n)],
        "subject string, cluster int")
    return fused_df, labels_df
