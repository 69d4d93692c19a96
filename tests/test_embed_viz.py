"""t-SNE / UMAP / Mapper (operators/embed_viz.py) — the reference's three
viz-embedding analysis_types, implemented from the published algorithms.
Correctness bar: structure preservation on known fixtures (two separated
blobs stay separated; neighbors stay neighbors), exact determinism across
runs, and the Mapper nerve on a hand-checkable lens layout."""

import numpy as np
import pandas as pd
import pytest

from ckg_spark.operators import embed_viz as EV


def _blob_long(spark, n_per=12, dim=8, sep=50.0, seed=7):
    """Two tight gaussian blobs far apart in `dim`-D, long format."""
    rng = np.random.RandomState(seed)
    rows = []
    for b, center in enumerate([np.zeros(dim),
                                np.full(dim, sep / np.sqrt(dim))]):
        for i in range(n_per):
            v = center + rng.randn(dim)
            sid = f"b{b}_s{i:02d}"
            rows += [(sid, f"f{j:02d}", float(v[j])) for j in range(dim)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["subject", "feature", "value"]))


def _sep_ratio(emb: pd.DataFrame) -> float:
    """min inter-blob distance / max intra-blob distance in the embedding."""
    pts = {r["subject"]: np.array([r["x"], r["y"]]) for _, r in emb.iterrows()}
    a = [v for k, v in pts.items() if k.startswith("b0")]
    b = [v for k, v in pts.items() if k.startswith("b1")]
    inter = min(np.linalg.norm(x - y) for x in a for y in b)
    intra = max(max(np.linalg.norm(x - y) for x in a for y in a),
                max(np.linalg.norm(x - y) for x in b for y in b))
    return inter / max(intra, 1e-12)


def test_tsne_separates_blobs_and_is_deterministic(spark):
    df = _blob_long(spark)
    e1 = EV.run_tsne(df, perplexity=5.0).toPandas()
    e2 = EV.run_tsne(df, perplexity=5.0).toPandas()
    assert list(e1.columns) == ["subject", "x", "y"]
    assert len(e1) == 24
    assert _sep_ratio(e1) > 1.0           # blobs stay linearly separated
    pd.testing.assert_frame_equal(e1, e2)  # PCA init -> bit-deterministic


def test_tsne_perplexity_calibration_exact():
    """The per-row binary search must hit the target perplexity: check
    Shannon perplexity of each P row on a random matrix."""
    rng = np.random.RandomState(3)
    D = EV._pairwise_sq(rng.randn(30, 5))
    P = EV._perplexity_probs(D, perplexity=8.0)
    for i in range(30):
        p = P[i][P[i] > 0]
        H = -(p * np.log(p)).sum()
        assert abs(np.exp(H) - 8.0) < 0.01
    # rows are stochastic
    assert np.allclose(P.sum(axis=1), 1.0)


def test_umap_separates_blobs_and_is_deterministic(spark):
    df = _blob_long(spark)
    e1 = EV.run_umap(df, n_neighbors=6, n_epochs=150).toPandas()
    e2 = EV.run_umap(df, n_neighbors=6, n_epochs=150).toPandas()
    assert len(e1) == 24
    assert _sep_ratio(e1) > 1.0
    pd.testing.assert_frame_equal(e1, e2)


def test_umap_smooth_knn_hits_log2k():
    rng = np.random.RandomState(5)
    X = rng.randn(40, 6)
    D = np.sqrt(EV._pairwise_sq(X))
    order = np.argsort(D, axis=1)
    knn_d = np.take_along_axis(D, order[:, 1:9], axis=1)
    rho, sigma = EV._smooth_knn(knn_d, 8)
    for i in range(40):
        val = np.exp(-np.maximum(knn_d[i] - rho[i], 0) / sigma[i]).sum()
        assert abs(val - 3.0) < 1e-3      # log2(8) = 3
    assert (rho > 0).all()


def test_umap_ab_fit_matches_published_values():
    """umap-learn's documented (a, b) for its defaults: min_dist=0.1 ->
    a≈1.577, b≈0.895 (umap-learn find_ab_params)."""
    a, b = EV._fit_ab(0.1)
    assert abs(a - 1.577) < 0.05
    assert abs(b - 0.895) < 0.05


def test_isolation_scores_flag_outlier():
    """A point far from a tight cluster must get a clearly higher
    isolation score (shorter paths)."""
    rng = np.random.RandomState(11)
    X = np.vstack([rng.randn(60, 4), [[40, 40, 40, 40]]])
    s = EV.isolation_scores(X, n_trees=50, seed=1)
    assert s[-1] > s[:-1].max() + 0.1


def test_mapper_nodes_cover_and_nerve(spark):
    df = _blob_long(spark, n_per=10)
    nodes, links = EV.run_mapper(df, n_cubes=6, overlap=0.5, n_clusters=2)
    npdf = nodes.toPandas()
    covered = set().union(*[set(m) for m in npdf["members"]])
    assert len(covered) == 20             # every sample lands in >=1 node
    # the L2-norm lens separates the blobs -> no node mixes them
    for ms in npdf["members"]:
        blobs = {m[:2] for m in ms}
        assert len(blobs) == 1
    lpdf = links.toPandas()
    if len(lpdf):
        # links only ever connect same-blob nodes, with true shared counts
        mem = dict(zip(npdf["node_id"], npdf["members"]))
        for _, r in lpdf.iterrows():
            shared = set(mem[r["a"]]) & set(mem[r["b"]])
            assert len(shared) == r["shared"] > 0


def test_factory_dispatches_viz_embeddings(spark):
    from ckg_spark.operators import analytics_factory as AF
    df = _blob_long(spark, n_per=8)
    out = AF.generate_result("tsne", df, perplexity=4.0, n_iter=250)
    assert out.count() == 16
    out = AF.generate_result("umap", df, n_neighbors=5, n_epochs=100)
    assert out.count() == 16
    nodes = AF.generate_result("mapper", df, n_cubes=5)
    assert nodes.count() > 0
    assert "tsne" not in AF._UNSUPPORTED


def test_viz_guard_driver_threshold(spark, monkeypatch):
    monkeypatch.setattr(EV, "DRIVER_VIZ_MAX_SAMPLES", 5)
    df = _blob_long(spark, n_per=6)
    with pytest.raises(ValueError):
        EV.run_tsne(df)


def test_empty_and_tiny_inputs(spark):
    empty = spark.createDataFrame([], "subject string, feature string, value double")
    for fn in (EV.run_tsne, EV.run_umap):
        out = fn(empty)
        assert out.count() == 0
        assert out.columns == ["subject", "x", "y"]
    one = spark.createDataFrame(
        pd.DataFrame({"subject": ["s1"], "feature": ["f1"], "value": [1.0]}))
    assert EV.run_tsne(one).count() == 1     # n <= n_components -> zeros
    assert EV.run_umap(one).count() == 1
    nodes, links = EV.run_mapper(one)
    assert nodes.count() == 1 and links.count() == 0


def test_complete_linkage_matches_naive():
    """Lance-Williams complete linkage must produce the same partition as
    a brute-force agglomeration that rescans member pairs every merge."""
    def naive(M, k):
        D = EV._correlation_dist(M)
        clusters = [[i] for i in range(len(M))]
        while len(clusters) > k:
            best, bi, bj = np.inf, 0, 1
            for i in range(len(clusters)):
                for j in range(i + 1, len(clusters)):
                    d = max(D[p, q] for p in clusters[i] for q in clusters[j])
                    if d < best:
                        best, bi, bj = d, i, j
            clusters[bi] += clusters[bj]
            del clusters[bj]
        lab = np.zeros(len(M), dtype=int)
        for n, ms in enumerate(clusters):
            lab[ms] = n
        return lab

    rng = np.random.RandomState(13)
    for trial in range(5):
        M = rng.randn(12, 6)
        for k in (2, 3, 4):
            a = EV._complete_linkage_labels(M, k)
            b = naive(M, k)
            # same partition up to label renaming
            amap = {}
            for x, y in zip(a, b):
                assert amap.setdefault(x, y) == y, (a, b)
