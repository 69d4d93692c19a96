"""Property tests for the round-4 graph kernels: Brandes edge betweenness
cross-checked against an independent naive all-shortest-paths enumeration,
and affinity propagation always emitting a valid partition."""

import itertools

import numpy as np
from hypothesis import given, settings, strategies as st

from ckg_spark.operators import graph_algos as G


def _naive_edge_betweenness(adj: dict) -> dict:
    """Independent oracle: for every (s, t) pair enumerate ALL shortest
    paths by BFS layering + DFS back-walk; each edge's betweenness is the
    sum over pairs of (paths through edge / total paths) / 2 for
    undirected double counting (matching Brandes' normalization)."""
    nodes = sorted(adj)
    eb = {}
    for s, t in itertools.permutations(nodes, 2):
        # BFS from s
        dist = {s: 0}
        frontier = [s]
        while frontier:
            nxt = []
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        nxt.append(w)
            frontier = nxt
        if t not in dist:
            continue
        # enumerate all shortest s->t paths by walking back from t
        paths = []

        def back(v, suffix):
            if v == s:
                paths.append([s] + suffix)
                return
            for u in adj[v]:
                if dist.get(u, -1) == dist[v] - 1:
                    back(u, [v] + suffix)

        back(t, [])
        if not paths:
            continue
        share = 1.0 / len(paths)
        for p in paths:
            for a, b in zip(p, p[1:]):
                key = (a, b) if a < b else (b, a)
                eb[key] = eb.get(key, 0.0) + share
    return {k: v / 2.0 for k, v in eb.items()}


def _random_adj(edge_pairs):
    adj = {}
    for a, b in edge_pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=1, max_size=14))
def test_brandes_matches_naive_enumeration(pairs):
    adj = _random_adj([(f"n{a}", f"n{b}") for a, b in pairs])
    if not adj:
        return
    fast = G._edge_betweenness(adj)
    slow = _naive_edge_betweenness(adj)
    assert set(fast) == set(slow)
    for k in fast:
        assert abs(fast[k] - slow[k]) < 1e-9, (k, fast[k], slow[k])


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5),
              st.floats(0.5, 5.0, allow_nan=False)),
    min_size=1, max_size=10))
def test_affinity_propagation_partition_validity(spark_sess, pairs):
    import pandas as pd
    rows = [(f"n{a}", f"n{b}", w) for a, b, w in pairs if a != b]
    if not rows:
        return
    df = spark_sess.createDataFrame(
        pd.DataFrame(rows, columns=["subj", "obj", "weight"]))
    part = {r["id"]: r["community"]
            for r in G.affinity_propagation(df, weight_col="weight").collect()}
    nodes = {n for r in rows for n in r[:2]}
    assert set(part) == nodes                  # every node labeled
    for n, c in part.items():
        assert c in nodes                      # labels are member ids
        assert part[c] == c                    # label is its own community


import pytest


@pytest.fixture(scope="module")
def spark_sess(spark):
    """Alias the session fixture so @given args don't shadow it."""
    return spark


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1, max_size=30))
def test_triangle_counts_matches_bruteforce_property(spark_sess, pairs):
    """triangle_counts == itertools brute force on arbitrary small graphs
    (direction, duplicates, and self-loops must all be ignored)."""
    import pandas as pd
    df = spark_sess.createDataFrame(
        pd.DataFrame(pairs, columns=["subj", "obj"]))
    got = {r["id"]: r["triangles"] for r in G.triangle_counts(df).collect()}
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({x for e in es for x in e})
    expect = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for x in (a, b, c):
                expect[x] = expect.get(x, 0) + 1
    assert got == expect
