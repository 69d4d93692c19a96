"""Betweenness / closeness centrality (SURVEY.md §3.3 parity).

Reference: report_manager/knowledge.py:509-516 ranks knowledge-graph nodes
with nx.betweenness_centrality (normalized=False, source-sampled above 15k
nodes) and nx.closeness_centrality (wf_improved=True) on a DiGraph. A
driver-side nx graph cannot hold a 100-TB edge set, so both are re-expressed
as synchronized multi-source BFS in DataFrame joins:

- ``betweenness_centrality``: Brandes' algorithm run from ``n_samples``
  deterministic sources simultaneously — forward BFS accumulates shortest-
  path counts (sigma) per (source, node); the backward sweep walks BFS
  levels deepest-first, accumulating dependencies delta(v) =
  sum_w sigma_v/sigma_w * (1 + delta_w) over shortest-path DAG edges.
  Estimates are scaled by n/k exactly as networkx does for sampled sources.
  Cost contract: O(k * E) total join work, depth(graph) rounds; standard
  error of the estimate shrinks as 1/sqrt(k) (Brandes-Pich 2007) — callers
  pick k to trade cost for precision; k = all nodes gives the exact value.
- ``closeness_centrality``: one reverse-BFS per queried node (incoming
  distance, matching nx semantics on DiGraph), aggregated into the
  Wasserman-Faust-improved formula C(u) = (r/(n-1)) * (r/sum_d) with r =
  #nodes that reach u (excluding u).

Both are unweighted (hop) distances. The reference passes its co-mention
count as ``weight`` — i.e. treats a similarity score as a metric distance —
which nx interprets as weighted Dijkstra; that semantic is deliberately NOT
reproduced (documented divergence; hop distance is the standard choice for
mention graphs, and the reference's default rendering path hits the
unweighted branch whenever edges carry no weight attribute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ckpt import checkpoint_reset_stats as _ckpt


def _edge_pairs(edges: DataFrame, directed: bool) -> DataFrame:
    e = edges.select(F.col("subj").alias("a"), F.col("obj").alias("b")).where(
        F.col("a") != F.col("b")
    )
    if not directed:
        e = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    return e.distinct()


def _all_nodes(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("subj").alias("id"))
        .unionByName(edges.select(F.col("obj").alias("id")))
        .distinct()
    )


def _pick_sources(nodes: DataFrame, n_samples: int | None) -> DataFrame:
    """Deterministic 'sample': first k nodes in xxhash64 order (uniform over
    ids, stable across parallelism — no Math.random on the data path)."""
    if n_samples is None:
        return nodes
    return (
        nodes.orderBy(F.xxhash64("id").asc(), F.col("id").asc())
        .limit(n_samples)
    )


def _forward_bfs(pairs: DataFrame, sources: DataFrame,
                 max_hops: int) -> tuple[DataFrame, int]:
    """Multi-source BFS with shortest-path counting.

    Returns (visited, depth): visited = (src, id, dist, sigma) for every
    node reachable from each source (including the source at dist 0).
    """
    frontier = sources.select(
        F.col("id").alias("src"), F.col("id"), F.lit(1).cast("long").alias("sigma")
    )
    frontier = _ckpt(frontier)
    visited = frontier.withColumn("dist", F.lit(0))
    depth = 0
    for h in range(1, max_hops + 1):
        cand = (
            frontier.join(pairs, frontier["id"] == pairs["a"], "inner")
            .groupBy("src", F.col("b").alias("nid"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("nid", "id")
        )
        new = _ckpt(
            cand.join(visited.select("src", "id"), on=["src", "id"], how="left_anti")
        )
        if new.isEmpty():
            break
        depth = h
        visited = visited.unionByName(new.withColumn("dist", F.lit(h)))
        frontier = new
    return _ckpt(visited), depth


def betweenness_centrality(edges: DataFrame, n_samples: int | None = None,
                           directed: bool = True, max_hops: int = 30) -> DataFrame:
    """Brandes betweenness over (subj, obj) edges -> (id, betweenness).

    Exact when ``n_samples`` is None (every node a source); otherwise the
    sampled-source estimate scaled by n/k (nx's rescale for normalized=False
    with k < n). Nodes with zero accumulated dependency are returned with
    betweenness 0.0 so the output covers every vertex.
    """
    pairs = _edge_pairs(edges, directed)
    nodes = _all_nodes(edges)
    n_total = nodes.count()
    sources = _pick_sources(nodes, n_samples)
    k = n_samples if n_samples is not None and n_samples < n_total else n_total
    visited, depth = _forward_bfs(pairs, sources, max_hops)

    # backward sweep: deltas per BFS level, deepest first
    deltas_by_level: dict[int, DataFrame] = {}
    lvl = visited.where(F.col("dist") == depth).select(
        "src", "id", "sigma", F.lit(0.0).alias("delta"))
    deltas_by_level[depth] = _ckpt(lvl)
    acc = None
    for L in range(depth - 1, -1, -1):
        w_lvl = deltas_by_level.pop(L + 1)
        v_lvl = visited.where(F.col("dist") == L).select("src", "id", "sigma")
        contrib = (
            w_lvl.join(pairs, w_lvl["id"] == pairs["b"], "inner")
            .select(
                "src", F.col("a").alias("vid"),
                (F.lit(1.0) + F.col("delta")).alias("dw"),
                F.col("sigma").alias("sigma_w"),
            )
            .join(
                v_lvl.select("src", F.col("id").alias("vid"),
                             F.col("sigma").alias("sigma_v")),
                on=["src", "vid"], how="inner",
            )
            .groupBy("src", "vid")
            .agg(F.sum(F.col("sigma_v") / F.col("sigma_w") * F.col("dw")).alias("c"))
        )
        lvl = _ckpt(
            v_lvl.join(contrib.withColumnRenamed("vid", "id"), on=["src", "id"],
                       how="left")
            .select("src", "id", "sigma", F.coalesce("c", F.lit(0.0)).alias("delta"))
        )
        deltas_by_level[L] = lvl
        # a level's deltas are final once computed (shortest-path DAG edges
        # only go level L -> L+1 in unweighted BFS), so emit exactly once;
        # the deepest level has delta 0 and contributes nothing.
        part = lvl.where((F.col("id") != F.col("src")) & (F.col("delta") > 0)) \
            .select("id", "delta")
        acc = part if acc is None else acc.unionByName(part)

    # nx _rescale semantics: undirected unnormalized -> 0.5 (each unordered
    # (s,t) pair is counted from both ends); directed -> 1.0. Sampled runs
    # scale by n/k (the unbiased estimator; nx applies it for undirected and
    # quirkily skips it for directed unnormalized — we keep the estimator).
    scale = (0.5 if not directed else 1.0) * (
        float(n_total) / float(k) if k and k < n_total else 1.0)
    if acc is None:
        return nodes.withColumn("betweenness", F.lit(0.0))
    sums = acc.groupBy("id").agg(F.sum("delta").alias("raw"))
    return (
        nodes.join(sums, on="id", how="left")
        .select("id", (F.coalesce("raw", F.lit(0.0)) * F.lit(scale))
                .alias("betweenness"))
    )


def closeness_centrality(edges: DataFrame, targets: DataFrame | None = None,
                         directed: bool = True, max_hops: int = 30) -> DataFrame:
    """nx.closeness_centrality(wf_improved=True) analog -> (id, closeness).

    For each target u: reverse-BFS gives d(v, u) for all v that reach u;
    C(u) = (r/(n-1)) * (r/sum_d), r = #reachers excluding u. ``targets``
    limits the computation (each target costs one simultaneous BFS wave);
    None computes every node.
    """
    pairs = _edge_pairs(edges, directed)
    rev = pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    nodes = _all_nodes(edges)
    n_total = nodes.count()
    sources = targets.select("id").distinct() if targets is not None else nodes
    visited, _ = _forward_bfs(rev, sources, max_hops)
    stats = (
        visited.where(F.col("dist") > 0)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("r"), F.sum("dist").alias("sum_d"))
    )
    out = sources.join(stats.withColumnRenamed("src", "id"), on="id", how="left")
    if n_total <= 1:
        return out.select("id", F.lit(0.0).alias("closeness"))
    return out.select(
        "id",
        F.when(
            F.col("sum_d") > 0,
            (F.col("r") / F.lit(float(n_total - 1)))
            * (F.col("r") / F.col("sum_d")),
        ).otherwise(F.lit(0.0)).alias("closeness"),
    )
