"""Query-side graph algorithms over the nodes/edges tables.

Reference analogs: knowledge-graph summarization with networkx centrality
(ckg/report_manager/knowledge.py:501-530 — betweenness/closeness/pagerank/
degree, top-15 by rank), the degree<200 hot-node guard
(report_manager/queries/datasets_cypher.yml:180), co-mention 2-hop joins
(datasets_cypher.yml:224-232), and k-hop Cypher paths (datasets_cypher.yml:13-15).

All are iterative/stacked DataFrame joins; PageRank is power iteration with
the dangling-mass correction, deterministic under any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """(id, out_degree, in_degree, degree) from the edge table."""
    o = edges.groupBy(F.col("subj").alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))
    i = edges.groupBy(F.col("obj").alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))
    return (
        o.join(i, on="id", how="full")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def top_k_by_degree(edges: DataFrame, k: int = 15) -> DataFrame:
    """Reference's top-N central-node selection (knowledge.py:520-527),
    degree flavor; deterministic tie-break on id."""
    return degrees(edges).orderBy(F.col("degree").desc(), F.col("id").asc()).limit(k)


def hot_node_filtered_edges(edges: DataFrame, max_degree: int = 200) -> DataFrame:
    """The reference's degree-guard join (datasets_cypher.yml:180): drop
    edges whose subject exceeds max_degree. Pre-aggregated degree is
    broadcast back — the skew guard pattern the north rule asks for."""
    deg = edges.groupBy("subj").agg(F.count(F.lit(1)).alias("d"))
    keep = deg.where(F.col("d") < max_degree).select("subj")
    return edges.join(F.broadcast(keep), on="subj", how="left_semi")


def pagerank(edges: DataFrame, iters: int = 10, damping: float = 0.85,
             checkpoint_every: int = 4) -> DataFrame:
    """Power-iteration PageRank over (subj -> obj) edges. Returns (id, rank).

    Dangling mass is redistributed uniformly each round so ranks sum to ~1.
    groupBy-sum is algebraic (map-side combined) — hub nodes don't skew the
    shuffle; localCheckpoint bounds plan growth.
    """
    verts = (
        edges.select(F.col("subj").alias("id"))
        .unionByName(edges.select(F.col("obj").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))

    out_deg = edges.groupBy("subj").agg(F.count(F.lit(1)).alias("odeg"))
    links = edges.select("subj", "obj").join(out_deg, on="subj")
    ranks = verts.withColumn("rank", F.lit(1.0 / n))

    for it in range(iters):
        contribs = (
            links.join(ranks.withColumnRenamed("id", "subj"), on="subj")
            .select("obj", (F.col("rank") / F.col("odeg")).alias("c"))
            .groupBy("obj")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = (
            ranks.join(out_deg.withColumnRenamed("subj", "id"), on="id", how="left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            verts.join(contribs.withColumnRenamed("obj", "id"), on="id", how="left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias("rank"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def k_hop(edges: DataFrame, seeds: DataFrame, hops: int = 2,
          pred_filter: list[str] | None = None) -> DataFrame:
    """Vertices reachable from ``seeds`` (column ``id``) within ``hops``
    undirected hops — the Cypher path-expansion analog (one self-join per
    hop, with predicate pushdown per hop)."""
    e = edges
    if pred_filter:
        e = e.where(F.col("pred").isin(pred_filter))
    sym = (
        e.select(F.col("subj").alias("a"), F.col("obj").alias("b"))
        .unionByName(e.select(F.col("obj").alias("a"), F.col("subj").alias("b")))
        .distinct()
    )
    frontier = seeds.select(F.col("id")).distinct()
    visited = frontier.withColumn("hop", F.lit(0))
    for h in range(1, hops + 1):
        nxt = (
            sym.join(frontier.withColumnRenamed("id", "a"), on="a")
            .select(F.col("b").alias("id"))
            .distinct()
            .join(visited.select("id"), on="id", how="left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt.withColumn("hop", F.lit(h)))
        frontier = nxt
    return visited


def comentioned_with(edges: DataFrame, entity_id: str, k: int = 10) -> DataFrame:
    """Entities co-mentioned with a given entity, by co-mention weight
    (datasets_cypher.yml:224-232 analog over materialized co-mention edges)."""
    co = edges.where(F.col("pred") == "CO_MENTIONED_WITH")
    left = co.where(F.col("subj") == entity_id).select(
        F.col("obj").alias("other"), "score"
    )
    right = co.where(F.col("obj") == entity_id).select(
        F.col("subj").alias("other"), "score"
    )
    return (
        left.unionByName(right)
        .groupBy("other")
        .agg(F.sum("score").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("other").asc())
        .limit(k)
    )


def label_propagation(edges: DataFrame, iters: int = 5) -> DataFrame:
    """Community detection by synchronous label propagation (the Spark
    analog of the reference's louvain partitions, analytics.py:2793).
    Deterministic: ties broken by min label."""
    sym = (
        edges.select(F.col("subj").alias("a"), F.col("obj").alias("b"))
        .unionByName(edges.select(F.col("obj").alias("a"), F.col("subj").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for _ in range(iters):
        # neighbor votes + a self-vote (damps the oscillation synchronous LPA
        # exhibits on bipartite/path structures)
        votes = sym.join(labels.withColumnRenamed("id", "b"), on="b").select("a", "label")
        self_votes = labels.select(F.col("id").alias("a"), "label")
        counts = (
            votes.unionByName(self_votes)
            .groupBy("a", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("a").orderBy(F.col("cnt").desc(), F.col("label").asc())
        labels = (
            counts.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(F.col("a").alias("id"), "label")
            .localCheckpoint(eager=True)
        )
    return labels
