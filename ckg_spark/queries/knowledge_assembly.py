"""Knowledge-graph assembly from analysis outputs — the Spark rendition of
the reference's ``Knowledge.generate_knowledge_from_*`` family
(ckg/report_manager/knowledge.py:175-367), which walks pandas rows to build
viz-graph dicts. Here each source becomes a distributed select/explode/
filter producing a standard edge table

    (subj string, pred string, obj string, weight double,
     subj_type string, obj_type string)

and ``assemble_knowledge`` unions + dedups the parts and derives the node
table — the report's "knowledge graph" minus the UI attributes (colors /
widths are plotting concerns, declared viz scope).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

EDGE_SCHEMA = ("subj string, pred string, obj string, weight double, "
               "subj_type string, obj_type string")


def _edges(df: DataFrame, subj, pred: str, obj, weight,
           subj_type: str, obj_type: str) -> DataFrame:
    return df.select(
        subj.cast("string").alias("subj"), F.lit(pred).alias("pred"),
        obj.cast("string").alias("obj"), weight.cast("double").alias("weight"),
        F.lit(subj_type).alias("subj_type"), F.lit(obj_type).alias("obj_type"),
    )


def knowledge_from_regulation(regulated: DataFrame, entity: str = "Protein",
                              id_col: str = "feature") -> DataFrame:
    """generate_knowledge_from_regulation (knowledge.py:175): every
    regulated identifier hangs off the 'Regulated' hub with weight 1."""
    ids = regulated.select(id_col).where(
        ~F.col(id_col).isin(["sample", "group", "subject"])).distinct()
    return _edges(ids, F.lit("Regulated"), "is_regulated", F.col(id_col),
                  F.lit(1.0), "Group", entity)


def knowledge_from_correlation(corr: DataFrame, entity1: str, entity2: str,
                               cutoff: float = 0.5,
                               keep: DataFrame | None = None) -> DataFrame:
    """genreate_knowledge_from_correlation (knowledge.py:187): |weight| >=
    cutoff edges between nodes, optionally restricted to a keep-list
    (broadcast semi-join on BOTH endpoints, the reference's ``filter``)."""
    e = corr.where(F.abs(F.col("weight")) >= cutoff)
    if keep is not None:
        k = F.broadcast(keep.select(F.col(keep.columns[0]).alias("_k")).distinct())
        e = (e.join(k, on=e["node1"] == k["_k"], how="left_semi")
             .join(k, on=e["node2"] == k["_k"], how="left_semi"))
    return _edges(e, F.col("node1"), "correlates", F.col("node2"),
                  F.col("weight"), entity1, entity2)


def knowledge_from_interactions(df: DataFrame, entity: str) -> DataFrame:
    """generate_knowledge_from_interactions (knowledge.py:244):
    (node1, node2, score) -> interacts_with."""
    return _edges(df, F.col("node1"), "interacts_with", F.col("node2"),
                  F.col("score"), entity, entity)


def knowledge_from_associations(df: DataFrame, entity: str,
                                entity_col: str | None = None) -> DataFrame:
    """generate_knowledge_from_associations (knowledge.py:203): the
    ';'-packed Proteins column explodes against the association entity;
    missing score defaults to 1.0."""
    entity_col = entity_col or entity
    score = (F.col("score") if "score" in df.columns else F.lit(1.0))
    ex = df.select(
        F.explode(F.split(F.col("Proteins"), ";")).alias("_p"),
        F.col(entity_col).alias("_e"), score.alias("_s"),
    ).where(F.col("_p") != "")
    return _edges(ex, F.col("_p"), "associated_with", F.col("_e"),
                  F.col("_s"), "Protein", entity)


def knowledge_from_enrichment(enrich: DataFrame, entity: str,
                              annotation_entity: str = "Pathway") -> DataFrame:
    """generate_knowledge_from_enrichment (knowledge.py:255): rejected
    (significant) terms fan out over their ','-packed identifiers;
    weight = -log10(padj) + 1."""
    sig = enrich.where(F.col("rejected"))
    ex = sig.select(
        F.explode(F.split(F.col("identifiers"), ",")).alias("_i"),
        F.col("terms").alias("_t"),
        (-F.log10(F.col("padj")) + 1).alias("_w"),
    ).where(F.col("_i") != "")
    return _edges(ex, F.col("_i"), "annotated_in", F.col("_t"),
                  F.col("_w"), entity, annotation_entity)


def knowledge_from_wgcna(modules: DataFrame, entity2: str,
                         module_trait_cor: DataFrame | None = None,
                         entity1: str = "Clinical_variable",
                         cutoff: float = 0.2) -> DataFrame:
    """generate_knowledge_from_wgcna (knowledge.py:309): the co-expression
    module edges — 'Regulated' hub -> ME<module> (weight 5), ME<module>
    -CONTAINS-> feature (weight 5, the reference's features_per_module
    walk), plus module—trait 'correlates' edges with |corr| >= cutoff when
    a module_trait_cor table (module, trait, corr) is supplied. Input
    ``modules`` is ``coexpression_modules`` output (feature, module, ...);
    the reference's modColor becomes the deterministic module label.
    Colors/widths are viz scope-outs, as with the rest of this module."""
    me = F.concat(F.lit("ME"), F.col("module").cast("string"))
    hub = _edges(modules.select("module").distinct(),
                 F.lit("Regulated"), "has_module", me,
                 F.lit(5.0), "Group", "Module")
    contains = _edges(modules, me, "CONTAINS", F.col("feature"),
                      F.lit(5.0), "Module", entity2)
    out = hub.unionByName(contains)
    if module_trait_cor is not None:
        mt = module_trait_cor.where(F.abs(F.col("corr")) >= cutoff)
        out = out.unionByName(_edges(
            mt, F.concat(F.lit("ME"), F.col("module").cast("string")),
            "correlates", F.col("trait"), F.col("corr"), "Module", entity1))
    return out


def knowledge_from_edgelist(df: DataFrame, entity1: str, entity2: str,
                            source: str, target: str, rtype: str,
                            weight: str) -> DataFrame:
    """generate_knowledge_from_edgelist (knowledge.py:333): generic
    edge-list adapter (the reference also strips stray quotes)."""
    clean = lambda c: F.regexp_replace(F.col(c).cast("string"), "'", "")
    return _edges(df, clean(source), rtype, clean(target),
                  F.col(weight), entity1, entity2)


def assemble_knowledge(*edge_parts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """generate_knowledge_from_dataframes analog: union the per-source edge
    tables (last-wins in the reference's dict-update becomes max-weight per
    (subj, pred, obj) — deterministic under any parallelism) and derive the
    node table from the endpoints. Returns (nodes, edges)."""
    if not edge_parts:
        raise ValueError("no edge parts")
    edges = reduce(lambda a, b: a.unionByName(b), edge_parts)
    edges = edges.groupBy("subj", "pred", "obj").agg(
        F.max("weight").alias("weight"),
        F.max("subj_type").alias("subj_type"),
        F.max("obj_type").alias("obj_type"),
    )
    nodes = (
        edges.select(F.col("subj").alias("id"), F.col("subj_type").alias("type"))
        .unionByName(
            edges.select(F.col("obj").alias("id"), F.col("obj_type").alias("type")))
        .groupBy("id").agg(F.max("type").alias("type"))
    )
    return nodes, edges
