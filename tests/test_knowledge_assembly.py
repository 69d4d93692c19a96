"""Knowledge assembly from analysis outputs (queries/knowledge_assembly.py,
reference knowledge.py:175-367)."""

import math

import pandas as pd

from ckg_spark.queries import knowledge_assembly as KA


def test_regulation_and_correlation(spark):
    reg = spark.createDataFrame(
        pd.DataFrame({"feature": ["P1", "P2", "group", "P1"]}))
    e1 = KA.knowledge_from_regulation(reg).toPandas()
    assert sorted(e1["obj"]) == ["P1", "P2"]  # meta cols dropped, distinct
    assert set(e1["pred"]) == {"is_regulated"} and set(e1["subj"]) == {"Regulated"}

    corr = spark.createDataFrame(pd.DataFrame({
        "node1": ["P1", "P1", "P3"], "node2": ["P2", "P3", "P4"],
        "weight": [0.9, -0.7, 0.1]}))
    e2 = KA.knowledge_from_correlation(corr, "Protein", "Protein", cutoff=0.5)
    got = e2.toPandas()
    assert len(got) == 2  # |0.1| below cutoff
    keep = spark.createDataFrame(pd.DataFrame({"id": ["P1", "P2"]}))
    e3 = KA.knowledge_from_correlation(corr, "Protein", "Protein",
                                       cutoff=0.5, keep=keep).toPandas()
    assert len(e3) == 1 and e3.iloc[0]["obj"] == "P2"


def test_associations_explode_and_enrichment(spark):
    assoc = spark.createDataFrame(pd.DataFrame({
        "Proteins": ["P1;P2", "P3"], "Disease": ["D1", "D2"],
        "score": [0.8, 0.4]}))
    e = KA.knowledge_from_associations(assoc, "Disease").toPandas()
    assert len(e) == 3
    assert set(zip(e["subj"], e["obj"])) == {("P1", "D1"), ("P2", "D1"), ("P3", "D2")}

    enrich = spark.createDataFrame(pd.DataFrame({
        "terms": ["pathA", "pathB"],
        "identifiers": ["P1,P2", "P3"],
        "padj": [0.01, 0.2],
        "rejected": [True, False]}))
    ee = KA.knowledge_from_enrichment(enrich, "Protein").toPandas()
    assert len(ee) == 2  # only the rejected term, exploded
    assert abs(ee["weight"].iloc[0] - (-math.log10(0.01) + 1)) < 1e-9


def test_edgelist_and_assembly(spark):
    el = spark.createDataFrame(pd.DataFrame({
        "s": ["'A'", "B"], "t": ["C", "D"], "w": [1.5, 2.5]}))
    e1 = KA.knowledge_from_edgelist(el, "Drug", "Protein", "s", "t",
                                    "targets", "w")
    got = e1.toPandas()
    assert sorted(got["subj"]) == ["A", "B"]  # quotes stripped

    corr = spark.createDataFrame(pd.DataFrame({
        "node1": ["A"], "node2": ["C"], "weight": [0.9]}))
    e2 = KA.knowledge_from_correlation(corr, "Drug", "Protein")
    nodes, edges = KA.assemble_knowledge(e1, e2)
    ep = edges.toPandas()
    np_ = nodes.toPandas().set_index("id")
    assert len(ep) == 3
    assert set(np_.index) == {"A", "B", "C", "D"}
    assert np_.loc["A", "type"] == "Drug"
    # duplicate (subj, pred, obj) across parts collapses to max weight
    dup = KA.knowledge_from_edgelist(el.limit(1), "Drug", "Protein", "s", "t",
                                     "targets", "w")
    _, edges2 = KA.assemble_knowledge(e1, dup)
    assert len(edges2.toPandas()) == 2


def test_wgcna_module_edges(spark):
    """knowledge_from_wgcna (reference knowledge.py:309): Regulated -> ME
    hub edges + ME -CONTAINS-> feature edges, plus cutoff-filtered
    module-trait correlates edges (round-3 verdict item 6)."""
    modules = spark.createDataFrame(pd.DataFrame({
        "feature": ["P1", "P2", "P3"],
        "module": ["P1", "P1", "P3"],
        "module_size": [2, 2, 1],
    }))
    mt = spark.createDataFrame(pd.DataFrame({
        "module": ["P1", "P3"], "trait": ["age", "bmi"],
        "corr": [0.6, 0.05]}))
    edges = KA.knowledge_from_wgcna(
        modules, entity2="Protein", module_trait_cor=mt, cutoff=0.2).toPandas()
    hub = edges[edges["pred"] == "has_module"]
    assert sorted(hub["obj"]) == ["MEP1", "MEP3"]
    assert set(hub["subj"]) == {"Regulated"} and set(hub["weight"]) == {5.0}
    contains = edges[edges["pred"] == "CONTAINS"]
    assert sorted(zip(contains["subj"], contains["obj"])) == [
        ("MEP1", "P1"), ("MEP1", "P2"), ("MEP3", "P3")]
    assert set(contains["obj_type"]) == {"Protein"}
    corr = edges[edges["pred"] == "correlates"]
    assert list(zip(corr["subj"], corr["obj"])) == [("MEP1", "age")]
    assert abs(corr.iloc[0]["weight"] - 0.6) < 1e-12

    # composes through assemble_knowledge: module nodes typed 'Module'
    nodes, e = KA.assemble_knowledge(
        KA.knowledge_from_wgcna(modules, entity2="Protein"))
    nd = {r["id"]: r["type"] for r in nodes.collect()}
    assert nd["MEP1"] == "Module" and nd["P2"] == "Protein"
