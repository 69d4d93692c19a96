"""Project-level report + knowledge orchestration (plans/project.py)."""

import numpy as np
import pandas as pd

from ckg_spark.plans.project import run_project_report


def _omics(rng, n_feat=6, effect_feature="f0", groups=("a", "b"), n_sub=6):
    rows = []
    for g in groups:
        for s in range(n_sub):
            for i in range(n_feat):
                f = f"f{i}"
                mu = 3.0 if (f == effect_feature and g == "b") else 0.0
                rows.append((g, f"{g}{s}", f, float(rng.normal(mu, 0.5))))
    return pd.DataFrame(rows, columns=["group", "subject", "feature", "value"])


def test_project_report_sections_and_knowledge(spark):
    rng = np.random.default_rng(21)
    prot = spark.createDataFrame(_omics(rng, effect_feature="f0"))
    clin = spark.createDataFrame(_omics(rng, effect_feature="f1"))
    ann = spark.createDataFrame(pd.DataFrame({
        "feature": [f"f{i}" for i in range(6)],
        "annotation": ["pathX" if i < 3 else "pathY" for i in range(6)],
    }))
    res = run_project_report(
        {"proteomics": prot, "clinical": clin},
        annotations=ann, preprocess=False, corr_cutoff=0.9)

    assert set(res.reports) == {"proteomics", "clinical"}
    for rep in res.reports.values():
        assert {"summary", "coefficient_of_variation", "pca", "anova",
                "correlation"} <= set(rep)
    assert res.multiomics_correlation is not None
    assert res.knowledge_edges is not None

    edges = res.knowledge_edges.toPandas()
    # the injected effects must surface as regulation edges
    reg = edges[edges["pred"] == "is_regulated"]
    assert ("f0" in set(reg[reg["obj_type"] == "proteomics"]["obj"]))
    assert ("f1" in set(reg[reg["obj_type"] == "clinical"]["obj"]))
    # regulated features carry annotation edges
    ann_e = edges[edges["pred"] == "annotated_in"]
    assert "f0" in set(ann_e["subj"]) and "f1" in set(ann_e["subj"])
    # nodes table covers every endpoint
    nodes = set(res.knowledge_nodes.toPandas()["id"])
    assert set(edges["subj"]) | set(edges["obj"]) <= nodes


def test_project_single_dataset_no_multiomics(spark):
    rng = np.random.default_rng(22)
    prot = spark.createDataFrame(_omics(rng))
    res = run_project_report({"proteomics": prot}, preprocess=False)
    assert res.multiomics_correlation is None
    assert res.knowledge_edges.count() >= 0


def test_project_wgcna_section_feeds_knowledge(spark):
    """A config with a 'wgcna' section gets module edges in the assembled
    knowledge graph (reference generate_knowledge_from_wgcna wiring,
    round-3 verdict item 6)."""
    from ckg_spark.plans.report import DEFAULT_PROTEOMICS_REPORT

    rng = np.random.default_rng(23)
    prot = spark.createDataFrame(_omics(rng, n_feat=4))
    cfg = dict(DEFAULT_PROTEOMICS_REPORT)
    cfg["wgcna"] = {"analysis": "wgcna",
                    "args": {"beta": 2.0, "adjacency_threshold": 0.1,
                             "min_n": 3, "min_module_size": 2}}
    res = run_project_report({"proteomics": prot},
                             configs={"proteomics": cfg}, preprocess=False)
    assert "wgcna" in res.reports["proteomics"]
    edges = res.knowledge_edges.toPandas()
    contains = edges[edges["pred"] == "CONTAINS"]
    assert len(contains) > 0
    assert all(s.startswith("ME") for s in contains["subj"])
    hub = edges[edges["pred"] == "has_module"]
    assert set(hub["subj"]) == {"Regulated"}
    nodes = {r["id"]: r["type"] for r in res.knowledge_nodes.collect()}
    assert any(t == "Module" for t in nodes.values())
