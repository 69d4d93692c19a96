"""Project-level report orchestration — the Spark analog of the reference's
``Project.generate_report`` flow (ckg/report_manager/project.py:552-607):
per-dataset reports, a multi-omics correlation section when more than one
dataset is present, and the project knowledge graph assembled from every
dataset's analysis outputs.

Out of engine scope (UI/infra tails of the same file): Dash/cytoscape
rendering, Neo4j subgraph fetch for the similarity network, Slack/email
notification, report download packaging.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, functions as F

from ..operators import analytics as A
from ..queries import knowledge_assembly as KA
from .report import (DEFAULT_LONGITUDINAL_REPORT, DEFAULT_PROTEOMICS_REPORT,
                     generate_dataset_report)


@dataclass
class ProjectResult:
    reports: dict = field(default_factory=dict)        # dataset -> {section: DF}
    multiomics_correlation: DataFrame | None = None
    knowledge_nodes: DataFrame | None = None
    knowledge_edges: DataFrame | None = None


def run_project_report(
    datasets: dict[str, DataFrame],
    annotations: DataFrame | None = None,
    configs: dict[str, dict[str, Any]] | None = None,
    corr_cutoff: float = 0.5,
    alpha: float = 0.05,
    preprocess: bool = True,
) -> ProjectResult:
    """Generate every dataset's report, the cross-dataset correlation
    section (>= 2 datasets), and the assembled knowledge graph.

    Knowledge parts per dataset (the generate_knowledge composition,
    knowledge.py:283 + project.py:552): regulation hub edges from
    BH-rejected ANOVA features, correlation edges above ``corr_cutoff``
    from the report's correlation section, WGCNA module edges
    (knowledge_from_wgcna) when the section config includes 'wgcna', and
    annotation edges for regulated features when an annotations table is
    supplied. Dataset names containing 'longitudinal' take the longitudinal
    section config.
    """
    res = ProjectResult()
    knowledge_parts: list[DataFrame] = []
    processed: dict[str, DataFrame] = {}
    for name, df in datasets.items():
        cfg = (configs or {}).get(name)
        if cfg is None:
            cfg = (DEFAULT_LONGITUDINAL_REPORT if "longitudinal" in name
                   else DEFAULT_PROTEOMICS_REPORT)
        report = generate_dataset_report(
            df, config=cfg, annotations=annotations, preprocess=preprocess)
        res.reports[name] = report
        processed[name] = df

        anova = A.bh_correction(A.run_anova(df), tiebreak=["feature"])
        regulated = anova.where(F.col("rejected")).select("feature")
        knowledge_parts.append(
            KA.knowledge_from_regulation(regulated, entity=name))
        if "correlation" in report:
            corr = report["correlation"].select(
                F.col("fa").alias("node1"), F.col("fb").alias("node2"),
                F.col("corr").alias("weight"))
            knowledge_parts.append(KA.knowledge_from_correlation(
                corr, name, name, cutoff=corr_cutoff))
        if "wgcna" in report:
            knowledge_parts.append(
                KA.knowledge_from_wgcna(report["wgcna"], entity2=name))
        if annotations is not None:
            ann_edges = annotations.join(
                regulated, on="feature", how="left_semi"
            ).select(
                F.col("feature").cast("string").alias("subj"),
                F.lit("annotated_in").alias("pred"),
                F.col("annotation").cast("string").alias("obj"),
                F.lit(1.0).alias("weight"),
                F.lit(name).alias("subj_type"),
                F.lit("Annotation").alias("obj_type"),
            )
            knowledge_parts.append(ann_edges)

    if len(datasets) >= 2:
        res.multiomics_correlation = A.run_multi_correlation(processed)
        mo = res.multiomics_correlation.select(
            F.col("fa").alias("node1"), F.col("fb").alias("node2"),
            F.col("corr").alias("weight"))
        knowledge_parts.append(KA.knowledge_from_correlation(
            mo, "Multiomics", "Multiomics", cutoff=corr_cutoff))

    nodes, edges = KA.assemble_knowledge(*knowledge_parts)
    res.knowledge_nodes, res.knowledge_edges = nodes, edges
    return res
