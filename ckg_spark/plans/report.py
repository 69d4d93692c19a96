"""Dataset report orchestration — the Spark analog of the reference's
report_manager Dataset.generate_report flow (reference:
ckg/report_manager/dataset.py:19-230 drives a YAML section config through
analytics_factory.Analysis; default analysis lists per omics type in
report_manager/config/proteomics.yml).

Scope: the ANALYSIS pipeline only — the reference's plot layer (plotly/Dash)
is a UI concern outside the engine (SURVEY.md scope note). Each section maps
to a DataFrame result, so a caller can materialize/store them exactly like
any other stage.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from ..operators import analytics as A
from ..operators import analytics_factory as AF

# the proteomics default (report_manager/config/proteomics.yml 'analyses'
# entries that are analysis- rather than viz-concerns): summary, CoV, PCA,
# ANOVA (+BH correction + THSD post-hoc, as the reference's run_anova does),
# correlation, up/down regulation enrichment
DEFAULT_PROTEOMICS_REPORT: dict[str, dict[str, Any]] = {
    "summary": {"analysis": "summary"},
    "coefficient_of_variation": {"analysis": "coefficient_of_variation"},
    "pca": {"analysis": "pca", "args": {"n_components": 2}},
    "anova": {"analysis": "anova_with_posthoc", "args": {"alpha": 0.05}},
    "correlation": {"analysis": "correlation", "args": {"min_n": 3}},
    "up_down_enrichment": {"analysis": "up_down_regulation_enrichment",
                           "needs": "annotations"},
}


# the longitudinal-proteomics default (report_manager/config/
# longitudinal_proteomics.yml): adds mixed ANOVA + repeated-measures
# correlation to the cross-sectional set (functional_pca / qcmarkers /
# publications_abstracts / ranking are viz- or knowledge-layer concerns)
DEFAULT_LONGITUDINAL_REPORT: dict[str, dict[str, Any]] = {
    "summary": {"analysis": "summary"},
    "coefficient_of_variation": {"analysis": "coefficient_of_variation"},
    "pca": {"analysis": "pca", "args": {"n_components": 2}},
    "mixed_anova": {"analysis": "mixed_anova"},
    "rm_correlation": {"analysis": "repeated_measurements_correlation"},
    "up_down_enrichment": {"analysis": "up_down_regulation_enrichment",
                           "needs": "annotations"},
}


def process_dataset(
    df: DataFrame,
    max_missing: float = 0.3,
    imputation_method: str = "distribution",
    shift: float = 1.8,
    nstd: float = 0.3,
    normalization_method: str | None = None,
) -> DataFrame:
    """Dataset.process_dataset analog (proteomics.yml 'args' block defaults:
    missing_max 0.3, imputation_method distribution, missing_shift 1.8,
    missing_nstd 0.30, normalize False). Long format in, long format out."""
    out = A.filter_by_missingness(df, max_missing=max_missing)
    if imputation_method == "distribution":
        out = A.impute_normal_distribution(out, shift=shift, nstd=nstd)
    elif imputation_method == "median":
        out = A.impute_group_median(out)
    elif imputation_method == "knn":
        out = A.impute_knn(out)
    if normalization_method == "median":
        out = A.normalize_median(out)
    elif normalization_method == "zscore":
        out = A.normalize_zscore(out)
    elif normalization_method == "quantile":
        out = A.normalize_quantile(out)
    return out


def _anova_with_posthoc(df: DataFrame, alpha: float = 0.05) -> DataFrame:
    """Reference run_anova semantics (analytics.py:1655-1718): per-feature
    one-way ANOVA, BH-adjusted p-values, THSD pairwise post-hoc joined on.
    Returns one row per (feature, group1, group2) pair with the feature's
    ANOVA stats + the pair's Tukey stats."""
    anova = A.bh_correction(A.run_anova(df), tiebreak=["feature"])
    thsd = A.run_thsd(df, alpha=alpha)
    return (
        thsd.join(
            anova.select(
                "feature", F.col("f").alias("anova_f"),
                F.col("pvalue").alias("anova_pvalue"),
                F.col("padj").alias("anova_padj"),
                F.col("rejected").alias("anova_rejected"),
            ),
            on="feature", how="left",
        )
    )


def generate_dataset_report(
    df: DataFrame,
    config: dict[str, dict[str, Any]] | None = None,
    annotations: DataFrame | None = None,
    preprocess: bool = True,
    **process_args: Any,
) -> dict[str, DataFrame]:
    """Run every configured section's analysis over the (optionally
    preprocessed) long table; returns {section: result DataFrame}.

    Sections flagged ``needs: annotations`` are skipped when no annotation
    table is supplied (mirrors the reference's behavior when an enrichment
    source is unconfigured). All results are lazy DataFrames — nothing
    executes until the caller materializes them, so Catalyst sees each
    section as an independent plan over the shared processed input.
    """
    cfg = config or DEFAULT_PROTEOMICS_REPORT
    data = process_dataset(df, **process_args) if preprocess else df
    report: dict[str, DataFrame] = {}
    regulation = None
    for section, spec in cfg.items():
        analysis = spec["analysis"]
        args = dict(spec.get("args", {}))
        if spec.get("needs") == "annotations":
            if annotations is None:
                continue
            if regulation is None:
                # regulation input for enrichment: the ANOVA feature table
                # with padj + a log2fc between the two extreme groups
                anova = A.bh_correction(A.run_anova(data), tiebreak=["feature"])
                gstats = data.groupBy("feature", "group").agg(
                    F.avg("value").alias("m"))
                fc = (
                    gstats.groupBy("feature")
                    .agg((F.max("m") - F.min("m")).alias("log2fc"))
                )
                regulation = anova.join(fc, on="feature", how="inner")
            report[section] = AF.generate_result(
                analysis, regulation, annotations=annotations, **args)
        elif analysis == "anova_with_posthoc":
            report[section] = _anova_with_posthoc(data, **args)
        else:
            report[section] = AF.generate_result(analysis, data, **args)
    return report
