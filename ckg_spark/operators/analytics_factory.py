"""Analysis dispatcher (reference: ckg/analytics_core/analytics_factory.py
:79-703 — the ``analysis_type`` string -> function map behind the report
pipeline). Same lookup surface over the Spark operators; unsupported tails
raise with the reference name so callers see exactly what is and isn't
covered (cf. COVERAGE.md §2.11).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

from . import analytics as A

_DISPATCH: dict[str, Callable[..., DataFrame]] = {
    # reshaping
    "wide_format": lambda df, **kw: A.to_wide(df, **kw),
    "long_format": lambda df, **kw: A.to_long(df, **kw),
    # missing data / imputation
    "missing_stats": lambda df, **kw: A.missing_stats(df),
    "imputation_median": lambda df, **kw: A.impute_group_median(df),
    "imputation_normal_distribution": lambda df, **kw: A.impute_normal_distribution(df, **kw),
    "imputation_knn": lambda df, **kw: A.impute_knn(df, **kw),
    # normalization / batch correction
    "batch_correction": lambda df, **kw: A.combat_batch_correction(df, **kw),
    "normalization_median": lambda df, **kw: A.normalize_median(df, **kw),
    "normalization_zscore": lambda df, **kw: A.normalize_zscore(df, **kw),
    "normalization_quantile": lambda df, **kw: A.normalize_quantile(df, **kw),
    "normalization": lambda df, **kw: A.normalize_data(df, **kw),
    "normalization_per_group": lambda df, **kw: A.normalize_data_per_group(df, **kw),
    "qc_markers": lambda df, qc_markers=None, **kw: (
        A.run_qc_markers_analysis(df, qc_markers, **kw)),
    # reference-literal spelling (analytics_factory.py:286)
    "qcmarkers": lambda df, qc_markers=None, **kw: (
        A.run_qc_markers_analysis(df, qc_markers, **kw)),
    "ranking_with_markers": lambda df, list_markers=None, **kw: (
        A.get_ranking_with_markers(df, list_markers or [], **kw)),
    # summaries
    "summary": lambda df, **kw: A.summary_stats(df),
    "coefficient_of_variation": lambda df, **kw: A.coefficient_of_variation(df),
    # dimensionality reduction
    "pca": lambda df, **kw: A.run_pca(df, **kw),
    # hypothesis tests
    "ttest": lambda df, **kw: A.run_ttest(df, **kw),
    "anova": lambda df, **kw: A.run_anova(df),
    "2-way anova": lambda df, **kw: A.run_two_way_anova(df, **kw),
    "ancova": lambda df, covariates=None, covariate_cols=None, **kw: A.run_ancova(
        df, covariates, covariate_cols or []),
    "repeated_measurements_anova": lambda df, **kw: A.run_rm_anova(df, **kw),
    "mixed_anova": lambda df, **kw: A.run_mixed_anova(df, **kw),
    "thsd": lambda df, **kw: A.run_thsd(df, **kw),
    "kolmogorov_smirnov": lambda df, **kw: A.run_ks_test(df, **kw),
    "fold_change": lambda df, **kw: A.fold_change(df, **kw),
    # correction / enrichment / correlation
    "pvalue_correction_bh": lambda df, **kw: A.bh_correction(df, **kw),
    "pvalue_correction_twostage": lambda df, **kw: A.twostage_fdr_correction(df, **kw),
    "pvalue_correction_permutation": lambda df, **kw: A.permutation_fdr(df, **kw),
    "regulation_enrichment": lambda reg, annotations=None, **kw: (
        A.run_regulation_enrichment(reg, annotations, **kw)),
    "up_down_regulation_enrichment": lambda reg, annotations=None, **kw: (
        A.run_up_down_regulation_enrichment(reg, annotations, **kw)),
    # reference-literal spelling (analytics_factory.py:501)
    "up_down_enrichment": lambda reg, annotations=None, **kw: (
        A.run_up_down_regulation_enrichment(reg, annotations, **kw)),
    "site_regulation_enrichment": lambda reg, annotations=None, **kw: (
        A.run_site_regulation_enrichment(reg, annotations, **kw)),
    # reference-literal spelling (analytics_factory.py:537)
    "regulation_site_enrichment": lambda reg, annotations=None, **kw: (
        A.run_site_regulation_enrichment(reg, annotations, **kw)),
    "merge_for_polar": lambda reg, regulators=None, **kw: (
        A.merge_for_polar(reg, regulators, **kw)),
    "correlation": lambda df, **kw: A.pairwise_correlation(df, **kw),
    "multi_correlation": lambda dfs, **kw: A.run_multi_correlation(dfs, **kw),
    # survival
    "kaplan_meier": lambda df, **kw: A.run_kaplan_meier(df, **kw),
    # projection
    "ssgsea": lambda df, annotations=None, **kw: A.run_ssgsea(df, annotations, **kw),
    "functional_pca": lambda df, annotations=None, **kw: (
        A.run_functional_pca(df, annotations, **kw)),
    "repeated_measurements_correlation": lambda df, **kw: A.run_rm_correlation(df, **kw),
    "snf": lambda dfs, **kw: __import__(
        "ckg_spark.operators.snf", fromlist=["run_snf"]).run_snf(dfs, **kw),
    # WGCNA core (network construction + modules; dendrogram cut out of scope)
    "wgcna": lambda df, **kw: A.coexpression_modules(df, **kw),
    # SAM (moderated t + permutation q-values, R samr's s0 tuning; pass
    # delta_table=True for the order-statistic delta banding / FDR table)
    "samr": lambda df, group_a=None, group_b=None, delta_table=False, **kw: (
        A.samr_delta_table(df, group_a, group_b, **kw) if delta_table
        else A.run_samr(df, group_a, group_b, **kw)),
    # dabest estimation core (bootstrap effect-size CIs; plot panels out of scope)
    "dabest": lambda df, group_a=None, group_b=None, **kw: (
        A.bootstrap_effect_sizes(df, group_a, group_b, **kw)),
    # viz embeddings (reference analytics.py:960/:1015/:2673), implemented
    # from the published algorithms in operators/embed_viz.py; driver-bound
    # over the samples dimension by nature, guarded there
    "tsne": lambda df, **kw: __import__(
        "ckg_spark.operators.embed_viz", fromlist=["run_tsne"]
    ).run_tsne(df, **kw),
    "umap": lambda df, **kw: __import__(
        "ckg_spark.operators.embed_viz", fromlist=["run_umap"]
    ).run_umap(df, **kw),
    # mapper returns (nodes, links); generate_result surfaces the nodes
    # table (the simplicial complex), links reachable via run_mapper direct
    "mapper": lambda df, **kw: __import__(
        "ckg_spark.operators.embed_viz", fromlist=["run_mapper"]
    ).run_mapper(df, **kw)[0],
    # distributed MEDLINE fetch + broadcast join-back (sources/pubmed.py);
    # the HTTP transport is injectable (fetch=) and the default targets
    # NCBI eutils — transport failures yield an empty frame, loudly, the
    # same contract as the reference's try/except around Entrez.efetch
    "publications_abstracts": lambda df, **kw: __import__(
        "ckg_spark.sources.pubmed", fromlist=["publications_abstracts"]
    ).publications_abstracts(df, **kw),
}

# reference analysis_type names that are deliberately out of scope.
# Empty as of round 4: tsne/umap/mapper moved to _DISPATCH
# (operators/embed_viz.py) and publications_abstracts to sources/pubmed.py
# (real parser + distributed fetch plumbing; only the default HTTP
# transport needs egress, and it is injectable).
_UNSUPPORTED: set = set()

# the reference's complete analysis_type dispatch-string list
# (ckg/analytics_core/analytics_factory.py:82-679, one per `analysis_type ==`
# branch); tests assert every one of these either dispatches or raises the
# documented NotImplementedError — never KeyError.
REFERENCE_ANALYSIS_TYPES = (
    "wide_format", "summary", "normalization", "pca", "functional_pca",
    "tsne", "umap", "mapper", "ttest", "anova", "ancova", "qcmarkers",
    "samr", "2-way anova", "repeated_measurements_anova", "mixed_anova",
    "dabest", "correlation", "repeated_measurements_correlation",
    "merge_for_polar", "regulation_enrichment", "up_down_enrichment",
    "regulation_site_enrichment", "ssgsea", "long_format",
    "ranking_with_markers", "coefficient_of_variation",
    "publications_abstracts", "wgcna", "kaplan_meier", "multi_correlation",
)


def available() -> list[str]:
    return sorted(_DISPATCH)


def generate_result(analysis_type: str, data: DataFrame, **kwargs: Any) -> DataFrame:
    """Analysis.generate_result analog: dispatch by name."""
    if analysis_type in _DISPATCH:
        return _DISPATCH[analysis_type](data, **kwargs)
    if analysis_type in _UNSUPPORTED:
        raise NotImplementedError(
            f"analysis_type {analysis_type!r} is deliberately out of engine "
            f"scope (viz-embedding or web-fetch tail; see COVERAGE.md §2.11)"
        )
    raise KeyError(f"unknown analysis_type {analysis_type!r}; "
                   f"available: {available()}")
