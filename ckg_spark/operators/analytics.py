"""Analytics operator surface (SURVEY.md §2.11) — Spark renditions of the
reference's analytics_core functions (ckg/analytics_core/analytics/
analytics.py; dispatch map in analytics_factory.py:79-703).

Data model: the long-format measurement table
    (group string, subject string, feature string, value double)
— the reference's "wide format" (samples x features pandas matrix) is a
pivot of this (transform_into_wide_format, analytics.py:103). Everything
group-parallel runs as built-in aggregations/windows; the per-feature
hypothesis tests run as ``applyInPandas`` grouped-map UDFs over features —
embarrassingly parallel, Arrow-batched, no per-row Python (north rule).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..functions import stats as ST

LONG_COLS = ("group", "subject", "feature", "value")


# -- reshaping (analytics.py:103-174) ---------------------------------------

def to_wide(df: DataFrame, index: str = "subject", key: str = "feature",
            value: str = "value") -> DataFrame:
    """transform_into_wide_format: pivot long -> (index, one col per feature)."""
    return df.groupBy(index).pivot(key).agg(F.first(value))


def to_long(df: DataFrame, index: str = "subject",
            feature_cols: list[str] | None = None) -> DataFrame:
    """transform_into_long_format: unpivot via stack()."""
    cols = feature_cols or [c for c in df.columns if c != index]
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    return df.selectExpr(
        index, f"stack({len(cols)}, {stack_expr}) as (feature, value)"
    )


# -- missing-value stats (analytics.py:205-260) ------------------------------

def missing_stats(df: DataFrame) -> DataFrame:
    """extract_number_missing / extract_percentage_missing per (group, feature)."""
    return df.groupBy("group", "feature").agg(
        F.sum(F.col("value").isNull().cast("int")).alias("n_missing"),
        F.round(F.avg(F.col("value").isNull().cast("double")), 6).alias("pct_missing"),
        F.count(F.lit(1)).alias("n_total"),
    )


def filter_by_missingness(df: DataFrame, max_missing: float = 0.3) -> DataFrame:
    """Keep features whose missingness is <= max_missing in EVERY group
    (the reference's imputation gate)."""
    bad = (
        missing_stats(df)
        .where(F.col("pct_missing") > max_missing)
        .select("feature")
        .distinct()
    )
    return df.join(bad, on="feature", how="left_anti")


# -- normalization (analytics.py:394-623) ------------------------------------

def normalize_median(df: DataFrame, by: str = "subject") -> DataFrame:
    """median normalization: value - median(value of the sample)."""
    med = df.groupBy(by).agg(F.percentile("value", F.lit(0.5)).alias("_med"))
    return (
        df.join(med, on=by)
        .withColumn("value", F.col("value") - F.col("_med"))
        .drop("_med")
    )


def normalize_zscore(df: DataFrame, by: str = "feature") -> DataFrame:
    """z-score per feature (or per sample with by='subject')."""
    w = df.groupBy(by).agg(
        F.avg("value").alias("_mu"), F.stddev_samp("value").alias("_sd")
    )
    return (
        df.join(w, on=by)
        .withColumn(
            "value",
            F.when(F.col("_sd") > 0, (F.col("value") - F.col("_mu")) / F.col("_sd")),
        )
        .drop("_mu", "_sd")
    )


def normalize_quantile(df: DataFrame, by: str = "subject") -> DataFrame:
    """Quantile normalization across samples: rank within sample, replace by
    the mean value at that rank over all samples — the rank-window + join
    rendition of analytics.py's quantile method (no matrix materialized)."""
    w = Window.partitionBy(by).orderBy(F.col("value").asc(), F.col("feature").asc())
    ranked = df.where(F.col("value").isNotNull()).withColumn(
        "_rk", F.row_number().over(w)
    )
    rank_means = ranked.groupBy("_rk").agg(F.avg("value").alias("_rmean"))
    return (
        ranked.join(rank_means, on="_rk")
        .withColumn("value", F.col("_rmean"))
        .drop("_rk", "_rmean")
    )


# -- summary / dispersion (analytics.py:639-690, 843-860) --------------------

def summary_stats(df: DataFrame) -> DataFrame:
    return df.groupBy("group", "feature").agg(
        F.count("value").alias("n"),
        F.round(F.avg("value"), 6).alias("mean"),
        F.round(F.stddev_samp("value"), 6).alias("std"),
        F.round(F.min("value"), 6).alias("min"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("median"),
        F.round(F.max("value"), 6).alias("max"),
    )


def coefficient_of_variation(df: DataFrame) -> DataFrame:
    return df.groupBy("group", "feature").agg(
        F.round(F.stddev_samp("value") / F.avg("value") * 100, 6).alias("cv_pct")
    )


# -- effect sizes / fold change (analytics.py:2522-2634) ---------------------

def fold_change(df: DataFrame, group_a: str, group_b: str) -> DataFrame:
    """log-space fold change + Cohen's d per feature between two groups."""
    means = (
        df.where(F.col("group").isin([group_a, group_b]))
        .groupBy("feature", "group")
        .agg(
            F.avg("value").alias("mean"),
            F.var_samp("value").alias("var"),
            F.count("value").alias("n"),
        )
    )
    a = means.where(F.col("group") == group_a).select(
        "feature", F.col("mean").alias("mean_a"), F.col("var").alias("var_a"),
        F.col("n").alias("n_a"),
    )
    b = means.where(F.col("group") == group_b).select(
        "feature", F.col("mean").alias("mean_b"), F.col("var").alias("var_b"),
        F.col("n").alias("n_b"),
    )
    j = a.join(b, on="feature")
    pooled = F.sqrt(
        ((F.col("n_a") - 1) * F.col("var_a") + (F.col("n_b") - 1) * F.col("var_b"))
        / (F.col("n_a") + F.col("n_b") - 2)
    )
    return j.select(
        "feature",
        (F.col("mean_a") - F.col("mean_b")).alias("log_fc"),
        F.when(pooled > 0, (F.col("mean_a") - F.col("mean_b")) / pooled).alias("cohens_d"),
    )


# -- per-feature hypothesis tests (grouped-map UDFs) --------------------------

def run_ttest(df: DataFrame, group_a: str, group_b: str) -> DataFrame:
    """Welch t-test per feature (analytics.py calculate_ttest:1470 semantics),
    as an applyInPandas over features."""
    sub = df.where(F.col("group").isin([group_a, group_b]))

    def per_feature(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf.loc[pdf["group"] == group_a, "value"].to_numpy(dtype=float)
        y = pdf.loc[pdf["group"] == group_b, "value"].to_numpy(dtype=float)
        t, dof, p = ST.welch_ttest(x, y)
        d = ST.cohens_d(x, y)
        return pd.DataFrame(
            {"feature": [pdf["feature"].iloc[0]], "t": [t], "df": [dof],
             "pvalue": [p], "cohens_d": [d]}
        )

    return sub.groupBy("feature").applyInPandas(
        per_feature, schema="feature string, t double, df double, pvalue double, cohens_d double"
    )


def run_anova(df: DataFrame) -> DataFrame:
    """One-way ANOVA per feature across all groups (calculate_anova:1608)."""

    def per_feature(pdf: pd.DataFrame) -> pd.DataFrame:
        groups = [g["value"].to_numpy(dtype=float) for _, g in pdf.groupby("group")]
        f, df1, df2, p = ST.anova_oneway(groups)
        return pd.DataFrame(
            {"feature": [pdf["feature"].iloc[0]], "f": [f], "df1": [df1],
             "df2": [df2], "pvalue": [p]}
        )

    return df.groupBy("feature").applyInPandas(
        per_feature, schema="feature string, f double, df1 double, df2 double, pvalue double"
    )


# -- p-value correction (analytics.py:1086-1154) ------------------------------

def bh_correction(results: DataFrame, pvalue_col: str = "pvalue",
                  alpha: float = 0.05) -> DataFrame:
    """Benjamini-Hochberg FDR: global rank window + running-min of adjusted
    values from the largest p down (the rank-based formulation; matches
    statsmodels multipletests(method='fdr_bh'))."""
    n = results.where(F.col(pvalue_col).isNotNull()).count()
    w_rank = Window.orderBy(F.col(pvalue_col).asc())
    w_cummin = Window.orderBy(F.col(pvalue_col).desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = results.where(F.col(pvalue_col).isNotNull()).withColumn(
        "_rank", F.row_number().over(w_rank)
    )
    adj = ranked.withColumn("_raw_adj", F.col(pvalue_col) * n / F.col("_rank"))
    return (
        adj.withColumn("padj", F.least(F.min("_raw_adj").over(w_cummin), F.lit(1.0)))
        .withColumn("rejected", F.col("padj") <= alpha)
        .drop("_rank", "_raw_adj")
    )


# -- enrichment (analytics.py:2353-2445) --------------------------------------

def run_enrichment(hits: DataFrame, annotations: DataFrame,
                   universe_size: int | None = None) -> DataFrame:
    """Fisher-exact annotation enrichment (run_regulation_enrichment analog).

    hits: (feature) — the regulated/selected set.
    annotations: (feature, annotation).
    Per annotation: a = hits in annotation, b = hits outside, c = non-hit
    members, d = rest; one-sided Fisher via grouped-map UDF.
    """
    n_hits = hits.count()
    n_univ = universe_size or annotations.select("feature").distinct().count()
    per_ann = (
        annotations.join(hits.withColumn("_hit", F.lit(1)), on="feature", how="left")
        .groupBy("annotation")
        .agg(
            F.sum(F.coalesce("_hit", F.lit(0))).alias("a"),
            F.count(F.lit(1)).alias("ann_size"),
        )
    )

    def fisher(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r in pdf.itertuples():
            a = int(r.a)
            b = n_hits - a
            c = int(r.ann_size) - a
            d = n_univ - a - b - c
            out.append((r.annotation, a, int(r.ann_size),
                        ST.fisher_exact_greater(a, b, c, d)))
        return pd.DataFrame(out, columns=["annotation", "hits", "ann_size", "pvalue"])

    return per_ann.groupBy((F.crc32(F.col("annotation")) % 64).alias("_b")).applyInPandas(
        fisher, schema="annotation string, hits long, ann_size long, pvalue double"
    )


# -- correlation (analytics.py:1066-1387) -------------------------------------

def pairwise_correlation(df: DataFrame, min_n: int = 3) -> DataFrame:
    """All-pairs Pearson correlation between features sharing subjects
    (convertToEdgeList analog: returns the melted edge list directly).

    Self-join on subject + corr() aggregate — Catalyst turns this into one
    shuffle on subject and a hash aggregation on (feature_a, feature_b).
    """
    a = df.select("subject", F.col("feature").alias("fa"), F.col("value").alias("va"))
    b = df.select("subject", F.col("feature").alias("fb"), F.col("value").alias("vb"))
    return (
        a.join(b, on="subject")
        .where(F.col("fa") < F.col("fb"))
        .groupBy("fa", "fb")
        .agg(F.corr("va", "vb").alias("corr"), F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_n)
    )
