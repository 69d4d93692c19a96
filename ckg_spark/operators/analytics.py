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

def with_global_rank(df: DataFrame, sort_cols: list, rank_name: str = "_rank",
                     keep_pid: bool = False) -> DataFrame:
    """Scale-safe global dense row numbering (two-pass rank).

    A bare ``Window.orderBy(...)`` (empty PARTITION BY) moves every row into
    one task — correct but a scale-killer. Instead: range-repartition on the
    sort key (each partition holds a contiguous key range), rank locally per
    partition (parallel windows keyed by ``spark_partition_id``), then add
    broadcast per-partition offsets (a driver-scale count per partition).
    ``sort_cols`` must be a deterministic total order (include a tiebreaker).
    """
    from .ckpt import checkpoint_reset_stats

    # materialize ONE range partitioning for both passes: the boundaries
    # come from sampling seeded by RDD id, so re-executing the subtree for
    # the offset join could place rows in different partitions than the
    # collected counts were computed for (rank duplicates/gaps)
    rp = df.repartitionByRange(*sort_cols).withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    local = checkpoint_reset_stats(rp.withColumn("_lrank", F.row_number().over(w)))
    counts = sorted(
        ((r["_pid"], r["cnt"]) for r in
         local.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()),
    )
    offs, acc = [], 0
    for pid, cnt in counts:
        offs.append((pid, acc))
        acc += cnt
    spark = df.sparkSession
    off_df = spark.createDataFrame(offs or [(0, 0)], "_pid int, _off long")
    out = (
        local.join(F.broadcast(off_df), on="_pid", how="inner")
        .withColumn(rank_name, (F.col("_lrank") + F.col("_off")).cast("long"))
        .drop("_lrank", "_off")
    )
    return out if keep_pid else out.drop("_pid")


def bh_correction(results: DataFrame, pvalue_col: str = "pvalue",
                  alpha: float = 0.05, tiebreak: list | None = None) -> DataFrame:
    """Benjamini-Hochberg FDR: rank + running-min of adjusted values from the
    largest p down (matches statsmodels multipletests(method='fdr_bh')).

    Scale-safe: no empty-PARTITION BY window anywhere. Global rank comes from
    ``with_global_rank`` (range partition + broadcast offsets); the reverse
    cumulative min is a per-range-partition suffix-min window combined with a
    broadcast suffix-min over later partitions' minima (driver-scale).
    Ties in ``pvalue_col`` are broken by ``tiebreak`` (default: xxhash64 of
    all columns) so the rank is a deterministic total order; tied p-values
    still receive identical padj (the suffix-min equalizes them).
    """
    nn = results.where(F.col(pvalue_col).isNotNull())
    n = nn.count()
    if n == 0:
        return (nn.withColumn("padj", F.lit(None).cast("double"))
                  .withColumn("rejected", F.lit(None).cast("boolean")))
    tb = ([F.col(c) for c in tiebreak] if tiebreak
          else [F.xxhash64(*[F.col(c) for c in results.columns])])
    sort_cols = [F.col(pvalue_col).asc(), *[t.asc() for t in tb]]
    ranked = with_global_rank(nn, sort_cols, "_rank", keep_pid=True)
    adj = ranked.withColumn("_raw_adj", F.col(pvalue_col) * n / F.col("_rank"))
    # suffix-min within each contiguous range partition (descending rank)
    w_sfx = (Window.partitionBy("_pid").orderBy(F.col("_rank").desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    adj = adj.withColumn("_smin", F.min("_raw_adj").over(w_sfx))
    # per-partition minima -> suffix-min over strictly-later partitions
    pmins = sorted(
        ((r["_pid"], r["m"]) for r in
         adj.groupBy("_pid").agg(F.min("_raw_adj").alias("m")).collect()),
    )
    later = []
    run = float("inf")
    for pid, m in reversed(pmins):
        later.append((pid, run if run != float("inf") else None))
        if m is not None:
            run = min(run, m)
    spark = results.sparkSession
    later_df = spark.createDataFrame(later, "_pid int, _later double")
    return (
        adj.join(F.broadcast(later_df), on="_pid", how="left")
        .withColumn(
            "padj",
            F.least(
                F.coalesce(F.least("_smin", "_later"), F.col("_smin")), F.lit(1.0)
            ),
        )
        .withColumn("rejected", F.col("padj") <= alpha)
        .drop("_pid", "_rank", "_raw_adj", "_smin", "_later")
    )


def with_global_cumsum(df: DataFrame, sort_cols: list, value_col: str,
                       out_name: str = "_csum") -> DataFrame:
    """Scale-safe global running sum of ``value_col`` in ``sort_cols`` order.

    Same two-pass shape as ``with_global_rank``: range-repartition on the
    sort key, per-partition prefix-sum window (parallel), then add broadcast
    per-partition totals of all earlier partitions (driver-scale offsets).
    ``sort_cols`` must be a deterministic total order.
    """
    from .ckpt import checkpoint_reset_stats

    # same materialize-once rule as with_global_rank: one sampled range
    # partitioning must serve both the totals collect and the offset join
    rp = df.repartitionByRange(*sort_cols).withColumn("_pid", F.spark_partition_id())
    w = (Window.partitionBy("_pid").orderBy(*sort_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = checkpoint_reset_stats(rp.withColumn("_lsum", F.sum(value_col).over(w)))
    totals = sorted(
        ((r["_pid"], r["t"]) for r in
         local.groupBy("_pid").agg(F.sum(value_col).alias("t")).collect()),
    )
    offs, acc = [], 0
    for pid, t in totals:
        offs.append((pid, float(acc)))
        acc += t or 0
    spark = df.sparkSession
    off_df = spark.createDataFrame(offs or [(0, 0.0)], "_pid int, _off double")
    return (
        local.join(F.broadcast(off_df), on="_pid", how="inner")
        .withColumn(out_name, F.col("_lsum") + F.col("_off"))
        .drop("_pid", "_lsum", "_off")
    )


def twostage_fdr_correction(results: DataFrame, pvalue_col: str = "pvalue",
                            alpha: float = 0.05, method: str = "bky",
                            tiebreak: list | None = None) -> DataFrame:
    """Two-stage linear step-up FDR (Benjamini-Krieger-Yekutieli 2006;
    reference apply_pvalue_twostage_fdrcorrection, analytics.py:1136, via
    statsmodels fdrcorrection_twostage with one refinement iteration).

    Because BH-adjusted p-values do not depend on alpha, a single
    ``bh_correction`` pass suffices: stage 1 counts rejections at
    alpha' = alpha/(1+alpha) ('bky') or alpha ('bh') to estimate the number
    of true nulls m0 = m - r1, then the final padj is the BH padj scaled by
    fact * m0/m (fact = 1+alpha for 'bky'). rejected <=> padj <= alpha, which
    reproduces statsmodels' stage-2 threshold alpha* = alpha' * m/m0 exactly.
    Fully distributed: the only driver values are two scalar counts.
    """
    fact = (1.0 + alpha) if method == "bky" else 1.0
    alpha_prime = alpha / fact
    bh = bh_correction(results, pvalue_col, alpha=alpha_prime, tiebreak=tiebreak)
    agg = bh.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.when(F.col("padj") <= alpha_prime, 1).otherwise(0)).alias("r1"),
    ).collect()[0]
    m, r1 = agg["m"], int(agg["r1"] or 0)
    m0 = (m - r1) if 0 < r1 < m else m
    scale = fact * m0 / m if m else 1.0
    return (
        bh.withColumn("padj", F.least(F.col("padj") * scale, F.lit(1.0)))
          .withColumn("rejected", F.col("padj") <= alpha)
    )


def permutation_fdr(df: DataFrame, alpha: float = 0.05,
                    permutations: int = 50, seed: int = 0) -> DataFrame:
    """Permutation-based FDR over per-feature one-way ANOVA p-values
    (reference apply_pvalue_permutation_fdrcorrection, analytics.py:1155 +
    get_counts_permutation_fdr:1199).

    Input: the long table (group, subject, feature, value). The reference
    shuffles the sample index of the wide matrix ``permutations`` times and
    recomputes every per-feature ANOVA p-value on each shuffle; the q-value
    of an observed p is  a / b / n_perms  with a = #{rand p <= p} (+1e-13)
    and b = #{observed p <= p}.

    Spark-first plan:
      * the permuted group assignment is a (perm, subject) -> group table —
        sample-dictionary scale (subjects x permutations), built with a
        seeded numpy RNG on the driver and broadcast-joined onto the long
        table; the data-scale work (values x permutations) stays distributed.
      * per-(perm, feature) ANOVA reuses the grouped-map Arrow UDF pattern —
        embarrassingly parallel, no per-row Python.
      * the a/b counts are cumulative tallies over the union of rand and
        observed p-values: aggregate counts per distinct p-value, global
        running sums via ``with_global_cumsum`` (no empty-PARTITION-BY
        window), then join back to observed features.
    Deterministic for a given seed (each permutation uses np.default_rng
    (seed, i)).
    """
    import numpy as np

    spark = df.sparkSession
    subj_groups = sorted(
        (r["subject"], r["group"])
        for r in df.select("subject", "group").distinct().collect()
    )
    subjects = [s for s, _ in subj_groups]
    groups = [g for _, g in subj_groups]
    rows = []
    for p in range(permutations):
        rng = np.random.default_rng((seed, p))
        perm = rng.permutation(len(groups))
        rows.extend((p, subjects[i], groups[perm[i]]) for i in range(len(groups)))
    perm_df = spark.createDataFrame(rows, "perm int, subject string, pgroup string")

    permuted = (
        df.join(F.broadcast(perm_df), on="subject", how="inner")
          .select(F.col("perm"), F.col("pgroup").alias("group"),
                  F.col("feature"), F.col("value"))
    )

    def per_perm_feature(pdf: pd.DataFrame) -> pd.DataFrame:
        gs = [g["value"].to_numpy(dtype=float) for _, g in pdf.groupby("group")]
        _, _, _, p = ST.anova_oneway(gs)
        return pd.DataFrame({"pvalue": [p]})

    rand_p = permuted.groupBy("perm", "feature").applyInPandas(
        per_perm_feature, schema="pvalue double"
    ).where(F.col("pvalue").isNotNull())

    observed = run_anova(df).select("feature", "pvalue").where(
        F.col("pvalue").isNotNull())

    # counts per distinct p-value, then global prefix sums over the union
    rc = rand_p.groupBy("pvalue").agg(F.count(F.lit(1)).cast("double").alias("n_rand"))
    oc = observed.groupBy("pvalue").agg(F.count(F.lit(1)).cast("double").alias("n_obs"))
    merged = (rc.join(oc, on="pvalue", how="full")
                .fillna(0.0, subset=["n_rand", "n_obs"]))
    cum = with_global_cumsum(merged, [F.col("pvalue").asc()], "n_rand", "_cum_rand")
    cum = with_global_cumsum(cum, [F.col("pvalue").asc()], "n_obs", "_cum_obs")
    return (
        observed.join(cum.select("pvalue", "_cum_rand", "_cum_obs"), on="pvalue")
        .withColumn(
            "padj",
            (F.col("_cum_rand") + F.lit(1e-13))
            / F.col("_cum_obs") / F.lit(float(permutations)),
        )
        .withColumn("rejected", F.col("padj") <= alpha)
        .select("feature", "pvalue", "padj", "rejected")
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


# -- imputation (analytics.py:263-367) -----------------------------------------

def impute_group_median(df: DataFrame) -> DataFrame:
    """Median imputation per (group, feature) — the distributed default
    (reference's mixed imputation falls back to group medians for features
    too sparse for KNN, imputation_mixed_norm_KNN:303)."""
    med = df.groupBy("group", "feature").agg(
        F.percentile("value", F.lit(0.5)).alias("_med")
    )
    return (
        df.join(med, on=["group", "feature"], how="left")
        .withColumn("value", F.coalesce("value", "_med"))
        .drop("_med")
    )


def impute_normal_distribution(df: DataFrame, shift: float = 1.8,
                               nstd: float = 0.3, seed: int = 11) -> DataFrame:
    """MNAR imputation by draws from a down-shifted normal
    (imputation_normal_distribution:328: mean - 1.8*std, width 0.3*std).

    Determinism: the 'draw' is a seeded hash-derived uniform mapped through
    a cheap normal approximation — same (subject, feature) always imputes
    the same value at any parallelism (no Python RNG in executors).
    """
    stats_ = df.groupBy("feature").agg(
        F.avg("value").alias("_mu"), F.stddev_samp("value").alias("_sd")
    )
    j = df.join(stats_, on="feature", how="left")
    # uniform in (0,1) from a stable hash of the row identity
    u = (F.pmod(F.xxhash64("subject", "feature", F.lit(seed)), F.lit(10**9))
         / F.lit(10**9 - 1))
    # inverse-CDF-ish approximation via logistic quantile (adequate for MNAR fill)
    z = (F.log(u / (F.lit(1.0) - u))) / F.lit(1.702)
    imputed = F.col("_mu") - F.lit(shift) * F.col("_sd") + z * F.lit(nstd) * F.col("_sd")
    return (
        j.withColumn("value", F.coalesce("value", imputed))
        .drop("_mu", "_sd")
    )


def impute_knn(df: DataFrame, k: int = 3) -> DataFrame:
    """KNN imputation per group (imputation_KNN:263): grouped-map pandas UDF;
    each group's samples-x-features matrix fits an Arrow batch (the
    reference holds the SAME matrix in one pandas frame, so this preserves
    its semantics and its scale envelope; groups are the unit of parallelism)."""
    import numpy as np

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # set_index + unstack, NOT pivot_table: pivot_table silently drops a
        # subject whose every value is null (its NaN cells never enter the
        # table), losing the row from the imputed output
        wide = (
            pdf.groupby(["subject", "feature"])["value"].first().unstack()
        )
        mat = wide.to_numpy(dtype=float)
        filled = mat.copy()
        for i in range(mat.shape[0]):
            row = mat[i]
            miss = np.isnan(row)
            if not miss.any():
                continue
            obs = ~miss
            dists = []
            for j in range(mat.shape[0]):
                if j == i:
                    continue
                other = mat[j]
                both = obs & ~np.isnan(other)
                if both.sum() == 0:
                    continue
                d = np.sqrt(np.nanmean((row[both] - other[both]) ** 2))
                dists.append((d, j))
            dists.sort()
            nbrs = [j for _, j in dists[:k]]
            for c in np.where(miss)[0]:
                vals = [mat[j, c] for j in nbrs if not np.isnan(mat[j, c])]
                if vals:
                    filled[i, c] = float(np.mean(vals))
        out = []
        g = pdf["group"].iloc[0]
        for si, s in enumerate(wide.index):
            for ci, f_ in enumerate(wide.columns):
                v = filled[si, ci]
                out.append((g, s, f_, None if np.isnan(v) else float(v)))
        return pd.DataFrame(out, columns=["group", "subject", "feature", "value"])

    return df.groupBy("group").applyInPandas(
        per_group, schema="group string, subject string, feature string, value double"
    )


# -- dimensionality reduction (analytics.py:885) --------------------------------

def run_pca(df: DataFrame, n_components: int = 2) -> DataFrame:
    """PCA via Spark ML over the wide matrix (run_pca:885 analog).
    Returns (subject, pc array<double>). Deterministic (SVD-based)."""
    from pyspark.ml.feature import PCA as MLPCA, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    wide = to_wide(df)
    feat_cols = sorted(c for c in wide.columns if c != "subject")
    filled = wide.na.fill(0.0, subset=feat_cols)
    asm = VectorAssembler(inputCols=feat_cols, outputCol="_fv")
    pca = MLPCA(k=n_components, inputCol="_fv", outputCol="_pc")
    model = pca.fit(asm.transform(filled))
    out = model.transform(asm.transform(filled))
    return out.select(
        "subject", vector_to_array(F.col("_pc")).alias("pc")
    )


def run_ks_test(df: DataFrame, group_a: str, group_b: str) -> DataFrame:
    """Two-sample KS per feature (run_kolmogorov_smirnov:2256 analog)."""
    sub = df.where(F.col("group").isin([group_a, group_b]))

    def per_feature(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf.loc[pdf["group"] == group_a, "value"].dropna().to_numpy()
        y = pdf.loc[pdf["group"] == group_b, "value"].dropna().to_numpy()
        d, p = ST.ks_2samp(x, y)
        return pd.DataFrame({"feature": [pdf["feature"].iloc[0]],
                             "ks_d": [d], "pvalue": [p]})

    return sub.groupBy("feature").applyInPandas(
        per_feature, schema="feature string, ks_d double, pvalue double"
    )


def run_two_way_anova(df: DataFrame, factor_a: str = "group",
                      factor_b: str = "subject_group") -> DataFrame:
    """Two-way ANOVA per feature over two categorical factor columns
    (run_two_way_anova:2894 analog)."""

    def per_feature(pdf: pd.DataFrame) -> pd.DataFrame:
        res = ST.anova_two_way(
            pdf["value"].to_numpy(), pdf[factor_a].to_numpy(),
            pdf[factor_b].to_numpy(),
        )
        base = {"feature": [pdf["feature"].iloc[0]]}
        cols = [f"{m}_{s}" for s in ("a", "b", "ab")
                for m in ("f", "p", "eta", "omega")]
        if res is None:
            res = {k: float("nan") for k in cols}
        base.update({k: [res[k]] for k in cols})
        return pd.DataFrame(base)

    return df.groupBy("feature").applyInPandas(
        per_feature,
        schema=("feature string, "
                + ", ".join(f"{m}_{s} double" for s in ("a", "b", "ab")
                            for m in ("f", "p", "eta", "omega"))),
    )


# -- Tukey HSD post-hoc (analytics.py calculate_THSD:1516) ---------------------

def run_thsd(df: DataFrame, alpha: float = 0.05, is_logged: bool = True) -> DataFrame:
    """Pairwise Tukey-HSD (Tukey-Kramer for unequal n) per feature.

    Spark-first decomposition: per-(feature, group) means/counts and the
    per-feature pooled MSE are plain JVM aggregations; the pairwise table is
    a per-feature self-join (fan-out bounded by #groups^2, dictionary-scale);
    only the studentized-range survival function runs in Python — one
    vectorized Arrow batch over the final pair rows, never over raw data.
    Matches pingouin.pairwise_tukey (the reference's engine at
    analytics.py:1516): q = |m1-m2| / sqrt(MSE/2 * (1/n1+1/n2)),
    p = tukey_sf(q, k, N-k); log2FC = m1-m2 when is_logged else m1/m2.
    """
    gstats = df.where(F.col("value").isNotNull()).groupBy("feature", "group").agg(
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("var"),
        F.count(F.lit(1)).alias("n"),
    )
    fstats = gstats.groupBy("feature").agg(
        (F.sum((F.col("n") - 1) * F.col("var")) / F.sum(F.col("n") - 1)).alias("mse"),
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_tot"),
    )
    a = gstats.select("feature", F.col("group").alias("group1"),
                      F.col("mean").alias("mean1"), F.col("n").alias("n1"))
    b = gstats.select("feature", F.col("group").alias("group2"),
                      F.col("mean").alias("mean2"), F.col("n").alias("n2"))
    pairs = (
        a.join(b, on="feature")
        .where(F.col("group1") < F.col("group2"))
        .join(fstats, on="feature")
        .withColumn("log2fc", F.col("mean1") - F.col("mean2") if is_logged
                    else F.col("mean1") / F.col("mean2"))
        .withColumn(
            "std_error",
            F.sqrt(F.col("mse") / 2.0 * (1.0 / F.col("n1") + 1.0 / F.col("n2"))),
        )
        .withColumn("qstat", F.abs(F.col("log2fc")) / F.col("std_error"))
        .withColumn("df_err", (F.col("n_tot") - F.col("k")).cast("double"))
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _tukey_p(q: pd.Series, k: pd.Series, dfe: pd.Series) -> pd.Series:
        import numpy as np
        out = np.ones(len(q))
        for (ki, di), idx in pd.DataFrame({"k": k, "d": dfe}).groupby(["k", "d"]).groups.items():
            out[idx] = ST.tukey_sf(q.iloc[idx].to_numpy(), int(ki), float(di))
        return pd.Series(out)

    res = pairs.withColumn("pvalue", _tukey_p("qstat", "k", "df_err"))
    fc = F.pow(F.lit(2.0), F.col("log2fc")) if is_logged else F.col("log2fc")
    return res.select(
        "feature", "group1", "group2", "mean1", "mean2", "log2fc",
        fc.alias("fc"), "std_error", "qstat", "pvalue",
        (F.col("pvalue") <= alpha).alias("rejected"),
    )


# -- ANCOVA / repeated-measures / mixed ANOVA (analytics.py:1774/1860/1896) ----

def run_ancova(df: DataFrame, covariates: DataFrame,
               covariate_cols: list[str]) -> DataFrame:
    """One-way ANCOVA per feature: group F-test adjusting for covariates.

    ``covariates``: (subject, <covariate_cols...>) — broadcast-joined onto
    the long table (dictionary-scale: one row per subject), then per-feature
    grouped-map OLS (full vs reduced model; see ST.ancova_oneway).
    """
    joined = df.join(F.broadcast(covariates), on="subject", how="inner")
    cols = list(covariate_cols)

    def per_feature(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        res = ST.ancova_oneway(
            pdf["value"].to_numpy(dtype=float), pdf["group"].to_numpy(),
            pdf[cols].to_numpy(dtype=float),
        )
        f, df1, df2, p = res if res else (float("nan"),) * 4
        return pd.DataFrame({"feature": [pdf["feature"].iloc[0]], "f": [f],
                             "df1": [df1], "df2": [df2], "pvalue": [p]})

    return joined.groupBy("feature").applyInPandas(
        per_feature, schema="feature string, f double, df1 double, df2 double, pvalue double"
    )


def run_rm_anova(df: DataFrame, subject: str = "subject",
                 within: str = "group") -> DataFrame:
    """Repeated-measures ANOVA per feature (balanced complete designs;
    incomplete features return nulls, as the reference's dropna does)."""

    def per_feature(pdf: pd.DataFrame) -> pd.DataFrame:
        res = ST.rm_anova(pdf["value"].to_numpy(dtype=float),
                          pdf[subject].to_numpy(), pdf[within].to_numpy())
        f, df1, df2, p = res if res else (float("nan"),) * 4
        return pd.DataFrame({"feature": [pdf["feature"].iloc[0]], "f": [f],
                             "df1": [df1], "df2": [df2], "pvalue": [p]})

    return df.groupBy("feature").applyInPandas(
        per_feature, schema="feature string, f double, df1 double, df2 double, pvalue double"
    )


def run_mixed_anova(df: DataFrame, subject: str = "subject",
                    within: str = "group", between: str = "subject_group") -> DataFrame:
    """Mixed (split-plot) ANOVA per feature; reports the Interaction source
    row only, like the reference's run_mixed_anova (analytics.py:1896)."""

    def per_feature(pdf: pd.DataFrame) -> pd.DataFrame:
        res = ST.mixed_anova_interaction(
            pdf["value"].to_numpy(dtype=float), pdf[subject].to_numpy(),
            pdf[within].to_numpy(), pdf[between].to_numpy(),
        )
        f, df1, df2, p = res if res else (float("nan"),) * 4
        return pd.DataFrame({"feature": [pdf["feature"].iloc[0]], "f": [f],
                             "df1": [df1], "df2": [df2], "pvalue": [p]})

    return df.groupBy("feature").applyInPandas(
        per_feature, schema="feature string, f double, df1 double, df2 double, pvalue double"
    )


# -- regulation enrichment wrappers (analytics.py:2278-2353) -------------------

def run_regulation_enrichment(regulation: DataFrame, annotations: DataFrame,
                              reject_col: str = "rejected") -> DataFrame:
    """run_regulation_enrichment analog: foreground = rejected features,
    universe = every feature present in the regulation table; Fisher per
    annotation + BH across annotations."""
    hits = (regulation.where(F.col(reject_col)).select("feature").distinct())
    universe = regulation.select("feature").distinct()
    ann = annotations.join(universe, on="feature", how="left_semi")
    enr = run_enrichment(hits, ann, universe_size=universe.count())
    return bh_correction(enr, tiebreak=["annotation"])


def run_up_down_regulation_enrichment(
    regulation: DataFrame, annotations: DataFrame, alpha: float = 0.05,
    lfc_cutoff: float = 1.0, padj_col: str = "padj", lfc_col: str = "log2fc",
) -> DataFrame:
    """run_up_down_regulation_enrichment (analytics.py:2313) analog:
    split the regulated set by fold-change direction, enrich each side,
    union with a ``direction`` column. One scan of the regulation table per
    direction; both enrichments are annotation-dictionary-scale."""
    up = regulation.withColumn(
        "_r", (F.col(padj_col) <= alpha) & (F.col(lfc_col) >= lfc_cutoff))
    down = regulation.withColumn(
        "_r", (F.col(padj_col) <= alpha) & (F.col(lfc_col) <= -lfc_cutoff))
    e_up = run_regulation_enrichment(up, annotations, reject_col="_r") \
        .withColumn("direction", F.lit("upregulated"))
    e_down = run_regulation_enrichment(down, annotations, reject_col="_r") \
        .withColumn("direction", F.lit("downregulated"))
    return e_up.unionByName(e_down)


def run_site_regulation_enrichment(
    regulation: DataFrame, annotations: DataFrame, reject_col: str = "rejected",
    regex: str = r"(\w+~[^_]+)_\w\d+-\w+",
) -> DataFrame:
    """run_site_regulation_enrichment (analytics.py:2278) analog: collapse
    site-level identifiers (e.g. 'GENE~P12345_S23-p') to their parent feature
    via regexp_extract (JVM-side), dedup, then regulation enrichment."""
    parent = F.regexp_extract(F.col("feature"), regex, 1)
    collapsed = (
        regulation.withColumn(
            "feature", F.when(parent != "", parent).otherwise(F.col("feature")))
        .dropDuplicates()
    )
    return run_regulation_enrichment(collapsed, annotations, reject_col=reject_col)


# -- multi-dataset correlation (analytics.py run_multi_correlation:1280) -------

def run_multi_correlation(dfs: dict[str, DataFrame], min_n: int = 3) -> DataFrame:
    """Correlation across multiple omics datasets joined on subject.

    Reference semantics: merge the per-dataset wide matrices on
    ['subject','biological_sample'] and correlate every feature pair. Spark
    form: prefix features with their dataset name, union the long tables,
    and reuse the self-join + corr() aggregation of ``pairwise_correlation``
    — one shuffle on subject regardless of dataset count.
    """
    tagged = None
    for name, d in dfs.items():
        t = d.select(
            "subject",
            F.concat(F.lit(f"{name}:"), F.col("feature")).alias("feature"),
            "value",
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    return pairwise_correlation(tagged, min_n=min_n)


# -- ComBat batch correction (analytics.py combat_batch_correction:369) -------

def combat_batch_correction(df: DataFrame, batch_col: str = "batch",
                            conv: float = 1e-4, max_iter: int = 200) -> DataFrame:
    """Parametric empirical-Bayes ComBat (Johnson 2007; the reference wraps
    pycombat) over the long table (batch, subject, feature, value).

    Spark decomposition — no driver-side matrix at any point:
    1. per-(batch, feature) sufficient stats (n, mean, var) and per-feature
       pooled stand_mean / var_pooled: two JVM aggregations + one join;
    2. EB hyper-priors per batch (gamma_bar, tau2, a_prior, b_prior):
       an aggregation over the (batch, feature) grid — rows = batches,
       broadcastable;
    3. the it_sol fixed point for (gamma*, delta*) per (batch, feature):
       vectorized numpy inside one applyInPandas over batches (each group
       is one batch's feature vector — the same shape pycombat iterates);
    4. the adjustment is a broadcast join + pure column arithmetic.

    Returns the input rows with ``value`` replaced by the corrected value.
    """
    nn = df.where(F.col("value").isNotNull())
    n_total = nn.count()
    bf = nn.groupBy(batch_col, "feature").agg(
        F.count(F.lit(1)).alias("n_bf"),
        F.avg("value").alias("mean_bf"),
    )
    # stand_mean_f = sum_b (n_b/N) * mean_bf ; var_pooled_f over ALL samples
    feat = bf.groupBy("feature").agg(
        (F.sum(F.col("n_bf") * F.col("mean_bf")) / F.sum("n_bf")).alias("stand_mean"),
    )
    with_stand = nn.join(F.broadcast(feat), on="feature")
    varp = with_stand.groupBy("feature").agg(
        F.avg(F.pow(F.col("value") - F.col("stand_mean"), 2)).alias("var_pooled"),
    )
    feat = feat.join(varp, on="feature")
    z = (
        nn.join(F.broadcast(feat), on="feature")
        .withColumn("z", (F.col("value") - F.col("stand_mean"))
                    / F.sqrt(F.col("var_pooled")))
    )
    zstats = z.groupBy(batch_col, "feature").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("z").alias("gamma_hat"),
        F.var_samp("z").alias("delta_hat2"),
        F.sum("z").alias("sum_z"),
        F.sum(F.col("z") * F.col("z")).alias("sum_z2"),
    )
    priors = zstats.groupBy(batch_col).agg(
        F.avg("gamma_hat").alias("gamma_bar"),
        F.var_samp("gamma_hat").alias("tau2"),
        F.avg("delta_hat2").alias("d_m"),
        F.var_samp("delta_hat2").alias("d_s2"),
    ).withColumn(
        "a_prior", (2 * F.col("d_s2") + F.pow("d_m", 2)) / F.col("d_s2")
    ).withColumn(
        "b_prior", (F.col("d_m") * F.col("d_s2") + F.pow("d_m", 3)) / F.col("d_s2")
    )

    joined = zstats.join(F.broadcast(priors), on=batch_col)

    def per_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        n = pdf["n"].to_numpy(dtype=float)
        ghat = pdf["gamma_hat"].to_numpy(dtype=float)
        dhat = pdf["delta_hat2"].to_numpy(dtype=float)
        sz = pdf["sum_z"].to_numpy(dtype=float)
        sz2 = pdf["sum_z2"].to_numpy(dtype=float)
        gbar = float(pdf["gamma_bar"].iloc[0])
        t2 = float(pdf["tau2"].iloc[0])
        a = float(pdf["a_prior"].iloc[0])
        b = float(pdf["b_prior"].iloc[0])
        g_old, d_old = ghat.copy(), dhat.copy()
        for _ in range(max_iter):
            g_new = (t2 * n * ghat + d_old * gbar) / (t2 * n + d_old)
            sum2 = sz2 - 2.0 * g_new * sz + n * g_new * g_new
            d_new = (0.5 * sum2 + b) / (n / 2.0 + a - 1.0)
            change = max(np.nanmax(np.abs(g_new - g_old) / np.abs(g_old + 1e-30)),
                         np.nanmax(np.abs(d_new - d_old) / np.abs(d_old + 1e-30)))
            g_old, d_old = g_new, d_new
            if change < conv:
                break
        return pd.DataFrame({
            batch_col: pdf[batch_col], "feature": pdf["feature"],
            "gamma_star": g_old, "delta_star2": d_old,
        })

    eb = joined.groupBy(batch_col).applyInPandas(
        per_batch,
        schema=f"{batch_col} string, feature string, "
               "gamma_star double, delta_star2 double",
    )
    out = (
        z.join(F.broadcast(eb), on=[batch_col, "feature"])
        .withColumn(
            "value",
            (F.col("z") - F.col("gamma_star")) / F.sqrt(F.col("delta_star2"))
            * F.sqrt(F.col("var_pooled")) + F.col("stand_mean"),
        )
    )
    keep = df.columns
    return out.select(*keep)


# -- survival analysis (kaplan_meierAnalysis.py run_km:3080 analog) ------------

def run_kaplan_meier(df: DataFrame, time_col: str = "duration",
                     event_col: str = "event",
                     group_col: str = "group") -> DataFrame:
    """Kaplan-Meier product-limit survival curves per group (reference
    run_km via lifelines KaplanMeierFitter; here the estimator itself, no
    plotting layer).

    Input: one row per subject with (group, duration, event 0/1 — 1 =
    event observed, 0 = right-censored). Output: one row per (group,
    distinct time) with n_at_risk, d (events at t) and the survival
    estimate S(t) = prod_{t' <= t} (1 - d/n_at_risk), computed as
    exp(cumsum(ln ...)) so the cumulative product is a window aggregate.

    Scale note: windows are PARTITIONED BY group (never empty-partition);
    cohort-survival group counts are dictionary-scale, and the windowed
    table is the (group x distinct-time) aggregate, not the subject table.
    """
    per_t = df.groupBy(group_col, time_col).agg(
        F.sum(F.col(event_col).cast("int")).alias("d"),
        F.count(F.lit(1)).alias("c"),
    )
    totals = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n_g"))
    w_before = (Window.partitionBy(group_col).orderBy(time_col)
                .rowsBetween(Window.unboundedPreceding, -1))
    w_upto = (Window.partitionBy(group_col).orderBy(time_col)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        per_t.join(F.broadcast(totals), on=group_col)
        .withColumn("n_at_risk",
                    F.col("_n_g") - F.coalesce(F.sum("c").over(w_before), F.lit(0)))
        .withColumn("_lnterm",
                    F.when(F.col("d") < F.col("n_at_risk"),
                           F.log(F.lit(1.0) - F.col("d") / F.col("n_at_risk"))))
        .withColumn("_zero",
                    F.max((F.col("d") >= F.col("n_at_risk")).cast("int")).over(w_upto))
        .withColumn("survival",
                    F.when(F.col("_zero") == 1, F.lit(0.0))
                    .otherwise(F.exp(F.coalesce(F.sum("_lnterm").over(w_upto),
                                                F.lit(0.0)))))
        .select(group_col, time_col, "n_at_risk", "d", "survival")
    )


def logrank_test(df: DataFrame, time_col: str = "duration",
                 event_col: str = "event",
                 group_col: str = "group") -> tuple:
    """Multivariate logrank test across k groups (reference:
    lifelines.statistics.multivariate_logrank_test in
    kaplan_meierAnalysis.py:70). Returns (chi2, dof, pvalue).

    The distributed part aggregates raw subjects to per-(time, group)
    event/censor counts (one shuffle); the O-E vector and k x k covariance
    accumulation run on the driver over that aggregate — (distinct times x
    groups) rows, dictionary-scale by time resolution — mirroring how every
    scalar-statistic operator here keeps Python off the data path.
    """
    import numpy as np

    from ..functions.stats import chi2_sf

    counts = (
        df.groupBy(time_col, group_col)
        .agg(F.sum(F.col(event_col).cast("int")).alias("d"),
             F.count(F.lit(1)).alias("c"))
        .collect()
    )
    groups = sorted({r[group_col] for r in counts})
    gi = {g: i for i, g in enumerate(groups)}
    k = len(groups)
    if k < 2:
        return (float("nan"), 0, float("nan"))
    times = sorted({r[time_col] for r in counts})
    d_mat = np.zeros((len(times), k))
    c_mat = np.zeros((len(times), k))
    ti = {t: i for i, t in enumerate(times)}
    for r in counts:
        d_mat[ti[r[time_col]], gi[r[group_col]]] = r["d"]
        c_mat[ti[r[time_col]], gi[r[group_col]]] = r["c"]
    n_g = c_mat.sum(axis=0)            # subjects per group
    at_risk = n_g - np.vstack([np.zeros(k), np.cumsum(c_mat, axis=0)[:-1]])
    Z = np.zeros(k)
    V = np.zeros((k, k))
    for t in range(len(times)):
        n_t = at_risk[t].sum()
        d_t = d_mat[t].sum()
        if n_t <= 1 or d_t == 0:
            Z += d_mat[t] - d_t * at_risk[t] / n_t if n_t > 0 else 0.0
            continue
        e_t = d_t * at_risk[t] / n_t
        Z += d_mat[t] - e_t
        frac = at_risk[t] / n_t
        vt = (np.diag(frac) - np.outer(frac, frac)) * d_t * (n_t - d_t) / (n_t - 1)
        V += vt
    Zr, Vr = Z[:-1], V[:-1, :-1]       # drop one group (singular otherwise)
    try:
        chi2 = float(Zr @ np.linalg.solve(Vr, Zr))
    except np.linalg.LinAlgError:
        return (float("nan"), k - 1, float("nan"))
    return (chi2, k - 1, chi2_sf(chi2, k - 1))


# -- ssGSEA (analytics.py run_ssgsea:2445, via gseapy; Barbie et al. 2009) -----

def run_ssgsea(df: DataFrame, annotations: DataFrame, alpha: float = 0.25,
               min_size: int = 2, max_size: int = 500) -> DataFrame:
    """Single-sample GSEA projection: per (subject, annotation) enrichment
    score, plus range-normalized NES (gseapy-style: ES / (max ES - min ES)
    over the whole projection).

    Algebraic reduction (what makes this one aggregation instead of a
    per-sample running-sum walk): Barbie's ES is the sum over all ranked
    positions i of [P_hit(i) - P_miss(i)], with
    P_hit(i) = sum_{j in S, r_j <= i} w_j / W_S and
    P_miss(i) = #{j not in S, r_j <= i} / (N - |S|). Each feature j
    contributes its term once for every position i >= r_j, i.e. exactly
    (N - r_j + 1) times, so

        ES = sum_{j in S} w_j (N - r_j + 1) / W_S
           - [N(N+1)/2 - sum_{j in S} (N - r_j + 1)] / (N - |S|)

    — only IN-SET rows are ever aggregated (broadcast semi/inner join with
    the annotation table), and the miss mass falls out of the per-subject
    constant N(N+1)/2. Weights follow gseapy's rank norm:
    w_j = (N - r_j + 1)^alpha with r_j the descending-value rank.
    One shuffle (per-subject rank window is partitioned by subject); the
    (subject x annotation) output is the natural result size.
    """
    w_rank = Window.partitionBy("subject").orderBy(
        F.col("value").desc(), F.col("feature").asc())
    ranked = (
        df.where(F.col("value").isNotNull())
        .withColumn("_r", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("subject")))
        .withColumn("_pos", F.col("_n") - F.col("_r") + 1)      # N - r + 1
        .withColumn("_w", F.pow(F.col("_pos").cast("double"), F.lit(alpha)))
    )
    ann = annotations.select("feature", "annotation").distinct()
    sizes = ann.groupBy("annotation").agg(F.count(F.lit(1)).alias("_gs"))
    keep = sizes.where((F.col("_gs") >= min_size) & (F.col("_gs") <= max_size))
    ann = ann.join(F.broadcast(keep.select("annotation")), on="annotation")

    hits = ranked.join(F.broadcast(ann), on="feature")
    per = hits.groupBy("subject", "annotation").agg(
        F.sum(F.col("_w") * F.col("_pos")).alias("_hit_mass"),
        F.sum("_w").alias("_w_s"),
        F.sum("_pos").alias("_hit_pos"),
        F.count(F.lit(1)).alias("_s"),
        F.first("_n").alias("_n"),
    )
    es = per.select(
        "subject", "annotation",
        (
            F.col("_hit_mass") / F.col("_w_s")
            - (F.col("_n") * (F.col("_n") + 1) / 2.0 - F.col("_hit_pos"))
              / (F.col("_n") - F.col("_s"))
        ).alias("es"),
    )
    rng = es.agg((F.max("es") - F.min("es")).alias("r")).collect()[0]["r"]
    scale = rng if rng else 1.0
    return es.withColumn("nes", F.col("es") / F.lit(float(scale)))


# -- repeated-measures correlation (run_rm_correlation, analytics.py:1351) ----

def run_rm_correlation(df: DataFrame, sample_col: str = "sample",
                       alpha: float = 0.05, min_dof: int = 1) -> DataFrame:
    """Pairwise repeated-measures correlation (pingouin rm_corr semantics,
    reference calculate_rm_correlation:1312: ANCOVA y ~ C(subject) + x).

    Identity used: the rm correlation equals the Pearson correlation of the
    WITHIN-SUBJECT-CENTERED series, with residual dof = N - k - 1
    (N measurements on the pair, k subjects) — the ANCOVA subject factor is
    exactly the within-subject mean removal, so no per-pair OLS fit is
    needed. One window for centering (partitioned by subject, feature), one
    self-join on (subject, sample), one corr() aggregation; the p-value
    (one-sided, x0.5 as the reference does) maps over the aggregated pair
    table via an Arrow-batched UDF. BH correction reuses the scale-safe
    bh_correction.

    Output mirrors the reference edge list: (node1, node2, weight, dof,
    pvalue, padj, rejected).
    """
    w = Window.partitionBy("subject", "feature")
    c = df.where(F.col("value").isNotNull()).withColumn(
        "_vc", F.col("value") - F.avg("value").over(w))
    a = c.select("subject", F.col(sample_col).alias("_smp"),
                 F.col("feature").alias("node1"), F.col("_vc").alias("_x"))
    b = c.select("subject", F.col(sample_col).alias("_smp"),
                 F.col("feature").alias("node2"), F.col("_vc").alias("_y"))
    pairs = (
        a.join(b, on=["subject", "_smp"])
        .where(F.col("node1") < F.col("node2"))
        .groupBy("node1", "node2")
        .agg(
            F.corr("_x", "_y").alias("weight"),
            F.count(F.lit(1)).alias("_n"),
            F.countDistinct("subject").alias("_k"),
        )
        .withColumn("dof", (F.col("_n") - F.col("_k") - 1).cast("long"))
        .where((F.col("dof") >= min_dof) & F.col("weight").isNotNull())
        .withColumn(
            "_t",
            F.col("weight") * F.sqrt(
                F.col("dof") / (F.lit(1.0) - F.col("weight") * F.col("weight"))),
        )
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def one_sided_p(t: pd.Series, dof: pd.Series) -> pd.Series:
        return pd.Series(
            [0.5 * ST.t_sf(abs(ti), float(di)) for ti, di in zip(t, dof)])

    scored = pairs.withColumn(
        "pvalue", one_sided_p(F.col("_t"), F.col("dof"))
    ).select("node1", "node2", "weight", "dof", "pvalue")
    return bh_correction(scored, alpha=alpha, tiebreak=["node1", "node2"])


# -- co-expression network modules (WGCNA-core analog; reference dispatches
# -- 'wgcna' to the R library — here the network-construction core only) ------

def coexpression_modules(df: DataFrame, beta: float = 6.0,
                         adjacency_threshold: float = 0.5,
                         min_n: int = 3,
                         min_module_size: int = 2,
                         method: str = "cc",
                         cut_height: float = 0.99) -> DataFrame:
    """Weighted co-expression network + module detection (reference
    'wgcna' dispatch -> R WGCNA, wgcnaAnalysis.py:250-302).

    ``method='cc'`` (default, fully distributed): soft-threshold adjacency
    a_ij = |corr(i,j)|^beta, modules = connected components over edges with
    a_ij >= threshold — one subject-keyed self-join + corr() aggregation
    and the distributed connected-components operator.

    ``method='treecut'`` (round 4): the reference's actual chain —
    adjacency -> topological overlap matrix (WGCNA TOMsimilarity formula)
    -> dissTOM -> average-linkage dendrogram -> static tree cut at
    ``cut_height`` (R cutreeDynamic method='tree' core; the adaptive
    'hybrid' branch-pruning refinement stays declared out). Correlations
    are computed distributively; the FxF TOM is dictionary-scale over the
    FEATURES dimension and runs on the driver, guarded.

    Output: (feature, module, module_size); module = lexicographic min
    feature of the group (deterministic at any parallelism). Features in
    groups below ``min_module_size`` are unassigned (WGCNA's grey) and
    filtered.
    """
    if method == "treecut":
        return _treecut_modules(df, beta=beta, min_n=min_n,
                                min_module_size=min_module_size,
                                cut_height=cut_height)
    from .canonicalize import connected_components

    corr = pairwise_correlation(df, min_n=min_n)
    edges = (
        corr.withColumn("_a", F.pow(F.abs("corr"), F.lit(beta)))
        .where(F.col("_a") >= adjacency_threshold)
        .select(F.col("fa").alias("ident_a"), F.col("fb").alias("ident_b"))
    )
    comps = connected_components(edges)
    sizes = comps.groupBy("component").agg(F.count(F.lit(1)).alias("module_size"))
    return (
        comps.join(sizes, on="component")
        .where(F.col("module_size") >= min_module_size)
        .select(F.col("ident").alias("feature"),
                F.col("component").alias("module"), "module_size")
    )


DRIVER_TOM_MAX_FEATURES = 3_000


def tom_similarity(A: "np.ndarray") -> "np.ndarray":
    """Unsigned topological overlap matrix (Zhang & Horvath 2005; the
    WGCNA.TOMsimilarity formula): TOM_ij = (L_ij + a_ij) /
    (min(k_i, k_j) + 1 - a_ij) with L_ij = sum_u a_iu a_uj over u != i, j
    and k_i = sum_u!=i a_iu; TOM_ii = 1."""
    import numpy as np

    A = A.copy()
    np.fill_diagonal(A, 0.0)
    k = A.sum(axis=1)
    L = A @ A  # diag(A)=0 makes this exactly sum over u != i (and != j on
    # the off-diagonal terms where a_jj = 0)
    kmin = np.minimum(k[:, None], k[None, :])
    with np.errstate(divide="ignore", invalid="ignore"):
        tom = (L + A) / (kmin + 1.0 - A)
    tom = np.nan_to_num(tom, nan=0.0)
    np.fill_diagonal(tom, 1.0)
    return tom


def _average_linkage_cut(D: "np.ndarray", cut_height: float) -> list:
    """Average-linkage agglomeration (Lance-Williams size-weighted update)
    stopped at ``cut_height`` — R `cutreeStatic(flashClust(d, 'average'))`
    semantics: clusters are the branches entirely below the cut. Returns a
    list of index lists."""
    import numpy as np

    m = D.shape[0]
    D = D.astype(float).copy()
    np.fill_diagonal(D, np.inf)
    active = list(range(m))
    members = {i: [i] for i in range(m)}
    while len(active) > 1:
        sub = D[np.ix_(active, active)]
        flat = np.argmin(sub)
        ai, aj = divmod(flat, len(active))
        i, j = active[ai], active[aj]
        if D[i, j] > cut_height:
            break
        if i > j:
            i, j = j, i
        ni, nj = len(members[i]), len(members[j])
        newd = (ni * D[i] + nj * D[j]) / (ni + nj)
        D[i, :] = newd
        D[:, i] = newd
        D[i, i] = np.inf
        members[i].extend(members.pop(j))
        active.remove(j)
    return [sorted(members[i]) for i in sorted(active)]


def _treecut_modules(df: DataFrame, beta: float, min_n: int,
                     min_module_size: int, cut_height: float) -> DataFrame:
    import numpy as np

    spark = df.sparkSession
    cap = DRIVER_TOM_MAX_FEATURES
    if df.select("feature").distinct().limit(cap + 1).count() > cap:
        raise ValueError(
            f"treecut WGCNA needs the dense FxF TOM; > {cap} distinct "
            f"features. Use method='cc' (distributed) or pre-filter "
            f"features (WGCNA's own sd_cutoff step).")
    corr = pairwise_correlation(df, min_n=min_n).collect()
    feats = sorted({r["fa"] for r in corr} | {r["fb"] for r in corr})
    if not feats:
        return spark.createDataFrame(
            [], "feature string, module string, module_size int")
    idx = {f: i for i, f in enumerate(feats)}
    n = len(feats)
    A = np.zeros((n, n))
    for r in corr:
        a = abs(float(r["corr"])) ** beta
        A[idx[r["fa"]], idx[r["fb"]]] = A[idx[r["fb"]], idx[r["fa"]]] = a
    diss = 1.0 - tom_similarity(A)
    groups = _average_linkage_cut(diss, cut_height)
    rows = []
    for g in groups:
        if len(g) < min_module_size:
            continue  # WGCNA grey: unassigned
        names = [feats[i] for i in g]
        label = min(names)
        rows.extend((f, label, len(names)) for f in sorted(names))
    return spark.createDataFrame(
        sorted(rows), "feature string, module string, module_size int")


def module_eigengenes(df: DataFrame, modules: DataFrame) -> DataFrame:
    """Module eigengenes (reference wgcnaAnalysis.py:304
    calculate_module_eigengenes -> WGCNA.moduleEigengenes): the first
    principal component of each module's standardized samples x features
    slice, sign-aligned with the module's average expression (WGCNA's
    align='along average').

    Distributed the Spark way: one broadcast join tagging each long row
    with its module, then ``groupBy(module).applyInPandas`` — each module's
    slice is cohort-scale and independent. Output:
    (module, subject, eigengene)."""
    tagged = df.join(F.broadcast(modules.select("feature", "module")),
                     on="feature")

    def per_module(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        wide = (pdf.pivot_table(index="subject", columns="feature",
                                values="value", aggfunc="mean")
                .sort_index())
        X = wide.to_numpy(dtype=float)
        X = np.where(np.isnan(X), np.nanmean(X, axis=0), X)
        sd = X.std(axis=0, ddof=1)
        sd[sd == 0] = 1.0
        Z = (X - X.mean(axis=0)) / sd
        U, S, Vt = np.linalg.svd(Z, full_matrices=False)
        pc1 = U[:, 0] * S[0]
        avg = Z.mean(axis=1)
        if np.dot(pc1, avg) < 0:
            pc1 = -pc1
        return pd.DataFrame({"module": pdf["module"].iloc[0],
                             "subject": wide.index,
                             "eigengene": pc1})

    return tagged.groupBy("module").applyInPandas(
        per_module, schema="module string, subject string, eigengene double")


def merge_close_modules(df: DataFrame, modules: DataFrame,
                        me_diss_thres: float = 0.25) -> DataFrame:
    """Reference merge_similar_modules (wgcnaAnalysis.py:332 ->
    WGCNA.mergeCloseModules): modules whose eigengene dissimilarity
    1 - cor(ME_i, ME_j) falls below ``me_diss_thres`` merge. Eigengene
    computation distributes per module; the merge decision runs on the
    dictionary-scale modules x modules correlation (average-linkage cut at
    the threshold, mergeCloseModules' clustering). Returns the relabeled
    (feature, module, module_size) table, labels = min member feature."""
    import numpy as np

    mes = module_eigengenes(df, modules).collect()
    by_mod: dict = {}
    for r in mes:
        by_mod.setdefault(r["module"], {})[r["subject"]] = r["eigengene"]
    mods = sorted(by_mod)
    if not mods:
        return modules.sparkSession.createDataFrame(
            [], "feature string, module string, module_size int")
    subjects = sorted({s for d in by_mod.values() for s in d})
    M = np.array([[by_mod[m].get(s, 0.0) for s in subjects] for m in mods])
    C = np.corrcoef(M) if len(mods) > 1 else np.ones((1, 1))
    D = 1.0 - np.nan_to_num(C, nan=0.0)
    np.fill_diagonal(D, 0.0)
    groups = _average_linkage_cut(D, me_diss_thres)
    remap = {}
    for g in groups:
        names = [mods[i] for i in g]
        label = min(names)
        for nm in names:
            remap[nm] = label
    spark = modules.sparkSession
    remap_df = spark.createDataFrame(
        sorted(remap.items()), "module string, merged string")
    out = (modules.join(F.broadcast(remap_df), on="module")
           .select("feature", F.col("merged").alias("module")))
    sizes = out.groupBy("module").agg(F.count(F.lit(1)).alias("module_size"))
    return out.join(sizes, on="module").select(
        "feature", "module", "module_size")


def pick_soft_threshold(df: DataFrame, r2_cut: float = 0.8,
                        powers: "list[int] | None" = None,
                        min_n: int = 3, n_breaks: int = 10) -> int:
    """Reference pick_softThreshold (wgcnaAnalysis.py:272 ->
    WGCNA.pickSoftThreshold): lowest power whose signed scale-free
    topology fit R^2 exceeds ``r2_cut``. The pairwise correlations are
    computed distributively ONCE (adjacency = |corr|^power needs no
    recomputation per power); the degree-distribution fit
    (WGCNA scaleFreeFitIndex: bin k, regress log10 p(k) on log10 mean k,
    signed R^2 = -sign(slope) * R^2) runs on the features-scale vector.
    Returns the chosen power (falls back to the max power if none meet
    the cut, as the R tool's powerEstimate=NA callers conventionally do)."""
    import numpy as np

    powers = list(powers) if powers is not None else list(range(1, 20))
    cap = DRIVER_TOM_MAX_FEATURES
    if df.select("feature").distinct().limit(cap + 1).count() > cap:
        raise ValueError(
            f"pick_soft_threshold collects the FxF correlations; > {cap} "
            f"distinct features. Pre-filter features first.")
    corr = pairwise_correlation(df, min_n=min_n).collect()
    feats = sorted({r["fa"] for r in corr} | {r["fb"] for r in corr})
    idx = {f: i for i, f in enumerate(feats)}
    n = len(feats)
    if n < 3:
        return powers[0]
    base = np.zeros((n, n))
    for r in corr:
        c = abs(float(r["corr"]))
        base[idx[r["fa"]], idx[r["fb"]]] = base[idx[r["fb"]], idx[r["fa"]]] = c

    def signed_r2(power: int) -> float:
        k = (base ** power).sum(axis=1)
        if k.max() <= 0:
            return 0.0
        cuts = np.linspace(k.min(), k.max(), n_breaks + 1)
        cuts[-1] += 1e-9
        pk, dk = [], []
        for lo, hi in zip(cuts[:-1], cuts[1:]):
            mask = (k >= lo) & (k < hi)
            if mask.sum() == 0:
                continue
            pk.append(mask.mean())
            dk.append(k[mask].mean())
        if len(pk) < 2:
            return 0.0
        x = np.log10(np.maximum(dk, 1e-12))
        y = np.log10(np.maximum(pk, 1e-12))
        slope, intercept = np.polyfit(x, y, 1)
        yhat = slope * x + intercept
        ss_res = ((y - yhat) ** 2).sum()
        ss_tot = ((y - y.mean()) ** 2).sum()
        r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
        return -np.sign(slope) * r2

    for p in powers:
        if signed_r2(p) >= r2_cut:
            return int(p)
    return int(powers[-1])


# -- SAM (significance analysis of microarrays; reference 'samr' dispatch) ----

def _sam_d_stats(df: DataFrame, group_a: str, group_b: str,
                 s0: float) -> DataFrame:
    """Moderated t per feature: d = (mean_a - mean_b) / (se + s0) — pure
    JVM aggregations (one groupBy)."""
    stats = (
        df.where(F.col("group").isin([group_a, group_b]))
        .groupBy("feature")
        .agg(
            F.avg(F.when(F.col("group") == group_a, F.col("value"))).alias("ma"),
            F.avg(F.when(F.col("group") == group_b, F.col("value"))).alias("mb"),
            F.var_samp(F.when(F.col("group") == group_a, F.col("value"))).alias("va"),
            F.var_samp(F.when(F.col("group") == group_b, F.col("value"))).alias("vb"),
            F.count(F.when(F.col("group") == group_a, 1)).alias("na"),
            F.count(F.when(F.col("group") == group_b, 1)).alias("nb"),
        )
        .where((F.col("na") >= 2) & (F.col("nb") >= 2))
    )
    vp = (((F.col("na") - 1) * F.col("va") + (F.col("nb") - 1) * F.col("vb"))
          / (F.col("na") + F.col("nb") - 2))
    se = F.sqrt(vp * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    return stats.select(
        "feature", se.alias("se"),
        ((F.col("ma") - F.col("mb")) / (se + F.lit(s0))).alias("d"),
    )


def _sam_perm_d(sub: DataFrame, group_a: str, group_b: str, s0: float,
                permutations: int, seed: int) -> DataFrame:
    """Permuted SAM d statistics: (perm, feature, d). The permuted group
    assignment is a broadcast (perm, subject) -> group table built with a
    seeded driver RNG over the SORTED subject list (deterministic across
    partitionings); the data-scale work — one groupBy over
    values x permutations — stays distributed."""
    import numpy as np

    spark = sub.sparkSession
    subj_groups = sorted(
        (r["subject"], r["group"])
        for r in sub.select("subject", "group").distinct().collect()
    )
    subjects = [s for s, _ in subj_groups]
    groups = [g for _, g in subj_groups]
    rows = []
    for p in range(permutations):
        rng = np.random.default_rng((seed, p))
        perm = rng.permutation(len(groups))
        rows.extend((p, subjects[i], groups[perm[i]]) for i in range(len(groups)))
    perm_df = spark.createDataFrame(rows, "perm int, subject string, pgroup string")
    permuted = (
        sub.join(F.broadcast(perm_df), on="subject")
        .select("perm", F.col("pgroup").alias("group"), "feature", "value")
    )
    rand_d = (
        permuted.groupBy("perm", "feature")
        .agg(
            F.avg(F.when(F.col("group") == group_a, F.col("value"))).alias("ma"),
            F.avg(F.when(F.col("group") == group_b, F.col("value"))).alias("mb"),
            F.var_samp(F.when(F.col("group") == group_a, F.col("value"))).alias("va"),
            F.var_samp(F.when(F.col("group") == group_b, F.col("value"))).alias("vb"),
            F.count(F.when(F.col("group") == group_a, 1)).alias("na"),
            F.count(F.when(F.col("group") == group_b, 1)).alias("nb"),
        )
        .where((F.col("na") >= 2) & (F.col("nb") >= 2))
    )
    vp = (((F.col("na") - 1) * F.col("va") + (F.col("nb") - 1) * F.col("vb"))
          / (F.col("na") + F.col("nb") - 2))
    se = F.sqrt(vp * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    return rand_d.select(
        "perm", "feature",
        ((F.col("ma") - F.col("mb")) / (se + F.lit(s0))).alias("d"))


def samr_delta_table(df: DataFrame, group_a: str, group_b: str,
                     permutations: int = 50, seed: int = 0,
                     s0: "float | str | None" = None,
                     n_deltas: int = 30) -> DataFrame:
    """samr's order-statistic delta banding (R samr samr.compute.delta.table
    + detec.slab; previously the one declared-out simplification of
    ``run_samr``): sort observed d, average the per-permutation order
    statistics into the expected quantiles dbar, and for each delta in a
    grid find the slab cuts — cutup = d at the FIRST sorted position where
    d - dbar > delta with dbar > 0, cutlow = d at the LAST position where
    dbar - d > delta with dbar < 0 — then estimate FDR as
    pi0 * median_b #{d*_b beyond the cuts} / #called (plus the 90th
    percentile variant), with samr's pi0 = #{d inside the permuted d
    quartiles} / (0.5 m).

    Returns one row per delta:
    (delta, cutlow, cutup, n_called, n_false_med, n_false_90,
     fdr_med, fdr_90, pi0).

    Distribution: observed ranks use the two-pass global rank (no empty
    PARTITION BY); per-permutation order statistics use a window
    partitioned by perm; dbar is a rank-keyed aggregation; the delta grid
    (n_deltas rows) is the ONLY broadcast-cross multiplier — cut selection
    scans features x n_deltas and false counting scans
    (features x permutations) x n_deltas, both as JVM conditional
    aggregations. Driver-side data: s0, max|d - dbar|, and the rank
    offsets — all scalars/dictionary-scale. Ties in d follow sorted
    position (feature-id tiebreak), matching samr's positional slab."""
    sub = df.where(F.col("group").isin([group_a, group_b]))
    if s0 == "tune":
        probe = _sam_d_stats(sub, group_a, group_b, 0.0).select(
            (F.col("d") * F.col("se")).alias("r"), "se").collect()
        s0 = tune_s0([p["r"] for p in probe], [p["se"] for p in probe])
    elif s0 is None:
        probe = _sam_d_stats(sub, group_a, group_b, 0.0)
        s0 = float(probe.agg(
            F.percentile("se", F.lit(0.5)).alias("m")).collect()[0]["m"] or 0.0)

    observed = with_global_rank(
        _sam_d_stats(sub, group_a, group_b, s0).select("feature", "d"),
        [F.col("d").asc(), F.col("feature").asc()], "rank")
    rand = _sam_perm_d(sub, group_a, group_b, s0, permutations, seed)
    wperm = Window.partitionBy("perm").orderBy(F.col("d").asc(), F.col("feature").asc())
    dbar = (
        rand.withColumn("rank", F.row_number().over(wperm))
        .groupBy("rank").agg(F.avg("d").alias("dbar"))
    )
    joined = observed.join(dbar, on="rank", how="inner").select(
        "rank", "feature", "d", "dbar", (F.col("d") - F.col("dbar")).alias("diff"))
    from .ckpt import checkpoint_reset_stats
    joined = checkpoint_reset_stats(joined)  # reused by every delta branch

    spark = df.sparkSession
    agg = joined.agg(
        F.max(F.abs("diff")).alias("mx"), F.count(F.lit(1)).alias("m")).collect()[0]
    max_diff, m = float(agg["mx"] or 0.0), int(agg["m"])
    if m == 0:
        return spark.createDataFrame(
            [], "delta double, cutlow double, cutup double, n_called long, "
                "n_false_med double, n_false_90 double, fdr_med double, "
                "fdr_90 double, pi0 double")
    q = rand.agg(
        F.percentile("d", F.lit(0.25)).alias("q25"),
        F.percentile("d", F.lit(0.75)).alias("q75")).collect()[0]
    n_mid = joined.where(
        (F.col("d") > q["q25"]) & (F.col("d") < q["q75"])).count()
    pi0 = min(1.0, n_mid / (0.5 * m))

    deltas = [i * max_diff / max(n_deltas - 1, 1) for i in range(n_deltas)]
    delta_df = F.broadcast(spark.createDataFrame(
        [(float(d),) for d in deltas], "delta double"))
    up_rank = F.min(F.when((F.col("diff") > F.col("delta"))
                           & (F.col("dbar") > 0), F.col("rank")))
    lo_rank = F.max(F.when((F.col("dbar") - F.col("d") > F.col("delta"))
                           & (F.col("dbar") < 0), F.col("rank")))
    cuts = (
        joined.crossJoin(delta_df)
        .groupBy("delta")
        .agg(up_rank.alias("up_rank"), lo_rank.alias("lo_rank"),
             F.min(F.when((F.col("diff") > F.col("delta"))
                          & (F.col("dbar") > 0), F.col("d"))).alias("cutup"),
             F.max(F.when((F.col("dbar") - F.col("d") > F.col("delta"))
                          & (F.col("dbar") < 0), F.col("d"))).alias("cutlow"))
        .withColumn("n_called",
                    F.coalesce(F.lit(m) - F.col("up_rank") + 1, F.lit(0))
                    + F.coalesce(F.col("lo_rank"), F.lit(0)))
    )
    cuts = checkpoint_reset_stats(cuts)  # n_deltas rows; avoids re-scanning
    # the features x deltas cut selection once per downstream consumer
    beyond = (F.col("d") > F.col("cutup")) | (F.col("d") < F.col("cutlow"))
    false_counts = (
        rand.crossJoin(F.broadcast(cuts))
        .groupBy("delta", "perm")
        .agg(F.sum(F.when(beyond, 1).otherwise(0)).cast("double").alias("nf"))
        .groupBy("delta")
        .agg(F.percentile("nf", F.lit(0.5)).alias("n_false_med"),
             F.percentile("nf", F.lit(0.9)).alias("n_false_90"))
    )
    return (
        cuts.join(false_counts, on="delta", how="inner")
        .select(
            "delta",
            F.col("cutlow").cast("double"), F.col("cutup").cast("double"),
            F.col("n_called").cast("long"),
            "n_false_med", "n_false_90",
            F.when(F.col("n_called") > 0,
                   F.lit(pi0) * F.col("n_false_med") / F.col("n_called"))
             .otherwise(0.0).alias("fdr_med"),
            F.when(F.col("n_called") > 0,
                   F.lit(pi0) * F.col("n_false_90") / F.col("n_called"))
             .otherwise(0.0).alias("fdr_90"),
            F.lit(pi0).alias("pi0"),
        )
        .orderBy("delta")
    )


def tune_s0(r, se) -> float:
    """samr's s0 selection (Tusher/Chu; R samr est.s0): candidates are the
    0, 5, ..., 100 percentiles of the per-feature se; for each candidate,
    bin features into (up to) 100 se-quantile groups, compute the scaled
    MAD of d = r/(se + s0) per bin (MAD/0.64), and pick the candidate
    minimizing the coefficient of variation of those bin MADs — the s0
    that makes the d-statistic's spread independent of expression level.
    Runs on the dictionary-scale per-feature summary (features, not rows).
    """
    import numpy as np

    r = np.asarray(r, dtype=float)
    se = np.asarray(se, dtype=float)
    ok = np.isfinite(r) & np.isfinite(se)
    r, se = r[ok], se[ok]
    if se.size < 5:
        return float(np.median(se)) if se.size else 0.0
    cands = np.percentile(se, np.arange(0, 101, 5))
    n_bins = min(100, max(2, se.size // 5))
    qs = np.quantile(se, np.linspace(0, 1, n_bins + 1))
    qs[-1] += 1e-12
    bin_of = np.clip(np.searchsorted(qs, se, side="right") - 1,
                     0, n_bins - 1)
    best_s0, best_cv = float(cands[0]), np.inf
    for cand in cands:
        d = r / (se + cand)
        mads = []
        for b in range(n_bins):
            db = d[bin_of == b]
            if db.size >= 2:
                mads.append(np.median(np.abs(db - np.median(db))) / 0.64)
        mads = np.array(mads)
        if mads.size < 2 or mads.mean() == 0:
            continue
        cv = mads.std(ddof=1) / mads.mean()
        if cv < best_cv - 1e-12:
            best_cv, best_s0 = cv, float(cand)
    return best_s0


def run_samr(df: DataFrame, group_a: str, group_b: str,
             permutations: int = 50, seed: int = 0,
             s0: "float | str | None" = None, alpha: float = 0.05) -> DataFrame:
    """SAM-style permutation analysis (reference dispatches 'samr' to the R
    package; this is the method's core: Tusher et al. 2001 moderated
    t-statistic d = (mean_a - mean_b)/(se + s0) with permutation-estimated
    q-values. s0 defaults to the median per-feature standard error;
    ``s0='tune'`` runs the R package's actual percentile tuning
    (``tune_s0``, CV-of-binned-MADs minimization). Per-feature q here is
    the plain permutation FDR q(|d|) = (E#{|d*| >= |d|}) / #{|d| >= |d|};
    the R package's order-statistic delta banding is ``samr_delta_table``
    (factory: ``samr`` with ``delta_table=True``).

    Distribution: d statistics are one JVM aggregation; permuted labels are
    a broadcast (subjects x permutations) table; q-value counting runs as
    two-pass global cumulative sums over distinct |d| values (no
    empty-PARTITION-BY window) — same shape as ``permutation_fdr``.
    """
    import numpy as np

    spark = df.sparkSession
    sub = df.where(F.col("group").isin([group_a, group_b]))
    if s0 == "tune":
        probe = _sam_d_stats(sub, group_a, group_b, 0.0).select(
            (F.col("d") * F.col("se")).alias("r"), "se").collect()
        s0 = tune_s0([p["r"] for p in probe], [p["se"] for p in probe])
    elif s0 is None:
        probe = _sam_d_stats(sub, group_a, group_b, 0.0)
        s0 = float(probe.agg(
            F.percentile("se", F.lit(0.5)).alias("m")).collect()[0]["m"] or 0.0)

    observed = _sam_d_stats(sub, group_a, group_b, s0).select(
        "feature", "d", F.abs("d").alias("_ad"))

    rand_ad = _sam_perm_d(sub, group_a, group_b, s0, permutations, seed).select(
        F.abs("d").alias("_ad"))

    # counts of {rand |d*| >= x} and {observed |d| >= x} per distinct x:
    # descending cumulative sums via the two-pass global cumsum
    rc = rand_ad.groupBy("_ad").agg(F.count(F.lit(1)).cast("double").alias("nr"))
    oc = observed.groupBy("_ad").agg(F.count(F.lit(1)).cast("double").alias("no"))
    merged = rc.join(oc, on="_ad", how="full").fillna(0.0, subset=["nr", "no"])
    cum = with_global_cumsum(merged, [F.col("_ad").desc()], "nr", "_cr")
    cum = with_global_cumsum(cum, [F.col("_ad").desc()], "no", "_co")
    return (
        observed.join(cum.select("_ad", "_cr", "_co"), on="_ad")
        .withColumn("qvalue", F.least(
            (F.col("_cr") / F.lit(float(permutations))) / F.col("_co"),
            F.lit(1.0)))
        .withColumn("rejected", F.col("qvalue") <= alpha)
        .select("feature", "d", "qvalue", "rejected")
    )


# -- bootstrap effect sizes (reference 'dabest' dispatch; estimation core) ----

def bootstrap_effect_sizes(df: DataFrame, group_a: str, group_b: str,
                           n_boot: int = 200, seed: int = 0,
                           ci: float = 0.95) -> DataFrame:
    """Estimation-statistics core of the reference's 'dabest' dispatch
    (Gardner-Altman / Ho et al. 2019): per-feature mean difference with a
    bootstrap percentile confidence interval. The plotting layer (swarm +
    bootstrap-curve panels) is out of scope; the numbers under it are not.

    Distribution: bootstrap resampling of SUBJECTS with replacement is a
    (boot, subject) -> multinomial-weight table — subjects x n_boot,
    dictionary-scale, generated with a seeded driver RNG and broadcast.
    Every bootstrap replicate's group means are then weighted JVM
    aggregations over one pass of the data (no per-replicate scan), and the
    CI is a percentile aggregate per feature.
    """
    import numpy as np

    spark = df.sparkSession
    sub = df.where(F.col("group").isin([group_a, group_b]))
    subj_groups = sorted(
        (r["subject"], r["group"])
        for r in sub.select("subject", "group").distinct().collect()
    )
    by_group: dict[str, list[str]] = {}
    for s, g in subj_groups:
        by_group.setdefault(g, []).append(s)
    rows = []
    for b in range(n_boot):
        rng = np.random.default_rng((seed, b))
        for g, subs in by_group.items():
            counts = rng.multinomial(len(subs), [1.0 / len(subs)] * len(subs))
            rows.extend((b, subs[i], int(c)) for i, c in enumerate(counts) if c)
    w = spark.createDataFrame(rows, "boot int, subject string, w int")

    boot_means = (
        sub.join(F.broadcast(w), on="subject")
        .groupBy("boot", "feature", "group")
        .agg((F.sum(F.col("w") * F.col("value")) / F.sum("w")).alias("m"))
    )
    diffs = (
        boot_means.groupBy("boot", "feature")
        .pivot("group", [group_a, group_b]).agg(F.first("m"))
        .withColumn("_diff", F.col(group_a) - F.col(group_b))
        .where(F.col("_diff").isNotNull())
    )
    lo, hi = (1.0 - ci) / 2.0, 1.0 - (1.0 - ci) / 2.0
    cis = diffs.groupBy("feature").agg(
        F.percentile("_diff", F.lit(lo)).alias("ci_low"),
        F.percentile("_diff", F.lit(hi)).alias("ci_high"),
    )
    observed = (
        sub.groupBy("feature").agg(
            F.avg(F.when(F.col("group") == group_a, F.col("value"))).alias("ma"),
            F.avg(F.when(F.col("group") == group_b, F.col("value"))).alias("mb"))
        .select("feature", (F.col("ma") - F.col("mb")).alias("mean_diff"))
    )
    return observed.join(cis, on="feature")


# -- normalization umbrella (normalize_data, analytics.py:394-623) ------------

def normalize_median_zero(df: DataFrame, by: str | list = "subject") -> DataFrame:
    """median_zero_normalization (analytics.py:460): value minus the axis
    median. `normalize_median` above already has exactly these semantics;
    this is the reference-named entry point."""
    return normalize_median(df, by=by)


def normalize_median_centered(df: DataFrame, by: str | list = "subject",
                              within: str | list | None = None) -> DataFrame:
    """median_normalization (analytics.py:481): subtract
    (axis median - grand median of the axis medians), recentring every
    sample's median on the common median instead of on zero. The grand
    median is an aggregate of the per-axis median table (one row per
    `within` group, or a single row) — broadcast join, no second data
    shuffle. `within` scopes the grand median so per-group normalization
    never leaks a level shift across groups."""
    keys = [by] if isinstance(by, str) else list(by)
    med = df.groupBy(keys).agg(F.percentile("value", F.lit(0.5)).alias("_med"))
    if within is not None:
        wkeys = [within] if isinstance(within, str) else list(within)
        grand = med.groupBy(wkeys).agg(
            F.percentile("_med", F.lit(0.5)).alias("_gmed"))
        joined = df.join(med, on=keys).join(F.broadcast(grand), on=wkeys)
    else:
        grand = med.agg(F.percentile("_med", F.lit(0.5)).alias("_gmed"))
        joined = df.join(med, on=keys).crossJoin(F.broadcast(grand))
    return (
        joined
        .withColumn("value", F.col("value") - (F.col("_med") - F.col("_gmed")))
        .drop("_med", "_gmed")
    )


def normalize_linear(df: DataFrame, by: str | list = "feature",
                     norm: str = "l1") -> DataFrame:
    """linear_normalization (analytics.py:596, sklearn preprocessing.normalize
    analog): scale each axis slice to unit L1/L2 norm; nulls contribute 0
    (the reference fillna(0)s first)."""
    keys = [by] if isinstance(by, str) else list(by)
    v = F.coalesce(F.col("value"), F.lit(0.0))
    agg = F.sum(F.abs(v)) if norm == "l1" else F.sqrt(F.sum(v * v))
    nrm = df.groupBy(keys).agg(agg.alias("_nrm"))
    return (
        df.join(nrm, on=keys)
        .withColumn(
            "value",
            F.when(F.col("_nrm") > 0, v / F.col("_nrm")).otherwise(F.lit(0.0)),
        )
        .drop("_nrm")
    )


def normalize_median_polish(df: DataFrame, max_iter: int = 250,
                            tol: float = 1e-9,
                            row_key: str | list = "subject",
                            col_key: str | list = "feature") -> DataFrame:
    """median_polish_normalization (analytics.py:536): Tukey's median polish.
    Returns the FIT (value - final residual), matching the reference's
    ``data - mediandf``.

    Distribution: each sweep is two grouped exact-median passes (per row
    key, then per column key) — fixed-key shuffles whose partitioning
    Catalyst reuses across the join-back. Residuals are eagerly
    localCheckpointed once per sweep to keep lineage flat across the driver
    loop; convergence (both axis medians ~ 0) is checked with one extra
    row-median aggregate per sweep (the column medians are exactly 0 right
    after the column pass). Median polish converges in a handful of sweeps
    on real matrices; max_iter matches the reference's backstop."""
    rkeys = [row_key] if isinstance(row_key, str) else list(row_key)
    ckeys = [col_key] if isinstance(col_key, str) else list(col_key)
    res = df.withColumn("_res", F.col("value"))
    for _ in range(max_iter):
        rm = res.groupBy(rkeys).agg(F.percentile("_res", F.lit(0.5)).alias("_rm"))
        res = (res.join(rm, on=rkeys)
               .withColumn("_res", F.col("_res") - F.col("_rm")).drop("_rm"))
        cm = res.groupBy(ckeys).agg(F.percentile("_res", F.lit(0.5)).alias("_cm"))
        res = (res.join(cm, on=ckeys)
               .withColumn("_res", F.col("_res") - F.col("_cm")).drop("_cm")
               .localCheckpoint(eager=True))
        worst_row_med = (
            res.groupBy(rkeys)
            .agg(F.abs(F.percentile("_res", F.lit(0.5))).alias("_m"))
            .agg(F.max("_m").alias("_mm")).collect()[0]["_mm"]
        )
        if worst_row_med is None or worst_row_med <= tol:
            break
    return (res.withColumn("value", F.col("value") - F.col("_res"))
            .drop("_res"))


def normalize_data(df: DataFrame, method: str = "median",
                   by: str | list = "subject") -> DataFrame:
    """normalize_data (analytics.py:417): method-name dispatch over the
    normalization family, same method strings as the reference."""
    if method == "median_polish":
        return normalize_median_polish(df)
    if method == "median_zero":
        return normalize_median_zero(df, by=by)
    if method == "median":
        return normalize_median_centered(df, by=by)
    if method == "quantile":
        return normalize_quantile(df, by=by)
    if method == "linear":
        return normalize_linear(df, by=by)
    if method == "zscore":
        return normalize_zscore(df, by=by)
    raise KeyError(f"unknown normalization method {method!r}")


def normalize_data_per_group(df: DataFrame, group: str = "group",
                             method: str = "median",
                             by: str = "subject") -> DataFrame:
    """normalize_data_per_group (analytics.py:394): every group normalizes
    independently. The reference loops groupby(group) on the driver; here
    the group column simply widens the normalization key — one shuffle
    total, groups never serialize."""
    if method == "quantile":
        # rank within (group, sample); rank means within (group, rank)
        w = Window.partitionBy(group, by).orderBy(
            F.col("value").asc(), F.col("feature").asc())
        ranked = df.where(F.col("value").isNotNull()).withColumn(
            "_rk", F.row_number().over(w))
        rank_means = ranked.groupBy(group, "_rk").agg(
            F.avg("value").alias("_rmean"))
        return (ranked.join(rank_means, on=[group, "_rk"])
                .withColumn("value", F.col("_rmean")).drop("_rk", "_rmean"))
    if method == "median_polish":
        return normalize_median_polish(
            df, row_key=[group, "subject"], col_key=[group, "feature"])
    if method == "median":
        return normalize_median_centered(df, by=[group, by], within=group)
    return normalize_data(df, method=method, by=[group, by])


# -- QC marker analysis (run_qc_markers_analysis, analytics.py:2975) ----------

def run_qc_markers_analysis(df: DataFrame, qc_markers: DataFrame,
                            class_col: str = "class") -> DataFrame:
    """run_qc_markers_analysis (analytics.py:2975): z-score each sample
    across its features (the reference's zscore default axis), keep the
    features present in the QC-marker table, tag each with its marker class
    (a feature in k classes emits k rows, matching the reference's
    per-class append loop).

    qc_markers: (feature, class) — dictionary-scale, broadcast."""
    z = normalize_zscore(df, by="subject")
    markers = qc_markers.select(
        "feature", F.col(class_col).alias("class")).distinct()
    return (
        z.join(F.broadcast(markers), on="feature")
        .select("feature", "subject",
                F.round(F.col("value"), 6).alias("z_score"),
                "group", "class")
    )


# -- ranking with markers (get_ranking_with_markers, analytics.py:177) --------

def get_ranking_with_markers(df: DataFrame, list_markers: list[str],
                             annotation: dict[str, str] | None = None
                             ) -> DataFrame:
    """get_ranking_with_markers (analytics.py:177): long-format (name, y)
    ranking decorated with marker plot attributes — symbol 17/size 25 for
    known markers (0/7 otherwise) and 'X marker in <disease>' display names
    for annotated ones. Marker list and annotation map are dictionary-scale
    -> broadcast join, no driver-side row loop."""
    ann = annotation or {}
    spark = df.sparkSession
    rows = [(m, ann.get(m)) for m in list_markers]
    out = df.select(
        "group", F.col("feature").alias("name"), F.col("value").alias("y")
    ).dropDuplicates()
    if not rows:
        return (out.withColumn("symbol", F.lit(0))
                .withColumn("size", F.lit(7)))
    mdf = spark.createDataFrame(rows, "name string, _disease string")
    mdf = mdf.withColumn("_is_marker", F.lit(True))
    return (
        out.join(F.broadcast(mdf), on="name", how="left")
        .withColumn("symbol",
                    F.when(F.col("_is_marker"), F.lit(17)).otherwise(F.lit(0)))
        .withColumn("size",
                    F.when(F.col("_is_marker"), F.lit(25)).otherwise(F.lit(7)))
        .withColumn(
            "name",
            F.when(F.col("_disease").isNotNull(),
                   F.concat(F.col("name"), F.lit(" marker in "),
                            F.col("_disease"))).otherwise(F.col("name")))
        .drop("_is_marker", "_disease")
    )


# -- functional PCA (analytics_factory.py:109) ---------------------------------

def run_functional_pca(df: DataFrame, annotations: DataFrame,
                       key: str = "nes", n_components: int = 2,
                       **ssgsea_kw) -> DataFrame:
    """functional_pca (analytics_factory.py:109-160): ssGSEA projection of
    the measurement matrix into annotation space, then PCA over the
    (subject x annotation) NES matrix. Pure composition of run_ssgsea and
    run_pca — inherits their one-shuffle / Spark-ML postures."""
    proj = run_ssgsea(df, annotations, **ssgsea_kw)
    longd = proj.select(
        "subject",
        F.col("annotation").alias("feature"),
        F.col(key).cast("double").alias("value"),
    )
    comps = run_pca(longd, n_components=n_components)
    return comps.select(
        "subject",
        *[F.col("pc")[i].alias(f"pc{i + 1}") for i in range(n_components)],
    )


# -- polar-plot merge (reference analytics.py:2934-2977) ----------------------

def merge_for_polar(df: DataFrame, regulators: DataFrame,
                    theta_col: str = "modifier", aggr_func: str = "mean",
                    normalize: bool = True) -> DataFrame:
    """merge_for_polar (reference analytics.py:2934; dispatched at
    analytics_factory.py:452-470): aggregate the (optionally z-scored) long
    measurement table per (group, feature), inner-join the regulators map
    (feature -> theta class, e.g. kinase 'modifier'), and re-aggregate per
    (group, theta) with the same aggregator — the polar/radar-plot input.

    Scale: two algebraic aggregations (mean/sum map-side combine; median via
    percentile) plus ONE broadcast join — ``regulators`` is the
    dictionary-scale regulator annotation, never shuffled against the
    measurement stream. Output: (group, <theta_col>, value).
    """
    aggs = {
        "mean": F.avg,
        "median": lambda c: F.percentile(c, F.lit(0.5)),
        "sum": F.sum,
    }
    if aggr_func not in aggs:
        raise ValueError(f"aggr_func must be one of {sorted(aggs)}, got {aggr_func!r}")
    agg = aggs[aggr_func]
    if normalize:
        df = normalize_zscore(df, by="feature")
    per_group = df.groupBy("group", "feature").agg(agg("value").alias("value"))
    joined = per_group.join(
        F.broadcast(regulators.select("feature", theta_col).distinct()), on="feature"
    )
    return joined.groupBy("group", theta_col).agg(agg("value").alias("value"))


# -- power analysis (reference analytics.py:2635-2672) ------------------------

def run_power_analysis(df: DataFrame, alpha: float = 0.05, power: float = 0.8,
                       min_n: int = 3, max_n: int = 150):
    """power_analysis (reference analytics.py:2635): ANOVA power curves from
    the observed effect-size distribution.

    1. |Cohen's d| for every (feature, group-pair) — computed ENTIRELY
       JVM-side from per-(feature, group) count/sum/sum-of-squares
       aggregates self-joined on feature (group count is dictionary-scale,
       so the pair fan-out is bounded); matches the reference's
       ``cohens_d(ddof=1)`` — pooled-by-group sd
       sqrt(((n1-1)v1 + (n2-1)v2)/(n1+n2-2)), NO small-sample correction
       (the reference's separate ``hedges_g`` function, which applies one,
       is never called by power_analysis).
    2. The distinct effect sizes (the reference's Python ``set``) reduce to
       4 driver-scale summary stats: 25th pct, mean, median, 75th pct
       (Spark ``percentile`` is linear-interpolating, same as np.percentile).
    3. Power curves over sample sizes [min_n, max_n) per summary effect size
       and the continuous sample size achieving ``power`` at the mean effect
       size — driver scalar math (noncentral-F series in functions/stats.py),
       4 x ~150 rows.

    Returns ``(sample_size, power_df)`` with power_df columns
    (power double, n_samples int, label string) mirroring the reference's
    ``(sample_size, power_df)`` tuple.
    """
    from ..functions.stats import ftest_anova_power, solve_ftest_anova_nobs

    spark = df.sparkSession
    per = df.where(F.col("value").isNotNull()).groupBy("feature", "group").agg(
        F.count("value").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    a, b = per.alias("a"), per.alias("b")
    j = a.join(b, on="feature").where(F.col("a.group") < F.col("b.group"))
    nt = F.col("a.n") + F.col("b.n")
    # pooled sd: (n-1)*var(ddof=1) telescopes to the centered sum of squares
    css_a = F.col("a.ss") - F.col("a.s") * F.col("a.s") / F.col("a.n")
    css_b = F.col("b.ss") - F.col("b.s") * F.col("b.s") / F.col("b.n")
    pooled_sd = F.sqrt((css_a + css_b) / (nt - 2))
    g = (F.col("a.s") / F.col("a.n") - F.col("b.s") / F.col("b.n")) / pooled_sd
    es = (
        j.select(F.abs(g).alias("es"))
        .where(F.col("es").isNotNull() & ~F.isnan("es"))
        .distinct()
    )
    row = es.agg(
        F.percentile("es", F.lit(0.25)).alias("q25"),
        F.avg("es").alias("mean"),
        F.percentile("es", F.lit(0.5)).alias("q50"),
        F.percentile("es", F.lit(0.75)).alias("q75"),
    ).collect()[0]
    k_groups = df.select("group").distinct().count()

    quantiles = ["25% qtl es", "mean es", "50% qtl es", "75% qtl es"]
    summary_eff = [row["q25"], row["mean"], row["q50"], row["q75"]]
    rows = []
    for qname, es_v in zip(quantiles, summary_eff):
        if es_v is None:
            continue
        label = "%s = %4.2F" % (qname, es_v)
        for n in range(min_n, max_n):
            rows.append((ftest_anova_power(es_v, n, alpha, k_groups), n, label))
    power_df = spark.createDataFrame(
        rows, "power double, n_samples int, label string"
    )
    sample_size = (
        solve_ftest_anova_nobs(row["mean"], alpha, power, k_groups)
        if row["mean"] is not None else float("nan")
    )
    return sample_size, power_df


# -- assumption checks (reference analytics.py:861-882) -----------------------

def check_equal_variances(df: DataFrame, alpha: float = 0.05) -> DataFrame:
    """Levene's test (Brown-Forsythe, center=median — scipy's default the
    reference calls) per feature across groups. Output:
    (identifier, test, pvalue, passed) — ``passed`` (not the reference's
    ``pass``, a Python keyword) holds the p > alpha verdict."""

    def per_feature(pdf: pd.DataFrame) -> pd.DataFrame:
        groups = [g["value"].to_numpy(dtype=float) for _, g in pdf.groupby("group")]
        w, p = ST.levene_test(groups)
        return pd.DataFrame({
            "identifier": [pdf["feature"].iloc[0]], "test": [w],
            "pvalue": [p], "passed": [bool(p > alpha) if p == p else False],
        })

    return df.groupBy("feature").applyInPandas(
        per_feature,
        schema="identifier string, test double, pvalue double, passed boolean",
    )


def check_normality(df: DataFrame, alpha: float = 0.05) -> DataFrame:
    """Normality screen per (group, feature). The reference uses
    Shapiro-Wilk (analytics.py:874); this engine uses the D'Agostino-Pearson
    K^2 omnibus statistic — same null hypothesis, no W lookup tables;
    divergence documented in functions/stats.py::dagostino_k2. Output:
    (group, identifier, test, pvalue, passed) — ``passed`` (not the
    reference's ``pass``, a Python keyword) holds the p > alpha verdict."""

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        k2, p = ST.dagostino_k2(pdf["value"].to_numpy(dtype=float))
        return pd.DataFrame({
            "group": [pdf["group"].iloc[0]],
            "identifier": [pdf["feature"].iloc[0]],
            "test": [k2], "pvalue": [p],
            "passed": [bool(p > alpha) if p == p else False],
        })

    return df.groupBy("group", "feature").applyInPandas(
        per_cell,
        schema=("group string, identifier string, test double, "
                "pvalue double, passed boolean"),
    )


# -- pairwise post-hoc t-tests (reference analytics.py:1539-1566) -------------

def run_pairwise_ttest(df: DataFrame, correction: str = "none",
                       is_logged: bool = True) -> DataFrame:
    """calculate_pairwise_ttest + complement_posthoc analog: Welch t-test
    for every group pair per feature, Hedges-g effect size (pingouin form:
    pooled-sd Cohen's d x (1 - 3/(4n - 9)) small-sample correction), fold
    change (difference when logged, ratio otherwise), optional BH
    correction across the pairs of each feature. Grouped-map per feature —
    pair fan-out is dictionary-scale."""

    def per_feature(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        feat = pdf["feature"].iloc[0]
        out = []
        groups = sorted(pdf["group"].dropna().unique())
        for i, g1 in enumerate(groups):
            for g2 in groups[i + 1:]:
                x = pdf.loc[pdf["group"] == g1, "value"].to_numpy(dtype=float)
                y = pdf.loc[pdf["group"] == g2, "value"].to_numpy(dtype=float)
                x, y = x[~np.isnan(x)], y[~np.isnan(y)]
                t, dof, p = ST.welch_ttest(x, y)
                d = ST.cohens_d(x, y)
                n = len(x) + len(y)
                g = d * (1 - 3.0 / (4 * n - 9)) if n > 2 and d == d else float("nan")
                if is_logged:
                    fc = float(np.mean(x) - np.mean(y)) if len(x) and len(y) else float("nan")
                else:
                    fc = float(np.mean(x) / np.mean(y)) if len(y) and np.mean(y) != 0 else float("nan")
                out.append((feat, g1, g2, float(np.mean(x)) if len(x) else float("nan"),
                            float(np.std(x, ddof=1)) if len(x) > 1 else float("nan"),
                            float(np.mean(y)) if len(y) else float("nan"),
                            float(np.std(y, ddof=1)) if len(y) > 1 else float("nan"),
                            t, dof, p, g, fc))
        res = pd.DataFrame(out, columns=[
            "feature", "group1", "group2", "mean1", "std1", "mean2", "std2",
            "t", "dof", "pvalue", "effsize", "fc"])
        if correction == "bh" and len(res):
            srt = res.sort_values("pvalue", kind="mergesort")
            m = int(srt["pvalue"].notna().sum())
            ranks = pd.Series(range(1, len(srt) + 1), index=srt.index, dtype=float)
            padj = (srt["pvalue"] * m / ranks).iloc[::-1].cummin().iloc[::-1]
            res["padj"] = padj.clip(upper=1.0).reindex(res.index)
        else:
            res["padj"] = res["pvalue"]
        return res

    return df.groupBy("feature").applyInPandas(
        per_feature,
        schema=("feature string, group1 string, group2 string, mean1 double, "
                "std1 double, mean2 double, std2 double, t double, dof double, "
                "pvalue double, effsize double, fc double, padj double"),
    )


# -- mixed KNN + normal imputation (reference analytics.py:303-324) -----------

def impute_mixed(df: DataFrame, cutoff: float = 0.6, shift: float = 1.8,
                 nstd: float = 0.3, k: int = 3, seed: int = 11) -> DataFrame:
    """imputation_mixed_norm_KNN analog: KNN-impute features whose valid
    fraction is >= cutoff in EVERY group; fill every remaining null from
    the down-shifted normal (MNAR). The feature split is one aggregation;
    the KNN stage only receives the dense slice."""
    valid = (
        df.groupBy("group", "feature")
        .agg(F.avg(F.col("value").isNotNull().cast("double")).alias("vf"))
        .groupBy("feature").agg(F.min("vf").alias("minvf"))
    )
    dense = valid.where(F.col("minvf") >= cutoff).select("feature")
    knn_part = impute_knn(df.join(dense, on="feature", how="left_semi"), k=k)
    rest = df.join(dense, on="feature", how="left_anti")
    combined = knn_part.unionByName(rest.select("group", "subject", "feature", "value"))
    return impute_normal_distribution(combined, shift=shift, nstd=nstd, seed=seed)


# -- small reference helpers --------------------------------------------------

def remove_group(df: DataFrame) -> DataFrame:
    """remove_group (analytics.py:624): drop the 'group' column."""
    return df.drop("group")


def get_max_permutations(df: DataFrame, group: str = "group") -> float:
    """get_max_permutations (analytics.py:1692): multinomial bound on
    distinct group relabelings, from per-group subject counts (one
    dictionary-scale aggregation)."""
    import math as _math

    counts = [
        r["n"] for r in
        df.select(group, "subject").distinct()
        .groupBy(group).agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    total = sum(counts)
    val = _math.lgamma(total + 1) - sum(_math.lgamma(c + 1) for c in counts)
    return float(round(_math.exp(val)))


def check_is_paired(df: DataFrame, subject: str = "subject",
                    group: str = "group") -> bool:
    """check_is_paired (analytics.py:1708): every subject observed in every
    group (one aggregation)."""
    row = (
        df.select(subject, group).distinct()
        .groupBy(subject).agg(F.countDistinct(group).alias("k"))
        .agg(F.min("k").alias("mn")).collect()[0]
    )
    n_groups = df.select(group).distinct().count()
    return row["mn"] is not None and row["mn"] == n_groups


def run_pairwise_ttest_with_covariates(
        df: DataFrame, covariates: DataFrame,
        covariate_cols: list[str], correction: str = "none") -> DataFrame:
    """pairwise_ttest_with_covariates analog (reference analytics.py:1815):
    per feature, every group pair tested with a two-level ANCOVA adjusting
    for the subject covariates (t = sqrt(F) signed by the adjusted mean
    difference; same linear model as run_ancova). Covariates are a
    broadcast-scale subject table joined once."""
    cov = F.broadcast(covariates.select("subject", *covariate_cols))
    j = df.join(cov, on="subject")

    def per_feature(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        feat = pdf["feature"].iloc[0]
        out = []
        groups = sorted(pdf["group"].dropna().unique())
        for i, g1 in enumerate(groups):
            for g2 in groups[i + 1:]:
                sub = pdf[pdf["group"].isin([g1, g2])]
                res = ST.ancova_oneway(
                    sub["value"].to_numpy(dtype=float),
                    sub["group"].to_numpy(),
                    sub[covariate_cols].to_numpy(dtype=float),
                )
                if res is None:
                    out.append((feat, g1, g2, float("nan")) + (float("nan"),) * 3)
                    continue
                f, df1, df2, p = res
                sign = np.sign(
                    sub.loc[sub["group"] == g1, "value"].mean()
                    - sub.loc[sub["group"] == g2, "value"].mean())
                out.append((feat, g1, g2, float(sign * np.sqrt(f)), df2, p,
                            float(sub.loc[sub["group"] == g1, "value"].mean()
                                  - sub.loc[sub["group"] == g2, "value"].mean())))
        res_df = pd.DataFrame(out, columns=[
            "feature", "group1", "group2", "t", "dof", "pvalue", "fc"])
        if correction == "bh" and len(res_df):
            srt = res_df.sort_values("pvalue", kind="mergesort")
            m = int(srt["pvalue"].notna().sum())
            ranks = pd.Series(range(1, len(srt) + 1), index=srt.index, dtype=float)
            padj = (srt["pvalue"] * m / ranks).iloc[::-1].cummin().iloc[::-1]
            res_df["padj"] = padj.clip(upper=1.0).reindex(res_df.index)
        else:
            res_df["padj"] = res_df["pvalue"]
        return res_df

    return j.groupBy("feature").applyInPandas(
        per_feature,
        schema=("feature string, group1 string, group2 string, t double, "
                "dof double, pvalue double, fc double, padj double"),
    )
