"""Dataset report orchestration (report_manager Dataset.generate_report
analog): default proteomics config end-to-end over the long fixture."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ckg_spark.plans.report import (
    DEFAULT_PROTEOMICS_REPORT,
    generate_dataset_report,
    process_dataset,
)


@pytest.fixture(scope="module")
def omics_df(spark):
    rng = np.random.RandomState(9)
    rows = []
    for gi, g in enumerate(["ctrl", "caseA", "caseB"]):
        for si in range(6):
            subj = f"{g}{si}"
            for fi in range(15):
                # f00 strongly regulated; f01 mildly; ~20% missing on f14
                if fi == 14 and rng.rand() < 0.2:
                    continue
                mu = 20 + (gi * 4.0 if fi == 0 else gi * 1.0 if fi == 1 else 0)
                rows.append((g, subj, f"f{fi:02d}", float(rng.normal(mu, 1))))
    return spark.createDataFrame(
        rows, "group string, subject string, feature string, value double")


@pytest.fixture(scope="module")
def annotations_df(spark):
    rows = [(f"f{fi:02d}", "pathway_X" if fi < 5 else "pathway_Y")
            for fi in range(15)]
    return spark.createDataFrame(rows, "feature string, annotation string")


def test_process_dataset_filters_and_imputes(spark, omics_df):
    # inject a feature with null values in most samples -> filtered out
    # (long-format missingness contract: missing = NULL value, cf.
    # missing_stats; absent rows are simply not measured)
    extra = spark.createDataFrame(
        [("ctrl", f"ctrl{i}", "f_sparse", 1.0 if i == 0 else None)
         for i in range(6)],
        "group string, subject string, feature string, value double")
    out = process_dataset(omics_df.unionByName(extra), max_missing=0.3)
    feats = {r["feature"] for r in out.select("feature").distinct().collect()}
    assert "f_sparse" not in feats and "f00" in feats
    assert out.where(F.col("value").isNull()).count() == 0


def test_default_report_sections(spark, omics_df, annotations_df):
    rep = generate_dataset_report(omics_df, annotations=annotations_df)
    assert set(rep) == set(DEFAULT_PROTEOMICS_REPORT)
    summary = rep["summary"].toPandas()
    assert {"feature"} <= set(summary.columns) and len(summary) > 0
    cov = rep["coefficient_of_variation"].toPandas()
    assert len(cov) > 0
    pca = rep["pca"].toPandas()
    assert {"subject", "pc"} <= set(pca.columns)
    assert all(len(v) == 2 for v in pca["pc"])  # 2 components per subject
    anova = rep["anova"].toPandas()
    assert {"feature", "group1", "group2", "anova_padj"} <= set(anova.columns)
    # the strongly regulated feature must be the report's top ANOVA hit
    top = anova.sort_values("anova_padj").iloc[0]
    assert top["feature"] == "f00" and bool(top["anova_rejected"])
    corr = rep["correlation"].toPandas()
    assert {"fa", "fb", "corr"} <= set(corr.columns) and len(corr) > 0
    enr = rep["up_down_enrichment"].toPandas()
    assert {"annotation", "direction", "pvalue", "padj"} <= set(enr.columns)


def test_report_skips_enrichment_without_annotations(spark, omics_df):
    rep = generate_dataset_report(omics_df)
    assert "up_down_enrichment" not in rep
    assert "anova" in rep


def test_longitudinal_report_sections(spark):
    from ckg_spark.plans.report import (
        DEFAULT_LONGITUDINAL_REPORT, generate_dataset_report)

    rng = np.random.RandomState(4)
    rows = []
    # longitudinal design: within = timepoint ('group' col), between =
    # subject_group, repeated samples per subject
    for sg in ["ctrl", "case"]:
        for si in range(4):
            subj = f"{sg}{si}"
            for tp in ["t1", "t2", "t3"]:
                for fi in range(6):
                    eff = 2.0 if (fi == 0 and sg == "case" and tp == "t3") else 0.0
                    rows.append((tp, subj, f"f{fi}", float(rng.normal(10 + eff, 1)),
                                 sg, f"{subj}_{tp}"))
    df = spark.createDataFrame(
        rows, "group string, subject string, feature string, value double,"
              " subject_group string, sample string")
    rep = generate_dataset_report(df, config=DEFAULT_LONGITUDINAL_REPORT,
                                  preprocess=False)
    assert set(rep) == set(DEFAULT_LONGITUDINAL_REPORT) - {"up_down_enrichment"}
    ma = rep["mixed_anova"].toPandas()
    assert {"feature", "pvalue"} <= set(ma.columns) and len(ma) == 6
    rc = rep["rm_correlation"].toPandas()
    assert {"node1", "node2", "weight", "padj"} <= set(rc.columns) and len(rc) > 0
