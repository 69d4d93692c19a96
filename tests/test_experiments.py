"""Experiment-matrix ingestion: the proteomics/clinical parser semantics."""

import math

import pandas as pd
from pyspark.sql import functions as F

from ckg_spark.operators import experiments as E


def _matrix(spark):
    """MaxQuant-ish wide matrix: protein groups, filters, replicate columns."""
    rows = [
        # (protein_group, reverse, contaminant, Int s1_r1, s1_r2, s2_r1)
        ("P1;P2", None, None, 8.0, 32.0, 4.0),
        ("P3", None, None, 2.0, 2.0, 16.0),
        ("REV_X", "+", None, 9.0, 9.0, 9.0),          # reverse hit -> dropped
        ("CON_Y", None, "+", 7.0, 7.0, 7.0),           # contaminant -> dropped
        ("P4", None, None, 0.0, 4.0, 8.0),             # zero intensity -> null log2
    ]
    return spark.createDataFrame(
        rows,
        "proteins string, Reverse string, contaminant string, "
        "`Intensity s1_r1` double, `Intensity s1_r2` double, `Intensity s2_r1` double",
    )


def test_proteomics_matrix_to_edges(spark):
    df = _matrix(spark)
    clean = E.filter_contaminants(df, ["Reverse", "contaminant"])
    assert clean.count() == 3

    expanded = E.expand_groups(clean, "proteins")
    got = expanded.select("proteins", "is_razor").toPandas()
    razor = dict(zip(got["proteins"], got["is_razor"]))
    assert razor["P1"] and not razor["P2"] and razor["P3"]

    vcols = E.select_value_columns(expanded, r"Intensity .*")
    assert vcols == ["Intensity s1_r1", "Intensity s1_r2", "Intensity s2_r1"]

    long = E.melt_matrix(expanded, ["proteins"], vcols)
    med = E.log2_median_replicates(
        long, "proteins",
        replicate_of=F.regexp_replace(F.regexp_replace("sample", r"^Intensity ", ""), r"_r\d+$", ""),
    )
    vals = {(r["subject"], r["proteins"]): r["value"] for r in med.collect()}
    # P1 s1: median(log2(8), log2(32)) = median(3, 5) = 4
    assert vals[("s1", "P1")] == 4.0
    # P3 s2: log2(16) = 4
    assert vals[("s2", "P3")] == 4.0
    # P4 s1: intensities (0, 4) -> log2(0) dropped -> median(log2(4)) = 2
    assert vals[("s1", "P4")] == 2.0

    edges = E.quantified_edges(med, "proteins")
    assert edges.where("pred = 'HAS_QUANTIFIED_PROTEIN'").count() == med.count()
    assert set(edges.columns) == {"subj", "pred", "obj", "source", "score", "evidence_type"}


def test_clinical_multivalue_and_timepoints(spark):
    df = spark.createDataFrame(
        [("subj1", "diabetes|hypertension", "12months"),
         ("subj2", "asthma", "-3days"),
         ("subj3", "", "0h")],
        "subject string, diseases string, timepoint string",
    )
    edges = E.multivalue_edges(df, "subject", "diseases", pred="HAS_DISEASE")
    got = {(r["subj"], r["obj"]) for r in edges.collect()}
    assert got == {("subj1", "diabetes"), ("subj1", "hypertension"), ("subj2", "asthma")}

    tp = E.extract_timepoints(df, "timepoint").toPandas().set_index("subject")
    assert tp.loc["subj1", "tp_value"] == 12 and tp.loc["subj1", "tp_unit"] == "months"
    assert tp.loc["subj2", "tp_value"] == -3 and tp.loc["subj2", "tp_unit"] == "days"


def test_referential_integrity(spark):
    nodes = spark.createDataFrame([("P1", "Protein"), ("s1", "Sample")],
                                  "id string, label string")
    edges = spark.createDataFrame(
        [("s1", "HAS_QUANTIFIED_PROTEIN", "P1", "x", 1.0, "q"),
         ("s1", "HAS_QUANTIFIED_PROTEIN", "P9", "x", 1.0, "q"),
         ("ghost", "HAS_DISEASE", "P1", "x", 1.0, "q")],
        "subj string, pred string, obj string, source string, score double, evidence_type string",
    )
    rep = E.validate_referential_integrity(nodes, edges, check_obj=True).toPandas()
    r = rep.set_index("pred")
    assert r.loc["HAS_DISEASE", "missing_subj"] == 1
    assert r.loc["HAS_QUANTIFIED_PROTEIN", "missing_obj"] == 1
