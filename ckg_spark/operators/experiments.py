"""Experiment-matrix ingestion (SURVEY.md §2.3/§2.5 parser patterns).

Spark rendition of the reference's experiment parsers:
- proteomicsParser.py: MaxQuant-style wide matrices (samples x proteins) ->
  HAS_QUANTIFIED_PROTEIN edge lists — contaminant filtering (:170-182),
  protein-group expansion with first-occurrence razor flag (:205-228),
  regex value-column selection (:454-460), log2 + inf->nan + row median
  over replicates (:545-555), stack() melt (:423-451).
- clinicalParser.py: '|'-separated multi-value clinical fields ->
  HAS_DISEASE / HAD_INTERVENTION edges; timepoint regex extraction.

Everything is built-in expressions; the melt is a stack() selectExpr.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def filter_contaminants(df: DataFrame, filter_cols: Sequence[str]) -> DataFrame:
    """Keep rows where every filter column is null/empty (reference P4:
    data[data[filters].isnull().all(1)] — 'Reverse', 'Potential contaminant').

    Empty string counts as null: CSV/TSV sources deliver '' for blank cells
    (pandas delivers NaN), and the reference's blank-cell semantics is
    "not flagged".
    """
    cond = F.lit(True)
    for c in filter_cols:
        cond = cond & (F.col(c).isNull() | (F.trim(F.col(c)) == ""))
    return df.where(cond)


def expand_groups(df: DataFrame, group_col: str, sep: str = ";",
                  order_col: str | None = None) -> DataFrame:
    """Explode ';'-separated id groups to rows; mark the first member of
    each group as the razor entry (P9 + W1: is_razor = ~duplicated).

    The razor flag is positional WITHIN the group (the reference marks the
    first protein of each group, proteomicsParser.py:225) — computed from
    posexplode, no window needed.
    """
    exploded = df.select(
        "*", F.posexplode(F.split(F.col(group_col), re.escape(sep))).alias("_pos", "_member")
    )
    return (
        exploded.withColumn(group_col, F.trim(F.col("_member")))
        .withColumn("is_razor", F.col("_pos") == 0)
        .drop("_pos", "_member")
        .where(F.col(group_col) != "")
    )


def select_value_columns(df: DataFrame, pattern: str) -> list[str]:
    """Regex value-column selection (P6; e.g. r'Intensity .*')."""
    rx = re.compile(pattern)
    return [c for c in df.columns if rx.fullmatch(c)]


def melt_matrix(df: DataFrame, id_cols: Sequence[str], value_cols: Sequence[str],
                key_name: str = "sample", value_name: str = "value") -> DataFrame:
    """Wide -> long via stack() (A6 unpivot; reference stack() at :423-451)."""
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    return df.selectExpr(
        *id_cols, f"stack({len(value_cols)}, {stack_expr}) as ({key_name}, {value_name})"
    )


def log2_median_replicates(long: DataFrame, feature_col: str, sample_col: str = "sample",
                           value_col: str = "value",
                           replicate_of=None) -> DataFrame:
    """log2-transform (inf -> null) then median over replicate columns per
    (subject, feature) (A4; reference :545-555).

    ``replicate_of``: column expression mapping a replicate sample name to
    its subject (default: strip a trailing '_rN' suffix).
    """
    subj = (replicate_of if replicate_of is not None
            else F.regexp_replace(F.col(sample_col), r"_r\d+$", ""))
    lg = F.log2(F.col(value_col))
    cleaned = long.withColumn(
        "_lg", F.when(F.col(value_col) > 0, lg)
    )
    return (
        cleaned.withColumn("subject", subj)
        .groupBy("subject", feature_col)
        .agg(F.percentile("_lg", F.lit(0.5)).alias("value"))
        .where(F.col("value").isNotNull())
    )


def quantified_edges(long: DataFrame, feature_col: str, subject_col: str = "subject",
                     value_col: str = "value",
                     pred: str = "HAS_QUANTIFIED_PROTEIN",
                     source: str = "experiment") -> DataFrame:
    """(sample)-[HAS_QUANTIFIED_*]->(feature) edge list (reference :276,445)."""
    return long.select(
        F.col(subject_col).alias("subj"),
        F.lit(pred).alias("pred"),
        F.col(feature_col).alias("obj"),
        F.lit(source).alias("source"),
        F.col(value_col).cast("double").alias("score"),
        F.lit("quantification").alias("evidence_type"),
    )


def multivalue_edges(df: DataFrame, subject_col: str, field_col: str,
                     pred: str, sep: str = "|",
                     source: str = "clinical") -> DataFrame:
    """'|'-separated clinical field -> one edge per value (clinicalParser
    extract_subject_disease_rels analog)."""
    return (
        df.select(
            F.col(subject_col).alias("subj"),
            F.explode(F.split(F.col(field_col), re.escape(sep))).alias("obj"),
        )
        .withColumn("obj", F.trim("obj"))
        .where(F.col("obj") != "")
        .select(
            "subj",
            F.lit(pred).alias("pred"),
            "obj",
            F.lit(source).alias("source"),
            F.lit(1.0).alias("score"),
            F.lit("record").alias("evidence_type"),
        )
        .dropDuplicates(["subj", "obj"])
    )


def extract_timepoints(df: DataFrame, col: str) -> DataFrame:
    """Timepoint regex extraction (P7; clinicalParser
    str.extract(r'([\\-\\d]+)([a-zA-Z]+)')): adds (tp_value int, tp_unit)."""
    return df.withColumn(
        "tp_value", F.regexp_extract(F.col(col), r"([\-\d]+)([a-zA-Z]+)", 1).cast("int")
    ).withColumn(
        "tp_unit", F.regexp_extract(F.col(col), r"([\-\d]+)([a-zA-Z]+)", 2)
    )


def validate_referential_integrity(nodes: DataFrame, edges: DataFrame,
                                   check_obj: bool = False) -> DataFrame:
    """J5: the load-time MATCH...MERGE FK check (cypher.yml:28-34) as
    anti-joins. Returns per-pred counts of edges whose subj (and optionally
    obj) has no node — the validation the reference gets implicitly from
    Neo4j's MATCH returning nothing (loader warns on 0 inserts,
    loader.py:62-64)."""
    ids = nodes.select(F.col("id")).distinct()
    missing_subj = (
        edges.join(ids.withColumnRenamed("id", "subj"), on="subj", how="left_anti")
        .groupBy("pred")
        .agg(F.count(F.lit(1)).alias("missing_subj"))
    )
    if not check_obj:
        return missing_subj
    missing_obj = (
        edges.join(ids.withColumnRenamed("id", "obj"), on="obj", how="left_anti")
        .groupBy("pred")
        .agg(F.count(F.lit(1)).alias("missing_obj"))
    )
    return missing_subj.join(missing_obj, on="pred", how="full").na.fill(0)
