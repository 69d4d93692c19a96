"""TSV-compat export (SURVEY.md K1/K2 byte-format quirks).

Internal tables stay typed; this module exists only for byte-parity with
the reference's import TSVs when a consumer needs them:
- nodes header ['ID', ':LABEL', 'name', 'description', 'type', 'synonyms'],
  synonyms comma-joined (ontologies_controller.py:146),
- edges header ['START_ID', 'END_ID', 'TYPE', ...attrs]
  (builder_utils.py:272-287),
- QUOTE_ALL + escapechar='\\' (ontologies_controller.py:142,
  builder_utils.py:302).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def nodes_to_tsv(nodes: DataFrame, path: str) -> None:
    """Write the reference-shaped node TSV (one directory of part files;
    coalesce(1) only at dictionary scale)."""
    out = nodes.select(
        F.col("id").alias("ID"),
        F.col("label").alias(":LABEL"),
        "name",
        "description",
        "type",
        F.array_join(F.coalesce("synonyms", F.array()), ",").alias("synonyms"),
    )
    (
        out.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", "\\")
        .csv(path)
    )


def edges_to_tsv(edges: DataFrame, path: str) -> None:
    out = edges.select(
        F.col("subj").alias("START_ID"),
        F.col("obj").alias("END_ID"),
        F.col("pred").alias("TYPE"),
        "source",
        F.col("score").cast("string").alias("score"),
        "evidence_type",
    )
    (
        out.write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", "\\")
        .csv(path)
    )


def read_back_nodes(spark, path: str) -> DataFrame:
    """Round-trip reader: re-splits synonyms (the Cypher SPLIT(...,',')
    analog, cypher.yml:26)."""
    df = spark.read.csv(path, sep="\t", header=True, escape="\\")
    return df.select(
        F.col("ID").alias("id"),
        F.col(":LABEL").alias("label"),
        "name",
        "description",
        "type",
        F.when(F.col("synonyms") != "", F.split("synonyms", ",")).otherwise(
            F.array().cast("array<string>")
        ).alias("synonyms"),
    )
