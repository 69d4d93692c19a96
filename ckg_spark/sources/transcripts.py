"""Transcript table access (SURVEY.md S10 — the graft's primary input).

``read_transcripts`` loads the Iceberg/parquet transcripts table with the
BASELINE.json input_hint schema. ``transcripts_from_documents`` derives a
deterministic transcript table from the driver's ``documents`` testdata
(each document becomes one conversation whose turns are fixed-size token
windows) — used by __spark_entry__ so every driver check runs on the shared
read-only testdata without synthesizing files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
                     "tool string, ts timestamp")

_ROLES = ["user", "assistant", "tool"]


def read_transcripts(spark: SparkSession, uri: str) -> DataFrame:
    """Load transcripts; on a deployment with an Iceberg catalog this is
    spark.read.format('iceberg').load(uri) — here a parquet path with the
    identical schema (storage kept behind this function)."""
    df = spark.read.parquet(uri)
    return df.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.col("role").cast("string"),
        F.col("text").cast("string"),
        F.col("tool").cast("string"),
        F.col("ts").cast("timestamp"),
    )


def transcripts_from_documents(spark: SparkSession, sf_dir: str,
                               words_per_turn: int = 12) -> DataFrame:
    """Deterministically reshape documents(doc_id, text, ...) into the
    transcript schema: conv_id = 'doc-<id>', turns = consecutive
    ``words_per_turn``-token windows, role cycling user/assistant/tool,
    ts = fixed epoch + turn_idx minutes. Pure JVM (split + slice + explode)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.split(F.trim(F.col("text")), r"\s+").alias("toks"),
    )
    n = words_per_turn
    turns = toks.select(
        "conv_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, greatest(cast(ceil(size(toks)/{n}) as int)-1, 0)), "
                f"i -> named_struct('turn_idx', i, "
                f"'text', array_join(slice(toks, i*{n}+1, {n}), ' ')))"
            )
        ).alias("t"),
    ).select(
        "conv_id",
        F.col("t.turn_idx").cast("int").alias("turn_idx"),
        F.col("t.text").alias("text"),
    )
    return turns.select(
        "conv_id",
        "turn_idx",
        F.element_at(
            F.array(*[F.lit(r) for r in _ROLES]), F.pmod("turn_idx", F.lit(3)) + 1
        ).alias("role"),
        "text",
        F.when(F.pmod("turn_idx", F.lit(3)) == 2, F.lit("sql")).alias("tool"),
        (F.to_timestamp(F.lit("2025-01-01 00:00:00"))
         + F.make_interval(mins=F.col("turn_idx"))).alias("ts"),
    )
