"""Overlapping-window document chunking (RAG / long-context prep).

Splits each document into fixed-size token windows with a configurable
overlap — the preprocessing step between a curated corpus and an
embedding/ANN index (operators/similarity.py) or a long-context training
set (operators/packing.py packs; this op SPLITS). Reference scope analog:
CKG chunks large source files only for ingest batching
(graphdb_builder/builder_utils.py chunked readers); token-window chunking
for retrieval is part of the LLM-pipeline surface this engine adds.

Scale shape: one narrow pass — tokenize, `sequence`/`posexplode` the
window starts, `slice` the token array per window. No shuffle, no UDF;
everything stays inside whole-stage codegen, and output rows inherit the
input partitioning (chunks of a document stay co-located for a downstream
per-doc rollup). Fan-out is bounded by ceil(n_tokens/stride) rows per doc
— at 100 TB the op is scan-bound, exactly like the textstats family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = True,
) -> DataFrame:
    """One row per (doc, window): window i covers whitespace tokens
    [i*stride, i*stride + chunk_tokens), stride = chunk_tokens - overlap.
    The final window may be short; a document shorter than one window
    emits exactly one chunk. Empty/whitespace-only docs emit none.

    Columns: id_col, chunk_idx, start_token, n_chunk_tokens[, chunk_text].
    """
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_tk"),
    ).where(F.length(F.trim(F.col(text_col))) > 0)
    n = F.size("_tk")
    # last window start = stride * ceil(max(n - chunk_tokens, 0) / stride)
    last = F.lit(stride) * F.ceil(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    out = (
        toks.select(
            id_col, "_tk",
            F.posexplode(
                F.sequence(F.lit(0), last, F.lit(stride))
            ).alias("chunk_idx", "start_token"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int"),
            F.col("start_token").cast("int"),
            F.slice("_tk", F.col("start_token") + 1,
                    F.lit(chunk_tokens)).alias("_win"),
        )
        .withColumn("n_chunk_tokens", F.size("_win").cast("int"))
    )
    if keep_text:
        out = out.withColumn("chunk_text", F.concat_ws(" ", "_win"))
    return out.drop("_tk", "_win")
