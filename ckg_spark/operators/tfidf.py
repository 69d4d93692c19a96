"""TF-IDF (SURVEY.md M9 candidate scoring) as pure DataFrame aggregations.

The reference's analog is alias-priority ranks + score cutoffs; the north
star asks for a TF-IDF/similarity scorer for candidate ranking. Implemented
relationally (no ML pipeline object needed):

    tf(d, t)  = count of t in d
    df(t)     = #docs containing t
    idf(t)    = ln((N + 1) / (df + 1)) + 1     (smooth)
    tfidf     = tf * idf

All groupBy aggregations (map-side combined). Used both as a standalone
text op and as the tie-break scorer in linking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .extract import tokens_col


def term_frequencies(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    return toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf, df, tfidf)."""
    n_docs = docs.select(id_col).distinct().count()
    tf = term_frequencies(docs, id_col, text_col)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(df_, on="term")
        .withColumn(
            "tfidf",
            F.col("tf") * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


def score_candidates_tfidf(linked_all: DataFrame, docs: DataFrame,
                           id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Attach a tfidf score to linked mention candidates (keyed by the doc
    and the alias surface form); deterministic tie-break stays (rank, ident).
    Candidates with rarer (more informative) surface forms score higher —
    the M9 semantics."""
    scores = tfidf(docs, id_col, text_col).select(
        F.col("doc_id"), F.col("term").alias("alias_lc"), F.col("tfidf")
    )
    # doc-scale join (shuffles on doc_id — NOT broadcastable at corpus scale)
    return linked_all.join(scores, on=["doc_id", "alias_lc"], how="left") \
        .withColumn("tfidf", F.coalesce("tfidf", F.lit(0.0)))
