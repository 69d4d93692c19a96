"""Entity linking (SURVEY.md M3/M4/M9) — alias -> candidate ids -> best pick.

Reference semantics being reproduced:
- 1:N alias expansion: an alias can resolve to multiple ids and the mention
  pipeline emits/considers all of them
  (ckg/graphdb_builder/databases/parsers/textminingParser.py:100-112,
  mapping.py:117-144 getMultipleMappingForEntity).
- excluded aliases: REFLECT names priority flag 2 = never link
  (ontologies/parsers/reflectParser.py:30-40) -> ``rank == 2`` filter.
- stop-listed root terms per entity type: db_mentions_filters
  (textminingParser.py:114-115) -> broadcast anti-join.
- candidate scoring: alias priority rank, ties broken deterministically by
  ident (the Spark analog of the reference's score cutoffs + preferred-name
  priority); ``keep='best'`` applies a row_number window per mention span.

All joins are broadcast (the alias table is dictionary-scale, exactly the
data the reference holds in an in-process dict) — zero shuffle on the
mention stream in 'all' mode; 'best' mode shuffles once on the mention key
for the window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from .extract import DEFAULT_KEYS, normalize_text


def prepare_alias_table(aliases: DataFrame) -> DataFrame:
    """Normalize the alias table for joining: (gram, ident, rank, entity_type, source)."""
    return (
        aliases.select(
            normalize_text(F.col("alias_lc")).alias("gram"),
            "ident",
            F.col("rank").cast("int").alias("rank"),
            "entity_type",
            "source",
        )
        .where(F.col("gram") != "")
        .dropDuplicates(["gram", "ident"])
    )


def link_mentions(
    mentions: DataFrame,
    alias_table: DataFrame,
    stoplist: DataFrame | None = None,
    keys: Sequence[str] = DEFAULT_KEYS,
    keep: str = "best",
) -> DataFrame:
    """Resolve mention surface forms to entity ids.

    Input: mentions with (keys..., pos, n_words, alias_lc).
    Output: (keys..., pos, n_words, alias_lc, ident, entity_type, rank).

    keep='all'  -> every candidate id (reference 1:N semantics)
    keep='best' -> one id per mention span: lowest rank, then lowest ident
                   (deterministic under any parallelism).

    keep='best' costs ZERO shuffle on the mention stream: the winning
    candidate of a mention depends only on its surface form, so the
    best-per-gram table is precomputed on the broadcast-scale alias side
    (a tiny aggregation) and the mention stream takes one narrow broadcast
    join. (An earlier formulation aggregated min(struct) over the mention
    stream — correct but shuffled every mention; this is the same result
    by [gram -> candidates] functional dependency.)
    """
    filtered = alias_table.where(F.col("rank") != 2)
    if stoplist is not None:
        filtered = filtered.join(
            F.broadcast(stoplist.select("entity_type", "ident").distinct()),
            on=["entity_type", "ident"],
            how="left_anti",
        )

    if keep == "all":
        cands = mentions.join(
            F.broadcast(filtered),
            mentions["alias_lc"] == filtered["gram"],
            "inner",
        ).drop("gram")
        return cands.select(*keys, "pos", "n_words", "alias_lc", "ident",
                            "entity_type", "rank")

    best_per_gram = (
        filtered.groupBy("gram")
        .agg(
            F.min(
                F.struct(F.col("rank"), F.col("ident"), F.col("entity_type"))
            ).alias("b")
        )
        .select(
            F.col("gram").alias("alias_lc"),
            F.col("b.ident").alias("ident"),
            F.col("b.entity_type").alias("entity_type"),
            F.col("b.rank").alias("rank"),
        )
    )
    return mentions.join(F.broadcast(best_per_gram), on="alias_lc", how="inner").select(
        *keys, "pos", "n_words", "alias_lc", "ident", "entity_type", "rank"
    )


def link_best_by_embedding(
    candidates: DataFrame,
    mention_vecs: DataFrame,
    entity_vecs: DataFrame,
    keys: Sequence[str] = ("doc_id",),
    mention_col: str = "alias_lc",
    ident_col: str = "ident",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-similarity disambiguation of 1:N link candidates — the
    second scorer the north rule names ("candidate entity linking scored
    by broadcast-joined alias tables plus TF-IDF/embedding similarity").
    Rank-based ``link_mentions(keep='best')`` resolves by dictionary
    priority; this resolves by CONTEXT: each candidate is scored by the
    cosine between the mention site's context embedding and the
    candidate entity's embedding, and the argmax wins (ties -> lowest
    ident, deterministic at any parallelism).

    ``candidates``:   (keys..., mention_col, ident_col) — the 1:N set
                      from ``link_mentions(keep='all')``.
    ``mention_vecs``: (keys..., vec_col) context embedding per mention
                      site (corpus-scale).
    ``entity_vecs``:  (ident_col, vec_col) — dictionary-scale, broadcast.

    Scale shape: entity vectors broadcast onto the candidate stream; ONE
    co-partitioned equi-join with the context vectors on ``keys``; the
    cosine is a JVM zip_with/aggregate fold (no UDF); the argmax window
    partitions on (keys..., mention) — satisfied by the join's existing
    hashpartitioning(keys), so it adds a sort but no exchange.
    """
    from pyspark.sql import Window

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x)

    def _norm(a):
        return F.sqrt(F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))

    ev = F.broadcast(entity_vecs.select(
        F.col(ident_col), F.col(vec_col).alias("_ev")))
    mv = mention_vecs.select(*keys, F.col(vec_col).alias("_mv"))
    scored = (
        candidates.join(ev, on=ident_col)
        .join(mv, on=list(keys))
        .withColumn("_cos", _dot(F.col("_mv"), F.col("_ev"))
                    / (_norm(F.col("_mv")) * _norm(F.col("_ev"))))
    )
    w = Window.partitionBy(*keys, mention_col).orderBy(
        F.col("_cos").desc(), F.col(ident_col).asc())
    return (scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(*keys, mention_col, ident_col,
                    F.round("_cos", 6).alias("cosine")))
