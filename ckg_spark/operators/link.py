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
    """
    cands = mentions.join(
        F.broadcast(alias_table),
        mentions["alias_lc"] == alias_table["gram"],
        "inner",
    ).drop("gram")

    # excluded aliases never link
    cands = cands.where(F.col("rank") != 2)

    if stoplist is not None:
        cands = cands.join(
            F.broadcast(stoplist.select("entity_type", "ident").distinct()),
            on=["entity_type", "ident"],
            how="left_anti",
        )

    if keep == "all":
        return cands.select(*keys, "pos", "n_words", "alias_lc", "ident",
                            "entity_type", "rank")

    # best candidate as an algebraic min(struct(rank, ident, ...)) — struct
    # comparison is lexicographic by field order, so this is exactly
    # "lowest rank, then lowest ident", but with map-side partial
    # aggregation instead of a row_number window's full sort-shuffle
    best = F.min(
        F.struct(
            F.col("rank"), F.col("ident"), F.col("entity_type"), F.col("alias_lc")
        )
    ).alias("b")
    return (
        cands.groupBy(*keys, "pos", "n_words")
        .agg(best)
        .select(
            *keys, "pos", "n_words",
            F.col("b.alias_lc").alias("alias_lc"),
            F.col("b.ident").alias("ident"),
            F.col("b.entity_type").alias("entity_type"),
            F.col("b.rank").alias("rank"),
        )
    )
