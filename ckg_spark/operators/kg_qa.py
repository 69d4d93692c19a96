"""KG quality assurance + KG-embedding training-data construction.

Two operators the reference implies but never distributes:

- ``schema_violations``: domain/range validation of an edge table against
  an ontology rule table — the check CKG performs implicitly by generating
  edges only from per-ontology parser configs (the jensenlab/efo parser
  YAMLs hard-code which node labels each relationship may connect, e.g.
  ckg/graphdb_builder/ontologies/ontologies_controller.py:143 and the
  import-TSV headers in jensenlabConfig.yml).  On an open-ended transcript
  corpus the edges arrive untyped, so the constraint becomes a first-class
  validation pass: every edge is checked that (a) both endpoints exist in
  the node table and (b) (pred, subj_type, obj_type) is an allowed
  combination.

- ``negative_triples``: deterministic corrupted-tail negative sampling —
  the standard KG-embedding (TransE/ComplEx) training-data op.  For each
  positive (subj, pred, obj) and slot i < k, the corrupted tail is the
  entity at index md5_32("<seed>:<subj>:<pred>:<obj>:<i>") mod n in the
  id-sorted entity list.  Selection depends only on (seed, triple, i) —
  never partitioning or an RNG — so any cluster size emits the identical
  sample and an external engine re-derives it exactly (the q100 DuckDB
  oracle does; same md5-draw contract as sampling.hash_uniform).

Scale shape (the 100 TB posture):
- node-type and rule tables are dictionary-scale -> broadcast; the edge
  stream is validated with THREE broadcast hash joins and never shuffles.
- the entity pool for negative sampling is dictionary-scale; its dense
  index is one single-partition window over the pool only (never the
  corpus), then a broadcast join onto the exploded positives.  The one
  corpus-scale shuffle is the accidental-positive anti-join on
  (subj, pred, obj_neg) — unavoidable for exact filtering; both sides
  hash-partition on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["schema_violations", "violation_summary", "negative_triples"]


def _md5_32(col):
    """First 32 bits of md5 as a non-negative long (DuckDB:
    ('0x' || substr(md5(s), 1, 8))::BIGINT — bit-identical)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def schema_violations(edges: DataFrame, node_types: DataFrame,
                      rules: DataFrame) -> DataFrame:
    """Edges violating the ontology's domain/range constraints.

    ``edges``:       (subj, pred, obj, ...) — corpus-scale.
    ``node_types``:  (id, type) — one type per node id, dictionary-scale.
    ``rules``:       (pred, subj_type, obj_type) allowed combinations,
                     dictionary-scale.

    Returns the violating edges with (subj_type, obj_type, violation)
    appended; ``violation`` is the FIRST failing check in fixed order:
    'unknown_subj' (subj absent from node_types), 'unknown_obj', then
    'domain_range' ((pred, subj_type, obj_type) not in rules).  Valid
    edges are dropped.  Plan: three broadcast joins, no shuffle of the
    edge stream.
    """
    st = F.broadcast(node_types.select(F.col("id").alias("subj"),
                                       F.col("type").alias("subj_type")))
    ot = F.broadcast(node_types.select(F.col("id").alias("obj"),
                                       F.col("type").alias("obj_type")))
    rl = F.broadcast(rules.select("pred", "subj_type", "obj_type")
                     .withColumn("_ok", F.lit(1)))
    typed = (edges.join(st, on="subj", how="left")
             .join(ot, on="obj", how="left")
             .join(rl, on=["pred", "subj_type", "obj_type"], how="left"))
    violation = (
        F.when(F.col("subj_type").isNull(), F.lit("unknown_subj"))
        .when(F.col("obj_type").isNull(), F.lit("unknown_obj"))
        .when(F.col("_ok").isNull(), F.lit("domain_range"))
    )
    return (typed.withColumn("violation", violation)
            .where(F.col("violation").isNotNull())
            .drop("_ok"))


def violation_summary(violations: DataFrame) -> DataFrame:
    """Counts per (pred, violation, subj_type, obj_type) — the compact
    report a validation pass emits; one map-side-combined aggregation."""
    return (violations.groupBy("pred", "violation", "subj_type", "obj_type")
            .agg(F.count(F.lit(1)).alias("n_edges"),
                 F.countDistinct("subj").alias("n_subjects")))


def negative_triples(positives: DataFrame, entities: DataFrame,
                     k: int = 2, seed: str = "neg",
                     exclude_self: bool = True) -> DataFrame:
    """k deterministic corrupted-tail negatives per positive triple.

    ``positives``: (subj, pred, obj) — corpus-scale, assumed distinct.
    ``entities``:  (id,) candidate tail pool — dictionary-scale.

    Returns (subj, pred, obj, neg_idx, obj_neg) where obj_neg is drawn by
    the md5 index draw described in the module docstring, minus rows that
    collide with a KNOWN positive (exact anti-join on (subj, pred,
    obj_neg) — the standard 'filtered' negative-sampling regime) and,
    when ``exclude_self``, rows where obj_neg == subj.  Draws that
    collide are dropped, not re-drawn: the output is a deterministic
    FUNCTION of (positives, entities, seed), which re-draw loops break
    under pool updates.  Callers needing exactly-k oversample (larger k)
    and rank by neg_idx.
    """
    if int(k) < 1:
        # sequence(0, k-1) with k=0 would be sequence(0, -1), which Spark
        # evaluates with an INFERRED step of -1 -> [0, -1], silently
        # emitting a bogus negative slot instead of nothing.
        raise ValueError(f"negative_triples requires k >= 1, got {k}")
    # Dense 0..n-1 index over the id-sorted pool. The single-partition
    # window runs over the dictionary-scale pool ONLY (never the corpus);
    # the indexed pool and its size are then broadcast.
    pool = (entities.select(F.col("id").cast("string").alias("obj_neg"))
            .distinct()
            .withColumn("_idx",
                        F.row_number().over(Window.orderBy("obj_neg")) - 1))
    n = F.broadcast(pool.agg(F.count(F.lit(1)).alias("_n")))
    slots = F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias("neg_idx")
    drawn = (
        positives.select("subj", "pred", "obj")
        .crossJoin(n)
        .select("*", slots)
        .withColumn(
            "_idx",
            _md5_32(F.concat_ws(":", F.lit(seed), F.col("subj"),
                                F.col("pred"), F.col("obj"),
                                F.col("neg_idx").cast("string")))
            % F.col("_n"))
        .join(F.broadcast(pool), on="_idx", how="inner")
        .drop("_idx", "_n")
    )
    if exclude_self:
        drawn = drawn.where(F.col("obj_neg") != F.col("subj"))
    return drawn.join(
        positives.select("subj", "pred", F.col("obj").alias("obj_neg")),
        on=["subj", "pred", "obj_neg"], how="left_anti",
    ).select("subj", "pred", "obj", "neg_idx", "obj_neg")
