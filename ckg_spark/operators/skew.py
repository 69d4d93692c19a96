"""Explicit skew handling: salting for hot keys (SURVEY.md §4 item 3).

AQE's skew-join splitting (on in session.py) covers join-side skew at
runtime; these helpers cover the cases AQE can't:

- ``salted_aggregate``: two-phase aggregation for NON-algebraic aggregates
  over skewed keys (e.g. collect_set/collect_list of large sets, exact
  distinct counts). Algebraic aggs (min/max/sum/count) don't need this —
  map-side partial aggregation already absorbs hot keys; use this when the
  per-key state is itself large.
- ``salted_join``: replicate the small side S times, salt the big side's
  key with hash(row) % S — spreads one hot key over S reducers. Use when a
  broadcast is impossible (both sides large) and a handful of keys dominate
  (the reference's degree<200 guard, datasets_cypher.yml:180, is the
  drop-the-hubs version; this keeps them).

The salt is derived from stable row content (xxhash64), never from
random(), so results are identical at any parallelism (determinism gate).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, cols: Sequence[str], buckets: int,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from the full row's hash."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )


def salted_collect_set(df: DataFrame, key_cols: Sequence[str], value_col: str,
                       buckets: int = 16, out_col: str = "values") -> DataFrame:
    """collect_set per key with a salted pre-aggregation:
    phase 1 groups on (key, salt) — hot keys spread over ``buckets``
    reducers; phase 2 merges the per-salt sets with flatten+array_distinct.
    """
    salted = with_salt(df, key_cols, buckets)
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        F.collect_set(value_col).alias("_part")
    )
    return (
        phase1.groupBy(*key_cols)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("_part")))
            ).alias(out_col)
        )
    )


def salted_count_distinct(df: DataFrame, key_cols: Sequence[str], value_col: str,
                          buckets: int = 16, out_col: str = "n_distinct") -> DataFrame:
    """Exact distinct count per skewed key: phase 1 dedupes (key, value)
    within salt buckets, phase 2 sums bucket-distinct counts. The value's
    own hash is the salt so equal values always land in the same bucket
    (no double counting)."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets)))
    phase1 = (
        salted.select(*key_cols, "_salt", value_col)
        .dropDuplicates([*key_cols, "_salt", value_col])
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_n").cast("long").alias(out_col))


def salted_join(big: DataFrame, small: DataFrame, on: str, buckets: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join with reducer-spreading for hot keys on the big side.

    big gets salt = hash(all cols) % buckets; small is exploded x buckets.
    Output columns = big's ∪ small's (minus the duplicate key), same as a
    plain join on ``on``.
    """
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets))
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return b.join(s, on=[on, "_salt"], how=how).drop("_salt")
