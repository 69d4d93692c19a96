"""Deterministic corpus sampling and mixture weighting.

Training-data ops beyond the reference's surface (CKG ingests curated
uploads wholesale — graphdb_builder loads every parsed row; a 10^12-turn
corpus is SAMPLED into training mixes). Everything here is reproducible
by construction: selection depends only on (seed, key), never on
partitioning, task order, or a random number generator, so the same call
emits the identical corpus on any cluster size — and an external engine
can re-derive the exact selection (the q72 DuckDB oracle does).

Scale shape: `hash_uniform` is a JVM-side md5 per row (no shuffle, no
UDF); `mixture_sample` adds ONE map-side-combined per-source aggregate
(sources are dictionary-scale) and a broadcast join of the rate table —
the corpus itself is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hash_uniform", "deterministic_sample", "mixture_rates",
           "mixture_sample"]

_TWO32 = 4294967296.0  # 2^32


def hash_uniform(key_col: str | Column, seed: str = "mix") -> Column:
    """Deterministic uniform draw in [0, 1) per key: the first 32 bits of
    md5("<seed>:<key>") divided by 2^32. md5 — not xxhash64 — so external
    engines reproduce the exact selection bit-for-bit (DuckDB:
    ('0x' || substr(md5(s), 1, 8))::BIGINT / 4294967296.0). Changing the
    seed yields an independent draw (re-sampling without correlation)."""
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), col.cast("string"))),
                    1, 8), 16, 10)
    return h.cast("double") / F.lit(_TWO32)


def deterministic_sample(df: DataFrame, rate: float, key: str = "doc_id",
                         seed: str = "mix") -> DataFrame:
    """Keep each row iff hash_uniform(key) < rate. Reproducible under any
    parallelism; disjoint seeds give independent samples (so a held-out
    split is `rate=r, seed=a` + `rate=r', seed=b` without overlap math)."""
    return df.where(hash_uniform(key, seed) < F.lit(float(rate)))


def mixture_rates(available: dict[str, float], targets: dict[str, float],
                  budget: float | None = None) -> dict[str, float]:
    """Per-source keep rates realizing a target mixture.

    ``available[s]`` = weight present in source s (tokens or docs);
    ``targets[s]`` = desired fraction of the output mix (sum <= 1 over the
    sources to keep; missing sources are dropped, rate 0). With no budget
    the mix is scaled to the largest achievable size without upsampling:
    B = min_s available[s] / targets[s]; with a budget, B = min(budget,
    that). rate_s = targets[s] * B / available[s] (in (0, 1])."""
    if not targets:
        return {}
    feasible = min(available[s] / f for s, f in targets.items() if f > 0)
    b = feasible if budget is None else min(float(budget), feasible)
    return {s: (f * b / available[s] if f > 0 else 0.0)
            for s, f in targets.items()}


def mixture_sample(docs: DataFrame, targets: dict[str, float],
                   source_col: str = "source", weight_col: str | None = None,
                   key: str = "doc_id", seed: str = "mix",
                   budget: float | None = None) -> DataFrame:
    """Sample a training mixture: per-source deterministic downsampling at
    rates that realize ``targets`` (fractions of the output mix by
    ``weight_col`` — e.g. a token count — or by document count when None).

    Expected mixture is exact in the sampling rates; the realized mix
    concentrates around it (independent per-doc draws). One per-source
    aggregate (driver-scale: sources are a dictionary) + one broadcast
    rate join + a JVM hash filter — the corpus never shuffles."""
    w = F.lit(1.0) if weight_col is None else F.col(weight_col).cast("double")
    avail = {r["s"]: float(r["w"])
             for r in docs.groupBy(F.col(source_col).alias("s"))
             .agg(F.sum(w).alias("w")).collect()
             if r["s"] in targets and r["w"]}
    missing = [s for s, f in targets.items() if f > 0 and s not in avail]
    if missing:
        # silently dropping an absent source would ship a corpus whose
        # realized mix bears no relation to the requested one (the other
        # sources fill its share) — make the infeasibility loud
        raise ValueError(
            f"target sources have no weight in the corpus: {sorted(missing)}")
    rates = mixture_rates(avail, targets, budget)
    spark = docs.sparkSession
    rate_df = spark.createDataFrame(
        sorted(rates.items()) or [("", 0.0)],
        f"{source_col} string, _rate double")
    return (docs.join(F.broadcast(rate_df), on=source_col, how="inner")
            .where(hash_uniform(key, seed) < F.col("_rate"))
            .drop("_rate"))
