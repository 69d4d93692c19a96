"""Similarity search over embedding columns (array<float>).

Two paths, per the scale contract:
- ``cosine_topk``: brute-force exact — a single JVM pass computing the dot
  product against a literal query vector with ``zip_with``/``aggregate``
  (no Python), then a top-k. The baseline and the verifier for the ANN path.
- ``lsh_topk``: random-hyperplane LSH — sign-bit signatures from fixed
  deterministic planes, bucket by signature prefix, exact rerank inside the
  probed buckets only. At 100 TB the bucket join prunes the candidate set by
  ~2^bits; the planes are seeded constants so results are stable across runs
  and cluster sizes.

Also ``embedding_near_dups``: all-pairs near-duplicate detection by cosine
over LSH buckets (the embedding flavor of dedup).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, functions as F


def _vec_lit(vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in vec])


def with_cosine(df: DataFrame, query: list[float], vec_col: str = "embedding",
                out_col: str = "cosine") -> DataFrame:
    """Append cosine similarity vs a literal query vector — pure JVM."""
    q = _vec_lit(query)
    qn = math.sqrt(sum(x * x for x in query)) or 1.0
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return df.withColumn(out_col, dot / (norm * F.lit(qn)))


def cosine_topk(df: DataFrame, query: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force top-k by cosine (ties broken by id for determinism)."""
    scored = with_cosine(df, query, vec_col)
    return (
        scored.select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _planes(dim: int, n_planes: int, seed: int = 1234) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature_col(vec_col: str, planes: list[list[float]]):
    """Bit-signature column: bit i = sign(v . plane_i)."""
    bits = []
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), _vec_lit(p), lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("long")


def lsh_topk(df: DataFrame, query: list[float], k: int = 10, n_planes: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 1234, multiprobe_hamming: int = 1) -> DataFrame:
    """Approximate top-k: filter to buckets within ``multiprobe_hamming`` of
    the query signature, exact-rerank the survivors."""
    dim = len(query)
    planes = _planes(dim, n_planes, seed)
    sig = lsh_signature_col(vec_col, planes)
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) >= 0:
            qsig |= 1 << i
    cands = df.withColumn("_sig", sig).where(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= multiprobe_hamming
    )
    return cosine_topk(cands.drop("_sig"), query, k=k, id_col=id_col, vec_col=vec_col)


def embedding_near_dups(df: DataFrame, threshold: float = 0.95, n_planes: int = 12,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        seed: int = 99, bucket_cap: int = 500) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, candidates from identical
    LSH signatures (high threshold -> near-identical signatures)."""
    first = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not first:
        return df.sparkSession.createDataFrame([], "id_a long, id_b long, cosine double")
    dim = first[0]["d"]
    planes = _planes(dim, n_planes, seed)
    sigs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_signature_col(vec_col, planes).alias("sig"),
    )
    counts = sigs.groupBy("sig").count().where(F.col("count") <= bucket_cap)
    small = sigs.join(counts.select("sig"), on="sig", how="left_semi")
    a, b = small.alias("a"), small.alias("b")
    pairs = (
        a.join(b, on="sig")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                F.aggregate(
                    F.zip_with(F.col("a.v"), F.col("b.v"),
                               lambda x, y: x.cast("double") * y.cast("double")),
                    F.lit(0.0), lambda acc, x: acc + x)
                / (
                    F.sqrt(F.aggregate(F.col("a.v"), F.lit(0.0),
                                       lambda acc, x: acc + x.cast("double") * x.cast("double")))
                    * F.sqrt(F.aggregate(F.col("b.v"), F.lit(0.0),
                                         lambda acc, x: acc + x.cast("double") * x.cast("double")))
                )
            ).alias("cosine"),
        )
    )
    return pairs.where(F.col("cosine") >= threshold)
