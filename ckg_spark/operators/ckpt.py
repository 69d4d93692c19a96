"""Iteration-safe checkpointing for the iterative graph/dedup operators.

``Dataset.localCheckpoint`` truncates LINEAGE but PRESERVES the plan's size
statistics on the checkpointed relation, and Catalyst's
``SizeInBytesOnlyStatsPlanVisitor`` estimates a join's sizeInBytes as the
PRODUCT of its children's estimates. An iterative algorithm that joins its
own previous (checkpointed) output k times per round therefore compounds the
estimate super-exponentially — digits(r+1) ≈ k * digits(r) — and after a
dozen rounds the driver spends MINUTES per plan inside
``canBroadcastBySize`` multiplying million-digit BigIntegers
(observed on the louvain fallback level loop; jstack pinned the planner
thread in ``BigInteger.multiplyToomCook3`` with all executors idle).

``checkpoint_reset_stats`` eagerly localCheckpoints and then rebuilds the
DataFrame as a FRESH LogicalRDD scan over the already-materialized internal
row RDD, so the leaf estimate resets to ``spark.sql.defaultSizeInBytes``
instead of inheriting the product. Zero extra jobs, zero Python round-trip —
the rebuilt plan scans the same executor-local checkpoint blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_reset_stats(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint whose result does NOT inherit the (possibly
    astronomically overestimated) pre-checkpoint sizeInBytes statistics.

    Falls back to the plain eager localCheckpoint on session types without
    JVM plan access (Spark Connect), where the private rebuild is
    unavailable — correctness is identical either way; only planning-time
    growth differs.
    """
    ck = df.localCheckpoint(eager=True)
    try:
        spark = ck.sparkSession
        jdf = ck._jdf
        jrdd = jdf.queryExecution().toRdd()
        jnew = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False)
        return DataFrame(jnew, spark)
    except Exception:
        return ck
