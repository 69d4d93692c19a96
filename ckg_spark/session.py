"""SparkSession factory with scale-aware defaults.

Single place where execution knobs live so tests, bench.py and the driver
entry point all run with identical semantics (UTC timestamps, AQE on,
Arrow on, shuffle partitions ~ cores for local mode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ckg_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    - ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores.
    - shuffle partitions default to 2x cores locally (on a real cluster this
      would be sized to keep post-shuffle partitions ~128-512 MB; AQE
      coalesces small ones either way).
    - session timezone pinned to UTC so results compare bit-for-bit with
      the DuckDB oracle (duckdb timestamps are UTC-naive).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # prefer shuffled-hash over sort-merge when the per-partition build
        # side fits (guide §3.1): skips both sort passes. Parameterised so a
        # deployment can flip it back; AQE's skew split still applies to SHJ.
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"))
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP", str(64 * 1024 * 1024)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # ObjectHashAggregate (collect_set/collect_list) falls back to a
        # SORT-based aggregation after only 128 distinct keys per task by
        # default; the co-mention per-turn sets hold ~turns/partitions keys
        # (~100k+), and the forced sort ANTI-scaled 2->8 cores (measured
        # 0.89x; spill merging serializes). With partitions sized to the
        # north-rule 128-512 MB, distinct turn keys per task stay ~1M, so a
        # 2M in-memory threshold is safe and keeps the agg hash-based
        # (measured: co-mention 21.1s -> 13.0s at local[8], 600k turns).
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                str(2_000_000))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions",
                "-Dio.netty.tryReflectionSetAccessible=true "
                + os.environ.get("SPARK_GRAFT_JAVA_OPTS", ""))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
