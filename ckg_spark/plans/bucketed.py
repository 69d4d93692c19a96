"""Bucketed graph tables — co-located joins without a shuffle.

The kg pipeline's recurring join/agg keys are stable (subj / conv_id /
doc_id), so at deployment the hot tables are written BUCKETED on those
keys: Spark records the bucketing in the catalog, and any join or
aggregation between tables bucketed the same way satisfies the
requiredDistribution from the FILE LAYOUT — the plan contains no
Exchange at all (asserted in tests/test_bucketed.py). This is the
"bucketing for co-located joins" leg of the scale posture, complementing
the snapshot tables' partition-pruning leg (`plans/table.py`): partition
dirs prune WHICH files are read, bucketing fixes WHERE rows land so
repeated joins stop paying the shuffle.

Sizing note for 100 TB: pick bucket counts as a multiple of the target
cluster's parallelism (e.g. 4096 for ~1000 executors) and the SAME count
on both sides of a recurring join — mismatched counts fall back to a
shuffle on one side (Spark only elides the exchange when the bucketing
matches the required distribution). Requires a catalog (`saveAsTable`);
the in-memory session catalog works locally, a Hive/Glue/Unity metastore
at deploy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, key: str | list[str],
                   buckets: int = 32, path: str | None = None,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Write ``df`` as a parquet table bucketed (and by default sorted)
    on ``key``. ``path`` makes it an external table (data at ``path``,
    metadata in the catalog)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).format("parquet").bucketBy(int(buckets), *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — the bucketing metadata rides along, so downstream
    joins/aggs on the bucket key plan exchange-free."""
    return spark.table(name)

