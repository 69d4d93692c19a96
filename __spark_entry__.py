"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Implementations live in ckg_spark/driver_contract.py; this file
stays a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ckg_spark.driver_contract import (  # noqa: E402
    oracle_dict,
    q32_transcript_mention_edges,
    queries_dict,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: documents -> deterministic
    transcripts -> dictionary mention extraction -> entity linking ->
    MENTIONED_IN_TURN (subj, pred, obj) triples."""
    return q32_transcript_mention_edges(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data ops). Aligned column aliases with oracle_sql()."""
    return queries_dict()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents; rows-only ops omitted."""
    return oracle_dict()
