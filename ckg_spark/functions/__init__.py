"""Scalar expression helpers (SURVEY.md §2.9 function surface).

Column factories shared across operators: composite keys, symmetric-pair
canonical ordering, safe casts, JSON prop access. Everything is a built-in
``pyspark.sql.functions`` composition — JVM-side, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def composite_id(*cols, sep: str = "_") -> Column:
    """Composite key synthesis (P10): protein_pos-mod style ids
    (reference: proteomicsParser.py:257)."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


def symmetric_pair(a: str | Column, b: str | Column) -> tuple[Column, Column]:
    """Canonical (min, max) ordering for undirected pair dedup — the Spark
    form of stored.add((a,b)); stored.add((b,a)) (stringParser.py:54-57)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.least(ca, cb), F.greatest(ca, cb)


def safe_double(c: str | Column) -> Column:
    """pd.to_numeric(errors='coerce') analog (P12)."""
    return F.try_cast(F.col(c) if isinstance(c, str) else c, "double")


def json_prop(c: str | Column, key: str) -> Column:
    """props JSON field access (events.props in testdata)."""
    return F.get_json_object(F.col(c) if isinstance(c, str) else c, f"$.{key}")


def log2_nan_safe(c: str | Column) -> Column:
    """np.log2 with inf->null (reference: proteomicsParser.py:545-555)."""
    col = F.col(c) if isinstance(c, str) else c
    v = F.log2(col)
    return F.when(v.isNotNull() & ~F.isnan(v), v)
