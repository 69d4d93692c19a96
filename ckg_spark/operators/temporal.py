"""Temporal operators: gap sessionization and distributed as-of joins.

The reference analyzes longitudinal/timecourse cohorts with pandas
group-sorts (reference `src/analytics_core/analytics/analytics.py`
run_two_way_anova / longitudinal helpers iterate per-subject frames);
re-expressed here as the two primitive temporal operators a
transcript/event stream actually needs at corpus scale:

- ``sessionize`` — split each key's ordered event stream into sessions
  wherever the inter-event gap exceeds a threshold (conversation
  segmentation for transcripts, browsing sessions for events).
- ``asof_join`` — for every left row, the nearest right row at-or-before
  (or at-or-after) its timestamp per key. Spark has no ASOF JOIN
  operator (DuckDB/Pandas do); the classic distributed plan is the
  union-sort-window technique below, which costs ONE hash shuffle of
  each side on the join key and never builds a range product.

Scale shape (both operators): a single Exchange on the key followed by
one per-partition sort — the same cost as any keyed window. All gap /
match arithmetic is integer microseconds (`unix_micros`), so results
are bit-identical across engines (no float epoch rounding). Hot keys
serialize within their window partition; for a key so hot one task
can't sort it, pre-split by coarse time range with boundary replication
(the curation pipeline's salting pattern) — not needed below the
billions-of-rows-per-key mark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def _micros(col: Column) -> Column:
    """Integer microseconds since epoch. Testdata parquet carries
    TIMESTAMP_NTZ; the session timezone is pinned UTC (session.py), so the
    cast to TIMESTAMP is numerically a no-op and `unix_micros` applies."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(df: DataFrame, key_col: str | list[str], ts_col: str,
               gap_seconds: float, tiebreak: str | None = None) -> DataFrame:
    """Add a 0-based ``session_idx`` per key: a new session starts at the
    first event and at every event whose gap to the previous one exceeds
    ``gap_seconds`` (strict). One shuffle (window on the key)."""
    keys = _as_list(key_col)
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    t = _micros(F.col(ts_col))
    prev = F.lag(t).over(w)
    gap_us = int(round(gap_seconds * 1_000_000))
    is_new = F.when(prev.isNull() | ((t - prev) > F.lit(gap_us)), 1).otherwise(0)
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", (F.sum(is_new).over(run) - 1).cast("long"))


def session_stats(df: DataFrame, key_col: str | list[str], ts_col: str,
                  gap_seconds: float, value_col: str | None = None,
                  tiebreak: str | None = None) -> DataFrame:
    """Per-session aggregate view: (key, session_idx, n_events, start/end
    micros, duration, optional value sum). The groupBy keys extend the
    window's partition keys, so Catalyst elides the second Exchange —
    sessionization + stats is ONE shuffle total."""
    keys = _as_list(key_col)
    s = sessionize(df, keys, ts_col, gap_seconds, tiebreak=tiebreak)
    t = _micros(F.col(ts_col))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(t).alias("start_us"),
        F.max(t).alias("end_us"),
        (F.max(t) - F.min(t)).alias("duration_us"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return s.groupBy(*keys, "session_idx").agg(*aggs)


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              ts_left: str, ts_right: str | None = None, *,
              direction: str = "backward", tolerance_s: float | None = None,
              tiebreak: str | None = None, prefix: str = "r_") -> DataFrame:
    """Distributed as-of join: for each left row, attach the right row
    with the greatest ``ts_right`` <= ``ts_left`` (direction='backward',
    inclusive) or the least >= (direction='forward') within the same key.

    Technique: tag and union both sides, hash-shuffle ONCE on the key,
    sort each partition by (time, side), and carry the latest right
    payload forward with ``last(..., ignorenulls=True)`` over the
    preceding frame. At equal timestamps the right row is visible to the
    left row (inclusive); among right rows tied on the timestamp the
    winner is the greatest ``tiebreak`` for backward (least for forward)
    — pass one whenever (key, ts) can repeat on the right, otherwise the
    winner is partition-order dependent. ``tolerance_s`` nulls matches
    older (newer) than the window. Right columns come back prefixed.

    Cost: one Exchange + sort per side (the union shuffles once), no
    range expansion, no driver state — the plan a 100 TB event stream
    needs. Left rows with no qualifying right row keep null payloads
    (left-outer semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _as_list(on)
    ts_right = ts_right or ts_left
    backward = direction == "backward"

    pay_cols = [c for c in right.columns if c not in keys]
    tb = (F.col(tiebreak) if tiebreak is not None else F.lit(0)).cast("long")
    rpack = F.struct(
        _micros(F.col(ts_right)).alias("__mt"),
        *[F.col(c).alias(c) for c in pay_cols],
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        _micros(F.col(ts_right)).alias("__t"),
        F.lit(1).alias("__isr"),
        tb.alias("__tb"),
        rpack.alias("__p"),
    )
    # Left rows carry their full row packed in a struct so the union stays
    # two-sided-symmetric without enumerating null-typed right columns.
    lpack = F.struct(*[F.col(c).alias(c) for c in left.columns])
    l2 = left.select(
        *[F.col(k) for k in keys],
        _micros(F.col(ts_left)).alias("__t"),
        F.lit(0).alias("__isr"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(r2.schema["__p"].dataType).alias("__p"),
        lpack.alias("__l"),
    )
    r2 = r2.withColumn("__l", F.lit(None).cast(l2.schema["__l"].dataType))

    u = l2.unionByName(r2.select(*l2.columns))
    if backward:
        order = [F.col("__t").asc(), F.col("__isr").desc(), F.col("__tb").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__isr").desc(), F.col("__tb").desc()]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w)) \
               .where(F.col("__isr") == 0)

    if tolerance_s is not None:
        tol_us = int(round(tolerance_s * 1_000_000))
        age = (F.col("__t") - F.col("__m.__mt")) if backward \
            else (F.col("__m.__mt") - F.col("__t"))
        matched = matched.withColumn(
            "__m", F.when(age <= F.lit(tol_us), F.col("__m")))

    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in pay_cols]
    return matched.select(*out_cols)
