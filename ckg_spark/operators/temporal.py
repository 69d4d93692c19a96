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
    l2, r2, pay_cols = _asof_prepare(left, right, keys, ts_left,
                                     ts_right or ts_left, tiebreak,
                                     direction == "backward")
    matched = _asof_core(l2, r2, keys, tolerance_s,
                         direction == "backward")
    return _asof_project(matched, left.columns, pay_cols, prefix)


def _asof_prepare(left, right, keys, ts_left, ts_right, tiebreak, backward):
    """Pack both sides into the union shape: (keys..., __t, __isr, __tb,
    __p, __l). Forward direction negates the time/tiebreak axes so the
    core only ever solves the backward problem."""
    sign = 1 if backward else -1
    pay_cols = [c for c in right.columns if c not in keys]
    tb = (F.col(tiebreak) if tiebreak is not None else F.lit(0)).cast("long")
    rpack = F.struct(
        _micros(F.col(ts_right)).alias("__mt"),
        *[F.col(c).alias(c) for c in pay_cols],
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        (sign * _micros(F.col(ts_right))).alias("__t"),
        F.lit(1).alias("__isr"),
        (sign * tb).alias("__tb"),
        rpack.alias("__p"),
    )
    # Left rows carry their full row packed in a struct so the union stays
    # two-sided-symmetric without enumerating null-typed right columns.
    lpack = F.struct(*[F.col(c).alias(c) for c in left.columns])
    l2 = left.select(
        *[F.col(k) for k in keys],
        (sign * _micros(F.col(ts_left))).alias("__t"),
        F.lit(0).alias("__isr"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(r2.schema["__p"].dataType).alias("__p"),
        lpack.alias("__l"),
    )
    r2 = r2.withColumn("__l", F.lit(None).cast(l2.schema["__l"].dataType))
    return l2, r2, pay_cols


def _asof_core(l2: DataFrame, r2: DataFrame, part_keys: list[str],
               tolerance_s: float | None, backward: bool) -> DataFrame:
    """Backward as-of over prepared frames: union, ONE shuffle on
    ``part_keys``, per-partition sort, running `last(ignorenulls)`.
    Returns the left rows with the matched payload as ``__m``."""
    u = l2.unionByName(r2.select(*l2.columns))
    order = [F.col("__t").asc(), F.col("__isr").desc(), F.col("__tb").asc()]
    w = (Window.partitionBy(*part_keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w)) \
               .where(F.col("__isr") == 0)
    if tolerance_s is not None:
        tol_us = int(round(tolerance_s * 1_000_000))
        # __mt is the TRUE (unsigned) right timestamp; recover the left
        # one from the possibly-negated axis.
        lt = F.col("__t") if backward else -F.col("__t")
        age = (lt - F.col("__m.__mt")) if backward \
            else (F.col("__m.__mt") - lt)
        matched = matched.withColumn(
            "__m", F.when(age <= F.lit(tol_us), F.col("__m")))
    return matched


def _asof_project(matched: DataFrame, left_cols, pay_cols, prefix):
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left_cols]
    out_cols += [F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in pay_cols]
    return matched.select(*out_cols)


_LONG_MIN = -(2 ** 63)


def asof_join_bucketed(left: DataFrame, right: DataFrame, on: str | list[str],
                       ts_left: str, ts_right: str | None = None, *,
                       bucket_s: float, direction: str = "backward",
                       tolerance_s: float | None = None,
                       tiebreak: str | None = None,
                       prefix: str = "r_") -> DataFrame:
    """Skew-hardened as-of join: identical semantics to ``asof_join`` (the
    property tests assert row-for-row equality), but the final window is
    partitioned by (key, time-bucket), so parallelism scales with the
    TIME RANGE even when one key holds most of the stream — the plain
    per-key window would serialize a hot key into a single task.

    Three phases, none of which sees a per-key unbounded partition:
    1. per-(key, bucket) right WINNER: the as-of-latest right payload in
       the bucket (one `max_by` aggregation, map-side combined);
    2. per-left-bucket CARRY: the latest winner from any strictly earlier
       bucket — itself a tiny as-of join on bucket-level rows (one row
       per non-empty (key, bucket); thousands per key, not billions);
    3. the intra-bucket as-of: union of left rows, right rows, and the
       carry injected as a synthetic right row at bucket start (ordered
       before every real in-bucket row), windowed by (key, bucket).

    ``bucket_s`` trades shuffle width for carry-table size: pick roughly
    (time span / desired parallelism). Forward direction is handled by
    the same negated-axis trick as ``asof_join``."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _as_list(on)
    backward = direction == "backward"
    bucket_us = int(round(bucket_s * 1_000_000))
    if bucket_us <= 0:
        raise ValueError("bucket_s must be positive")

    l2, r2, pay_cols = _asof_prepare(left, right, keys, ts_left,
                                     ts_right or ts_left, tiebreak, backward)
    # floor division keeps ordering on the (possibly negated) axis
    bcol = F.floor(F.col("__t") / F.lit(bucket_us)).cast("long")
    l2b = l2.withColumn("__b", bcol)
    r2b = r2.withColumn("__b", bcol)

    # 1. winner payload per (key, bucket): as-of-latest == max by (t, tb)
    winners = r2b.groupBy(*keys, "__b").agg(
        F.max_by("__p", F.struct("__t", "__tb")).alias("__wp"))

    # 2. carry per LEFT bucket: latest winner from a strictly earlier
    # bucket. Reuse the core on bucket-level rows (left "time" = bucket,
    # right "time" = bucket+1 -> inclusive match means wb < lb).
    lbuckets = l2b.select(*keys, "__b").distinct()
    cl = lbuckets.select(
        *keys, F.col("__b").alias("__t"), F.lit(0).alias("__isr"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(winners.schema["__wp"].dataType).alias("__p"),
        F.struct(F.col("__b").alias("__b")).alias("__l"))
    cr = winners.select(
        *keys, (F.col("__b") + 1).alias("__t"), F.lit(1).alias("__isr"),
        F.col("__b").alias("__tb"), F.col("__wp").alias("__p"),
        F.lit(None).cast(cl.schema["__l"].dataType).alias("__l"))
    carry = (_asof_core(cl, cr, keys, None, True)
             .where(F.col("__m").isNotNull())
             .select(*keys, F.col("__l.__b").alias("__b"),
                     F.col("__m").alias("__cp")))

    # 3. intra-bucket as-of with the carry as a synthetic right row at
    # bucket start (ordered before every real row in the bucket).
    synth = carry.select(
        *keys, (F.col("__b") * bucket_us).alias("__t"),
        F.lit(1).alias("__isr"), F.lit(_LONG_MIN).alias("__tb"),
        F.col("__cp").alias("__p"),
        F.lit(None).cast(l2b.schema["__l"].dataType).alias("__l"), "__b")
    matched = _asof_core(l2b, r2b.unionByName(synth.select(*r2b.columns)),
                         keys + ["__b"], tolerance_s, backward)
    return _asof_project(matched, left.columns, pay_cols, prefix)


def recency_weighted_scores(df: DataFrame, keys: str | list[str],
                            ts_col: str, ref_ts: str,
                            half_life_seconds: float,
                            weight_col: Column | None = None) -> DataFrame:
    """Exponential recency decay per key — the temporal-KG edge/profile
    scoring pass: each event contributes weight * 0.5^(age/half_life),
    age measured back from ``ref_ts`` (a fixed reference instant, e.g.
    the corpus watermark — a string literal so the op stays deterministic
    and reproducible, never wall-clock).

    Output per key: n_events, first_seen, last_seen, recency_score.
    ONE map-side-combined aggregation (sum/min/max/count are all
    algebraic) — a hot entity's million mentions reduce to one partial
    per map partition before the shuffle.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    # microsecond precision: unix_timestamp truncates to whole seconds,
    # which breaks the exact-decay claim for sub-second event spacing
    age_s = ((F.unix_micros(F.to_timestamp(F.lit(ref_ts)))
              - F.unix_micros(F.col(ts_col))).cast("double")
             / F.lit(1_000_000.0))
    w = F.pow(F.lit(0.5), age_s / F.lit(float(half_life_seconds)))
    if weight_col is not None:
        w = w * weight_col
    return (df.groupBy(*ks).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("first_seen"),
        F.max(ts_col).alias("last_seen"),
        F.sum(w).alias("recency_score")))
