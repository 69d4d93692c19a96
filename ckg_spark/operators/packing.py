"""Fixed-length training-sequence packing (concat-and-split).

Packs a tokenized corpus into back-to-back sequences of exactly
``seq_len`` tokens — the standard LM pretraining layout: documents are
concatenated in a deterministic global order and the stream is cut every
``seq_len`` tokens, so a document may span sequence boundaries and a
sequence may hold many documents. The output is the SEGMENT map
(seq_id, doc_id, doc_offset, seq_offset, n_tokens): everything a reader
needs to assemble sequence ``seq_id`` by slicing token ranges out of
documents — without materializing the token stream itself.

Beyond the reference's surface (CKG has no training-data path); the op a
100 TB pretraining pipeline runs after curation + mixture sampling.

Scale shape: the only corpus-wide structure is the exclusive prefix sum
of token counts in document order, computed with the house two-pass
pattern (range repartition -> per-partition window -> broadcast offsets;
see analytics.with_global_rank) — a bare Window.orderBy would drag the
corpus into one task. Offsets are LONG-typed end to end (10^12-token
corpora overflow nothing; doubles would lose exactness past 2^53). The
segment fan-out is a narrow per-row explode (a doc of t tokens yields
ceil(t / seq_len) + 1 segments at most).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["pack_sequences", "sequence_stats"]


def _global_cumsum_long(df: DataFrame, sort_cols: list, value_col: str,
                        out_name: str) -> DataFrame:
    """Exact (long) global running sum of ``value_col`` in ``sort_cols``
    order — the two-pass shape of analytics.with_global_cumsum, kept
    integer because token offsets must be exact.

    The range-partitioned local result is MATERIALIZED once (eager
    checkpoint) before the totals collect: range partitioning samples its
    boundaries per execution (RangePartitioner seeds by RDD id), so
    executing the subtree twice — once for the per-partition totals, once
    for the offset join — can assign rows to DIFFERENT partitions than the
    ones the offsets were computed for, corrupting the cumsum (observed at
    600k rows: run-dependent duplicate/gapped seq_ids). The checkpoint
    pins one partitioning for both passes and, as a bonus, stops the
    sampling pass from recomputing the upstream projection."""
    from .ckpt import checkpoint_reset_stats

    rp = (df.repartitionByRange(*sort_cols)
          .withColumn("_pid", F.spark_partition_id()))
    w = (Window.partitionBy("_pid").orderBy(*sort_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = checkpoint_reset_stats(
        rp.withColumn("_lsum", F.sum(value_col).over(w).cast("long")))
    totals = sorted(
        (r["_pid"], r["t"]) for r in
        local.groupBy("_pid").agg(F.sum(value_col).alias("t")).collect())
    offs, acc = [], 0
    for pid, t in totals:
        offs.append((pid, acc))
        acc += int(t or 0)
    off_df = df.sparkSession.createDataFrame(
        offs or [(0, 0)], "_pid int, _off long")
    return (local.join(F.broadcast(off_df), on="_pid", how="inner")
            .withColumn(out_name, F.col("_lsum") + F.col("_off"))
            .drop("_pid", "_lsum", "_off"))


def pack_sequences(docs: DataFrame, seq_len: int,
                   token_col: str = "n_tokens",
                   doc_col: str = "doc_id",
                   base_offset: int = 0,
                   shuffle_seed: str | None = None) -> DataFrame:
    """Segment map of the concat-and-split packing.

    Documents are ordered by ``doc_col`` (a deterministic total order);
    with ``shuffle_seed`` they are ordered by the seeded md5 uniform draw
    instead (doc_col breaks ties) — a DETERMINISTIC global shuffle, the
    standard pretraining layout that interleaves sources and breaks
    corpus ordering while staying reproducible on any cluster size (and
    re-derivable by an external engine: ORDER BY the same md5 draw).
    Each doc owns the token span [start, end) of the concatenated stream
    and overlaps sequences floor(start/L) .. floor((end-1)/L). Zero-token
    docs are dropped (they own no span). Shuffled order is NOT available
    through ``pack_sequences_incremental`` (new docs would interleave
    into committed history; incremental packing is defined over
    id-ordered appends only).

    Output columns:
      seq_id     -- training sequence index (0-based; all but the last
                    hold exactly ``seq_len`` tokens)
      doc_id     -- contributing document
      doc_offset -- first token of the segment within the document
      seq_offset -- its position within the sequence
      n_tokens   -- segment length

    ``base_offset`` shifts the whole stream: the docs are treated as
    starting at that token of the concatenated corpus (the incremental
    hook — see ``pack_sequences_incremental``).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    L = F.lit(int(seq_len))
    d = (docs.where(F.col(token_col) > 0)
         .select(doc_col, F.col(token_col).cast("long").alias("_t")))
    if shuffle_seed is None:
        d = _global_cumsum_long(d, [F.col(doc_col).asc()], "_t", "_end")
    else:
        from .sampling import hash_uniform

        d = d.withColumn("_u", hash_uniform(doc_col, seed=shuffle_seed))
        d = _global_cumsum_long(
            d, [F.col("_u").asc(), F.col(doc_col).asc()], "_t", "_end"
        ).drop("_u")
    if base_offset:
        d = d.withColumn("_end", F.col("_end") + F.lit(int(base_offset)))
    d = d.withColumn("_start", F.col("_end") - F.col("_t"))
    segs = d.select(
        doc_col, "_start", "_end",
        F.explode(F.sequence(
            # integer `div`, not float `/`-then-cast: token offsets are
            # longs and the boundary must be exact at any corpus size
            F.expr(f"_start div {int(seq_len)}"),
            F.expr(f"(_end - 1) div {int(seq_len)}"))).alias("seq_id"))
    seg_start = F.greatest("_start", F.col("seq_id") * L)
    seg_end = F.least("_end", (F.col("seq_id") + 1) * L)
    return segs.select(
        "seq_id",
        doc_col,
        (seg_start - F.col("_start")).alias("doc_offset"),
        (seg_start - F.col("seq_id") * L).alias("seq_offset"),
        (seg_end - seg_start).alias("n_tokens"),
    )


def pack_sequences_incremental(spark, docs_delta: DataFrame,
                               seq_len: int, segments_table_dir: str,
                               token_col: str = "n_tokens",
                               doc_col: str = "doc_id",
                               properties: dict | None = None) -> int | None:
    """Append-only packing over a GROWING corpus: new documents extend the
    concatenated token stream, so their segments depend only on the stored
    stream length — pack just the delta and append it to a segment map
    snapshot table (``plans.table``), never re-packing history.

    Correctness needs append ORDER: packing is defined over doc order, so
    every delta doc id must exceed all previously packed ids (the natural
    shape for monotonically assigned ids). Violations raise — re-pack from
    scratch (or into a fresh table) when ids interleave. The commit stamps
    ``total_tokens`` / ``max_doc_id`` / ``seq_len`` in snapshot properties
    (crash-safe high-water marks, the ``plans.incremental`` pattern —
    a replayed delta fails the max_doc_id check instead of double-packing).
    The final sequence of one delta and the first of the next share a
    seq_id when the boundary lands mid-sequence — exactly the full-pack
    layout, as the delta==full test pins. Returns the committed version,
    or None for an empty delta."""
    from ..plans import table as T

    d = docs_delta.where(F.col(token_col) > 0)
    agg = d.agg(F.min(doc_col).alias("lo"), F.max(doc_col).alias("hi"),
                F.sum(F.col(token_col).cast("long")).alias("tok")).collect()[0]
    if agg["tok"] is None:
        return None
    base, prev_hi = 0, None
    if T.current_version(segments_table_dir) is not None:
        props = {}
        for s in T.snapshots(segments_table_dir):
            props.update(s.get("properties") or {})
        if "total_tokens" not in props:
            # every commit this function makes stamps total_tokens, so a
            # non-empty table without one means the marks were destroyed
            # (all stamped snapshots expired / a property-dropping rewrite).
            # Assuming base=0 would silently double-assign offsets — refuse.
            raise ValueError(
                f"{segments_table_dir} has no total_tokens high-water mark "
                "in its live snapshot log; re-pack into a fresh table")
        base = int(props["total_tokens"])
        prev_hi = props.get("max_doc_id")
        stored_l = props.get("seq_len")
        if stored_l is not None and int(stored_l) != int(seq_len):
            raise ValueError(
                f"seq_len {seq_len} != table's packed seq_len {stored_l}")
        if prev_hi is not None and agg["lo"] <= type(agg["lo"])(prev_hi):
            raise ValueError(
                f"delta doc ids must exceed the packed high-water mark "
                f"({agg['lo']} <= {prev_hi}); re-pack into a fresh table "
                f"when ids interleave")
    segs = pack_sequences(d, seq_len, token_col=token_col, doc_col=doc_col,
                          base_offset=base)
    # caller extras first: the packing high-water marks are authoritative
    return T.append(segs, segments_table_dir, properties={
        **(properties or {}),
        "total_tokens": base + int(agg["tok"]),
        "max_doc_id": agg["hi"],
        "seq_len": int(seq_len),
    })


def sequence_stats(segments: DataFrame) -> DataFrame:
    """Per-sequence fill check over a segment map: token fill and the
    number of distinct documents packed into each sequence (every
    sequence except the final one must show fill == seq_len)."""
    return (segments.groupBy("seq_id")
            .agg(F.sum("n_tokens").alias("fill"),
                 F.countDistinct(segments.columns[1]).alias("n_docs")))
