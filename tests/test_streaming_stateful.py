"""Event-time windowed aggregation + applyInPandasWithState stateful op."""

import os
import time

import pandas as pd
from pyspark.sql import functions as F

from ckg_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from ckg_spark.streaming.stateful import (
    first_mentions_stateful,
    linked_mention_stream,
    windowed_mention_counts,
)


def _write_ordered(dirname: str, frames: list[pd.DataFrame]) -> None:
    """Write one parquet per frame with strictly increasing mtimes so the
    file stream processes them as ordered micro-batches."""
    os.makedirs(dirname, exist_ok=True)
    base = time.time() - 1000
    for i, f in enumerate(frames):
        p = f"{dirname}/part{i}.parquet"
        f.to_parquet(p, index=False)
        os.utime(p, (base + i, base + i))


def _stream(spark, in_dir):
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )


def test_windowed_counts_match_batch(spark, vocab_tables, transcripts_pdf, tmp_path):
    in_dir = str(tmp_path / "in")
    half = len(transcripts_pdf) // 2
    _write_ordered(in_dir, [transcripts_pdf.iloc[:half], transcripts_pdf.iloc[half:]])

    out = windowed_mention_counts(_stream(spark, in_dir), vocab_tables,
                                  window_duration="10 minutes",
                                  watermark_delay="10 days")  # nothing late
    q = (out.writeStream.format("memory").queryName("wincounts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.sql(
        "SELECT window.start AS ws, ident, entity_type, n FROM wincounts"
    ).toPandas()

    batch_turns = spark.createDataFrame(transcripts_pdf, TRANSCRIPT_SCHEMA)
    exp = (
        linked_mention_stream(batch_turns, vocab_tables)
        .groupBy(F.window("ts", "10 minutes"), "ident", "entity_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "ident", "entity_type", "n")
        .toPandas()
    )
    key = ["ws", "ident", "entity_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False)
    assert len(got_s) > 0


def test_windowed_counts_drop_late_rows(spark, vocab_tables, transcripts_pdf, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # batch 2: one conversation re-sent with event time far in the past —
    # beyond the watermark established by batch 1, so it must be dropped.
    # Batches are driven explicitly (write -> processAllAvailable) because
    # availableNow may consolidate files into one micro-batch, in which case
    # no watermark exists yet to drop against.
    late = transcripts_pdf.iloc[:4].copy()
    late["ts"] = (late["ts"] - pd.Timedelta(days=365)).astype(
        transcripts_pdf["ts"].dtype)

    out = windowed_mention_counts(_stream(spark, in_dir), vocab_tables,
                                  window_duration="10 minutes",
                                  watermark_delay="1 minute")
    # update mode: the watermark filters late input rows and evicts state
    # (complete mode keeps all state and never drops late data)
    q = (out.writeStream.format("memory").queryName("latecounts")
         .outputMode("update").trigger(processingTime="500 milliseconds")
         .start())
    try:
        transcripts_pdf.to_parquet(f"{in_dir}/part0.parquet", index=False)
        q.processAllAvailable()
        late.to_parquet(f"{in_dir}/part1.parquet", index=False)
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT window.start AS ws FROM latecounts").toPandas()
    assert len(got) > 0
    min_expected = transcripts_pdf["ts"].min() - pd.Timedelta(minutes=10)
    assert (got["ws"] >= min_expected).all(), "late rows leaked into the aggregation"


def test_first_mentions_stateful_dedups_across_batches(
    spark, vocab_tables, transcripts_pdf, tmp_path
):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # send the SAME turns twice as two explicit micro-batches: the second
    # must emit nothing new (every (conv, entity) already in state)
    out = first_mentions_stateful(_stream(spark, in_dir), vocab_tables)
    q = (out.writeStream.format("memory").queryName("firstm")
         .outputMode("update").trigger(processingTime="500 milliseconds")
         .start())
    try:
        transcripts_pdf.to_parquet(f"{in_dir}/part0.parquet", index=False)
        q.processAllAvailable()
        transcripts_pdf.to_parquet(f"{in_dir}/part1.parquet", index=False)
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT conv_id, ident FROM firstm").toPandas()
    assert len(got) > 0
    # one first-mention event per (conv, entity), despite duplicate batches
    assert not got.duplicated(["conv_id", "ident"]).any()

    # ground truth: distinct (conv, ident) pairs from the batch path
    batch_turns = spark.createDataFrame(transcripts_pdf, TRANSCRIPT_SCHEMA)
    exp = (
        linked_mention_stream(batch_turns, vocab_tables)
        .select("conv_id", "ident").distinct().toPandas()
    )
    assert set(map(tuple, got[["conv_id", "ident"]].values)) == \
        set(map(tuple, exp[["conv_id", "ident"]].values))


def test_processing_time_timeout_guard_raises_cleanly(spark, vocab_tables):
    """The known-broken ProcessingTimeTimeout path must fail fast on the
    driver with the documented caveat (round-2 verdict item 9), not crash a
    worker mid-stream."""
    import pytest
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ckg_spark.streaming import stateful as SS

    SS.check_state_timeout_support(GroupStateTimeout.NoTimeout)  # fine
    with pytest.raises(NotImplementedError, match="known-broken"):
        SS.check_state_timeout_support(GroupStateTimeout.ProcessingTimeTimeout)
    dummy = spark.readStream.format("rate").load()
    with pytest.raises(NotImplementedError, match="known-broken"):
        SS.first_mentions_stateful(
            dummy, vocab_tables,
            timeout_conf=GroupStateTimeout.ProcessingTimeTimeout)


def test_streaming_exact_dedup(spark, tmp_path):
    """First occurrence of each normalized text survives; in-horizon
    duplicates are dropped; normalization matches batch dedup_exact."""
    from ckg_spark.streaming.stateful import streaming_exact_dedup

    base = pd.Timestamp("2026-01-01 12:00:00")
    b1 = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "ts": pd.Series([base, base, base + pd.Timedelta(minutes=1)],
                        dtype="datetime64[us]"),
        "text": ["Hello,   World!", "another doc entirely", "hello world"],
    })
    b2 = pd.DataFrame({
        "doc_id": [4, 5],
        "ts": pd.Series([base + pd.Timedelta(minutes=2)] * 2,
                        dtype="datetime64[us]"),
        "text": ["HELLO world!!", "a genuinely new one"],
    })
    in_dir = str(tmp_path / "docs_in")
    _write_ordered(in_dir, [b1, b2])
    stream = (
        spark.readStream
        .schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = streaming_exact_dedup(stream, watermark_delay="1 hour")
    q = (out.writeStream.format("memory").queryName("dedupstream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql("SELECT doc_id FROM dedupstream").toPandas()
    # doc 3 normalizes to doc 1's text; doc 4 too -> only first survives
    assert sorted(got["doc_id"]) == [1, 2, 5]


def test_streaming_curate(spark, tmp_path):
    """Stateless quality+language predicates + watermark dedup on a file
    stream; matches the batch curation semantics for the same rules."""
    from ckg_spark.streaming.stateful import streaming_curate

    base = pd.Timestamp("2026-02-01 09:00:00")
    good = ("the quick brown fox jumps over the lazy dog and then the dog "
            "chases the fox around the big field while the sun sets")
    b1 = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "ts": pd.Series([base] * 3, dtype="datetime64[us]"),
        "text": [good, "too short", good.upper()],  # 3 = exact dup of 1
    })
    b2 = pd.DataFrame({
        "doc_id": [4],
        "ts": pd.Series([base + pd.Timedelta(minutes=1)], dtype="datetime64[us]"),
        "text": [good.replace("fox", "owl").replace("dog", "cat")
                     .replace("field", "yard")],
    })
    in_dir = str(tmp_path / "curate_in")
    _write_ordered(in_dir, [b1, b2])
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    out = streaming_curate(
        stream, gopher_kwargs={"min_words": 10, "min_stopword_hits": 1})
    q = (out.writeStream.format("memory").queryName("curatestream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = sorted(
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM curatestream").collect())
    assert got == [1, 4]


def test_streaming_session_stats_matches_batch(spark, tmp_path):
    """Native session_window streaming sessions == the batch
    temporal.session_stats composition (no exact-boundary gaps in the
    fixture; streaming session_end = last event + gap by convention)."""
    import datetime as dt

    import pandas as pd

    from ckg_spark.operators import temporal as T
    from ckg_spark.streaming.stateful import streaming_session_stats

    def ts(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    rows = [
        # user 1: sessions {0,100}, {5000, 5050}; user 2: one session
        (1, ts(0), 2.0, 1), (1, ts(100), 3.0, 2),
        (1, ts(5000), 5.0, 3), (1, ts(5050), 7.0, 4),
        (2, ts(10), 1.0, 5), (2, ts(200), 1.5, 6),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value", "event_id"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    in_dir = str(tmp_path / "sess_in")
    _write_ordered(in_dir, [pdf.iloc[:3], pdf.iloc[3:]])

    stream = (spark.readStream
              .schema("user_id long, ts timestamp, value double, event_id long")
              .option("maxFilesPerTrigger", 1).parquet(in_dir))
    out = streaming_session_stats(stream, "user_id", gap="16 minutes",
                                  value_col="value")
    q = (out.writeStream.format("memory").queryName("sessout")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["user_id"], r["session_start"]): r
           for r in spark.sql("select * from sessout").collect()}

    batch = spark.createDataFrame(pdf)
    exp = {(r["user_id"], r["session_idx"]): r
           for r in T.session_stats(batch, "user_id", "ts", 960.0,
                                    value_col="value",
                                    tiebreak="event_id").collect()}
    assert len(got) == len(exp) == 3
    for (u, sidx), e in exp.items():
        start = dt.datetime.utcfromtimestamp(e["start_us"] / 1e6)
        g = got[(u, start)]
        assert g["n_events"] == e["n_events"]
        assert g["sum_value"] == e["sum_value"]
        # streaming session extent = last event + gap
        end = dt.datetime.utcfromtimestamp(e["end_us"] / 1e6)
        assert g["session_end"] == end + dt.timedelta(seconds=960)
