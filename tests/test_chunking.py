"""chunk_documents edge cases + plan shape (operators/chunking.py)."""

import pytest
from pyspark.sql import functions as F

from ckg_spark.operators.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_doc_single_chunk(spark):
    out = chunk_documents(_docs(spark, [(1, "a b c")]), 8, 2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["chunk_idx"], r["start_token"], r["n_chunk_tokens"],
            r["chunk_text"]) == (0, 0, 3, "a b c")


def test_exact_boundary_no_phantom_chunk(spark):
    # n == chunk_tokens: exactly one chunk, not a trailing empty one
    text = " ".join(f"t{i}" for i in range(8))
    out = chunk_documents(_docs(spark, [(1, text)]), 8, 2).collect()
    assert len(out) == 1 and out[0]["n_chunk_tokens"] == 8


def test_stride_and_overlap(spark):
    toks = [f"t{i}" for i in range(20)]
    out = {r["chunk_idx"]: r for r in chunk_documents(
        _docs(spark, [(1, " ".join(toks))]), 8, 2).collect()}
    # stride 6: starts 0, 6, 12 (12 covers to token 19)
    assert sorted(out) == [0, 1, 2]
    assert [out[i]["start_token"] for i in (0, 1, 2)] == [0, 6, 12]
    assert out[1]["chunk_text"].split(" ") == toks[6:14]
    assert out[2]["n_chunk_tokens"] == 8
    # overlap: last 2 tokens of chunk 0 == first 2 of chunk 1
    assert out[0]["chunk_text"].split(" ")[-2:] == \
        out[1]["chunk_text"].split(" ")[:2]


def test_empty_and_whitespace_docs_emit_nothing(spark):
    out = chunk_documents(_docs(spark, [(1, ""), (2, "   "), (3, "x")]), 8, 2)
    assert [r["doc_id"] for r in out.collect()] == [3]


def test_zero_overlap_partitions_tokens_exactly(spark):
    toks = [f"t{i}" for i in range(17)]
    rows = chunk_documents(
        _docs(spark, [(1, " ".join(toks))]), 5, 0).collect()
    got = []
    for r in sorted(rows, key=lambda r: r["chunk_idx"]):
        got.extend(r["chunk_text"].split(" "))
    assert got == toks  # disjoint cover, short tail kept


def test_invalid_overlap_raises(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), 8, 8)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), 8, -1)


def test_plan_has_no_exchange(spark):
    docs = _docs(spark, [(1, "a b c d e f g h i j")])
    plan = chunk_documents(docs, 4, 1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
