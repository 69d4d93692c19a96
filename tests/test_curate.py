"""Corpus-curation pipeline (plans/curate.py): stage semantics + resume."""

import pandas as pd
import pytest

from ckg_spark.plans.curate import run_curation_pipeline


GOOD = ("the quick brown fox jumps over the lazy dog and then the dog "
        "chases the fox around the big field while the sun sets slowly "
        "over the quiet hills and the day winds down to a gentle end "
        "with the stars coming out one by one over the old farm")


@pytest.fixture()
def corpus_pdf():
    near_dup = GOOD.replace("gentle end", "calm finish")
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "text": [
            GOOD,                      # survives everything
            GOOD,                      # exact duplicate of 1 -> dropped
            near_dup,                  # near-dup of 1 -> dropped (minhash)
            "tiny",                    # fails gopher word count
            # French: passes the (English-list) gopher stopword rule via one
            # 'the', classifies fr by stopword ratio -> dropped at 40_language
            "le chateau ancien domine la colline verte et les jardins du "
            "village que nous aimons pour visiter the toujours ensemble",
            ("spam spam spam spam spam " * 12).strip(),      # repetition rules
            GOOD.replace("fox", "owl").replace("dog", "cat")
                .replace("farm", "pier"),  # distinct enough -> survives
        ],
    })


def test_curation_stages_and_counts(spark, corpus_pdf, tmp_path):
    docs = spark.createDataFrame(corpus_pdf)
    out = str(tmp_path / "curate")
    res = run_curation_pipeline(
        spark, docs, out,
        gopher_kwargs={"min_words": 10, "min_stopword_hits": 1},
        minhash_threshold=0.7,
    )
    ids = sorted(r["doc_id"] for r in res.corpus.select("doc_id").collect())
    assert ids == [1, 7]
    # stage accounting: quality drops 4 & 6; exact drops 2; neardup drops 3;
    # language drops 5
    assert res.stage_counts["10_quality"] == 5
    assert res.stage_counts["20_exact"] == 4
    assert res.stage_counts["30_neardup"] == 3
    assert res.stage_counts["40_language"] == 2
    assert res.resumed_stages == []


def test_curation_resume(spark, corpus_pdf, tmp_path):
    docs = spark.createDataFrame(corpus_pdf)
    out = str(tmp_path / "curate_resume")
    first = run_curation_pipeline(
        spark, docs, out,
        gopher_kwargs={"min_words": 10, "min_stopword_hits": 1},
        minhash_threshold=0.7,
    )
    first_ids = sorted(r["doc_id"] for r in first.corpus.collect())
    second = run_curation_pipeline(
        spark, docs, out,
        gopher_kwargs={"min_words": 10, "min_stopword_hits": 1},
        minhash_threshold=0.7,
    )
    assert second.resumed_stages == [
        "10_quality", "20_exact", "30_neardup", "40_language"]
    assert sorted(r["doc_id"] for r in second.corpus.collect()) == first_ids


def test_curation_line_filter_path(spark, tmp_path):
    text = "\n".join([
        "This line has plenty of words and ends with punctuation.",
        "short.",
        "Another good line with the required number of words here.",
    ])
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [text]}))
    res = run_curation_pipeline(
        spark, docs, str(tmp_path / "c4"),
        gopher_kwargs={"min_words": 5, "min_stopword_hits": 1},
        line_filter=True,
    )
    row = res.corpus.collect()[0]
    assert "short." not in row["text"]
    assert row["text"].count("\n") == 1
