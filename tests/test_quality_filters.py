"""Gopher / C4 corpus quality filters (textstats round-3 additions)."""

import pandas as pd
from pyspark.sql import functions as F

from ckg_spark.operators.textstats import c4_line_filter, gopher_quality_flags


def test_gopher_flags_rules(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            # passes everything (with relaxed thresholds below)
            "the quick brown fox jumps over the lazy dog and that is all of it",
            # too short
            "tiny doc",
            # symbol flood (hashes)
            "the doc with ### many #### hashes ## of spam # and that # to be",
            # bullet lines dominate
            "- the first bullet\n- and another bullet\n- that is all of them",
            # non-alphabetic words dominate
            "111 222 333 444 555 666 777 888 999 000 123 456 789 012 345",
        ],
    }))
    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            docs, min_words=10, min_stopword_hits=2,
            max_bullet_line_frac=0.5).collect()
    }
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False and out[1]["n_words"] == 2
    assert out[2]["keep"] is False and out[2]["symbol_word_ratio"] > 0.1
    assert out[3]["bullet_line_frac"] == 1.0 and out[3]["keep"] is False
    assert out[4]["alpha_word_frac"] == 0.0 and out[4]["keep"] is False


def test_gopher_ellipsis_and_mean_word_len(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1],
        "text": [
            "a trailing line...\nanother trailing one…\nplain line here",
            "extraordinarily hippopotamus internationalization",  # long words
        ],
    }))
    out = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert abs(out[0]["ellipsis_line_frac"] - 2 / 3) < 1e-9
    assert out[1]["mean_word_len"] > 10 and out[1]["keep"] is False


def test_c4_line_filter(spark):
    text = "\n".join([
        "This line has enough words and ends well.",   # kept
        "Too short.",                                   # < 5 words
        "This line has enough words but no terminal punctuation",  # no punct
        "Enable javascript to view this page properly.",  # blocklist
        "Another perfectly fine sentence with many words in it!",  # kept
        "A curly { brace means template junk appears here.",  # blocklist
    ])
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [7], "text": [text]}))
    row = c4_line_filter(docs).collect()[0]
    assert row["n_lines_total"] == 6
    assert row["n_lines_kept"] == 2
    assert row["clean_text"].splitlines() == [
        "This line has enough words and ends well.",
        "Another perfectly fine sentence with many words in it!",
    ]


def test_c4_null_and_empty(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [None, ""]}))
    rows = {r["doc_id"]: r for r in c4_line_filter(docs).collect()}
    assert rows[1]["n_lines_kept"] == 0 and rows[1]["clean_text"] == ""
    assert rows[2]["n_lines_kept"] == 0


def test_gopher_keep_pushdown_is_jvm_only(spark):
    """The whole filter chain stays in codegen: no BatchEvalPython /
    ArrowEvalPython nodes in the plan (UDF-discipline regression guard)."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["some text here"]}))
    plan = (
        gopher_quality_flags(docs).where(F.col("keep"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_repetition_flags_hand_computed(spark):
    from ckg_spark.operators.dedup import repetition_flags

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "dup line\ndup line\nunique",          # duplicate line
            "a b a b a b",                          # dominant 2-gram
            "one two three four five one two three four five six",  # dup 5-gram
        ],
    }))
    out = {r["doc_id"]: r for r in repetition_flags(docs).collect()}
    assert abs(out[0]["dup_line_frac"] - 1 / 3) < 1e-9
    assert abs(out[0]["dup_line_char_frac"] - 8 / 22) < 1e-9
    # "a b" occurs 3x, 2 non-space chars each; doc has 6 non-space chars
    assert abs(out[1]["top2gram_char_frac"] - 1.0) < 1e-9
    assert out[1]["keep"] is False
    # "one two three four five" (19 chars sans spaces) occurs twice; doc has
    # 19*2 + 3 = 41 non-space chars -> 38/41
    assert abs(out[2]["dup5gram_char_frac"] - 38 / 41) < 1e-9
    assert out[2]["keep"] is False
    assert out[0]["keep"] is False  # dup_line_char_frac 0.364 > 0.2


def test_repetition_flags_clean_doc_keeps(spark):
    from ckg_spark.operators.dedup import repetition_flags

    # 60 distinct words: the most frequent 2-gram occurs once, so its char
    # mass is a small fraction (the rule only fires on dominated docs)
    text = " ".join(f"word{i:02d}" for i in range(60))
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [9], "text": [text]}))
    row = repetition_flags(docs).collect()[0]
    assert row["keep"] is True
    assert row["dup_line_frac"] == 0.0 and row["dup5gram_char_frac"] == 0.0
    assert row["top2gram_char_frac"] < 0.05


def test_unigram_logprob_score(spark):
    """Rare-token docs score strictly higher than common-token docs; values
    match a hand-computed add-one unigram model."""
    import math

    from ckg_spark.operators.textstats import unigram_logprob_score

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the the the cat", "the cat sat", "zyx wvu tsr"],
    }))
    out = {r["doc_id"]: r for r in unigram_logprob_score(docs).collect()}
    # corpus: the*4, cat*2, sat, zyx, wvu, tsr -> N=10, V=6, denom=17
    denom = 17.0
    p = {"the": 5 / denom, "cat": 3 / denom, "sat": 2 / denom,
         "zyx": 2 / denom, "wvu": 2 / denom, "tsr": 2 / denom}
    exp1 = -(3 * math.log(p["the"]) + math.log(p["cat"])) / 4
    assert abs(out[1]["mean_neg_logp"] - exp1) < 1e-9
    assert out[3]["mean_neg_logp"] > out[1]["mean_neg_logp"]
    # vocab cut: limit to 1 token -> everything but 'the' is OOV
    cut = {r["doc_id"]: r for r in
           unigram_logprob_score(docs, vocab_size=1).collect()}
    denom_cut = 10 + 1 + 1
    exp1_cut = -(3 * math.log(5 / denom_cut) + math.log(1 / denom_cut)) / 4
    assert abs(cut[1]["mean_neg_logp"] - exp1_cut) < 1e-9


def test_persisted_unigram_model_matches_inline(spark, tmp_path):
    from ckg_spark.operators.textstats import (build_unigram_model,
                                               unigram_logprob_score,
                                               unigram_score_with_model)

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the the the cat", "the cat sat", "zyx wvu tsr"],
    }))
    model = str(tmp_path / "unigram")
    build_unigram_model(docs, model)
    inline = unigram_logprob_score(docs).toPandas().set_index("doc_id")
    persisted = unigram_score_with_model(docs, model).toPandas().set_index("doc_id")
    for d in (1, 2, 3):
        assert abs(inline.loc[d, "mean_neg_logp"]
                   - persisted.loc[d, "mean_neg_logp"]) < 1e-12
    # scoring a NEW doc with OOV tokens works against the frozen model
    new = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "text": ["the unseen token here"]}))
    row = unigram_score_with_model(new, model).collect()[0]
    assert row["n_tokens"] == 4 and row["mean_neg_logp"] > 0
