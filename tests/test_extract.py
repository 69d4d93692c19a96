"""Extraction operator: JVM path vs Arrow path vs pandas oracle."""

import pandas as pd

from ckg_spark.operators import extract as X
from ckg_spark.oracle_ref import oracle_extract

KEY = ["conv_id", "turn_idx", "pos", "n_words", "alias_lc"]


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf[KEY].sort_values(KEY).reset_index(drop=True)


def test_jvm_extract_matches_oracle(spark, vocab, vocab_tables, transcripts_df,
                                    transcripts_pdf):
    grams = X.prepare_alias_grams(vocab_tables["aliases"])
    got = X.extract_mentions(transcripts_df, grams).toPandas()
    exp = oracle_extract(transcripts_pdf, vocab)
    assert len(exp) > 100, "fixture should embed plenty of mentions"
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)


def test_arrow_extract_matches_jvm(spark, vocab_tables, transcripts_df):
    grams = X.prepare_alias_grams(vocab_tables["aliases"])
    jvm = _sorted(X.extract_mentions(transcripts_df, grams).toPandas())
    arrow = _sorted(X.extract_mentions_arrow(transcripts_df, grams).toPandas())
    pd.testing.assert_frame_equal(jvm, arrow, check_dtype=False)


def test_longest_match_resolution(spark, vocab, vocab_tables, transcripts_df,
                                  transcripts_pdf):
    grams = X.prepare_alias_grams(vocab_tables["aliases"])
    m = X.extract_mentions(transcripts_df, grams)
    got = X.resolve_longest_match(m).toPandas()
    exp = oracle_extract(transcripts_pdf, vocab, longest_match=True)
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)


def test_case_and_punctuation_insensitive(spark, vocab_tables):
    grams = X.prepare_alias_grams(vocab_tables["aliases"])
    some = grams.limit(1).collect()[0]["gram"]
    df = spark.createDataFrame(
        [("c1", 0, f"We saw {some.upper()}, yesterday."),
         ("c1", 1, f"no mention here"),
         ("c1", 2, f"({some.title()})")],
        "conv_id string, turn_idx int, text string",
    )
    got = X.extract_mentions(df, grams).toPandas()
    assert set(got["turn_idx"]) == {0, 2}
    # the chosen alias matches in both turns (sub-aliases may also match in
    # match_all mode — that is the intended 1:N behavior)
    assert set(got.loc[got["alias_lc"] == some, "turn_idx"]) == {0, 2}


def test_single_scan_matches_union(spark, vocab_tables, transcripts_df):
    grams = X.prepare_alias_grams(vocab_tables["aliases"])
    union = _sorted(X.extract_mentions(transcripts_df, grams).toPandas())
    single = _sorted(
        X.extract_mentions(transcripts_df, grams, single_scan=True).toPandas()
    )
    pd.testing.assert_frame_equal(union, single, check_dtype=False)


def test_strategies_all_agree(spark, vocab_tables, transcripts_df):
    grams = X.prepare_alias_grams(vocab_tables["aliases"])
    lead = _sorted(X.extract_mentions(transcripts_df, grams, strategy="lead").toPandas())
    union = _sorted(X.extract_mentions(transcripts_df, grams, strategy="union").toPandas())
    single = _sorted(X.extract_mentions(transcripts_df, grams, single_scan=True).toPandas())
    sliced = _sorted(X.extract_mentions(transcripts_df, grams, strategy="slice").toPandas())
    hashed = _sorted(X.extract_mentions(transcripts_df, grams, strategy="hash").toPandas())
    fused = _sorted(X.extract_mentions(transcripts_df, grams, strategy="fused").toPandas())
    pd.testing.assert_frame_equal(lead, union, check_dtype=False)
    pd.testing.assert_frame_equal(lead, single, check_dtype=False)
    pd.testing.assert_frame_equal(lead, sliced, check_dtype=False)
    pd.testing.assert_frame_equal(lead, hashed, check_dtype=False)
    pd.testing.assert_frame_equal(lead, fused, check_dtype=False)
