"""Property-based tests (hypothesis): the JVM extractor agrees with the
single-process pandas oracle on arbitrary text, and merge_edges upserts."""

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ckg_spark.operators import extract as X
from ckg_spark.oracle_ref import oracle_extract
from ckg_spark.vocab import Vocab

# surface forms exercising boundaries: shared prefixes, multi-word, digits
_ALIASES = ["flu", "flu shot", "bird flu", "type 2", "x", "xx", "a b c"]

# text fragments: alias-adjacent punctuation, case variants, overlaps, unicode
_FRAGMENTS = [
    "flu", "FLU", "Flu.", "(flu)", "flu-shot", "flu shot", "bird flu shot",
    "type", "2", "type 2", "influenza", "xxx", "xx", "x", "a b", "b c",
    "a b c", "", "   ", "über", "naïve", "…", "a,b,c", "1type 2x",
]


def _mini_vocab() -> Vocab:
    aliases = pd.DataFrame(
        [(f"E{i:02d}", "NAME", a, a.lower(), 1, "Entity")
         for i, a in enumerate(_ALIASES)],
        columns=["ident", "source", "alias", "alias_lc", "rank", "entity_type"],
    )
    terms = pd.DataFrame(
        [(f"E{i:02d}", "Entity", a, "", "-20", []) for i, a in enumerate(_ALIASES)],
        columns=["id", "label", "name", "description", "type", "synonyms"],
    )
    empty = pd.DataFrame(columns=["entity_type", "ident"])
    parents = pd.DataFrame(columns=["start_id", "end_id", "type"])
    return Vocab(terms, aliases, empty, parents, {}, pd.DataFrame(
        columns=["ident_a", "ident_b"]))


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_FRAGMENTS), min_size=0, max_size=12).map(" ".join),
        min_size=1, max_size=20,
    )
)
def test_extractor_agrees_with_oracle_on_generated_text(spark, texts):
    vocab = _mini_vocab()
    pdf = pd.DataFrame({
        "conv_id": ["c"] * len(texts),
        "turn_idx": range(len(texts)),
        "text": texts,
    })
    df = spark.createDataFrame(pdf)
    grams = X.prepare_alias_grams(
        spark.createDataFrame(vocab.aliases[["alias_lc"]])
    )
    got = (
        X.extract_mentions(df, grams)
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "pos", "n_words", "alias_lc"])
        .reset_index(drop=True)
    )
    exp = (
        oracle_extract(pdf, vocab)
        .sort_values(["conv_id", "turn_idx", "pos", "n_words", "alias_lc"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "pos", "n_words", "alias_lc"]],
        exp, check_dtype=False,
    )


def test_merge_edges_upsert(spark, tmp_path):
    from ckg_spark.operators.materialize import merge_edges

    p = str(tmp_path / "edges")
    base = spark.createDataFrame(
        [("a", "MENTIONED_IN_TURN", "t1", "tagger", 1.0, "Entity"),
         ("b", "MENTIONED_IN_TURN", "t2", "tagger", 2.0, "Entity")],
        "subj string, pred string, obj string, source string, score double, evidence_type string",
    )
    m1 = merge_edges(spark, p, base)
    assert m1.count() == 2

    update = spark.createDataFrame(
        [("a", "MENTIONED_IN_TURN", "t1", "tagger", 3.0, "Entity"),   # refresh
         ("c", "MENTIONED_IN_TURN", "t3", "tagger", 1.0, "Entity")],  # insert
        base.schema,
    )
    m2 = merge_edges(spark, p, update)
    got = {(r["subj"], r["obj"]): r["score"] for r in m2.collect()}
    assert got == {("a", "t1"): 3.0, ("b", "t2"): 2.0, ("c", "t3"): 1.0}
    # idempotent re-merge
    m3 = merge_edges(spark, p, update)
    assert m3.count() == 3
