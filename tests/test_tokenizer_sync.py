"""Incremental BPE (plans/tokenizer.py): word table synced per delta,
incremental merges == batch learn_bpe over the full corpus."""

from pyspark.sql import functions as F

from ckg_spark.operators.bpe import learn_bpe
from ckg_spark.plans import table as T
from ckg_spark.plans import tokenizer as TK


def _docs(lo, hi, phrase):
    return [(i, f"{phrase} item{i % 7} common words appear here")
            for i in range(lo, hi)]


def test_incremental_bpe_equals_batch(spark, tmp_path):
    ddir, wdir = str(tmp_path / "docs"), str(tmp_path / "wf")
    chunks = [_docs(0, 60, "alpha beta gamma"),
              _docs(60, 120, "beta gamma delta"),
              _docs(120, 180, "gamma delta epsilon")]
    merges = None
    for ch in chunks:
        T.append(spark.createDataFrame(ch, "doc_id long, text string"), ddir)
        rep, merges = TK.sync_bpe(spark, ddir, wdir, n_merges=60,
                                  min_pair_freq=2)
        assert rep.wf_version is not None and rep.n_docs == 60
    # idle tick: word table untouched, merges stable
    rep2, merges2 = TK.sync_bpe(spark, ddir, wdir, n_merges=60,
                                min_pair_freq=2)
    assert rep2.wf_version is None and merges2 == merges

    batch = learn_bpe(T.read(spark, ddir), n_merges=60, min_pair_freq=2)
    assert merges == batch and len(batch) > 10

    # word table is exact vs a direct recount
    from ckg_spark.operators.bpe import word_frequencies
    inc = {(r["word"], r["freq"]) for r in
           TK.read_word_frequencies(spark, wdir).collect()}
    full = {(r["word"], r["freq"]) for r in
            word_frequencies(T.read(spark, ddir)).collect()}
    assert inc == full

    # compaction folds partials, preserves the mark, keeps reads exact
    TK.compact_word_frequencies(spark, wdir)
    assert TK.last_synced_version(wdir) == 3
    assert {(r["word"], r["freq"]) for r in
            TK.read_word_frequencies(spark, wdir).collect()} == full
    assert T.read(spark, wdir).count() == len(full)
