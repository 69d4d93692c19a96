"""Incremental decontamination index (plans/decontam.py): probe ==
batch contamination_report; second benchmark costs no sync work."""

from pyspark.sql import functions as F

from ckg_spark.operators import dedup as D
from ckg_spark.plans import decontam as DX
from ckg_spark.plans import table as T


def _doc(i, leak=None):
    toks = [f"w{i}_{j}" for j in range(30)]
    if leak:
        toks[5:5 + len(leak)] = leak
    return (i, " ".join(toks))


LEAK = [f"q{j}" for j in range(15)]  # 15 shared tokens -> k=13 overlap


def _report_set(df):
    return {(r["doc_id"], r["n_contaminated"], r["n_shingles"],
             round(r["frac_contaminated"], 6)) for r in df.collect()}


def test_probe_equals_batch_and_handles_new_benchmark(spark, tmp_path):
    ddir, idx = str(tmp_path / "docs"), str(tmp_path / "idx")
    # delta 1 holds a leaked doc; delta 2 holds another + clean docs
    T.append(spark.createDataFrame(
        [_doc(i) for i in range(10)] + [_doc(50, LEAK)],
        "doc_id long, text string"), ddir)
    r1 = DX.sync_decontam_index(spark, ddir, idx)
    assert r1.n_docs == 11 and r1.index_version == 1
    T.append(spark.createDataFrame(
        [_doc(i) for i in range(10, 20)] + [_doc(51, LEAK)],
        "doc_id long, text string"), ddir)
    DX.sync_decontam_index(spark, ddir, idx)
    # idle: no-op
    assert DX.sync_decontam_index(spark, ddir, idx).index_version is None

    bench = spark.createDataFrame(
        [(900, " ".join(LEAK) + " tail0 tail1")], "doc_id long, text string")
    got = DX.probe_benchmark(spark, idx, bench)
    want = D.contamination_report(T.read(spark, ddir), bench)
    assert _report_set(got) == _report_set(want)
    assert {r["doc_id"] for r in got.where("n_contaminated > 0").collect()} \
        == {50, 51}

    # a SECOND benchmark probes the same index — zero sync work, and the
    # clean benchmark flags nothing
    bench2 = spark.createDataFrame(
        [(901, " ".join(f"z{j}" for j in range(20)))],
        "doc_id long, text string")
    got2 = DX.probe_benchmark(spark, idx, bench2)
    assert got2.where("n_contaminated > 0").count() == 0
    assert _report_set(got2) == _report_set(
        D.contamination_report(T.read(spark, ddir), bench2))
