"""publications_abstracts (sources/pubmed.py): real MEDLINE parsing +
distributed fetch plumbing with an injected transport (the sandbox has no
egress; the reference's Entrez call is the only stubbed piece)."""

import pandas as pd
import pytest

from ckg_spark.sources import pubmed as PM

MEDLINE = """\
PMID- 11111111
TI  - Alpha protein drives inflammation in
      chronic disease models.
AU  - Smith J
AU  - Doe A
JT  - Journal of Testing
DP  - 2020 Jan
MH  - Inflammation
MH  - Proteins/metabolism
AB  - We show that alpha protein drives inflammation. The effect is
      dose dependent and reproducible.
XX  - ignored unknown tag

PMID- 22222222
TI  - Beta kinase review.
JT  - Rev Test
DP  - 2019
AB  - A short review.
"""


def _make_fake_fetch():
    """Canned transport returning only records whose PMID was asked for.
    Built as a closure so cloudpickle ships it by VALUE to executors
    (a test-module-level function pickles by reference and the worker
    can't import test_pubmed)."""
    text = MEDLINE

    def fake_fetch(ids):
        blocks = text.split("\n\n")
        return "\n\n".join(b for b in blocks if any(i in b for i in ids))

    return fake_fetch


_fake_fetch = _make_fake_fetch()


def test_parse_medline_exact_fields():
    recs = PM.parse_medline(MEDLINE)
    assert len(recs) == 2
    r = recs[0]
    assert r["PMID"] == "11111111"
    assert r["title"] == ("Alpha protein drives inflammation in chronic "
                          "disease models.")
    assert r["authors"] == ["Smith J", "Doe A"]
    assert r["journal"] == "Journal of Testing"
    assert r["date"] == "2020 Jan"
    assert r["keywords"] == ["Inflammation", "Proteins/metabolism"]
    assert "dose dependent" in r["abstract"]
    assert r["url"] == PM.PUBMED_URL + "11111111"
    assert recs[1]["PMID"] == "22222222"
    assert "authors" not in recs[1]


def test_parse_medline_degenerate():
    assert PM.parse_medline("") == []
    assert PM.parse_medline("AB  - orphan abstract, no PMID\n") == []


def test_fetch_abstracts_distributed(spark):
    ids = spark.createDataFrame(
        pd.DataFrame({"publication": ["11111111", "22222222",
                                      "11111111", "99999999"]}))
    out = PM.fetch_abstracts(ids, fetch=_fake_fetch).toPandas()
    # distinct ids fetched; unknown id yields no record
    assert sorted(out["PMID"]) == ["11111111", "22222222"]
    row = out.set_index("PMID").loc["11111111"]
    assert list(row["authors"]) == ["Smith J", "Doe A"]
    assert row["url"].endswith("11111111")


def test_publications_abstracts_join_back(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "publication": ["11111111", "22222222", "33333333"],
        "Proteins": ["P1;P2", "P3", "P4"],
        "Diseases": ["D1", "D2", "D3"],
    }))
    out = PM.publications_abstracts(df, fetch=_fake_fetch).toPandas()
    # reference join semantics: only fetched PMIDs survive, annotation
    # columns ride along
    assert sorted(out["PMID"]) == ["11111111", "22222222"]
    assert set(out.columns) == {"PMID", "title", "authors", "journal",
                                "date", "keywords", "abstract", "url",
                                "Proteins", "Diseases"}
    assert out.set_index("PMID").loc["11111111", "Proteins"] == "P1;P2"


def test_transport_failure_yields_empty_loudly(spark):
    def boom(ids):
        raise OSError("no egress")

    ids = spark.createDataFrame(pd.DataFrame({"publication": ["1", "2"]}))
    out = PM.fetch_abstracts(ids, fetch=boom)
    assert out.count() == 0  # reference parity: failed Entrez -> empty df


def test_factory_dispatches_publications_abstracts(spark):
    from ckg_spark.operators import analytics_factory as AF
    df = spark.createDataFrame(pd.DataFrame({
        "publication": ["11111111"], "Proteins": ["P1"], "Diseases": ["D1"]}))
    out = AF.generate_result("publications_abstracts", df, fetch=_fake_fetch)
    assert out.count() == 1
    assert AF._UNSUPPORTED == set()
