"""PubMed abstract retrieval — the reference's `get_publications_abstracts`
(ckg/analytics_core/analytics/analytics.py:2844) + `getMedlineAbstracts`
(analytics_core/utils.py:266), previously the one declared-out analysis
type. The reference Entrez-fetches MEDLINE records for the distinct PubMed
ids in a publications column, keeps fields TI/AU/JT/DP/MH/AB/PMID, builds
a pubmed URL per record, and joins the result back onto the input's
(publication, Proteins, Diseases) columns.

Spark-first shape: the fetch distributes — distinct ids are computed with
a DataFrame distinct (shuffle on the id column only), then each partition
fetches its ids in NCBI-sized batches inside `mapInPandas` (so a 100 TB
corpus citing millions of PMIDs fans the HTTP work across executors
instead of serializing it on the driver), and the dictionary-scale
abstract table broadcast-joins back onto the corpus. The MEDLINE text
parser is a real, tested pure function; the HTTP transport is injectable
(`fetch=`) — the default urllib transport targets NCBI eutils and is the
only part this sandbox cannot exercise (tests inject a canned-MEDLINE
transport, mirroring how the multimodal compressed-format decode is
stubbed while the plumbing stays real)."""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

PUBMED_URL = "https://www.ncbi.nlm.nih.gov/pubmed/"
EUTILS_URL = ("https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi"
              "?db=pubmed&rettype=medline&retmode=text&id=")

# MEDLINE tag -> output column (reference utils.py:267 `fields`)
_FIELDS = {"TI": "title", "AU": "authors", "JT": "journal", "DP": "date",
           "MH": "keywords", "AB": "abstract", "PMID": "PMID"}
_LIST_TAGS = {"AU", "MH"}  # repeatable tags accumulate into lists

ABSTRACT_SCHEMA = ("PMID string, title string, authors array<string>, "
                   "journal string, date string, keywords array<string>, "
                   "abstract string, url string")


def parse_medline(text: str) -> list[dict]:
    """Parse MEDLINE flat-file text (the `rettype=medline` wire format:
    `TAG - value` lines, continuations indented six spaces, records
    separated by blank lines) into one dict per record with the
    reference's field mapping. Pure function; the real parser the
    reference delegates to Bio.Medline for."""
    records: list[dict] = []
    cur: dict = {}
    tag = None

    def flush():
        nonlocal cur, tag
        if cur.get("PMID"):
            cur["url"] = PUBMED_URL + cur["PMID"]
            records.append(cur)
        cur, tag = {}, None

    for raw in text.splitlines():
        if not raw.strip():
            flush()
            continue
        if raw.startswith("      ") and tag is not None:
            # continuation of the previous tag's value
            if tag in _LIST_TAGS:
                if cur.get(_FIELDS[tag]):
                    cur[_FIELDS[tag]][-1] += " " + raw.strip()
            else:
                cur[_FIELDS[tag]] = cur.get(_FIELDS[tag], "") + " " + raw.strip()
            continue
        if len(raw) >= 6 and raw[4:6] == "- ":
            t = raw[:4].strip()
            val = raw[6:].strip()
            if t in _FIELDS:
                tag = t
                if t in _LIST_TAGS:
                    cur.setdefault(_FIELDS[t], []).append(val)
                else:
                    cur[_FIELDS[t]] = val
            else:
                tag = None
    flush()
    return records


def _urllib_fetch(ids: list[str]) -> str:
    """Default transport: NCBI eutils efetch over HTTPS (the reference's
    Entrez.efetch equivalent). Not reachable from this offline sandbox —
    inject `fetch=` to test; kept real for deployments with egress."""
    from urllib.request import urlopen

    with urlopen(EUTILS_URL + ",".join(ids), timeout=60) as resp:
        return resp.read().decode("utf-8", errors="replace")


def fetch_abstracts(ids_df: DataFrame, fetch: Callable[[list[str]], str] | None = None,
                    batch_size: int = 200) -> DataFrame:
    """Distributed getMedlineAbstracts: one column of PubMed ids in,
    (PMID, title, authors, journal, date, keywords, abstract, url) out.
    Each partition fetches its ids in `batch_size` chunks (NCBI caps
    efetch id lists), so the HTTP fan-out scales with executors."""
    transport = fetch or _urllib_fetch
    col = ids_df.columns[0]
    distinct = ids_df.select(F.col(col).cast("string").alias("pmid")).distinct()

    def per_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ids = [i for i in pdf["pmid"].tolist() if i]
            for lo in range(0, len(ids), batch_size):
                try:
                    text = transport(ids[lo:lo + batch_size])
                except Exception as e:  # reference utils.py:287-292 parity:
                    # failed Entrez requests yield an empty frame, loudly
                    import sys
                    print(f"pubmed fetch failed: {e}", file=sys.stderr)
                    continue
                recs = parse_medline(text)
                if not recs:
                    continue
                out = pd.DataFrame(recs)
                cols = ["PMID", "title", "authors", "journal", "date",
                        "keywords", "abstract", "url"]
                for c in cols:
                    if c not in out.columns:
                        out[c] = None
                # records lacking a repeatable tag surface as NaN floats;
                # Arrow needs None (or a list) in array<string> columns
                for c in ("authors", "keywords"):
                    out[c] = out[c].apply(
                        lambda v: v if isinstance(v, list) else None)
                for c in ("PMID", "title", "journal", "date", "abstract",
                          "url"):
                    out[c] = out[c].where(out[c].notna(), None)
                yield out[cols]

    return distinct.mapInPandas(per_partition, schema=ABSTRACT_SCHEMA)


def publications_abstracts(df: DataFrame, publication_col: str = "publication",
                           join_by: list[str] | None = None,
                           fetch: Callable[[list[str]], str] | None = None,
                           batch_size: int = 200) -> DataFrame:
    """Reference get_publications_abstracts analog (analytics.py:2844):
    fetch abstracts for the distinct ids in `publication_col`, then join
    the (dictionary-scale, broadcast) abstract table back onto the
    requested input columns. Output columns: PMID, title, authors,
    journal, date, keywords, abstract, url + (join_by minus the
    publication column)."""
    join_by = join_by or [publication_col, "Proteins", "Diseases"]
    keep = [c for c in join_by if c in df.columns]
    abstracts = fetch_abstracts(
        df.select(publication_col), fetch=fetch, batch_size=batch_size)
    side = df.select(*keep).withColumn(
        "_pmid", F.col(publication_col).cast("string"))
    out = side.join(F.broadcast(abstracts),
                    side["_pmid"] == abstracts["PMID"], "inner")
    extra = [c for c in keep if c != publication_col]
    return out.select("PMID", "title", "authors", "journal", "date",
                      "keywords", "abstract", "url", *extra)
