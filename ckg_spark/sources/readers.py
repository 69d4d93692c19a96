"""Source readers (SURVEY.md §2.1 S1-S8), Spark-first.

The reference hand-rolls per-format readers (extension-dispatched pandas
reads, gzip line scans, chunked CSV, OBO via obonet) in
ckg/graphdb_builder/builder_utils.py:31-72,808-817 and
databases/parsers/goaParser.py:29-50. Here:

- S1/S2/S3 collapse into ``read_dataset``: spark.read with format dispatch;
  gzip and chunking are native (Spark decompresses .gz, partitioning
  replaces chunksize).
- S5 ``parse_obo``: driver-side OBO parse (vocabularies are broadcast-scale
  by definition) -> terms/aliases/parent DataFrames matching vocab.py
  schemas. No obonet dependency — a ~60-line stanza parser.
- S8 ``discover_files``: glob + input_file_name() provenance column.
"""

from __future__ import annotations

import glob as _glob
import gzip
import os
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def read_dataset(spark: SparkSession, uri: str, fmt: str | None = None,
                 sep: str = "\t", header: bool = True) -> DataFrame:
    """Extension-dispatched reader (builder_utils.py:31-72 analog).

    parquet/csv/tsv/json/txt/sdrf natively in Spark; .gz handled natively.
    Excel goes through the off-hot-path pandas shim (``read_excel_dataset``)
    — xlsx is a driver-scale metadata format in the reference, never bulk
    data, so a distributed reader would be scale theater.
    """
    ext = (fmt or uri.rstrip("/").split(".")[-1].replace("gz", "") or "").lower()
    if fmt is None and uri.endswith(".gz"):
        ext = uri.rstrip("/").split(".")[-2].lower()
    if ext in ("parquet", "pq"):
        return spark.read.parquet(uri)
    if ext in ("tsv", "txt", "sdrf"):
        return spark.read.csv(uri, sep="\t", header=header, inferSchema=False)
    if ext == "csv":
        return spark.read.csv(uri, sep=sep if sep != "\t" else ",", header=header,
                              inferSchema=False)
    if ext in ("json", "jsonl", "ndjson"):
        return spark.read.json(uri)
    if ext in ("xlsx", "xls"):
        return read_excel_dataset(spark, uri)
    raise ValueError(f"unsupported dataset format: {uri}")


def read_excel_dataset(spark: SparkSession, uri: str,
                       sheet_name: int | str = 0) -> DataFrame:
    """Excel shim (builder_utils.py readDataFromExcel:65-72 analog):
    pandas.read_excel on the driver -> createDataFrame. Import-gated — the
    engine container ships no xlsx codec; deployments that ingest Excel
    install openpyxl and get the same entry point."""
    try:
        pdf = pd.read_excel(uri, sheet_name=sheet_name, index_col=None,
                            na_values=["NA"])
    except ImportError as ex:  # pragma: no cover - container has no openpyxl
        raise NotImplementedError(
            "read_excel_dataset requires an Excel engine (openpyxl); not "
            "installed in this container — convert to tsv/parquet upstream "
            "or install the codec"
        ) from ex
    pdf = pdf.dropna(how="all")
    pdf.columns = [str(c) for c in pdf.columns]
    return spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None))


def read_gzipped_tsv(spark: SparkSession, uri: str, header: bool = True) -> DataFrame:
    """S2: Spark reads .gz transparently; one task per file (gzip is not
    splittable — at scale, prefer many shards or recompress to zstd/bgzf)."""
    return spark.read.csv(uri, sep="\t", header=header)


_OBO_STANZA = re.compile(r"^\[(?P<kind>[^\]]+)\]\s*$")
_OBO_KV = re.compile(r"^(?P<key>[A-Za-z_]+):\s*(?P<val>.*)$")
_OBO_SYN = re.compile(r'^"(?P<syn>[^"]*)"')


def parse_obo(path: str) -> dict[str, pd.DataFrame]:
    """S5: minimal OBO parser (driver-side; ontology files are MBs).

    Returns {'terms': (id,label,name,description,type,synonyms),
             'aliases': (ident,source,alias,alias_lc,rank,entity_type),
             'parent_rels': (start_id,end_id,type)}
    mirroring buildMappingFromOBO (mapping.py:208-244) + oboParser.py:6-50.
    """
    opener = gzip.open if path.endswith(".gz") else open
    terms, aliases, parents = [], [], []
    cur: dict | None = None

    def flush(c):
        if not c or "id" not in c or c.get("is_obsolete") == "true":
            return
        tid, name = c["id"], c.get("name", "")
        ns = c.get("namespace", "term")
        syns = c.get("synonyms", [])
        terms.append((tid, ns.title(), name, c.get("def", ""), ns, syns))
        if name:
            aliases.append((tid, "NAME", name, name.lower(), 1, ns.title()))
        for s in syns:
            aliases.append((tid, "SYN", s, s.lower(), 3, ns.title()))
        for p in c.get("is_a", []):
            parents.append((tid, p, "HAS_PARENT"))

    with opener(path, "rt") as fh:
        in_term = False
        for line in fh:
            line = line.strip()
            m = _OBO_STANZA.match(line)
            if m:
                flush(cur if in_term else None)
                in_term = m.group("kind") == "Term"
                cur = {"synonyms": [], "is_a": []} if in_term else None
                continue
            if not in_term or not line or cur is None:
                continue
            kv = _OBO_KV.match(line)
            if not kv:
                continue
            k, v = kv.group("key"), kv.group("val")
            if k == "synonym":
                s = _OBO_SYN.match(v)
                if s:
                    cur["synonyms"].append(s.group("syn"))
            elif k == "is_a":
                cur["is_a"].append(v.split("!")[0].strip())
            elif k in ("id", "name", "namespace", "def", "is_obsolete"):
                cur.setdefault(k, v.split("!")[0].strip() if k == "id" else v)
        flush(cur if in_term else None)

    return {
        "terms": pd.DataFrame(terms, columns=["id", "label", "name", "description",
                                              "type", "synonyms"]),
        "aliases": pd.DataFrame(aliases, columns=["ident", "source", "alias",
                                                  "alias_lc", "rank", "entity_type"]),
        "parent_rels": pd.DataFrame(parents, columns=["start_id", "end_id", "type"]),
    }


def discover_files(spark: SparkSession, root: str, pattern: str = "*.parquet") -> list[str]:
    """S8: directory/project discovery."""
    return sorted(_glob.glob(os.path.join(root, "**", pattern), recursive=True))


def with_provenance(df: DataFrame) -> DataFrame:
    """Attach the source file path (per-project partition predicate analog)."""
    return df.withColumn("_source_file", F.input_file_name())


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """S4: FASTA scan — '>'-delimited records via the Hadoop text-input
    record delimiter (builder_utils.py:820-863 analog; replaces BioPython
    SeqIO + 1000-record batch_iterator with Spark partitioning)."""
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf={"textinputformat.record.delimiter": "\n>"},
    ).map(lambda kv: kv[1])
    recs = spark.createDataFrame(rdd.map(lambda s: (s,)), "rec string")
    cleaned = recs.select(
        F.regexp_replace("rec", r"^>", "").alias("rec")
    ).where(F.trim("rec") != "")
    return cleaned.select(
        F.regexp_extract("rec", r"^(\S+)", 1).alias("seq_id"),
        F.regexp_extract("rec", r"^[^\n]*\n", 0).alias("_hdr"),
        F.regexp_replace(
            F.regexp_replace("rec", r"^[^\n]*\n", ""), r"\s+", ""
        ).alias("sequence"),
        F.trim(F.regexp_replace(F.regexp_extract("rec", r"^([^\n]*)", 1),
                                r"^(\S+)\s*", "")).alias("description"),
    ).drop("_hdr")


def read_xml_records(spark: SparkSession, path: str, record_tag: str) -> DataFrame:
    """S6: XML stream scan (drugBankParser.py:24-71 / hmdbParser.py:27-66
    analog). Files are split into <record_tag> stanzas with the record
    delimiter trick, then parsed per-record with stdlib ElementTree inside
    an Arrow-batched mapInPandas — streaming, no whole-document DOM.

    Returns (tag, fields map<string,string>) with one row per record and
    the record's direct children flattened into the map.
    """
    import pandas as pd

    open_tag, close_tag = f"<{record_tag}", f"</{record_tag}>"
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf={"textinputformat.record.delimiter": close_tag},
    ).map(lambda kv: kv[1])
    chunks = spark.createDataFrame(rdd.map(lambda s: (s,)), "chunk string")

    def parse(batches):
        import re as _re
        import xml.etree.ElementTree as ET

        # the record tag must be followed by whitespace or '>' so that e.g.
        # <drugbank> does not match as a prefix of <drug
        open_re = _re.compile(_re.escape(open_tag) + r"(?=[\s>/])")

        for pdf in batches:
            rows = []
            for chunk in pdf["chunk"]:
                m = open_re.search(chunk)
                if m is None:
                    continue
                start = m.start()
                frag = chunk[start:] + close_tag
                try:
                    el = ET.fromstring(frag)
                except ET.ParseError:
                    continue
                fields = {}
                for child in el:
                    tag = child.tag.split("}")[-1]
                    if child.text and child.text.strip():
                        fields.setdefault(tag, child.text.strip())
                rows.append((record_tag, fields))
            yield pd.DataFrame(rows, columns=["tag", "fields"])

    return chunks.mapInPandas(parse, schema="tag string, fields map<string,string>")
