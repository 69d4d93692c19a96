"""Vocabulary / alias / stop-list table construction (SURVEY.md M1/M2/M3).

Mirrors the reference's alias machinery:
- ``vocab_terms``  ~ ontology node TSVs, header [ID, :LABEL, name, description,
  type, synonyms] (reference: ckg/graphdb_builder/ontologies/
  ontologies_controller.py:143).
- ``vocab_aliases`` ~ mapping.tsv rows (identifier, source, alias) written by
  ckg/graphdb_builder/mapping.py:208-244 and probed lowercased at
  mapping.py:69; ``rank`` carries the REFLECT names-file priority flag
  (ontologies/parsers/reflectParser.py:30-40: 1 preferred, 2 excluded,
  3 synonym).
- ``stoplist`` ~ db_mentions_filters root-term blacklist
  (databases/config/jensenlabConfig.yml; filtered at
  textminingParser.py:114-115).
- ``parent_rels`` ~ *_has_parent.tsv [START_ID, END_ID, TYPE]
  (ontologies_controller.py:154-162).

Everything is generated deterministically from a seed — no wall clock, no
hash randomization (pure ``random.Random``).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import pandas as pd

_ADJ = [
    "acute", "chronic", "benign", "malignant", "focal", "diffuse", "primary",
    "secondary", "latent", "severe", "mild", "partial", "complete", "atypical",
    "classic", "juvenile", "adult", "familial", "sporadic", "refractory",
    "recurrent", "systemic", "localized", "progressive", "stable", "transient",
    "congenital", "acquired", "idiopathic", "reactive", "nodular", "cystic",
]
_NOUN = [
    "carcinoma", "syndrome", "fibrosis", "anemia", "melanoma", "lymphoma",
    "neuropathy", "dermatitis", "nephritis", "hepatitis", "arthritis",
    "gastritis", "myopathy", "sclerosis", "stenosis", "dystrophy", "atrophy",
    "embolism", "thrombosis", "ischemia", "necrosis", "edema", "lesion",
    "carcinoid", "sarcoma", "glioma", "adenoma", "cirrhosis", "psoriasis",
    "colitis", "keratosis", "angiopathy",
]
_QUAL = ["type", "grade", "stage", "class", "form", "variant"]

ENTITY_TYPES = ["Disease", "Tissue", "Pathway", "Tool", "Topic"]


@dataclass
class Vocab:
    """In-memory vocabulary bundle (pandas; all frames broadcast-scale)."""

    terms: pd.DataFrame        # id, label, name, description, type, synonyms
    aliases: pd.DataFrame      # ident, source, alias, alias_lc, rank, entity_type
    stoplist: pd.DataFrame     # entity_type, ident
    parent_rels: pd.DataFrame  # start_id, end_id, type
    # ground-truth canonical map over cross-namespace identity links
    canonical: dict[str, str] = field(default_factory=dict)
    identity_edges: pd.DataFrame | None = None  # ident_a, ident_b (MAPS_TO)


def _make_name(rng: random.Random, used: set[str]) -> str:
    for _ in range(100):
        r = rng.random()
        if r < 0.45:
            name = f"{rng.choice(_ADJ)} {rng.choice(_NOUN)}"
        elif r < 0.70:
            name = rng.choice(_NOUN)
        elif r < 0.90:
            name = f"{rng.choice(_ADJ)} {rng.choice(_NOUN)} {rng.choice(_QUAL)} {rng.randint(1, 9)}"
        else:
            name = f"{rng.choice(_NOUN)} {rng.choice(_QUAL)} {rng.randint(1, 9)}"
        if name not in used:
            used.add(name)
            return name
    # fall back to a guaranteed-unique synthetic token
    name = f"entity{len(used)}x"
    used.add(name)
    return name


def build_vocab(n_entities: int = 200, seed: int = 7, ambiguous_frac: float = 0.05,
                xref_frac: float = 0.25, stop_frac: float = 0.03) -> Vocab:
    """Deterministic synthetic ontology vocabulary.

    - ``xref_frac`` of entities get a twin id in a second namespace (XFO:)
      linked by an identity (MAPS_TO) edge — canonicalization ground truth
      (reference analog: cross-ontology xrefs, efoParser.py:28-40).
    - ``ambiguous_frac`` of synonym aliases are shared by two idents (the 1:N
      fan-out of textminingParser.py:100-112).
    - ``stop_frac`` of entities are root/stop terms (DOID:4-style).
    """
    rng = random.Random(seed)
    used_names: set[str] = set()

    term_rows, alias_rows, stop_rows, parent_rows, ident_edges = [], [], [], [], []
    all_idents: list[str] = []

    for i in range(n_entities):
        ident = f"DOID:{i:05d}"
        etype = ENTITY_TYPES[i % len(ENTITY_TYPES)]
        name = _make_name(rng, used_names)
        syns = [_make_name(rng, used_names) for _ in range(rng.randint(0, 3))]
        term_rows.append((ident, etype, name, f"synthetic {etype.lower()} {i}",
                          str(-20 - (i % 7)), syns))
        all_idents.append(ident)
        alias_rows.append((ident, "NAME", name, 1, etype))
        for s in syns:
            alias_rows.append((ident, "SYN", s, 3, etype))

        # chain to a parent (simple forest: parent index < i)
        if i > 0 and rng.random() < 0.6:
            parent_rows.append((ident, f"DOID:{rng.randint(0, i - 1):05d}", "HAS_PARENT"))

        # cross-namespace twin (identity edge for canonicalization)
        if rng.random() < xref_frac:
            twin = f"XFO:{i:05d}"
            alias_rows.append((twin, "NAME", name, 1, etype))
            # twin may add an extra surface form of its own
            if rng.random() < 0.5:
                extra = _make_name(rng, used_names)
                alias_rows.append((twin, "SYN", extra, 3, etype))
            ident_edges.append((ident, twin))
            all_idents.append(twin)

        # stop-listed root term
        if rng.random() < stop_frac:
            stop_rows.append((etype, ident))

    # ambiguous aliases shared by 2 idents of the same type
    n_amb = int(len(alias_rows) * ambiguous_frac)
    for _ in range(n_amb):
        a = rng.choice(alias_rows)
        others = [t for t in term_rows if t[1] == a[4] and t[0] != a[0]]
        if others:
            o = rng.choice(others)
            alias_rows.append((o[0], "SYN", a[2], 3, a[4]))

    # a few rank-2 (excluded) aliases — generic words that must never link
    for w in ["normal", "sample", "result", "control"]:
        t = rng.choice(term_rows)
        alias_rows.append((t[0], "SYN", w, 2, t[1]))

    terms = pd.DataFrame(term_rows, columns=["id", "label", "name", "description",
                                             "type", "synonyms"])
    aliases = pd.DataFrame(alias_rows, columns=["ident", "source", "alias", "rank",
                                                "entity_type"])
    aliases["alias_lc"] = aliases["alias"].str.lower()
    aliases = aliases[["ident", "source", "alias", "alias_lc", "rank", "entity_type"]]
    aliases = aliases.drop_duplicates(["ident", "alias_lc"]).reset_index(drop=True)
    stoplist = pd.DataFrame(stop_rows, columns=["entity_type", "ident"]).drop_duplicates()
    parents = pd.DataFrame(parent_rows, columns=["start_id", "end_id", "type"])
    edges = pd.DataFrame(ident_edges, columns=["ident_a", "ident_b"])

    canonical = _union_find_canonical(all_idents, ident_edges)
    return Vocab(terms, aliases, stoplist, parents, canonical, edges)


def _union_find_canonical(idents: list[str], edges: list[tuple[str, str]]) -> dict[str, str]:
    """Ground-truth connected components; canonical = lexicographic min."""
    parent = {i: i for i in idents}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in idents}


def vocab_to_spark(spark, vocab: Vocab) -> dict:
    """Lift the pandas vocabulary into (broadcast-scale) Spark DataFrames.

    Partition count is derived from row count, not defaultParallelism:
    createDataFrame slices even a thousand-row dictionary into one slice
    per core, so every downstream action (broadcast builds, the CC probe
    collect) schedules a full wave of near-empty tasks. ~50k rows per
    partition keeps tiny vocabularies at one task while a millions-row
    ontology load retains its parallelism (coalesce never increases the
    slice count)."""
    from pyspark.sql import types as T

    def sized(df, n_rows: int):
        return df.coalesce(max(1, -(-int(n_rows) // 50_000)))

    terms_schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("synonyms", T.ArrayType(T.StringType())),
    ])
    out = {
        "terms": sized(spark.createDataFrame(vocab.terms, schema=terms_schema),
                       len(vocab.terms)),
        "aliases": sized(spark.createDataFrame(vocab.aliases),
                         len(vocab.aliases)),
        "stoplist": sized(spark.createDataFrame(vocab.stoplist),
                          len(vocab.stoplist))
        if len(vocab.stoplist)
        else spark.createDataFrame([], "entity_type string, ident string"),
        "parent_rels": sized(spark.createDataFrame(vocab.parent_rels),
                             len(vocab.parent_rels))
        if len(vocab.parent_rels)
        else spark.createDataFrame([], "start_id string, end_id string, type string"),
        "identity_edges": sized(spark.createDataFrame(vocab.identity_edges),
                                len(vocab.identity_edges))
        if vocab.identity_edges is not None and len(vocab.identity_edges)
        else spark.createDataFrame([], "ident_a string, ident_b string"),
    }
    return out
