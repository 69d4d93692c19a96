"""Single-process reference implementation (the correctness oracle).

Slow-but-obviously-correct pandas/stdlib re-implementation of
extract -> link -> canonicalize -> materialize, mirroring the reference's
dict/set semantics (ckg/graphdb_builder/databases/parsers/
textminingParser.py:96-120 mention emission; mapping.py:117-144 multi-map;
union-find over identity edges for canonical ids). The Spark pipeline's
triple set must match this at P/R >= 0.95 (BASELINE.json metric; exact match
expected on synthetic data).

Kept deliberately independent of the Spark code: separate tokenizer,
separate matcher (per-position dict probe), separate union-find.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd

from .vocab import Vocab

_NORM = re.compile(r"[^a-z0-9]+")


def _norm_tokens(text: str) -> list[str]:
    t = _NORM.sub(" ", text.lower()).strip()
    return t.split(" ") if t else []


def oracle_extract(transcripts: pd.DataFrame, vocab: Vocab,
                   longest_match: bool = False) -> pd.DataFrame:
    """All alias occurrences per turn -> rows (conv_id, turn_idx, pos, n_words, alias_lc)."""
    gram_set: set[str] = set()
    for a in vocab.aliases["alias_lc"]:
        g = _NORM.sub(" ", a.lower()).strip()
        if g:
            gram_set.add(g)
    lens = sorted({len(g.split(" ")) for g in gram_set})

    rows = []
    for conv, ti, text in zip(
        transcripts["conv_id"], transcripts["turn_idx"], transcripts["text"]
    ):
        toks = _norm_tokens(text or "")
        matches = []
        for n in lens:
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                if g in gram_set:
                    matches.append((i, n, g))
        if longest_match:
            matches.sort(key=lambda m: (m[0], -m[1], m[2]))
            kept, end = [], -1
            for pos, n, g in matches:
                if pos >= end:
                    kept.append((pos, n, g))
                    end = pos + n
            matches = kept
        for pos, n, g in matches:
            rows.append((conv, ti, pos, n, g))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "pos", "n_words",
                                       "alias_lc"])


def oracle_link(mentions: pd.DataFrame, vocab: Vocab, keep: str = "best") -> pd.DataFrame:
    """alias -> candidate idents; rank!=2; stoplist anti; best = (rank, ident) min."""
    amap: dict[str, list[tuple[int, str, str]]] = defaultdict(list)
    stop = {(r.entity_type, r.ident) for r in vocab.stoplist.itertuples()}
    for r in vocab.aliases.itertuples():
        g = _NORM.sub(" ", r.alias_lc.lower()).strip()
        if not g or r.rank == 2:
            continue
        if (r.entity_type, r.ident) in stop:
            continue
        amap[g].append((int(r.rank), r.ident, r.entity_type))

    rows = []
    for m in mentions.itertuples():
        cands = sorted(set(amap.get(m.alias_lc, [])))
        if not cands:
            continue
        if keep == "best":
            cands = cands[:1]
        for rank, ident, etype in cands:
            rows.append((m.conv_id, m.turn_idx, m.pos, m.n_words, m.alias_lc,
                         ident, etype, rank))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "pos", "n_words",
                                       "alias_lc", "ident", "entity_type", "rank"])


def oracle_triples(transcripts: pd.DataFrame, vocab: Vocab,
                   longest_match: bool = False, keep: str = "best") -> pd.DataFrame:
    """Full pipeline -> (subj, pred, obj, source, score, evidence_type) triple set."""
    mentions = oracle_extract(transcripts, vocab, longest_match=longest_match)
    linked = oracle_link(mentions, vocab, keep=keep)
    canon = vocab.canonical
    linked = linked.assign(
        canonical_id=[canon.get(i, i) for i in linked["ident"]]
    )
    out = []

    # MENTIONED_IN_TURN
    grp = linked.groupby(["canonical_id", "conv_id", "turn_idx", "entity_type"])
    for (cid, conv, ti, etype), g in grp:
        out.append((cid, "MENTIONED_IN_TURN", f"{conv}:{ti}", "tagger",
                    float(len(g)), etype))

    # CO_MENTIONED_WITH
    per_turn = linked.drop_duplicates(["conv_id", "turn_idx", "canonical_id"])
    pair_turns: dict[tuple[str, str], set] = defaultdict(set)
    for (conv, ti), g in per_turn.groupby(["conv_id", "turn_idx"]):
        ents = sorted(set(g["canonical_id"]))
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                pair_turns[(ents[i], ents[j])].add((conv, ti))
    for (e1, e2), tks in pair_turns.items():
        out.append((e1, "CO_MENTIONED_WITH", e2, "tagger", float(len(tks)),
                    "co_occurrence"))

    # MAPS_TO
    for ident, cid in sorted(canon.items()):
        if ident != cid:
            out.append((ident, "MAPS_TO", cid, "canonicalization", 1.0, "identity"))

    # HAS_PARENT (canonicalized)
    seen = set()
    for r in vocab.parent_rels.itertuples():
        s, o = canon.get(r.start_id, r.start_id), canon.get(r.end_id, r.end_id)
        if s != o and (s, o) not in seen:
            seen.add((s, o))
            out.append((s, "HAS_PARENT", o, "ontology", 1.0, "hierarchy"))

    return pd.DataFrame(out, columns=["subj", "pred", "obj", "source", "score",
                                      "evidence_type"])


def triple_prf(expected: pd.DataFrame, actual: pd.DataFrame) -> dict:
    """Precision/recall/F1 over (subj, pred, obj, source) triple identity."""
    key = ["subj", "pred", "obj", "source"]
    e = {tuple(r) for r in expected[key].itertuples(index=False)}
    a = {tuple(r) for r in actual[key].itertuples(index=False)}
    tp = len(e & a)
    p = tp / len(a) if a else 0.0
    r = tp / len(e) if e else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1, "expected": len(e), "actual": len(a)}
