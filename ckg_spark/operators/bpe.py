"""Byte-pair-encoding tokenizer training and application at corpus scale.

The brief's training-data pipeline asks for token counting (whitespace +
BPE-ish regex, both in ``textstats``); this module adds the real thing:
learning a BPE merge table from a corpus (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") and applying
it with GPT-2-style rank-greedy merging.

Scale shape — the insight that makes BPE tractable on 100 TB of text:

1. ``word_frequencies`` is the ONLY corpus-scale step: one regex
   pre-tokenization (JVM ``regexp_extract_all``) + explode + map-side
   combined groupBy. 100 TB of text collapses to a distinct-pre-token
   frequency table (tens of millions of rows, Zipf-distributed).
2. Merge learning then operates on that WORD TABLE, never the corpus.
   ``learn_bpe`` prunes it (``min_freq``, ``max_words`` by frequency) and,
   when the pruned table passes a truncated-count gate, collects it and
   runs the classic incremental-pair-statistics loop on the driver —
   30k merges of driver arithmetic instead of 30k Spark jobs. Above the
   gate it falls back to per-round distributed counting
   (``_distributed_merge_rounds``): pair explode -> sum(freq) -> top-1 ->
   Arrow-batched pair substitution, with ``checkpoint_reset_stats`` per
   round (iterative plans otherwise compound Catalyst size estimates).
   Both paths produce IDENTICAL merge lists (asserted in tests).
3. ``apply_bpe`` is corpus-scale again but NARROW: the learned merge
   ranks broadcast to every executor inside an Arrow-batched pandas UDF
   with a per-batch word cache (Zipf makes the cache hit rate ~99%); no
   shuffle is introduced.

Tie-breaking everywhere is (frequency desc, pair lexicographic asc), so
training is deterministic across partitionings and parallelism levels.

Reference scope note: the reference repo (MannLabs/CKG) has no tokenizer
trainer; this is part of the round brief's "operations a large-scale
training-data pipeline would need" surface, same as dedup/quality/ANN.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# Same pre-token classes as textstats.bpe_ish_token_count: word runs, digit
# runs, single punctuation. No whitespace can appear inside a pre-token,
# so "a b" pair keys are unambiguous.
PRETOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
END_OF_WORD = "</w>"
# Driver gate for the pruned word table (rows). ~2M words x ~50 B is
# ~100 MB driver memory — the same order as the repo's other
# dictionary-scale collects.
LEARN_BPE_MAX_COLLECT = 2_000_000


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the single corpus-scale shuffle of
    BPE training, map-side combined by Spark's partial aggregation."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(PRETOKEN_PATTERN), F.lit(0))
        ).alias("word"))
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _driver_learn(word_freqs: list, n_merges: int, min_pair_freq: int) -> list:
    """Classic BPE merge loop with incremental pair statistics (the
    Sennrich reference algorithm): only words containing the merged pair
    have their pair counts updated, so each round costs O(affected words),
    not O(vocabulary)."""
    vocab = {}
    for word, freq in word_freqs:
        syms = tuple(word) + (END_OF_WORD,)
        vocab[syms] = vocab.get(syms, 0) + freq

    pair_counts: dict = {}
    pair_words: dict = {}  # pair -> set of word keys containing it
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + freq
            pair_words.setdefault(p, set()).add(syms)

    merges = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # deterministic argmax: count desc, pair lexicographic asc
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_freq:
            break
        merges.append(best)
        merged_sym = best[0] + best[1]
        for syms in list(pair_words.get(best, ())):
            freq = vocab.pop(syms, None)
            if freq is None:
                continue
            # remove old pair contributions
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] -= freq
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(syms)
                    if not ws:
                        pair_words.pop(p, None)
            new = _merge_word(syms, best, merged_sym)
            vocab[new] = vocab.get(new, 0) + freq
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + freq
                pair_words.setdefault(p, set()).add(new)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def _merge_word(syms: tuple, pair: tuple, merged_sym: str) -> tuple:
    """Left-to-right single-pass merge of `pair` occurrences in a symbol
    sequence (the standard BPE substitution order)."""
    out = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged_sym)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _distributed_merge_rounds(wf: DataFrame, n_merges: int,
                              min_pair_freq: int) -> list:
    """Per-round distributed merge learning for word tables above the
    driver gate: adjacent-pair explode -> sum(freq) -> deterministic top-1
    (count desc, pair asc) -> Arrow-batched pair substitution over the
    word table. One shuffle per round over the WORD table (never the
    corpus); ``checkpoint_reset_stats`` per round keeps the iterative plan
    and its Catalyst stats flat."""
    from .ckpt import checkpoint_reset_stats

    def to_syms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Python-side char split so both learning paths share symbol
        # semantics exactly (code points, not JVM UTF-16 units)
        for pdf in batches:
            yield pd.DataFrame({
                "freq": pdf["freq"],
                "syms": [list(w) + [END_OF_WORD] for w in pdf["word"]],
            })

    words = checkpoint_reset_stats(
        wf.mapInPandas(to_syms, schema="freq long, syms array<string>"))
    merges: list = []
    for _ in range(n_merges):
        n = F.size("syms")
        # Tie-break on the STRUCTURED pair (left, right), matching the
        # driver path's tuple comparison exactly. Ordering on a
        # concat_ws(" ", ...) string diverges when a symbol contains a
        # code point below 0x20 (the [^a-zA-Z0-9\s] pre-token class admits
        # non-whitespace control chars, which sort before the separator).
        pairs = words.where(n >= 2).select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, n - 1),
                    F.slice("syms", 2, n - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")))
            ).alias("pair"))
        top = (pairs.groupBy("pair").agg(F.sum("freq").alias("c"))
               .orderBy(F.desc("c"), F.asc("pair.l"), F.asc("pair.r"))
               .limit(1).collect())
        if not top or top[0]["c"] < min_pair_freq:
            break
        a, b = top[0]["pair"]["l"], top[0]["pair"]["r"]
        merges.append((a, b))

        def subst(batches: Iterator[pd.DataFrame], pa=a, pb=b) -> Iterator[pd.DataFrame]:
            merged = pa + pb
            for pdf in batches:
                pdf["syms"] = [
                    list(_merge_word(tuple(s), (pa, pb), merged))
                    for s in pdf["syms"]
                ]
                yield pdf
        words = checkpoint_reset_stats(
            words.mapInPandas(subst, schema="freq long, syms array<string>"))
    return merges


def learn_bpe(docs: DataFrame, n_merges: int = 1000, text_col: str = "text",
              min_freq: int = 1, min_pair_freq: int = 2,
              max_words: int | None = None,
              driver_threshold: int | None = LEARN_BPE_MAX_COLLECT) -> list:
    """Learn a BPE merge table from a corpus. Returns an ordered list of
    (left, right) merge pairs.

    ``driver_threshold`` gates the fast path: the pruned word table is
    probed with a TRUNCATED count (limit threshold+1, never a full count of
    an over-large table) and collected only when it fits; otherwise the
    per-round distributed loop runs. Pass ``driver_threshold=0`` to force
    the distributed path (tests assert both paths produce identical merge
    lists). ``max_words`` caps the vocabulary at the most frequent words —
    the standard practice that bounds merge-learning cost independently of
    corpus size."""
    return learn_bpe_from_word_table(
        word_frequencies(docs, text_col), n_merges=n_merges,
        min_freq=min_freq, min_pair_freq=min_pair_freq,
        max_words=max_words, driver_threshold=driver_threshold)


def learn_bpe_from_word_table(wf: DataFrame, n_merges: int = 1000,
                              min_freq: int = 1, min_pair_freq: int = 2,
                              max_words: int | None = None,
                              driver_threshold: int | None = LEARN_BPE_MAX_COLLECT) -> list:
    """Learn merges from a precomputed (word, freq) table — the entry
    point an INCREMENTALLY-maintained word table uses (plans/tokenizer.py
    folds per-delta partial counts; learning is a pure function of the
    summed table, so incremental == batch by construction)."""
    if min_freq > 1:
        wf = wf.where(F.col("freq") >= min_freq)
    if max_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)

    threshold = driver_threshold if driver_threshold is not None else 0
    if threshold > 0:
        probe = wf.limit(threshold + 1).count()
        if probe <= threshold:
            rows = wf.collect()
            pairs = sorted((r["word"], r["freq"]) for r in rows)
            return _driver_learn(pairs, n_merges, min_pair_freq)
    return _distributed_merge_rounds(wf, n_merges, min_pair_freq)


def save_bpe_model(merges: list, path: str) -> None:
    """Persist a merge table as the standard subword-nmt text format: one
    'left right' pair per line, rank order (symbols never contain spaces
    by the pre-token construction)."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for a, b in merges:
            f.write(f"{a} {b}\n")
    os.replace(tmp, path)


def load_bpe_model(path: str) -> list:
    with open(path, encoding="utf-8") as f:
        return [tuple(line.rstrip("\n").split(" ", 1))
                for line in f if line.strip()]


def _apply_word(word: str, ranks: dict) -> list:
    """GPT-2-style rank-greedy BPE apply: repeatedly merge the
    lowest-ranked adjacent pair until none remains."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # merge ALL occurrences of that pair left-to-right (one pass),
        # matching how training's _merge_word rewrote the vocabulary
        pair = (syms[best_i], syms[best_i + 1])
        syms = list(_merge_word(tuple(syms), pair, pair[0] + pair[1]))
    return syms


def apply_bpe(docs: DataFrame, merges: list, text_col: str = "text",
              id_col: str = "doc_id", out_col: str = "bpe_tokens") -> DataFrame:
    """(id_col, bpe_tokens array<string>, bpe_token_count) — Arrow-batched
    narrow tokenization; the merge table rides to executors in the UDF
    closure (serialized once per task, dictionary-scale), a per-batch word
    cache exploits the Zipf head, and no shuffle is introduced."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    import re
    pat = re.compile(PRETOKEN_PATTERN)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            toks_out = []
            for text in pdf[text_col]:
                toks: list = []
                for w in pat.findall((text or "").lower()):
                    t = cache.get(w)
                    if t is None:
                        t = _apply_word(w, ranks)
                        cache[w] = t
                    toks.extend(t)
                toks_out.append(toks)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks_out})

    id_type = dict(docs.dtypes)[id_col]
    out = docs.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, {out_col} array<string>")
    return out.withColumn("bpe_token_count", F.size(out_col))
