"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    (conv_id string, turn_idx int32, role string, text string,
     tool string, ts timestamp)

Properties engineered in:
- conv_id key skew: conversation lengths are Zipf-distributed plus a few
  deliberately hot conversations (exercises the explicit hash(conv_id)
  repartition + AQE skew handling demanded by the north rule).
- each turn embeds 0-4 vocabulary mentions (exact, case-variant,
  punctuation-adjacent, multi-word) among distractor words, so the oracle
  triple set is exactly derivable by re-running dictionary matching.
- ts is monotone per conversation with a fixed base epoch — no wall clock
  anywhere, so two runs (and two parallelism levels) produce identical bytes.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from .vocab import Vocab, build_vocab

_DISTRACTORS = [
    "the", "a", "we", "observed", "patient", "reported", "treatment", "with",
    "after", "before", "results", "show", "data", "from", "study", "cohort",
    "please", "check", "model", "agent", "tool", "call", "output", "input",
    "value", "table", "query", "run", "step", "plan", "next", "then", "also",
    "however", "because", "during", "without", "between", "against", "under",
]

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "calculator", "browser", "sql", None, None, None]
_BASE_TS = datetime(2025, 1, 1, 0, 0, 0)


def _case_variant(rng: random.Random, s: str) -> str:
    r = rng.random()
    if r < 0.70:
        return s
    if r < 0.90:
        return s.title()
    return s.upper()


def gen_transcripts(n_turns: int, vocab: Vocab | None = None, seed: int = 42,
                    hot_convs: int = 2) -> pd.DataFrame:
    """Generate ~n_turns transcript rows deterministically."""
    if vocab is None:
        vocab = build_vocab()
    rng = random.Random(seed)
    alias_pool = list(vocab.aliases["alias"])

    # Zipf-ish conversation lengths
    n_convs = max(1, n_turns // 30)
    raw = np.random.default_rng(seed).zipf(1.7, size=n_convs).astype(np.int64)
    lengths = np.clip(raw * 4, 2, 400)
    # hot conversations: ~5% of the corpus each
    for h in range(min(hot_convs, n_convs)):
        lengths[h] = max(int(n_turns * 0.05), 50)
    # trim/extend to approximately n_turns
    cum = np.cumsum(lengths)
    cut = int(np.searchsorted(cum, n_turns)) + 1
    lengths = lengths[:cut]

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for ci, ln in enumerate(lengths):
        conv = f"conv-{seed}-{ci:06d}"
        t0 = _BASE_TS + timedelta(hours=ci % 8760)
        for ti in range(int(ln)):
            role = _ROLES[ti % 3] if rng.random() < 0.8 else rng.choice(_ROLES)
            n_mentions = rng.choices([0, 1, 2, 3, 4], weights=[25, 35, 25, 10, 5])[0]
            words = rng.choices(_DISTRACTORS, k=rng.randint(4, 18))
            for _ in range(n_mentions):
                m = _case_variant(rng, rng.choice(alias_pool))
                if rng.random() < 0.15:
                    m = m + rng.choice([",", ".", ";", ")"])
                pos = rng.randint(0, len(words))
                words.insert(pos, m)
            conv_ids.append(conv)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(" ".join(words))
            tools.append(rng.choice(_TOOLS) if role == "tool" else None)
            tss.append(t0 + timedelta(seconds=ti * 17))

    df = pd.DataFrame({
        "conv_id": pd.array(conv_ids, dtype="string"),
        "turn_idx": pd.array(turn_idxs, dtype="int32"),
        "role": pd.array(roles, dtype="string"),
        "text": pd.array(texts, dtype="string"),
        "tool": pd.array(tools, dtype="string"),
        "ts": pd.to_datetime(pd.Series(tss)).astype("datetime64[us]"),
    })
    return df


def transcripts_path(tier: str, base_dir: str = "/root/repo/data") -> str:
    return os.path.join(base_dir, f"transcripts_{tier}.parquet")


TIER_SIZES = {"smoke": 2_000, "correctness": 60_000, "bench": 600_000}


def ensure_transcripts(tier: str, vocab: Vocab | None = None,
                       base_dir: str = "/root/repo/data", seed: int = 42) -> str:
    """Generate-and-cache the transcript parquet for a tier; returns path."""
    path = transcripts_path(tier, base_dir)
    if not os.path.exists(path):
        os.makedirs(base_dir, exist_ok=True)
        df = gen_transcripts(TIER_SIZES[tier], vocab=vocab, seed=seed)
        tmp = path + ".tmp"
        # small row groups so Spark can split the single file into many scan
        # partitions (a pandas-default single row group serializes the scan)
        df.to_parquet(tmp, index=False, row_group_size=20_000)
        os.replace(tmp, path)
    return path
