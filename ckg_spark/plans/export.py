"""Training-data export plan: curation -> mixture -> packing, resumable.

The end-to-end recipe that turns a raw document corpus into a packed
LM-pretraining dataset, composed from operators that are each already
oracle-locked (curation q59, mixture q72, packing q73) — this plan locks
the COMPOSITION (q74) and gives it the same lineage/resume contract as
the KG and curation pipelines:

    documents (doc_id, text, source)
      v
    10_curation   plans/curate.py stage stack (its own nested lineage)
      v
    20_tokens     per-doc token counts (JVM expression; no UDF)
      v
    30_mixture    operators/sampling.mixture_sample — per-source keep
                  rates solved from token totals to realize `targets`
      v
    40_segments   operators/packing.pack_sequences — fixed-length
                  concat-and-split segment map, ready for a reader

Reference analog: CKG's project-report export tail (analytics_factory +
viewer download) — recomposed as the training-export a 100 TB LLM-data
pipeline runs. Every stage commits parquet + a lineage row (per-partition
counts from the parquet footers); reruns with the same out_dir resume
after the last committed stage. The out_dir IS the recipe identity:
resuming with different targets/seq_len would mix recipes, so the plan
stamps them in a manifest and refuses a mismatched resume.

Scale shape: the corpus shuffles ZERO times after curation — token
counting is a narrow projection, the mixture is a broadcast rate join +
JVM hash filter, and packing's only corpus-wide structure is the house
two-pass prefix sum (range repartition + broadcast partition offsets).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..operators import packing as PK
from ..operators import sampling as SA
from ..operators import textstats as T
from . import lineage as LIN
from .curate import run_curation_pipeline

__all__ = ["TrainingExportResult", "run_training_export"]


@dataclass
class TrainingExportResult:
    run_id: str
    corpus: DataFrame        # sampled docs: doc_id, source, n_tokens
    segments: DataFrame      # seq_id, doc_id, doc_offset, seq_offset, n_tokens
    resumed_stages: list[str]
    stage_counts: dict
    realized_mix: dict       # source -> realized token fraction of the export


def _recipe_manifest(out_dir: str) -> str:
    return os.path.join(out_dir, "_export_recipe.json")


def _check_recipe(out_dir: str, recipe: dict) -> None:
    """Stamp the recipe on first run; refuse a resume whose parameters
    differ (stages committed under the old recipe would silently mix)."""
    mp = _recipe_manifest(out_dir)
    if os.path.exists(mp):
        with open(mp) as f:
            stored = json.load(f)
        if stored != recipe:
            diff = {k: (stored.get(k), recipe.get(k))
                    for k in sorted(set(stored) | set(recipe))
                    if stored.get(k) != recipe.get(k)}
            raise ValueError(
                f"{out_dir} was exported with a different recipe {diff}; "
                "use a fresh out_dir (or delete it) to change the recipe")
    else:
        os.makedirs(out_dir, exist_ok=True)
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(recipe, f, sort_keys=True)
        os.replace(tmp, mp)


def run_training_export(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str,
    *,
    targets: dict[str, float] | None = None,
    seq_len: int = 2048,
    budget: float | None = None,
    seed: str = "mix",
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    token_counter: Callable[[Column], Column] = T.token_count,
    languages: tuple = ("en",),
    minhash_threshold: float | None = 0.8,
    gopher_kwargs: dict | None = None,
    line_filter: bool = False,
) -> TrainingExportResult:
    """Run (or resume) the curation -> mixture -> packing export.

    ``targets`` maps source -> desired token fraction of the export
    (None keeps every curated doc — no mixture stage); ``budget`` caps
    the export's total token count below the largest achievable mix.
    ``token_counter`` is a JVM Column expression (default: whitespace
    token count; swap `textstats.bpe_ish_token_count` or a real
    tokenizer's count column for production runs).
    """
    recipe = {
        "targets": {k: targets[k] for k in sorted(targets)} if targets else None,
        "seq_len": int(seq_len), "budget": budget, "seed": seed,
        "languages": list(languages), "minhash_threshold": minhash_threshold,
        "gopher_kwargs": gopher_kwargs, "line_filter": line_filter,
    }
    _check_recipe(out_dir, recipe)
    run_id = LIN.new_run_id()
    resumed: list[str] = []

    # ---- stage 10: curation (nested plan — its own lineage dir) -----------
    cur = run_curation_pipeline(
        spark, documents, os.path.join(out_dir, "10_curation"),
        id_col=id_col, text_col=text_col, languages=languages,
        minhash_threshold=minhash_threshold, gopher_kwargs=gopher_kwargs,
        line_filter=line_filter)
    resumed += [f"10_curation/{s}" for s in cur.resumed_stages]

    # ---- stage 20: token counts (rejoin source from the input: curation
    # normalizes to doc_id/text) --------------------------------------------
    if LIN.stage_done(out_dir, "20_tokens"):
        tokens = LIN.read_stage(spark, out_dir, "20_tokens")
        resumed.append("20_tokens")
    else:
        src = documents.select(F.col(id_col).alias("doc_id"),
                               F.col(source_col).alias("source"))
        toks = cur.corpus.select(
            "doc_id", token_counter(F.col("text")).alias("n_tokens"))
        tokens = LIN.write_stage(
            toks.join(src, on="doc_id", how="inner"),
            out_dir, "20_tokens", run_id)

    # ---- stage 30: mixture sampling ---------------------------------------
    if targets is None:
        sampled = tokens
    elif LIN.stage_done(out_dir, "30_mixture"):
        sampled = LIN.read_stage(spark, out_dir, "30_mixture")
        resumed.append("30_mixture")
    else:
        sampled = LIN.write_stage(
            SA.mixture_sample(tokens, targets, source_col="source",
                              weight_col="n_tokens", key="doc_id",
                              seed=seed, budget=budget),
            out_dir, "30_mixture", run_id)

    # ---- stage 40: sequence packing ---------------------------------------
    if LIN.stage_done(out_dir, "40_segments"):
        segments = LIN.read_stage(spark, out_dir, "40_segments")
        resumed.append("40_segments")
    else:
        segments = LIN.write_stage(
            PK.pack_sequences(sampled, seq_len, token_col="n_tokens"),
            out_dir, "40_segments", run_id)

    # realized mixture: dictionary-scale per-source token shares
    shares = {r["source"]: int(r["w"] or 0) for r in
              sampled.groupBy("source")
              .agg(F.sum("n_tokens").alias("w")).collect()}
    tot = float(sum(shares.values())) or 1.0
    realized = {s: w / tot for s, w in sorted(shares.items())}

    counts: dict = {}
    for row in LIN.read_lineage(os.path.join(out_dir, "10_curation")):
        counts[f"10_curation/{row['stage']}"] = row.get("rows")
    for row in LIN.read_lineage(out_dir):
        counts[row["stage"]] = row.get("rows")
    return TrainingExportResult(
        run_id=run_id, corpus=sampled, segments=segments,
        resumed_stages=resumed, stage_counts=counts, realized_mix=realized)
