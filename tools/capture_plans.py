"""Capture .explain('formatted') output for the bench-relevant queries.

Usage: python tools/capture_plans.py before|after [name ...]
Writes plans/r06/<name>_<tag>.txt. Planning only — nothing is executed
except the tiny driver-side probes some operators make.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", "r06")


def _kg_edges(spark):
    from pyspark.sql import functions as F

    from bench import _ensure_bench_inputs
    from ckg_spark.operators import extract as X
    from ckg_spark.operators import link as L
    from ckg_spark.operators import materialize as M
    from ckg_spark.operators.canonicalize import canonical_mapping
    from ckg_spark.vocab import vocab_to_spark

    vocab, tpath = _ensure_bench_inputs()
    tables = vocab_to_spark(spark, vocab)
    cpus = spark.sparkContext.defaultParallelism
    t = spark.read.parquet(tpath).repartition(2 * cpus, "conv_id", "turn_idx")
    grams = X.prepare_alias_grams(tables["aliases"])
    alias_table = L.prepare_alias_table(tables["aliases"])
    mentions = X.extract_mentions(t, grams)
    linked = L.link_mentions(mentions, alias_table, tables["stoplist"],
                             keep="best")
    canonical = canonical_mapping(
        tables["identity_edges"], tables["aliases"].select("ident").distinct())
    slim = (M.canonicalize_linked(linked, canonical)
            .select("conv_id", "turn_idx", "canonical_id", "entity_type")
            .repartition(2 * cpus, "conv_id", "turn_idx"))
    # unpersisted plan: shows the full edge pipeline shape
    return M.mention_edges(slim).unionByName(M.comention_edges(slim))


def _training_pack(spark):
    from pyspark.sql import functions as F

    from bench import _ensure_bench_inputs
    from ckg_spark.operators.packing import pack_sequences

    _, tpath = _ensure_bench_inputs()
    turns = spark.read.parquet(tpath).select(
        F.concat_ws(":", "conv_id", F.format_string("%06d", "turn_idx"))
        .alias("doc_id"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"))
    return pack_sequences(turns, 2048)


def _curation_quality(spark):
    from ckg_spark.plans.curate import quality_filter

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    return quality_filter(docs, gopher_kwargs={"min_words": 50,
                                               "min_stopword_hits": 1})


def _minhash_clusters(spark):
    from ckg_spark.operators import dedup as D

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    return D.dedup_minhash_lsh(docs, threshold=0.8)


EXTRA = {
    "kg_edges": _kg_edges,
    "training_pack": _training_pack,
    "curation_quality": _curation_quality,
    "minhash_clusters": _minhash_clusters,
}

HEADLINE = [
    "q01_pricing_summary", "q03_star_join", "q10_topk_revenue",
    "q15_symmetric_dedup", "q21_mentions", "q26_dedup_exact",
    "q29_cosine_topk", "q31_minhash_clusters",
    "q93_incremental_canonicalize",
]


def main():
    from ckg_spark.driver_contract import queries_dict
    from ckg_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:] or (HEADLINE + list(EXTRA))
    os.makedirs(OUT_DIR, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("capture_plans", cpus=cpus)
    qd = queries_dict()
    for name in names:
        df = EXTRA[name](spark) if name in EXTRA else qd[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
