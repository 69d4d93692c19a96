"""Graph algorithms + query catalog + sources + streaming ingest."""

import os

from pyspark.sql import functions as F

from ckg_spark.operators import graph_algos as G
from ckg_spark.queries import catalog as Q
from ckg_spark.sources.readers import parse_obo
from ckg_spark.sources.transcripts import transcripts_from_documents


def _edges(spark):
    rows = [
        ("a", "MENTIONED_IN_TURN", "t1"), ("a", "MENTIONED_IN_TURN", "t2"),
        ("b", "MENTIONED_IN_TURN", "t1"), ("c", "MENTIONED_IN_TURN", "t3"),
        ("a", "CO_MENTIONED_WITH", "b"), ("b", "CO_MENTIONED_WITH", "c"),
    ]
    return spark.createDataFrame(
        [(s, p, o, "tagger", 1.0, "x") for s, p, o in rows],
        "subj string, pred string, obj string, source string, score double, evidence_type string",
    )


def test_degrees_and_topk(spark):
    e = _edges(spark)
    d = {r["id"]: (r["out_degree"], r["in_degree"]) for r in G.degrees(e).collect()}
    assert d["a"] == (3, 0) and d["t1"] == (0, 2) and d["b"] == (2, 1)
    top = G.top_k_by_degree(e, k=2).toPandas()
    assert list(top["id"])[0] == "a"


def test_hot_node_guard(spark):
    e = _edges(spark)
    kept = G.hot_node_filtered_edges(e, max_degree=3)
    assert kept.where(F.col("subj") == "a").count() == 0
    assert kept.where(F.col("subj") == "b").count() == 2


def test_pagerank_sums_to_one(spark):
    e = _edges(spark).where(F.col("pred") == "CO_MENTIONED_WITH")
    pr = G.pagerank(e, iters=8).toPandas()
    assert abs(pr["rank"].sum() - 1.0) < 1e-6
    # chain a->b->c: c should outrank a
    r = pr.set_index("id")["rank"]
    assert r["c"] > r["a"]


def test_k_hop(spark):
    e = _edges(spark)
    seeds = spark.createDataFrame([("a",)], "id string")
    got = G.k_hop(e, seeds, hops=2).toPandas().set_index("id")["hop"].to_dict()
    assert got["a"] == 0
    assert got["t1"] == 1 and got["b"] == 1
    assert got["t3"] not in (0, 1) if "t3" in got else True
    assert got.get("c") == 2  # a-(co)->b-(co)->c


def test_label_propagation_two_communities(spark):
    rows = [("x1", "x2"), ("x2", "x3"), ("x1", "x3"), ("y1", "y2"), ("y2", "y3")]
    e = spark.createDataFrame(
        [(a, "R", b, "s", 1.0, "e") for a, b in rows],
        "subj string, pred string, obj string, source string, score double, evidence_type string",
    )
    got = G.label_propagation(e, iters=4).toPandas()
    lab = got.set_index("id")["label"].to_dict()
    assert lab["x1"] == lab["x2"] == lab["x3"]
    assert lab["y1"] == lab["y2"] == lab["y3"]
    assert lab["x1"] != lab["y1"]


def test_query_catalog(spark, vocab_tables, transcripts_df, tmp_path):
    from ckg_spark.plans.pipeline import run_pipeline

    res = run_pipeline(spark, transcripts_df, vocab_tables, str(tmp_path / "qkg"))
    counts = Q.run_query(spark, "edge_counts_by_pred", res.nodes, res.edges).toPandas()
    assert set(counts["pred"]) >= {"MENTIONED_IN_TURN", "CO_MENTIONED_WITH", "MAPS_TO"}
    top = Q.run_query(spark, "entity_mention_counts", res.nodes, res.edges, k=5).toPandas()
    assert len(top) == 5 and top["total_mentions"].is_monotonic_decreasing
    ent = top.iloc[0]["id"]
    com = Q.run_query(spark, "top_comentions_for_entity", res.nodes, res.edges,
                      entity=ent, k=3).toPandas()
    assert len(com) <= 3
    hubs = Q.run_query(spark, "hub_entities", res.nodes, res.edges, k=4).toPandas()
    assert len(hubs) == 4
    assert set(Q.queries_involving("MAPS_TO")) >= {"merged_identities"}
    # referential QA: with default (collapsed) nodes the dangling rows are
    # exactly the MAPS_TO subjects (retired idents); nothing else dangles
    # (MENTIONED_IN_TURN obj = turn keys, excluded by the query itself)
    dang = Q.run_query(spark, "dangling_endpoints", res.nodes, res.edges).toPandas()
    got = {(r.pred, r.endpoint): r.n_dangling for r in dang.itertuples()}
    n_maps = res.edges.where("pred = 'MAPS_TO'").count()
    assert got == {("MAPS_TO", "subj"): n_maps} and n_maps > 0


def test_parse_obo(tmp_path):
    obo = tmp_path / "mini.obo"
    obo.write_text(
        """format-version: 1.2

[Term]
id: DOID:0001
name: test disease
namespace: disease
synonym: "sickness one" EXACT []
is_a: DOID:0000 ! root

[Term]
id: DOID:0002
name: obsolete thing
is_obsolete: true

[Typedef]
id: part_of
"""
    )
    got = parse_obo(str(obo))
    assert list(got["terms"]["id"]) == ["DOID:0001"]
    assert set(got["aliases"]["alias_lc"]) == {"test disease", "sickness one"}
    assert list(got["parent_rels"].itertuples(index=False))[0][:2] == ("DOID:0001", "DOID:0000")


def test_transcripts_from_documents(spark):
    t = transcripts_from_documents(spark, "/root/testdata/sf0.001", words_per_turn=10)
    pdf = t.where(F.col("conv_id") == "doc-0").toPandas().sort_values("turn_idx")
    assert pdf["turn_idx"].tolist() == list(range(len(pdf)))
    assert (pdf["role"].iloc[:3] == ["user", "assistant", "tool"]).all()
    # re-derivation is deterministic
    t2 = transcripts_from_documents(spark, "/root/testdata/sf0.001", words_per_turn=10)
    assert t.exceptAll(t2).count() == 0 and t2.exceptAll(t).count() == 0


def test_streaming_ingest(spark, vocab, vocab_tables, transcripts_pdf, tmp_path):
    from ckg_spark.streaming.ingest import stream_mention_edges
    from ckg_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    in_dir, out_dir, cp = (str(tmp_path / d) for d in ("in", "out", "cp"))
    os.makedirs(in_dir, exist_ok=True)
    half = len(transcripts_pdf) // 2
    transcripts_pdf.iloc[:half].to_parquet(f"{in_dir}/part1.parquet", index=False)
    transcripts_pdf.iloc[half:].to_parquet(f"{in_dir}/part2.parquet", index=False)

    q = stream_mention_edges(spark, in_dir, TRANSCRIPT_SCHEMA, vocab_tables,
                             out_dir, cp)
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() > 0
    assert got.where(F.col("pred") != "MENTIONED_IN_TURN").count() == 0


def test_catalog_recursive_ancestors(spark):
    """ancestors_of uses a recursive CTE (Spark 4 native) over HAS_PARENT."""
    edges = spark.createDataFrame(
        [("a", "HAS_PARENT", "b", "s", 1.0, "h"),
         ("b", "HAS_PARENT", "c", "s", 1.0, "h"),
         ("c", "HAS_PARENT", "d", "s", 1.0, "h"),
         ("x", "HAS_PARENT", "y", "s", 1.0, "h")],
        "subj string, pred string, obj string, source string, score double, evidence_type string",
    )
    nodes = spark.createDataFrame([], "id string, label string")
    got = Q.run_query(spark, "ancestors_of", nodes, edges, entity="a").toPandas()
    assert list(got["ancestor"]) == ["b", "c", "d"]


def test_streaming_restart_exactly_once(spark, vocab_tables, transcripts_pdf,
                                        tmp_path):
    """availableNow stream, stop, land a new file, restart with the same
    checkpoint: old files are not reprocessed (no duplicate edges)."""
    from ckg_spark.sources.transcripts import TRANSCRIPT_SCHEMA
    from ckg_spark.streaming.ingest import stream_mention_edges

    in_dir, out_dir, cp = (str(tmp_path / d) for d in ("in", "out", "cp"))
    os.makedirs(in_dir, exist_ok=True)
    third = len(transcripts_pdf) // 3
    transcripts_pdf.iloc[:third].to_parquet(f"{in_dir}/f1.parquet", index=False)

    q1 = stream_mention_edges(spark, in_dir, TRANSCRIPT_SCHEMA, vocab_tables,
                              out_dir, cp)
    q1.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    transcripts_pdf.iloc[third:2 * third].to_parquet(f"{in_dir}/f2.parquet", index=False)
    q2 = stream_mention_edges(spark, in_dir, TRANSCRIPT_SCHEMA, vocab_tables,
                              out_dir, cp)
    q2.awaitTermination(120)
    all_edges = spark.read.parquet(out_dir)
    n2 = all_edges.count()
    assert n2 > n1
    # exactly-once per file: no (subj, obj) turn-key duplicates
    assert all_edges.groupBy("subj", "obj").count().where("count > 1").count() == 0


def test_knowledge_summary_and_subgraph(spark, vocab_tables, transcripts_df, tmp_path):
    from ckg_spark.plans.pipeline import run_pipeline
    from ckg_spark.queries.knowledge import (knowledge_summary,
                                             reduce_to_subgraph, run_post_query)

    res = run_pipeline(spark, transcripts_df, vocab_tables, str(tmp_path / "ks"))
    top = knowledge_summary(res.edges, k=10).toPandas()
    assert len(top) == 10
    assert top["centrality"].is_monotonic_decreasing
    assert (top["degree"] > 0).all()

    top_deg = knowledge_summary(res.edges, k=10, method="degree").toPandas()
    assert len(top_deg) == 10

    seeds = spark.createDataFrame([(top.iloc[0]["id"],)], "id string")
    sub = reduce_to_subgraph(res.edges, seeds, hops=1)
    n_sub, n_all = sub.count(), res.edges.count()
    assert 0 < n_sub < n_all

    # two-phase post query: expand top entities into their mention edges
    phase1 = spark.createDataFrame(
        [(r,) for r in top["id"].tolist()], "id string"
    )
    phase2 = run_post_query(phase1, res.edges.where("pred = 'MENTIONED_IN_TURN'"),
                            key_col="id")
    assert phase2.count() > 0
    assert phase2.select("subj").distinct().count() <= 10


def test_streaming_snapshot_sink_exactly_once(spark, vocab_tables,
                                              transcripts_pdf, tmp_path):
    """stream_mention_edges_snapshot: each micro-batch is one snapshot
    commit with its batch id in manifest properties; a replayed batch id is
    skipped (exactly-once batches), every tick is time-travelable, and a
    restart with new files appends new snapshots only."""
    from ckg_spark.plans import table as T
    from ckg_spark.sources.transcripts import TRANSCRIPT_SCHEMA
    from ckg_spark.streaming.ingest import stream_mention_edges_snapshot

    in_dir, tbl, cp = (str(tmp_path / d) for d in ("in", "tbl", "cp"))
    os.makedirs(in_dir, exist_ok=True)
    third = len(transcripts_pdf) // 3
    transcripts_pdf.iloc[:third].to_parquet(f"{in_dir}/f1.parquet", index=False)

    q1 = stream_mention_edges_snapshot(spark, in_dir, TRANSCRIPT_SCHEMA,
                                       vocab_tables, tbl, cp)
    q1.awaitTermination(120)
    v_after_1 = T.current_version(tbl)
    n1 = T.read(spark, tbl).count()
    assert v_after_1 >= 1 and n1 > 0

    transcripts_pdf.iloc[third:2 * third].to_parquet(f"{in_dir}/f2.parquet", index=False)
    q2 = stream_mention_edges_snapshot(spark, in_dir, TRANSCRIPT_SCHEMA,
                                       vocab_tables, tbl, cp)
    q2.awaitTermination(120)
    n2 = T.read(spark, tbl).count()
    assert n2 > n1
    # the first tick stays time-travelable
    assert T.read(spark, tbl, version=v_after_1).count() == n1
    # committed batch ids are unique (replay would be skipped, not doubled)
    bids = [s["properties"]["batch_id"] for s in T.snapshots(tbl)]
    assert len(bids) == len(set(bids))
    # a replayed batch is a no-op: simulate by re-calling process semantics —
    # restart with the SAME checkpoint and no new files commits nothing
    v_before = T.current_version(tbl)
    q3 = stream_mention_edges_snapshot(spark, in_dir, TRANSCRIPT_SCHEMA,
                                       vocab_tables, tbl, cp)
    q3.awaitTermination(120)
    assert T.current_version(tbl) == v_before
    # no duplicate turn-keyed edges across snapshots
    assert (T.read(spark, tbl).groupBy("subj", "obj").count()
            .where("count > 1").count() == 0)


def test_streaming_snapshot_comention_partials_merge_exact(
        spark, vocab_tables, transcripts_pdf, tmp_path):
    """comention=True streams PARTIAL co-mention counts per micro-batch
    (micro-batches are turn-disjoint, so counts are additive); the
    merge-on-read view over the streamed table must equal the one-shot
    batch result for BOTH edge families — the same contract q71 attests
    for the batch incremental path."""
    from ckg_spark.operators import materialize as M
    from ckg_spark.plans import table as T
    from ckg_spark.plans.incremental import compact_merged, read_merged_edges
    from ckg_spark.sources.transcripts import TRANSCRIPT_SCHEMA
    from ckg_spark.streaming.ingest import (_batch_linked,
                                            stream_mention_edges_snapshot)
    from ckg_spark.operators import extract as X
    from ckg_spark.operators import link as L

    in_dir, tbl, cp = (str(tmp_path / d) for d in ("in", "tbl", "cp"))
    os.makedirs(in_dir, exist_ok=True)
    half = len(transcripts_pdf) // 2
    # two separate ticks (run, add a file, run again) so partial counts
    # genuinely accumulate ACROSS batch commits, not within one
    transcripts_pdf.iloc[:half].to_parquet(f"{in_dir}/f1.parquet", index=False)
    q = stream_mention_edges_snapshot(spark, in_dir, TRANSCRIPT_SCHEMA,
                                      vocab_tables, tbl, cp, comention=True)
    q.awaitTermination(120)
    transcripts_pdf.iloc[half:].to_parquet(f"{in_dir}/f2.parquet", index=False)
    q = stream_mention_edges_snapshot(spark, in_dir, TRANSCRIPT_SCHEMA,
                                      vocab_tables, tbl, cp, comention=True)
    q.awaitTermination(120)
    from ckg_spark.plans.incremental import EDGE_KEY
    # at least one co-mention identity spans both commits (a real merge)
    raw = T.read(spark, tbl)
    assert (raw.where("pred = 'CO_MENTIONED_WITH'")
            .groupBy(*EDGE_KEY).count().where("count > 1").count()) > 0

    linked = _batch_linked(
        spark.createDataFrame(transcripts_pdf),
        X.prepare_alias_grams(vocab_tables["aliases"]),
        L.prepare_alias_table(vocab_tables["aliases"]),
        vocab_tables["stoplist"], None)
    want = sorted(map(tuple, M.mention_edges(linked).unionByName(
        M.comention_edges(linked)).collect()))
    got = sorted(map(tuple, read_merged_edges(spark, tbl).collect()))
    assert got == want
    assert [t for t in want if t[1] == "CO_MENTIONED_WITH"]

    # compaction folds partials and the view is unchanged
    compact_merged(spark, tbl)
    assert sorted(map(tuple, read_merged_edges(spark, tbl).collect())) == want
    # raw table has one row per edge identity after compaction
    assert T.read(spark, tbl).count() == len(want)
