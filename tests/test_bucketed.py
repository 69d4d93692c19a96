"""Bucketed tables: co-located joins and aggs plan exchange-free."""

import pytest
from pyspark.sql import functions as F

from ckg_spark.plans.bucketed import write_bucketed, read_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    a = spark.range(0, 5000).select(
        (F.col("id") % 500).alias("subj"), F.col("id").alias("payload_a"))
    b = spark.range(0, 3000).select(
        (F.col("id") % 500).alias("subj"), F.col("id").alias("payload_b"))
    write_bucketed(a, "t_bkt_a", "subj", buckets=8, path=str(base / "a"))
    write_bucketed(b, "t_bkt_b", "subj", buckets=8, path=str(base / "b"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS t_bkt_a")
    spark.sql("DROP TABLE IF EXISTS t_bkt_b")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(bucketed_pair):
    spark = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "t_bkt_a").join(
            read_bucketed(spark, "t_bkt_b"), on="subj")
        plan = _plan(j)
        assert "Exchange" not in plan, plan  # file layout satisfies the join
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # and it computes the right thing
        n = j.count()
        assert n == 5000 * (3000 // 500)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_has_no_exchange(bucketed_pair):
    spark = bucketed_pair
    g = read_bucketed(spark, "t_bkt_a").groupBy("subj").agg(
        F.sum("payload_a").alias("s"))
    assert "Exchange" not in _plan(g), _plan(g)
    assert g.count() == 500


def test_unbucketed_join_pays_the_exchange(bucketed_pair):
    """Control: the same join on plain DataFrames shuffles — the absence
    above is the bucketing, not the optimizer getting lucky."""
    spark = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 5000).select(
            (F.col("id") % 500).alias("subj"), F.col("id").alias("pa"))
        b = spark.range(0, 3000).select(
            (F.col("id") % 500).alias("subj"), F.col("id").alias("pb"))
        assert "Exchange" in _plan(a.join(b, on="subj"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_validate_edges_delta_flags_only_the_delta(spark, tmp_path):
    """Incremental QA: commit an edges snapshot table in two deltas — the
    first clean, the second carrying planted violations — and assert the
    delta validation sees ONLY the second delta's problems (O(delta)
    contract), while a full re-baseline sees both."""
    from ckg_spark.plans import table as T
    from ckg_spark.plans.incremental import validate_edges_delta

    d = str(tmp_path / "edges_tbl")
    nodes = spark.createDataFrame(
        [("a", "drug"), ("p", "protein")], ["id", "type"])
    rules = spark.createDataFrame(
        [("TARGETS", "drug", "protein")], ["pred", "subj_type", "obj_type"])
    clean = spark.createDataFrame(
        [("a", "TARGETS", "p")], ["subj", "pred", "obj"])
    T.append(clean, d)
    v1 = T.current_version(d)
    bad = spark.createDataFrame(
        [("a", "TARGETS", "ghost"), ("p", "TARGETS", "a")],
        ["subj", "pred", "obj"])
    T.append(bad, d)

    delta = validate_edges_delta(spark, d, nodes, rules, from_version=v1)
    got = {(r.violation): r.n_edges for r in delta.collect()}
    assert got == {"unknown_obj": 1, "domain_range": 1}

    full = validate_edges_delta(spark, d, nodes, rules, from_version=None)
    assert sum(r.n_edges for r in full.collect()) == 2  # clean delta stays clean

    idle = validate_edges_delta(spark, d, nodes, rules,
                                from_version=T.current_version(d))
    assert idle.count() == 0  # no new files -> nothing to flag


def test_validate_edges_delta_partitioned_table(spark, tmp_path):
    """Partitioned edge table (partition_by=['pred'] — the layout the
    snapshot layer promotes): partition values live in the MANIFEST, so
    the delta read must re-attach them; a raw path read would drop pred
    and break the rules join (review finding, fixed via table.read_files)."""
    from ckg_spark.plans import table as T
    from ckg_spark.plans.incremental import validate_edges_delta

    d = str(tmp_path / "edges_part")
    nodes = spark.createDataFrame(
        [("a", "drug"), ("p", "protein")], ["id", "type"])
    rules = spark.createDataFrame(
        [("TARGETS", "drug", "protein")], ["pred", "subj_type", "obj_type"])
    T.append(spark.createDataFrame(
        [("a", "TARGETS", "p")], ["subj", "pred", "obj"]),
        d, partition_by=["pred"])
    v1 = T.current_version(d)
    T.append(spark.createDataFrame(
        [("p", "TARGETS", "a"), ("a", "OTHER_PRED", "p")],
        ["subj", "pred", "obj"]), d, partition_by=["pred"])

    got = {(r.pred, r.violation): r.n_edges
           for r in validate_edges_delta(
               spark, d, nodes, rules, from_version=v1).collect()}
    assert got == {("TARGETS", "domain_range"): 1,
                   ("OTHER_PRED", "domain_range"): 1}
