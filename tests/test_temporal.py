"""Temporal operators: sessionize / session_stats / asof_join and the
bigram stupid-backoff scorer."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from ckg_spark.operators import temporal as T
from ckg_spark.operators import textstats as TS


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions split by a 4900s gap (threshold 1000s)
        (1, _ts(0), "view", 10.0, 1),
        (1, _ts(100), "purchase", 5.0, 2),
        (1, _ts(5000), "view", 1.0, 3),
        # user 2: one session; purchase mid-stream
        (2, _ts(50), "view", 2.0, 4),
        (2, _ts(60), "purchase", 3.0, 5),
        (2, _ts(61), "view", 7.0, 6),
        # user 3: no purchase at all
        (3, _ts(10), "view", 1.0, 7),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, "
              "value double, event_id long")


def test_sessionize_gap_split(events):
    got = {r["event_id"]: r["session_idx"]
           for r in T.sessionize(events, "user_id", "ts", 1000,
                                 tiebreak="event_id").collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0}


def test_sessionize_strict_gap_boundary(spark):
    """Gap exactly == threshold does NOT split (strict >)."""
    df = spark.createDataFrame(
        [(1, _ts(0), 1), (1, _ts(1000), 2), (1, _ts(2000, ), 3)],
        "k long, ts timestamp, eid long")
    got = [r["session_idx"]
           for r in T.sessionize(df, "k", "ts", 1000, tiebreak="eid")
           .orderBy("eid").collect()]
    assert got == [0, 0, 0]


def test_session_stats_values_and_single_shuffle(events, spark):
    out = T.session_stats(events, "user_id", "ts", 1000,
                          value_col="value", tiebreak="event_id")
    rows = {(r["user_id"], r["session_idx"]): r for r in out.collect()}
    r = rows[(1, 0)]
    assert r["n_events"] == 2 and r["duration_us"] == 100_000_000
    assert r["sum_value"] == 15.0
    assert rows[(1, 1)]["n_events"] == 1
    assert rows[(2, 0)]["n_events"] == 3
    # window partition keys prefix the groupBy keys -> ONE Exchange total
    n, plan = _n_exchanges(out)
    assert n == 1, plan


def _n_exchanges(df):
    """Exchange count in the (final, post-AQE) physical plan — the string
    repeats the pre-AQE plan under '== Initial Plan ==' after execution."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0].count("Exchange"), plan


def _asof_pairs(out):
    return {r["event_id"]: r["r_pid"] for r in out.collect()}


def test_asof_backward_inclusive_and_outer(events):
    right = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
    out = T.asof_join(events, right, "user_id", "ts", "pts", tiebreak="pid")
    got = _asof_pairs(out)
    # user1: purchase@100 matches events at 100 (itself, inclusive) and 5000
    # user2: purchase@60 matches 60 and 61; user3: never
    assert got == {1: None, 2: 2, 3: 2, 4: None, 5: 5, 6: 5, 7: None}
    assert set(out.columns) == set(events.columns) | {"r_pts", "r_pid"}


def test_asof_tolerance_nulls_stale_match(events):
    right = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
    out = T.asof_join(events, right, "user_id", "ts", "pts",
                      tiebreak="pid", tolerance_s=1000)
    got = _asof_pairs(out)
    assert got[3] is None  # 4900s old > 1000s tolerance
    assert got[2] == 2 and got[6] == 5


def test_asof_forward(events):
    right = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
    out = T.asof_join(events, right, "user_id", "ts", "pts",
                      direction="forward", tiebreak="pid")
    got = _asof_pairs(out)
    # nearest purchase at-or-after: user1 events 1,2 -> purchase@100; 3 -> none
    assert got == {1: 2, 2: 2, 3: None, 4: 5, 5: 5, 6: None, 7: None}


def test_asof_tiebreak_on_duplicate_ts(spark):
    """Two right rows at the identical (key, ts): backward picks the
    greatest tiebreak, forward the least."""
    left = spark.createDataFrame([(1, _ts(10), 100)],
                                 "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        [(1, _ts(5), 7), (1, _ts(5), 9)], "k long, rts timestamp, rid long")
    back = T.asof_join(left, right, "k", "ts", "rts", tiebreak="rid")
    assert back.collect()[0]["r_rid"] == 9
    fwd_left = spark.createDataFrame([(1, _ts(1), 100)],
                                     "k long, ts timestamp, lid long")
    fwd = T.asof_join(fwd_left, right, "k", "ts", "rts",
                      direction="forward", tiebreak="rid")
    assert fwd.collect()[0]["r_rid"] == 7


def test_asof_partitioning_invariance(events, spark):
    right = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
    a = _asof_pairs(T.asof_join(events.repartition(1), right.repartition(1),
                                "user_id", "ts", "pts", tiebreak="pid"))
    b = _asof_pairs(T.asof_join(events.repartition(7), right.repartition(3),
                                "user_id", "ts", "pts", tiebreak="pid"))
    assert a == b


def test_asof_single_exchange_plan(events):
    """The union-sort-window technique shuffles the unioned stream ONCE on
    the key — no range product, no per-side join Exchange."""
    right = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
    out = T.asof_join(events, right, "user_id", "ts", "pts", tiebreak="pid")
    n, plan = _n_exchanges(out)
    assert n == 1, plan
    assert "Join" not in plan.split("== Initial Plan ==")[0], plan


def test_bigram_backoff_hand_computed(spark):
    """Model = docs {0: 'a b c a b', 2: 'q'}; score all docs.
    uni: a2 b2 c1 q1 -> N=6 V=4 denom=11; bigrams: ab:2 bc:1 ca:1."""
    docs = spark.createDataFrame(
        [(0, "a b c a b"), (1, "a b x"), (2, "q"), (3, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in TS.bigram_backoff_score(
        docs, model_df=docs.where("doc_id % 2 = 0")).collect()}
    # doc0: ab,bc,ca,ab -> ln(2/2), ln(1/2), ln(1/1), ln(2/2)
    assert out[0]["n_bigrams"] == 4
    assert out[0]["mean_score"] == pytest.approx(math.log(0.5) / 4)
    # doc1: ab -> ln(1); bx unseen -> ln(0.4) + ln((0+1)/11)
    assert out[1]["n_bigrams"] == 2
    assert out[1]["mean_score"] == pytest.approx(
        (math.log(0.4) + math.log(1 / 11)) / 2)
    # <2-token and null docs surface with 0 bigrams, null score
    assert out[2]["n_bigrams"] == 0 and out[2]["mean_score"] is None
    assert out[3]["n_bigrams"] == 0 and out[3]["mean_score"] is None


def test_bigram_backoff_self_model_never_backs_off(spark):
    """Scoring the model corpus against itself: every bigram has count>=1,
    so every score is the ML leg (finite, and >= ln(1/N))."""
    docs = spark.createDataFrame(
        [(i, f"t{i} t{(i * 7) % 5} t{(i * 3) % 5}") for i in range(10)],
        "doc_id long, text string")
    out = TS.bigram_backoff_score(docs).collect()
    assert all(r["mean_score"] is not None for r in out)
    assert all(r["mean_score"] <= 0.0 for r in out)


def _random_streams(spark, seed, n_left=120, n_right=40, n_keys=3):
    """Hot-key layout: most rows land on key 0."""
    import random
    rng = random.Random(seed)
    lrows, rrows = [], []
    for i in range(n_left):
        k = 0 if rng.random() < 0.7 else rng.randrange(n_keys)
        lrows.append((k, _ts(rng.randrange(0, 50_000)), i))
    for j in range(n_right):
        k = 0 if rng.random() < 0.7 else rng.randrange(n_keys)
        rrows.append((k, _ts(rng.randrange(0, 50_000)), 1000 + j))
    left = spark.createDataFrame(lrows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(rrows, "k long, rts timestamp, rid long")
    return left, right


@pytest.mark.parametrize("direction,tol,bucket_s", [
    ("backward", None, 3600.0),
    ("backward", 7200.0, 900.0),
    ("forward", None, 600.0),
    ("forward", 5000.0, 10_000.0),
])
def test_asof_bucketed_equals_plain(spark, direction, tol, bucket_s):
    left, right = _random_streams(spark, seed=hash((direction, bucket_s)) % 997)
    kw = dict(direction=direction, tolerance_s=tol, tiebreak="rid")
    plain = {r["lid"]: r["r_rid"] for r in T.asof_join(
        left, right, "k", "ts", "rts", **kw).collect()}
    bucketed = {r["lid"]: r["r_rid"] for r in T.asof_join_bucketed(
        left, right, "k", "ts", "rts", bucket_s=bucket_s, **kw).collect()}
    assert plain == bucketed


def test_asof_bucketed_duplicate_ts_tiebreak(spark):
    left = spark.createDataFrame([(1, _ts(10), 100)],
                                 "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        [(1, _ts(5), 7), (1, _ts(5), 9)], "k long, rts timestamp, rid long")
    out = T.asof_join_bucketed(left, right, "k", "ts", "rts",
                               bucket_s=2.0, tiebreak="rid")
    assert out.collect()[0]["r_rid"] == 9


def test_asof_bucketed_cross_bucket_carry(spark):
    """Right row many buckets earlier must still reach the left row."""
    left = spark.createDataFrame([(1, _ts(100_000), 1)],
                                 "k long, ts timestamp, lid long")
    right = spark.createDataFrame([(1, _ts(3), 42)],
                                  "k long, rts timestamp, rid long")
    out = T.asof_join_bucketed(left, right, "k", "ts", "rts", bucket_s=10.0,
                               tiebreak="rid")
    assert out.collect()[0]["r_rid"] == 42


def test_asof_bucketed_window_partitioned_by_bucket(spark):
    """The final window must partition on (key, bucket), not key alone —
    that is the whole point of the variant."""
    left, right = _random_streams(spark, seed=4)
    out = T.asof_join_bucketed(left, right, "k", "ts", "rts",
                               bucket_s=60.0, tiebreak="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    wins = re.findall(r"windowspecdefinition\(k#\d+L, __b#\d+L", plan)
    assert wins, plan
