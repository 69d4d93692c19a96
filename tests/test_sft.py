"""SFT/preference training-example construction over transcripts
(operators/sft.py: sft_examples, preference_pairs, boilerplate_turns,
remove_boilerplate, context_budget)."""

import datetime

from pyspark.sql import functions as F

from ckg_spark.operators import sft as S

_TS = datetime.datetime(2025, 1, 1)


def _conv(spark, turns):
    """turns: list of (conv_id, turn_idx, role, text)."""
    rows = [(c, i, r, t, None, _TS + datetime.timedelta(minutes=i))
            for (c, i, r, t) in turns]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")


def test_sft_examples_prompt_rendering(spark):
    t = _conv(spark, [
        ("c1", 0, "user", "hello there"),
        ("c1", 1, "assistant", "hi how can I help"),
        ("c1", 2, "user", "fix my query"),
        ("c1", 3, "assistant", "done"),
    ])
    out = {r["turn_idx"]: r for r in S.sft_examples(t).collect()}
    assert set(out) == {1, 3}
    assert out[1]["prompt"] == "user: hello there"
    assert out[1]["completion"] == "hi how can I help"
    assert out[1]["n_context_turns"] == 1
    assert out[1]["prompt_tokens"] == 3  # 'user:' 'hello' 'there'
    assert out[1]["completion_tokens"] == 5
    assert out[3]["prompt"] == ("user: hello there\nassistant: hi how can I "
                                "help\nuser: fix my query")
    assert out[3]["n_context_turns"] == 3


def test_sft_examples_context_cap_and_cold_open(spark):
    t = _conv(spark, [("c1", i, "assistant" if i % 2 else "user", f"t{i}")
                      for i in range(10)] +
                     [("c2", 0, "assistant", "cold open")])
    out = {(r["conv_id"], r["turn_idx"]): r
           for r in S.sft_examples(t, max_context_turns=2).collect()}
    # capped window keeps only the 2 immediately preceding turns
    r9 = out[("c1", 9)]
    assert r9["n_context_turns"] == 2
    assert r9["prompt"] == "assistant: t7\nuser: t8"
    # cold-open assistant turn: kept, empty prompt, zero tokens
    r0 = out[("c2", 0)]
    assert r0["n_context_turns"] == 0
    assert r0["prompt"] == "" and r0["prompt_tokens"] == 0


def test_preference_pairs_tiebreak_and_margin(spark):
    t = _conv(spark, [
        ("c1", 1, "assistant", "aaaa"),     # score 4
        ("c1", 3, "assistant", "bb"),       # score 2
        ("c1", 5, "assistant", "cccc"),     # score 4 (tie with turn 1)
        ("c2", 1, "assistant", "same"),     # single assistant turn: no pair
        ("c3", 1, "assistant", "xx"),       # equal scores: margin 0 -> dropped
        ("c3", 3, "assistant", "yy"),
    ])
    out = {r["conv_id"]: r for r in
           S.preference_pairs(t, F.length("text").cast("long")).collect()}
    assert set(out) == {"c1"}
    # chosen: highest score, tie -> LOWEST turn_idx (turn 1, not 5)
    assert out["c1"]["chosen_turn_idx"] == 1
    assert out["c1"]["rejected_turn_idx"] == 3
    assert out["c1"]["margin"] == 2


def test_boilerplate_detection_and_removal(spark):
    t = _conv(spark, [
        ("c1", 0, "assistant", "Thanks  for contacting support!"),
        ("c2", 0, "assistant", "thanks for CONTACTING support!"),
        ("c3", 0, "assistant", "thanks for contacting support!"),
        ("c1", 1, "assistant", "unique answer one"),
        ("c1", 2, "user", ""),
        ("c2", 1, "assistant", "unique answer one"),  # same conv count 2
    ])
    bp = S.boilerplate_turns(t, min_convs=3)
    rows = bp.collect()
    assert len(rows) == 1
    assert rows[0]["text_norm"] == "thanks for contacting support!"
    assert rows[0]["n_convs"] == 3 and rows[0]["n_turns"] == 3
    cleaned = S.remove_boilerplate(t, bp)
    assert cleaned.count() == 3  # the 3 boilerplate turns dropped
    assert cleaned.where(
        F.lower("text").contains("contacting")).count() == 0
    # schema preserved
    assert cleaned.columns == t.columns


def test_context_budget_whole_turn_truncation(spark):
    # turns of 4, 3, 2 tokens (newest last); budget 5 keeps the last two
    # turns (2+3=5 fits), drops the first (would make 9)
    t = _conv(spark, [
        ("c1", 0, "user", "a b c d"),
        ("c1", 1, "assistant", "e f g"),
        ("c1", 2, "user", "h i"),
        ("c2", 0, "user", ""),
    ])
    out = {r["conv_id"]: r for r in S.context_budget(t, 5).collect()}
    assert out["c1"]["n_turns"] == 3
    assert out["c1"]["total_tokens"] == 9
    assert out["c1"]["kept_turns"] == 2
    assert out["c1"]["kept_tokens"] == 5
    assert out["c1"]["dropped_tokens"] == 4
    # empty-text conversation: zero everywhere, still present
    assert out["c2"]["total_tokens"] == 0 and out["c2"]["kept_turns"] == 1


def test_sft_repartition_invariance(spark):
    t = _conv(spark, [("c%d" % (i % 7), i // 7,
                       "assistant" if i % 2 else "user", f"w{i} x{i}")
                      for i in range(70)])
    a = sorted(map(tuple, S.sft_examples(t, max_context_turns=3)
                   .collect()))
    b = sorted(map(tuple, S.sft_examples(t.repartition(13),
                                         max_context_turns=3).collect()))
    assert a == b


def test_validate_conversations_flags(spark):
    rows = [
        # valid conversation
        ("c1", 0, "user", "hi"), ("c1", 1, "assistant", "hello"),
        ("c1", 2, "tool", "{}"),
        # starts with assistant, has a gap, repeated role, empty text
        ("c2", 1, "assistant", "x"), ("c2", 2, "assistant", " "),
        ("c2", 4, "tool", "r"),
        # orphan tool turn after user
        ("c3", 0, "user", "q"), ("c3", 1, "tool", "r"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    from ckg_spark.operators.sft import validate_conversations
    got = {r["conv_id"]: r.asDict() for r in
           validate_conversations(df).collect()}
    assert got["c1"]["is_valid"] == 1
    c2 = got["c2"]
    assert (c2["starts_with_user"], c2["repeated_role_runs"],
            c2["idx_gaps"], c2["empty_turns"], c2["is_valid"]) == (0, 1, 1, 1, 0)
    c3 = got["c3"]
    assert c3["orphan_tool_turns"] == 1 and c3["is_valid"] == 0


def test_recency_weighted_scores_exact(spark):
    import math
    from ckg_spark.operators.temporal import recency_weighted_scores
    df = spark.createDataFrame(
        [("e1", "2025-01-01 00:00:00"), ("e1", "2025-01-01 01:00:00"),
         ("e2", "2025-01-01 01:00:00")],
        "ident string, ts_s string").selectExpr(
            "ident", "to_timestamp(ts_s) AS ts")
    out = {r["ident"]: r.asDict() for r in recency_weighted_scores(
        df, "ident", "ts", "2025-01-01 02:00:00",
        half_life_seconds=3600.0).collect()}
    # ages 2h and 1h at half-life 1h: 0.25 + 0.5
    assert abs(out["e1"]["recency_score"] - 0.75) < 1e-12
    assert out["e1"]["n_events"] == 2
    assert str(out["e1"]["first_seen"]) == "2025-01-01 00:00:00"
    assert abs(out["e2"]["recency_score"] - 0.5) < 1e-12
