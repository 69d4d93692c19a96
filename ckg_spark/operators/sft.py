"""Training-example construction over agent/conversation transcripts.

The ops a fine-tuning data pipeline runs BETWEEN transcript curation and
sequence packing: flatten multi-turn conversations into (prompt,
completion) SFT examples, pair assistant turns into DPO-style preference
pairs, detect template/boilerplate turns repeated across conversations,
and budget context-window truncation loss per conversation.

Reference parity: CKG has no training-export layer — its analogous surface
is the per-document "analytics over grouped rows" family
(src/analytics_core/analytics/analytics.py) re-scoped by the graft to the
BASELINE.json input_hint transcript schema (conv_id, turn_idx, role, text,
tool, ts). Everything here is whole-stage-codegen JVM: one shuffle on
conv_id (the window partition key), no Python on any path.

Scale notes (10^12 turns):
- All four ops partition by conv_id; skew is bounded by the longest
  single conversation, not by corpus size.
- ``sft_examples`` is the only op with super-linear OUTPUT: emitting the
  full rendered context per assistant turn duplicates each turn
  O(conv_len) times. ``max_context_turns`` bounds that blowup to
  O(conv_len * cap) — at trillion-turn scale you always set a cap (it
  is also what the model's context window enforces anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

DEFAULT_SEP = "\n"


def _turn_render(role_col: str = "role", text_col: str = "text") -> Column:
    """One turn rendered as ``role: text`` — the chat-template rendition."""
    return F.concat(F.col(role_col), F.lit(": "), F.col(text_col))


def _token_count(c: Column) -> Column:
    """House whitespace token count (textstats.token_count): null/empty
    text counts 0, never NULL — a NULL here would poison whole-conversation
    sums in context_budget."""
    from .textstats import token_count
    return token_count(c)


def sft_examples(transcripts: DataFrame, *,
                 assistant_role: str = "assistant",
                 max_context_turns: int | None = None,
                 sep: str = DEFAULT_SEP) -> DataFrame:
    """Flatten a multi-turn transcript table into supervised fine-tuning
    examples: one row per ``assistant_role`` turn, with

    - ``prompt``: every prior turn of the conversation (or the last
      ``max_context_turns`` of them) rendered ``role: text`` and joined
      by ``sep``, in turn order;
    - ``completion``: the assistant turn's text;
    - ``n_context_turns`` / ``prompt_tokens`` / ``completion_tokens``:
      the loss-mask boundary stats a packer needs (context tokens are
      masked, completion tokens are learned).

    Token counts are whitespace tokens (the house convention shared with
    packing/sequence_stats). One shuffle: the per-conversation window.
    Assistant turns with an empty context (turn_idx 0) are kept with an
    empty prompt — dropping cold-open completions is the caller's policy.
    """
    lo = -max_context_turns if max_context_turns is not None else Window.unboundedPreceding
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(lo, -1))
    ctx = F.collect_list(_turn_render()).over(w)
    toks = _token_count
    out = (transcripts
           .withColumn("_ctx", ctx)
           .where(F.col("role") == assistant_role)
           .select(
               "conv_id", "turn_idx",
               F.size("_ctx").alias("n_context_turns"),
               F.array_join("_ctx", sep).alias("prompt"),
               F.col("text").alias("completion")))
    return out.select(
        "conv_id", "turn_idx", "n_context_turns", "prompt", "completion",
        toks(F.col("prompt")).alias("prompt_tokens"),
        toks(F.col("completion")).alias("completion_tokens"))


def preference_pairs(transcripts: DataFrame, score: Column, *,
                     assistant_role: str = "assistant",
                     min_margin: float = 0.0) -> DataFrame:
    """DPO-style preference-pair construction: per conversation, among
    the ``assistant_role`` turns, chosen = highest ``score`` (ties ->
    lowest turn_idx), rejected = lowest ``score`` (ties -> highest
    turn_idx), emitted only when chosen and rejected are different turns
    and the margin exceeds ``min_margin``.

    ``score`` is any Column over the transcript row (a quality heuristic,
    a learned classifier's log-odds, a reward-model output joined in
    upstream). The opposed tie-breaks make the pair deterministic AND
    guarantee chosen != rejected whenever >= 2 assistant turns exist.

    ONE algebraic aggregation: chosen = max_by, rejected = min_by on the
    (score, -turn_idx) key — the key is unique per conversation (turn_idx
    is), so both are deterministic, and map-side partials reduce each
    conversation to one row per map partition BEFORE the single conv_id
    shuffle (a 10^6-turn conversation never travels; the earlier
    two-window + self-join form shuffled the full turn stream twice).
    """
    a = (transcripts.where(F.col("role") == assistant_role)
         .select("conv_id", "turn_idx", score.alias("s")))
    # maximize/minimize (s, -turn_idx): high score ties -> lowest turn_idx,
    # low score ties -> highest turn_idx
    key = F.struct(F.col("s"), (-F.col("turn_idx")).alias("_nti"))
    val = F.struct("turn_idx", "s")
    agg = a.groupBy("conv_id").agg(
        F.max_by(val, key).alias("_ch"),
        F.min_by(val, key).alias("_rj"))
    return (agg.select(
        "conv_id",
        F.col("_ch.turn_idx").alias("chosen_turn_idx"),
        F.col("_ch.s").alias("chosen_score"),
        F.col("_rj.turn_idx").alias("rejected_turn_idx"),
        F.col("_rj.s").alias("rejected_score"),
        (F.col("_ch.s") - F.col("_rj.s")).alias("margin"))
        .where(F.col("chosen_turn_idx") != F.col("rejected_turn_idx"))
        .where(F.col("margin") > min_margin))


def boilerplate_turns(transcripts: DataFrame, *, min_convs: int = 2,
                      role: str | None = None) -> DataFrame:
    """Template/boilerplate detection: normalized turn texts that recur
    in >= ``min_convs`` DISTINCT conversations ("Thanks for contacting
    support!", canned tool headers, ...). Normalization is
    lower + whitespace-collapse — byte-identical across engines.

    Output: (text_norm, n_convs, n_turns), the removal dictionary
    ``remove_boilerplate`` consumes. One map-side-combined groupBy on the
    normalized text; at corpus scale the distinct-text table is the
    shuffle, and true boilerplate is by definition low-cardinality.
    """
    t = transcripts if role is None else transcripts.where(F.col("role") == role)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (t.select(norm.alias("text_norm"), "conv_id")
            .where(F.length("text_norm") > 0)
            .groupBy("text_norm")
            .agg(F.countDistinct("conv_id").alias("n_convs"),
                 F.count(F.lit(1)).alias("n_turns"))
            .where(F.col("n_convs") >= min_convs))


def remove_boilerplate(transcripts: DataFrame, boilerplate: DataFrame
                       ) -> DataFrame:
    """Drop turns whose normalized text is in the boilerplate dictionary.
    Broadcast left-anti join — the dictionary is low-cardinality by
    construction, so the corpus never shuffles."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (transcripts.withColumn("_tn", norm)
            .join(F.broadcast(boilerplate.select(
                F.col("text_norm").alias("_tn"))),
                on="_tn", how="left_anti")
            .drop("_tn"))


def context_budget(transcripts: DataFrame, budget_tokens: int) -> DataFrame:
    """Context-window truncation budget, per conversation: if the
    conversation were truncated to its LAST ``budget_tokens`` whitespace
    tokens at TURN granularity (whole most-recent turns kept while they
    fit, the first partially-fitting turn dropped — standard chat
    truncation), how much survives?

    Output per conv_id: n_turns, total_tokens, kept_turns, kept_tokens,
    dropped_tokens. A turn counts as kept iff the suffix token sum up to
    and including it is <= budget. One shuffle (conv_id window, reverse
    cumulative sum), all integer arithmetic — exact across engines.
    """
    toks = _token_count(F.col("text")).cast("long")
    w_suf = (Window.partitionBy("conv_id").orderBy(F.col("turn_idx").desc())
             .rowsBetween(Window.unboundedPreceding, 0))
    t = (transcripts.select("conv_id", "turn_idx", toks.alias("nt"))
         .withColumn("suffix_toks", F.sum("nt").over(w_suf)))
    keep = (F.col("suffix_toks") <= budget_tokens).cast("long")
    return (t.groupBy("conv_id")
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.sum("nt").alias("total_tokens"),
                 F.sum(keep).alias("kept_turns"),
                 F.sum(F.col("nt") * keep).alias("kept_tokens"),
                 (F.sum("nt") - F.sum(F.col("nt") * keep))
                 .alias("dropped_tokens")))


def validate_conversations(transcripts: DataFrame) -> DataFrame:
    """Structural QA per conversation — the gate a transcript corpus
    passes before any training export:

    - ``starts_with_user``: first turn (by turn_idx) has role 'user';
    - ``repeated_role_runs``: adjacent turns with the SAME role (a run of
      k same-role turns counts k-1);
    - ``orphan_tool_turns``: 'tool' turns not preceded by an assistant or
      tool turn (a tool result must follow a call);
    - ``idx_gaps``: adjacent turn_idx deltas != 1 (lost turns);
    - ``empty_turns``: whitespace-only texts;
    - ``is_valid``: all of the above clean.

    One conv_id window (lag role/idx) + one aggregation that reuses the
    window's partitioning — single shuffle, all JVM expressions.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_role = F.lag("role").over(w)
    prev_idx = F.lag("turn_idx").over(w)
    t = transcripts.select(
        "conv_id", "turn_idx", "role", "text",
        prev_role.alias("_pr"), prev_idx.alias("_pi"))
    first_user = F.max(F.when(
        F.col("_pi").isNull(), (F.col("role") == "user").cast("int")))
    # when/otherwise (not bool casts): a NULL lag must count 0, not
    # propagate NULL through the whole-group sum on 1-turn conversations
    rep = F.sum(F.when(F.col("role") == F.col("_pr"), 1).otherwise(0))
    orphan = F.sum(F.when((F.col("role") == "tool")
                          & F.col("_pr").isNotNull()
                          & ~F.col("_pr").isin("assistant", "tool"),
                          1).otherwise(0))
    gaps = F.sum(F.when(F.col("_pi").isNotNull()
                        & (F.col("turn_idx") - F.col("_pi") != 1),
                        1).otherwise(0))
    empty = F.sum(F.when(F.length(F.trim("text")) == 0, 1).otherwise(0))
    out = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.coalesce(first_user, F.lit(0)).cast("int").alias("starts_with_user"),
        rep.cast("int").alias("repeated_role_runs"),
        orphan.cast("int").alias("orphan_tool_turns"),
        gaps.cast("int").alias("idx_gaps"),
        empty.cast("int").alias("empty_turns"))
    return out.withColumn(
        "is_valid",
        ((F.col("starts_with_user") == 1) & (F.col("repeated_role_runs") == 0)
         & (F.col("orphan_tool_turns") == 0) & (F.col("idx_gaps") == 0)
         & (F.col("empty_turns") == 0)).cast("int"))
