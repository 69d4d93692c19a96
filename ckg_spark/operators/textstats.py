"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure JVM expressions (pyspark.sql.functions) —
no Python on any path; each is a column factory so it composes into any
select/groupBy.

These back the training-data-pipeline surface; the reference analogs are its
string-normalization ETL patterns (SURVEY.md P7/P8) and the quality cutoffs
its parsers apply (score >= cutoff filters, stringParser.py:51).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword lists for the n-gram/stopword language heuristic
# (space-tokenized scripts only; CJK/Cyrillic/Arabic go via script ranges —
# a pinyin stopword list can never match real Chinese text)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "por"],
    "de": ["der", "die", "und", "das", "nicht", "von", "mit", "ist", "des", "ein"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "que", "pour", "qui"],
}

# Unicode-block character classes for non-space-tokenized scripts; ratio of
# matching chars over non-space chars is the detector (pure JVM regexp).
# Kana is checked before the Han range so Japanese (which mixes kanji) wins
# over zh whenever kana is present.
LANG_SCRIPTS: dict[str, str] = {
    "ja": "[\\u3040-\\u30ff]",          # hiragana + katakana
    "ko": "[\\uac00-\\ud7af]",          # hangul syllables
    "zh": "[\\u4e00-\\u9fff]",          # CJK unified ideographs
    "ru": "[\\u0400-\\u04ff]",          # cyrillic
    "ar": "[\\u0600-\\u06ff]",          # arabic
}


def tokens(col: Column) -> Column:
    """Whitespace tokens of lowercased text (empty array for empty/null)."""
    t = F.split(F.trim(F.lower(F.coalesce(col, F.lit("")))), r"\s+")
    return F.filter(t, lambda x: x != "")


def token_count(col: Column) -> Column:
    """Whitespace token count (SURVEY 'token counting')."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: count of maximal runs of word chars / digits /
    punctuation (a cheap, deterministic stand-in for a real tokenizer)."""
    pattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
    return F.size(
        F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(pattern), F.lit(0))
    )


def char_len(col: Column) -> Column:
    return F.length(F.coalesce(col, F.lit("")))


def punct_ratio(col: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    c = F.coalesce(col, F.lit(""))
    stripped = F.regexp_replace(c, r"[^a-zA-Z0-9\s]", "")
    return F.when(F.length(c) > 0,
                  (F.length(c) - F.length(stripped)) / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens(col)
    stops = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    vocabulary diversity. Deterministic; thresholds from common web-pipeline
    practice (length >= 20 tokens, punct <= 20%, distinct-token ratio)."""
    n = token_count(col)
    distinct_ratio = F.when(
        n > 0, F.size(F.array_distinct(tokens(col))) / n
    ).otherwise(F.lit(0.0))
    len_score = F.least(n / F.lit(20.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    return F.round((len_score + punct_score + distinct_ratio) / 3.0, 6)


def script_ratio(col: Column, lang: str) -> Column:
    """Fraction of non-space characters in ``lang``'s Unicode block."""
    c = F.regexp_replace(F.coalesce(col, F.lit("")), r"\s", "")
    kept = F.regexp_replace(c, f"(?!{LANG_SCRIPTS[lang]}).", "")
    return F.when(F.length(c) > 0, F.length(kept) / F.length(c)).otherwise(F.lit(0.0))


def lang_scores(col: Column) -> Column:
    """Map lang -> detector score: stopword-hit ratio for space-tokenized
    languages, Unicode-script char ratio for zh/ja/ko/ru/ar."""
    langs = sorted(LANG_STOPWORDS) + list(LANG_SCRIPTS)
    scores = ([stopword_ratio(col, c) for c in sorted(LANG_STOPWORDS)]
              + [script_ratio(col, c) for c in LANG_SCRIPTS])
    return F.map_from_arrays(F.array(*[F.lit(c) for c in langs]), F.array(*scores))


def lang_best(col: Column) -> Column:
    """argmax language; 'und' when nothing matches.

    Script-range detectors win whenever a script ratio clears 0.15 (their
    scores approach 1.0 on native text, while stopword ratios top out around
    0.3-0.5, so mixed documents resolve to the dominant script). Japanese
    mixes kanji (the Han block) with kana, so ANY meaningful kana presence
    (> 0.05) decides ja before the generic argmax — Chinese contains no
    kana. Deterministic: pure column arithmetic, tie-break by score then
    language code.
    """
    ja_override = F.when(script_ratio(col, "ja") > 0.05, F.lit("ja"))
    script_pairs = F.array(
        *[
            F.struct(script_ratio(col, c).alias("score"), F.lit(c).alias("lang"))
            for c in sorted(LANG_SCRIPTS)
        ]
    )
    script_best = F.array_max(F.filter(script_pairs, lambda p: p["score"] > 0.15))
    stop_pairs = F.array(
        *[
            F.struct(stopword_ratio(col, c).alias("score"), F.lit(c).alias("lang"))
            for c in sorted(LANG_STOPWORDS)
        ]
    )
    stop_best = F.array_max(F.filter(stop_pairs, lambda p: p["score"] > 0))
    return F.coalesce(ja_override, script_best["lang"], stop_best["lang"],
                      F.lit("und"))


def doc_fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, collapsed whitespace/punctuation) — the exact-dedup key."""
    norm = F.trim(F.regexp_replace(F.lower(F.coalesce(col, F.lit(""))), r"[^a-z0-9]+", " "))
    return F.md5(norm)


def rolling_fingerprint(col: Column, window: int = 8) -> Column:
    """Winnowing-style content fingerprint: min xxhash64 over token
    ``window``-grams — robust to small edits, JVM fold only."""
    toks = tokens(col)
    # build n-grams from the tokens array and take the min hash
    return F.when(
        F.size(toks) >= window,
        F.array_min(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - window + 1),
                lambda i: F.xxhash64(F.array_join(F.slice(toks, i, window), " ")),
            )
        ),
    ).otherwise(F.xxhash64(F.array_join(toks, " ")))


def document_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document stat block."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        char_len(c).alias("n_chars_calc"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        lang_best(c).alias("lang_guess"),
        doc_fingerprint(c).alias("fingerprint"),
    )
