"""Text analysis operators (SURVEY.md §2.11): language-ID, quality
scoring, token counting, document fingerprinting.

All pure Column expressions over the `documents` table — tokenize
once, derive everything from the token array. No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from climate_data_pipelines_spark.functions.text import (
    WORD_RE,
    normalize_text,
    regex_tokens,
    tokens,
)

# Function-word profiles for the n-gram/keyword language heuristic.
# Deterministic and intentionally tiny: real corpora would use
# character n-gram profiles; the fixture's text is synthetic word soup
# (FIXTURES.md) so the heuristic demonstrates the plan shape, and the
# DuckDB oracle reproduces the exact same rule.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "fast"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "la", "les", "et"),
    "zh": ("zh", "ni", "hao", "ma"),
}

STOPWORDS = ("the", "a", "an", "of", "to", "and")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens + regex word tokens + chars
    (SURVEY.md §2.11 'token counting'). All O(len) expressions."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens_ws"),
        F.size(regex_tokens(text_col, WORD_RE)).alias("n_tokens_re"),
        F.size(F.array_distinct(toks)).alias("n_tokens_distinct"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality scoring: length / mean word length / stopword ratio /
    distinct-token ratio (SURVEY.md §2.11 'quality scoring').

    The composite is a monotone combination of the classic Gopher-ish
    filters; thresholds are illustrative. Rounded for oracle parity.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    mean_wl = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    ) / n.cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    stop_ratio = n_stop.cast("double") / n.cast("double")
    p = F.lit(1e6)
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        (F.round(mean_wl * p, 0) / p).alias("mean_word_len"),
        (F.round(stop_ratio * p, 0) / p).alias("stopword_ratio"),
        (F.round(distinct_ratio * p, 0) / p).alias("distinct_ratio"),
        (
            (n >= 10)
            & (mean_wl >= 2.0)
            & (mean_wl <= 12.0)
            & (distinct_ratio >= 0.1)
        ).alias("passes_quality"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Language-ID heuristic: marker-word hit counts per language,
    argmax with deterministic tie-break on language code
    (SURVEY.md §2.11 'language-ID (n-gram heuristic)').

    Plan: one tokenize, one score expression per language, greatest()
    + chained when() — no explode, no shuffle at all (narrow map).
    """
    toks = tokens(text_col)
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = F.greatest(*scores.values())
    pred = F.lit(None).cast("string")
    # first lang (alphabetical) achieving the max wins — deterministic
    for lang in sorted(scores, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    out = df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(scores)],
        pred.alias("pred_lang"),
    )
    return out


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprinting: md5 of the normalized text plus a
    coarse 8-hex-prefix shard key (SURVEY.md §2.11 'document
    fingerprinting (rolling hash)'). The shard key is what a 100 TB
    dedup partitions on."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return df.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("shard_key"),
    )


def word_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word count: explode tokens → groupBy word (SURVEY.md Q39).
    Map-side partial aggregation keeps the shuffle at vocab size."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
