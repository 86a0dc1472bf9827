"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All pure Catalyst column expressions (JVM-side, whole-stage codegen) — no
Python in the hot path. Each function takes/returns DataFrames so the ops
compose with the rest of the engine, and each has an exact SQL oracle
(__spark_entry__.oracle_sql) because the heuristics are deterministic
closed-form rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword lexicons for the n-gram/stopword language
# heuristic; ASCII-only so Spark and the SQL oracle tokenize identically
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "a"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "est", "une"],
    "es": ["el", "la", "que", "de", "es", "una"],
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization of lowercased text; empty string -> []."""
    t = F.lower(F.trim(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens_col(F.col(text_col))))


def bpe_ish_token_count(
    df: DataFrame, text_col: str = "text", out: str = "n_subtokens"
) -> DataFrame:
    """BPE-ish token estimate: count regex word pieces + non-space punct.
    Closed form (regexp_count), no tokenizer dependency."""
    c = F.col(text_col)
    words = F.regexp_count(c, F.lit(r"[A-Za-z0-9]{1,4}"))
    punct = F.regexp_count(c, F.lit(r"[^\sA-Za-z0-9]"))
    return df.withColumn(out, (words + punct).cast("int"))


def _marker_hits(text: Column, words: list[str]) -> Column:
    """Occurrences of marker words (word-boundary matches) in lowered text."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    h = F.lit(0).cast("long")
    for w in words:
        h = h + F.regexp_count(padded, F.lit(rf"\b{w}\b"))
    return h


def language_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-marker language ID: argmax of marker hits; tie/zero -> 'und'.

    Deterministic tie-break by language code order (en < de < fr < es walk
    order fixed below) so the SQL oracle can replicate exactly.
    """
    text = F.col(text_col)
    hit_cols = {lang: _marker_hits(text, ws) for lang, ws in _LANG_MARKERS.items()}
    best_lang = F.lit("und")
    best_hits = F.lit(0).cast("long")
    # fixed walk order; strict > means earlier langs win ties
    for lang in ("en", "de", "fr", "es"):
        h = hit_cols[lang]
        is_better = h > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, h).otherwise(best_hits)
    return df.withColumn(out, best_lang)


def quality_score(df: DataFrame, text_col: str = "text", out: str = "quality") -> DataFrame:
    """Document quality in [0,1]: blend of length band, punctuation ratio,
    stopword ratio, mean word length — rounded to 6dp for cross-engine
    comparison."""
    c = F.col(text_col)
    n_chars = F.length(c).cast("double")
    toks = tokens_col(c)
    n_tokens = F.size(toks).cast("double")
    n_punct = F.regexp_count(c, F.lit(r"[^\sA-Za-z0-9]")).cast("double")
    stop_hits = _marker_hits(c, _LANG_MARKERS["en"]).cast("double")
    len_band = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, F.least(stop_hits / n_tokens * 5.0, F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    mean_wordlen = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    wordlen_ok = F.when((mean_wordlen >= 3) & (mean_wordlen <= 10), F.lit(1.0)).otherwise(
        F.lit(0.3)
    )
    score = (
        F.lit(0.35) * len_band
        + F.lit(0.25) * stop_ratio
        + F.lit(0.25) * wordlen_ok
        + F.lit(0.15) * (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0)))
    )
    return df.withColumn(out, F.round(score, 6))


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.
    (The rolling-hash variant for near-dup windows lives in dedup.simhash.)"""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))
