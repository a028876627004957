"""Text analysis for web-scale corpora: token stats, quality scoring,
language ID, fingerprinting.  Everything is pure Spark Column expressions
(JVM whole-stage codegen) — these run map-only over 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic lang-id
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans"],
    "es": ["el", "la", "los", "que", "y", "es", "una", "por", "con"],
    "pt": ["o", "a", "os", "que", "e", "um", "uma", "para", "com"],
}


def tokens_col(text_col):
    """Whitespace tokenization (split on runs of whitespace)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), r"\s+")


def token_count(text_col):
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)) \
        .otherwise(F.size(tokens_col(c))).cast("long")


def word_token_count(text_name: str):
    """BPE-ish token estimate: count of word/number/punct chunks.
    Takes a plain column NAME (uses expr-level regexp_extract_all)."""
    return F.size(F.expr(
        f"regexp_extract_all({text_name}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)"
    )).cast("long")


def punct_ratio(text_col):
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return (punct / F.greatest(F.length(c), F.lit(1))).cast("double")


def digit_ratio(text_col):
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    digits = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return (digits / F.greatest(F.length(c), F.lit(1))).cast("double")


def mean_word_length(text_col):
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens_col(c)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return (total / F.greatest(F.size(toks), F.lit(1))).cast("double")


def stopword_ratio(text_col, lang: str = "en"):
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.transform(tokens_col(c), lambda t: F.lower(F.regexp_replace(t, r"[^\w]", "")))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return (hits / F.greatest(F.size(toks), F.lit(1))).cast("double")


def lang_id(text_col):
    """Argmax of stopword hits across the 5 languages; 'und' when no hits."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.transform(tokens_col(c), lambda t: F.lower(F.regexp_replace(t, r"[^\w]", "")))
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(F.struct(
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits"),
            F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text_col):
    """Composite [0,1] quality heuristic: length band + low punct/digit noise
    + sane mean word length. Deterministic, pure Column."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.length(c)
    len_ok = F.when((n >= 20) & (n <= 20000), F.lit(1.0)).otherwise(
        F.when(n < 20, n / F.lit(20.0)).otherwise(F.lit(20000.0) / n))
    noise = punct_ratio(c) + digit_ratio(c)
    noise_ok = F.greatest(F.lit(0.0), F.lit(1.0) - noise * 2)
    mwl = mean_word_length(c)
    mwl_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return ((len_ok + noise_ok + mwl_ok) / F.lit(3.0)).cast("double")


def fingerprint(text_col):
    """64-bit document fingerprint of whitespace-normalized lowercase text
    (xxhash64 — stable across runs/engines with the default seed 42)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.xxhash64(norm)


def with_text_stats(df: DataFrame, text: str = "text") -> DataFrame:
    return (df
            .withColumn("n_tokens", token_count(text))
            .withColumn("punct_ratio", punct_ratio(text))
            .withColumn("digit_ratio", digit_ratio(text))
            .withColumn("mean_word_len", mean_word_length(text))
            .withColumn("stopword_ratio_en", stopword_ratio(text, "en"))
            .withColumn("lang_pred", lang_id(text))
            .withColumn("quality", quality_score(text))
            .withColumn("fingerprint", fingerprint(text)))
