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


# ---------------------------------------------------------------------------
# repetition filters (Gopher/C4-style): duplicate-line fractions are pure
# Column; word/n-gram repetition needs per-doc frequency tables, which a
# Catalyst higher-order function can only express as an interpreted O(n^2)
# scan per row — so it runs as ONE vectorized Arrow UDF over flat arrays
# (factorize + lexsort run-length counting; no per-token Python).
# ---------------------------------------------------------------------------

def lines_col(text_col):
    """Non-blank lines (trimmed split on newline)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.transform(F.split(c, r"\n"), lambda x: F.trim(x)),
                    lambda x: F.length(x) > 0)


def dup_line_fraction(text_col):
    """Fraction of non-blank lines that repeat an earlier line."""
    ls = lines_col(text_col)
    n = F.size(ls)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(ls))) / n).cast("double")


def dup_line_char_fraction(text_col):
    """Fraction of line characters inside repeated line occurrences."""
    ls = lines_col(text_col)
    tot = F.aggregate(ls, F.lit(0.0), lambda a, x: a + F.length(x))
    dst = F.aggregate(F.array_distinct(ls), F.lit(0.0),
                      lambda a, x: a + F.length(x))
    return F.when(tot <= 0, F.lit(0.0)).otherwise((tot - dst) / tot) \
        .cast("double")


def ellipsis_line_fraction(text_col):
    ls = lines_col(text_col)
    n = F.size(ls)
    hits = F.size(F.filter(ls, lambda x: x.rlike(r"(\.\.\.|…)$")))
    return F.when(n <= 0, F.lit(0.0)).otherwise(hits / n).cast("double")


def bullet_line_fraction(text_col):
    ls = lines_col(text_col)
    n = F.size(ls)
    hits = F.size(F.filter(ls, lambda x: x.rlike(r"^([•‣▪*-])")))
    return F.when(n <= 0, F.lit(0.0)).otherwise(hits / n).cast("double")


_REP_SCHEMA = None


def _rep_schema():
    global _REP_SCHEMA
    if _REP_SCHEMA is None:
        from pyspark.sql import types as T
        _REP_SCHEMA = T.StructType([
            T.StructField("n_words", T.LongType()),
            T.StructField("n_distinct", T.LongType()),
            T.StructField("top_word", T.LongType()),
            T.StructField("big_cover", T.LongType()),
            T.StructField("tri_cover", T.LongType()),
        ])
    return _REP_SCHEMA


def _rep_counts(pdf_text):
    """Vectorized per-doc word/n-gram frequency stats over a flat token
    table: returns (n_words, n_distinct, top word count, max bigram
    count*chars, max trigram count*chars) as numpy arrays (None -> -1)."""
    import numpy as np
    import pandas as pd
    n = len(pdf_text)
    toks = pdf_text.fillna("").str.split()
    lens = toks.str.len().to_numpy(dtype=np.int64)
    total = int(lens.sum())
    nw = lens.copy()
    nd = np.zeros(n, dtype=np.int64)
    topw = np.zeros(n, dtype=np.int64)
    bigc = np.full(n, -1, dtype=np.int64)
    tric = np.full(n, -1, dtype=np.int64)
    if total == 0:
        return nw, nd, topw, bigc, tric
    import itertools
    flat = np.fromiter(itertools.chain.from_iterable(toks.to_list()),
                       dtype=object, count=total)
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    codes, uniq = pd.factorize(flat)
    V = np.int64(len(uniq))
    tlen = np.fromiter((len(u) for u in uniq), dtype=np.int64, count=len(uniq))

    def _group_counts(rows, keys, nkeys):
        """(row, key) pair counts via lexsort run-length encoding."""
        comp = rows * nkeys + keys
        comp.sort(kind="stable")
        change = np.empty(len(comp), dtype=bool)
        change[0] = True
        np.not_equal(comp[1:], comp[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, len(comp)))
        return comp[starts] // nkeys, comp[starts] % nkeys, counts

    # words
    gr, gk, gc = _group_counts(row.copy(), codes.astype(np.int64), V)
    np.add.at(nd, gr, 1)
    np.maximum.at(topw, gr, gc)
    # bigrams: consecutive same-row token pairs, factorized pairwise
    same = row[:-1] == row[1:]
    if same.any():
        b1 = codes[:-1][same].astype(np.int64)
        b2 = codes[1:][same].astype(np.int64)
        brow = row[:-1][same]
        bkey, bidx = pd.factorize(b1 * V + b2)
        B = np.int64(len(bidx))
        blen = tlen[bidx // V] + tlen[bidx % V] + 1  # joined with ' '
        gr, gk, gc = _group_counts(brow.copy(), bkey.astype(np.int64), B)
        np.maximum.at(bigc, gr, gc * blen[gk])
        # trigrams: bigram code at i combined with token i+2 (two-stage
        # factorize keeps keys < B*V, no int64 overflow at any batch size)
        bpos = np.full(len(same), -1, dtype=np.int64)
        bpos[same] = bkey
        tri_ok = same[:-1] & (row[1:-1] == row[2:])
        if tri_ok.any():
            t12 = bpos[:-1][tri_ok]
            t3 = codes[2:][tri_ok].astype(np.int64)
            trow = row[:-2][tri_ok]
            tkey, tidx = pd.factorize(t12 * V + t3)
            T3 = np.int64(len(tidx))
            tl = blen[tidx // V] + tlen[tidx % V] + 1
            gr, gk, gc = _group_counts(trow.copy(), tkey.astype(np.int64), T3)
            np.maximum.at(tric, gr, gc * tl[gk])
    return nw, nd, topw, bigc, tric


_REP_UDF = None


def repetition_stats(text_col):
    """Struct column of per-doc repetition counts: n_words, n_distinct,
    top_word (max single-word count), big_cover / tri_cover (max over
    word 2-/3-grams of occurrences x chars of the space-joined gram;
    null when the doc has fewer than 2/3 words).  Divide by token count /
    text length for the Gopher-style fractions (top_ngram_char_fraction
    uses a deterministic max-coverage form instead of the paper's
    ambiguous tie-broken 'most frequent')."""
    global _REP_UDF
    if _REP_UDF is None:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def _raw(s):
            nw, nd, topw, bigc, tric = _rep_counts(s)
            return pd.DataFrame({"n_words": nw, "n_distinct": nd,
                                 "top_word": topw,
                                 "big_cover": pd.Series(bigc).where(bigc >= 0),
                                 "tri_cover": pd.Series(tric).where(tric >= 0)})

        _REP_UDF = pandas_udf(_raw, _rep_schema())
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _REP_UDF(c)


def with_repetition_stats(df: DataFrame, text: str = "text",
                          gopher_thresholds: bool = True) -> DataFrame:
    """Gopher/C4-style repetition metrics + pass/fail flag.  The n-gram
    stats are one Arrow batch pass; everything else is codegen Columns."""
    rs = repetition_stats(text)
    n = F.length(F.col(text))
    out = (df.withColumn("_rs", rs)
           .withColumn("dup_word_frac", F.when(
               F.col("_rs.n_words") <= 0, F.lit(0.0)).otherwise(
               (F.col("_rs.n_words") - F.col("_rs.n_distinct"))
               / F.col("_rs.n_words")))
           .withColumn("top_word_frac", F.when(
               F.col("_rs.n_words") <= 0, F.lit(0.0)).otherwise(
               F.col("_rs.top_word") / F.col("_rs.n_words")))
           .withColumn("top_bigram_char_frac",
                       F.col("_rs.big_cover") / F.greatest(n, F.lit(1)))
           .withColumn("top_trigram_char_frac",
                       F.col("_rs.tri_cover") / F.greatest(n, F.lit(1)))
           .withColumn("dup_line_frac", dup_line_fraction(text))
           .withColumn("dup_line_char_frac", dup_line_char_fraction(text))
           .withColumn("ellipsis_line_frac", ellipsis_line_fraction(text))
           .withColumn("bullet_line_frac", bullet_line_fraction(text)))
    if gopher_thresholds:
        # the repetition thresholds only apply to docs of >= 50 words
        # (short docs trivially exceed the n-gram fractions); shorter
        # docs pass this filter and are handled by the length-band
        # filters in quality_score
        out = out.withColumn("repetition_pass", (F.col("_rs.n_words") < 50) | (
            (F.col("dup_line_frac") <= 0.30)
            & (F.col("dup_line_char_frac") <= 0.20)
            & (F.coalesce(F.col("top_bigram_char_frac"), F.lit(0.0)) <= 0.20)
            & (F.coalesce(F.col("top_trigram_char_frac"), F.lit(0.0)) <= 0.18)
            & (F.col("ellipsis_line_frac") <= 0.30)
            & (F.col("bullet_line_frac") <= 0.90)))
    return out.drop("_rs")


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


def corpus_filter(df: DataFrame, text: str = "text",
                  lang_col: str | None = None,
                  min_quality: float = 0.5) -> DataFrame:
    """The end-to-end C4/Gopher-style keep/drop gate, composed from the
    pure-Column metrics above: repetition_pass (Gopher repetition
    thresholds), quality_pass (composite score >= min_quality), and —
    when the corpus carries a language column — lang_match (the n-gram
    language prediction agrees with the recorded metadata; disagreement
    usually means boilerplate or mixed-language spam).  Adds the gate
    booleans and `keep`; downstream is a plain `.where("keep")`, so the
    whole filter is one scan-stage projection plus the single Arrow pass
    of repetition_stats."""
    out = with_repetition_stats(df, text)
    out = out.withColumn("quality_pass",
                         quality_score(text) >= F.lit(min_quality))
    keep = F.col("repetition_pass") & F.col("quality_pass")
    if lang_col is not None:
        out = out.withColumn("lang_match",
                             lang_id(text) == F.col(lang_col))
        keep = keep & F.col("lang_match")
    return out.withColumn("keep", keep)
