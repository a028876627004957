"""Deduplication operators for web-scale corpora.

Four families, each a distinct scale/recall trade-off:
  * exact           — hash groupBy (one shuffle on the digest)
  * n-gram Jaccard  — exact set similarity via shingle inverted index
  * MinHash + LSH   — approximate Jaccard with banded signatures
  * SimHash         — Hamming-ball near-dup via distinct-signature collapse
                      + block-combination (Manku-style) banded join

All shuffles key on digests/band-hashes (uniform — no skew); hot shingles
are df-capped to bound the inverted-index fan-out (standard practice: a
shingle shared by >max_df docs carries no dedup signal).

TOKENIZER SCOPE — ASCII word characters only.  The shingle/minhash
tokenizers strip everything outside [a-zA-Z0-9_] + whitespace (Java regex
\\w is ASCII, and the DuckDB oracles use the same class, so the three
tokenizations agree by construction).  Consequence: documents written
entirely in non-Latin scripts (CJK, Cyrillic, Arabic, ...) tokenize to an
EMPTY shingle set, get a null digest, and are silently excluded from
n-gram/minhash dedup — zero recall on such corpora.  For multilingual
corpora, pre-transliterate or dedup those partitions with the
script-agnostic exact/simhash paths (simhash_udf tokenizes on whitespace
without punctuation stripping).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicate_groups(df: DataFrame, id_col: str = "doc_id",
                           text: str = "text",
                           max_ids: int = 100_000) -> DataFrame:
    """Groups of byte-identical documents: (digest, n_docs, doc_ids, keep_id).

    keep_id = min id (deterministic canonical representative).  doc_ids is
    CAPPED at the max_ids smallest ids per group, bounded BEFORE the
    aggregation buffer (rank-within-digest window, then a conditional
    collect — collect_list skips nulls): an unbounded collect_list would
    put a pathological group (one document duplicated 10^9 times) in a
    single buffer row.  n_docs always reports the true count, and full
    membership is recoverable by joining back on the digest (the keep-one
    path, dedup_exact, never materializes the list at all).  The window
    and the groupBy share the digest partitioning: one shuffle total."""
    from pyspark.sql import Window as W
    digested = df.select(F.md5(F.col(text)).alias("digest"), F.col(id_col))
    rn = F.row_number().over(W.partitionBy("digest").orderBy(id_col))
    return (digested
            .withColumn("_rn", rn)
            .groupBy("digest")
            .agg(F.count("*").alias("n_docs"),
                 F.sort_array(F.collect_list(
                     F.when(F.col("_rn") <= int(max_ids), F.col(id_col))))
                 .alias("doc_ids"),
                 F.min(id_col).alias("keep_id"))
            .where(F.col("n_docs") > 1))


def dedup_exact(df: DataFrame, id_col: str = "doc_id",
                text: str = "text") -> DataFrame:
    """Keep one row (min id) per distinct text: a single shuffle on the
    digest; at 100 TB bucket the table by digest to make reruns shuffle-free."""
    w_digest = df.withColumn("_digest", F.md5(F.col(text)))
    keep = (w_digest.groupBy("_digest").agg(F.min(id_col).alias(id_col)))
    return w_digest.join(keep, ["_digest", id_col], "inner").drop("_digest")


# ---------------------------------------------------------------------------
# shingles + exact n-gram Jaccard
# ---------------------------------------------------------------------------

def shingles_df(df: DataFrame, id_col: str = "doc_id", text: str = "text",
                n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle string)."""
    toks = F.split(F.lower(F.regexp_replace(F.trim(F.col(text)), r"[^\w\s]", "")), r"\s+")
    # n-gram count = size - n + 1 (i in 0..size-n); empty when size < n
    idx = F.when(F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)) \
        .otherwise(F.array().cast("array<int>"))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return (df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
            .where(F.length("shingle") > 0))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text: str = "text", n: int = 3,
                        threshold: float = 0.5,
                        max_df: int = 1000) -> DataFrame:
    """Exact Jaccard-similar pairs (a < b) with sim >= threshold.

    Inverted-index plan: distinct shingles -> drop shingles with doc-freq >
    max_df (no signal, pure skew) -> self-join per shingle -> count common
    -> join sizes -> jaccard filter.  Shuffles key on shingle then (a,b):
    both uniform after the df-cap."""
    sh = shingles_df(df, id_col, text, n).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    freq_ok = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
               .where(F.col("df") <= max_df).select("shingle"))
    sh2 = sh.join(F.broadcast(freq_ok) if max_df <= 10000 else freq_ok, "shingle")
    a = sh2.select(F.col("shingle"), F.col(id_col).alias("a"))
    b = sh2.select(F.col("shingle"), F.col(id_col).alias("b"))
    common = (a.join(b, "shingle").where(F.col("a") < F.col("b"))
              .groupBy("a", "b").agg(F.count("*").alias("common")))
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b"))
    return (common.join(sa, "a").join(sb, "b")
            .withColumn("jaccard", F.col("common") /
                        (F.col("sz_a") + F.col("sz_b") - F.col("common")))
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


# process-wide token-hash cache: web corpora share vocabulary heavily, so
# per-worker FNV work amortizes across documents and batches.  Capped: on a
# 100 TB corpus the per-worker vocabulary is effectively unbounded, and an
# uncapped dict would OOM a long-lived executor — on overflow the cache is
# cleared (cheap; the hot vocabulary re-fills within a batch or two).
_TOKEN_HASH_CACHE: dict = {}
_TOKEN_HASH_CACHE_MAX = 1_000_000

_SHINGLE_P = np.uint64(1099511628211)  # FNV prime reused as the rolling base


def _token_hashes(tokens) -> np.ndarray:
    out = np.empty(len(tokens), dtype=np.uint64)
    cache = _TOKEN_HASH_CACHE
    if len(cache) > _TOKEN_HASH_CACHE_MAX:
        cache.clear()
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            h = _fnv1a(t)
            cache[t] = h
        out[i] = h
    return out


def _flat_tokens(text: pd.Series, strip_punct: bool):
    """Batch tokenization: (flat token-hash array uint64, per-row token
    counts, null mask).  Normalization and split run as pandas C string
    ops over the whole Arrow batch; FNV hashing runs once per DISTINCT
    token (process-cached), then broadcasts via factorize codes — no
    per-document Python loop."""
    isnull = text.isna().to_numpy()
    s = text.fillna("").astype(str).str.lower()
    if strip_punct:
        # keep ASCII alnum + underscore + whitespace — the SAME class as the
        # engine's Spark-side tokenizer (Java regex \w is ASCII) and the
        # DuckDB oracles' '[^a-zA-Z0-9_\s]', so the three tokenizations agree
        # by construction (underscores and non-ASCII punctuation included).
        s = s.str.replace(r"[^a-zA-Z0-9_\s]", "", regex=True)
    toks = s.str.split()
    counts = np.array([len(t) for t in toks], dtype=np.int64)
    flat = [w for lst in toks for w in lst]
    if not flat:
        return np.zeros(0, dtype=np.uint64), counts, isnull
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    cache = _TOKEN_HASH_CACHE
    if len(cache) > _TOKEN_HASH_CACHE_MAX:
        cache.clear()
    uh = np.empty(len(uniques), dtype=np.uint64)
    for k, u in enumerate(uniques):
        h = cache.get(u)
        if h is None:
            h = _fnv1a(u)
            cache[u] = h
        uh[k] = h
    return uh[codes], counts, isnull


def _shingle_stream(text: pd.Series, ngram: int):
    """Batch shingle pipeline shared by the minhash/digest UDFs: rolling
    polynomial hashes over the flat token stream with cross-document
    windows masked, plus per-document segment bounds.  Returns
    (hv flat uint64 shingle hashes, n_sh per-doc counts, bounds n+1
    prefix offsets into hv, isnull mask)."""
    n_docs = len(text)
    th, counts, isnull = _flat_tokens(text, strip_punct=True)
    k = ngram - 1
    with np.errstate(over="ignore"):
        if len(th) > k:
            acc = th[:len(th) - k].copy()
            for s in range(1, ngram):
                acc = acc * _SHINGLE_P + th[s:len(th) - k + s]
        else:
            acc = np.zeros(0, dtype=np.uint64)
    doc_of = np.repeat(np.arange(n_docs), counts)
    valid = doc_of[:len(acc)] == doc_of[k:k + len(acc)] if len(acc) \
        else np.zeros(0, dtype=bool)
    hv = acc[valid]
    n_sh = np.maximum(counts - k, 0)
    bounds = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_sh, out=bounds[1:])
    return hv, n_sh, bounds, isnull


def _shingle_hashes(text: str, ngram: int) -> np.ndarray:
    """Distinct 64-bit hashes of word n-gram shingles of one string (the
    scalar path; the UDFs use the batched _flat_tokens pipeline)."""
    th, counts, _ = _flat_tokens(pd.Series([text]), strip_punct=True)
    n = len(th) - ngram + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = th[0:n].copy()
        for k in range(1, ngram):
            acc = acc * _SHINGLE_P + th[k:k + n]
    return np.unique(acc)


def minhash_signature_udf(num_perm: int = 64, seed: int = 42, ngram: int = 3):
    """pandas UDF: text -> array<long> MinHash signature, vectorized across
    the WHOLE Arrow batch: batch tokenization (_flat_tokens), rolling
    polynomial shingle hashes over the flat token array with cross-document
    windows masked out, then per-document per-permutation minima via
    np.minimum.reduceat (no per-document Python, no per-document matmul)."""
    a_params, b_params = _minhash_params(num_perm, seed)
    a64 = a_params.astype(np.uint64)
    b64 = b_params.astype(np.uint64)
    perm_chunk = 16  # bounds the (shingles x perms) intermediate

    @pandas_udf(T.ArrayType(T.LongType()))
    def udf(text: pd.Series) -> pd.Series:
        n_docs = len(text)
        hv, n_sh, bounds, isnull = _shingle_stream(text, ngram)
        nonempty = n_sh > 0
        sigs = np.zeros((n_docs, num_perm), dtype=np.uint64)
        if hv.size and nonempty.any():
            ne_starts = bounds[:-1][nonempty]
            for lo in range(0, num_perm, perm_chunk):
                hi = min(lo + perm_chunk, num_perm)
                with np.errstate(over="ignore"):
                    prod = hv[:, None] * a64[None, lo:hi] + b64[None, lo:hi]
                sigs[nonempty, lo:hi] = np.minimum.reduceat(prod, ne_starts,
                                                            axis=0)
        out = pd.Series(list(sigs.view(np.int64)), dtype=object) \
            .map(lambda row: row.tolist())
        out[isnull] = None
        return out

    return udf


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


_SIG_BANDS_TYPE = T.StructType([
    T.StructField("sig", T.ArrayType(T.LongType())),
    T.StructField("bands", T.ArrayType(T.LongType())),
])


_SIG_BANDS_DIGEST_TYPE = T.StructType([
    T.StructField("sig", T.ArrayType(T.LongType())),
    T.StructField("bands", T.ArrayType(T.LongType())),
    T.StructField("digest", T.BinaryType()),
])


def _band_hashes(sigs_u64: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) uint64 signature matrix -> (n, bands) int64 FNV folds."""
    n, num_perm = sigs_u64.shape
    rows = num_perm // bands
    prime = np.uint64(0x100000001B3)
    offset = np.uint64(0xCBF29CE484222325)
    v = sigs_u64.reshape(n, bands, rows)
    acc = np.full((n, bands), offset, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(rows):
            acc = (acc ^ v[:, :, r]) * prime
    return acc.view(np.int64)


def minhash_sig_bands_udf(num_perm: int = 64, bands: int = 16,
                          seed: int = 42, ngram: int = 3):
    """text -> struct(sig array<long>, bands array<long>): the MinHash
    signature AND its per-band bucket hashes in ONE vectorized pass.
    Computing band hashes here (an FNV fold over each band's rows, pure
    NumPy) avoids a 64-element_at/concat/xxhash expression tree JVM-side
    and any re-evaluation of the signature UDF through projection
    collapse."""
    base = minhash_signature_udf(num_perm, seed, ngram)

    @pandas_udf(_SIG_BANDS_TYPE)
    def udf(text: pd.Series) -> pd.DataFrame:
        sigs = base.func(text)
        out_sig, out_bands = [], []
        valid = [s is not None for s in sigs]
        mat = np.array([s for s in sigs if s is not None], dtype=np.int64)
        if len(mat):
            bh = _band_hashes(mat.view(np.uint64), bands)
        k = 0
        for ok, s in zip(valid, sigs):
            if not ok:
                out_sig.append(None)
                out_bands.append(None)
            else:
                out_sig.append(s)
                out_bands.append(bh[k].tolist())
                k += 1
        return pd.DataFrame({"sig": out_sig, "bands": out_bands})

    return udf


def minhash_sig_bands_digest_udf(num_perm: int = 64, bands: int = 16,
                                 seed: int = 42, ngram: int = 3):
    """text -> struct(sig, bands, digest): signature, band bucket hashes AND
    the exact shingle-set md5 digest from ONE tokenization/shingle pass —
    the LSH candidate pipeline plus its exact-verify key cost a single scan
    of the corpus (the round-2 plan ran the tokenizer twice more for the
    digest verify joins)."""
    import hashlib
    a_params, b_params = _minhash_params(num_perm, seed)
    a64 = a_params.astype(np.uint64)
    b64 = b_params.astype(np.uint64)
    perm_chunk = 16

    @pandas_udf(_SIG_BANDS_DIGEST_TYPE)
    def udf(text: pd.Series) -> pd.DataFrame:
        n_docs = len(text)
        hv, n_sh, bounds, isnull = _shingle_stream(text, ngram)
        nonempty = n_sh > 0
        sigs = np.zeros((n_docs, num_perm), dtype=np.uint64)
        if hv.size and nonempty.any():
            ne_starts = bounds[:-1][nonempty]
            for lo in range(0, num_perm, perm_chunk):
                hi = min(lo + perm_chunk, num_perm)
                with np.errstate(over="ignore"):
                    prod = hv[:, None] * a64[None, lo:hi] + b64[None, lo:hi]
                sigs[nonempty, lo:hi] = np.minimum.reduceat(prod, ne_starts,
                                                            axis=0)
        bh = _band_hashes(sigs, bands)
        sig_i64 = sigs.view(np.int64)
        out_sig, out_bands, out_dg = [], [], []
        for i in range(n_docs):
            if isnull[i]:
                out_sig.append(None)
                out_bands.append(None)
                out_dg.append(None)
                continue
            out_sig.append(sig_i64[i].tolist())
            out_bands.append(bh[i].tolist())
            if n_sh[i] <= 0:
                out_dg.append(None)
            else:
                seg = np.unique(hv[bounds[i]:bounds[i + 1]])
                out_dg.append(hashlib.md5(seg.tobytes()).digest())
        return pd.DataFrame({"sig": out_sig, "bands": out_bands,
                             "digest": out_dg})

    return udf


def shingle_set_digest_udf(ngram: int = 3):
    """text -> 16-byte digest of the document's DISTINCT shingle-hash set
    (sorted-unique uint64 hashes -> md5).  Two documents get equal digests
    iff their shingle sets are equal (modulo 64-bit hash collisions) —
    the vectorized exact-verify key for LSH candidates, replacing a
    shingle-explode + collect_set + sort shuffle.  Documents with no
    shingles (under ngram tokens) return null."""
    import hashlib

    @pandas_udf(T.BinaryType())
    def udf(text: pd.Series) -> pd.Series:
        n_docs = len(text)
        hv, n_sh, bounds, isnull = _shingle_stream(text, ngram)
        out = []
        for i in range(n_docs):
            if isnull[i] or n_sh[i] <= 0:
                out.append(None)
                continue
            seg = np.unique(hv[bounds[i]:bounds[i + 1]])
            out.append(hashlib.md5(seg.tobytes()).digest())
        return pd.Series(out, dtype=object)

    return udf


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text: str = "text", num_perm: int = 64,
                      bands: int = 16, threshold: float = 0.5,
                      ngram: int = 3, seed: int = 42) -> DataFrame:
    """Approximate near-dup pairs: signature -> band buckets -> bucket join
    -> signature-estimated Jaccard filter.

    shuffle keys = (band, band_hash): uniformly distributed by construction."""
    sb_udf = minhash_sig_bands_udf(num_perm, bands, seed, ngram)
    with_sig = df.select(F.col(id_col),
                         sb_udf(F.col(text)).alias("_sb")) \
        .select(id_col, F.col("_sb.sig").alias("sig"),
                F.col("_sb.bands").alias("bands"))
    banded = with_sig.select(
        id_col, "sig",
        F.posexplode("bands").alias("band", "band_hash"))
    a = banded.select(F.col("band"), F.col("band_hash"),
                      F.col(id_col).alias("a"), F.col("sig").alias("sig_a"))
    b = banded.select(F.col("band"), F.col("band_hash"),
                      F.col(id_col).alias("b"), F.col("sig").alias("sig_b"))
    cand = (a.join(b, ["band", "band_hash"]).where(F.col("a") < F.col("b"))
            .select("a", "b", "sig_a", "sig_b").dropDuplicates(["a", "b"]))
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                          lambda v: v)) / F.lit(num_perm)
    return (cand.withColumn("est_jaccard", est.cast("double"))
            .where(F.col("est_jaccard") >= threshold)
            .select("a", "b", "est_jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_udf(seed: int = 42):
    """pandas UDF: text -> 64-bit SimHash of token FNV hashes (unweighted),
    vectorized across the whole Arrow batch: batch tokenization, one
    (tokens x 64) bit expansion, per-document bit sums via
    np.add.reduceat, majority vote, pack — no per-document Python."""

    shifts = np.arange(64, dtype=np.uint64)

    @pandas_udf(T.LongType())
    def udf(text: pd.Series) -> pd.Series:
        n_docs = len(text)
        th, counts, isnull = _flat_tokens(text, strip_punct=False)
        sums = np.zeros((n_docs, 64), dtype=np.int64)
        nonempty = counts > 0
        if th.size and nonempty.any():
            bits = ((th[:, None] >> shifts[None, :]) & np.uint64(1)) \
                .astype(np.int64)
            starts = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            sums[nonempty] = np.add.reduceat(bits, starts[nonempty], axis=0)
        maj = sums * 2 >= np.maximum(counts, 1)[:, None]
        maj &= nonempty[:, None]  # empty text -> 0 (legacy behavior)
        sig = (maj.astype(np.uint64) << shifts[None, :]).sum(axis=1,
                                                             dtype=np.uint64)
        out = pd.Series(sig.view(np.int64), dtype=object)
        out[isnull] = None
        return out

    return udf


def _simhash_combo_keys(sim, blocks: int, r: int):
    """Column: array of combination keys for the Manku multi-block scheme.

    The 64 signature bits split into `blocks` near-equal blocks; a pair at
    Hamming distance <= h := blocks - r has >= r identical blocks
    (pigeonhole), so joining on EVERY r-block combination (combo index
    packed with the r block values into one long) finds it.  Key
    cardinality is ~2^(r*64/blocks) per combo (e.g. blocks=6, r=3: ~2^32)
    vs 2^16 for the old 4x16 single-band scheme — bucket occupancy stays
    bounded as the corpus grows instead of going linear in N."""
    from itertools import combinations
    base, rem = divmod(64, blocks)
    widths = [base + 1 if i < rem else base for i in range(blocks)]
    offsets = np.cumsum([0] + widths[:-1]).tolist()

    def block_val(i):
        return F.shiftrightunsigned(sim, offsets[i]) \
            .bitwiseAND(F.lit((1 << widths[i]) - 1))

    keys = []
    for ci, combo in enumerate(combinations(range(blocks), r)):
        acc = F.lit(int(ci)).cast("long")
        for i in combo:
            acc = F.shiftleft(acc, widths[i]).bitwiseOR(block_val(i))
        keys.append(acc)
    return F.array(*keys)


def simhash_sig_pairs(dsig: DataFrame, max_hamming: int,
                      blocks: int = 6) -> DataFrame:
    """Distinct-signature pairs (sim_a < sim_b, hamming <= max_hamming)
    from a one-column DataFrame of DISTINCT `sim` longs, via the
    block-combination banded join.  Factored out of simhash_near_pairs so
    the candidate-generation shape is directly testable."""
    r = blocks - max_hamming
    keyed = dsig.select("sim", F.explode(
        _simhash_combo_keys(F.col("sim"), blocks, r)).alias("_k"))
    sa = keyed.select(F.col("_k"), F.col("sim").alias("sim_a"))
    sb = keyed.select(F.col("_k"), F.col("sim").alias("sim_b"))
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (sa.join(sb, "_k").where(F.col("sim_a") < F.col("sim_b"))
            .select("sim_a", "sim_b").dropDuplicates()
            .withColumn("hamming", hamming.cast("int"))
            .where(F.col("hamming") <= max_hamming))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text: str = "text", max_hamming: int = 3,
                       blocks: int = 6) -> DataFrame:
    """Near-dup pairs (a < b, hamming <= max_hamming) at corpus scale.

    Two-level plan (the round-2 4x16-band join keyed on at most 65,536
    values per band — bucket occupancy grew linearly with corpus size and
    candidates quadratically; near-identical boilerplate concentrated in
    few buckets):

      1. collapse to DISTINCT signatures first — a billion byte-similar
         boilerplate pages share one signature and cost the banded join
         exactly one row; identical-signature pairs come from a plain
         equi-join on the full 64-bit value (uniform key);
      2. the banded candidate join runs over distinct signatures with
         block-combination keys (_simhash_combo_keys: blocks=6, r=3 for
         hamming<=3 -> C(6,3)=20 keys/signature, ~2^32-value keyspace),
         guaranteeing pigeonhole recall with bounded bucket occupancy;
      3. signature pairs expand back to id pairs via two equi-joins on the
         signature value (output size is inherent to the semantics).
    """
    if blocks <= max_hamming:
        raise ValueError(f"blocks={blocks} must exceed max_hamming={max_hamming}")
    sh = df.select(F.col(id_col), simhash_udf()(F.col(text)).alias("sim")) \
        .where(F.col("sim").isNotNull())
    sig_pairs = simhash_sig_pairs(sh.select("sim").distinct(),
                                  max_hamming, blocks)
    # same-signature id pairs (hamming 0)
    same = (sh.select(F.col("sim"), F.col(id_col).alias("a"))
            .join(sh.select(F.col("sim"), F.col(id_col).alias("b")), "sim")
            .where(F.col("a") < F.col("b"))
            .select("a", "b", F.lit(0).cast("int").alias("hamming")))
    # cross-signature id pairs
    cross = (sig_pairs
             .join(sh.select(F.col("sim").alias("sim_a"),
                             F.col(id_col).alias("_ida")), "sim_a")
             .join(sh.select(F.col("sim").alias("sim_b"),
                             F.col(id_col).alias("_idb")), "sim_b")
             .select(F.least("_ida", "_idb").alias("a"),
                     F.greatest("_ida", "_idb").alias("b"),
                     F.col("hamming")))
    return same.unionByName(cross)


# ---------------------------------------------------------------------------
# Connected components (dedup clustering)
# ---------------------------------------------------------------------------

def connected_components(edges: DataFrame, src: str = "a", dst: str = "b",
                         max_iter: int = 50) -> DataFrame:
    """Connected components of an undirected edge list: one row per node
    with its component representative (the minimum node id reachable).

    Near-dup pair generators (MinHash/SimHash/Jaccard) emit PAIRS; a
    dedup pipeline needs CLUSTERS — transitively closed groups with one
    keeper each.  This is the alternating large-star / small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond"): each round contracts the graph toward stars rooted at
    component minima and converges in O(log^2 n) rounds even for
    path-shaped graphs (single-link chains DO happen under LSH), vs the
    O(diameter) rounds of naive label propagation.  Each round is two
    groupBy/join stages keyed on node id — plain shuffles, no driver-side
    graph state, so the edge list can be arbitrarily larger than any one
    executor.  Lineage is truncated with localCheckpoint every round
    (iterative plans otherwise grow exponentially in Catalyst).

    Convergence test: total edge count plus an order-insensitive
    bit_xor of xxhash64 over the edge set (the edges are distinct, so
    xor is a set checksum; xor cannot overflow under ANSI arithmetic,
    unlike sum) — one cheap aggregate per round instead of a full
    anti-join of consecutive states.
    """
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .where(F.col("u") != F.col("v")))
    # orient (big, small): the star algorithms keep edges pointing from
    # each node toward a smaller neighbor
    e = e.select(F.greatest("u", "v").alias("u"),
                 F.least("u", "v").alias("v")).distinct()
    e = e.localCheckpoint(eager=True)

    def _sig(df) -> tuple:
        r = df.agg(F.count("*").alias("n"),
                   F.bit_xor(F.xxhash64("u", "v")).alias("h")).collect()[0]
        return (r.n, r.h)

    prev = _sig(e)
    for _ in range(max_iter):
        # large-star: every neighbor v > u links to u's minimum m
        # (neighbors-or-self); operates on the SYMMETRIZED view
        sym = e.unionByName(e.select(F.col("v").alias("u"),
                                     F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m"))
        e = (sym.where(F.col("v") > F.col("u"))
             .join(mins, "u")
             .where(F.col("v") != F.col("m"))
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .distinct())
        # small-star: every node relinks its smaller-or-equal neighbors
        # to their collective minimum
        mins = e.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m"))
        e = (e.join(mins, "u")
             .select(F.col("u"), F.col("v"), F.col("m"))
             .select(F.explode(F.array(
                 F.struct(F.col("u").alias("x"), F.col("m").alias("y")),
                 F.struct(F.col("v").alias("x"), F.col("m").alias("y"))))
                 .alias("p"))
             .select(F.col("p.x").alias("u"), F.col("p.y").alias("v"))
             .where(F.col("u") != F.col("v"))
             .select(F.greatest("u", "v").alias("u"),
                     F.least("u", "v").alias("v"))
             .distinct())
        # LAZY checkpoint + immediate signature aggregate: the signature
        # action materializes the checkpoint as its side effect, so each
        # round runs ONE job instead of two (r6; the loop at sf0.1 ran
        # 84 jobs per invocation, ~2 per round of which one was the
        # eager-checkpoint materialization the signature re-read)
        e = e.localCheckpoint(eager=False)
        cur = _sig(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no convergence in "
                           f"{max_iter} rounds")
    # converged state is a set of stars (node -> root); roots label
    # themselves
    nodes = (edges.select(F.col(src).cast("long").alias("node"))
             .unionByName(edges.select(F.col(dst).cast("long")
                                       .alias("node"))).distinct())
    lab = e.select(F.col("u").alias("node"), F.col("v").alias("rep"))
    return (nodes.join(lab, "node", "left")
            .select("node", F.coalesce("rep", "node").alias("rep")))


def dedup_clusters(edges: DataFrame, src: str = "a", dst: str = "b",
                   max_iter: int = 50) -> DataFrame:
    """Cluster view of connected_components: (node, rep, cluster_size),
    the shape a dedup stage consumes (keep rep, drop the rest)."""
    cc = connected_components(edges, src, dst, max_iter)
    sizes = cc.groupBy("rep").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "rep").select("node", "rep", "cluster_size")
