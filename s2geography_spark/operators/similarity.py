"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k; pure Column math (F.zip_with /
  F.aggregate dot product) + window top-k.  The right plan when the query
  set is broadcastable; corpus-side is map-only.
* lsh_topk — banded random-hyperplane LSH as the scale path: b bands x r
  planes, candidates = pairs matching ANY band (OR-amplification), exact
  cosine refine.
* embedding_near_duplicates — pairs with cosine >= threshold via the same
  banded LSH self-join; optional hot-bucket cap for degenerate corpora.
* ivf_topk — inverted-file ANN: broadcast coarse centroids, map-only
  corpus list assignment, query probes nprobe lists, exact refine inside
  the probed lists only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def dot_col(a, b, dim: int | None = None):
    """Dot product of two array columns.

    With `dim` the product unrolls to a chain of element_at terms inside
    whole-stage codegen; the chain folds left-to-right from a 0.0 seed,
    exactly the aggregate() evaluation order, so results are bit-identical
    to the generic form.  MEASURED NEGATIVE RESULT (r6, sf1.0, 20k x 10
    pairs): the unrolled form is 3x SLOWER end-to-end (4.2 s vs 1.5 s per
    brute_force_topk run) — a ~400-node expression tree pays more in
    Catalyst planning + codegen compilation per run than the interpreted
    aggregate lambda pays executing 64 elements x 200k rows.  The r4
    '9x slower interpreted' lesson applies to folds over LONG arrays
    (hundreds of geometry vertices), not dim-64 embeddings.  Callers
    therefore default to dim=None; what actually made ann_topk fast was
    projecting the NORMS before the pairing (see brute_force_topk)."""
    if dim is None:
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, v: acc + v)
    s = F.lit(0.0)
    for i in range(1, int(dim) + 1):
        s = s + F.element_at(a, i) * F.element_at(b, i)
    return s


def norm_col(a, dim: int | None = None):
    return F.sqrt(dot_col(a, a, dim))


def cosine_col(a, b, dim: int | None = None):
    return (dot_col(a, b, dim) /
            (F.greatest(norm_col(a, dim), F.lit(1e-30)) *
             F.greatest(norm_col(b, dim), F.lit(1e-30)))).cast("double")


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int, *,
                     corpus_id: str = "vec_id", query_id: str = "q_id",
                     corpus_vec: str = "embedding", query_vec: str = "q_vec",
                     metric_col: str = "cosine",
                     dim: int | None = None) -> DataFrame:
    """Exact top-k: crossJoin(broadcast(queries)) -> JVM-side cosine ->
    window top-k per query.  O(|corpus| * |queries|) but fully codegen'd
    when `dim` is given (see dot_col).  Norms are projected BEFORE the
    pairing (guide §2.3 'project before the exchange' applied to the
    cross join): each side's norm is computed once per ROW instead of
    once per PAIR — |queries| times less work on the corpus-side norm."""
    nc = F.greatest(norm_col(F.col(corpus_vec), dim), F.lit(1e-30))
    nq = F.greatest(norm_col(F.col(query_vec), dim), F.lit(1e-30))
    pair = corpus.withColumn("_cn", nc) \
        .crossJoin(F.broadcast(queries.withColumn("_qn", nq)))
    metric = (dot_col(F.col(corpus_vec), F.col(query_vec), dim) /
              (F.col("_cn") * F.col("_qn"))).cast("double")
    pair = pair.withColumn(metric_col, metric)
    w = Window.partitionBy(query_id).orderBy(F.col(metric_col).desc(),
                                             F.col(corpus_id).asc())
    return (pair.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id, "rank", corpus_id, metric_col))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_band_keys_udf(dim: int, bands: int = 8, planes_per_band: int = 16,
                      seed: int = 42):
    """pandas UDF: embedding -> array<long> of per-band LSH bucket keys
    (one matmul for ALL bands per Arrow batch).

    OR-amplified random-hyperplane LSH, the same b-bands-x-r-rows
    construction as the MinHash side (dedup.minhash_sig_bands_udf): a pair
    is a candidate when ANY band's r sign bits all match.  Recall for a
    pair at angle theta is 1 - (1 - (1-theta/pi)^r)^b — a single missed
    sign bit no longer kills the pair (the round-2 single-band scheme had
    AND-only amplification: recall was luck-of-the-bucket).  Each key packs
    (band index << r) | signs, so per-band keyspaces are disjoint and one
    explode+equi-join serves all bands; cardinality is bands * 2^r
    (b=8, r=16: ~5x10^5 and growable via r) instead of the old global
    2^10-bucket space whose occupancy grew linearly with corpus size."""
    planes = _hyperplanes(dim, bands * planes_per_band, seed)
    shifts = np.arange(planes_per_band, dtype=np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def udf(vec: pd.Series) -> pd.Series:
        mats, idx = [], []
        for i, v in enumerate(vec):
            if v is not None and len(v) == dim:
                mats.append(v)
                idx.append(i)
        out = [None] * len(vec)
        if idx:
            M = np.asarray(mats, dtype=np.float64)  # (n, dim)
            signs = ((M @ planes.T) >= 0).astype(np.int64) \
                .reshape(len(idx), bands, planes_per_band)
            keys = (signs << shifts[None, None, :]).sum(axis=2)
            keys |= (np.arange(bands, dtype=np.int64)
                     << planes_per_band)[None, :]
            for j, i in enumerate(idx):
                out[i] = keys[j].tolist()
        return pd.Series(out, dtype=object)

    return udf


def _cap_hot_buckets(keyed: DataFrame, key: str, max_bucket: int,
                     stats_out: dict | None = None) -> DataFrame:
    """Drop band keys whose occupancy exceeds max_bucket — the df-cap guard
    for degenerate corpora (a boilerplate embedding repeated 10^6 times
    would otherwise pay a quadratic self-join in its bucket).  Recall
    caveat: pairs ONLY findable through a dropped hot bucket are lost;
    with OR-amplification a true near-pair usually shares several bands,
    so only mass-duplicated content is affected — dedup that with
    exact/minhash first (it is byte-level duplication, not geometry).
    In particular a vector duplicated past max_bucket in EVERY band loses
    all of its buckets and returns zero pairs.

    Pass stats_out={} to have the number of dropped hot buckets recorded
    under 'dropped_hot_buckets' (runs one small count job), so silent
    recall loss is observable instead of invisible."""
    hot = (keyed.groupBy(key).agg(F.count("*").alias("_n"))
           .where(F.col("_n") > max_bucket).select(key))
    if stats_out is not None:
        stats_out["dropped_hot_buckets"] = hot.count()
    return keyed.join(F.broadcast(hot), key, "left_anti")


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int, dim: int, *,
             corpus_id: str = "vec_id", query_id: str = "q_id",
             corpus_vec: str = "embedding", query_vec: str = "q_vec",
             bands: int = 8, planes_per_band: int = 16, seed: int = 42,
             max_bucket: int | None = None,
             stats_out: dict | None = None) -> DataFrame:
    """Approximate top-k: explode per-band LSH keys on both sides, equi-join
    on the key (candidates = pairs matching ANY band), dedupe, exact cosine
    refine, window top-k.  Scale path for non-broadcastable query sets —
    the shuffle keys on (band, signs) buckets, uniform for spread-out
    corpora; `max_bucket` guards degenerate hot buckets.

    The cap is applied to the CORPUS side only (dropping a bucket on
    either side loses the same candidate pairs; capping once keeps every
    query's remaining buckets intact).  With max_bucket set, recall is no
    longer guaranteed for vectors that are mass-duplicated in the corpus —
    pass stats_out={} to observe how many hot buckets were dropped."""
    keys = lsh_band_keys_udf(dim, bands, planes_per_band, seed)
    c = corpus.select(F.col(corpus_id), F.col(corpus_vec),
                      F.explode(keys(F.col(corpus_vec))).alias("_bucket"))
    if max_bucket is not None:
        c = _cap_hot_buckets(c, "_bucket", max_bucket, stats_out)
    q = queries.select(F.col(query_id), F.col(query_vec),
                       F.explode(keys(F.col(query_vec))).alias("_bucket"))
    pair = (c.join(q, "_bucket")
            .dropDuplicates([query_id, corpus_id]))
    pair = pair.withColumn("cosine",
                           cosine_col(F.col(corpus_vec), F.col(query_vec)))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (pair.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id, "rank", corpus_id, "cosine"))


def ivf_assign_udf(centroids: np.ndarray, nprobe: int):
    """pandas UDF: embedding -> array<int> of the `nprobe` most-similar
    centroid ids by cosine (ties broken toward the LOWER centroid index).
    One matmul per Arrow batch against the broadcast centroid matrix;
    with nprobe=1 this is the corpus-side coarse quantizer."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def udf(vec: pd.Series) -> pd.Series:
        mats, idx = [], []
        for i, v in enumerate(vec):
            if v is not None and len(v) == cn.shape[1]:
                mats.append(v)
                idx.append(i)
        out = [None] * len(vec)
        if idx:
            M = np.asarray(mats, dtype=np.float64)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
            sims = M @ cn.T                      # (n, n_lists)
            # argsort on (-sim, index): stable mergesort keeps the lower
            # centroid index first among exact ties
            order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            for j, i in enumerate(idx):
                out[i] = order[j].tolist()
        return pd.Series(out, dtype=object)

    return udf


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int, *,
             centroids: DataFrame, dim: int, nprobe: int = 4,
             corpus_id: str = "vec_id", query_id: str = "q_id",
             corpus_vec: str = "embedding", query_vec: str = "q_vec",
             centroid_vec: str = "embedding") -> DataFrame:
    """Inverted-file (IVF) approximate top-k — the classic ANN scale path
    alongside lsh_topk.

    The coarse quantizer is a small `centroids` DataFrame (k-means output
    in production; any deterministic representative subset works — IVF
    correctness never depends on centroid quality, only recall does).  It
    is collected once (dim-side, bounded by n_lists) and broadcast inside
    the assignment UDF, so:

    - corpus side is MAP-ONLY: one matmul per Arrow batch assigns each
      vector to its nearest centroid list.  At ingest the corpus can be
      written bucketed by `_list` (materialize once, like the bucketed
      mention corpus), making the query-time probe join exchange-free on
      the fact side.
    - query side probes its `nprobe` nearest lists, explodes, and
      equi-joins the corpus on `_list` — candidates are only the probed
      lists' members, never all-pairs.  Exact cosine + window top-k
      refine the candidates.

    Skew surface: a hot list (clustered corpus) concentrates candidates;
    mitigate with more lists (finer quantizer) or split hot lists by a
    salt on the corpus side — same playbook as the spatial cover join.
    List ids are centroid ROW POSITIONS: sorted by a `centroid_id`
    column when present, otherwise the input plan's collect order (pass
    centroid_id for a deterministic mapping — plan order is not
    guaranteed stable across runs)."""
    if "centroid_id" in centroids.columns:
        centroids = centroids.orderBy("centroid_id")
    cent_rows = centroids.select(centroid_vec).collect()
    C = np.asarray([r[0] for r in cent_rows], dtype=np.float64)
    if C.ndim != 2 or C.shape[1] != dim:
        raise ValueError(f"centroids must be (n_lists, {dim})")
    assign1 = ivf_assign_udf(C, 1)
    assignp = ivf_assign_udf(C, nprobe)
    c = corpus.withColumn("_list", F.element_at(assign1(F.col(corpus_vec)),
                                                1))
    q = queries.withColumn("_list",
                           F.explode(assignp(F.col(query_vec))))
    pair = c.join(q, "_list")
    pair = pair.withColumn("cosine",
                           cosine_col(F.col(corpus_vec), F.col(query_vec)))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (pair.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id, "rank", corpus_id, "cosine"))


def embedding_near_duplicates(df: DataFrame, dim: int, *,
                              id_col: str = "vec_id", vec: str = "embedding",
                              threshold: float = 0.95,
                              bands: int = 8, planes_per_band: int = 16,
                              seed: int = 42,
                              max_bucket: int | None = None,
                              stats_out: dict | None = None) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold: banded OR-amplified LSH
    self-join candidates (match ANY band) + exact cosine refine (a < b).

    With max_bucket=None (default), identical vectors share every band, so
    recall for exact clones is 1 regardless of band parameters.  With
    max_bucket SET that guarantee is void for mass-duplicated vectors: a
    vector repeated past max_bucket loses every one of its band buckets
    and returns zero pairs (dedup byte-identical content with
    exact/minhash first).  Pass stats_out={} to record how many hot
    buckets were dropped ('dropped_hot_buckets')."""
    keys = lsh_band_keys_udf(dim, bands, planes_per_band, seed)
    # ids-only through the banded self-join (guide §8: decide with small
    # rows, move big rows once): the embedding payload used to ride BOTH
    # sides of the bucket-keyed exchange x `bands` copies — ~2 x bands x
    # dim x 8 B per vector of shuffle for a candidate set that is tiny by
    # construction.  Now the exchange carries (bucket, id) = 16 B rows and
    # the vectors are attached to the deduped candidate PAIRS by two id
    # joins (AQE broadcasts the candidate side when it is small; in the
    # degenerate case the hot-bucket cap bounds it).
    withb = df.select(F.col(id_col),
                      F.explode(keys(F.col(vec))).alias("_bucket"))
    if max_bucket is not None:
        withb = _cap_hot_buckets(withb, "_bucket", max_bucket, stats_out)
    a = withb.select(F.col("_bucket"), F.col(id_col).alias("a"))
    b = withb.select(F.col("_bucket"), F.col(id_col).alias("b"))
    cand = (a.join(b, "_bucket").where(F.col("a") < F.col("b"))
            .dropDuplicates(["a", "b"]))
    va = df.select(F.col(id_col).alias("a"), F.col(vec).alias("_va"))
    vb = df.select(F.col(id_col).alias("b"), F.col(vec).alias("_vb"))
    return (cand.join(va, "a").join(vb, "b")
            .withColumn("cosine", cosine_col(F.col("_va"), F.col("_vb")))
            .where(F.col("cosine") >= threshold)
            .select("a", "b", "cosine"))
