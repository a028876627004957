"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k; pure Column math (F.zip_with /
  F.aggregate dot product) + window top-k.  The right plan when the query
  set is broadcastable; corpus-side is map-only.
* lsh_topk — random-hyperplane LSH buckets as the scale path: candidates
  only within matching buckets (multi-probe via bands), exact cosine refine.
* embedding_near_duplicates — pairs with cosine >= threshold via LSH.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def dot_col(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_col(a):
    return F.sqrt(dot_col(a, a))


def cosine_col(a, b):
    return (dot_col(a, b) /
            (F.greatest(norm_col(a), F.lit(1e-30)) *
             F.greatest(norm_col(b), F.lit(1e-30)))).cast("double")


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int, *,
                     corpus_id: str = "vec_id", query_id: str = "q_id",
                     corpus_vec: str = "embedding", query_vec: str = "q_vec",
                     metric_col: str = "cosine") -> DataFrame:
    """Exact top-k: crossJoin(broadcast(queries)) -> JVM-side cosine ->
    window top-k per query.  O(|corpus| * |queries|) but fully codegen'd."""
    pair = corpus.crossJoin(F.broadcast(queries))
    pair = pair.withColumn(metric_col, cosine_col(F.col(corpus_vec), F.col(query_vec)))
    w = Window.partitionBy(query_id).orderBy(F.col(metric_col).desc(),
                                             F.col(corpus_id).asc())
    return (pair.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id, "rank", corpus_id, metric_col))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_sign_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """pandas UDF: embedding -> int bucket key of hyperplane sign bits
    (one matmul per Arrow batch)."""
    planes = _hyperplanes(dim, n_planes, seed)

    @pandas_udf(T.LongType())
    def udf(vec: pd.Series) -> pd.Series:
        out = []
        mats, idx = [], []
        for i, v in enumerate(vec):
            if v is not None and len(v) == dim:
                mats.append(v)
                idx.append(i)
        res = np.zeros(len(vec), dtype=np.int64)
        if idx:
            M = np.asarray(mats, dtype=np.float64)  # (n, dim)
            signs = (M @ planes.T) >= 0  # (n, planes)
            keys = np.zeros(len(idx), dtype=np.int64)
            for b in range(n_planes):
                keys |= signs[:, b].astype(np.int64) << b
            res[np.array(idx)] = keys
        return pd.Series([int(res[i]) if vec.iloc[i] is not None else None
                          for i in range(len(vec))], dtype=object)

    return udf


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int, dim: int, *,
             corpus_id: str = "vec_id", query_id: str = "q_id",
             corpus_vec: str = "embedding", query_vec: str = "q_vec",
             n_planes: int = 12, seed: int = 42) -> DataFrame:
    """Approximate top-k: join corpus and queries on the LSH bucket key,
    exact cosine within bucket, window top-k.  Recall improves with fewer
    planes (bigger buckets); scale path for non-broadcastable query sets —
    the shuffle keys on the bucket id."""
    sign = lsh_sign_udf(dim, n_planes, seed)
    c = corpus.withColumn("_bucket", sign(F.col(corpus_vec)))
    q = queries.withColumn("_bucket", sign(F.col(query_vec)))
    pair = c.join(q, "_bucket")
    pair = pair.withColumn("cosine", cosine_col(F.col(corpus_vec), F.col(query_vec)))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (pair.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id, "rank", corpus_id, "cosine"))


def embedding_near_duplicates(df: DataFrame, dim: int, *,
                              id_col: str = "vec_id", vec: str = "embedding",
                              threshold: float = 0.95,
                              n_planes: int = 10, seed: int = 42) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold: LSH self-join candidates
    + exact cosine refine (a < b)."""
    sign = lsh_sign_udf(dim, n_planes, seed)
    withb = df.withColumn("_bucket", sign(F.col(vec)))
    a = withb.select(F.col("_bucket"), F.col(id_col).alias("a"),
                     F.col(vec).alias("_va"))
    b = withb.select(F.col("_bucket"), F.col(id_col).alias("b"),
                     F.col(vec).alias("_vb"))
    cand = a.join(b, "_bucket").where(F.col("a") < F.col("b"))
    return (cand.withColumn("cosine", cosine_col(F.col("_va"), F.col("_vb")))
            .where(F.col("cosine") >= threshold)
            .select("a", "b", "cosine").dropDuplicates(["a", "b"]))
