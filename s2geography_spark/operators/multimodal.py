"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs.  The Spark
side — schemas, Arrow batch shapes, partition sizing — is real and tested;
the actual codec work is stubbed (image/audio libraries are not available
in this environment) behind ``deterministic_fake=True`` or a clearly marked
NotImplementedError, so swapping in PIL/ffmpeg later changes only the inner
function body.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),    # image|audio|video
    T.StructField("codec", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])

FEATURE_SCHEMA = "id long, media_type string, feat array<float>, ok boolean"


def synthesize_media_df(spark, n: int) -> DataFrame:
    """Deterministic fake media table: (id, media binary, meta struct)."""
    df = spark.range(n).withColumnRenamed("id", "id")
    body = F.encode(F.concat(F.lit("MEDIA:"), F.col("id").cast("string"),
                             F.lit(":"), F.repeat(F.lit("x"),
                             (F.pmod(F.col("id"), F.lit(64)) + 1).cast("int"))), "UTF-8")
    mt = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                      (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"))
    return df.select(
        "id", body.alias("media"),
        F.struct(
            mt.alias("media_type"), F.lit("fake/v1").alias("codec"),
            (F.pmod(F.col("id"), F.lit(64)) * 16 + 16).cast("int").alias("width"),
            (F.pmod(F.col("id"), F.lit(48)) * 16 + 16).cast("int").alias("height"),
            (F.pmod(F.col("id"), F.lit(1000)) * 40).cast("long").alias("duration_ms"),
            F.length(body).cast("long").alias("n_bytes"),
        ).alias("meta"))


def _decode_stub(media: bytes, media_type: str, deterministic_fake: bool):
    """STUB decode: real codecs are unavailable in this container.

    deterministic_fake=True returns a reproducible 8-dim feature derived
    from the bytes; False raises NotImplementedError (the marked seam where
    PIL / torchaudio / ffmpeg plug in)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present here")
    h = np.frombuffer(media, dtype=np.uint8)
    acc = np.zeros(8, dtype=np.float64)
    idx = np.arange(len(h)) % 8
    np.add.at(acc, idx, h.astype(np.float64))
    return (acc / max(len(h), 1)).astype(np.float32)


def extract_media_features(df: DataFrame, *, media: str = "media",
                           meta: str = "meta",
                           deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of binary in, fixed-dim
    float features out.  The batch loop mirrors how a real decoder would run
    (one Python worker per task, one decode per row, vectorized post-proc)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for raw, mrow in zip(pdf[media], pdf[meta]):
                try:
                    f = _decode_stub(bytes(raw), mrow["media_type"],
                                     deterministic_fake)
                    feats.append([float(x) for x in f])
                    oks.append(True)
                except NotImplementedError:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame({
                "id": pdf["id"],
                "media_type": [m["media_type"] for m in pdf[meta]],
                "feat": feats,
                "ok": oks,
            })

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode per-frame timestamps from
    duration metadata (real decode stubbed).  Output one row per frame tick —
    the partition-explosion shape a real sampler produces."""
    ticks = F.sequence(F.lit(0), F.greatest((F.col("meta.duration_ms") /
                                             every_ms).cast("long") - 1, F.lit(0)))
    return (df.where(F.col("meta.media_type") == "video")
            .select("id", F.explode(ticks).alias("frame_idx"))
            .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms))
