"""Structured Streaming over the events table: watermarked windowed
aggregation + session windows, and a geo-enrichment stream (tile assignment
on a stream of points).

Batch-equivalent builders are exposed so the same aggregation can run in
batch mode for correctness checks (the streaming sink at availableNow
produces the identical result set — tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, *, window: str = "1 hour",
                          watermark: str = "2 hours",
                          streaming: bool = False) -> DataFrame:
    """Tumbling-window counts/sums per event_type; watermark bounds state
    for late data when running as a stream."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if streaming:
        src = src.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def session_windows(events: DataFrame, *, gap: str = "30 minutes",
                    streaming: bool = False) -> DataFrame:
    """Per-user session windows (session_window native operator)."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if streaming:
        src = src.withWatermark("ts", "2 hours")
    return (src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    "user_id", "n_events"))


def stream_events_from_parquet(spark, path: str, schema) -> DataFrame:
    """File-source stream over a parquet directory (one file per microbatch
    with maxFilesPerTrigger=1) — the test harness for streaming operators."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path))


def run_stream_to_memory(stream_df: DataFrame, query_name: str,
                         output_mode: str = "append"):
    """Drain a stream with availableNow into an in-memory table; returns the
    finished StreamingQuery (caller reads spark.table(query_name))."""
    q = (stream_df.writeStream.format("memory")
         .queryName(query_name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def streaming_dedup(stream: DataFrame, subset, *, event_time: str,
                    delay: str = "1 hour") -> DataFrame:
    """Streaming exact dedup with watermark-BOUNDED state
    (dropDuplicatesWithinWatermark): emits the FIRST arrival per key and
    drops duplicates that arrive within `delay` of it.

    This is the only dedup shape that survives an unbounded stream: plain
    dropDuplicates state grows O(all keys ever seen); here a key's state
    is evicted once the watermark passes its event time + delay, so state
    is O(keys per delay window).  The contract a training-data ingest
    accepts: duplicates separated by more than `delay` of EVENT time can
    be re-emitted — downstream batch dedup (operators/dedup.py) catches
    those, and the stream stage has bounded memory forever.
    """
    return (stream.withWatermark(event_time, delay)
            .dropDuplicatesWithinWatermark(list(subset)))
