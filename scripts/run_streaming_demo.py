"""Structured-Streaming demo (spark-submit surface): a file-source stream of
synthetic geo events -> spatial tag against the prepared region dim ->
tile enrichment -> watermarked windowed counts -> memory sink, verified
EQUAL to the batch computation over the same input.

    spark-submit --master 'local[8]' --py-files dist/s2geography_spark.zip \
        scripts/run_streaming_demo.py

Prints one JSON line: {"rows": N, "tagged": K, "windows": W,
"stream_equals_batch": true}.
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from s2geography_spark.operators.spatial_join import prepare_regions, spatial_join
    from s2geography_spark.operators.tiles import xyz_tile_columns
    from s2geography_spark.session import get_spark
    from s2geography_spark.sources.regions import regions_df

    spark = get_spark("streaming-demo", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")))
    prep = prepare_regions(spark, regions_df(spark, 24, covering_level=6))

    # deterministic synthetic events written as the stream's file source
    n = int(os.environ.get("STREAM_DEMO_ROWS", "200000"))
    src = tempfile.mkdtemp(prefix="s2stream_src_")
    events = (spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 3600))
        .alias("ts"),
        (F.pmod(F.col("id") * 37, F.lit(1440)) / 4.0 - 180.0 + 0.125)
        .alias("lng"),
        (F.pmod(F.col("id") * 23, F.lit(640)) / 4.0 - 80.0 + 0.125)
        .alias("lat")))
    events.repartition(8).write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    tagged = spatial_join(stream, prep, predicate="contains", level=6)
    x, y = xyz_tile_columns("lng", "lat", 6)
    enriched = tagged.withColumn("tile_x", x).withColumn("tile_y", y)
    counts = (enriched
              .withWatermark("ts", "2 hours")  # wider than the synthetic 1-hour ts cycle: nothing is late
              .groupBy(F.window("ts", "5 minutes"), "region_id", "tile_x",
                       "tile_y")
              .agg(F.count("*").alias("n")))
    q = (counts.writeStream.outputMode("update")
         .format("memory").queryName("geo_counts").start())
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()

    # batch truth over the identical input: update-mode re-emissions are
    # resolved by taking the LAST emission per group key
    stream_rows = spark.sql(
        "SELECT window, region_id, tile_x, tile_y, max(n) AS n "
        "FROM geo_counts GROUP BY window, region_id, tile_x, tile_y")
    batch = (spatial_join(spark.read.parquet(src), prep,
                          predicate="contains", level=6)
             .withColumn("tile_x", x).withColumn("tile_y", y)
             .groupBy(F.window("ts", "5 minutes"), "region_id", "tile_x",
                      "tile_y")
             .agg(F.count("*").alias("n")))
    diff = stream_rows.exceptAll(batch).count() + \
        batch.exceptAll(stream_rows).count()
    tagged_total = int(batch.agg(F.sum("n")).collect()[0][0] or 0)
    print(json.dumps({
        "rows": n,
        "tagged": tagged_total,
        "windows": stream_rows.count(),
        "micro_batches": n_batches,
        "stream_equals_batch": diff == 0,
    }))
    shutil.rmtree(src, ignore_errors=True)
    spark.stop()
    sys.exit(0 if diff == 0 else 1)


if __name__ == "__main__":
    main()
