"""Streaming geo operators: stream-static spatial tag equals the batch join;
stateful first-seen dedup emits each key exactly once."""

import pytest
from pyspark.sql import functions as F

from s2geography_spark.operators.spatial_join import prepare_regions, spatial_join
from s2geography_spark.sources.regions import regions_df
from s2geography_spark.streaming.events import run_stream_to_memory
from s2geography_spark.streaming.geo import (enrich_stream_with_tiles,
                                             streaming_first_seen,
                                             streaming_spatial_tag)


@pytest.fixture(scope="module")
def points_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_points"))
    df = spark.range(4000).select(
        F.col("id").alias("pid"),
        (F.pmod(F.col("id") * 37, F.lit(1440)) / 4.0 - 180.0 + 0.125).alias("lng"),
        (F.pmod(F.col("id") * 23, F.lit(640)) / 4.0 - 80.0 + 0.125).alias("lat"),
        F.concat(F.lit("k"), F.pmod(F.col("id"), F.lit(50)).cast("string")).alias("key"),
    )
    df.repartition(4).write.mode("overwrite").parquet(path)
    return path


def _stream(spark, path):
    schema = spark.read.parquet(path).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(path))


def test_streaming_spatial_tag_equals_batch(spark, points_path):
    regions = regions_df(spark, 24, covering_level=6)
    prep = prepare_regions(spark, regions)
    batch = spatial_join(spark.read.parquet(points_path), prep, level=6)
    expected = {(r.pid, r.region_id)
                for r in batch.select("pid", "region_id").collect()}

    tagged = streaming_spatial_tag(_stream(spark, points_path), prep, level=6)
    run_stream_to_memory(tagged.select("pid", "region_id"), "stream_tag")
    got = {(r.pid, r.region_id) for r in spark.table("stream_tag").collect()}
    assert got == expected and len(got) > 0


def test_streaming_tiles(spark, points_path):
    enriched = enrich_stream_with_tiles(_stream(spark, points_path))
    run_stream_to_memory(enriched, "stream_tiles")
    rows = spark.table("stream_tiles").collect()
    assert len(rows) == 4000
    assert all(r.s2_cell_l8 is not None and r.tile_z8_x is not None for r in rows)


def test_streaming_first_seen(spark, points_path):
    dedup = streaming_first_seen(_stream(spark, points_path), "key")
    run_stream_to_memory(dedup, "stream_dedup", output_mode="append")
    rows = spark.table("stream_dedup").collect()
    keys = [r.key for r in rows]
    assert sorted(keys) == sorted({f"k{i}" for i in range(50)})
    assert len(keys) == len(set(keys))  # each key exactly once
