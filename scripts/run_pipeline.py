"""spark-submit entry point for the full checkpoint-resumable pipeline.

Launch (north-rule launch surface):

    python scripts/make_pyfiles_zip.py   # builds dist/s2geography_spark.zip
    spark-submit --master 'local[32]' \
        --py-files dist/s2geography_spark.zip \
        scripts/run_pipeline.py --pages 100000 --out /tmp/s2pipeline

Stages (each checkpointed with a per-partition lineage manifest; reruns
resume from the last complete stage):
  1. pages          — synthesize/ingest the page corpus
  2. mentions       — text -> geo-entity extraction
  3. join           — cover/explode/broadcast-join/PIP-refine spatial join
  4. tiles          — per-zoom S2 + Web-Mercator tile assignment
  5. rollup         — per-region / per-tile aggregates
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--regions", type=int, default=96)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("s2geography_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from s2geography_spark.operators.spatial_join import spatial_join
    from s2geography_spark.operators.tiles import assign_tiles
    from s2geography_spark.plans.checkpoint import checkpointed_stage, read_manifest
    from s2geography_spark.sources.pages import (extract_mentions,
                                                 gazetteer_df, pages_df)
    from s2geography_spark.sources.regions import regions_df

    out = args.out

    pages = checkpointed_stage(
        spark, f"{out}/01_pages", "pages",
        lambda: pages_df(spark, args.pages))

    mentions = checkpointed_stage(
        spark, f"{out}/02_mentions", "mentions",
        lambda: extract_mentions(pages, gazetteer_df(spark)))

    joined = checkpointed_stage(
        spark, f"{out}/03_join", "spatial_join",
        lambda: spatial_join(mentions, regions_df(spark, args.regions),
                             predicate="contains"))

    tiled = checkpointed_stage(
        spark, f"{out}/04_tiles", "tiles",
        lambda: assign_tiles(joined, s2_levels=(4, 8, 12),
                             mercator_zooms=(4, 8, 12)))

    rollup = checkpointed_stage(
        spark, f"{out}/05_rollup", "rollup",
        lambda: tiled.groupBy("region_id", "s2_cell_l8")
                     .agg(F.count("*").alias("n_mentions"),
                          F.countDistinct("url").alias("n_pages")))

    report = {
        "stages": {name: read_manifest(f"{out}/{d}")["totals"]
                   for name, d in [("pages", "01_pages"),
                                   ("mentions", "02_mentions"),
                                   ("join", "03_join"),
                                   ("tiles", "04_tiles"),
                                   ("rollup", "05_rollup")]},
        "rollup_rows": rollup.count(),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
