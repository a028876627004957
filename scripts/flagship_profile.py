"""Stage-timing probe for the flagship bench (VERDICT r4 #1): breaks the
cold end-to-end flagship join into measurable stages and runs interleaved
reps so the headline number and its dispersion are reproducible.

Usage: python scripts/flagship_profile.py [n_pages] [cpus] [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one_rep(spark, n_pages, level):
    from pyspark.sql import functions as F
    from s2geography_spark.operators.spatial_join import (prepare_regions,
                                                          spatial_join)
    from s2geography_spark.sources.pages import (extract_mentions,
                                                 gazetteer_df, pages_df)
    from s2geography_spark.sources.regions import regions_df

    stages = {}
    t0 = time.time()
    regions = regions_df(spark, 96, covering_level=level)
    stages["regions_df"] = time.time() - t0

    t0 = time.time()
    prep = prepare_regions(spark, regions)
    stages["dim_prep"] = time.time() - t0

    # extraction alone: count() forces generation + extraction only
    pages = pages_df(spark, n_pages)
    mentions = extract_mentions(pages, gazetteer_df(spark))
    t0 = time.time()
    n_mentions = mentions.count()
    stages["extract_only"] = time.time() - t0

    # full join path (re-runs extraction inside: not cached, as in bench)
    t0 = time.time()
    joined = spatial_join(mentions, prep, predicate="contains", level=level)
    out = joined.groupBy("region_id").agg(F.count("*").alias("n")).collect()
    stages["extract_join_rollup"] = time.time() - t0
    stages["join_minus_extract"] = stages["extract_join_rollup"] - stages["extract_only"]
    stages["rows_out"] = int(sum(r.n for r in out))
    stages["n_mentions"] = int(n_mentions)
    return stages


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from s2geography_spark.session import get_spark
    spark = get_spark("flagship-profile", cpus=cpus)

    for level in (6, 8):
        runs = []
        for r in range(reps + 1):  # rep 0 = warmup
            st = one_rep(spark, n_pages, level)
            tag = "warmup" if r == 0 else f"rep{r}"
            print(json.dumps({"level": level, "rep": tag,
                              **{k: (round(v, 3) if isinstance(v, float) else v)
                                 for k, v in st.items()}}), flush=True)
            if r > 0:
                runs.append(st)
        med = sorted(s["extract_join_rollup"] for s in runs)[len(runs) // 2]
        print(json.dumps({"level": level, "median_end_to_end": round(med, 3),
                          "min": round(min(s["extract_join_rollup"] for s in runs), 3),
                          "max": round(max(s["extract_join_rollup"] for s in runs), 3)}),
              flush=True)


if __name__ == "__main__":
    main()
