"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is the flagship spatial join (cover + PIP refine)
throughput; extra keys report rows/sec and per-query timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_flagship(spark, n_pages: int):
    """pages -> extraction -> spatial join -> rollup; returns (rows_in,
    rows_out, seconds)."""
    from pyspark.sql import functions as F
    from s2geography_spark.operators.spatial_join import spatial_join
    from s2geography_spark.sources.pages import (extract_mentions,
                                                 gazetteer_df, pages_df)
    from s2geography_spark.sources.regions import regions_df

    pages = pages_df(spark, n_pages)
    mentions = extract_mentions(pages, gazetteer_df(spark))
    # covering level is a cost-based choice: this flagship is a ONE-SHOT
    # cold join that pays the dim prep inside the timer, where level 6's
    # cheaper prep wins.  Round-5 measurement (after the single-collect
    # PreparedRegions rewrite, scripts/flagship_profile.py, 200k pages,
    # 32 cores, interleaved medians): prep 0.9 s + join 1.8 s at level 6
    # vs prep 2.2 s + join 1.7 s at level 8.  The repeated /
    # pre-materialized benches and the driver queries use level 8, whose
    # higher interior-cell fraction pays off when the join repeats.
    regions = regions_df(spark, 96, covering_level=6)
    t0 = time.time()
    joined = spatial_join(mentions, regions, predicate="contains", level=6)
    out = joined.groupBy("region_id").agg(F.count("*").alias("n")).collect()
    dt = time.time() - t0
    rows_in = int(sum(i % 6 for i in range(n_pages)))  # exact mention count
    rows_out = int(sum(r.n for r in out))
    return rows_in, rows_out, dt


def materialize_mentions(spark, n_pages: int, path: str):
    """One-time corpus materialization (the 'Iceberg table' the join reads).
    Idempotent: skipped when the parquet already exists with a _SUCCESS."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pyspark.sql import functions as F
        from s2geography_spark.operators.spatial_join import leaf_cell_udf
        from s2geography_spark.sources.pages import (extract_mentions,
                                                     gazetteer_df, pages_df)
        mentions = extract_mentions(pages_df(spark, n_pages), gazetteer_df(spark))
        # embedded-covering ingest pattern: persist the leaf cell id so the
        # join never recomputes it (geography_interface.h:150-158 analog)
        mentions = mentions.withColumn("leaf", leaf_cell_udf(F.col("lng"), F.col("lat")))
        mentions.write.mode("overwrite").parquet(path)
    return path


def materialize_mentions_bucketed(spark, n_pages: int, table: str,
                                  level: int = 8, n_buckets: int = 64):
    """Bucketed-corpus ingest (the 100 TB shuffle-path answer): materialize
    mentions WITH the fixed-level mixed join key and bucket the table by it.
    The one-time bucketing shuffle is paid here; every subsequent
    spatial_join(key_col='ck') — and every RERUN — then joins with NO
    fact-side exchange (only the small exploded dim shuffles to the bucket
    count).  Idempotent per table name."""
    from urllib.parse import urlparse
    from pyspark.sql import functions as F
    from s2geography_spark.functions.cells import cell_join_key, cell_parent
    from s2geography_spark.operators.spatial_join import leaf_cell_udf
    from s2geography_spark.sources.pages import (extract_mentions,
                                                 gazetteer_df, pages_df)
    if spark.catalog.tableExists(table):
        return table
    # Spark's default in-memory catalog forgets tables between sessions but
    # the warehouse directory persists: if a prior session already paid the
    # bucketed ingest, re-register the files as an external bucketed table
    # (bucket ids are encoded in the file names, so the bucket spec in the
    # DDL restores exchange-free joins without rewriting anything)
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, table)
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        mentions = extract_mentions(pages_df(spark, n_pages),
                                    gazetteer_df(spark))
        mentions = (mentions
                    .withColumn("leaf", leaf_cell_udf(F.col("lng"), F.col("lat")))
                    .withColumn("ck", cell_join_key(
                        cell_parent(F.col("leaf"), level)))
                    .select("lng", "lat", "ck"))
        (mentions.write.mode("overwrite")
         .option("path", loc)
         .bucketBy(n_buckets, "ck").sortBy("ck")
         .format("parquet").saveAsTable(table))
        return table
    spark.sql(f"""
        CREATE TABLE {table} (lng double, lat double, ck bigint)
        USING parquet
        CLUSTERED BY (ck) SORTED BY (ck) INTO {n_buckets} BUCKETS
        LOCATION '{loc}'
    """)
    return table


def run_join_bench_bucketed(spark, table: str, level: int = 8):
    """Shuffle-path join over the BUCKETED corpus: zero fact-side exchange
    (plan-asserted), dim explodes + shuffles to the bucket count.  `level`
    must match the ingest level the table's `ck` key was built at."""
    from pyspark.sql import functions as F
    from s2geography_spark.operators.spatial_join import spatial_join
    from s2geography_spark.sources.regions import regions_df

    mentions = spark.table(table)
    regions = regions_df(spark, 96, covering_level=level)
    t0 = time.time()
    joined = spatial_join(mentions, regions, predicate="contains",
                          broadcast=False, level=level, key_col="ck",
                          refine_mode="subdivided")
    out = joined.groupBy("region_id").agg(F.count("*").alias("n")).collect()
    dt = time.time() - t0
    rows_out = int(sum(r.n for r in out))
    rows_in = mentions.count()
    return int(rows_in), rows_out, dt


_PREPARED = {}


def run_join_bench(spark, mentions_path: str):
    """THE headline metric: spatial-join rows/sec (cover + PIP refine) over
    a pre-materialized mention table — scan -> leaf cell -> fixed-level key
    -> broadcast cover join -> bbox prefilter -> vectorized PIP refine ->
    rollup.  The dim side is prepared once (ShapeIndex analog) and reused."""
    from pyspark.sql import functions as F
    from s2geography_spark.operators.spatial_join import (prepare_regions,
                                                          spatial_join)
    from s2geography_spark.sources.regions import regions_df

    mentions = spark.read.parquet(mentions_path)
    # applicationId, not id(spark): a dead context's id can recycle
    key = spark.sparkContext.applicationId
    if key not in _PREPARED:
        _PREPARED.clear()
        _PREPARED[key] = prepare_regions(
            spark, regions_df(spark, 96, covering_level=8))
    leaf = "leaf" if "leaf" in mentions.columns else None
    t0 = time.time()
    joined = spatial_join(mentions, _PREPARED[key], predicate="contains",
                          level=8, leaf_col=leaf)
    out = joined.groupBy("region_id").agg(F.count("*").alias("n")).collect()
    dt = time.time() - t0
    rows_out = int(sum(r.n for r in out))
    rows_in = mentions.count()
    return int(rows_in), rows_out, dt


_PREPARED_SUB = {}


def run_scan_floor(spark, mentions_path: str):
    """Bandwidth floor control: scan the SAME columns the shuffle join
    scans (lng, lat, leaf) and reduce them with a trivial JVM aggregate —
    no join, no Python, no exchange beyond the final 1-row rollup.  Any
    join over this input can never beat this wall time, and on a
    memory-bus-saturated host its parallel-scaling ratio is the ceiling
    for every scan-dominated mode (see BENCH/BASELINE.md Analysis)."""
    from pyspark.sql import functions as F

    mentions = spark.read.parquet(mentions_path)
    cols = [c for c in ("lng", "lat", "leaf") if c in mentions.columns]
    # bit_xor for the integer column: ANSI mode overflow-checks sum(bigint)
    aggs = [F.bit_xor(c).alias(f"s_{c}") if c == "leaf"
            else F.sum(c).alias(f"s_{c}") for c in cols]
    t0 = time.time()
    row = (mentions.select(*cols)
           .agg(F.count("*").alias("n"), *aggs).collect()[0])
    dt = time.time() - t0
    return int(row.n), 0, dt


def run_join_bench_shuffle(spark, mentions_path: str, salt: int = 4,
                           refine_mode: str = "auto",
                           prefilter: bool = True,
                           prepared: bool = False):
    """Shuffle-path variant of the headline join (broadcast=False): region
    WKB travels with rows through a hash-partitioned equi-join on the
    (salted) cell key — the mode a non-broadcastable dim takes.  Used by
    the scaling bench to evidence the north rule on BOTH join modes.

    prepared=True reuses a PreparedRegionsSubdivided across calls (the
    repeated-join configuration: dim state built once, OUTSIDE the timer —
    the ShapeIndex-reuse analog of run_join_bench's PreparedRegions)."""
    from pyspark.sql import functions as F
    from s2geography_spark.operators.spatial_join import (
        prepare_regions_subdivided, spatial_join)
    from s2geography_spark.sources.regions import regions_df

    mentions = spark.read.parquet(mentions_path)
    # covering_level=8 (round-4 measurement, 20M-mention probe): finer dim
    # cells raise the interior-cell fraction, so most candidates skip the
    # Python refine's Arrow hop entirely — 3.63 s -> 2.10 s at 8 cores and
    # 2->8 scaling 0.43 -> 0.65 vs level 6; the fact side still emits ONE
    # key per point, only the (tiny) exploded dim grows 16x
    if prepared:
        key = spark.sparkContext.applicationId
        if key not in _PREPARED_SUB:
            _PREPARED_SUB.clear()
            _PREPARED_SUB[key] = prepare_regions_subdivided(
                spark, regions_df(spark, 96, covering_level=8))
        regions = _PREPARED_SUB[key]
    else:
        regions = regions_df(spark, 96, covering_level=8)
    leaf = "leaf" if "leaf" in mentions.columns else None
    # column pruning BEFORE the fact-side shuffle: the rollup needs only
    # the coordinates (+ the ingest leaf cell); shuffling the url string
    # would triple the exchange bytes for nothing
    cols = ["lng", "lat"] + (["leaf"] if leaf else [])
    mentions = mentions.select(*cols)
    t0 = time.time()
    joined = spatial_join(mentions, regions, predicate="contains",
                          broadcast=False, salt=salt, level=8, leaf_col=leaf,
                          refine_mode=refine_mode, prefilter=prefilter)
    out = joined.groupBy("region_id").agg(F.count("*").alias("n")).collect()
    dt = time.time() - t0
    rows_out = int(sum(r.n for r in out))
    rows_in = mentions.count()
    return int(rows_in), rows_out, dt


def materialize_mentions_dense(spark, n_pages: int, path: str):
    """Geo-DENSE corpus: only the mentions whose level-8 ancestor cell lies
    in the 96-region covering set (a broadcast left-semi at ingest — pure
    Column bit math on the stored leaf, no shuffle, no Python).

    This is the adversarial input for the SHUFFLE join: the runtime
    semi-join prefilter removes ~nothing, so ~every scanned row rides the
    hash exchange and the PIP refine.  Real 100 TB corpora of this shape
    exist — GPS traces, check-ins, geotagged media — facts cluster where
    the dim covers.  The sparse web corpus measures the prefilter's win;
    this one measures how the exchange+refine machinery itself scales,
    which is what executor count buys on a real cluster."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pyspark.sql import functions as F
        from s2geography_spark.functions.cells import (cell_join_key,
                                                       cell_parent)
        from s2geography_spark.operators.spatial_join import leaf_cell_udf
        from s2geography_spark.sources.pages import (extract_mentions,
                                                     gazetteer_df, pages_df)
        from s2geography_spark.sources.regions import regions_df
        m = extract_mentions(pages_df(spark, n_pages), gazetteer_df(spark))
        m = m.withColumn("leaf", leaf_cell_udf(F.col("lng"), F.col("lat")))
        cov = (regions_df(spark, 96, covering_level=8)
               .select(F.explode("covering").alias("_c"))
               .select(cell_join_key(F.col("_c")).alias("_ckf")).distinct())
        m = m.join(F.broadcast(cov),
                   cell_join_key(cell_parent(F.col("leaf"), 8))
                   == cov["_ckf"], "left_semi")
        m.write.mode("overwrite").parquet(path)
    return path


def materialize_mentions_cellcenter(spark, n_pages: int, path: str):
    """CELL_CENTER compact corpus (the reference's >= level-23 tagged
    point encoding): the ONLY fact column is the 8 B leaf cell id —
    3x fewer bytes through every downstream exchange than lng/lat+key."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pyspark.sql import functions as F
        from s2geography_spark.operators.spatial_join import leaf_cell_udf
        from s2geography_spark.sources.pages import (extract_mentions,
                                                     gazetteer_df, pages_df)
        mentions = extract_mentions(pages_df(spark, n_pages),
                                    gazetteer_df(spark))
        mentions.select(leaf_cell_udf(F.col("lng"), F.col("lat"))
                        .alias("leaf")).write.mode("overwrite").parquet(path)
    return path


def run_join_bench_cellcenter(spark, mentions_path: str, salt: int = 4):
    """Shuffle join over the CELL_CENTER corpus: coords='leaf' — the fact
    exchange moves one bigint per row; the refine reconstructs the exact
    cell center (quantization semantics of the compact tagged ingest)."""
    from pyspark.sql import functions as F
    from s2geography_spark.operators.spatial_join import spatial_join
    from s2geography_spark.sources.regions import regions_df

    mentions = spark.read.parquet(mentions_path)
    regions = regions_df(spark, 96, covering_level=8)
    t0 = time.time()
    joined = spatial_join(mentions, regions, predicate="contains",
                          broadcast=False, salt=salt, level=8,
                          leaf_col="leaf", coords="leaf",
                          refine_mode="subdivided")
    out = joined.groupBy("region_id").agg(F.count("*").alias("n")).collect()
    dt = time.time() - t0
    rows_out = int(sum(r.n for r in out))
    rows_in = mentions.count()
    return int(rows_in), rows_out, dt


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from s2geography_spark.session import get_spark
    spark = get_spark("bench", cpus=cpus)

    import __spark_entry__ as entry_mod

    # flagship spatial join scaled with sf (~2.5 mentions/page).
    # Interleaved-median protocol (round-4 verdict: a single cold sample
    # ranged 2.7-19.8 s across reps on this drifting host): one untimed
    # warmup then 3 timed reps, report the MEDIAN with min/max dispersion.
    import statistics
    n_pages = max(int(float(sf) * 2_000_000), 20_000)
    flagship_reps = []
    for i in range(4):
        rows_in, rows_out, dt = run_flagship(spark, n_pages)
        if i > 0:
            flagship_reps.append(dt)
    join_sec = statistics.median(flagship_reps)

    # headline metric: join-only over pre-materialized mentions (the
    # BASELINE.json "spatial-join rows/sec (cover+PIP refine)")
    mpath = f"/tmp/s2bench_mentions_sf{sf}"
    materialize_mentions(spark, n_pages, mpath)
    join_only_reps = []
    for i in range(4):
        jri, jro, jdt = run_join_bench(spark, mpath)
        if i > 0:
            join_only_reps.append(jdt)
    jdt = statistics.median(join_only_reps)

    timings = {"spatial_join_flagship": round(join_sec, 3),
               "spatial_join_only": round(jdt, 3)}
    bench_queries = [
        "geo_pip_pairs", "geo_knn", "geo_dwithin_500km", "geo_bbox_nation",
        "geo_overlay_adjacent", "geo_tiles_z8", "geo_centroid_nation",
        "geo_buffer_area", "geo_convex_hull", "geo_maxdistance",
        "geo_closest_point", "geo_line_interp", "geo_perimeter",
        "text_stats", "lang_id", "dedup_exact", "minhash_lsh", "simhash",
        "ann_topk", "embedding_near_dup", "lineitem_agg", "events_window",
        "events_sessions", "text_quality", "geo_zm_interp", "media_stats",
        "text_repetition", "url_canon", "html_text", "vector_tiles_z6",
        "geo_pip_counts_agg", "seq_packing",
    ]
    qs = entry_mod.queries()
    # one untimed warmup execution per query: on this JVM the FIRST run of
    # a plan pays 3-25s of whole-stage-codegen + JIT compilation (measured:
    # identical query drops 29.9s -> 4.9s by run 3); steady-state is what a
    # long-lived cluster job sees, so that is what the suite reports
    for name in bench_queries:
        qs[name](spark, sf_dir).count()
    # best of 2 timed runs: this shared host drifts 2-3x between otherwise
    # identical executions; the minimum is the reproducible number
    for name in bench_queries:
        best = None
        for _rep in range(2):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            _ = n
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "spatial-join rows/sec (cover+PIP refine) + query suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "spatial_join": {
            "mentions_in": rows_in,
            "join_rows_out": rows_out,
            "end_to_end_seconds": round(join_sec, 3),
            "end_to_end_min_max": [round(min(flagship_reps), 3),
                                   round(max(flagship_reps), 3)],
            "end_to_end_rows_per_sec": round(rows_in / join_sec, 1),
            "join_only_seconds": round(jdt, 3),
            "join_only_min_max": [round(min(join_only_reps), 3),
                                  round(max(join_only_reps), 3)],
            "join_only_rows_per_sec": round(jri / jdt, 1),
        },
        "cpus": cpus,
        "warmup_runs": 1,
    }))


if __name__ == "__main__":
    main()
