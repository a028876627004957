"""Per-query profiling harness for the optimization round (bench.py is
FROZEN — this file is the guide-§1.4 isolation bench).

For each suite query: one untimed warmup, N timed reps of the SAME
`.count()` action bench.py times, plus the Spark job/stage counts the run
generated (jobs are the scheduling overhead that dominates the small-input
queries).  Optionally captures .explain('formatted') per query.

Usage:
  python bench_extra.py [--sf SF_DIR] [--reps N] [--queries a,b,c]
                        [--plans OUTDIR] [--flagship]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
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


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def job_stage_counts(sc, group: str):
    tracker = sc.statusTracker()
    jobs = tracker.getJobIdsForGroup(group)
    n_stages = 0
    for j in jobs:
        info = tracker.getJobInfo(j)
        if info is not None:
            n_stages += len(info.stageIds)
    return len(jobs), n_stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>.txt explain output")
    ap.add_argument("--flagship", action="store_true",
                    help="also run the flagship end-to-end + join-only")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from s2geography_spark.session import get_spark
    spark = get_spark("bench_extra", cpus=cpus)
    sc = spark.sparkContext

    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    names = args.queries.split(",") if args.queries else BENCH_QUERIES

    out = {}
    for name in names:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(plan_of(fn(spark, args.sf)))
        # warmup (codegen/JIT, prepared-dim memos — same as bench.py)
        sc.setJobGroup(f"{name}-warm", name)
        t0 = time.time()
        fn(spark, args.sf).count()
        warm = time.time() - t0
        reps = []
        for r in range(args.reps):
            grp = f"{name}-r{r}"
            sc.setJobGroup(grp, name)
            t0 = time.time()
            fn(spark, args.sf).count()
            reps.append(time.time() - t0)
        njobs, nstages = job_stage_counts(sc, grp)
        out[name] = {"warm": round(warm, 3),
                     "best": round(min(reps), 3),
                     "med": round(statistics.median(reps), 3),
                     "jobs": njobs, "stages": nstages}
        print(f"{name:24s} warm={warm:7.3f} best={min(reps):7.3f} "
              f"jobs={njobs:3d} stages={nstages:3d}", flush=True)

    if args.flagship:
        import bench as bench_mod
        sf = args.sf.rstrip("/").split("sf")[-1]
        n_pages = max(int(float(sf) * 2_000_000), 20_000)
        reps = []
        for i in range(4):
            ri, ro, dt = bench_mod.run_flagship(spark, n_pages)
            if i > 0:
                reps.append(dt)
        out["spatial_join_flagship"] = {
            "med": round(statistics.median(reps), 3),
            "min": round(min(reps), 3), "max": round(max(reps), 3)}
        print(f"flagship med={statistics.median(reps):.3f} "
              f"min={min(reps):.3f} max={max(reps):.3f}", flush=True)
        mpath = f"/tmp/s2bench_mentions_sf{sf}"
        bench_mod.materialize_mentions(spark, n_pages, mpath)
        jreps = []
        for i in range(4):
            _, _, jdt = bench_mod.run_join_bench(spark, mpath)
            if i > 0:
                jreps.append(jdt)
        out["spatial_join_only"] = {"med": round(statistics.median(jreps), 3),
                                    "min": round(min(jreps), 3)}
        print(f"join_only med={statistics.median(jreps):.3f}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
