"""Where does shuffle-path 2->8 scaling die?  Times the pipeline in
nested slices at two parallelism levels:
  scan        — parquet scan + count of the 3 join columns
  scan_key    — + leaf->fixed-level key (pure Column bit math)
  shuffled    — + repartition by the key (the fact-side exchange)
  full        — the complete join incl. parity refine + rollup
Each (cpus) level runs in its own subprocess; slices interleave x reps.
(The pre-refine candidate join is not separable from outside the
operator, so there is no isolated 'candidates' slice — full minus
shuffled approximates join + refine together.)
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from s2geography_spark.session import get_spark
from s2geography_spark.functions.cells import cell_join_key, cell_parent
from s2geography_spark.operators.spatial_join import spatial_join
from s2geography_spark.sources.regions import regions_df
from bench import materialize_mentions
spark = get_spark("decomp", cpus={cpus})
materialize_mentions(spark, {pages}, {path!r})
m = spark.read.parquet({path!r}).select("lng", "lat", "leaf")
regions = regions_df(spark, 96, covering_level=8)

def t_scan():
    return m.count()

def t_scan_key():
    return m.withColumn("_ck", cell_join_key(cell_parent(F.col("leaf"), 8))).count()

def t_shuffled():
    return m.withColumn("_ck", cell_join_key(cell_parent(F.col("leaf"), 8))) \
        .repartition(F.col("_ck")).count()

def t_full():
    j = spatial_join(m, regions, predicate="contains", broadcast=False,
                     salt=4, level=8, leaf_col="leaf")
    return j.groupBy("region_id").count().collect()

slices = {{"scan": t_scan, "scan_key": t_scan_key, "shuffled": t_shuffled,
           "full": t_full}}
for fn in slices.values():
    fn()
times = {{k: [] for k in slices}}
for rep in range({reps}):
    for k, fn in slices.items():
        t0 = time.time()
        fn()
        times[k].append(time.time() - t0)
out = {{k: round(statistics.median(v), 3) for k, v in times.items()}}
print("RESULT " + json.dumps(out))
"""


def run(code, timeout=3600):
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=timeout, cwd=REPO)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(p.stdout[-2000:] + p.stderr[-2000:])


def main():
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    path = f"/tmp/s2probe_mentions_{pages}"
    levels = {}
    for cpus in (2, 8):
        levels[cpus] = run(CHILD.format(repo=REPO, cpus=cpus, pages=pages,
                                        path=path, reps=reps))
        print(json.dumps({"cpus": cpus, **levels[cpus]}), flush=True)
    for k in levels[2]:
        e = levels[2][k] / levels[8][k] / 4.0
        print(json.dumps({"slice": k, "eff_2_to_8": round(e, 3)}), flush=True)


if __name__ == "__main__":
    main()
