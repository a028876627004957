"""Quick interleaved probe: shuffle-path refine modes (rows-WKB vs
subdivided parity) at two parallelism levels — the 2->8-core scaling
evidence for the round-5 refine change.

Usage: python scripts/shuffle_probe.py [pages] [reps]
Runs each (cpus, mode) in its own subprocess (local master is fixed at JVM
start); modes interleave within a session, medians out.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
from s2geography_spark.session import get_spark
from bench import materialize_mentions, run_join_bench_shuffle
spark = get_spark("probe", cpus={cpus})
materialize_mentions(spark, {pages}, {path!r})
modes = ["rows", "subdivided"]
for m in modes:
    run_join_bench_shuffle(spark, {path!r}, refine_mode=m)  # warmup
times = {{m: [] for m in modes}}
meta = {{}}
for rep in range({reps}):
    for m in modes:
        ri, ro, dt = run_join_bench_shuffle(spark, {path!r}, refine_mode=m)
        times[m].append(dt)
        meta[m] = (ri, ro)
out = {{m: {{"sec": round(statistics.median(v), 3),
            "min": round(min(v), 3), "max": round(max(v), 3),
            "rows_in": meta[m][0], "rows_out": meta[m][1]}}
       for m, v in times.items()}}
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
    for m in ("rows", "subdivided"):
        e = (levels[2][m]["sec"] / levels[8][m]["sec"]) / 4.0
        print(json.dumps({"mode": m, "eff_2_to_8": round(e, 3)}), flush=True)


if __name__ == "__main__":
    main()
