"""Two-parallelism scaling benchmark (north-rule evidence).

No real cluster exists in this sandbox, so per BASELINE.md the N -> 4N
executor criterion is evidenced by running the identical flagship spatial
join at local[8] and local[32] on the same input and reporting throughput
at both plus the scaling efficiency.  Each parallelism level runs in its
own subprocess (a JVM's local master is fixed at startup).

Writes/updates BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from s2geography_spark.session import get_spark
from bench import run_flagship
spark = get_spark("scaling", cpus={cpus})
run_flagship(spark, 20000)   # warm-up: python workers, region cache, codegen
best = None
for _ in range({reps}):
    t0 = time.time()
    ri, ro, dt = run_flagship(spark, {pages})
    if best is None or dt < best[2]:
        best = (ri, ro, dt)
print("RESULT " + json.dumps({{"cpus": {cpus}, "mentions": best[0],
    "out": best[1], "sec": round(best[2], 3),
    "rows_per_sec": round(best[0]/best[2], 1)}}))
"""


def run_level(cpus: int, pages: int, reps: int = 2) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, pages=pages, reps=reps)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800, check=False)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child failed (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    pages = int(os.environ.get("SCALING_PAGES", "800000"))
    lo = run_level(8, pages)
    hi = run_level(32, pages)
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / 4.0
    summary = {
        "input_pages": pages,
        "mentions": lo["mentions"],
        "local8": lo,
        "local32": hi,
        "speedup_8_to_32": round(hi["rows_per_sec"] / lo["rows_per_sec"], 3),
        "scaling_efficiency_n_to_4n": round(eff, 3),
        "target": ">= 0.8",
    }
    print(json.dumps(summary, indent=1))
    md = f"""# BENCH/BASELINE — measured engine numbers

## Two-parallelism scaling (north-rule evidence, sandbox proxy for N->4N executors)

Flagship spatial join (pages -> extraction -> cover/explode/broadcast-join ->
vectorized PIP refine -> rollup) on identical input
({pages:,} pages, {lo['mentions']:,} mentions, 96 regions), best of 2 runs
per level after warm-up:

| parallelism | wall sec | rows/sec |
|---|---|---|
| local[8]  | {lo['sec']} | {lo['rows_per_sec']:,} |
| local[32] | {hi['sec']} | {hi['rows_per_sec']:,} |

- speedup 8 -> 32 cores (4x): **{summary['speedup_8_to_32']}x**
- scaling efficiency (speedup / 4): **{summary['scaling_efficiency_n_to_4n']}** (target >= 0.8)

Run: `python scripts/scaling_bench.py` (env `SCALING_PAGES` to resize).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
