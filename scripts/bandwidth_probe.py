"""Control experiment backing BENCH/BASELINE.md's 8->32 saturation analysis.

Two probes on the same box:
  1. compute-bound: multiprocessing md5 chains (no memory streaming)
  2. stream-bound: per-process NumPy passes over ~1 GB arrays

If (1) scales to ~4x from 8->32 processes while (2) plateaus, the host's
memory bandwidth — not the engine's plan — is the 32-core ceiling.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import time

import numpy as np


def burn_cpu(_):
    h = b"x"
    for _i in range(4_000_000):
        h = hashlib.md5(h).digest()
    return 1


def burn_stream(_):
    a = np.arange(40_000_000, dtype=np.float64)  # ~320 MB
    s = 0.0
    for _i in range(4):
        s += float((a * 1.0000001 + 0.5).sum())
    return s


def timed(fn, n):
    t0 = time.time()
    with mp.Pool(n) as p:
        p.map(fn, range(n))
    return time.time() - t0


def main():
    out = {}
    for name, fn in (("cpu_md5", burn_cpu), ("stream_numpy", burn_stream)):
        t1 = timed(fn, 1)
        res = {1: round(t1, 2)}
        for n in (8, 32):
            tn = timed(fn, n)
            res[n] = round(tn, 2)
            res[f"effective_cores_at_{n}"] = round(n * t1 / tn, 1)
        out[name] = res
    out["interpretation"] = (
        "cpu_md5 effective cores ~= process count (the box has real cores); "
        "stream_numpy effective cores plateau = the memory-bandwidth ceiling "
        "that caps any streaming engine stage beyond ~8 workers")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
