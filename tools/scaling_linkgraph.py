#!/usr/bin/env python
"""JVM-only scaling probe: webgraph.link_graph (scan-side regexp href
extraction + explode + partial-distinct agg, zero Python workers) at two
parallelism levels over the SAME cached pages corpus.

Complements tools/scaling.py (the extraction job, which pays Python
worker dispatch): if the JVM-only op scales better at the wide pair, the
extraction gap is the Python-worker/memory-system constant, not the
plan. Interleaved best-of-N legs, same protocol as scaling.py.

Usage: python tools/scaling_linkgraph.py [n_pages] [reps]
Prints one JSON line.
"""
from __future__ import annotations

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]

LEG = r'''
import sys, time
sys.path.insert(0, "%(repo)s")
from pyspark.sql import SparkSession
cpus = int(sys.argv[1]); pages_path = sys.argv[2]; reps = int(sys.argv[3])
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from docling_spark import webgraph
from functools import reduce
mult = int(sys.argv[4])
# ONE job with mult x the scan work: job-submit constants amortize
# inside the action instead of dominating a ~1s job
pages = reduce(lambda a, b: a.unionAll(b),
               [spark.read.parquet(pages_path) for _ in range(mult)])
best = None
for _ in range(reps):
    t0 = time.perf_counter()
    webgraph.link_graph(pages).selectExpr("sum(n_links)").collect()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print("LEGSEC", best)
'''


def run_leg(cpus: int, pages_path: str, reps: int,
            mult: int = 8) -> float:
    out = subprocess.run(
        [sys.executable, "-c", LEG % {"repo": REPO}, str(cpus),
         pages_path, str(reps), str(mult)],
        capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("LEGSEC"):
            return float(line.split()[1])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main():
    sys.path.insert(0, str(REPO))
    from docling_spark import pages as pages_mod
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    path = pages_mod.ensure_pages(n_pages)
    n_pages = n_pages * mult
    # interleave low/high passes so both legs see comparable box state
    lo = hi = None
    for _ in range(2):
        t = run_leg(8, path, reps, mult)
        lo = t if lo is None or t < lo else lo
        t = run_leg(32, path, reps, mult)
        hi = t if hi is None or t < hi else hi
    eff = (n_pages / hi) / (n_pages / lo) / (32 / 8)
    print(json.dumps({
        "op": "link_graph", "n_pages": n_pages,
        "low": {"cpus": 8, "sec": round(lo, 3),
                "pages_per_sec": round(n_pages / lo, 1)},
        "high": {"cpus": 32, "sec": round(hi, 3),
                 "pages_per_sec": round(n_pages / hi, 1)},
        "efficiency_8_to_32": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
