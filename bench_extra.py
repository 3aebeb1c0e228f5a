#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (guide §1.4): per-query
noop-sink isolation + .explain("formatted") capture.

NOT the measured bench - ``bench.py`` is frozen for the driver. This
harness exists so an optimization can be timed on the computation alone
(noop sink computes every column of every row, no driver collect cost)
and so plan claims in OPTIMIZATION_r*.md are reproducible.

Usage:
  python bench_extra.py q1 q2 ...      # time the named queries (noop sink)
  python bench_extra.py --all          # every query bench.py times
  python bench_extra.py --plans out_dir q1 q2 ...
                                       # write .explain("formatted") files
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_REPS (reps per leg,
default 3, interleaved passes like bench.py).
"""

from __future__ import annotations

import json
import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_REPS = max(1, int(os.environ.get("BENCH_REPS", "3")))


def _build_spark():
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("docling_spark_bench_extra")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entrymod

    args = [a for a in sys.argv[1:]]
    plans_dir = None
    if "--plans" in args:
        i = args.index("--plans")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            sys.exit("usage: bench_extra.py --plans OUT_DIR query ...")
        plans_dir = pathlib.Path(args[i + 1])
        plans_dir.mkdir(parents=True, exist_ok=True)
        del args[i:i + 2]
    run_all = "--all" in args
    if run_all:
        args.remove("--all")

    reg = entrymod._query_registry()
    names = list(reg) if run_all else args
    unknown = [n for n in names if n not in reg]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = _build_spark()
    sc = spark.sparkContext

    if plans_dir is not None:
        for name in names:
            df = reg[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}.txt").write_text(txt)
            print(f"wrote {plans_dir / (name + '.txt')}")
        spark.stop()
        return

    # warm python workers
    spark.range(CPUS * 4).selectExpr("id").repartition(CPUS).count()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _pass in range(N_REPS + 1):  # pass 0 = unrecorded warm pass
        for name in names:
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            _noop(reg[name](spark, SF_DIR))
            dt = time.perf_counter() - t0
            sc.setJobDescription(None)
            if _pass > 0:
                samples[name].append(dt)
    out = {}
    for name in names:
        xs = samples[name]
        med = statistics.median(xs)
        out[name] = {"median": round(med, 3),
                     "samples": [round(x, 3) for x in xs]}
        print(f"{name:28s} {med:8.3f}s  {out[name]['samples']}")
    print(json.dumps({"noop_medians": {k: v["median"]
                                       for k, v in out.items()},
                      "sf_dir": SF_DIR, "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
