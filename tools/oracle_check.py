#!/usr/bin/env python
"""Local approximation of the driver's correctness gate.

Runs every queries() entry on Spark (local) and, where an oracle exists,
the oracle SQL on DuckDB over the same parquet tables; compares row count,
column names, and order-insensitive values (columns sorted by name, rows
sorted, values normalized).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_val(v):
    """Type-TAGGED normalization: a float64 3.0 and an int64 3 must NOT
    collapse to the same token, or oracle-side type artifacts (e.g.
    DuckDB HUGEINT fetched as float64) hide here while the driver's
    dtype-sensitive hasher flags them (round-2 verdict, event_sessions).
    Floats keep full repr precision, not a lossy %.6g."""
    import datetime

    import numpy as np
    if v is None or v is getattr(np, "nan", None):
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        fv = float(v)
        if math.isnan(fv):
            return "f:NaN"
        return f"f:{fv!r}"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    if isinstance(v, datetime.datetime):
        return "t:" + v.strftime("%Y-%m-%d %H:%M:%S.%f")
    try:
        import pandas as pd
        if v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, pd.Timestamp):
            return "t:" + v.strftime("%Y-%m-%d %H:%M:%S.%f")
    except Exception:
        pass
    return "s:" + str(v)


def frame_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append("|".join(norm_val(row[i]) for i in order))
    out.sort()
    return out


def pandas_rows(df):
    """(cols, rows) from a pandas frame, preserving dtypes per cell —
    the same representation the driver's canonicalizer sees."""
    cols = list(df.columns)
    rows = [tuple(rec) for rec in df.itertuples(index=False, name=None)]
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "6g")
             .config("spark.ui.enabled", "false")
             .appName("oracle_check").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if pathlib.Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    passed = failed = rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            # Pandas fetch, like the driver — dtype artifacts must surface.
            scols, srows = pandas_rows(sdf.toPandas())
        except Exception as e:
            print(f"{name:32s} SPARK ERROR: {type(e).__name__}: {e}")
            failed += 1
            continue
        if name not in oracles:
            print(f"{name:32s} rows-only: {len(srows)} rows "
                  f"({len(scols)} cols)")
            rows_only += 1
            continue
        try:
            ocols, orows = pandas_rows(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"{name:32s} ORACLE ERROR: {type(e).__name__}: {e}")
            failed += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not problems:
            s_repr = frame_repr(scols, srows)
            o_repr = frame_repr(ocols, orows)
            if s_repr != o_repr:
                mism = sum(1 for a, b in zip(s_repr, o_repr) if a != b)
                problems.append(f"values differ in {mism}/{len(s_repr)} rows")
                for a, b in list(zip(s_repr, o_repr))[:200]:
                    if a != b:
                        problems.append(f"  spark: {a[:160]}")
                        problems.append(f"  duck : {b[:160]}")
                        break
        if problems:
            print(f"{name:32s} MISMATCH: " + "; ".join(problems[:4]))
            failed += 1
        else:
            print(f"{name:32s} OK ({len(srows)} rows)")
            passed += 1
    print(f"\nPASS {passed}  FAIL {failed}  ROWS-ONLY {rows_only}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
