"""as-of join and rollup/cube operator tests."""

from datetime import datetime

from pyspark.sql import functions as F

from docling_spark import relational


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0), "l1"),
         (1, datetime(2024, 1, 1, 12, 0), "l2"),
         (2, datetime(2024, 1, 1, 11, 0), "l3")],
        "k long, lts timestamp, lval string")
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9, 0), "r-early"),
         (1, datetime(2024, 1, 1, 11, 0), "r-mid"),
         (2, datetime(2024, 1, 1, 11, 30), "r-late")],
        "k long, rts timestamp, rval string")
    out = relational.asof_join(left, right, on="k", left_ts="lts",
                               right_ts="rts", value_cols=["rval"])
    got = {r["lval"]: r["rval_asof"] for r in out.collect()}
    # l1@10:00 -> r-early@9:00; l2@12:00 -> r-mid@11:00;
    # l3@11:00 -> nothing prior for key 2 (r-late is 11:30)
    assert got == {"l1": "r-early", "l2": "r-mid", "l3": None}


def test_asof_join_tie_takes_equal_ts(spark):
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0), "l")],
        "k long, lts timestamp, lval string")
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0), "r-same")],
        "k long, rts timestamp, rval string")
    out = relational.asof_join(left, right, on="k", left_ts="lts",
                               right_ts="rts", value_cols=["rval"])
    assert out.collect()[0]["rval_asof"] == "r-same"


def test_asof_plan_has_no_cartesian(spark):
    left = spark.range(100).selectExpr(
        "id % 10 k", "timestamp_seconds(id * 60) lts", "id lval")
    right = spark.range(50).selectExpr(
        "id % 10 k", "timestamp_seconds(id * 100) rts", "id rval")
    out = relational.asof_join(left, right, on="k", left_ts="lts",
                               right_ts="rts", value_cols=["rval"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rollup_and_cube_shapes(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)],
        "d1 string, d2 string, v double")
    roll = relational.rollup_agg(df, ["d1", "d2"],
                                 [F.sum("v").alias("s")]).collect()
    # 3 leaf + 2 d1-subtotals + 1 grand total
    assert len(roll) == 6
    cube = relational.cube_agg(df, ["d1", "d2"],
                               [F.sum("v").alias("s")]).collect()
    # 3 leaf + 2 d1 + 2 d2 + 1 total
    assert len(cube) == 8
    grand = [r for r in cube if r["d1"] is None and r["d2"] is None]
    assert grand[0]["s"] == 6.0
