"""Relational operators Spark lacks as single calls: as-of join, plus
rollup/cube convenience wrappers used by the entry-point queries.

The as-of join uses the union+window pattern - O(n log n) per key via one
shuffle/sort, no range-condition cross product - which is the strategy
that survives 100 TB (a theta-join on ``r.ts <= l.ts`` would explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` sharing the key ``on``.

    Implementation: tag and union both sides, sort within key by
    (ts, side) with right rows first on ties, then carry the last seen
    right values forward with ``last(..., ignorenulls=True)`` and keep
    only left rows. One shuffle on the key, one sort - no join explosion.
    """
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = right.withColumn("_side", F.lit(0)).withColumn("_ts", F.col(right_ts))

    # project the union schema explicitly: key, _ts, _side, left cols,
    # right value cols (renamed with suffix)
    lt_proj = lt.select(
        F.col(on), "_ts", "_side",
        *[F.col(c) for c in left.columns if c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in value_cols],
    )
    rt_proj = rt.select(
        F.col(on), "_ts", "_side",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    unioned = lt_proj.unionByName(rt_proj)
    w = (Window.partitionBy(on).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in value_cols:
        unioned = unioned.withColumn(
            f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w))
    return (unioned.where(F.col("_side") == 1)
            .drop("_side", "_ts"))


def rollup_agg(df: DataFrame, dims: list[str], aggs: list) -> DataFrame:
    return df.rollup(*dims).agg(*aggs)


def cube_agg(df: DataFrame, dims: list[str], aggs: list) -> DataFrame:
    return df.cube(*dims).agg(*aggs)


def event_funnel(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Ordered conversion funnel: for each user, step i counts only if
    it happened at-or-after the user's qualifying step i-1 time - the
    standard product-analytics funnel as one deterministic DataFrame.

    Plan shape: ONE hash aggregation per funnel depth, each a map-side
    partial groupBy(user) over the (already pruned) events scan joined
    against the previous step's (user, ts) table on the user key.  No
    windows, no self-cross-product: depth-k funnels cost k user-keyed
    shuffles of user-cardinality rows, independent of event volume.
    A hot user contributes one row per aggregation, so event-count
    skew collapses at the map side.
    """
    assert steps
    prev = (events.where(F.col(type_col) == steps[0])
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t0")))
    out_rows = [prev.select(
        F.lit(0).alias("step_idx"), F.lit(steps[0]).alias("step"),
        F.col(user_col)).groupBy("step_idx", "step")
        .agg(F.count(F.lit(1)).alias("n_users"))]
    for i, step in enumerate(steps[1:], start=1):
        cur = (events.where(F.col(type_col) == step)
               .join(prev, user_col)
               .where(F.col(ts_col) >= F.col("t0"))
               .groupBy(user_col)
               .agg(F.min(ts_col).alias("t0")))
        out_rows.append(cur.select(
            F.lit(i).alias("step_idx"), F.lit(step).alias("step"),
            F.col(user_col)).groupBy("step_idx", "step")
            .agg(F.count(F.lit(1)).alias("n_users")))
        prev = cur
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out.select("step_idx", "step",
                      F.col("n_users").cast("long").alias("n_users"))


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Weekly cohort-retention triangle: users are cohorted by the
    week of their first event; each (cohort_week, week_offset) cell
    counts how many of that cohort were active ``week_offset`` weeks
    later, plus the retention rate - the standard product-analytics
    retention matrix as one deterministic DataFrame.

    Plan shape: two user-keyed aggregations (first-event min and the
    distinct (user, week) activity set - both collapse map-side, so a
    hot user contributes one partial row per partition per week), one
    user-keyed join between two already-user-partitioned sides, and a
    final agg down to the weeks x offsets triangle.  Cohort sizes are
    a weeks-cardinality table joined back by broadcast.  Event-volume
    skew never reaches the join: both join inputs are user-cardinality.
    """
    week = F.date_trunc("week", F.col(ts_col))
    firsts = (events.groupBy(user_col)
              .agg(F.min(ts_col).alias("first_ts")))
    cohorts = firsts.select(
        user_col, F.date_trunc("week", "first_ts").alias("cohort_week"))
    activity = (events
                .select(F.col(user_col), week.alias("week"))
                .distinct())
    offset = (F.datediff(F.col("week").cast("date"),
                         F.col("cohort_week").cast("date"))
              / 7).cast("int")
    cells = (activity.join(cohorts, user_col)
             .groupBy("cohort_week", offset.alias("week_offset"))
             .agg(F.count(F.lit(1)).alias("active_users")))
    sizes = (cohorts.groupBy("cohort_week")
             .agg(F.count(F.lit(1)).alias("cohort_users")))
    return (cells.join(F.broadcast(sizes), "cohort_week")
            .select("cohort_week",
                    F.col("week_offset"),
                    F.col("cohort_users").cast("long").alias("cohort_users"),
                    F.col("active_users").cast("long").alias("active_users"),
                    F.round(F.col("active_users") / F.col("cohort_users"), 4)
                     .alias("retention")))
