"""ConfidenceReport analog: doc-level quality scores + grade buckets.

Mirrors the reference's ``ConfidenceReport`` / ``PageConfidenceScores``
(``/root/reference/docling/datamodel/base_models.py:591-727``): four
nullable scores (parse/layout/table/ocr), ``mean_score`` = nanmean,
``low_score`` = nanquantile(q=0.05, linear interpolation - numpy's
default), and grade buckets ``_score_to_grade`` (<0.5 poor, <0.8 fair,
<0.9 good, >=0.9 excellent, NaN -> unspecified).

Everything is pure column algebra (array_sort + element_at interpolation,
no Python), so the identical arithmetic is expressible in the DuckDB
oracle and the whole projection stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def grade(score: Column) -> Column:
    """Reference `_score_to_grade`; null/NaN falls through to unspecified."""
    return (F.when(score < 0.5, "poor")
            .when(score < 0.8, "fair")
            .when(score < 0.9, "good")
            .when(score >= 0.9, "excellent")
            .otherwise("unspecified"))


def _scores_array(cols: list) -> Column:
    """Sorted array of the non-null scores (the 'nan-dropped' sample)."""
    return F.array_sort(
        F.filter(F.array(*[c.cast("double") for c in cols]),
                 lambda c: c.isNotNull()))


def nanmean(cols: list) -> Column:
    arr = _scores_array(cols)
    n = F.size(arr)
    return F.when(
        n > 0,
        F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v) / n)


def nanquantile_low(cols: list, q: float = 0.05) -> Column:
    """numpy nanquantile with linear interpolation at position q*(n-1)."""
    arr = _scores_array(cols)
    n = F.size(arr)
    pos = F.lit(q) * (n - 1).cast("double")
    lo = F.floor(pos).cast("int")
    frac = pos - lo.cast("double")
    v_lo = F.element_at(arr, lo + 1)
    v_hi = F.element_at(arr, F.least(lo + 2, n))
    return F.when(n > 0, v_lo + frac * (v_hi - v_lo))


def confidence_report(df: DataFrame, parse_score: Column,
                      layout_score: Column, table_score: Column,
                      ocr_score: Column) -> DataFrame:
    """Append the ConfidenceReport columns to ``df``.

    Adds: parse/layout/table/ocr score columns plus mean_score, low_score,
    mean_grade, low_grade (rounded to 6 decimals for oracle stability).
    """
    out = (df.withColumn("parse_score", parse_score.cast("double"))
           .withColumn("layout_score", layout_score.cast("double"))
           .withColumn("table_score", table_score.cast("double"))
           .withColumn("ocr_score", ocr_score.cast("double")))
    scores = [F.col("parse_score"), F.col("layout_score"),
              F.col("table_score"), F.col("ocr_score")]
    out = (out.withColumn("mean_score", F.round(nanmean(scores), 6))
           .withColumn("low_score", F.round(nanquantile_low(scores), 6)))
    return (out.withColumn("mean_grade", grade(F.col("mean_score")))
            .withColumn("low_grade", grade(F.col("low_score"))))
