"""Shared sufficient-statistics helpers for correlation/OLS readouts.

One copy of the (m, Σx, Σy, Σx², Σy², Σxy) reduction and the
num/dxx/dyy closed-form terms, so the degenerate-variance guard and
any fix to the dag propagate to every consumer (q_zipf_fit,
q_graph_assortativity; the pre-r9 OLS/correlation queries carry their
own driver-green inline copies and migrate opportunistically).

Exactness note: pass integer-typed x/y columns to keep the sums exact
(BIGINT); double inputs sum in double with the usual accumulation-
order caveat — consumers round their final statistic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def suff_sums(df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """1-row reduction to the six sufficient sums of columns ``x``/``y``
    (names fixed to m/sx/sy/sxx/syy/sxy for :func:`pearson_terms`).
    Delegates to :func:`suff_sums_by` with no keys so the sums dag
    exists in exactly one place."""
    return suff_sums_by(df, [], x, y)


def pearson_terms() -> tuple[Column, Column, Column]:
    """(num, dxx, dyy) over a :func:`suff_sums` row: slope = num/dxx,
    r² = num²/(dxx·dyy), r = num/sqrt(dxx·dyy). Guard dxx/dyy <= 0
    (zero variance) with NULL before dividing — Spark ANSI aborts and
    DuckDB NULLs double 0/0, so an unguarded form diverges."""
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    return num, dxx, dyy


def suff_sums_by(
    df: DataFrame, keys: list[str], x: str = "x", y: str = "y"
) -> DataFrame:
    """Grouped variant of :func:`suff_sums`: one row of sufficient sums
    per ``keys`` group (hash agg with map-side partials)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(F.col(x) * F.col(x)).alias("sxx"),
        F.sum(F.col(y) * F.col(y)).alias("syy"),
        F.sum(F.col(x) * F.col(y)).alias("sxy"),
    )
