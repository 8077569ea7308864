"""Grouped-map time-series resampling — the ``applyInPandas`` (grouped
map UDF) member of the engine's extension surface (SURVEY.md §2.6: the
reference's extension points map to pandas_udf / applyInPandas /
applyInPandasWithState / foreachBatch; the other three are exercised by
multimodal.features, streaming.trip_sessions, and sinks respectively).

Regularizes an irregular per-key event series onto a fixed grid with
forward-fill — the preprocessing step sensor/telemetry analytics need
before window algebra.

Scale shape: one shuffle (hash by key), then each group is a single
Arrow batch in pandas; group size is bounded by the key's events in the
time range, not the table. No driver collection.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("filled", T.BooleanType()),
    ]
)


def resample_ffill(
    events: DataFrame,
    freq: str = "1h",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key resample onto a ``freq`` grid, forward-filling gaps.

    Output: (key, grid ts, last observed value, filled flag). Rows
    before a key's first observation are dropped (nothing to fill
    from), matching pandas ``resample().last().ffill()``.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        s = pdf.set_index(ts_col)[value_col].resample(freq).last()
        out = pd.DataFrame(
            {
                "user_id": pdf[key_col].iloc[0],
                "ts": s.index,
                "value": s.ffill().to_numpy(),
                "filled": s.isna().to_numpy(),
            }
        )
        return out[out["value"].notna()]

    return events.select(key_col, ts_col, value_col).groupBy(key_col).applyInPandas(
        fn, RESAMPLED_SCHEMA
    )


def resample_ffill_expr(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Expression-only daily resample+ffill — the scale-fast dual of
    ``resample_ffill`` (no Python boundary, fully codegen):

    1. last observation per (key, day) via a desc row_number;
    2. per-key day grid via sequence(min_day, max_day, 1 day);
    3. forward fill with last(value, ignorenulls) over the ordered grid.

    Same output contract as the pandas version at daily frequency, and
    oracle-checkable (see plans.telemetry.q_resample_daily_expr).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ev = events.select(
        key_col, ts_col, value_col, order_tiebreak,
        F.date_trunc("day", F.col(ts_col)).alias("__day"),
    )
    w_rk = W.partitionBy(key_col, "__day").orderBy(
        F.col(ts_col).desc(), F.col(order_tiebreak).desc()
    )
    daily = (
        ev.withColumn("__rk", F.row_number().over(w_rk))
        .filter(F.col("__rk") == 1)
        .select(key_col, "__day", value_col)
    )
    span = ev.groupBy(key_col).agg(
        F.date_trunc("day", F.min(ts_col)).alias("__d0"),
        F.date_trunc("day", F.max(ts_col)).alias("__d1"),
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence(F.col("__d0"), F.col("__d1"), F.expr("interval 1 day"))
        ).alias("__day"),
    )
    w_fill = (
        W.partitionBy(key_col)
        .orderBy("__day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(daily, [key_col, "__day"], "left")
        .select(
            key_col,
            F.col("__day").cast("date").alias("day"),
            F.last(value_col, ignorenulls=True).over(w_fill).alias("value"),
            F.col(value_col).isNull().alias("filled"),
        )
    )
