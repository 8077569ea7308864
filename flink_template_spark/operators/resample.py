"""Grouped time-series resampling — the pandas-boundary members of the
engine's extension surface (SURVEY.md §2.6: the reference's extension
points map to pandas_udf / applyInPandas / applyInPandasWithState /
foreachBatch; the other three are exercised by multimodal.features,
streaming.trip_sessions, and sinks respectively).

Regularizes an irregular per-key event series onto a fixed grid with
forward-fill — the preprocessing step sensor/telemetry analytics need
before window algebra.

Two implementations with identical semantics:

- ``resample_ffill`` (default): one hash shuffle by key, then
  ``mapInPandas`` processes the WHOLE partition (all of its key groups)
  in one vectorized numpy pass. Measured motivation (sf0.1, 100k rows /
  1,500 keys): ``applyInPandas`` with a TRIVIAL group fn costs 4.7 s of
  pure grouped-map machinery — every group is its own Arrow batch and
  its own Python call — while the whole computation is ~3k rows per
  task. Batching all groups of a partition into one Arrow exchange
  removes that per-group floor (optimization guide §4.2: hand whole
  batches to vectorized native code). Each task materializes its
  partition in memory — the same order of magnitude applyInPandas
  already holds for its largest group, and bounded by the shuffle
  partition size at scale.
- ``resample_ffill_grouped``: the classic per-group ``applyInPandas``
  form, kept as the grouped-map extension-surface demonstration and as
  the differential-test reference for the vectorized path.

Scale shape (both): one shuffle (hash by key); no driver collection.
Frequencies must be fixed-width (``'1h'``, ``'1D'`` — the engine's
grids); calendar-width frequencies ('M') have no fixed nanos and raise.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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
    before a key's first non-null observation are dropped (nothing to
    fill from), matching pandas ``resample().last().ffill()``. Grid
    bounds per key come from ALL the key's rows (null values included);
    ``filled`` marks bins with no non-null observation. Ties on equal
    ts are resolved by arrival order (explicitly out of contract, as
    with the grouped-map form — shuffle arrival order is not stable).
    """
    step = int(pd.tseries.frequencies.to_offset(freq).nanos)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        key = pdf[key_col].to_numpy()
        ts = pdf[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)
        val = pdf[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
        order = np.lexsort((ts, key))  # stable: by key, then ts
        key, ts, val = key[order], ts[order], val[order]
        bins = ts - (ts % step)  # floor onto the grid (monotone in ts)

        # one run per key (rows are contiguous after the lexsort)
        new_key = np.empty(len(key), dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        run_id = np.cumsum(new_key) - 1
        gstart = np.flatnonzero(new_key)
        gend = np.r_[gstart[1:], len(key)] - 1
        kmin, kmax = bins[gstart], bins[gend]
        counts = (kmax - kmin) // step + 1
        total = int(counts.sum())
        goff = np.r_[0, np.cumsum(counts[:-1])]  # grid offset per run

        # the concatenated per-key grids
        grid_key = np.repeat(key[gstart], counts)
        grid_ts = np.repeat(kmin, counts) + (
            np.arange(total) - np.repeat(goff, counts)
        ) * step

        # last non-null observation per (key, bin)
        nn = ~np.isnan(val)
        k2, b2, v2, r2 = key[nn], bins[nn], val[nn], run_id[nn]
        if len(k2):
            last = np.empty(len(k2), dtype=bool)
            last[-1] = True
            last[:-1] = (k2[1:] != k2[:-1]) | (b2[1:] != b2[:-1])
            b2, v2, r2 = b2[last], v2[last], r2[last]
        pos = goff[r2] + (b2 - kmin[r2]) // step

        value = np.full(total, np.nan)
        value[pos] = v2
        observed = np.zeros(total, dtype=bool)
        observed[pos] = True
        # segmented forward fill: index of the most recent observed grid
        # row; a carry-over from the previous key lands below this run's
        # offset and marks the row as pre-first-observation.
        src = np.where(observed, np.arange(total), -1)
        np.maximum.accumulate(src, out=src)
        keep = src >= np.repeat(goff, counts)
        src = src[keep]
        yield pd.DataFrame(
            {
                "user_id": grid_key[keep],
                "ts": grid_ts[keep].astype("datetime64[ns]"),
                "value": value[src],
                "filled": ~observed[keep],
            }
        )

    return (
        events.select(key_col, ts_col, value_col)
        .repartition(key_col)
        .mapInPandas(fn, RESAMPLED_SCHEMA)
    )


def resample_ffill_grouped(
    events: DataFrame,
    freq: str = "1h",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-group ``applyInPandas`` form of :func:`resample_ffill` — the
    grouped-map extension-surface demonstration and the differential
    reference for the vectorized partition-wise path."""

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
