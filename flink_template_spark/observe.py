"""In-flight data-quality metrics via ``DataFrame.observe`` — counters
computed by the running job itself (inside Tungsten, zero extra passes),
the engine-native replacement for the reference's debug-log-in-the-hot-
path "monitoring" (TripAggregatorApplication.kt:67, rows.print() :242).

Batch: ``observed, obs = observe_batch(df, id_col=...)`` — trigger an
action on ``observed``, then read ``obs.get``.

Streaming: ``observe_stream(df, "quality", id_col=...)`` — metrics
appear per micro-batch in ``StreamingQueryProgress.observedMetrics
["quality"]``, the hook monitoring/alerting reads.

Scale note: observations are accumulator-style aggregates merged on the
driver — O(metrics), not O(rows); safe at any data volume. This is how
a 100 TB pipeline asserts row counts / null rates WITHOUT a second
validation scan of the input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def quality_metrics(id_col: str, ts_col: str | None = None) -> list[Column]:
    """Standard quality counters: total rows, null/missing ids, distinct
    ids are approximated (exact distinct inside observe would shuffle);
    optional event-time bounds for freshness checks."""
    m = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(id_col).isNull(), 1).otherwise(0)).alias("n_null_id"),
        F.approx_count_distinct(id_col).alias("approx_ids"),
    ]
    if ts_col:
        m += [F.min(ts_col).alias("min_ts"), F.max(ts_col).alias("max_ts")]
    return m


def observe_batch(
    df: DataFrame, id_col: str, ts_col: str | None = None
) -> tuple[DataFrame, Observation]:
    """Attach quality counters to a batch DataFrame. Run any action on
    the returned frame, then read ``observation.get`` (dict)."""
    obs = Observation("quality")
    return df.observe(obs, *quality_metrics(id_col, ts_col)), obs


def observe_stream(
    df: DataFrame, name: str, id_col: str, ts_col: str | None = None
) -> DataFrame:
    """Attach named quality counters to a streaming DataFrame; read them
    from each progress event's ``observedMetrics[name]``."""
    return df.observe(name, *quality_metrics(id_col, ts_col))
