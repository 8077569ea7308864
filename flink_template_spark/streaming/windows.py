"""Streaming window aggregations over an event stream (SURVEY.md §2.7):
tumbling / sliding / session windows with watermark late-data handling,
plus keyed streaming dedup.

These are thin declarative builders — Catalyst's streaming aggregation
(partial agg + state store) does the heavy lifting; watermarks bound
state exactly like the reference's 3 s bounded out-of-orderness
(TripAggregatorApplication.kt:168-174, W1/W6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "3 seconds"


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    size: str = "10 seconds",
    watermark: str = DEFAULT_WATERMARK,
    keys: list[str] | None = None,
) -> DataFrame:
    gb = [F.window(ts_col, size).alias("w")] + [F.col(k) for k in (keys or [])]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*gb)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *[F.col(k) for k in (keys or [])],
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    size: str = "20 seconds",
    slide: str = "10 seconds",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 seconds",
    key: str = "user_id",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_keyed(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Streaming keyed dedup: first-seen row per key wins; watermark
    bounds the dedup state (dropDuplicates keeps keys forever without
    one — unusable at 100 TB)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(keys + [ts_col])


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Bounded-state dedup on the KEY ALONE: duplicates are dropped when
    they arrive within the watermark delay of the first occurrence, and
    each key's state is evicted once the watermark passes it. Unlike
    ``dedup_keyed`` (key+timestamp exact dedup), this dedups re-sends
    whose event times differ — the at-least-once-source cleanup — while
    state stays O(keys per watermark window), the property that holds
    at 100 TB."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (small) static dimension, broadcast so the stream side never
    shuffles — the standard pattern for decorating an event stream with
    reference data at any scale."""
    return stream.join(F.broadcast(dim), on, how)


def join_streams_interval(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 seconds",
    watermark: str = DEFAULT_WATERMARK,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with an event-time interval bound: rows pair
    when keys match and the right event lands within [left_ts, left_ts
    + within]. Both sides carry watermarks so the join state is
    provably bounded — without the time bound Spark would buffer both
    streams forever.

    ``how="leftOuter"`` emits unmatched left rows (right columns null)
    once the watermark passes the interval's end — i.e. when Spark can
    PROVE no future right row can match; the null row is late by the
    watermark delay, never wrong."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how)


def dedup_near_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming NEAR-duplicate suppression: per-row expression SimHash
    (operators.dedup.simhash_scalar — no shuffle, no pre-aggregation)
    keyed into ``dropDuplicatesWithinWatermark``. Documents whose
    token-frequency profiles collapse to the same 32-bit signature are
    treated as duplicates; the first survives, later copies within the
    watermark horizon are dropped, and state stays bounded by that
    horizon rather than the stream's length — the streaming dual of
    the batch SimHash dedup family."""
    from flink_template_spark.operators.dedup import simhash_scalar

    return (
        docs.withColumn("simhash", simhash_scalar(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["simhash"])
    )
