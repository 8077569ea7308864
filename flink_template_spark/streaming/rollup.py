"""Continuous aggregate (hypertable-style rollup) maintained by a stream.

The pattern: a streaming windowed aggregation in *update* mode feeds a
``foreachBatch`` writer that appends each micro-batch's changed window
rows to a changelog directory, stamped with the epoch. Readers resolve
"latest epoch wins" per window key; a compaction pass periodically folds
the changelog into a base snapshot so read amplification stays O(1).

This is the timeseries-DB "continuous aggregate" re-expressed on object
storage + Structured Streaming:

- the *writer* never rewrites history — appends only, so it is safe
  under at-least-once foreachBatch retries (an epoch re-run overwrites
  its own directory, which is idempotent);
- the *reader* is a plain DataFrame over changelog ∪ base with a
  per-key ``row_number`` — no external metastore;
- *compaction* is an offline rewrite, exactly how delta/iceberg handle
  the same problem, but with zero dependencies beyond parquet.

Scale: each epoch directory holds only the windows touched by that
micro-batch (bounded by watermark + arrival skew, not by history), the
reader's window function partitions by window key (no global shuffle),
and compaction turns N epochs of updates into one range-partitioned
base. State in the streaming agg itself is bounded by the watermark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def rollup_updates(events: DataFrame, bucket: str = "1 hour",
                   watermark: str = "10 minutes") -> DataFrame:
    """Streaming windowed agg (update mode source): per (bucket,
    event_type) count + exact decimal value sum. Late data beyond the
    watermark is dropped; within it, re-fired windows supersede prior
    emissions via the changelog's epoch."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", bucket).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            F.col("sum_value").cast("double").alias("sum_value"),
        )
    )


def write_rollup_stream(updates: DataFrame, rollup_dir: str, checkpoint: str,
                        available_now: bool = False):
    """Start the changelog writer: update-mode stream → per-epoch append.

    Epoch re-runs (at-least-once retries) rewrite the same
    ``epoch=N`` directory — overwrite-by-partition keeps it idempotent.
    """

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        # the epoch rides in the directory name; readers get it back as
        # an inferred partition column
        (
            batch_df.repartition(1)
            .write.mode("overwrite")
            .parquet(os.path.join(rollup_dir, "changelog", f"epoch={epoch_id}"))
        )

    writer = (
        updates.writeStream.outputMode("update")
        .foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_optional(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None  # directory absent → treat as empty


def read_rollup(
    spark: SparkSession, rollup_dir: str, as_of_epoch: int | None = None
) -> DataFrame:
    """Resolve the current rollup: base snapshot ∪ changelog, latest
    epoch per (bucket_start, event_type) wins. Base rows carry epoch -1
    so any changelog row supersedes them.

    ``as_of_epoch`` gives snapshot (time-travel) reads: only changelog
    epochs ≤ it participate, reproducing the table as of that commit —
    the changelog IS the history, so this costs a partition filter, not
    a copy. (Epoch directories pruned by partition filter; only valid
    before compaction folds them away.)"""
    parts = []
    base = _read_optional(spark, os.path.join(rollup_dir, "base"))
    if base is not None:
        parts.append(base.withColumn("epoch", F.lit(-1).cast("long")))
    log = _read_optional(spark, os.path.join(rollup_dir, "changelog"))
    if log is not None:
        log = log.withColumn("epoch", F.col("epoch").cast("long"))
        if as_of_epoch is not None:
            log = log.filter(F.col("epoch") <= as_of_epoch)
        parts.append(log)
    if not parts:
        raise FileNotFoundError(f"no rollup data under {rollup_dir}")
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    latest = Window.partitionBy("bucket_start", "event_type").orderBy(
        F.col("epoch").desc()
    )
    return (
        union.withColumn("__rn", F.row_number().over(latest))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "epoch")
    )


def compact_rollup(spark: SparkSession, rollup_dir: str) -> None:
    """Fold the changelog into the base snapshot (offline maintenance).

    The new base is range-partitioned on bucket_start so time-range
    reads prune files. Changelog epochs are only removed after the new
    base is fully written (write-then-delete ordering: a crash between
    the two steps leaves duplicates that the reader resolves, never
    data loss)."""
    import shutil

    resolved = read_rollup(spark, rollup_dir)
    tmp = os.path.join(rollup_dir, "base_new")
    (
        resolved.repartitionByRange(4, "bucket_start")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    base = os.path.join(rollup_dir, "base")
    if os.path.exists(base):
        shutil.rmtree(base)
    os.rename(tmp, base)
    log = os.path.join(rollup_dir, "changelog")
    if os.path.exists(log):
        shutil.rmtree(log)
